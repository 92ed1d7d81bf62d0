package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-4 continuation batch: the remaining classic warehouse
  * decorrelation shapes (TPC-H Q2 / Q11 / Q15 / Q20 / Q4 analogues on
  * the synthetic star schema — no partsupp table, so the part-supplier
  * link is derived from lineitem), then distribution distances,
  * retrieval evals, and classical statistics (later sections).
  *
  * Exactness discipline as everywhere in this repo: money is exact
  * cents (`round(x*100)::BIGINT` per row, never summed as doubles),
  * fractional fences are integer cross-multiplies (`v*1000 > tot`
  * instead of `v > tot/1000`), and `div`/`//` share truncate-toward-
  * zero semantics across Spark, DuckDB, and Java.
  *
  * Scale stance: every scalar threshold (global max, global total) is
  * a one-row broadcast; per-group minima join back on equality rather
  * than re-sorting; nation/region dims broadcast; supplier/part sides
  * shuffle on their keys (they grow with SF and are never collected).
  */
object Analytics {

  // ------------------------------------ q301 TPC-H Q2 min-cost supplier

  /** q301 — TPC-H Q2's correlated-minimum shape: for each small part,
    * the EUROPE supplier(s) quoting the minimum price. The correlated
    * `WHERE cost = (SELECT min(cost) ... same part)` decorrelates into
    * a per-part min aggregate joined back on equality — ties surface
    * as extra rows, exactly like the reference query. Two shuffles
    * (per-(part,supp) min, per-part min) both keyed on l_partkey; the
    * nation dim broadcasts; supplier joins shuffle on s_suppkey. */
  val minCostSupplier: Q = (s, dir) => {
    import s.implicits._
    val eur = Tables(s, dir, "nation").filter($"n_regionkey" === 3)
      .select($"n_nationkey", $"n_name")
    val supp = Tables(s, dir, "supplier")
      .join(broadcast(eur), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"s_name", $"n_name",
        round($"s_acctbal" * 100).cast("long").as("bal_cents"))
    val pk = Tables(s, dir, "part").filter($"p_size" < 10)
      .select($"p_partkey")
    val offers = Tables(s, dir, "lineitem")
      .join(broadcast(pk), $"l_partkey" === $"p_partkey")
      .select($"l_partkey", $"l_suppkey",
        round($"l_extendedprice" * 100).cast("long").as("cents"))
    val perSupp = offers.groupBy($"l_partkey", $"l_suppkey")
      .agg(min($"cents").as("supp_cents"))
      .join(supp, $"l_suppkey" === $"s_suppkey")
    val best = perSupp.groupBy($"l_partkey")
      .agg(min($"supp_cents").as("min_cents"))
    perSupp.join(best, Seq("l_partkey"))
      .filter($"supp_cents" === $"min_cents")
      .select($"l_partkey".as("p_partkey"), $"min_cents", $"s_suppkey",
        $"s_name", $"n_name", $"bal_cents")
      .orderBy($"bal_cents".desc, $"n_name".asc, $"s_name".asc,
        $"p_partkey".asc)
  }

  // ---------------------------------- q302 TPC-H Q11 important values

  /** q302 — TPC-H Q11's group-vs-global-scalar shape: per-part value
    * held by one region's suppliers (EUROPE = nationkey mod 5 per this
    * schema's nation→region mapping; a plain nation filter is empty at
    * the sf0.001 smoke scale), kept when it clears 1/1000 of the
    * region's total. The scalar total is ONE broadcast row off the
    * already-aggregated per-part frame (not a second scan), and the
    * fraction fence is the integer cross-multiply `value*1000 > total`
    * — no division, no doubles. */
  val importantPartValue: Q = (s, dir) => {
    import s.implicits._
    val ns = Tables(s, dir, "supplier")
      .filter($"s_nationkey" % 5 === 3).select($"s_suppkey")
    val value = Tables(s, dir, "lineitem")
      .join(ns, $"l_suppkey" === $"s_suppkey")
      .select($"l_partkey",
        round($"l_extendedprice" * 100).cast("long").as("cents"))
      .groupBy($"l_partkey").agg(sum($"cents").as("value_cents"))
    val tot = value.agg(sum($"value_cents").as("total_cents"))
    value.crossJoin(broadcast(tot))
      .filter($"value_cents" * 1000 > $"total_cents")
      .select($"l_partkey".as("p_partkey"), $"value_cents")
      .orderBy($"value_cents".desc, $"p_partkey".asc)
  }

  // ------------------------------------- q303 TPC-H Q15 top supplier

  /** q303 — TPC-H Q15's max-of-aggregate shape: the supplier(s) with
    * the highest discounted Q1-1996 revenue. The view + scalar-max
    * subquery decorrelates to one grouped aggregate, a one-row
    * broadcast max, and an equality join-back (ties kept, as Q15
    * requires). Revenue rounds to cents PER ROW before the exact long
    * sum, so partial-aggregation order cannot move the result. */
  val topSupplierRevenue: Q = (s, dir) => {
    import s.implicits._
    val rev = Tables(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1996-01-01") &&
        $"l_shipdate" < lit("1996-04-01"))
      .select($"l_suppkey",
        round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100)
          .cast("long").as("cents"))
      .groupBy($"l_suppkey").agg(sum($"cents").as("rev_cents"))
    val mx = rev.agg(max($"rev_cents").as("max_rev"))
    rev.crossJoin(broadcast(mx))
      .filter($"rev_cents" === $"max_rev")
      .join(Tables(s, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"rev_cents")
      .orderBy($"s_suppkey".asc)
  }

  // -------------------------------- q304 TPC-H Q20 dominant supplier

  /** q304 — TPC-H Q20's nested-aggregate semi-join shape, adapted to
    * the lineitem-derived part-supplier link: suppliers who shipped
    * MORE THAN 30% of a brand's 1997 volume for at least one part
    * (the availqty > 0.5·shipped fence becomes a share-of-part fence;
    * the two-level aggregate and the semi-join to the supplier dim are
    * the same plan shape). Per-part totals derive from the per-
    * (part,supp) frame — one scan, two keyed shuffles; the share
    * fence is the integer cross-multiply `sq*10 > tq*3`. */
  val dominantSupplier: Q = (s, dir) => {
    import s.implicits._
    val pk = Tables(s, dir, "part")
      .filter($"p_brand" === "Brand#21").select($"p_partkey")
    val sh = Tables(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1997-01-01") &&
        $"l_shipdate" < lit("1998-01-01"))
      .join(broadcast(pk), $"l_partkey" === $"p_partkey")
      .select($"l_partkey", $"l_suppkey",
        $"l_quantity".cast("long").as("qty"))
    val perPS = sh.groupBy($"l_partkey", $"l_suppkey")
      .agg(sum($"qty").as("sq"))
    val perP = perPS.groupBy($"l_partkey").agg(sum($"sq").as("tq"))
    perPS.join(perP, Seq("l_partkey"))
      .filter($"sq" * 10 > $"tq" * 3)
      .groupBy($"l_suppkey").agg(count(lit(1)).as("n_parts"))
      .join(Tables(s, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"n_parts")
      .orderBy($"s_suppkey".asc)
  }

  // --------------------------------- q305 TPC-H Q4 priority check

  /** q305 — TPC-H Q4's EXISTS shape: orders placed in Q2-1996 with at
    * least one line shipped more than 30 days after the order date,
    * counted per priority. The correlated EXISTS plans as a LEFT SEMI
    * join whose non-equi residual (l_shipdate > o_orderdate + 30d)
    * rides on the o_orderkey equi-key — one keyed shuffle, then a
    * 5-group aggregate. */
  val orderPriorityCheck: Q = (s, dir) => {
    import s.implicits._
    val ords = Tables(s, dir, "orders")
      .filter($"o_orderdate" >= lit("1996-04-01") &&
        $"o_orderdate" < lit("1996-07-01"))
    val li = Tables(s, dir, "lineitem")
      .select($"l_orderkey", $"l_shipdate")
    ords.join(li,
        $"o_orderkey" === $"l_orderkey" &&
          $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy($"o_orderpriority".asc)
  }

  // ----------------------------- q306 Hellinger / Bhattacharyya / TV

  /** q306 — distribution distances between the event-type mixes of two
    * user cohorts (even vs odd user_id): Bhattacharyya coefficient,
    * Hellinger distance, and total variation. The category frame is
    * O(event types) after one counting shuffle; both cohort totals are
    * one broadcast row. TV is EXACT rational arithmetic
    * (|n1·N2 − n2·N1| summed, one terminal division); the BC sqrt is
    * quantized per CATEGORY term (the q77 convention) so partial-agg
    * order cannot move it, and Hellinger's outer sqrt runs on the
    * already-integral BC sum. */
  val distributionDistances: Q = (s, dir) => {
    import s.implicits._
    val cnt = Tables(s, dir, "events")
      .select(($"user_id" % 2).as("g"), $"event_type")
      .groupBy($"event_type")
      .agg(sum(when($"g" === 0, 1L).otherwise(0L)).as("n1"),
        sum(when($"g" === 1, 1L).otherwise(0L)).as("n2"))
    val tot = cnt.agg(sum($"n1").as("t1"), sum($"n2").as("t2"))
    val terms = cnt.crossJoin(broadcast(tot))
      .select(
        expr("CAST(round(1000000.0 * sqrt(CAST(n1 * n2 AS DOUBLE) /" +
          " CAST(t1 * t2 AS DOUBLE))) AS BIGINT)").as("bc_term"),
        abs($"n1" * $"t2" - $"n2" * $"t1").as("tv_num"))
      .agg(count(lit(1)).as("n_types"), sum($"bc_term").as("bc_micro"),
        sum($"tv_num").as("tv_num"))
    terms.crossJoin(broadcast(tot))
      .select($"n_types", $"bc_micro",
        expr("CAST(round(1000.0 * sqrt(CAST(greatest(0," +
          " 1000000 - bc_micro) AS DOUBLE))) AS BIGINT)")
          .as("hellinger_micro"),
        expr("CAST(1000000 * tv_num div (2 * t1 * t2) AS BIGINT)")
          .as("tv_micro"))
  }

  // ------------------------------------- q307 1-D Wasserstein distance

  /** q307 — exact 1-D earth-mover (Wasserstein-1) distance between the
    * order-value distributions of URGENT and non-URGENT orders:
    * W1 = ∫|F1−F2|dx over the merged value grid. Scale shape: one
    * counting shuffle onto the distinct-cents grid, then the
    * [[graft.functions.ScaleWindows]] backbone — `rangeCumSums` for
    * both exclusive cumulative counts and `rangeCumMax` as the
    * scale-safe LAG (on a strictly-increasing grid the exclusive
    * prefix max IS the previous value) — no single-partition sort
    * anywhere. Arithmetic is exact rational (E1·N2 − E2·N1 stays
    * integral; one terminal micro division). At ~1e10 rows per cohort
    * the cross product would overflow int64 — the documented
    * production path quantizes each CDF to micro units per grid row
    * first (error ≤ 1e-6·range); this exact-rational form is the
    * oracle-parity configuration. */
  val wasserstein1d: Q = (s, dir) => {
    import s.implicits._
    import graft.functions.ScaleWindows
    val grid = Tables(s, dir, "orders")
      .select(when($"o_orderpriority" === "1-URGENT", 1).otherwise(2)
        .as("g"), round($"o_totalprice" * 100).cast("long").as("v"))
      .groupBy($"v")
      .agg(sum(when($"g" === 1, 1L).otherwise(0L)).as("n1"),
        sum(when($"g" === 2, 1L).otherwise(0L)).as("n2"))
    val tot = grid.agg(sum($"n1").as("t1"), sum($"n2").as("t2"))
    val cum = ScaleWindows.rangeCumSums(grid, Seq($"v"),
      Seq(col("n1") -> "e1", col("n2") -> "e2"))
    // checkpoint: cum's lineage embeds its own range exchange, and
    // rangeCumMax's two branches must see ONE boundary sample
    val lagged = ScaleWindows.rangeCumMax(cum, Seq($"v"), $"v", "prev_v",
      checkpoint = true)
    lagged.filter($"prev_v".isNotNull)
      .crossJoin(broadcast(tot))
      .select((abs($"e1" * $"t2" - $"e2" * $"t1") *
        ($"v" - $"prev_v")).as("seg"))
      .agg(sum($"seg").as("num"))
      .crossJoin(broadcast(tot))
      .select($"t1", $"t2", $"num",
        // two-step division: num·1e6 can overflow int64, the
        // quotient/remainder split never does (r < t1·t2)
        expr("CAST((num div (t1 * t2)) * 1000000 +" +
          " (1000000 * (num % (t1 * t2))) div (t1 * t2) AS BIGINT)")
          .as("w1_micro_cents"))
  }

  // ------------------------------------------------ retrieval helpers

  // DuckDB cosine fragments, kept in lockstep with Similarity.cosine
  // (the q252/q216 parity convention: double multiply-adds in index
  // order so both engines produce bit-identical doubles).
  private def sqlDotCols(a: String, b: String) =
    s"list_sum(list_transform(list_zip($a, $b), " +
      "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"
  private def sqlNorm(c: String) =
    s"list_sum(list_transform($c, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
  private def sqlCosCols(a: String, b: String) =
    s"${sqlDotCols(a, b)} / (sqrt(${sqlNorm(a)}) * sqrt(${sqlNorm(b)}))"

  // --------------------------------------------------- q308 MRR eval

  /** q308 — mean reciprocal rank of the first same-label neighbor
    * within the top-50 cosine candidates, per label (the rank-position
    * companion of q208's recall, q216's nDCG and q252's vote
    * accuracy). Scale: eval sample broadcast, one corpus scan, the
    * per-query rank window prunes to 50 BEFORE the exchange
    * (WindowGroupLimit); queries with no same-label hit inside the cap
    * score 0 via the left join, so the production path never ranks
    * past k. Reciprocals are integral micro divisions. */
  val mrrEval: Q = (s, dir) => {
    import s.implicits._
    import graft.functions.Similarity
    val e = Tables(s, dir, "embeddings")
    val qs = e.filter($"vec_id" % 10 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("qv"),
        $"label".as("true_label"))
    val first = e.crossJoin(broadcast(qs))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"true_label", $"vec_id", $"label",
        Similarity.cosine($"embedding", $"qv").as("cs"))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"q_id").orderBy($"cs".desc, $"vec_id".asc)))
      .filter($"rank" <= 50 && $"label" === $"true_label")
      .groupBy($"q_id").agg(min($"rank").as("first_rank"))
    qs.select($"q_id", $"true_label")
      .join(first, Seq("q_id"), "left")
      .select($"true_label",
        coalesce(expr("1000000 div first_rank"), lit(0L)).as("rr_micro"))
      .groupBy($"true_label")
      .agg(count(lit(1)).as("n_queries"),
        sum($"rr_micro").as("sum_rr_micro"))
      .select($"true_label", $"n_queries", $"sum_rr_micro",
        expr("sum_rr_micro div n_queries").as("mrr_micro"))
  }

  // ----------------------------------- q309 query-likelihood ranking

  /** q309 — Dirichlet-smoothed query-likelihood retrieval (Zhai &
    * Lafferty 2004), the language-model scorer next to q91's BM25:
    * score(d) = Σ_t ln((tf·|C| + μ·cf_t) / (|C|·(dl + μ))), μ = 2000.
    * Corpus stats (total tokens, per-term collection frequency) reduce
    * to ONE broadcast row so scoring is a map-only pass; each ln
    * quantizes to micro-nats per (doc, term) from EXACT long
    * numerator/denominator (never a summed double), then the 3-term
    * sum is exact. */
  val queryLikelihood: Q = (s, dir) => {
    import s.implicits._
    import graft.functions.TextOps
    val terms = Seq("spark", "query", "hash")
    val tk = Tables(s, dir, "documents")
      .select($"doc_id", TextOps.tokens($"text").as("toks"))
    val statCols = sum(size($"toks")).cast("long").as("ctot") +:
      terms.map(t => sum(size(filter($"toks", x => x === t)))
        .cast("long").as(s"cf_$t"))
    val stats = tk.agg(statCols.head, statCols.tail: _*)
    val tfCols = $"doc_id" +: size($"toks").cast("long").as("dl") +:
      terms.map(t =>
        size(filter($"toks", x => x === t)).cast("long").as(s"tf_$t"))
    val score = terms.map { t =>
      expr(s"CAST(round(1000000.0 * ln(" +
        s"CAST(tf_$t * ctot + 2000 * cf_$t AS DOUBLE) / " +
        s"CAST(ctot * (dl + 2000) AS DOUBLE))) AS BIGINT)")
    }.reduce(_ + _)
    tk.select(tfCols: _*).crossJoin(broadcast(stats))
      .select($"doc_id", score.as("ql_micro"))
      .orderBy($"ql_micro".desc, $"doc_id".asc)
      .limit(15)
  }

  // --------------------------------- q310 binary-sign Hamming ANN

  /** q310 — binary embedding search: each vector sign-quantizes to a
    * 63-bit code (one long word; bit 63 stays clear because DuckDB's
    * checked `<<` rejects it — at production dims the code is simply
    * ⌈dims/63⌉ words), candidates rank by XOR-popcount Hamming
    * distance, and only the 20 survivors pay the exact-cosine rerank
    * to top-5. The 64×-compressed first pass is the scale story:
    * popcount on a broadcast query code versus a float dot product per
    * corpus row; WindowGroupLimit prunes to 20 before the exchange;
    * the rerank join re-fetches the query vector from the broadcast
    * side only for candidate rows. */
  val binaryHammingAnn: Q = (s, dir) => {
    import s.implicits._
    import graft.functions.Similarity
    val code = expr("aggregate(sequence(0, 62), CAST(0 AS BIGINT), " +
      "(acc, i) -> acc + CASE WHEN element_at(embedding, i + 1) > 0.0 " +
      "THEN shiftleft(CAST(1 AS BIGINT), i) ELSE CAST(0 AS BIGINT) END)")
    val coded = Tables(s, dir, "embeddings")
      .select($"vec_id", $"embedding", code.as("code"))
    val qs = coded.filter($"vec_id" % 25 === 0)
      .select($"vec_id".as("q_id"), $"embedding".as("qv"),
        $"code".as("qcode"))
    val top = coded.crossJoin(broadcast(qs.select($"q_id", $"qcode")))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id", $"embedding",
        expr("CAST(bit_count(code ^ qcode) AS BIGINT)").as("ham"))
      .withColumn("hrank", row_number().over(
        Window.partitionBy($"q_id").orderBy($"ham".asc, $"vec_id".asc)))
      .filter($"hrank" <= 20)
    top.join(broadcast(qs.select($"q_id", $"qv")), Seq("q_id"))
      .select($"q_id", $"vec_id", $"ham",
        Similarity.cosine($"embedding", $"qv").as("cs"))
      .withColumn("rank", row_number().over(
        Window.partitionBy($"q_id").orderBy($"cs".desc, $"vec_id".asc)))
      .filter($"rank" <= 5)
      .select($"q_id", $"rank".cast("long").as("rank"), $"vec_id",
        $"ham", expr("CAST(round(1000000 * cs) AS BIGINT)")
          .as("cos_micro"))
      .orderBy($"q_id".asc, $"rank".asc)
  }

  // ------------------------------------------------------- registry

  val queries: Map[String, Q] = Map(
    "q301_min_cost_supplier" -> minCostSupplier,
    "q302_important_part_value" -> importantPartValue,
    "q303_top_supplier_revenue" -> topSupplierRevenue,
    "q304_dominant_supplier" -> dominantSupplier,
    "q305_order_priority_check" -> orderPriorityCheck,
    "q306_distribution_distances" -> distributionDistances,
    "q307_wasserstein_1d" -> wasserstein1d,
    "q308_mrr_eval" -> mrrEval,
    "q309_query_likelihood" -> queryLikelihood,
    "q310_binary_hamming_ann" -> binaryHammingAnn,
  )

  val oracles: Map[String, String] = Map(
    "q301_min_cost_supplier" ->
      """WITH eur AS (SELECT n_nationkey, n_name FROM nation
        |  WHERE n_regionkey = 3),
        |supp AS (SELECT s_suppkey, s_name, n_name,
        |    CAST(round(s_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM supplier JOIN eur ON s_nationkey = n_nationkey),
        |pk AS (SELECT p_partkey FROM part WHERE p_size < 10),
        |offers AS (SELECT l_partkey, l_suppkey,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem JOIN pk ON l_partkey = p_partkey),
        |ps AS (SELECT l_partkey, l_suppkey,
        |    min(cents)::BIGINT AS supp_cents
        |  FROM offers GROUP BY 1, 2),
        |pse AS (SELECT ps.l_partkey, supp_cents, s_suppkey, s_name,
        |    n_name, bal_cents
        |  FROM ps JOIN supp ON l_suppkey = s_suppkey),
        |best AS (SELECT l_partkey, min(supp_cents)::BIGINT AS min_cents
        |  FROM pse GROUP BY 1)
        |SELECT pse.l_partkey AS p_partkey, min_cents, s_suppkey, s_name,
        |  n_name, bal_cents
        |FROM pse JOIN best ON pse.l_partkey = best.l_partkey
        |WHERE supp_cents = min_cents
        |ORDER BY bal_cents DESC, n_name ASC, s_name ASC, p_partkey ASC""".stripMargin,
    "q302_important_part_value" ->
      """WITH ns AS (SELECT s_suppkey FROM supplier WHERE s_nationkey % 5 = 3),
        |v AS (SELECT l_partkey,
        |    sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT
        |      AS value_cents
        |  FROM lineitem JOIN ns ON l_suppkey = s_suppkey
        |  GROUP BY l_partkey),
        |t AS (SELECT sum(value_cents)::BIGINT AS total_cents FROM v)
        |SELECT l_partkey AS p_partkey, value_cents
        |FROM v CROSS JOIN t
        |WHERE value_cents * 1000 > total_cents
        |ORDER BY value_cents DESC, p_partkey ASC""".stripMargin,
    "q303_top_supplier_revenue" ->
      """WITH rev AS (SELECT l_suppkey,
        |    sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |      AS BIGINT))::BIGINT AS rev_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey),
        |mx AS (SELECT max(rev_cents)::BIGINT AS max_rev FROM rev)
        |SELECT s_suppkey, s_name, rev_cents
        |FROM rev CROSS JOIN mx
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_cents = max_rev
        |ORDER BY s_suppkey ASC""".stripMargin,
    "q304_dominant_supplier" ->
      """WITH pk AS (SELECT p_partkey FROM part
        |  WHERE p_brand = 'Brand#21'),
        |sh AS (SELECT l_partkey, l_suppkey,
        |    CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem JOIN pk ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'),
        |ps AS (SELECT l_partkey, l_suppkey, sum(qty)::BIGINT AS sq
        |  FROM sh GROUP BY 1, 2),
        |pt AS (SELECT l_partkey, sum(sq)::BIGINT AS tq
        |  FROM ps GROUP BY 1),
        |dom AS (SELECT l_suppkey, count(*)::BIGINT AS n_parts
        |  FROM ps JOIN pt ON ps.l_partkey = pt.l_partkey
        |  WHERE sq * 10 > tq * 3 GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, n_parts
        |FROM dom JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY s_suppkey ASC""".stripMargin,
    "q305_order_priority_check" ->
      """SELECT o_orderpriority, count(*)::BIGINT AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-04-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority ASC""".stripMargin,
    "q306_distribution_distances" ->
      """WITH cnt AS (SELECT event_type,
        |    sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT
        |      AS n1,
        |    sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT
        |      AS n2
        |  FROM events GROUP BY event_type),
        |tot AS (SELECT sum(n1)::BIGINT AS t1, sum(n2)::BIGINT AS t2
        |  FROM cnt),
        |terms AS (SELECT
        |    CAST(round(1000000.0 * sqrt(CAST(n1 * n2 AS DOUBLE) /
        |      CAST(t1 * t2 AS DOUBLE))) AS BIGINT) AS bc_term,
        |    abs(n1 * t2 - n2 * t1) AS tv_num
        |  FROM cnt CROSS JOIN tot),
        |agg AS (SELECT count(*)::BIGINT AS n_types,
        |    sum(bc_term)::BIGINT AS bc_micro,
        |    sum(tv_num)::BIGINT AS tv_num FROM terms)
        |SELECT n_types, bc_micro,
        |  CAST(round(1000.0 * sqrt(CAST(greatest(0,
        |    1000000 - bc_micro) AS DOUBLE))) AS BIGINT)
        |    AS hellinger_micro,
        |  CAST(1000000 * tv_num // (2 * t1 * t2) AS BIGINT) AS tv_micro
        |FROM agg CROSS JOIN tot""".stripMargin,
    "q307_wasserstein_1d" ->
      """WITH grid AS (SELECT
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS v,
        |    sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0
        |      END)::BIGINT AS n1,
        |    sum(CASE WHEN o_orderpriority <> '1-URGENT' THEN 1 ELSE 0
        |      END)::BIGINT AS n2
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT sum(n1)::BIGINT AS t1, sum(n2)::BIGINT AS t2
        |  FROM grid),
        |cum AS (SELECT v,
        |    coalesce(sum(n1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND 1 PRECEDING), 0)::BIGINT AS e1,
        |    coalesce(sum(n2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND 1 PRECEDING), 0)::BIGINT AS e2,
        |    lag(v) OVER (ORDER BY v) AS prev_v
        |  FROM grid),
        |seg AS (SELECT abs(e1 * t2 - e2 * t1) * (v - prev_v) AS seg
        |  FROM cum CROSS JOIN tot WHERE prev_v IS NOT NULL),
        |agg AS (SELECT sum(seg)::BIGINT AS num FROM seg)
        |SELECT t1, t2, num,
        |  CAST((num // (t1 * t2)) * 1000000 +
        |    (1000000 * (num % (t1 * t2))) // (t1 * t2) AS BIGINT)
        |    AS w1_micro_cents
        |FROM agg CROSS JOIN tot""".stripMargin,
    "q308_mrr_eval" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qv,
        |    label AS tl FROM embeddings WHERE vec_id % 10 = 0),
        |rk AS (SELECT q_id, tl, label, row_number() OVER (
        |      PARTITION BY q_id ORDER BY
        |      ${sqlCosCols("embedding", "qv")} DESC, vec_id ASC) AS rank
        |  FROM embeddings CROSS JOIN q WHERE vec_id <> q_id),
        |fr AS (SELECT q_id, min(rank)::BIGINT AS first_rank
        |  FROM rk WHERE rank <= 50 AND label = tl GROUP BY q_id),
        |rr AS (SELECT q.tl, coalesce(1000000 // first_rank, 0)::BIGINT
        |    AS rr_micro
        |  FROM q LEFT JOIN fr ON q.q_id = fr.q_id)
        |SELECT tl AS true_label, count(*)::BIGINT AS n_queries,
        |  sum(rr_micro)::BIGINT AS sum_rr_micro,
        |  CAST(sum(rr_micro)::BIGINT // count(*)::BIGINT AS BIGINT)
        |    AS mrr_micro
        |FROM rr GROUP BY tl""".stripMargin,
    "q309_query_likelihood" -> {
      val toks = "list_filter(string_split_regex(lower(text)," +
        " '[^a-z]+'), w -> w <> '')"
      def tf(t: String) =
        s"len(list_filter(toks, w -> w = '$t'))::BIGINT"
      val terms = Seq("spark", "query", "hash")
      val termSql = terms.map(t =>
        s"CAST(round(1000000.0 * ln(CAST(tf_$t * ctot + 2000 * cf_$t" +
          s" AS DOUBLE) / CAST(ctot * (dl + 2000) AS DOUBLE)))" +
          " AS BIGINT)").mkString(" + ")
      s"""WITH tk AS (SELECT doc_id, $toks AS toks FROM documents),
        |st AS (SELECT sum(len(toks))::BIGINT AS ctot,
        |    ${terms.map(t => s"sum(${tf(t)})::BIGINT AS cf_$t")
          .mkString(", ")}
        |  FROM tk),
        |d AS (SELECT doc_id, len(toks)::BIGINT AS dl,
        |    ${terms.map(t => s"${tf(t)} AS tf_$t").mkString(", ")}
        |  FROM tk)
        |SELECT doc_id, ($termSql)::BIGINT AS ql_micro
        |FROM d CROSS JOIN st
        |ORDER BY ql_micro DESC, doc_id ASC LIMIT 15""".stripMargin
    },
    "q310_binary_hamming_ann" -> {
      val code = "list_sum(list_transform(range(0, 63), i -> CASE " +
        "WHEN embedding[i + 1] > 0.0 THEN (1::BIGINT << i) " +
        "ELSE 0::BIGINT END))::BIGINT"
      s"""WITH coded AS (SELECT vec_id, embedding, $code AS code
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, embedding AS qv, code AS qcode
        |  FROM coded WHERE vec_id % 25 = 0),
        |ham AS (SELECT q_id, vec_id, embedding,
        |    bit_count(xor(code, qcode))::BIGINT AS ham
        |  FROM coded CROSS JOIN q WHERE vec_id <> q_id),
        |top AS (SELECT q_id, vec_id, embedding, ham, row_number()
        |    OVER (PARTITION BY q_id ORDER BY ham ASC, vec_id ASC)
        |    AS hrank
        |  FROM ham QUALIFY hrank <= 20),
        |rer AS (SELECT top.q_id, vec_id, ham,
        |    ${sqlCosCols("embedding", "qv")} AS cs,
        |    row_number() OVER (PARTITION BY top.q_id ORDER BY
        |      ${sqlCosCols("embedding", "qv")} DESC, vec_id ASC)
        |      AS rank
        |  FROM top JOIN q ON top.q_id = q.q_id QUALIFY rank <= 5)
        |SELECT q_id, rank::BIGINT AS rank, vec_id, ham,
        |  CAST(round(1000000 * cs) AS BIGINT) AS cos_micro
        |FROM rer ORDER BY q_id ASC, rank ASC""".stripMargin
    },
  )
}
