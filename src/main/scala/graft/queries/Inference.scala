package graft.queries

import graft.Materialize.TrunkCheckpointOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-5 batch: classical inference operators a curation warehouse
  * serves when teams ask "is this effect real?" — instrumental
  * variables, structural-break and rank-based two-sample tests, ordered
  * trend tests, and scale/location nonparametrics. None exist in the
  * reference (a thin news ETL); all are beyond-reference additions in
  * the spirit of SURVEY §2's analytics tier.
  *
  * Exactness discipline (the q211/q405 convention): inputs quantize to
  * integer units per row (cents, day indices), moment sums accumulate
  * as longs or DECIMAL(38,0) (exact, order-independent), and doubles
  * appear only in the FINAL one-row (or O(groups)-row) expressions —
  * whose operand text is shared token-for-token with the DuckDB oracle
  * via the private template vals below, so both engines evaluate the
  * identical IEEE tree on identical inputs.
  *
  * Scale stance: every query is one (or two) map-side-combined
  * aggregation passes over the fact table plus O(days)/O(groups)
  * arithmetic; the two rank-based tests (q410, q415) ride
  * ScaleWindows.rangeCumSums — a range exchange plus partition-local
  * running sums, never a single-partition sort.
  */
object Inference {

  // ------------------------------------- q408 instrumental variables

  // template: identical double math in both engines (q211 precedent)
  private val ivDbl = Seq("n", "sz", "sx", "sy", "szx", "szy", "szz")
    .map(c => s"CAST($c AS DOUBLE) AS ${c}d")
  private val ivOut = Seq(
    "CAST(n AS BIGINT) AS n",
    "CAST(round(1000000.0 * (nd*szyd - szd*syd) / (nd*szxd - szd*sxd))" +
      " AS BIGINT) AS beta_iv_micro",
    "CAST(round(1000000.0 * (nd*szxd - szd*sxd) / (nd*szzd - szd*szd))" +
      " AS BIGINT) AS gamma_micro")

  /** q408 — instrumental-variables slope (Wald/2SLS with one
    * endogenous regressor): revenue ~ quantity, instrumented by the
    * part's size (supply-side, plausibly demand-exogenous).
    * β_IV = Cov(z,y)/Cov(z,x), plus the first-stage slope γ (the
    * weak-instrument readout). ONE map-side-combined aggregate over
    * lineitem⋈part collects 7 exact moment sums (cross-products in
    * DECIMAL(38,0) — exact to ~1e12 rows); the two ratios run in
    * double on the one-row frame with oracle-shared operand text.
    * Scale: the join broadcasts nothing it shouldn't (part is the
    * dim side at real SF; Catalyst picks the strategy), the fact
    * table is touched once. */
  val ivWald: Q = (s, dir) => {
    import s.implicits._
    val f = Tables(s, dir, "lineitem")
      .join(Tables(s, dir, "part").select($"p_partkey", $"p_size"),
        $"l_partkey" === $"p_partkey")
      .select(round($"l_extendedprice" * 100).cast("long").as("y"),
        $"l_quantity".cast("long").as("x"),
        $"p_size".cast("long").as("z"))
    f.agg(count(lit(1)).as("n"), sum($"z").as("sz"), sum($"x").as("sx"),
        sum(expr("CAST(y AS DECIMAL(38,0))")).as("sy"),
        sum(expr("CAST(z AS DECIMAL(38,0)) * x")).as("szx"),
        sum(expr("CAST(z AS DECIMAL(38,0)) * y")).as("szy"),
        sum(expr("CAST(z AS DECIMAL(38,0)) * z")).as("szz"))
      .selectExpr("n" +: ivDbl: _*)
      .selectExpr(ivOut: _*)
  }

  // ------------------------------------------- q409 Chow break test

  private def chowSsr(p: String) =
    s"((syy${p}d - sy${p}d*sy${p}d/n${p}d)" +
      s" - (sxy${p}d - sx${p}d*sy${p}d/n${p}d)" +
      s"*(sxy${p}d - sx${p}d*sy${p}d/n${p}d)" +
      s"/(sxx${p}d - sx${p}d*sx${p}d/n${p}d))"
  private val chowDbl: Seq[String] =
    (for (g <- Seq("1", "2");
          c <- Seq("n", "sx", "sy", "sxx", "sxy", "syy"))
      yield s"CAST($c$g AS DOUBLE) AS $c${g}d") ++
      Seq("n", "sx", "sy", "sxx", "sxy", "syy")
        .map(c => s"CAST(${c}1 AS DOUBLE) + CAST(${c}2 AS DOUBLE)" +
          s" AS ${c}pd")
  private val chowOut = Seq(
    "CAST(n1 AS BIGINT) AS n1", "CAST(n2 AS BIGINT) AS n2",
    s"CAST(round(1000.0 * ((${chowSsr("p")} - ${chowSsr("1")}" +
      s" - ${chowSsr("2")}) / 2.0)" +
      s" / ((${chowSsr("1")} + ${chowSsr("2")}) / (npd - 4.0)))" +
      " AS BIGINT) AS f_milli")

  /** q409 — Chow structural-break F-test on the daily-revenue trend
    * at 1997-01-01 (the series midpoint): does one line fit the whole
    * period or do the halves demand separate intercept+slope?
    * F = ((SSRp − SSR1 − SSR2)/k)/((SSR1+SSR2)/(n−2k)), k = 2.
    * The daily frame is calendar-bounded (O(days) at ANY corpus
    * size); one conditional-sum pass collects both segments' six
    * moment sums (y² in DECIMAL(38,0) — daily cents squared exceeds
    * int64 at ~100× the bench SF), the F ratio runs in double on the
    * one-row frame, SSR text shared with the oracle. Complements
    * q358 (free-knot search) with the fixed-break hypothesis test. */
  val chowTest: Q = (s, dir) => {
    import s.implicits._
    val daily = Tables(s, dir, "orders")
      .groupBy(datediff(to_date($"o_orderdate"),
        lit("1995-01-01").cast("date")).cast("long").as("t"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("y"))
    val seg = when($"t" < 731L, 1).otherwise(2)
    def cond(g: Int, c: org.apache.spark.sql.Column) =
      sum(when(seg === g, c).otherwise(lit(0L)))
    def condDec(g: Int, e: String) =
      sum(when(seg === g, expr(e)).otherwise(expr("CAST(0 AS DECIMAL(38,0))")))
    daily.agg(
        cond(1, lit(1L)).as("n1"), cond(2, lit(1L)).as("n2"),
        cond(1, $"t").as("sx1"), cond(2, $"t").as("sx2"),
        condDec(1, "CAST(y AS DECIMAL(38,0))").as("sy1"),
        condDec(2, "CAST(y AS DECIMAL(38,0))").as("sy2"),
        cond(1, expr("t * t")).as("sxx1"), cond(2, expr("t * t")).as("sxx2"),
        condDec(1, "CAST(t AS DECIMAL(38,0)) * y").as("sxy1"),
        condDec(2, "CAST(t AS DECIMAL(38,0)) * y").as("sxy2"),
        condDec(1, "CAST(y AS DECIMAL(38,0)) * y").as("syy1"),
        condDec(2, "CAST(y AS DECIMAL(38,0)) * y").as("syy2"))
      .selectExpr(Seq("n1", "n2") ++ chowDbl: _*)
      .selectExpr(chowOut: _*)
  }

  // ------------------------------------- q410 Brunner–Munzel test

  private val bmMid = Seq(
    "CAST(n1 AS DOUBLE) AS n1d", "CAST(n2 AS DOUBLE) AS n2d",
    "CAST(k1 AS DOUBLE) / (2.0 * CAST(n1 AS DOUBLE)) AS r1b",
    "CAST(k2 AS DOUBLE) / (2.0 * CAST(n2 AS DOUBLE)) AS r2b",
    "CAST(h1 AS DOUBLE) AS h1d", "CAST(h2 AS DOUBLE) AS h2d",
    "CAST(q1 AS DOUBLE) AS q1d", "CAST(q2 AS DOUBLE) AS q2d")
  private val bmVar = Seq(
    "n1d", "n2d", "r1b", "r2b",
    "(q1d/4.0 - (r1b - (n1d+1.0)/2.0)*h1d" +
      " + n1d*(r1b - (n1d+1.0)/2.0)*(r1b - (n1d+1.0)/2.0))/(n1d-1.0)" +
      " AS v1",
    "(q2d/4.0 - (r2b - (n2d+1.0)/2.0)*h2d" +
      " + n2d*(r2b - (n2d+1.0)/2.0)*(r2b - (n2d+1.0)/2.0))/(n2d-1.0)" +
      " AS v2")
  private val bmOut = Seq(
    "CAST(n1d AS BIGINT) AS n1", "CAST(n2d AS BIGINT) AS n2",
    "CAST(round(1000000.0 * (r2b - (n2d+1.0)/2.0)/n1d) AS BIGINT)" +
      " AS p_hat_micro",
    "CAST(round(1000.0 * n1d*n2d*(r2b - r1b)" +
      " / ((n1d+n2d)*sqrt(n1d*v1 + n2d*v2))) AS BIGINT) AS w_milli",
    "CAST(round(1000.0 * power(n1d*v1 + n2d*v2, 2.0)" +
      " / (power(n1d*v1, 2.0)/(n1d-1.0) + power(n2d*v2, 2.0)/(n2d-1.0)))" +
      " AS BIGINT) AS df_milli")

  /** q410 — Brunner–Munzel heteroscedastic rank test (the modern
    * replacement for Wilcoxon when variances differ): are URGENT
    * orders stochastically larger than the rest? Estimates
    * p = P(X<Y)+½P(X=Y) with the studentized statistic and
    * Welch-style df (Brunner & Munzel 2000; the lawstat formulation).
    * Midranks come from the VALUE HISTOGRAM — one groupBy on cents,
    * one rangeCumSums pass for the two groups' exclusive prefix
    * counts — so the rank machinery is a range exchange over distinct
    * values, never a global sort of rows. All rank moments are exact:
    * doubled midrank differences (2(R−Rw) = 2·c_other + m_other) stay
    * integral; the squared sums carry DECIMAL(38,0) (they pass int64
    * at ~10× the bench SF). Doubles only on the one-row frame,
    * operand text shared with the oracle. */
  val brunnerMunzel: Q = (s, dir) => {
    import s.implicits._
    import graft.functions.ScaleWindows
    val hist = Tables(s, dir, "orders")
      .select(when($"o_orderpriority" === "1-URGENT", 1).otherwise(2)
        .as("g"), round($"o_totalprice" * 100).cast("long").as("v"))
      .groupBy($"v")
      .agg(sum(when($"g" === 1, 1L).otherwise(0L)).as("m1"),
        sum(when($"g" === 2, 1L).otherwise(0L)).as("m2"))
    val cum = ScaleWindows.rangeCumSums(hist, Seq($"v"),
      Seq(col("m1") -> "c1", col("m2") -> "c2"))
      // u_g: the doubled (combined − within-group) midrank shared by
      // every group-g member at this value; k_g: doubled combined
      // midrank × multiplicity (for the group mean rank)
      .withColumn("u1", expr("2*c2 + m2"))
      .withColumn("u2", expr("2*c1 + m1"))
    cum.agg(
        sum($"m1").as("n1"), sum($"m2").as("n2"),
        sum(expr("m1 * (2*(c1+c2) + m1 + m2 + 1)")).as("k1"),
        sum(expr("m2 * (2*(c1+c2) + m1 + m2 + 1)")).as("k2"),
        sum(expr("m1 * u1")).as("h1"), sum(expr("m2 * u2")).as("h2"),
        sum(expr("CAST(m1 AS DECIMAL(38,0)) * u1 * u1")).as("q1"),
        sum(expr("CAST(m2 AS DECIMAL(38,0)) * u2 * u2")).as("q2"))
      .selectExpr(bmMid: _*)
      .selectExpr(Seq("n1d", "n2d", "r1b", "r2b") ++ bmVar
        .drop(4): _*)
      .selectExpr(bmOut: _*)
  }

  // ------------------------------------------ q411 Page trend test

  private val pageOut = Seq(
    "CAST(b AS BIGINT) AS b_blocks", "CAST(l AS BIGINT) AS l_stat",
    "CAST(round(1000.0 * (CAST(l AS DOUBLE) - CAST(b AS DOUBLE)*7.0*64.0/4.0)" +
      " / sqrt(CAST(b AS DOUBLE)*49.0*8.0*48.0/144.0)) AS BIGINT)" +
      " AS z_milli")

  /** q411 — Page's trend test for ordered alternatives: does yearly
    * revenue rise monotonically across the 7 order years (the ordered
    * hypothesis Friedman's q261 omnibus can't see), with regions as
    * blocks? L = Σ_blocks Σ_j j·rank_bj on the region×year cell grid
    * — O(5×7) cells at ANY corpus size, built by one aggregation pass.
    * Ranks break (impossible-at-cents) ties by year — declared
    * contract, mirrored by the oracle. E[L] and Var[L] are the exact
    * no-tie moments (k = 7 literal in the shared expression text). */
  val pageTrend: Q = (s, dir) => {
    import s.implicits._
    val cells = Tables(s, dir, "orders")
      .join(Tables(s, dir, "customer")
        .select($"c_custkey", $"c_nationkey"),
        $"o_custkey" === $"c_custkey")
      .join(Tables(s, dir, "nation")
        .select($"n_nationkey", $"n_regionkey"),
        $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_regionkey".as("b"),
        (year(to_date($"o_orderdate")) - 1994).cast("long").as("j"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("rev"))
    cells
      .withColumn("rk", row_number().over(
        Window.partitionBy($"b").orderBy($"rev".asc, $"j".asc)))
      .agg(countDistinct($"b").as("b"),
        sum($"j" * $"rk").as("l"))
      .selectExpr(pageOut: _*)
  }

  // ----------------------------------------- q413 Bartlett's test

  private val bartRow = Seq(
    "n", "a",
    // group variance quantized to 1 cent² — exact long both engines,
    // then ln() sees the identical integer-valued double
    "CAST(round((CAST(ss AS DOUBLE) - CAST(sv AS DOUBLE)*CAST(sv AS DOUBLE)" +
      "/CAST(n AS DOUBLE))/(CAST(n AS DOUBLE)-1.0)) AS BIGINT) AS s2q")
  private val bartTerms = Seq(
    "CAST(round(1000000.0 * (CAST(n AS DOUBLE)-1.0)" +
      " * ln(CAST(s2q AS DOUBLE))) AS BIGINT) AS t_micro",
    "CAST(round(1000000000000.0/(CAST(n AS DOUBLE)-1.0)) AS BIGINT)" +
      " AS c_pico",
    "CAST(s2q AS DECIMAL(38,0)) * (n - 1) AS ws")
  private val bartOut = Seq(
    "CAST(k AS BIGINT) AS k_groups", "CAST(nn AS BIGINT) AS n",
    "CAST(round(1000.0 * ((CAST(nn AS DOUBLE) - CAST(k AS DOUBLE))" +
      " * ln(CAST(sws AS DOUBLE)/(CAST(nn AS DOUBLE) - CAST(k AS DOUBLE)))" +
      " - CAST(st AS DOUBLE)/1000000.0)" +
      " / (1.0 + (CAST(sc AS DOUBLE)/1000000000000.0" +
      " - 1.0/(CAST(nn AS DOUBLE) - CAST(k AS DOUBLE)))" +
      "/(3.0*(CAST(k AS DOUBLE)-1.0)))) AS BIGINT) AS chi2_milli")

  /** q413 — Bartlett's test of equal variances across the 5 order
    * priorities (the parametric, more powerful sibling of q254's
    * Levene — and the one that assumes normality; serving both lets
    * users triangulate). Per-group moments come from ONE grouped
    * pass (Σx² in DECIMAL(38,0)); each group's variance quantizes to
    * 1 cent² (relative error ~1e-14) so both engines feed ln()
    * identical integers, the per-group ln terms quantize to micro
    * and SUM EXACTLY (no cross-row double adds — the 5-row frame
    * would otherwise order-race), and the final χ² assembles in
    * double on the one-row frame with oracle-shared text. */
  val bartlett: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "orders")
      .select($"o_orderpriority".as("g"),
        round($"o_totalprice" * 100).cast("long").as("v"))
      .groupBy($"g")
      .agg(count(lit(1)).as("n"), sum($"v").as("sv"),
        sum(expr("CAST(v AS DECIMAL(38,0)) * v")).as("ss"))
      .withColumn("a", lit(1L))
      .selectExpr(bartRow: _*)
      .selectExpr(Seq("n", "a") ++ bartTerms: _*)
      .agg(sum($"a").as("k"), sum($"n").as("nn"),
        sum($"t_micro").as("st"), sum($"c_pico").as("sc"),
        sum($"ws").as("sws"))
      .selectExpr(bartOut: _*)
  }

  // -------------------------------------- q414 Mood's median test

  private val moodCell = Seq(
    "g", "ni", "ai",
    // above-median cell + at-or-below cell, each micro-quantized from
    // the exact integer cross-product form (O·N − r·c)²/(N·r·c)
    "CAST(round(1000000.0 * power(CAST(ai AS DOUBLE)*nn" +
      " - CAST(ni AS DOUBLE)*ca, 2.0)" +
      " / (CAST(nn AS DOUBLE)*ni*ca)) AS BIGINT)" +
      " + CAST(round(1000000.0 * power(CAST(ni - ai AS DOUBLE)*nn" +
      " - CAST(ni AS DOUBLE)*(nn - ca), 2.0)" +
      " / (CAST(nn AS DOUBLE)*ni*(nn - ca))) AS BIGINT) AS cell_micro")

  /** q414 — Mood's median test: do the 5 order priorities share a
    * median order value? Dichotomizes at the GRAND lower median —
    * found scalably as the smallest cents value whose inclusive
    * histogram cumulative reaches N/2 (one groupBy + one rangeCumSum
    * over distinct values; the q177 median discipline, never a
    * percentile single-reducer) — then runs the 5×2 χ² on exact
    * counts. Cell terms micro-quantize from integer cross-products
    * and sum exactly; only the 5-row cell frame sees doubles, with
    * oracle-shared text. */
  val moodMedian: Q = (s, dir) => {
    import s.implicits._
    import graft.functions.ScaleWindows
    val rows = Tables(s, dir, "orders")
      .select($"o_orderpriority".as("g"),
        round($"o_totalprice" * 100).cast("long").as("v"))
    // hist pinned (O(distinct cents)): read by the cum-rank pass AND
    // the total row; grp pinned (O(priorities)): read by the column
    // totals and the cell projection
    val hist = rows.groupBy($"v").agg(count(lit(1)).as("m"))
      .trunkCheckpoint()
    val cum = ScaleWindows.rangeCumSum(hist, Seq($"v"), col("m"), "c")
    val tot = hist.agg(sum($"m").as("nn0"))
    val med = cum.crossJoin(broadcast(tot))
      .filter(expr("2*(c + m) >= nn0"))
      .agg(min($"v").as("med"))
    val grp = rows.crossJoin(broadcast(med))
      .groupBy($"g")
      .agg(count(lit(1)).as("ni"),
        sum(when($"v" > $"med", 1L).otherwise(0L)).as("ai"),
        first($"med").as("medv"))
      .trunkCheckpoint()
    val colTot = grp.agg(sum($"ni").as("nn"), sum($"ai").as("ca"),
      max($"medv").as("med_cents"))
    grp.crossJoin(broadcast(colTot))
      .selectExpr(Seq("med_cents", "nn") ++ moodCell: _*)
      .groupBy($"med_cents")
      .agg(max($"nn").as("n"), sum($"cell_micro").as("chi2_micro"))
      .selectExpr("med_cents", "CAST(n AS BIGINT) AS n",
        "CAST(chi2_micro AS BIGINT) AS chi2_micro")
  }

  // ---------------------- q415 two-sample Cramér–von Mises test

  private val cvmOut = Seq(
    "CAST(n AS BIGINT) AS n", "CAST(m AS BIGINT) AS m",
    "CAST(round(1000000.0 * ((CAST(n AS DOUBLE)*CAST(su1 AS DOUBLE)" +
      " + CAST(m AS DOUBLE)*CAST(su2 AS DOUBLE))" +
      " / (CAST(n AS DOUBLE)*CAST(m AS DOUBLE)" +
      "*(CAST(n AS DOUBLE)+CAST(m AS DOUBLE)))" +
      " - (4.0*CAST(n AS DOUBLE)*CAST(m AS DOUBLE) - 1.0)" +
      "/(6.0*(CAST(n AS DOUBLE)+CAST(m AS DOUBLE))))) AS BIGINT)" +
      " AS t_micro")

  /** q415 — two-sample Cramér–von Mises criterion (Anderson 1962)
    * between returned ('R') and accepted ('A') line prices — the
    * whole-distribution companion to q192's KS supremum: T sums the
    * SQUARED ECDF gap instead of taking the max, so it sees spread
    * differences KS misses. U = nΣ(r_i−i)² + mΣ(s_j−j)² where r/s
    * are combined-sample ranks: for a group-1 row, r−i is exactly
    * the count of group-2 rows strictly before it in the total order
    * (v, orderkey, linenumber) — ONE rangeCumSums pass produces both
    * groups' exclusive prefix counts; no global sort, no row
    * explosion. Tie order across groups is the declared deterministic
    * contract (cents ties are broken by key, as classical CvM's
    * continuity assumption expects). Σd² carries DECIMAL(38,0)
    * (passes int64 at ~10× bench SF); T assembles in double on the
    * one-row frame with oracle-shared text. */
  val cvmTwoSample: Q = (s, dir) => {
    import s.implicits._
    import graft.functions.ScaleWindows
    val rows = Tables(s, dir, "lineitem")
      .filter($"l_returnflag".isin("R", "A"))
      .select(when($"l_returnflag" === "R", 1).otherwise(2).as("g"),
        round($"l_extendedprice" * 100).cast("long").as("v"),
        $"l_orderkey".as("ok"), $"l_linenumber".as("lnum"))
    val cum = ScaleWindows.rangeCumSums(rows,
      Seq($"v", $"ok", $"lnum"),
      Seq(when($"g" === 1, 1L).otherwise(0L) -> "c1",
        when($"g" === 2, 1L).otherwise(0L) -> "c2"))
    cum.agg(
        sum(when($"g" === 1, 1L).otherwise(0L)).as("n"),
        sum(when($"g" === 2, 1L).otherwise(0L)).as("m"),
        sum(when($"g" === 1, expr("CAST(c2 AS DECIMAL(38,0)) * c2"))
          .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("su1"),
        sum(when($"g" === 2, expr("CAST(c1 AS DECIMAL(38,0)) * c1"))
          .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("su2"))
      .selectExpr(cvmOut: _*)
  }

  // -------------------------------------- q416 Ansari–Bradley test

  private val abDbl = Seq("n1", "n2", "a1")
    .map(c => s"CAST($c AS DOUBLE) AS ${c}d") ++ Seq(
    "CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) AS nd",
    "CAST(t1 AS DOUBLE) AS t1d", "CAST(t2 AS DOUBLE) AS t2d")
  private val abOut = Seq(
    "CAST(n1d AS BIGINT) AS n1", "CAST(n2d AS BIGINT) AS n2",
    "CAST(a1d AS BIGINT) AS a_stat",
    "CAST(round(1000.0 * (a1d - n1d*t1d/nd)" +
      " / sqrt(n1d*n2d*(nd*t2d - t1d*t1d)/(nd*nd*(nd-1.0))))" +
      " AS BIGINT) AS z_milli")

  /** q416 — Ansari–Bradley two-sample scale test: do finished ('F')
    * and open ('O') orders have equally DISPERSED values around a
    * common center? Scores a(p) = min(p, N+1−p) peak at the middle,
    * so a small group-1 sum means group 1 crowds the extremes (more
    * spread). Ranks come from a TOTAL order (cents, orderkey) — the
    * q415 tie contract — via one rangeCumSums pass (range exchange,
    * no global sort); scores stay exact integers, the score moments
    * T1/T2 aggregate exactly (DECIMAL(38,0) — T2 passes int64 at
    * ~100× bench SF), and the standardized z uses the general
    * fixed-scores linear-rank moments E[A] = n1·T1/N,
    * Var = n1n2(N·T2−T1²)/(N²(N−1)), assembled in double on the
    * one-row frame with oracle-shared text. */
  val ansariBradley: Q = (s, dir) => {
    import s.implicits._
    import graft.functions.ScaleWindows
    val rows = Tables(s, dir, "orders")
      .filter($"o_orderstatus".isin("F", "O"))
      .select(when($"o_orderstatus" === "F", 1).otherwise(2).as("g"),
        round($"o_totalprice" * 100).cast("long").as("v"),
        $"o_orderkey".as("ok"))
    val tot = rows.agg(count(lit(1)).as("nn"))
    val cum = ScaleWindows.rangeCumSums(rows, Seq($"v", $"ok"),
      Seq(when($"g" === 1, 1L).otherwise(0L) -> "c1",
        when($"g" === 2, 1L).otherwise(0L) -> "c2"))
    cum.crossJoin(broadcast(tot))
      .withColumn("p", expr("c1 + c2 + 1"))
      .withColumn("sc", expr("least(p, nn + 1 - p)"))
      .agg(sum(when($"g" === 1, 1L).otherwise(0L)).as("n1"),
        sum(when($"g" === 2, 1L).otherwise(0L)).as("n2"),
        sum(when($"g" === 1, expr("CAST(sc AS DECIMAL(38,0))"))
          .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("a1"),
        sum(expr("CAST(sc AS DECIMAL(38,0))")).as("t1"),
        sum(expr("CAST(sc AS DECIMAL(38,0)) * sc")).as("t2"))
      .selectExpr(abDbl: _*)
      .selectExpr(abOut: _*)
  }

  // --------------------------------------------- q417 Quade test

  private val quadeOut = Seq(
    "CAST(b AS BIGINT) AS b_blocks", "CAST(kk AS BIGINT) AS k_treatments",
    // F = (b−1)·ΣSj² / (b·A − ΣSj²) is scale-free in the doubling:
    // both A4 and sb4 carry the 4× from doubled S, so the ratio is
    // the classical statistic exactly
    "CAST(round(1000.0 * (CAST(b AS DOUBLE) - 1.0) * CAST(sb4 AS DOUBLE)" +
      " / (CAST(b AS DOUBLE)*CAST(a4 AS DOUBLE) - CAST(sb4 AS DOUBLE)))" +
      " AS BIGINT) AS f_milli")

  /** q417 — Quade test on the region×year revenue grid: a Friedman-
    * family blocked comparison that WEIGHTS blocks by their range, so
    * high-variation regions drive the verdict (the test of choice for
    * k ≤ ~5 treatments; here the 7 order years are treatments, the 5
    * regions blocks). Within-block ranks use a partitioned window on
    * the O(35)-cell grid; the 5-row block-range ranking uses a
    * broadcast triangular self-join — NO unpartitioned window
    * anywhere (PlanSpec-clean). Doubled scores S2 = Q·(2r−(k+1))
    * keep every sum integral; the 4× factors cancel in F, which
    * assembles in double on the one-row frame with oracle-shared
    * text. Ties in revenue/range break by year/region key — the
    * impossible-at-cents declared contract (q411 precedent). */
  val quadeTest: Q = (s, dir) => {
    import s.implicits._
    val cells = Tables(s, dir, "orders")
      .join(Tables(s, dir, "customer")
        .select($"c_custkey", $"c_nationkey"),
        $"o_custkey" === $"c_custkey")
      .join(Tables(s, dir, "nation")
        .select($"n_nationkey", $"n_regionkey"),
        $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_regionkey".as("b"),
        (year(to_date($"o_orderdate")) - 1994).cast("long").as("j"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("rev"))
    val ranked = cells.withColumn("r", row_number().over(
      Window.partitionBy($"b").orderBy($"rev".asc, $"j".asc)))
    val bl = cells.groupBy($"b")
      .agg((max($"rev") - min($"rev")).as("rng"))
    val bl2 = bl.select($"b".as("b2"), $"rng".as("rng2"))
    val blq = bl.crossJoin(broadcast(bl2))
      .groupBy($"b", $"rng")
      .agg((sum(when($"rng2" < $"rng" ||
        ($"rng2" === $"rng" && $"b2" < $"b"), 1L)
        .otherwise(0L)) + 1L).as("q"))
      .select($"b".as("bq"), $"q")
    ranked.join(broadcast(blq), $"b" === $"bq")
      .withColumn("s2", $"q" * (lit(2L) * $"r" - 8L))
      .groupBy($"j")
      .agg(sum($"s2" * $"s2").as("aj"), sum($"s2").as("sj2"))
      .agg(countDistinct($"j").as("kk"), sum($"aj").as("a4"),
        sum($"sj2" * $"sj2").as("sb4"))
      .withColumn("b", lit(5L))
      .selectExpr(quadeOut: _*)
  }

  // -------------------------------------------- q418 Lepage test

  private val lepDbl = Seq("n1", "n2", "w1", "a1", "t1", "t2")
    .map(c => s"CAST($c AS DOUBLE) AS ${c}d") ++ Seq(
    "CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) AS nd")
  private val lepMid = Seq(
    "n1d", "n2d",
    "(w1d - n1d*(nd+1.0)/2.0) / sqrt(n1d*n2d*(nd+1.0)/12.0) AS zw",
    "(a1d - n1d*t1d/nd)" +
      " / sqrt(n1d*n2d*(nd*t2d - t1d*t1d)/(nd*nd*(nd-1.0))) AS za")
  private val lepOut = Seq(
    "CAST(n1d AS BIGINT) AS n1", "CAST(n2d AS BIGINT) AS n2",
    "CAST(round(1000.0 * zw) AS BIGINT) AS zw_milli",
    "CAST(round(1000.0 * za) AS BIGINT) AS za_milli",
    "CAST(round(1000.0 * (zw*zw + za*za)) AS BIGINT) AS l_milli")

  /** q418 — Lepage two-sample omnibus: detects location AND scale
    * shifts between finished and open line items by combining the
    * Wilcoxon rank-sum z (location) with the Ansari–Bradley z
    * (scale): L = z_W² + z_AB² (~χ²₂). ONE rangeCumSums pass over
    * the (cents, orderkey, linenumber) total order feeds both
    * statistics — ranks are an exact permutation of 1..N under the
    * declared tie contract, so Wilcoxon uses the exact no-tie
    * moments and AB the exact fixed-scores moments (same machinery
    * as q416). Rank/score sums carry DECIMAL(38,0); doubles only on
    * the one-row frame with oracle-shared text. */
  val lepageTest: Q = (s, dir) => {
    import s.implicits._
    import graft.functions.ScaleWindows
    val rows = Tables(s, dir, "lineitem")
      .select(when($"l_linestatus" === "F", 1).otherwise(2).as("g"),
        round($"l_extendedprice" * 100).cast("long").as("v"),
        $"l_orderkey".as("ok"), $"l_linenumber".as("lnum"))
    val tot = rows.agg(count(lit(1)).as("nn"))
    val cum = ScaleWindows.rangeCumSums(rows, Seq($"v", $"ok", $"lnum"),
      Seq(when($"g" === 1, 1L).otherwise(0L) -> "c1",
        when($"g" === 2, 1L).otherwise(0L) -> "c2"))
    cum.crossJoin(broadcast(tot))
      .withColumn("p", expr("c1 + c2 + 1"))
      .withColumn("sc", expr("least(p, nn + 1 - p)"))
      .agg(sum(when($"g" === 1, 1L).otherwise(0L)).as("n1"),
        sum(when($"g" === 2, 1L).otherwise(0L)).as("n2"),
        sum(when($"g" === 1, expr("CAST(p AS DECIMAL(38,0))"))
          .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("w1"),
        sum(when($"g" === 1, expr("CAST(sc AS DECIMAL(38,0))"))
          .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("a1"),
        sum(expr("CAST(sc AS DECIMAL(38,0))")).as("t1"),
        sum(expr("CAST(sc AS DECIMAL(38,0)) * sc")).as("t2"))
      .selectExpr(lepDbl: _*)
      .selectExpr(lepMid: _*)
      .selectExpr(lepOut: _*)
  }

  // ------------------------------------------- q419 Cucconi test

  private val cucDbl = Seq("n1", "n2", "s2", "s2c")
    .map(c => s"CAST($c AS DOUBLE) AS ${c}d") ++ Seq(
    "CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) AS nd")
  private val cucMid = Seq(
    "n1d", "n2d",
    "(6.0*s2d - n2d*(nd+1.0)*(2.0*nd+1.0))" +
      " / sqrt(n1d*n2d*(nd+1.0)*(2.0*nd+1.0)*(8.0*nd+11.0)/5.0) AS u",
    "(6.0*s2cd - n2d*(nd+1.0)*(2.0*nd+1.0))" +
      " / sqrt(n1d*n2d*(nd+1.0)*(2.0*nd+1.0)*(8.0*nd+11.0)/5.0) AS v",
    "2.0*(nd*nd - 4.0)/((2.0*nd+1.0)*(8.0*nd+11.0)) - 1.0 AS rho")
  private val cucOut = Seq(
    "CAST(n1d AS BIGINT) AS n1", "CAST(n2d AS BIGINT) AS n2",
    "CAST(round(1000.0 * u) AS BIGINT) AS u_milli",
    "CAST(round(1000.0 * v) AS BIGINT) AS v_milli",
    "CAST(round(1000.0 * (u*u + v*v - 2.0*rho*u*v)" +
      "/(2.0*(1.0 - rho*rho))) AS BIGINT) AS c_milli")

  /** q419 — Cucconi two-sample location-scale test (1968; predates
    * and often outpowers Lepage): C combines U (squared ranks) and V
    * (squared CONTRARY ranks) of the second sample with their exact
    * negative correlation ρ. Deep-discount (≥5%) vs shallow-discount
    * line prices; ranks from the
    * same keyed total order / rangeCumSums machinery as q418, squared
    * -rank sums in DECIMAL(38,0) (pass int64 at ~30× bench SF), U, V,
    * ρ, C assembled in double on the one-row frame with oracle-shared
    * text. */
  val cucconiTest: Q = (s, dir) => {
    import s.implicits._
    import graft.functions.ScaleWindows
    val rows = Tables(s, dir, "lineitem")
      .select(when(round($"l_discount" * 100).cast("long") >= 5L, 1)
        .otherwise(2).as("g"),
        round($"l_extendedprice" * 100).cast("long").as("v"),
        $"l_orderkey".as("ok"), $"l_linenumber".as("lnum"))
    val tot = rows.agg(count(lit(1)).as("nn"))
    val cum = ScaleWindows.rangeCumSums(rows, Seq($"v", $"ok", $"lnum"),
      Seq(when($"g" === 1, 1L).otherwise(0L) -> "c1",
        when($"g" === 2, 1L).otherwise(0L) -> "c2"))
    cum.crossJoin(broadcast(tot))
      .withColumn("p", expr("c1 + c2 + 1"))
      .agg(sum(when($"g" === 1, 1L).otherwise(0L)).as("n1"),
        sum(when($"g" === 2, 1L).otherwise(0L)).as("n2"),
        sum(when($"g" === 2, expr("CAST(p AS DECIMAL(38,0)) * p"))
          .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("s2"),
        sum(when($"g" === 2,
          expr("CAST(nn + 1 - p AS DECIMAL(38,0)) * (nn + 1 - p)"))
          .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("s2c"))
      .selectExpr(cucDbl: _*)
      .selectExpr(cucMid: _*)
      .selectExpr(cucOut: _*)
  }

  // --------------------------------- q420 Yule–Walker AR(2) fit

  private val ywDbl = Seq(
    "CAST(dd AS DOUBLE) AS ddd", "CAST(sy AS DOUBLE) AS syd",
    "CAST(syy AS DOUBLE) AS syyd",
    "CAST(m1 AS DOUBLE) AS m1d", "CAST(p1 AS DOUBLE) AS p1d",
    "CAST(a1 AS DOUBLE) AS a1d", "CAST(b1 AS DOUBLE) AS b1d",
    "CAST(m2 AS DOUBLE) AS m2d", "CAST(p2 AS DOUBLE) AS p2d",
    "CAST(a2 AS DOUBLE) AS a2d", "CAST(b2 AS DOUBLE) AS b2d",
    "dd", "m1", "m2")
  private val ywGam = Seq(
    "dd", "m1", "m2",
    "(syyd - syd*syd/ddd)/ddd AS g0",
    "(p1d - (syd/ddd)*(a1d + b1d) + m1d*(syd/ddd)*(syd/ddd))/ddd AS g1",
    "(p2d - (syd/ddd)*(a2d + b2d) + m2d*(syd/ddd)*(syd/ddd))/ddd AS g2")
  private val ywOut = Seq(
    "CAST(dd AS BIGINT) AS d_days",
    "CAST(round(1000000.0 * g1*(g0 - g2)/(g0*g0 - g1*g1)) AS BIGINT)" +
      " AS phi1_micro",
    "CAST(round(1000000.0 * (g0*g2 - g1*g1)/(g0*g0 - g1*g1)) AS BIGINT)" +
      " AS phi2_micro",
    "CAST(round(1000000.0 * (g0 - (g1*(g0 - g2)/(g0*g0 - g1*g1))*g1" +
      " - ((g0*g2 - g1*g1)/(g0*g0 - g1*g1))*g2)/g0) AS BIGINT)" +
      " AS innov_ratio_micro")

  /** q420 — Yule–Walker AR(2) identification on the daily-revenue
    * series: the autoregression teams fit before believing any
    * "trend" (an AR(2) with φ1+φ2 near 1 mimics drift). Lag products
    * come from two equi self-joins of the O(days) daily frame on
    * t−1/t−2 (gap-safe: only matched pairs contribute — the declared
    * estimator contract, identical in the oracle); all moment sums
    * are exact (Σy·y_lag in DECIMAL(38,0) — daily-cents products pass
    * int64 at ~3× bench SF). γ₀/γ₁/γ₂ and the Cramér solve of the
    * 2×2 Toeplitz system run in double on the one-row frame with
    * oracle-shared text; innov_ratio = σ²/γ₀ is the fraction of
    * variance the AR(2) cannot explain. */
  val yuleWalkerAr2: Q = (s, dir) => {
    import s.implicits._
    val daily = Tables(s, dir, "orders")
      .groupBy(datediff(to_date($"o_orderdate"),
        lit("1995-01-01").cast("date")).cast("long").as("t"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("y"))
    val base = daily.agg(count(lit(1)).as("dd"), sum($"y").as("sy"),
      sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
    def lagMoments(k: Int, p: String) = daily.as("d0")
      .join(daily.select($"t".as("tl"), $"y".as("yl")),
        $"tl" === $"t" - k)
      .agg(count(lit(1)).as(s"m$p"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * yl")).as(s"p$p"),
        sum($"y").as(s"a$p"), sum($"yl").as(s"b$p"))
    base.crossJoin(broadcast(lagMoments(1, "1")))
      .crossJoin(broadcast(lagMoments(2, "2")))
      .selectExpr(ywDbl: _*)
      .selectExpr(ywGam: _*)
      .selectExpr(ywOut: _*)
  }

  // --------------------------- q421 process capability (Cp/Cpk)

  private val capOut = Seq(
    "brand", "CAST(n AS BIGINT) AS n",
    "CAST(round(1000.0 * CAST(sv AS DOUBLE)/CAST(n AS DOUBLE))" +
      " AS BIGINT) AS mean_milli",
    "CAST(round(1000.0 * 49.0 / (6.0 * sqrt((CAST(svv AS DOUBLE)" +
      " - CAST(sv AS DOUBLE)*CAST(sv AS DOUBLE)/CAST(n AS DOUBLE))" +
      "/(CAST(n AS DOUBLE) - 1.0)))) AS BIGINT) AS cp_milli",
    "CAST(round(1000.0 * least(50.0 - CAST(sv AS DOUBLE)/CAST(n AS DOUBLE)," +
      " CAST(sv AS DOUBLE)/CAST(n AS DOUBLE) - 1.0)" +
      " / (3.0 * sqrt((CAST(svv AS DOUBLE)" +
      " - CAST(sv AS DOUBLE)*CAST(sv AS DOUBLE)/CAST(n AS DOUBLE))" +
      "/(CAST(n AS DOUBLE) - 1.0)))) AS BIGINT) AS cpk_milli")

  /** q421 — SPC process-capability indices per part brand:
    * Cp = (USL−LSL)/6σ and Cpk = min(USL−μ, μ−LSL)/3σ for order
    * quantity against the spec window [1, 50] — the manufacturing
    * lens on fill-quantity consistency (Cp < 1 ⇒ the process cannot
    * hold the spec even when centered; Cpk ≪ Cp ⇒ off-center). ONE
    * map-side-combined grouped pass over lineitem⋈part collects
    * exact (n, Σv, Σv²) per brand (Σv² in DECIMAL(38,0) — immune at
    * any SF); the O(brands)=25-row frame computes the indices in
    * double with oracle-shared text. */
  val processCapability: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .join(Tables(s, dir, "part").select($"p_partkey", $"p_brand"),
        $"l_partkey" === $"p_partkey")
      .select($"p_brand".as("brand"), $"l_quantity".cast("long").as("v"))
      .groupBy($"brand")
      .agg(count(lit(1)).as("n"), sum($"v").as("sv"),
        sum(expr("CAST(v AS DECIMAL(38,0)) * v")).as("svv"))
      .selectExpr(capOut: _*)
  }

  // --------------------- q423 Baumgartner–Weiß–Schindler test

  // one per-row term template for both groups: own count no, other
  // count nb, own index ii, combined rank rr
  private val bwsTerm =
    "CAST(round(1000000.0 * power(CAST(rr AS DOUBLE)" +
      " - (CAST(no AS DOUBLE)+CAST(nb AS DOUBLE))/CAST(no AS DOUBLE)" +
      "*CAST(ii AS DOUBLE), 2.0)" +
      " / ((CAST(ii AS DOUBLE)/(CAST(no AS DOUBLE)+1.0))" +
      "*(1.0 - CAST(ii AS DOUBLE)/(CAST(no AS DOUBLE)+1.0))" +
      "*CAST(nb AS DOUBLE)*(CAST(no AS DOUBLE)+CAST(nb AS DOUBLE))" +
      "/CAST(no AS DOUBLE))) AS BIGINT)"
  private val bwsOut = Seq(
    "CAST(n1 AS BIGINT) AS n", "CAST(n2 AS BIGINT) AS m",
    "CAST(round((CAST(sx AS DOUBLE)/CAST(n1 AS DOUBLE)" +
      " + CAST(sy AS DOUBLE)/CAST(n2 AS DOUBLE))/2.0) AS BIGINT)" +
      " AS b_micro")

  /** q423 — Baumgartner–Weiß–Schindler two-sample test (1998):
    * weighted squared ECDF gaps, weighting the TAILS where KS (q192)
    * and CvM (q415) are least sensitive — the completion of the
    * returned-vs-accepted distribution-comparison triple. B averages
    * the two one-sided statistics; each per-row term depends on the
    * row's combined rank rr and within-group index ii, both exact
    * integers from ONE rangeCumSums pass over the keyed total order
    * (q415 tie contract). Each term micro-quantizes from the
    * oracle-shared double template (deterministic per row, so the
    * quantized sum is partition-order independent) and B assembles on
    * the one-row frame. */
  val bwsTest: Q = (s, dir) => {
    import s.implicits._
    import graft.functions.ScaleWindows
    val rows = Tables(s, dir, "lineitem")
      .filter($"l_returnflag".isin("R", "A"))
      .select(when($"l_returnflag" === "R", 1).otherwise(2).as("g"),
        round($"l_extendedprice" * 100).cast("long").as("v"),
        $"l_orderkey".as("ok"), $"l_linenumber".as("lnum"))
    val counts = rows.agg(
      sum(when($"g" === 1, 1L).otherwise(0L)).as("n1"),
      sum(when($"g" === 2, 1L).otherwise(0L)).as("n2"))
    val cum = ScaleWindows.rangeCumSums(rows,
      Seq($"v", $"ok", $"lnum"),
      Seq(when($"g" === 1, 1L).otherwise(0L) -> "c1",
        when($"g" === 2, 1L).otherwise(0L) -> "c2"))
    cum.crossJoin(broadcast(counts))
      .withColumn("no", when($"g" === 1, $"n1").otherwise($"n2"))
      .withColumn("nb", when($"g" === 1, $"n2").otherwise($"n1"))
      .withColumn("ii", when($"g" === 1, expr("c1 + 1"))
        .otherwise(expr("c2 + 1")))
      .withColumn("rr", expr("c1 + c2 + 1"))
      .withColumn("term", expr(bwsTerm))
      .agg(max($"n1").as("n1"), max($"n2").as("n2"),
        sum(when($"g" === 1, $"term").otherwise(0L)).as("sx"),
        sum(when($"g" === 2, $"term").otherwise(0L)).as("sy"))
      .selectExpr(bwsOut: _*)
  }

  // ------------------------------- q424 Dunn post-hoc pairwise

  private val dunnOut = Seq(
    "g_i", "g_j", "CAST(ni AS BIGINT) AS n_i", "CAST(nj AS BIGINT) AS n_j",
    "CAST(round(1000.0 * (CAST(r2i AS DOUBLE)/(2.0*CAST(ni AS DOUBLE))" +
      " - CAST(r2j AS DOUBLE)/(2.0*CAST(nj AS DOUBLE)))" +
      " / sqrt((CAST(nn AS DOUBLE)*(CAST(nn AS DOUBLE)+1.0)/12.0" +
      " - CAST(st AS DOUBLE)/(12.0*(CAST(nn AS DOUBLE)-1.0)))" +
      "*(1.0/CAST(ni AS DOUBLE) + 1.0/CAST(nj AS DOUBLE))))" +
      " AS BIGINT) AS z_milli")

  /** q424 — Dunn's post-hoc pairwise comparisons after q311's
    * Kruskal–Wallis omnibus: which of the 10 priority pairs actually
    * differ, with the tie-corrected pooled-variance z (Dunn 1964).
    * Midranks come from the VALUE HISTOGRAM (q410 discipline): one
    * groupBy on cents + one rangeCumSum gives every distinct value's
    * doubled midrank 2c+m+1; per-group doubled rank sums then land by
    * joining the per-(group, value) counts — all exact integers
    * (DECIMAL(38,0) for the rank sums), with the tie term Σ(t³−t)
    * from the same histogram. Only the 10-row pair frame (broadcast
    * triangular self-join of the 5-row group frame) sees doubles,
    * with oracle-shared text. */
  val dunnPosthoc: Q = (s, dir) => {
    import s.implicits._
    import graft.functions.ScaleWindows
    val rows = Tables(s, dir, "orders")
      .select($"o_orderpriority".as("g"),
        round($"o_totalprice" * 100).cast("long").as("v"))
    // hist pinned (O(distinct cents): rank pass + global moments);
    // grp pinned (O(groups): both sides of the pair cross)
    val hist = rows.groupBy($"v").agg(count(lit(1)).as("m"))
      .trunkCheckpoint()
    val cum = ScaleWindows.rangeCumSum(hist, Seq($"v"), col("m"), "c")
      .withColumn("mr2", expr("2*c + m + 1"))
    val gv = rows.groupBy($"g", $"v").agg(count(lit(1)).as("ngv"))
    val grp = gv.join(cum.select($"v".as("vv"), $"mr2"), $"v" === $"vv")
      .groupBy($"g")
      .agg(sum($"ngv").as("ng"),
        sum(expr("CAST(ngv AS DECIMAL(38,0)) * mr2")).as("r2g"))
      .trunkCheckpoint()
    val glob = hist.agg(sum($"m").as("nn"),
      sum(expr("CAST(m AS DECIMAL(38,0)) * m * m - m")).as("st"))
    val rhs = grp.select($"g".as("g_j"), $"ng".as("nj"),
      $"r2g".as("r2j"))
    grp.select($"g".as("g_i"), $"ng".as("ni"), $"r2g".as("r2i"))
      .crossJoin(broadcast(rhs))
      .filter($"g_i" < $"g_j")
      .crossJoin(broadcast(glob))
      .selectExpr(dunnOut: _*)
  }

  // ------------------------------------- q425 Bradley–Terry strengths

  /** q425 — Bradley–Terry pairwise-preference strength estimation,
    * the batch-native model behind preference-data curation (reward
    * modeling consumes exactly this: pairwise wins → per-item
    * strength). Elo is sequential and order-dependent — useless on a
    * cluster; the BT minorize–maximize update
    * `s_i ← W_i / Σ_j n_ij/(s_i+s_j)` is a pure aggregate over the
    * pair frame, so each iteration is one join + one group-by.
    *
    * Comparisons: within each order, brand a beats brand b when its
    * summed quantity is strictly larger (ties contribute nothing).
    * The self-join runs equi on l_orderkey — co-partitioned, group
    * size bounded by lines-per-order — then collapses to the
    * O(brands²) pair frame (≤600 rows at ANY corpus size); the three
    * fixed MM iterations run entirely on broadcast-small frames.
    *
    * Exactness: strengths live in integer micro-units; each MM term
    * is `n_ij·10¹⁵ div (s_i+s_j)` with the numerator in
    * DECIMAL(38,0) (exact to ~10²² — far past any SF) and positive
    * truncating division, so Spark's `div` and DuckDB's `//` agree
    * bit-for-bit and the whole fit is order-independent. */
  /** Directed within-order brand win counts `(i, j, wij)`, with
    * explicit zero rows for the reverse direction so `n_ij = w_ij +
    * w_ji` lands on a plain equi join. One equi self-join on
    * l_orderkey (co-partitioned, group size bounded by
    * lines-per-order) collapsing to the O(brands²) pair frame —
    * shared by q425 (BT fit) and q426 (transitivity audit). */
  private def pairWins(s: SparkSession, dir: String) = {
    import s.implicits._
    // NOT checkpointed (r10 pinned this corpus-scaled (order, brand)
    // rollup for its self-join; r11's interleaved sf1 A/B measured the
    // pin 15-25% slower at 10x data — PIN 5.40/4.53 s vs NOPIN
    // 4.15/4.17 s — the q465 inversion class, so the rollup recomputes
    // per join side again)
    val ob = Tables(s, dir, "lineitem")
      .join(Tables(s, dir, "part").select($"p_partkey", $"p_brand"),
        $"l_partkey" === $"p_partkey")
      .groupBy($"l_orderkey", $"p_brand")
      .agg(sum($"l_quantity".cast("long")).as("q"))
    val wins = ob.as("a").join(ob.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.p_brand") =!= col("b.p_brand") &&
          col("a.q") > col("b.q"))
      .groupBy(col("a.p_brand").as("wb"), col("b.p_brand").as("lb"))
      .agg(count(lit(1)).as("wl"))
    wins.select($"wb".as("i"), $"lb".as("j"), $"wl")
      .unionByName(
        wins.select($"lb".as("i"), $"wb".as("j"), lit(0L).as("wl")))
      .groupBy($"i", $"j").agg(sum($"wl").as("wij"))
  }

  val bradleyTerry: Q = (s, dir) => {
    import s.implicits._
    // NOT checkpointed (tried in r10, A/B 2.2 → 3.2 s with the pin):
    // nij is already pinned two lines down, so an extra dir0 pin only
    // added a materialization job before the one real consumer pair
    val dir0 = pairWins(s, dir)
    // everything below runs on the O(brands²) pair frame (≤600 rows
    // at any corpus size) — broadcast explicitly so the three MM
    // iterations never shuffle
    // localCheckpoint: the MM loop and the final join each branch off
    // this frame — without pinning, every branch would re-run the
    // corpus self-join. ≤600 rows; released by CheckpointHygiene at
    // the query boundary.
    val nij = dir0.as("p").join(broadcast(dir0.as("r")),
        col("p.i") === col("r.j") && col("p.j") === col("r.i"))
      .select(col("p.i"), col("p.j"), col("p.wij"),
        (col("p.wij") + col("r.wij")).as("nij"))
      .trunkCheckpoint()
    val w = nij.groupBy($"i")
      .agg(sum($"wij").as("wi"), sum($"nij").as("ncomp"))
    var sdf = w.select($"i", lit(1000000L).as("s"))
    for (_ <- 1 to 3) {
      val den = nij
        .join(broadcast(sdf.select($"i".as("ii"), $"s".as("si"))),
          $"i" === $"ii")
        .join(broadcast(sdf.select($"i".as("jj"), $"s".as("sj"))),
          $"j" === $"jj")
        .groupBy($"i")
        .agg(sum(expr("CAST(CAST(nij AS DECIMAL(38,0)) * " +
          "1000000000000000 div (si + sj) AS BIGINT)")).as("den"))
      // GREATEST(..., 1): BT strengths are strictly positive — only
      // micro-truncation can reach 0, and a 0+0 pair would divide by
      // zero on the next pass (NULL here, an error in DuckDB)
      sdf = w.join(broadcast(den), Seq("i"))
        .select($"i", expr("GREATEST(CAST(CAST(wi AS DECIMAL(38,0)) * " +
          "1000000000000000 div den AS BIGINT), 1)").as("s"))
    }
    w.join(broadcast(sdf), Seq("i"))
      .select($"i".as("brand"), $"wi".as("wins"),
        $"ncomp".as("comparisons"), $"s".as("strength_micro"))
  }

  // --------------------------------- q426 preference transitivity

  /** q426 — preference-transitivity audit: the count of circular
    * triads (i beats j beats k beats i by strict majority of
    * within-order wins) over the q425 pair frame. This is the QC
    * gate a preference-data pipeline runs BEFORE fitting
    * Bradley–Terry: intransitive majorities mean noisy or
    * inconsistent preference labels, and Kendall's circular-triad
    * count is the classical measure. The dominance digraph has
    * O(brands²) edges, so the cyclic-triple join is O(brands³)
    * pairs-of-edges at worst (~2.6k rows for 25 brands) at ANY
    * corpus size; every join below the pair frame broadcasts. Each
    * directed 3-cycle is counted once per rotation — the count is
    * exactly divisible by 3. Ties (equal majority counts) join the
    * dominance digraph for neither direction and are reported
    * separately. */
  val prefTransitivity: Q = (s, dir) => {
    import s.implicits._
    val dir0 = pairWins(s, dir).trunkCheckpoint()
    val faced = dir0.as("p").join(broadcast(dir0.as("r")),
        col("p.i") === col("r.j") && col("p.j") === col("r.i"))
      .select(col("p.i").as("u"), col("p.j").as("v"),
        col("p.wij").as("wuv"), col("r.wij").as("wvu"))
    val dom = faced.filter($"wuv" > $"wvu").select($"u", $"v")
      .trunkCheckpoint()
    val items = dir0.select($"i").distinct()
      .agg(count(lit(1)).as("n_items"))
    val edges = faced.agg(
      sum(when($"wuv" > $"wvu", 1L).otherwise(0L)).as("dominant_pairs"),
      expr("CAST(sum(CASE WHEN wuv = wvu THEN 1 ELSE 0 END) div 2 " +
        "AS BIGINT)").as("tied_pairs"))
    val cyc = dom.as("a")
      .join(broadcast(dom.as("b")), col("a.v") === col("b.u"))
      .join(broadcast(dom.as("c")),
        col("b.v") === col("c.u") && col("c.v") === col("a.u"))
      .agg(expr("CAST(count(1) div 3 AS BIGINT)")
        .as("circular_triads"))
    items.crossJoin(broadcast(edges)).crossJoin(broadcast(cyc))
      .select($"n_items", $"dominant_pairs", $"tied_pairs",
        $"circular_triads")
  }

  val queries: Map[String, Q] = Map(
    "q425_bradley_terry" -> bradleyTerry,
    "q426_pref_transitivity" -> prefTransitivity,
    "q408_iv_wald" -> ivWald,
    "q409_chow_test" -> chowTest,
    "q410_brunner_munzel" -> brunnerMunzel,
    "q411_page_trend" -> pageTrend,
    "q413_bartlett" -> bartlett,
    "q414_mood_median" -> moodMedian,
    "q415_cvm_two_sample" -> cvmTwoSample,
    "q416_ansari_bradley" -> ansariBradley,
    "q417_quade_test" -> quadeTest,
    "q418_lepage_test" -> lepageTest,
    "q419_cucconi_test" -> cucconiTest,
    "q420_yule_walker_ar2" -> yuleWalkerAr2,
    "q421_process_capability" -> processCapability,
    "q423_bws_test" -> bwsTest,
    "q424_dunn_posthoc" -> dunnPosthoc,
  )

  val oracles: Map[String, String] = Map(
    "q426_pref_transitivity" ->
      s"""WITH ob AS (SELECT l_orderkey, p_brand,
        |    sum(CAST(l_quantity AS BIGINT))::BIGINT AS q
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2),
        |wins AS (SELECT a.p_brand AS wb, b.p_brand AS lb,
        |    count(*)::BIGINT AS wl
        |  FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey
        |    AND a.p_brand <> b.p_brand AND a.q > b.q
        |  GROUP BY 1, 2),
        |dir0 AS (SELECT i, j, sum(wl)::BIGINT AS wij FROM (
        |    SELECT wb AS i, lb AS j, wl FROM wins
        |    UNION ALL SELECT lb, wb, 0 FROM wins) GROUP BY 1, 2),
        |faced AS (SELECT p.i AS u, p.j AS v, p.wij AS wuv,
        |    r.wij AS wvu
        |  FROM dir0 p JOIN dir0 r ON p.i = r.j AND p.j = r.i),
        |dom AS (SELECT u, v FROM faced WHERE wuv > wvu),
        |items AS (SELECT count(DISTINCT i)::BIGINT AS n_items
        |  FROM dir0),
        |edges AS (SELECT
        |    sum(CASE WHEN wuv > wvu THEN 1 ELSE 0 END)::BIGINT
        |      AS dominant_pairs,
        |    (sum(CASE WHEN wuv = wvu THEN 1 ELSE 0 END) // 2)::BIGINT
        |      AS tied_pairs
        |  FROM faced),
        |cyc AS (SELECT (count(*) // 3)::BIGINT AS circular_triads
        |  FROM dom a JOIN dom b ON a.v = b.u
        |    JOIN dom c ON b.v = c.u AND c.v = a.u)
        |SELECT n_items, dominant_pairs, tied_pairs, circular_triads
        |FROM items, edges, cyc""".stripMargin,
    "q425_bradley_terry" ->
      s"""WITH ob AS (SELECT l_orderkey, p_brand,
        |    sum(CAST(l_quantity AS BIGINT))::BIGINT AS q
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2),
        |wins AS (SELECT a.p_brand AS wb, b.p_brand AS lb,
        |    count(*)::BIGINT AS wl
        |  FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey
        |    AND a.p_brand <> b.p_brand AND a.q > b.q
        |  GROUP BY 1, 2),
        |dir0 AS (SELECT i, j, sum(wl)::BIGINT AS wij FROM (
        |    SELECT wb AS i, lb AS j, wl FROM wins
        |    UNION ALL SELECT lb, wb, 0 FROM wins) GROUP BY 1, 2),
        |nij AS (SELECT p.i, p.j, p.wij,
        |    (p.wij + r.wij)::BIGINT AS nij
        |  FROM dir0 p JOIN dir0 r ON p.i = r.j AND p.j = r.i),
        |w AS (SELECT i, sum(wij)::BIGINT AS wi,
        |    sum(nij)::BIGINT AS ncomp FROM nij GROUP BY 1),
        |s0 AS (SELECT i, 1000000::BIGINT AS s FROM w),
        |d1 AS (SELECT n.i, sum((n.nij::HUGEINT * 1000000000000000)
        |      // (si.s + sj.s))::BIGINT AS den
        |  FROM nij n JOIN s0 si ON n.i = si.i JOIN s0 sj ON n.j = sj.i
        |  GROUP BY 1),
        |s1 AS (SELECT w.i, greatest(((w.wi::HUGEINT * 1000000000000000)
        |    // d1.den)::BIGINT, 1) AS s FROM w JOIN d1 ON w.i = d1.i),
        |d2 AS (SELECT n.i, sum((n.nij::HUGEINT * 1000000000000000)
        |      // (si.s + sj.s))::BIGINT AS den
        |  FROM nij n JOIN s1 si ON n.i = si.i JOIN s1 sj ON n.j = sj.i
        |  GROUP BY 1),
        |s2 AS (SELECT w.i, greatest(((w.wi::HUGEINT * 1000000000000000)
        |    // d2.den)::BIGINT, 1) AS s FROM w JOIN d2 ON w.i = d2.i),
        |d3 AS (SELECT n.i, sum((n.nij::HUGEINT * 1000000000000000)
        |      // (si.s + sj.s))::BIGINT AS den
        |  FROM nij n JOIN s2 si ON n.i = si.i JOIN s2 sj ON n.j = sj.i
        |  GROUP BY 1),
        |s3 AS (SELECT w.i, greatest(((w.wi::HUGEINT * 1000000000000000)
        |    // d3.den)::BIGINT, 1) AS s FROM w JOIN d3 ON w.i = d3.i)
        |SELECT w.i AS brand, w.wi AS wins, w.ncomp AS comparisons,
        |  s3.s AS strength_micro
        |FROM w JOIN s3 ON w.i = s3.i""".stripMargin,
    "q408_iv_wald" ->
      s"""WITH f AS (SELECT
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
        |    CAST(l_quantity AS BIGINT) AS x,
        |    CAST(p_size AS BIGINT) AS z
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |m AS (SELECT count(*)::BIGINT AS n, sum(z)::BIGINT AS sz,
        |    sum(x)::BIGINT AS sx, sum(y::HUGEINT) AS sy,
        |    sum(z::HUGEINT * x) AS szx, sum(z::HUGEINT * y) AS szy,
        |    sum(z::HUGEINT * z) AS szz
        |  FROM f),
        |dbl AS (SELECT n, ${ivDbl.mkString(", ")} FROM m)
        |SELECT ${ivOut.mkString(", ")} FROM dbl""".stripMargin,
    "q409_chow_test" ->
      s"""WITH daily AS (SELECT
        |    date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
        |      ::BIGINT AS t,
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS y
        |  FROM orders GROUP BY 1),
        |m AS (SELECT
        |    sum(CASE WHEN t < 731 THEN 1 ELSE 0 END)::BIGINT AS n1,
        |    sum(CASE WHEN t >= 731 THEN 1 ELSE 0 END)::BIGINT AS n2,
        |    sum(CASE WHEN t < 731 THEN t ELSE 0 END)::BIGINT AS sx1,
        |    sum(CASE WHEN t >= 731 THEN t ELSE 0 END)::BIGINT AS sx2,
        |    sum(CASE WHEN t < 731 THEN y::HUGEINT ELSE 0 END) AS sy1,
        |    sum(CASE WHEN t >= 731 THEN y::HUGEINT ELSE 0 END) AS sy2,
        |    sum(CASE WHEN t < 731 THEN t * t ELSE 0 END)::BIGINT AS sxx1,
        |    sum(CASE WHEN t >= 731 THEN t * t ELSE 0 END)::BIGINT AS sxx2,
        |    sum(CASE WHEN t < 731 THEN t::HUGEINT * y ELSE 0 END) AS sxy1,
        |    sum(CASE WHEN t >= 731 THEN t::HUGEINT * y ELSE 0 END) AS sxy2,
        |    sum(CASE WHEN t < 731 THEN y::HUGEINT * y ELSE 0 END) AS syy1,
        |    sum(CASE WHEN t >= 731 THEN y::HUGEINT * y ELSE 0 END) AS syy2
        |  FROM daily),
        |dbl AS (SELECT n1, n2, ${chowDbl.mkString(", ")} FROM m)
        |SELECT ${chowOut.mkString(", ")} FROM dbl""".stripMargin,
    "q410_brunner_munzel" ->
      s"""WITH hist AS (SELECT
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS v,
        |    sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0
        |      END)::BIGINT AS m1,
        |    sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 0 ELSE 1
        |      END)::BIGINT AS m2
        |  FROM orders GROUP BY 1),
        |cum AS (SELECT v, m1, m2,
        |    coalesce(sum(m1) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      ::BIGINT AS c1,
        |    coalesce(sum(m2) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      ::BIGINT AS c2
        |  FROM hist),
        |u AS (SELECT v, m1, m2, c1, c2,
        |    2*c2 + m2 AS u1, 2*c1 + m1 AS u2 FROM cum),
        |m AS (SELECT sum(m1)::BIGINT AS n1, sum(m2)::BIGINT AS n2,
        |    sum(m1 * (2*(c1+c2) + m1 + m2 + 1))::BIGINT AS k1,
        |    sum(m2 * (2*(c1+c2) + m1 + m2 + 1))::BIGINT AS k2,
        |    sum(m1 * u1)::BIGINT AS h1, sum(m2 * u2)::BIGINT AS h2,
        |    sum(m1::HUGEINT * u1 * u1) AS q1,
        |    sum(m2::HUGEINT * u2 * u2) AS q2
        |  FROM u),
        |mid AS (SELECT ${bmMid.mkString(", ")} FROM m),
        |vv AS (SELECT n1d, n2d, r1b, r2b, ${bmVar.drop(4).mkString(", ")}
        |  FROM mid)
        |SELECT ${bmOut.mkString(", ")} FROM vv""".stripMargin,
    "q411_page_trend" ->
      s"""WITH cells AS (SELECT n_regionkey AS b,
        |    (year(CAST(o_orderdate AS DATE)) - 1994)::BIGINT AS j,
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS rev
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |    JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |rk AS (SELECT b, j, row_number() OVER (
        |    PARTITION BY b ORDER BY rev ASC, j ASC)::BIGINT AS rk
        |  FROM cells),
        |m AS (SELECT count(DISTINCT b)::BIGINT AS b,
        |    sum(j * rk)::BIGINT AS l FROM rk)
        |SELECT ${pageOut.mkString(", ")} FROM m""".stripMargin,
    "q413_bartlett" ->
      s"""WITH g AS (SELECT o_orderpriority AS g, count(*)::BIGINT AS n,
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS sv,
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT)::HUGEINT
        |      * CAST(round(o_totalprice * 100) AS BIGINT)) AS ss,
        |    1::BIGINT AS a
        |  FROM orders GROUP BY 1),
        |q AS (SELECT ${bartRow.mkString(", ")} FROM g),
        |t AS (SELECT n, a, ${bartTerms.mkString(", ")
          .replace("CAST(s2q AS DECIMAL(38,0))", "s2q::HUGEINT")} FROM q),
        |m AS (SELECT sum(a)::BIGINT AS k, sum(n)::BIGINT AS nn,
        |    sum(t_micro)::BIGINT AS st, sum(c_pico)::BIGINT AS sc,
        |    sum(ws) AS sws FROM t)
        |SELECT ${bartOut.mkString(", ")} FROM m""".stripMargin,
    "q414_mood_median" ->
      s"""WITH rows_ AS (SELECT o_orderpriority AS g,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
        |hist AS (SELECT v, count(*)::BIGINT AS m FROM rows_ GROUP BY 1),
        |cum AS (SELECT v, m, coalesce(sum(m) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    ::BIGINT AS c FROM hist),
        |tot AS (SELECT sum(m)::BIGINT AS nn0 FROM hist),
        |med AS (SELECT min(v)::BIGINT AS med FROM cum CROSS JOIN tot
        |  WHERE 2*(c + m) >= nn0),
        |grp AS (SELECT g, count(*)::BIGINT AS ni,
        |    sum(CASE WHEN v > med THEN 1 ELSE 0 END)::BIGINT AS ai,
        |    first(med)::BIGINT AS medv
        |  FROM rows_ CROSS JOIN med GROUP BY 1),
        |ct AS (SELECT sum(ni)::BIGINT AS nn, sum(ai)::BIGINT AS ca,
        |    max(medv)::BIGINT AS med_cents FROM grp),
        |cells AS (SELECT med_cents, nn, ${moodCell.mkString(", ")}
        |  FROM grp CROSS JOIN ct)
        |SELECT med_cents, max(nn)::BIGINT AS n,
        |  sum(cell_micro)::BIGINT AS chi2_micro
        |FROM cells GROUP BY med_cents""".stripMargin,
    "q415_cvm_two_sample" ->
      s"""WITH rows_ AS (SELECT
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 2 END AS g,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
        |    l_orderkey AS ok, l_linenumber AS lnum
        |  FROM lineitem WHERE l_returnflag IN ('R', 'A')),
        |cum AS (SELECT g,
        |    coalesce(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) OVER w, 0)
        |      ::BIGINT AS c1,
        |    coalesce(sum(CASE WHEN g = 2 THEN 1 ELSE 0 END) OVER w, 0)
        |      ::BIGINT AS c2
        |  FROM rows_
        |  WINDOW w AS (ORDER BY v, ok, lnum
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |m AS (SELECT
        |    sum(CASE WHEN g = 1 THEN 1 ELSE 0 END)::BIGINT AS n,
        |    sum(CASE WHEN g = 2 THEN 1 ELSE 0 END)::BIGINT AS m,
        |    sum(CASE WHEN g = 1 THEN c2::HUGEINT * c2 ELSE 0 END) AS su1,
        |    sum(CASE WHEN g = 2 THEN c1::HUGEINT * c1 ELSE 0 END) AS su2
        |  FROM cum)
        |SELECT ${cvmOut.mkString(", ")} FROM m""".stripMargin,
    "q416_ansari_bradley" ->
      s"""WITH rows_ AS (SELECT
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 2 END AS g,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS v,
        |    o_orderkey AS ok
        |  FROM orders WHERE o_orderstatus IN ('F', 'O')),
        |tot AS (SELECT count(*)::BIGINT AS nn FROM rows_),
        |cum AS (SELECT g,
        |    coalesce(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) OVER w, 0)
        |      ::BIGINT AS c1,
        |    coalesce(sum(CASE WHEN g = 2 THEN 1 ELSE 0 END) OVER w, 0)
        |      ::BIGINT AS c2
        |  FROM rows_
        |  WINDOW w AS (ORDER BY v, ok
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |sc AS (SELECT g, least(c1 + c2 + 1, nn - c1 - c2) AS sc
        |  FROM cum CROSS JOIN tot),
        |m AS (SELECT
        |    sum(CASE WHEN g = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
        |    sum(CASE WHEN g = 2 THEN 1 ELSE 0 END)::BIGINT AS n2,
        |    sum(CASE WHEN g = 1 THEN sc::HUGEINT ELSE 0 END) AS a1,
        |    sum(sc::HUGEINT) AS t1, sum(sc::HUGEINT * sc) AS t2
        |  FROM sc),
        |dbl AS (SELECT ${abDbl.mkString(", ")} FROM m)
        |SELECT ${abOut.mkString(", ")} FROM dbl""".stripMargin,
    "q417_quade_test" ->
      s"""WITH cells AS (SELECT n_regionkey AS b,
        |    (year(CAST(o_orderdate AS DATE)) - 1994)::BIGINT AS j,
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS rev
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |    JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |ranked AS (SELECT b, j, row_number() OVER (
        |    PARTITION BY b ORDER BY rev ASC, j ASC)::BIGINT AS r
        |  FROM cells),
        |bl AS (SELECT b, (max(rev) - min(rev))::BIGINT AS rng
        |  FROM cells GROUP BY 1),
        |blq AS (SELECT bl.b AS bq, 1 + sum(CASE WHEN b2.rng < bl.rng
        |      OR (b2.rng = bl.rng AND b2.b < bl.b) THEN 1 ELSE 0 END)
        |    ::BIGINT AS q
        |  FROM bl CROSS JOIN bl b2 GROUP BY bl.b, bl.rng),
        |sc AS (SELECT j, q * (2*r - 8) AS s2
        |  FROM ranked JOIN blq ON b = bq),
        |perj AS (SELECT j, sum(s2 * s2)::BIGINT AS aj,
        |    sum(s2)::BIGINT AS sj2 FROM sc GROUP BY 1),
        |m AS (SELECT count(DISTINCT j)::BIGINT AS kk,
        |    sum(aj)::BIGINT AS a4, sum(sj2 * sj2)::BIGINT AS sb4,
        |    5::BIGINT AS b FROM perj)
        |SELECT ${quadeOut.mkString(", ")} FROM m""".stripMargin,
    "q418_lepage_test" ->
      s"""WITH rows_ AS (SELECT
        |    CASE WHEN l_linestatus = 'F' THEN 1 ELSE 2 END AS g,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
        |    l_orderkey AS ok, l_linenumber AS lnum
        |  FROM lineitem),
        |tot AS (SELECT count(*)::BIGINT AS nn FROM rows_),
        |cum AS (SELECT g,
        |    coalesce(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) OVER w, 0)
        |      ::BIGINT AS c1,
        |    coalesce(sum(CASE WHEN g = 2 THEN 1 ELSE 0 END) OVER w, 0)
        |      ::BIGINT AS c2
        |  FROM rows_
        |  WINDOW w AS (ORDER BY v, ok, lnum
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |sc AS (SELECT g, c1 + c2 + 1 AS p,
        |    least(c1 + c2 + 1, nn - c1 - c2) AS sc
        |  FROM cum CROSS JOIN tot),
        |m AS (SELECT
        |    sum(CASE WHEN g = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
        |    sum(CASE WHEN g = 2 THEN 1 ELSE 0 END)::BIGINT AS n2,
        |    sum(CASE WHEN g = 1 THEN p::HUGEINT ELSE 0 END) AS w1,
        |    sum(CASE WHEN g = 1 THEN sc::HUGEINT ELSE 0 END) AS a1,
        |    sum(sc::HUGEINT) AS t1, sum(sc::HUGEINT * sc) AS t2
        |  FROM sc),
        |dbl AS (SELECT ${lepDbl.mkString(", ")} FROM m),
        |mid AS (SELECT ${lepMid.mkString(", ")} FROM dbl)
        |SELECT ${lepOut.mkString(", ")} FROM mid""".stripMargin,
    "q419_cucconi_test" ->
      s"""WITH rows_ AS (SELECT
        |    CASE WHEN CAST(round(l_discount * 100) AS BIGINT) >= 5
        |      THEN 1 ELSE 2 END AS g,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
        |    l_orderkey AS ok, l_linenumber AS lnum
        |  FROM lineitem),
        |tot AS (SELECT count(*)::BIGINT AS nn FROM rows_),
        |cum AS (SELECT g,
        |    coalesce(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) OVER w, 0)
        |      ::BIGINT AS c1,
        |    coalesce(sum(CASE WHEN g = 2 THEN 1 ELSE 0 END) OVER w, 0)
        |      ::BIGINT AS c2
        |  FROM rows_
        |  WINDOW w AS (ORDER BY v, ok, lnum
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |pp AS (SELECT g, c1 + c2 + 1 AS p, nn FROM cum CROSS JOIN tot),
        |m AS (SELECT
        |    sum(CASE WHEN g = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
        |    sum(CASE WHEN g = 2 THEN 1 ELSE 0 END)::BIGINT AS n2,
        |    sum(CASE WHEN g = 2 THEN p::HUGEINT * p ELSE 0 END) AS s2,
        |    sum(CASE WHEN g = 2 THEN (nn + 1 - p)::HUGEINT * (nn + 1 - p)
        |      ELSE 0 END) AS s2c
        |  FROM pp),
        |dbl AS (SELECT ${cucDbl.mkString(", ")} FROM m),
        |mid AS (SELECT ${cucMid.mkString(", ")} FROM dbl)
        |SELECT ${cucOut.mkString(", ")} FROM mid""".stripMargin,
    "q420_yule_walker_ar2" ->
      s"""WITH daily AS (SELECT
        |    date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
        |      ::BIGINT AS t,
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS y
        |  FROM orders GROUP BY 1),
        |base AS (SELECT count(*)::BIGINT AS dd, sum(y)::BIGINT AS sy,
        |    sum(y::HUGEINT * y) AS syy FROM daily),
        |lag1 AS (SELECT count(*)::BIGINT AS m1,
        |    sum(d0.y::HUGEINT * d1.y) AS p1, sum(d0.y)::BIGINT AS a1,
        |    sum(d1.y)::BIGINT AS b1
        |  FROM daily d0 JOIN daily d1 ON d1.t = d0.t - 1),
        |lag2 AS (SELECT count(*)::BIGINT AS m2,
        |    sum(d0.y::HUGEINT * d2.y) AS p2, sum(d0.y)::BIGINT AS a2,
        |    sum(d2.y)::BIGINT AS b2
        |  FROM daily d0 JOIN daily d2 ON d2.t = d0.t - 2),
        |j AS (SELECT * FROM base CROSS JOIN lag1 CROSS JOIN lag2),
        |dbl AS (SELECT ${ywDbl.mkString(", ")} FROM j),
        |gam AS (SELECT ${ywGam.mkString(", ")} FROM dbl)
        |SELECT ${ywOut.mkString(", ")} FROM gam""".stripMargin,
    "q421_process_capability" ->
      s"""WITH f AS (SELECT p_brand AS brand,
        |    CAST(l_quantity AS BIGINT) AS v
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |g AS (SELECT brand, count(*)::BIGINT AS n, sum(v)::BIGINT AS sv,
        |    sum(v::HUGEINT * v) AS svv
        |  FROM f GROUP BY 1)
        |SELECT ${capOut.mkString(", ")} FROM g""".stripMargin,
    "q423_bws_test" ->
      s"""WITH rows_ AS (SELECT
        |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 2 END AS g,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
        |    l_orderkey AS ok, l_linenumber AS lnum
        |  FROM lineitem WHERE l_returnflag IN ('R', 'A')),
        |counts AS (SELECT
        |    sum(CASE WHEN g = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
        |    sum(CASE WHEN g = 2 THEN 1 ELSE 0 END)::BIGINT AS n2
        |  FROM rows_),
        |cum AS (SELECT g,
        |    coalesce(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) OVER w, 0)
        |      ::BIGINT AS c1,
        |    coalesce(sum(CASE WHEN g = 2 THEN 1 ELSE 0 END) OVER w, 0)
        |      ::BIGINT AS c2
        |  FROM rows_
        |  WINDOW w AS (ORDER BY v, ok, lnum
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |pre AS (SELECT g,
        |    CASE WHEN g = 1 THEN n1 ELSE n2 END AS no,
        |    CASE WHEN g = 1 THEN n2 ELSE n1 END AS nb,
        |    CASE WHEN g = 1 THEN c1 + 1 ELSE c2 + 1 END AS ii,
        |    c1 + c2 + 1 AS rr, n1, n2
        |  FROM cum CROSS JOIN counts),
        |t AS (SELECT g, n1, n2, $bwsTerm AS term FROM pre),
        |m AS (SELECT max(n1)::BIGINT AS n1, max(n2)::BIGINT AS n2,
        |    sum(CASE WHEN g = 1 THEN term ELSE 0 END)::BIGINT AS sx,
        |    sum(CASE WHEN g = 2 THEN term ELSE 0 END)::BIGINT AS sy
        |  FROM t)
        |SELECT ${bwsOut.mkString(", ")} FROM m""".stripMargin,
    "q424_dunn_posthoc" ->
      s"""WITH rows_ AS (SELECT o_orderpriority AS g,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
        |hist AS (SELECT v, count(*)::BIGINT AS m FROM rows_ GROUP BY 1),
        |cum AS (SELECT v, m, coalesce(sum(m) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    ::BIGINT AS c FROM hist),
        |mr AS (SELECT v, 2*c + m + 1 AS mr2 FROM cum),
        |gv AS (SELECT g, v, count(*)::BIGINT AS ngv
        |  FROM rows_ GROUP BY 1, 2),
        |grp AS (SELECT g, sum(ngv)::BIGINT AS ng,
        |    sum(ngv::HUGEINT * mr2) AS r2g
        |  FROM gv JOIN mr USING (v) GROUP BY 1),
        |gtot AS (SELECT sum(m)::BIGINT AS nn,
        |    sum(m::HUGEINT * m * m - m) AS st FROM hist),
        |pairs AS (SELECT a.g AS g_i, b.g AS g_j, a.ng AS ni,
        |    b.ng AS nj, a.r2g AS r2i, b.r2g AS r2j
        |  FROM grp a CROSS JOIN grp b WHERE a.g < b.g),
        |j AS (SELECT * FROM pairs CROSS JOIN gtot)
        |SELECT ${dunnOut.mkString(", ")} FROM j""".stripMargin,
  )
}
