package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-6: completion of the classic TPC-H-shaped OLAP suite.
  *
  * Earlier rounds covered Q1 (q01), Q2 (q301), Q4 (q305), Q5 (q04),
  * Q11 (q302), Q15 (q303), Q17 (q278), Q18 (q279), Q20 (q304),
  * Q21 (q170), Q22 (q280). This module adds the remaining shapes —
  * Q3, Q6, Q7, Q8, Q9, Q10, Q12, Q13, Q14, Q16, Q19 — adapted to the
  * synthetic star schema (no partsupp table; the part↔supplier link
  * derives from lineitem; no l_shipmode/commitdate, so Q12's bucket is
  * a ship-delay band). With these, a user can run every one of the 22
  * classic warehouse query shapes against this engine.
  *
  * Exactness discipline (identical to Analytics.scala): money is exact
  * cents (`round(x*100)` cast long PER ROW, summed as longs — partial
  * aggregation order can never move a result); percentages divide the
  * same two longs on both engines then round on a 6-dec grid;
  * fractional fences are integer cross-multiplies.
  *
  * Scale stance (100 TB): nation/region (fixed 25/5 rows) are the ONLY
  * hint-broadcast frames. customer / supplier / part / orders /
  * lineitem — and every slice derived from them, brand lists
  * included — grow with SF, so their joins are plain equi-joins: AQE
  * broadcasts them while they fit the threshold at test SFs and they
  * degrade gracefully to shuffle joins at 100 TB, where a part brand
  * slice alone is hundreds of millions of rows. Top-k
  * outputs go through orderBy+limit (TakeOrderedAndProject: per-
  * partition heap, no global sort).
  */
object Olap {

  // --------------------------------- q427 TPC-H Q3 shipping priority

  /** q427 — Q3: top-10 unshipped-revenue orders for one market
    * segment. BUILDING customers' orders placed before the cut date
    * with lines still shipping after it; revenue per order; top 10.
    * customer⋈orders shuffles on custkey, then orderkey joins carry
    * lineitem; the limit plans as TakeOrderedAndProject (no global
    * sort at any SF). */
  val shippingPriority: Q = (s, dir) => {
    import s.implicits._
    val cut = "1996-06-01"
    val c = Tables(s, dir, "customer")
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val o = Tables(s, dir, "orders")
      .filter($"o_orderdate" < lit(cut))
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val l = Tables(s, dir, "lineitem")
      .filter($"l_shipdate" > lit(cut))
      .select($"l_orderkey",
        round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100)
          .cast("long").as("cents"))
    o.join(c, $"o_custkey" === $"c_custkey")
      .join(l, $"o_orderkey" === $"l_orderkey")
      .groupBy($"l_orderkey", to_date($"o_orderdate").as("order_date"))
      .agg(sum($"cents").as("rev_cents"))
      .orderBy($"rev_cents".desc, $"l_orderkey".asc)
      .limit(10)
  }

  // --------------------------------- q428 TPC-H Q6 forecast revenue

  /** q428 — Q6: the canonical full-scan predicate aggregate. One year
    * of shipments in a discount band below a quantity cap; revenue
    * forgone if discounts were dropped. Every predicate pushes into
    * the parquet scan; the discount band compares on the exact 0.01
    * grid via `round(d*100)` so float edges can't flip a row. Map-only
    * + one-row reduce: the 100 TB plan is a pure scan. */
  val forecastRevenue: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1996-01-01") &&
        $"l_shipdate" < lit("1997-01-01") &&
        $"l_quantity" < 24)
      .select(round($"l_discount" * 100).cast("long").as("disc_pct"),
        round($"l_extendedprice" * $"l_discount" * 100)
          .cast("long").as("cents"))
      .filter($"disc_pct" >= 5 && $"disc_pct" <= 7)
      .agg(sum($"cents").as("forecast_cents"),
        count(lit(1)).as("n_lines"))
  }

  // --------------------------------- q429 TPC-H Q7 volume shipping

  /** q429 — Q7: bilateral trade volume between two nations by ship
    * year. Supplier and customer frames are pre-filtered to the two
    * nations (broadcast nation dim), so the pair disjunction
    * evaluates on already-small joined rows; lineitem joins orders on
    * orderkey and both party dims on their keys. */
  val volumeShipping: Q = (s, dir) => {
    import s.implicits._
    val nat = Tables(s, dir, "nation")
      .filter($"n_name".isin("NATION_3", "NATION_8"))
      .select($"n_nationkey", $"n_name")
    val sup = Tables(s, dir, "supplier")
      .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name".as("supp_nation"))
    val cus = Tables(s, dir, "customer")
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"n_name".as("cust_nation"))
    val ord = Tables(s, dir, "orders").select($"o_orderkey", $"o_custkey")
    Tables(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1996-01-01") &&
        $"l_shipdate" < lit("1998-01-01"))
      .select($"l_orderkey", $"l_suppkey",
        year($"l_shipdate").cast("long").as("ship_year"),
        round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100)
          .cast("long").as("cents"))
      .join(sup, $"l_suppkey" === $"s_suppkey")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cus, $"o_custkey" === $"c_custkey")
      .filter($"supp_nation" =!= $"cust_nation")
      .groupBy($"supp_nation", $"cust_nation", $"ship_year")
      .agg(sum($"cents").as("rev_cents"))
      .orderBy($"supp_nation", $"cust_nation", $"ship_year")
  }

  // ----------------------------------- q430 TPC-H Q8 market share

  /** q430 — Q8: one nation's share of a part-type market inside one
    * customer region, by order year. Numerator and denominator come
    * from the SAME aggregated pass (conditional sum, not two scans);
    * the share divides the two longs identically on both engines and
    * rounds on the 6-dec grid. */
  val marketShare: Q = (s, dir) => {
    import s.implicits._
    val asia = Tables(s, dir, "nation").filter($"n_regionkey" === 2)
      .select($"n_nationkey")
    val cus = Tables(s, dir, "customer")
      .join(broadcast(asia), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey")
    val promo = Tables(s, dir, "part").filter($"p_type" === "PROMO")
      .select($"p_partkey")
    val sup = Tables(s, dir, "supplier")
      .select($"s_suppkey", $"s_nationkey")
    val ord = Tables(s, dir, "orders")
      .filter($"o_orderdate" >= lit("1996-01-01") &&
        $"o_orderdate" < lit("1998-01-01"))
      .select($"o_orderkey", $"o_custkey",
        year($"o_orderdate").cast("long").as("yr"))
    Tables(s, dir, "lineitem")
      .join(promo, $"l_partkey" === $"p_partkey")
      .select($"l_orderkey", $"l_suppkey",
        round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100)
          .cast("long").as("cents"))
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cus, $"o_custkey" === $"c_custkey")
      .join(sup, $"l_suppkey" === $"s_suppkey")
      .groupBy($"yr")
      .agg(
        sum(when($"s_nationkey" === 7, $"cents").otherwise(0L))
          .as("nation_cents"),
        sum($"cents").as("total_cents"))
      .select($"yr", $"nation_cents", $"total_cents",
        round($"nation_cents" * lit(1.0) / $"total_cents", 6)
          .as("mkt_share"))
      .orderBy($"yr")
  }

  // ---------------------------------- q431 TPC-H Q9 product profit

  /** q431 — Q9 adapted (no partsupp.supplycost): per-(supplier-nation,
    * order-year) profit on a part-name slice, costing each unit at
    * half retail price. Cost stays exact: `qty · round(retail·50)` is
    * integer cents per row. Part slice joins plain (AQE
    * broadcasts it while small; it grows with SF); supplier joins
    * shuffle on suppkey; nation broadcasts. */
  val productProfit: Q = (s, dir) => {
    import s.implicits._
    val pts = Tables(s, dir, "part")
      .filter($"p_name".like("%bolt%"))
      .select($"p_partkey",
        round($"p_retailprice" * 50).cast("long").as("half_retail_cents"))
    val sup = Tables(s, dir, "supplier").select($"s_suppkey", $"s_nationkey")
    val nat = Tables(s, dir, "nation").select($"n_nationkey", $"n_name")
    val ord = Tables(s, dir, "orders")
      .select($"o_orderkey", year($"o_orderdate").cast("long").as("yr"))
    Tables(s, dir, "lineitem")
      .join(pts, $"l_partkey" === $"p_partkey")
      .select($"l_orderkey", $"l_suppkey",
        (round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100)
          .cast("long") -
          $"l_quantity".cast("long") * $"half_retail_cents")
          .as("profit_cents"))
      .join(sup, $"l_suppkey" === $"s_suppkey")
      .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .groupBy($"n_name".as("nation"), $"yr")
      .agg(sum($"profit_cents").as("profit_cents"))
      .orderBy($"nation".asc, $"yr".desc)
  }

  // --------------------------------- q432 TPC-H Q10 returned items

  /** q432 — Q10: top-20 customers by revenue lost to returns in one
    * quarter. orders filters to the quarter, lineitem to returnflag
    * 'R'; grouped revenue joins customer + broadcast nation;
    * TakeOrderedAndProject caps the output pre-exchange. */
  val returnedItems: Q = (s, dir) => {
    import s.implicits._
    val ord = Tables(s, dir, "orders")
      .filter($"o_orderdate" >= lit("1996-10-01") &&
        $"o_orderdate" < lit("1997-01-01"))
      .select($"o_orderkey", $"o_custkey")
    val ret = Tables(s, dir, "lineitem")
      .filter($"l_returnflag" === "R")
      .select($"l_orderkey",
        round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100)
          .cast("long").as("cents"))
    val nat = Tables(s, dir, "nation").select($"n_nationkey", $"n_name")
    ord.join(ret, $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_custkey").agg(sum($"cents").as("rev_cents"))
      .join(Tables(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"c_name", $"n_name",
        round($"c_acctbal" * 100).cast("long").as("acctbal_cents"),
        $"rev_cents")
      .orderBy($"rev_cents".desc, $"c_custkey".asc)
      .limit(20)
  }

  // ------------------------- q433 TPC-H Q12 ship-latency priorities

  /** q433 — Q12 adapted (no l_shipmode/commitdate): lines shipped in
    * 1997 band into ship-delay buckets (days from order to ship), and
    * each bucket counts critical- vs normal-priority orders — Q12's
    * CASE-sum shape verbatim. One orderkey-keyed shuffle, 3-group
    * aggregate. */
  val shipLatencyPriority: Q = (s, dir) => {
    import s.implicits._
    val ord = Tables(s, dir, "orders")
      .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
    Tables(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1997-01-01") &&
        $"l_shipdate" < lit("1998-01-01"))
      .select($"l_orderkey", $"l_shipdate")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .select(
        when(datediff(to_date($"l_shipdate"), to_date($"o_orderdate"))
          <= 30, "1-fast")
          .when(datediff(to_date($"l_shipdate"), to_date($"o_orderdate"))
            <= 90, "2-medium")
          .otherwise("3-slow").as("delay_band"),
        $"o_orderpriority")
      .groupBy($"delay_band")
      .agg(
        sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when($"o_orderpriority".isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy($"delay_band")
  }

  // ---------------------- q434 TPC-H Q13 customer order distribution

  /** q434 — Q13: the count-of-counts histogram. LEFT join keeps
    * order-less customers (their count is 0 — the bucket an inner
    * join silently drops); the priority filter stands in for Q13's
    * comment NOT LIKE. Two aggregations: per-customer count (custkey-
    * keyed shuffle), then the tiny count→customers histogram. */
  val customerDistribution: Q = (s, dir) => {
    import s.implicits._
    val ord = Tables(s, dir, "orders")
      .filter($"o_orderpriority" =!= "5-LOW")
      .select($"o_orderkey", $"o_custkey")
    Tables(s, dir, "customer").select($"c_custkey")
      .join(ord, $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("c_count"))
      .groupBy($"c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy($"custdist".desc, $"c_count".desc)
  }

  // ----------------------------------- q435 TPC-H Q14 promo effect

  /** q435 — Q14: promo revenue share for one ship month. Numerator
    * and denominator from one conditional-sum pass; the percentage is
    * the same long÷long double on both engines, rounded at 6 dec. The
    * part join shuffles on partkey (part grows with SF). */
  val promoEffect: Q = (s, dir) => {
    import s.implicits._
    val pt = Tables(s, dir, "part").select($"p_partkey", $"p_type")
    Tables(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1996-09-01") &&
        $"l_shipdate" < lit("1996-10-01"))
      .select($"l_partkey",
        round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100)
          .cast("long").as("cents"))
      .join(pt, $"l_partkey" === $"p_partkey")
      .agg(
        sum(when($"p_type" === "PROMO", $"cents").otherwise(0L))
          .as("promo_cents"),
        sum($"cents").as("total_cents"))
      .select($"promo_cents", $"total_cents",
        round($"promo_cents" * lit(100.0) / $"total_cents", 6)
          .as("promo_pct"))
  }

  // ------------------------- q436 TPC-H Q16 supplier-count by part

  /** q436 — Q16 adapted (part↔supplier link derived from lineitem):
    * distinct supplier count per (brand, type, size) over a size
    * whitelist, excluding one brand + one type and suppliers in
    * deficit (the complaints stand-in). distinct-count shuffles once
    * on the group key with the suppkey as the distinct column —
    * Spark's two-phase distinct aggregate, no row explosion. */
  val partsSupplierCounts: Q = (s, dir) => {
    import s.implicits._
    val okSupp = Tables(s, dir, "supplier")
      .filter($"s_acctbal" >= 0).select($"s_suppkey")
    val pts = Tables(s, dir, "part")
      .filter($"p_brand" =!= "Brand#21" && $"p_type" =!= "PROMO" &&
        $"p_size".isin(1, 4, 9, 16, 25, 36, 49))
      .select($"p_partkey", $"p_brand", $"p_type", $"p_size")
    Tables(s, dir, "lineitem")
      .select($"l_partkey", $"l_suppkey").distinct()
      .join(okSupp, $"l_suppkey" === $"s_suppkey")
      .join(pts, $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand", $"p_type", $"p_size".cast("long").as("p_size"))
      .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
      .orderBy($"supplier_cnt".desc, $"p_brand".asc, $"p_type".asc,
        $"p_size".asc)
  }

  // ------------------------- q437 TPC-H Q19 discounted revenue (OR)

  /** q437 — Q19: the disjunctive-predicate join. Three (brand, size
    * band, quantity band) conjunctions OR'd together evaluate AFTER
    * the partkey equi-join — Catalyst extracts the common join key,
    * so this is one hash join plus a residual filter, never a
    * nested-loop. A derived brand whitelist pre-filters the part side
    * (the union of the three brands) so the join only carries
    * candidate parts; the slice grows with SF, so no broadcast hint. */
  val discountedRevenue: Q = (s, dir) => {
    import s.implicits._
    val pts = Tables(s, dir, "part")
      .filter($"p_brand".isin("Brand#12", "Brand#23", "Brand#4"))
      .select($"p_partkey", $"p_brand", $"p_size")
    Tables(s, dir, "lineitem")
      .select($"l_partkey", $"l_quantity",
        round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100)
          .cast("long").as("cents"))
      .join(pts, $"l_partkey" === $"p_partkey")
      .filter(
        ($"p_brand" === "Brand#12" && $"p_size".between(1, 5) &&
          $"l_quantity".between(1, 11)) ||
        ($"p_brand" === "Brand#23" && $"p_size".between(1, 10) &&
          $"l_quantity".between(10, 20)) ||
        ($"p_brand" === "Brand#4" && $"p_size".between(1, 15) &&
          $"l_quantity".between(20, 30)))
      .agg(sum($"cents").as("rev_cents"), count(lit(1)).as("n_lines"))
  }

  val queries: Map[String, Q] = Map(
    "q427_shipping_priority" -> shippingPriority,
    "q428_forecast_revenue" -> forecastRevenue,
    "q429_volume_shipping" -> volumeShipping,
    "q430_market_share" -> marketShare,
    "q431_product_profit" -> productProfit,
    "q432_returned_items" -> returnedItems,
    "q433_ship_latency_priority" -> shipLatencyPriority,
    "q434_customer_distribution" -> customerDistribution,
    "q435_promo_effect" -> promoEffect,
    "q436_parts_supplier_counts" -> partsSupplierCounts,
    "q437_discounted_revenue" -> discountedRevenue,
  )

  val oracles: Map[String, String] = Map(
    "q427_shipping_priority" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        |  sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |    AS BIGINT))::BIGINT AS rev_cents
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1996-06-01'
        |  AND l_shipdate > TIMESTAMP '1996-06-01'
        |GROUP BY 1, 2
        |ORDER BY rev_cents DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q428_forecast_revenue" ->
      """SELECT sum(CAST(round(l_extendedprice * l_discount * 100)
        |    AS BIGINT))::BIGINT AS forecast_cents,
        |  count(*)::BIGINT AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_quantity < 24
        |  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7""".stripMargin,
    "q429_volume_shipping" ->
      """WITH nat AS (SELECT n_nationkey, n_name FROM nation
        |  WHERE n_name IN ('NATION_3', 'NATION_8')),
        |sup AS (SELECT s_suppkey, n_name AS supp_nation
        |  FROM supplier JOIN nat ON s_nationkey = n_nationkey),
        |cus AS (SELECT c_custkey, n_name AS cust_nation
        |  FROM customer JOIN nat ON c_nationkey = n_nationkey)
        |SELECT supp_nation, cust_nation,
        |  year(l_shipdate)::BIGINT AS ship_year,
        |  sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |    AS BIGINT))::BIGINT AS rev_cents
        |FROM lineitem
        |JOIN sup ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN cus ON o_custkey = c_custkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND supp_nation <> cust_nation
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,
    "q430_market_share" ->
      """WITH asia AS (SELECT n_nationkey FROM nation WHERE n_regionkey = 2),
        |cus AS (SELECT c_custkey FROM customer
        |  JOIN asia ON c_nationkey = n_nationkey),
        |agg AS (SELECT year(o_orderdate)::BIGINT AS yr,
        |    sum(CASE WHEN s_nationkey = 7
        |      THEN CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |        AS BIGINT) ELSE 0 END)::BIGINT AS nation_cents,
        |    sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |      AS BIGINT))::BIGINT AS total_cents
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN cus ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  WHERE p_type = 'PROMO'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'
        |  GROUP BY 1)
        |SELECT yr, nation_cents, total_cents,
        |  round(nation_cents * 1.0 / total_cents, 6) AS mkt_share
        |FROM agg ORDER BY yr""".stripMargin,
    "q431_product_profit" ->
      """SELECT n_name AS nation, year(o_orderdate)::BIGINT AS yr,
        |  sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |      AS BIGINT)
        |    - CAST(l_quantity AS BIGINT)
        |      * CAST(round(p_retailprice * 50) AS BIGINT))::BIGINT
        |    AS profit_cents
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%bolt%'
        |GROUP BY 1, 2
        |ORDER BY nation ASC, yr DESC""".stripMargin,
    "q432_returned_items" ->
      """WITH rev AS (SELECT o_custkey,
        |    sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |      AS BIGINT))::BIGINT AS rev_cents
        |  FROM orders
        |  JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_orderdate >= TIMESTAMP '1996-10-01'
        |    AND o_orderdate < TIMESTAMP '1997-01-01'
        |    AND l_returnflag = 'R'
        |  GROUP BY o_custkey)
        |SELECT c_custkey, c_name, n_name,
        |  CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents,
        |  rev_cents
        |FROM rev
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY rev_cents DESC, c_custkey ASC
        |LIMIT 20""".stripMargin,
    "q433_ship_latency_priority" ->
      """SELECT CASE
        |    WHEN datediff('day', CAST(o_orderdate AS DATE),
        |      CAST(l_shipdate AS DATE)) <= 30 THEN '1-fast'
        |    WHEN datediff('day', CAST(o_orderdate AS DATE),
        |      CAST(l_shipdate AS DATE)) <= 90 THEN '2-medium'
        |    ELSE '3-slow' END AS delay_band,
        |  sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
        |  sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END)::BIGINT AS low_line_count
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "q434_customer_distribution" ->
      """WITH percust AS (SELECT c_custkey,
        |    count(o_orderkey)::BIGINT AS c_count
        |  FROM customer
        |  LEFT JOIN (SELECT o_orderkey, o_custkey FROM orders
        |    WHERE o_orderpriority <> '5-LOW') o
        |    ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |SELECT c_count, count(*)::BIGINT AS custdist
        |FROM percust
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q435_promo_effect" ->
      """WITH agg AS (SELECT
        |    sum(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |        AS BIGINT) ELSE 0 END)::BIGINT AS promo_cents,
        |    sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |      AS BIGINT))::BIGINT AS total_cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-09-01'
        |    AND l_shipdate < TIMESTAMP '1996-10-01')
        |SELECT promo_cents, total_cents,
        |  round(promo_cents * 100.0 / total_cents, 6) AS promo_pct
        |FROM agg""".stripMargin,
    "q436_parts_supplier_counts" ->
      """SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
        |  count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) link
        |JOIN (SELECT s_suppkey FROM supplier WHERE s_acctbal >= 0) ok
        |  ON l_suppkey = s_suppkey
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#21' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC""".stripMargin,
    "q437_discounted_revenue" ->
      """SELECT sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
        |    AS BIGINT))::BIGINT AS rev_cents,
        |  count(*)::BIGINT AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |    AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |    AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
  )
}
