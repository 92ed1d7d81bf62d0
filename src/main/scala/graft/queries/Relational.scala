package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Core relational operator coverage (SURVEY.md §2.2-§2.6) instantiated on
  * the synthetic testdata tables.
  *
  * Scale notes (100 TB design stance):
  *  - Dimension joins (nation/region/supplier/part) are explicitly
  *    `broadcast()` — they stay small at any scale factor.
  *  - Fact-fact joins shuffle on their equi-keys and rely on AQE for skew.
  *  - All aggregations are expressed so Spark's partial (map-side)
  *    aggregation applies — plain groupBy/agg over columnar scans.
  *  - Filters/projections stay in the initial select/filter so they push
  *    into the parquet scan (verified via .explain PushedFilters).
  */
object Relational {

  /** q01 — hash aggregate with map-side combine (ref A1/A5/A7 family;
    * ref: sentiment_dashboard.py:194-199, articles.sql:36-40).
    * TPC-H-Q1-shaped pricing summary over lineitem. */
  val pricingSummary: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 4)
          .as("sum_disc_price"),
        // exact-grid trick: round(sum,2) is the same double on any engine,
        // so the quotient and its 6-dec rounding match the oracle exactly.
        round(round(sum($"l_quantity"), 2) / count(lit(1)), 6).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** q02 — typed projection + rename + recode (ref P1/P2/X10:
    * stg_articles.sql:7-23, stg_sentiment.sql:7-11,
    * sentiment_dashboard.py:62-65). */
  val typedProjection: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "events").select(
      $"event_id",
      upper($"event_type").as("event_type_uc"),
      $"user_id".cast("string").as("user_id_str"),
      to_date(date_trunc("day", $"ts")).as("event_date"),
      when($"value" === 0.0, lit(null)).otherwise($"value").as("value_nz"),
      // Decimal cast coverage, but emitted as double: the only round-1
      // gate failure was this column as DECIMAL(9,2) — Spark-parquet and
      // DuckDB decimals hash differently in the driver's comparator even
      // when values are identical. Round-tripping through the decimal
      // type keeps the cast semantics under test with a portable output.
      $"value".cast("decimal(9,2)").cast("double").as("value_dec"))
  }

  /** q03 — conjunctive filter + pruned projection; every predicate is
    * parquet-pushdown-eligible (ref F1-F5: transformed.sql:83-87,231-232,
    * sentiment_batch_job_tasks.py:53-56). */
  val filterPushdown: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1998-01-01").cast("timestamp") &&
        $"l_returnflag" =!= "N" &&
        $"l_quantity" >= 25)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity",
        $"l_extendedprice", to_date($"l_shipdate").as("ship_date"))
  }

  /** q04 — inner equi-join chain fact→dim→dim with broadcast dims
    * (ref J1: transformed.sql:226-230). Flagship query. */
  val revenueByNation: Q = (s, dir) => {
    import s.implicits._
    val o = Tables(s, dir, "orders")
    val c = Tables(s, dir, "customer")
    val n = Tables(s, dir, "nation")
    val r = Tables(s, dir, "region")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy($"r_name", $"n_name")
      .agg(round(sum($"o_totalprice"), 2).as("total_revenue"),
        count(lit(1)).as("order_cnt"))
      .orderBy($"r_name", $"n_name")
  }

  /** q05 — left outer join preserving unmatched rows + null-safe agg
    * (ref J3: sentiment_dashboard.py:44-47). */
  val ordersPerCustomer: Q = (s, dir) => {
    import s.implicits._
    val c = Tables(s, dir, "customer")
    val o = Tables(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy($"c_custkey", $"c_mktsegment")
      .agg(count($"o_orderkey").as("order_cnt"),
        round(coalesce(sum($"o_totalprice"), lit(0.0)), 2).as("total_spent"))
  }

  /** q06 — latest-version-per-key as a deterministic row_number window,
    * the idiomatic rewrite of the reference's max-ts right-join
    * (ref J2/A4: articles.sql:36-57, sentiment_dashboard.py:36). */
  val latestEventPerUser: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts".desc, $"event_id".desc)
    Tables(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id",
        $"event_id".as("latest_event_id"),
        $"event_type".as("latest_event_type"),
        to_date(date_trunc("day", $"ts")).as("latest_day"))
  }

  /** q07 — first-row-per-group (deterministic DISTINCT ON; ref A4/W2:
    * articles.sql:8, transformed.sql:43-51). */
  val firstOrderPerCustStatus: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey", $"o_orderstatus")
      .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
    Tables(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"o_custkey", $"o_orderstatus",
        $"o_orderkey".as("first_orderkey"),
        to_date($"o_orderdate").as("first_orderdate"),
        $"o_totalprice".as("first_totalprice"))
  }

  /** q08 — referential anti-join (ref J8: datamarts.yaml relationships
    * tests): customers with no high-value order. */
  val customersNoBigOrder: Q = (s, dir) => {
    import s.implicits._
    val c = Tables(s, dir, "customer")
    val big = Tables(s, dir, "orders").filter($"o_totalprice" > 300000.0)
    c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
      .select($"c_custkey", $"c_name")
  }

  /** q170 — lone-late-supplier audit (the TPC-H Q21 shape: one EXISTS
    * and one NOT EXISTS against OTHER lineitems of the same order):
    * suppliers who were the ONLY late shipper in a multi-supplier
    * order, counted per supplier. The declarative-rewrite story: both
    * correlated subqueries collapse into ONE per-(order, supplier)
    * late flag plus ONE per-order aggregate (n_supps, n_late) — the
    * qualifying predicate becomes `late ∧ n_supps > 1 ∧ n_late = 1` —
    * so lineitem is never self-joined per predicate. Plan: the
    * lineitem⋈orders equi-join and both aggregates all key on
    * orderkey (one shuffle, partitioning reused), then one
    * supplier-keyed count. The ORACLE is the independent textbook
    * EXISTS / NOT EXISTS formulation, proving the rewrite. "Late" =
    * shipped > 60 days after the order date. */
  val loneLateSupplier: Q = (s, dir) => {
    import s.implicits._
    val li = Tables(s, dir, "lineitem")
      .select($"l_orderkey", $"l_suppkey", to_date($"l_shipdate").as("sd"))
    val ord = Tables(s, dir, "orders")
      .select($"o_orderkey".as("l_orderkey"),
        to_date($"o_orderdate").as("od"))
    val perSupp = li.join(ord, Seq("l_orderkey"))
      .groupBy($"l_orderkey", $"l_suppkey")
      .agg(max(when(datediff($"sd", $"od") > 60, 1).otherwise(0))
        .as("late"))
    val perOrder = perSupp.groupBy($"l_orderkey")
      .agg(count(lit(1)).as("n_supps"), sum($"late").as("n_late"))
    perSupp.filter($"late" === 1)
      .join(perOrder, Seq("l_orderkey"))
      .filter($"n_supps" > 1 && $"n_late" === 1)
      .groupBy($"l_suppkey".as("supp"))
      .agg(count(lit(1)).as("numwait"))
  }

  val queries: Map[String, Q] = Map(
    "q01_pricing_summary" -> pricingSummary,
    "q02_typed_projection" -> typedProjection,
    "q03_filter_pushdown" -> filterPushdown,
    "q04_revenue_by_nation" -> revenueByNation,
    "q05_orders_per_customer" -> ordersPerCustomer,
    "q06_latest_event_per_user" -> latestEventPerUser,
    "q07_first_order_per_cust_status" -> firstOrderPerCustStatus,
    "q08_customers_no_big_order" -> customersNoBigOrder,
    "q170_lone_late_supplier" -> loneLateSupplier,
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
        | round(round(sum(l_quantity), 2) / count(*), 6) AS avg_qty,
        | count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_typed_projection" ->
      """SELECT event_id, upper(event_type) AS event_type_uc,
        | CAST(user_id AS VARCHAR) AS user_id_str,
        | CAST(date_trunc('day', ts) AS DATE) AS event_date,
        | CASE WHEN value = 0.0 THEN NULL ELSE value END AS value_nz,
        | CAST(CAST(value AS DECIMAL(9,2)) AS DOUBLE) AS value_dec
        |FROM events""".stripMargin,
    "q03_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        | CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_returnflag <> 'N' AND l_quantity >= 25""".stripMargin,
    "q04_revenue_by_nation" ->
      """SELECT r_name, n_name,
        | round(sum(o_totalprice), 2) AS total_revenue,
        | count(*) AS order_cnt
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q05_orders_per_customer" ->
      """SELECT c_custkey, c_mktsegment,
        | count(o_orderkey) AS order_cnt,
        | round(coalesce(sum(o_totalprice), 0), 2) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_mktsegment""".stripMargin,
    "q06_latest_event_per_user" ->
      """SELECT user_id, event_id AS latest_event_id,
        | event_type AS latest_event_type,
        | CAST(date_trunc('day', ts) AS DATE) AS latest_day
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) t
        |WHERE rn = 1""".stripMargin,
    "q07_first_order_per_cust_status" ->
      """SELECT o_custkey, o_orderstatus,
        | o_orderkey AS first_orderkey,
        | CAST(o_orderdate AS DATE) AS first_orderdate,
        | o_totalprice AS first_totalprice
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY o_custkey, o_orderstatus
        |        ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
        |      FROM orders) t
        |WHERE rn = 1""".stripMargin,
    "q08_customers_no_big_order" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)""".stripMargin,
    "q170_lone_late_supplier" ->
      """WITH l AS (SELECT l_orderkey, l_suppkey,
        |    CAST(l_shipdate AS DATE) AS sd FROM lineitem),
        |o AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od
        |  FROM orders),
        |late AS (SELECT DISTINCT l.l_orderkey, l.l_suppkey
        |  FROM l JOIN o ON l.l_orderkey = o.o_orderkey
        |  WHERE sd > od + 60)
        |SELECT l1.l_suppkey AS supp, count(*)::BIGINT AS numwait
        |FROM late l1
        |WHERE EXISTS (SELECT 1 FROM l l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY 1""".stripMargin,
  )
}
