package graft.queries

import graft.Materialize.TrunkCheckpointOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextOps

/** Window-rewrite, set-op, temporal and statistics operators
  * (SURVEY.md §2.3 J4-J7, §2.4, §2.6).
  *
  * The correlated-subquery backfills of the reference
  * (transformed.sql:41-54,116-151,191-205) are deliberately NOT ported as
  * correlated subqueries: at scale they decorrelate into per-key window
  * aggregates — one shuffle per distinct key-set, no join at all.
  */
object Shaping {

  /** q09 — single-tier NULL backfill via partition-wide aggregate window,
    * the decorrelated form of the reference's correlated
    * `DISTINCT content ... LIMIT 1` lookup (ref J4: transformed.sql:41-54).
    * NULLs are manufactured deterministically (click events) since the
    * synthetic data has none. */
  val backfillWindow: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id")
    Tables(s, dir, "events")
      .withColumn("v",
        when($"event_type" === "click", lit(null).cast("double"))
          .otherwise($"value"))
      .select($"event_id", $"user_id",
        coalesce($"v", min($"v").over(w)).as("value_filled"))
  }

  /** q10 — two-tier fallback backfill: narrow key first, wider key second
    * (ref J5/J6: transformed.sql:116-151). */
  val backfillTwoTier: Q = (s, dir) => {
    import s.implicits._
    val day = to_date(date_trunc("day", $"ts"))
    val w1 = Window.partitionBy($"user_id", $"day")
    val w2 = Window.partitionBy($"user_id")
    Tables(s, dir, "events")
      .withColumn("day", day)
      .withColumn("v",
        when($"event_type" === "click", lit(null).cast("double"))
          .otherwise($"value"))
      .select($"event_id",
        coalesce($"v", min($"v").over(w1), min($"v").over(w2))
          .as("value_filled"))
  }

  /** q11 — disjunctive-predicate correlated MIN as `least` of three
    * windowed mins (ref J7: transformed.sql:191-205). Valid because every
    * outer row matches all three of its own key branches, so MIN over the
    * OR-set equals the least of the three per-branch mins — and it avoids
    * the quadratic theta-join a naive translation would produce. */
  val minDisjunctive: Q = (s, dir) => {
    import s.implicits._
    val byPart = Window.partitionBy($"l_partkey")
    val bySupp = Window.partitionBy($"l_suppkey")
    val byOrder = Window.partitionBy($"l_orderkey")
    Tables(s, dir, "lineitem").select(
      $"l_orderkey", $"l_linenumber",
      least(min($"l_extendedprice").over(byPart),
        min($"l_extendedprice").over(bySupp),
        min($"l_extendedprice").over(byOrder)).as("min_related_price"))
  }

  /** q12 — union-all of per-source batches + dedup (ref U1/U2:
    * newsairflowtasks.py:27-52, utils.py:72). */
  val unionDedup: Q = (s, dir) => {
    import s.implicits._
    val e = Tables(s, dir, "events")
    val a = e.filter($"event_type" === "click")
      .select($"user_id", $"event_type")
    val b = e.filter($"event_type".isin("click", "view"))
      .select($"user_id", $"event_type")
    a.unionByName(b).distinct()
  }

  /** q13 — daily downsample with empty-day gap fill (ref A9:
    * sentiment_dashboard.py:296-300; pandas resample('D') emits NaN rows
    * for gap days — reproduced via a generated date spine left join). */
  val dailyResample: Q = (s, dir) => {
    import s.implicits._
    // restrict to a sparse slice so empty days exist and the gap-fill
    // branch genuinely executes at the correctness-gate scale factor
    val e = Tables(s, dir, "events")
      .filter($"event_type" === "signup" && $"value" > 150.0)
    val daily = e
      .groupBy(to_date(date_trunc("day", $"ts")).as("day"))
      .agg(
        round(round(sum($"value"), 2) / count(lit(1)), 6).as("avg_value"),
        count(lit(1)).as("n_events"))
    val spine = e
      .agg(min(to_date(date_trunc("day", $"ts"))).as("d0"),
        max(to_date(date_trunc("day", $"ts"))).as("d1"))
      .select(explode(sequence($"d0", $"d1")).as("day"))
    spine.join(daily, Seq("day"), "left")
      .select($"day", $"avg_value",
        coalesce($"n_events", lit(0L)).as("n_events"))
  }

  /** q14 — grouped mean/stddev/min/max per category (ref A5/A7/A8:
    * sentiment_dashboard.py:194-199,281-288,349-359; pandas sample std =
    * stddev_samp). */
  val groupedStats: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "events")
      .groupBy($"event_type")
      .agg(
        round(round(sum($"value"), 2) / count(lit(1)), 6).as("avg_value"),
        round(stddev_samp($"value"), 4).as("std_value"),
        min($"value").as("min_value"),
        max($"value").as("max_value"),
        count($"value").as("n_nonnull"))
  }

  /** q15 — value_counts with deterministic ordering (ref A6:
    * sentiment_dashboard.py:263). */
  val eventTypeCounts: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "events")
      .groupBy($"event_type").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"event_type".asc)
  }

  /** q41 — gap-based sessionization (gaps-and-islands): per-user
    * sessions split at 30-minute inactivity gaps, one lag window + one
    * running-sum window + one aggregate. Streaming counterpart with
    * bounded state: graft.streaming.Sessionize. All timestamps are
    * truncated to whole seconds first so the arithmetic is
    * engine-exact. */
  val sessionize: Q = (s, dir) => {
    import s.implicits._
    val order = Window.partitionBy($"user_id")
      .orderBy($"sec".asc, $"event_id".asc)
    Tables(s, dir, "events")
      .select($"user_id", $"event_id",
        unix_timestamp(date_trunc("second", $"ts")).as("sec"))
      .withColumn("prev", lag($"sec", 1).over(order))
      .withColumn("brk",
        when($"prev".isNull || $"sec" - $"prev" > 1800, 1).otherwise(0))
      .withColumn("session_seq", sum($"brk").over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_seq")
      .agg(count(lit(1)).as("n_events"),
        min($"sec").as("start_sec"),
        (max($"sec") - min($"sec")).as("duration_s"))
  }

  /** q47 — ROLLUP hierarchy aggregation (beyond the reference, which
    * has no grouping sets): per (returnflag, linestatus), per
    * returnflag subtotals, and the grand total in one pass. */
  val rollupSummary: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(round(sum($"l_quantity"), 2).as("sum_qty"),
        count(lit(1)).as("n_rows"))
  }

  /** q93 — CUBE over (status, priority): all four grouping sets in one
    * pass through Expand — q47's ROLLUP covers the hierarchy; CUBE
    * covers the full cross of subtotal dimensions (dashboard "any
    * slice" totals without N separate scans). */
  val cubeSummary: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "orders")
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(round(sum($"o_totalprice"), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
  }

  /** q94 — decile bucketing of a per-document quality score (curriculum
    * /mixture assignment: sample rates per quality band). ntile needs a
    * TOTAL order — ties broken by doc_id — or bucket boundaries are
    * nondeterministic across engines and runs. The naive
    * `ntile(10).over(Window.orderBy(...))` is a single-partition sort
    * of the corpus; [[graft.functions.ScaleWindows.rangeNtile]] keeps
    * the exact same bucket values from a range-partitioned parallel
    * sort + per-partition offset carry — no unpartitioned window in
    * the plan. */
  val qualityDeciles: Q = (s, dir) => {
    import s.implicits._
    val scored = Tables(s, dir, "documents")
      .select($"doc_id", $"source",
        (size(TextOps.tokens($"text")) % 100).as("q_score"))
    graft.functions.ScaleWindows.rangeNtile(scored, 10,
      Seq($"q_score".asc, $"doc_id".asc), "decile")
      .select($"doc_id", $"source", $"q_score", $"decile")
  }

  /** q133 — event-transition matrix (first-order Markov model of user
    * behavior): per-user event sequences yield (current → next) type
    * pairs via one lead window, counted and row-normalized into
    * transition probabilities — the behavioral model behind "what
    * usually follows a click" and the input to next-event prediction
    * baselines. Ordering is total (second-truncated ts, event_id) so
    * the sequence — and therefore the matrix — is deterministic.
    * Probabilities are exact-count rationals micro-quantized with
    * integer division. One user-keyed window + one (from, to)
    * aggregate; matrix size is |types|², independent of volume. */
  val markovTransitions: Q = (s, dir) => {
    import s.implicits._
    val order = Window.partitionBy($"user_id")
      .orderBy($"sec".asc, $"event_id".asc)
    val pairs = Tables(s, dir, "events")
      .select($"user_id", $"event_id", $"event_type",
        unix_timestamp(date_trunc("second", $"ts")).as("sec"))
      .withColumn("next_type", lead($"event_type", 1).over(order))
      .filter($"next_type".isNotNull)
    val counts = pairs.groupBy($"event_type".as("from_type"),
      $"next_type".as("to_type")).agg(count(lit(1)).as("n"))
    val totals = counts.groupBy($"from_type")
      .agg(sum($"n").as("row_total"))
    counts.join(totals, Seq("from_type"))
      .select($"from_type", $"to_type", $"n",
        expr("(1000000 * n) div row_total").as("p_micro"))
  }

  /** q153 — transition dwell-time percentiles: for each (from → to)
    * event transition, how long users linger — p50/p90 of the gap in
    * seconds — the timing layer over q133's transition counts ("click
    * → purchase happens, but how fast?"). Gaps are exact integer
    * seconds from the same total order as q133; per-transition
    * percentiles use the exact array percentile (q54's form) over the
    * (from,to)-grouped gaps — |types|² groups, so the buffers are
    * bounded by transition cardinality, not volume. */
  val dwellPercentiles: Q = (s, dir) => {
    import s.implicits._
    val order = Window.partitionBy($"user_id")
      .orderBy($"sec".asc, $"event_id".asc)
    val gaps = Tables(s, dir, "events")
      .select($"user_id", $"event_id", $"event_type",
        unix_timestamp(date_trunc("second", $"ts")).as("sec"))
      .withColumn("next_type", lead($"event_type", 1).over(order))
      .withColumn("gap_s", lead($"sec", 1).over(order) - $"sec")
      .filter($"next_type".isNotNull)
    gaps.groupBy($"event_type".as("from_type"),
        $"next_type".as("to_type"))
      .agg(count(lit(1)).as("n"),
        expr("percentile(gap_s, 0.5)").as("p50_s"),
        expr("percentile(gap_s, 0.9)").as("p90_s"))
      .select($"from_type", $"to_type", $"n",
        round($"p50_s", 2).as("p50_s"), round($"p90_s", 2).as("p90_s"))
  }

  /** q154 — RFM segmentation (recency / frequency / monetary quartile
    * codes): every customer scored 1-4 on each axis by ntile over the
    * customer-level aggregate — the classic CRM segmentation, built
    * entirely on the POST-aggregate frame (rows = customers, not
    * orders). Deterministic total orders (metric, then custkey) keep
    * quartile edges engine-exact, q94's discipline. Each axis is a
    * [[graft.functions.ScaleWindows.rangeNtile]] (range-partitioned
    * parallel sort + offset carry), NOT a global-order window — three
    * unpartitioned ntile sorts of the O(customers) frame would each be
    * single-task at 100×. */
  val rfmSegments: Q = (s, dir) => {
    import s.implicits._
    import graft.functions.ScaleWindows.rangeNtile
    val cust = Tables(s, dir, "orders")
      .groupBy($"o_custkey")
      .agg(max(to_date($"o_orderdate")).as("last_day"),
        count(lit(1)).as("freq"),
        sum(round($"o_totalprice" * 100).cast("long")).as("monetary_c"))
      .withColumn("recency",
        datediff(lit("1998-12-31").cast("date"), $"last_day"))
      .select($"o_custkey", $"recency", $"freq", $"monetary_c")
    val r = rangeNtile(cust, 4,
      Seq($"recency".asc, $"o_custkey".asc), "r_quartile")
    val rf = rangeNtile(r, 4,
      Seq($"freq".desc, $"o_custkey".asc), "f_quartile")
    rangeNtile(rf, 4,
      Seq($"monetary_c".desc, $"o_custkey".asc), "m_quartile")
      .select($"o_custkey", $"recency", $"freq", $"monetary_c",
        $"r_quartile", $"f_quartile", $"m_quartile")
  }

  /** q150 — aggregate navigation (serving slices FROM the cube): the
    * classic OLAP contract that a materialized CUBE subsumes every
    * coarser rollup — per-status totals, per-priority totals and the
    * grand total are all answered by selecting grouping-id slices of
    * ONE cube pass, never re-scanning orders. The ORACLE computes each
    * slice directly from the base table, proving slice ≡ direct
    * aggregate. grouping() disambiguates real NULL keys from subtotal
    * rows — the correctness trap naive cube consumers hit. At 100 TB
    * the cube is the nightly artifact; every dashboard reads
    * O(groups) rows from it. */
  val cubeServing: Q = (s, dir) => {
    import s.implicits._
    val cube = Tables(s, dir, "orders")
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(round(sum($"o_totalprice"), 2).as("revenue"),
        count(lit(1)).as("n_orders"),
        grouping($"o_orderstatus").as("g_s"),
        grouping($"o_orderpriority").as("g_p"))
    val byStatus = cube.filter($"g_s" === 0 && $"g_p" === 1)
      .select(lit("by_status").as("slice"),
        $"o_orderstatus".as("key"), $"revenue", $"n_orders")
    val byPriority = cube.filter($"g_s" === 1 && $"g_p" === 0)
      .select(lit("by_priority").as("slice"),
        $"o_orderpriority".as("key"), $"revenue", $"n_orders")
    val grand = cube.filter($"g_s" === 1 && $"g_p" === 1)
      .select(lit("grand").as("slice"), lit("ALL").as("key"),
        $"revenue", $"n_orders")
    byStatus.unionByName(byPriority).unionByName(grand)
  }

  /** q164 — lifecycle / churn-risk report: users bucketed by days
    * since their last event against the observation anchor (active <2,
    * cooling <3, churned otherwise — thresholds sit inside the
    * synthetic activity spread so every bucket genuinely fires) with
    * per-bucket counts and exact
    * micro shares — the retention dashboard's opening table. One
    * max-per-user aggregate + one bucket rollup. */
  val churnBuckets: Q = (s, dir) => {
    import s.implicits._
    val last = Tables(s, dir, "events")
      .groupBy($"user_id")
      .agg(max(to_date($"ts")).as("last_day"))
      .select($"user_id",
        datediff(lit("2024-01-31").cast("date"), $"last_day")
          .as("days_idle"))
    val bucketed = last.select(
      when($"days_idle" < 2, "active")
        .when($"days_idle" < 3, "cooling")
        .otherwise("churned").as("bucket"))
    val counts = bucketed.groupBy($"bucket")
      .agg(count(lit(1)).as("n_users"))
    val tot = counts.agg(sum($"n_users").as("t"))
    counts.crossJoin(broadcast(tot))
      .select($"bucket", $"n_users",
        expr("(1000000 * n_users) div t").as("share_micro"))
  }

  /** q165 — session-basket lift matrix (market-basket analysis at
    * session granularity): for every event-type pair, lift =
    * P(A∧B) / (P(A)·P(B)) over sessions — which behaviors co-occur
    * beyond chance ("users who error in a session also purchase?").
    * Sessions reduce to their DISTINCT type sets first (≤|types| rows
    * per session), the pair join runs within session ids only, and
    * lift is an exact integer micro-ratio of counts — the
    * recommender/diagnosis primitive, never an all-pairs user join. */
  val sessionLift: Q = (s, dir) => {
    import s.implicits._
    val st = sessionTypes(s, dir)
    val ns = st.agg(countDistinct($"sid").as("n_sessions"))
    val typeCounts = st.groupBy($"event_type")
      .agg(count(lit(1)).as("n"))
    val pairs = st.as("a").join(st.as("b"), Seq("sid"))
      .filter(col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(typeCounts.select($"event_type".as("type_a"),
        $"n".as("n_a")), Seq("type_a"))
      .join(typeCounts.select($"event_type".as("type_b"),
        $"n".as("n_b")), Seq("type_b"))
      .crossJoin(broadcast(ns))
      .select($"type_a", $"type_b", $"n_ab", $"n_a", $"n_b",
        expr("(1000000 * n_ab * n_sessions) div (n_a * n_b)")
          .as("lift_micro"))
  }

  /** Distinct event types per q41 session — shared by q165. */
  private val sessionTypes: Q = (s, dir) => {
    import s.implicits._
    val order = Window.partitionBy($"user_id")
      .orderBy($"sec".asc, $"event_id".asc)
    Tables(s, dir, "events")
      .select($"user_id", $"event_id", $"event_type",
        unix_timestamp(date_trunc("second", $"ts")).as("sec"))
      .withColumn("prev", lag($"sec", 1).over(order))
      .withColumn("brk",
        when($"prev".isNull || $"sec" - $"prev" > 1800, 1).otherwise(0))
      .withColumn("session_seq", sum($"brk").over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(concat($"user_id", lit("#"), $"session_seq").as("sid"),
        $"event_type")
      .distinct()
  }

  /** q163 — daily bounce rate: the fraction of sessions (q41's
    * gaps-and-islands sessions) that contain exactly one event, rolled
    * up by session start day — the engagement-health number every
    * product dashboard opens with. Builds directly on the session
    * frame (rows = sessions, not events); the rate is an exact integer
    * micro-division. */
  val bounceRate: Q = (s, dir) => {
    import s.implicits._
    sessionize(s, dir)
      .select(to_date(timestamp_seconds($"start_sec")).as("day"),
        ($"n_events" === 1).as("b"))
      .groupBy($"day")
      .agg(count(lit(1)).as("n_sessions"),
        sum(when($"b", 1L).otherwise(0L)).as("n_bounces"))
      .select($"day", $"n_sessions", $"n_bounces",
        expr("(1000000 * n_bounces) div n_sessions").as("bounce_micro"))
  }

  /** q148 — diversified top-k (per-group quota ranking): the global
    * top-10 documents by quality, but at most 2 per source — the
    * serving constraint every feed/search ranker carries so one
    * prolific source can't monopolize the page. Two ranks: the
    * per-source quota cut (WindowGroupLimit — ≤2 rows per source
    * survive each partition before any exchange), then the global
    * top-10 as TakeOrderedAndProject over the ≤2·|sources| survivors.
    * Never a global sort of the corpus. */
  val diversifiedTopK: Q = (s, dir) => {
    import s.implicits._
    val scored = Tables(s, dir, "documents")
      .select($"doc_id", $"source",
        (size(TextOps.tokens($"text")) % 100).as("q_score"))
    val wq = Window.partitionBy($"source")
      .orderBy($"q_score".desc, $"doc_id".asc)
    scored.withColumn("src_rank", row_number().over(wq))
      .filter($"src_rank" <= 2)
      .orderBy($"q_score".desc, $"doc_id".asc)
      .limit(10)
  }

  /** q149 — score calibration against a reference split: every
    * val-split document's quality score mapped to its PERCENTILE in
    * the train-split distribution (q134's hash split) — the
    * calibration that makes "0.7" mean the same thing across
    * retrained scorers. The reference collapses to its distinct-score
    * histogram + running counts (O(distinct scores) rows, broadcast),
    * so val rows map by ONE join against score buckets — no
    * corpus-sized sort, no per-row subquery. Percentile = exact
    * integer micro-division of cumulative counts. */
  val scoreCalibration: Q = (s, dir) => {
    import s.implicits._
    val h = graft.functions.Hashing.hash60(concat(lit("split|"),
      $"source", lit("|"), $"doc_id".cast("string"))) % 100
    val scored = Tables(s, dir, "documents")
      .select($"doc_id", $"source",
        (size(TextOps.tokens($"text")) % 100).as("q_score"),
        when(h < 80, "train").when(h < 90, "val").otherwise("test")
          .as("split"))
    // dense score spine: a val score absent from train still maps to
    // the cumulative count below it (left-joining sparse buckets would
    // wrongly give 0)
    val counts = scored.filter($"split" === "train")
      .groupBy($"q_score").agg(count(lit(1)).as("cnt"))
    val hist = Tables(s, dir, "documents").sparkSession
      .range(0, 100).select($"id".cast("int").as("q_score"))
      .join(counts, Seq("q_score"), "left")
      .withColumn("n", coalesce($"cnt", lit(0L)))
      .withColumn("cum_n", sum($"n").over(Window.orderBy($"q_score")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val total = hist.agg(sum($"n").as("train_total"))
    scored.filter($"split" === "val")
      .join(broadcast(hist.select($"q_score", $"cum_n")), Seq("q_score"),
        "left")
      .crossJoin(broadcast(total))
      .select($"doc_id", $"q_score",
        expr("(1000000 * coalesce(cum_n, 0)) div train_total")
          .as("pctile_micro"))
  }

  /** q144 — frequent path mining (3-step behavioral sequences): the
    * top event-type paths users actually walk, counted from per-user
    * ordered triples (two stacked leads over one window — no
    * self-joins). The classic product-analytics "what do people do
    * after X then Y" query; the path space is |types|³ regardless of
    * volume, and the top-10 plans as TakeOrderedAndProject. Total
    * order (second-truncated ts, event_id) keeps every path count
    * deterministic. */
  val pathMining: Q = (s, dir) => {
    import s.implicits._
    val order = Window.partitionBy($"user_id")
      .orderBy($"sec".asc, $"event_id".asc)
    Tables(s, dir, "events")
      .select($"user_id", $"event_id", $"event_type",
        unix_timestamp(date_trunc("second", $"ts")).as("sec"))
      .withColumn("t2", lead($"event_type", 1).over(order))
      .withColumn("t3", lead($"event_type", 2).over(order))
      .filter($"t3".isNotNull)
      .groupBy($"event_type".as("step1"), $"t2".as("step2"),
        $"t3".as("step3"))
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"step1", $"step2", $"step3")
      .limit(10)
  }

  /** q128 — rank-based feature normalization (quantile transform):
    * each document's quality score mapped to its within-SOURCE
    * percent_rank and cume_dist — the scale-free normalization that
    * makes scores comparable across heterogeneous sources before
    * mixing (a raw length score means different things on src0 vs
    * src9). Both functions are rank ratios — exact rationals of the
    * group's row count — quantized to micro-units, so the transform is
    * engine- and partitioning-exact. Per-source windows partition by
    * the group key (no global sort, unlike q94's corpus-wide ntile);
    * at 100 TB each source sorts independently — embarrassingly
    * parallel across the mixture. */
  val rankNormalize: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"source").orderBy($"q_score", $"doc_id")
    val scored = Tables(s, dir, "documents")
      .select($"doc_id", $"source",
        (size(TextOps.tokens($"text")) % 100).as("q_score"))
    scored.select($"doc_id", $"source", $"q_score",
      round(percent_rank().over(w) * 1000000.0).cast("long")
        .as("pct_rank_micro"),
      round(cume_dist().over(w) * 1000000.0).cast("long")
        .as("cume_dist_micro"))
  }

  /** q48 — INTERSECT / EXCEPT set semantics: users who both clicked and
    * purchased, and users who clicked but never purchased, as one
    * labeled union. */
  val setOps: Q = (s, dir) => {
    import s.implicits._
    val e = Tables(s, dir, "events")
    def users(t: String) =
      e.filter($"event_type" === t).select($"user_id").distinct()
    // the except side subtracts BIG purchasers so both branches are
    // non-empty on the gate data (every user has some purchase)
    val bigPurchasers = e.filter($"event_type" === "purchase" &&
      $"value" > 190.0).select($"user_id").distinct()
    val both = users("click").intersect(users("purchase"))
      .withColumn("segment", lit("click_and_purchase"))
    val only = users("click").except(bigPurchasers)
      .withColumn("segment", lit("click_no_big_purchase"))
    both.unionByName(only)
  }

  /** q49 — wide pivot: per-user event-type counts as columns. Expressed
    * as conditional aggregation (identical to Dataset.pivot with pinned
    * values, and portable to the oracle: pivot emits NULL for empty
    * cells where FILTER-counts emit 0 — conditional agg pins the 0). */
  val pivotCounts: Q = (s, dir) => {
    import s.implicits._
    val types = Seq("click", "view", "purchase", "signup", "error")
    val aggs = types.map(t =>
      sum(when($"event_type" === t, 1L).otherwise(0L)).as(s"n_$t"))
    Tables(s, dir, "events").groupBy($"user_id")
      .agg(aggs.head, aggs.tail: _*)
  }

  /** q76 — unpivot (melt), the inverse reshape of q49: the wide
    * per-user count matrix back to long (user_id, event_type, n) rows,
    * via the built-in `unpivot` (plans as Expand — a generate-style
    * row-multiplier, zero shuffles beyond q49's aggregate; at scale
    * Expand is map-local and codegen'd). Zero-count cells are kept:
    * melt must round-trip the matrix, not re-derive the sparse events. */
  val unpivotCounts: Q = (s, dir) => {
    import s.implicits._
    val types = Seq("click", "view", "purchase", "signup", "error")
    pivotCounts(s, dir).unpivot(
        Array($"user_id"),
        types.map(t => col(s"n_$t")).toArray,
        "event_type", "n")
      .select($"user_id",
        // unpivot names rows after the source columns; strip the n_
        // prefix so the long form matches the raw event_type domain
        regexp_replace($"event_type", "^n_", "").as("event_type"), $"n")
  }

  /** q78 — sequential funnel (click → view → purchase per user): each
    * stage time is the earliest qualifying event at-or-after the
    * previous stage. Three stage aggregates, each one co-partitioned
    * user_id join + groupBy — the distributed funnel shape (no
    * per-user event collection, no window over full history). Times
    * compare at SECOND granularity in both engines (events.ts is
    * ns-precision parquet that Spark reads at µs — sub-second compare
    * would diverge; see TESTDATA gotcha). */
  val funnel: Q = (s, dir) => {
    import s.implicits._
    val e = Tables(s, dir, "events")
      .select($"user_id", $"event_type",
        expr("unix_micros(ts) div 1000000").as("tsec"))
    val users = e.select($"user_id").distinct()
    val t1 = e.filter($"event_type" === "click")
      .groupBy($"user_id").agg(min($"tsec").as("t_click"))
    val t2 = e.filter($"event_type" === "view")
      .join(t1, Seq("user_id"))
      .filter($"tsec" >= $"t_click")
      .groupBy($"user_id").agg(min($"tsec").as("t_view"))
    val t3 = e.filter($"event_type" === "purchase")
      .join(t2, Seq("user_id"))
      .filter($"tsec" >= $"t_view")
      .groupBy($"user_id").agg(min($"tsec").as("t_purchase"))
    users.join(t1, Seq("user_id"), "left")
      .join(t2, Seq("user_id"), "left")
      .join(t3, Seq("user_id"), "left")
      .select($"user_id", $"t_click", $"t_view", $"t_purchase",
        when($"t_purchase".isNotNull, 3)
          .when($"t_view".isNotNull, 2)
          .when($"t_click".isNotNull, 1)
          .otherwise(0).as("funnel_stage"))
  }

  /** q195 — time-constrained window funnel (the windowFunnel shape of
    * event-analytics engines): click → view within 1 h of THAT click →
    * purchase within 24 h of THAT view, with EXISTS-chain semantics —
    * any qualifying chain counts, not just one grown greedily from the
    * earliest click (greedy-from-min, q78's shape, misses conversions
    * whose first click went nowhere). Each stage is an equi-join on
    * user_id with the interval predicate as a post-join filter, so
    * every exchange is user-keyed and co-partitioned; fan-out is
    * bounded by per-user activity inside the window (interval-bounded,
    * never all-pairs). The reported chain per depth is the
    * lexicographically earliest (min over a struct — deterministic
    * under any partitioning); strict > on both hops so same-second
    * events never self-satisfy a hop. */
  val windowFunnel: Q = (s, dir) => {
    import s.implicits._
    val e = Tables(s, dir, "events")
      .select($"user_id", $"event_type",
        expr("unix_micros(ts) div 1000000").as("tsec"))
    val users = e.select($"user_id").distinct()
    val c = e.filter($"event_type" === "click")
      .select($"user_id", $"tsec".as("tc"))
    val v = e.filter($"event_type" === "view")
      .select($"user_id".as("uv"), $"tsec".as("tv"))
    val p = e.filter($"event_type" === "purchase")
      .select($"user_id".as("up"), $"tsec".as("tp"))
    val cv = c.join(v, $"user_id" === $"uv" &&
        $"tv" > $"tc" && $"tv" <= $"tc" + 3600L)
      .select($"user_id", $"tc", $"tv")
    val cvp = cv.join(p, $"user_id" === $"up" &&
        $"tp" > $"tv" && $"tp" <= $"tv" + 86400L)
      .select($"user_id", $"tc", $"tv", $"tp")
    val b1 = c.groupBy($"user_id").agg(min($"tc").as("b1"))
    val b2 = cv.groupBy($"user_id")
      .agg(min(struct($"tc", $"tv")).as("b2"))
    val b3 = cvp.groupBy($"user_id")
      .agg(min(struct($"tc", $"tv", $"tp")).as("b3"))
    users.join(b1, Seq("user_id"), "left")
      .join(b2, Seq("user_id"), "left")
      .join(b3, Seq("user_id"), "left")
      .select($"user_id",
        when($"b3".isNotNull, 3).when($"b2".isNotNull, 2)
          .when($"b1".isNotNull, 1).otherwise(0).as("depth"),
        when($"b3".isNotNull, $"b3.tc").when($"b2".isNotNull, $"b2.tc")
          .otherwise($"b1").as("t_click"),
        when($"b3".isNotNull, $"b3.tv").when($"b2".isNotNull, $"b2.tv")
          .as("t_view"),
        $"b3.tp".as("t_purchase"))
  }

  /** q79 — retention cohort matrix: users grouped by first-activity day
    * (their cohort), activity counted per (cohort, day-offset) cell as
    * distinct users. Two user_id-keyed aggregates + one distinct — the
    * cohort table is O(days²) regardless of SF, and every exchange key
    * is uniform. */
  val retentionCohorts: Q = (s, dir) => {
    import s.implicits._
    val e = Tables(s, dir, "events")
      .select($"user_id", to_date($"ts").as("day")).distinct()
    val cohorts = e.groupBy($"user_id").agg(min($"day").as("cohort_day"))
    e.join(cohorts, Seq("user_id"))
      .groupBy($"cohort_day", datediff($"day", $"cohort_day").as("day_offset"))
      .agg(countDistinct($"user_id").as("n_users"))
  }

  /** q171 — Gini coefficient of customer revenue per region (the
    * inequality number behind "do 20% of customers carry 80% of
    * revenue?"): G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx) over customers
    * ranked ascending by revenue within their region. Everything is
    * exact: revenue in cents, ranks from a PER-REGION window (ordered
    * by cents then custkey — a total order, q94's discipline; never a
    * global sort), the final ratio in integer micro-units with
    * decimal(38,0) intermediates (Σ i·xᵢ reaches rank×cents products
    * a long can wrap on at scale). O(regions) output. */
  val giniRevenue: Q = (s, dir) => {
    import s.implicits._
    val rev = Tables(s, dir, "orders")
      .groupBy($"o_custkey")
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
    val reg = Tables(s, dir, "customer")
      .join(broadcast(Tables(s, dir, "nation")),
        $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey".as("o_custkey"), $"n_regionkey".as("region"))
    val w = Window.partitionBy($"region")
      .orderBy($"cents".asc, $"o_custkey".asc)
    rev.join(reg, Seq("o_custkey"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .groupBy($"region")
      .agg(count(lit(1)).as("n_customers"),
        sum($"cents").as("sx"),
        sum($"rk" * $"cents").as("six"))
      .select($"region", $"n_customers", $"sx".as("total_cents"),
        expr("(1000000 * (2 * cast(six as decimal(38,0))" +
          " - (n_customers + 1) * cast(sx as decimal(38,0))))" +
          " div (n_customers * cast(sx as decimal(38,0)))")
          .as("gini_micro"))
  }

  /** q172 — ABC inventory/revenue classification per region: customers
    * ranked by revenue DESC, classified by cumulative revenue share —
    * A carries the first 70%, B to 90%, C the tail (share thresholds
    * on exact integer micro-shares, so class edges are engine-exact).
    * The running sum is a per-region window (partitioned — parallel),
    * and the output is the O(regions × 3) class audit a planner
    * consumes, not the ranked list. */
  val abcClasses: Q = (s, dir) => {
    import s.implicits._
    val rev = Tables(s, dir, "orders")
      .groupBy($"o_custkey")
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
    val reg = Tables(s, dir, "customer")
      .join(broadcast(Tables(s, dir, "nation")),
        $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey".as("o_custkey"), $"n_regionkey".as("region"))
    val w = Window.partitionBy($"region")
      .orderBy($"cents".desc, $"o_custkey".asc)
    rev.join(reg, Seq("o_custkey"))
      .withColumn("cum",
        sum($"cents").over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .withColumn("tot", sum($"cents").over(Window.partitionBy($"region")))
      .withColumn("cum_micro",
        expr("(1000000 * cast(cum as decimal(38,0))) div tot"))
      .withColumn("abc_class",
        when($"cum_micro" <= 700000, "A")
          .when($"cum_micro" <= 900000, "B")
          .otherwise("C"))
      .groupBy($"region", $"abc_class")
      .agg(count(lit(1)).as("n_customers"),
        sum($"cents").as("class_cents"))
  }

  /** q173 — association rules over behavioural baskets (market-basket
    * support / confidence / lift): a basket is the SET of event types
    * a user fires in a day; every ordered type pair (a→b) scores
    * support = P(a,b), confidence = P(b|a), lift = P(a,b)/(P(a)P(b)).
    * All three are exact integer micro-ratios of basket counts
    * (decimal(38,0) guards the N·n_ab product), so the rule table is
    * engine-exact. Plan: baskets = one distinct over (user, day,
    * type); the pair join keys on (user, day) with fan-out bounded by
    * types-per-basket (≤|event types|², not corpus²); the type-level
    * support table is O(types) and broadcasts; N rides as one
    * broadcast row. min-support 5 prunes noise rules. */
  val associationRules: Q = (s, dir) => {
    import s.implicits._
    val b = Tables(s, dir, "events")
      .select($"user_id", to_date($"ts").as("day"), $"event_type")
      .distinct()
    val nb = b.select($"user_id", $"day").distinct()
      .agg(count(lit(1)).as("N"))
    val supp = b.groupBy($"event_type").agg(count(lit(1)).as("supp"))
    val pairs = b.as("x").join(b.as("y"), Seq("user_id", "day"))
      .filter(col("x.event_type") =!= col("y.event_type"))
      .groupBy(col("x.event_type").as("ante"),
        col("y.event_type").as("cons"))
      .agg(count(lit(1)).as("n_ab"))
      .filter($"n_ab" >= 5)
    pairs
      .join(broadcast(supp.select($"event_type".as("ante"),
        $"supp".as("supp_a"))), Seq("ante"))
      .join(broadcast(supp.select($"event_type".as("cons"),
        $"supp".as("supp_b"))), Seq("cons"))
      .crossJoin(broadcast(nb))
      .select($"ante", $"cons", $"n_ab",
        expr("(1000000 * cast(n_ab as decimal(38,0))) div N")
          .as("support_micro"),
        expr("(1000000 * cast(n_ab as decimal(38,0))) div supp_a")
          .as("confidence_micro"),
        expr("(1000000 * cast(N as decimal(38,0)) * n_ab)" +
          " div (supp_a * cast(supp_b as decimal(38,0)))")
          .as("lift_micro"))
  }

  /** q174 — winsorized statistics per group (robust mean with tail
    * clipping at p05/p95): the outlier-resistant summary a metrics
    * pipeline publishes when raw means are hostage to a few extreme
    * rows. Quantile edges come from exact interpolated percentiles of
    * the CENTS values (q54's cross-engine precedent), immediately
    * quantized to LONGS in 10⁻⁴-cent units — from there every clip,
    * sum and mean is exact integer arithmetic (a double sum of
    * clipped values would be partial-sum-order dependent and could
    * flap the hash at scale). Two grouped passes over the fact
    * (edges, then clip+sum), both map-side combined; O(groups)
    * output. */
  val winsorizedStats: Q = (s, dir) => {
    import s.implicits._
    val o = Tables(s, dir, "orders")
      .select($"o_orderpriority".as("priority"),
        round($"o_totalprice" * 100).cast("long").as("cents"))
    val edges = o.groupBy($"priority")
      .agg(round(percentile($"cents", lit(0.05)) * 10000).cast("long")
          .as("p05_c4"),
        round(percentile($"cents", lit(0.95)) * 10000).cast("long")
          .as("p95_c4"))
    o.join(broadcast(edges), Seq("priority"))
      .select($"priority", $"p05_c4", $"p95_c4",
        greatest(least($"cents" * 10000, $"p95_c4"), $"p05_c4")
          .as("clipped_c4"))
      .groupBy($"priority")
      .agg(count(lit(1)).as("n_orders"),
        min($"p05_c4").as("p05_c4"),
        min($"p95_c4").as("p95_c4"),
        sum($"clipped_c4").as("clipped_sum_c4"))
      .withColumn("winsorized_mean_c4",
        expr("clipped_sum_c4 div n_orders"))
  }

  /** q175 — gap-fill by LINEAR INTERPOLATION (q13 fills empty days
    * with zeros; a metric that persists between observations — a
    * price, a level, a balance — interpolates instead): each missing
    * day takes prev + (next − prev)·Δ/gap between its surrounding
    * observed days. prev/next come from running last/first
    * (ignoreNulls) frames over the DAY spine — the post-aggregate
    * O(days) frame, q116's discipline, never the event table — and
    * the interpolation is exact integer micro-arithmetic (cents,
    * day offsets, integer div), so the filled series is engine-exact.
    * Spine is bounded by observed min/max, so prev/next always
    * exist. */
  val interpolateGaps: Q = (s, dir) => {
    import s.implicits._
    val e = Tables(s, dir, "events")
      .filter($"event_type" === "signup" && $"value" > 150.0)
    val daily = e
      .groupBy(to_date(date_trunc("day", $"ts")).as("day"))
      .agg(round(sum($"value") * 100).cast("long").as("cents"))
    val spine = e
      .agg(min(to_date(date_trunc("day", $"ts"))).as("d0"),
        max(to_date(date_trunc("day", $"ts"))).as("d1"))
      .select(explode(sequence($"d0", $"d1")).as("day"))
    val wb = Window.orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.orderBy($"day")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    spine.join(daily, Seq("day"), "left")
      .withColumn("pv", last($"cents", ignoreNulls = true).over(wb))
      .withColumn("pd", last(when($"cents".isNotNull, $"day"),
        ignoreNulls = true).over(wb))
      .withColumn("nv", first($"cents", ignoreNulls = true).over(wf))
      .withColumn("nd", first(when($"cents".isNotNull, $"day"),
        ignoreNulls = true).over(wf))
      .select($"day", $"cents".as("observed_cents"),
        (lit(1000000L) * $"pv" +
          when(datediff($"nd", $"pd") > 0,
            expr("((nv - pv) * 1000000L * datediff(day, pd))" +
              " div datediff(nd, pd)"))
            .otherwise(lit(0L)))
          .as("interp_micro"))
  }

  /** q176 — capped running balance per user (running sum FLOORED at
    * zero — inventory that can't go negative, prepaid credit that
    * can't be overdrawn): s_i = max(0, s_{i−1} + x_i). The floor makes
    * it a genuine FOLD — no window/prefix-sum trick expresses it
    * (max(0,·) doesn't distribute over addition) — so it runs as a
    * higher-order `aggregate` over each user's time-ordered deltas:
    * per-user sequences are bounded, the fold is codegen'd, and the
    * only shuffle is the user groupBy (same scale shape as
    * sessionize). The oracle is DuckDB's list_reduce with a prepended
    * zero (its fold seeds from the first element; prepending the
    * initial accumulator makes the two folds identical — probed).
    * Deltas are signed exact cents; order is the (ts, event_id) total
    * order. */
  val cappedBalance: Q = (s, dir) => {
    import s.implicits._
    val e = Tables(s, dir, "events")
      .filter($"value".isNotNull)
      .select($"user_id", $"ts", $"event_id",
        round(($"value" - 150.0) * 100).cast("long").as("c"))
    e.groupBy($"user_id")
      .agg(transform(
        array_sort(collect_list(struct($"ts", $"event_id", $"c"))),
        x => x.getField("c")).as("cs"))
      .select($"user_id", size($"cs").cast("long").as("n_events"),
        expr("aggregate(cs, 0L, (acc, x) -> acc + x)")
          .as("uncapped_balance"),
        expr("aggregate(cs, 0L, (acc, x) -> greatest(acc + x, 0L))")
          .as("capped_balance"))
  }

  /** q179 — multi-touch conversion attribution (first-touch /
    * last-touch / linear) — which upstream channel gets credit for
    * each purchase, the marketing-analytics primitive behind spend
    * allocation. Conversions join their user's preceding 7 days of
    * touches on the USER key (co-partitioned equi-join; the range
    * predicate only bounds fan-out, it is not the join key), then one
    * window per conversion ranks touches in (ts, event_id) order:
    * rank 1 takes the first-touch credit, rank n the last-touch, and
    * every touch takes an exact 1e6 div n linear micro-share. State
    * per conversion is bounded by the 7-day window, partitions are
    * per-user — nothing global at any corpus size. */
  val attribution: Q = (s, dir) => {
    import s.implicits._
    val e = Tables(s, dir, "events")
    val conv = e.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("conv_id"), $"ts".as("conv_ts"))
    val touch = e.filter($"event_type" =!= "purchase")
      .select($"user_id", $"event_id".as("touch_id"),
        $"ts".as("touch_ts"), $"event_type")
    val j = conv.join(touch, Seq("user_id"))
      .filter($"touch_ts" < $"conv_ts" &&
        $"touch_ts" >= $"conv_ts" - expr("INTERVAL 7 DAYS"))
    val wOrd = Window.partitionBy($"conv_id")
      .orderBy($"touch_ts", $"touch_id")
    val wAll = Window.partitionBy($"conv_id")
    j.withColumn("rn", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .groupBy($"event_type")
      .agg(sum(when($"rn" === 1, 1L).otherwise(0L)).as("first_touch"),
        sum(when($"rn" === $"n", 1L).otherwise(0L)).as("last_touch"),
        sum(expr("1000000L div n")).as("linear_micro"),
        count(lit(1)).as("n_touches"))
  }

  /** q180 — robust outlier detection by MEDIAN/MAD (the
    * outlier-resistant alternative to q116's mean/stddev z-score —
    * one corrupted batch can't move the fence): flag x where
    * |x − med| > 3.5·1.4826·MAD. Everything stays in exact integers:
    * values are milli-quantized once, the interpolated median is
    * doubled into an exact integer (2·median of ints lands on the
    * 0.5 grid), deviations are |2v − med2|, 4·MAD likewise, and the
    * fence test is the cross-multiplied 20000·dev2 > 51891·mad4
    * (3.5·1.4826 = 5.18910 exactly). Exact `percentile` state is a
    * value→count map, so after milli-quantization its size is
    * bounded by the VALUE GRID (q174's discipline), not the row
    * count — the one condition under which an exact grouped median
    * scales. Two grouped passes + one counting pass, all map-side
    * combined; med/mad frames are O(groups) broadcasts. */
  val madOutliers: Q = (s, dir) => {
    import s.implicits._
    val e = Tables(s, dir, "events").filter($"value".isNotNull)
      .select($"event_type", round($"value" * 1000).cast("long").as("v"))
    val med = e.groupBy($"event_type")
      .agg((percentile($"v", lit(0.5)) * 2).cast("long").as("med2"))
    val dev = e.join(broadcast(med), Seq("event_type"))
      .withColumn("dev2", abs($"v" * 2 - $"med2"))
    val mad = dev.groupBy($"event_type")
      .agg((percentile($"dev2", lit(0.5)) * 2).cast("long").as("mad4"))
    dev.join(broadcast(mad), Seq("event_type"))
      .groupBy($"event_type", $"med2", $"mad4")
      .agg(count(lit(1)).as("n"),
        sum(when($"dev2" * 20000 > $"mad4" * 51891, 1L).otherwise(0L))
          .as("n_outliers"))
      .select($"event_type", $"n", $"med2", $"mad4", $"n_outliers")
  }

  /** q186 — gains/lift table for a score (model evaluation: if we act
    * on the top decile, what share of positives do we capture?). The
    * decile cut reuses [[graft.functions.ScaleWindows.rangeNtile]] —
    * the q94 range-partitioned sort, no unpartitioned window — over
    * the (score desc, key) total order; positives come from one
    * distinct-key semi-join. The cumulative capture/lift columns are
    * computed on the O(10) decile frame by the same triangular
    * broadcast join rangeNtile itself uses for offsets — a 10-row
    * cross product, NOT a global running window — and the ratios are
    * integral decimal(38,0) cross-products (cum·tot products overflow
    * a long at ~1e9 rows), so the table is engine-exact at any
    * scale. */
  val gainsTable: Q = (s, dir) => {
    import s.implicits._
    val cust = Tables(s, dir, "customer")
      .select($"c_custkey",
        round($"c_acctbal" * 100).cast("long").as("score_cents"))
    val pos = Tables(s, dir, "orders").select($"o_custkey").distinct()
      .withColumn("label", lit(1L))
    val scored = cust.join(pos, $"c_custkey" === $"o_custkey", "left")
      .select($"c_custkey", $"score_cents",
        coalesce($"label", lit(0L)).as("label"))
    val dec = graft.functions.ScaleWindows.rangeNtile(scored, 10,
      Seq($"score_cents".desc, $"c_custkey".asc), "decile")
    // pinned: the 10-row decile census feeds the triangular cum join
    // (both sides) and the totals row — lazy, the rangeNtile chain
    // re-ran per branch
    val per = dec.groupBy($"decile")
      .agg(count(lit(1)).as("n"), sum($"label").as("positives"))
      .trunkCheckpoint()
    val rhs = per.select($"decile".as("d2"), $"n".as("n2"),
      $"positives".as("p2"))
    val tot = per.agg(sum($"positives").as("tot_pos"),
      sum($"n").as("tot_n"))
    per.crossJoin(broadcast(rhs))
      .groupBy($"decile", $"n", $"positives")
      .agg(sum(when($"d2" <= $"decile", $"p2").otherwise(0L))
          .as("cum_pos"),
        sum(when($"d2" <= $"decile", $"n2").otherwise(0L)).as("cum_n"))
      .crossJoin(broadcast(tot))
      .select($"decile", $"n", $"positives",
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * cum_pos" +
          " div CAST(tot_pos AS DECIMAL(38,0)) AS BIGINT)")
          .as("capture_micro"),
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * cum_pos * tot_n" +
          " div (CAST(cum_n AS DECIMAL(38,0)) * tot_pos) AS BIGINT)")
          .as("lift_micro"))
  }

  /** q191 — exact AUC (rank-probability that a random positive
    * outscores a random negative, ties at half credit) WITHOUT a
    * global rank: the corpus collapses to a SCORE HISTOGRAM
    * (n_pos, n_neg per distinct score — one map-side-combined
    * aggregate), and AUC = Σ_s [2·n_pos(s)·cumneg_<s +
    * n_pos(s)·n_neg(s)] / (2·P·N) needs only a prefix sum over the
    * O(score-grid) frame, done scale-safe via ScaleWindows.rangeCumSum
    * (range exchange + offset carry — no unpartitioned window even on
    * the bounded histogram). All products are
    * decimal(38,0) exact; the single output row is the integral
    * micro-division. The companion of q186 (same acctbal score), with
    * a discriminating label — "ever placed a >450k order" — because
    * the synthetic orders table covers every customer, so q186's
    * has-any-order label is one-class and AUC would be undefined. */
  val aucExact: Q = (s, dir) => {
    import s.implicits._
    val scored = Tables(s, dir, "customer")
      .join(Tables(s, dir, "orders")
          .filter($"o_totalprice" > 450000.0)
          .select($"o_custkey").distinct()
          .withColumn("label", lit(1L)),
        $"c_custkey" === $"o_custkey", "left")
      .select(round($"c_acctbal" * 100).cast("long").as("score"),
        coalesce($"label", lit(0L)).as("label"))
    val hist = scored.groupBy($"score")
      .agg(sum($"label").as("np"),
        sum(lit(1L) - $"label").as("nn"))
    graft.functions.ScaleWindows
      .rangeCumSum(hist, Seq($"score".asc), $"nn", "cum_neg")
      .agg(sum($"np").as("n_pos"), sum($"nn").as("n_neg"),
        sum(expr("CAST(2 AS DECIMAL(38,0)) * np * cum_neg") +
          expr("CAST(np AS DECIMAL(38,0)) * nn")).as("num"))
      .select($"n_pos", $"n_neg",
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * num" +
          " div (CAST(2 AS DECIMAL(38,0)) * n_pos * n_neg) AS BIGINT)")
          .as("auc_micro"))
  }

  /** q192 — two-sample Kolmogorov–Smirnov distance between the A/B
    * arms' spend distributions (the distribution-level companion of
    * q189's mean-level Welch read-out; same hash-split arm rule).
    * Rank-free like q191: both arms collapse to ONE shared value
    * histogram (n_a, n_b per distinct cent value — map-side combined),
    * both inclusive CDFs come from a single
    * ScaleWindows.rangeCumSums pass (one range exchange, one
    * partitioned WindowExec), and D = max |F_a−F_b| is the max over
    * the O(value-grid) frame of the EXACT integer cross-product
    * |cum_a·N_b − cum_b·N_a| (≤ ~1e24 at any real scale —
    * decimal(38,0) exact). Arm totals are read off the cum frame
    * (max of an inclusive CDF), so the corpus is scanned once.
    * Output: arm sizes, the KS distance in exact integral micros, and
    * the smallest value where the max gap is attained. */
  val ksTest: Q = (s, dir) => {
    import s.implicits._
    val e = Tables(s, dir, "events").filter($"value".isNotNull)
      .select(
        (graft.functions.Hashing.hash60(
          concat(lit("ab|"), $"user_id".cast("string"))) % 2).as("arm"),
        round($"value" * 100).cast("long").as("y"))
    val hist = e.groupBy($"y")
      .agg(sum(when($"arm" === 0, 1L).otherwise(0L)).as("na"),
        sum(when($"arm" === 1, 1L).otherwise(0L)).as("nb"))
    // cum and gaps pinned (O(distinct values) each): cum feeds the
    // totals row AND the gap projection; gaps feeds the max row AND
    // the argmax filter — lazy, the rangeCumSums post-exchange chain
    // re-ran per branch
    val cum = graft.functions.ScaleWindows
      .rangeCumSums(hist, Seq($"y".asc), Seq($"na" -> "ca", $"nb" -> "cb"))
      .select($"y", ($"ca" + $"na").as("ca"), ($"cb" + $"nb").as("cb"))
      .trunkCheckpoint()
    val tot = cum.agg(max($"ca").as("ta"), max($"cb").as("tb"))
    val gaps = cum.crossJoin(broadcast(tot))
      .select($"y", $"ta", $"tb",
        abs(expr("CAST(ca AS DECIMAL(38,0)) * tb" +
          " - CAST(cb AS DECIMAL(38,0)) * ta")).as("gap"))
      .trunkCheckpoint()
    val mx = gaps.agg(max($"gap").as("gmax"))
    gaps.crossJoin(broadcast(mx))
      .filter($"gap" === $"gmax")
      .groupBy($"ta", $"tb", $"gmax")
      .agg(min($"y").as("at_y"))
      .select($"ta".as("n_a"), $"tb".as("n_b"), $"at_y",
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * gmax" +
          " div (CAST(ta AS DECIMAL(38,0)) * tb) AS BIGINT)")
          .as("ks_micro"))
  }

  /** q193 — Spearman rank correlation between a customer's account
    * balance and their lifetime spend, with exact average-rank tie
    * handling and NO global rank of the row frame: each variable's
    * average rank comes from its value HISTOGRAM (avg rank of value v
    * = excl_cum(v) + (n_v+1)/2, doubled to the integer 2·rank), the
    * exclusive cums via ScaleWindows.rangeCumSum; the row frame
    * collapses to the (x,y) CELL table so the moment pass is one
    * map-side-combined aggregate over O(distinct pairs) rows. All six
    * moments are decimal(38,0)-exact (the ×2 rank doubling cancels in
    * the ratio); bounds: n·Σ(cnt·r2x·r2y) ≈ 4n⁴ stays inside
    * decimal(38,0) through n ≈ 1e9 rows — past that the outer
    * products must drop to double (q189's documented rule). The final
    * ratio needs sqrt, so it runs in double over the SAME exact
    * integers with a fixed operation tree mirrored verbatim in the
    * oracle — ULP-level, deterministic. */
  val spearman: Q = (s, dir) => {
    import s.implicits._
    val spend = Tables(s, dir, "orders").groupBy($"o_custkey")
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("y"))
    // pinned: the (x, y) point frame is read by the cell census AND
    // both marginal rank histograms — lazy, the orders rollup +
    // customer join ran 3×; O(customers) rows of two longs
    val pts = Tables(s, dir, "customer")
      .join(spend, $"c_custkey" === $"o_custkey", "left")
      .select(round($"c_acctbal" * 100).cast("long").as("x"),
        coalesce($"y", lit(0L)).as("y"))
      .trunkCheckpoint()
    def rank2(df: org.apache.spark.sql.DataFrame, key: String) = {
      val h = df.groupBy(col(key)).agg(count(lit(1)).as("__cnt"))
      graft.functions.ScaleWindows
        .rangeCumSum(h, Seq(col(key).asc), col("__cnt"), "__cum")
        .select(col(key),
          (lit(2L) * col("__cum") + col("__cnt") + 1L).as(s"r2$key"))
    }
    val cells = pts.groupBy($"x", $"y").agg(count(lit(1)).as("cnt"))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    cells.join(rank2(pts.select($"x"), "x"), Seq("x"))
      .join(rank2(pts.select($"y"), "y"), Seq("y"))
      .agg(sum($"cnt").as("n"),
        sum(dec($"cnt") * $"r2x").as("sx"),
        sum(dec($"cnt") * $"r2y").as("sy"),
        sum(dec($"cnt") * $"r2x" * $"r2x").as("sxx"),
        sum(dec($"cnt") * $"r2y" * $"r2y").as("syy"),
        sum(dec($"cnt") * $"r2x" * $"r2y").as("sxy"))
      .select($"n",
        round(expr("CAST(n * sxy - sx * sy AS DOUBLE)") /
          (sqrt(expr("CAST(n * sxx - sx * sx AS DOUBLE)")) *
            sqrt(expr("CAST(n * syy - sy * sy AS DOUBLE)"))) * 1000000.0)
          .cast("long").as("rho_micro"))
  }

  /** q197 — best binary split by Gini impurity (the inner loop of
    * decision-tree / GBDT training, as a relational op): over the
    * same (acctbal-cents score, >450k-order label) frame as q191,
    * find the threshold minimizing weighted child impurity. The
    * corpus collapses to the score histogram; both class counts'
    * inclusive CDFs come from one ScaleWindows.rangeCumSums pass; for
    * each candidate threshold the split quality is the EXACT rational
    * [(lp²+ln²)·R + (rp²+rn²)·L] / (L·R) (maximizing it minimizes
    * weighted Gini), micro-quantized per candidate by decimal(38,0)
    * integral division (numerator ≤ L·R·n ≈ n³/4 — inside decimal38
    * through n ≈ 1e12) so the argmax is partition-order independent;
    * ties break to the smallest threshold. The right-empty last
    * threshold is excluded (its child ratio is 0/0). */
  val bestSplit: Q = (s, dir) => {
    import s.implicits._
    val scored = Tables(s, dir, "customer")
      .join(Tables(s, dir, "orders")
          .filter($"o_totalprice" > 450000.0)
          .select($"o_custkey").distinct()
          .withColumn("label", lit(1L)),
        $"c_custkey" === $"o_custkey", "left")
      .select(round($"c_acctbal" * 100).cast("long").as("score"),
        coalesce($"label", lit(0L)).as("label"))
    val hist = scored.groupBy($"score")
      .agg(sum($"label").as("np"),
        sum(lit(1L) - $"label").as("nn"))
    val cum = graft.functions.ScaleWindows
      .rangeCumSums(hist, Seq($"score".asc),
        Seq($"np" -> "cp", $"nn" -> "cn"))
      .select($"score", ($"cp" + $"np").as("lp"), ($"cn" + $"nn").as("ln"))
    val tot = cum.agg(max($"lp").as("tp"), max($"ln").as("tn"))
    val q = cum.crossJoin(broadcast(tot))
      .select($"score", $"lp", $"ln",
        ($"tp" - $"lp").as("rp"), ($"tn" - $"ln").as("rn"))
      .withColumn("l", $"lp" + $"ln")
      .withColumn("r", $"rp" + $"rn")
      .filter($"r" > 0)
      .withColumn("purity_micro",
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) *" +
          " ((CAST(lp AS DECIMAL(38,0)) * lp + CAST(ln AS DECIMAL(38,0)) * ln) * r" +
          "  + (CAST(rp AS DECIMAL(38,0)) * rp + CAST(rn AS DECIMAL(38,0)) * rn) * l)" +
          // greatest(...,1): constraint inference pushes an
          // isnotnull(purity) predicate below the r>0 filter, so the
          // expression must be total even on the r=0 last row
          " div greatest(CAST(l AS DECIMAL(38,0)) * r," +
          " CAST(1 AS DECIMAL(38,0))) AS BIGINT)"))
    val best = q.agg(max($"purity_micro").as("best"))
    q.crossJoin(broadcast(best))
      .filter($"purity_micro" === $"best")
      .agg(min(struct($"score", $"l", $"r", $"purity_micro")).as("b"))
      .select($"b.score".as("split_at"), $"b.l".as("n_left"),
        $"b.r".as("n_right"), $"b.purity_micro".as("purity_micro"))
  }

  /** q198 — Kaplan–Meier survival curve for time-to-first-purchase
    * (right-censored at last observed activity): the churn/conversion
    * analysis primitive. Subjects collapse to the (t, death/censor)
    * day-offset HISTOGRAM in one user-keyed aggregate; the risk set
    * n_t = N − Σ_{u<t}(d_u + c_u) comes from one
    * ScaleWindows.rangeCumSums pass (censorings tied to a death day
    * stay at risk for it — the standard convention); the output keeps
    * the curve in LOG space: per death-day factor ln((n−d)/n) is an
    * exact-rational → double → micro-int quantization (q190's ln
    * rule — per-day, so the later SUM of factors is integer-exact and
    * partition-order independent, unlike a float product), and the
    * cumulative log-survival is a second rangeCumSum over the
    * O(day-grid) death frame. S(t)=0 (n=d on the last death day)
    * has no finite log — reported NULL by convention. */
  val kaplanMeier: Q = (s, dir) => {
    import s.implicits._
    val e = Tables(s, dir, "events")
      .select($"user_id", to_date($"ts").as("day"), $"event_type")
    val perUser = e.groupBy($"user_id").agg(
      min($"day").as("d0"), max($"day").as("dlast"),
      min(when($"event_type" === "purchase", $"day")).as("dp"))
    val subj = perUser.select(
      when($"dp".isNotNull, datediff($"dp", $"d0"))
        .otherwise(datediff($"dlast", $"d0")).as("t"),
      when($"dp".isNotNull, 1L).otherwise(0L).as("death"))
    val hist = subj.groupBy($"t")
      .agg(sum($"death").as("d"), sum(lit(1L) - $"death").as("c"))
    val tot = hist.agg((sum($"d") + sum($"c")).as("n0"))
    val risk = graft.functions.ScaleWindows
      .rangeCumSums(hist, Seq($"t".asc), Seq($"d" -> "cd", $"c" -> "cc"))
      .crossJoin(broadcast(tot))
      .select($"t", $"d", ($"n0" - $"cd" - $"cc").as("n"))
      .filter($"d" > 0)
      .withColumn("lnf_micro",
        when($"n" > $"d",
          round(log(($"n" - $"d").cast("double") / $"n".cast("double"))
            * 1000000.0).cast("long")))
    graft.functions.ScaleWindows
      .rangeCumSum(risk, Seq($"t".asc), $"lnf_micro", "cls")
      .select($"t", $"n".as("n_risk"), $"d".as("deaths"),
        $"lnf_micro",
        when($"lnf_micro".isNotNull, $"cls" + $"lnf_micro")
          .as("log_surv_micro"))
  }

  /** q199 — Mann–Whitney U rank-sum test between the A/B arms (the
    * nonparametric member of the read-out family: q189 compares
    * means, q192 distributions, this one ranks). Same shared value
    * histogram + one rangeCumSums pass as q192; the doubled statistic
    * 2U_A = Σ_y n_a(y)·(2·cumB_<y + n_b(y)) is decimal(38,0)-exact
    * with ties at half credit (q191's arithmetic). Significance is
    * the tie-CORRECTED normal approximation at |z| > 2: the tie term
    * Σ(t³−t) and K = (n+1)n(n−1) − Σ(t³−t) are exact decimals
    * (K ≈ n³ — inside decimal38 through n ≈ 1e12); the final
    * cross-multiplied fence d²·12·n·(n−1) > 16·n_a·n_b·K would need
    * ~70 digits, so it runs in double over the exact integers with
    * the operation tree mirrored in the oracle (q189's rule). */
  val mannWhitney: Q = (s, dir) => {
    import s.implicits._
    val e = Tables(s, dir, "events").filter($"value".isNotNull)
      .select(
        (graft.functions.Hashing.hash60(
          concat(lit("ab|"), $"user_id".cast("string"))) % 2).as("arm"),
        round($"value" * 100).cast("long").as("y"))
    val hist = e.groupBy($"y")
      .agg(sum(when($"arm" === 0, 1L).otherwise(0L)).as("na"),
        sum(when($"arm" === 1, 1L).otherwise(0L)).as("nb"))
    val cum = graft.functions.ScaleWindows
      .rangeCumSum(hist, Seq($"y".asc), $"nb", "cb")
    val m = cum.agg(sum($"na").as("ta"), sum($"nb").as("tb"),
      sum(expr("CAST(2 AS DECIMAL(38,0)) * na * cb") +
        expr("CAST(na AS DECIMAL(38,0)) * nb")).as("u2"),
      sum(expr("CAST(na + nb AS DECIMAL(38,0)) * (na + nb) * (na + nb)" +
        " - CAST(na + nb AS DECIMAL(38,0))")).as("tc"))
    val d = (c: org.apache.spark.sql.Column) => c.cast("double")
    m.withColumn("n", $"ta" + $"tb")
      .withColumn("diff", expr("u2 - CAST(ta AS DECIMAL(38,0)) * tb"))
      .withColumn("k",
        expr("CAST(n + 1 AS DECIMAL(38,0)) * n * (n - 1) - tc"))
      .select($"ta".as("n_a"), $"tb".as("n_b"),
        $"u2".cast("long").as("u2_a"),
        $"tc".cast("long").as("tie_term"),
        (d($"diff") * d($"diff") * 12.0d * d($"n") * d($"n" - 1) >
          d($"ta") * d($"tb") * d($"k") * 16.0d).as("significant"))
  }

  /** q201 — Pearson correlation MATRIX over four customer features
    * (acctbal, order count, lifetime spend, max order value) in ONE
    * aggregate pass: all 14 moment sums (n, 4 firsts, 10 seconds) are
    * decimal(38,0)-exact conditional aggregations over a single fact
    * scan — no per-pair passes, no corr() UDAF whose float partial
    * sums are partition-order dependent. The 6 upper-triangle cells
    * materialize from the one-row moment frame via inline
    * explode(array(struct...)) — zero re-scans. Each cell's final
    * ratio (n·s_ij−s_i·s_j)/√(..)√(..) runs in double over the exact
    * integers with the operation tree mirrored in the oracle (q193's
    * rule; exact while n·Σxᵢxⱼ stays inside decimal38 — cents-scale
    * features to ~1e12 rows). */
  val corrMatrix: Q = (s, dir) => {
    import s.implicits._
    val o = Tables(s, dir, "orders").groupBy($"o_custkey")
      .agg(count(lit(1)).as("cnt"),
        sum(round($"o_totalprice" * 100).cast("long")).as("spend"),
        max(round($"o_totalprice" * 100).cast("long")).as("maxp"))
    val feat = Tables(s, dir, "customer")
      .join(o, $"c_custkey" === $"o_custkey", "left")
      .select(round($"c_acctbal" * 100).cast("long").as("x1"),
        coalesce($"cnt", lit(0L)).as("x2"),
        coalesce($"spend", lit(0L)).as("x3"),
        coalesce($"maxp", lit(0L)).as("x4"))
    val names = Map(1 -> "acctbal", 2 -> "n_orders", 3 -> "spend",
      4 -> "max_order")
    val firsts = (1 to 4).map(i =>
      sum(expr(s"CAST(x$i AS DECIMAL(38,0))")).as(s"s$i"))
    val seconds = for (i <- 1 to 4; j <- i to 4) yield
      sum(expr(s"CAST(x$i AS DECIMAL(38,0)) * x$j")).as(s"s${i}${j}")
    val aggs = count(lit(1)).as("n") +: (firsts ++ seconds)
    val m = feat.agg(aggs.head, aggs.tail: _*)
    val cells = for (i <- 1 to 4; j <- i + 1 to 4) yield
      struct(lit(names(i)).as("f1"), lit(names(j)).as("f2"),
        round(expr(s"CAST(n * s${i}${j} - s$i * s$j AS DOUBLE)") /
          (sqrt(expr(s"CAST(n * s${i}${i} - s$i * s$i AS DOUBLE)")) *
            sqrt(expr(s"CAST(n * s${j}${j} - s$j * s$j AS DOUBLE)")))
          * 1000000.0).cast("long").as("corr_micro"))
    m.select(explode(array(cells: _*)).as("c"))
      .select($"c.f1", $"c.f2", $"c.corr_micro")
  }

  /** q202 — quantile normalization across sources (map every source's
    * quality-score distribution onto the POOLED distribution — the
    * cross-source comparability transform of expression arrays /
    * score recalibration): per (source, score) cell, its within-
    * source inclusive-CDF percentile; the normalized score is the
    * pooled inverse CDF at that percentile (min pooled score with
    * cdf ≥ pct). The inverse-CDF lookup is a STEP-FUNCTION JOIN done
    * scale-safe with ScaleWindows.rangeLastCarry: pooled-CDF rows and
    * query percentiles union into one O(sources·grid) frame keyed by
    * (−threshold, tag) — pooled rows sort before queries at equal
    * threshold so cdf == pct matches — and the carried value IS the
    * answer; no global window, no per-row subquery, no range
    * explosion. Per-source CDFs come from a source-PARTITIONED window
    * over the cell frame (bounded by the value grid). All
    * percentiles are exact integral micros. */
  val quantileNormalize: Q = (s, dir) => {
    import s.implicits._
    val d = Tables(s, dir, "documents")
      .select($"source",
        (size(TextOps.tokens($"text")) % 100).as("score"))
    val cell = d.groupBy($"source", $"score")
      .agg(count(lit(1)).as("cnt"))
    val wSrc = Window.partitionBy($"source").orderBy($"score")
      .rowsBetween(Window.unboundedPreceding, 0)
    val src = cell
      .withColumn("cum", sum($"cnt").over(wSrc))
      .withColumn("t", sum($"cnt").over(Window.partitionBy($"source")))
      .withColumn("pct_micro", expr("(1000000 * cum) div t"))
    val ph = cell.groupBy($"score").agg(sum($"cnt").as("pc"))
    val ptot = ph.agg(sum($"pc").as("tt"))
    val pooled = graft.functions.ScaleWindows
      .rangeCumSum(ph, Seq($"score".asc), $"pc", "pcum")
      .crossJoin(broadcast(ptot))
      .select($"score",
        expr("(1000000 * (pcum + pc)) div tt").as("cdf_micro"))
    val queryPts = src.select($"pct_micro".as("k"), lit(1).as("tag"),
      lit(null).cast("long").as("pv"), $"source", $"score", $"cnt")
    val poolPts = pooled.select($"cdf_micro".as("k"), lit(0).as("tag"),
      $"score".cast("long").as("pv"),
      lit(null).cast("string").as("source"),
      lit(null).cast("int").as("score"), lit(null).cast("long").as("cnt"))
    // keys: −threshold (desc processing → carried value = MIN pooled
    // score with cdf ≥ pct), pooled-before-query at equal threshold,
    // −pv so equal-cdf pooled rows resolve to the smaller score
    graft.functions.ScaleWindows
      .rangeLastCarry(queryPts.unionByName(poolPts),
        Seq((-$"k").as("nk"), $"tag", (-$"pv").as("npv")),
        $"pv", "norm_score")
      .filter($"tag" === 1)
      .select($"source", $"score", $"cnt".as("n"),
        $"k".as("pct_micro"), $"norm_score")
  }

  /** q205 — time-weighted average value per user (TWAP — the metric
    * for irregularly-sampled series where a plain mean over-weights
    * bursts): each observation holds until the next one (step
    * interpolation), so TWAP = Σ vᵢ·Δtᵢ / Σ Δtᵢ with Δt from a lead()
    * window PARTITIONED by user (per-key history, never global); the
    * last observation has no holding interval and drops from both
    * sums (the standard convention). Products are decimal(38,0)
    * (cents × seconds overflows a long at ~3e9 cent-seconds); TWAP is
    * an exact integral micro-division; users with a single
    * observation report NULL. */
  val twap: Q = (s, dir) => {
    import s.implicits._
    val ord = Window.partitionBy($"user_id")
      .orderBy($"sec".asc, $"event_id".asc)
    val e = Tables(s, dir, "events").filter($"value".isNotNull)
      .select($"user_id", $"event_id",
        expr("unix_micros(ts) div 1000000").as("sec"),
        round($"value" * 100).cast("long").as("v"))
      .withColumn("dt", lead($"sec", 1).over(ord) - $"sec")
    e.filter($"dt".isNotNull)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_intervals"),
        sum($"dt").as("span_s"),
        sum(expr("CAST(v AS DECIMAL(38,0)) * dt")).as("vw"))
      .select($"user_id", $"n_intervals", $"span_s",
        when($"span_s" > 0,
          expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * vw" +
            " div greatest(CAST(span_s AS DECIMAL(38,0)), 1)" +
            " AS BIGINT)")).as("twap_micro"))
  }

  /** q206 — daily OHLC + VWAP bars over lineitem (the resample-to-
    * candles shape of market/metrics pipelines): one map-side-combined
    * aggregate per ship-day — open/close via min_by/max_by on the
    * deterministic within-day sequence l_orderkey·10 + l_linenumber
    * (TPC-H linenumber ≤ 7, so the key is collision-free), high/low
    * plain min/max, VWAP an exact decimal(38,0) integral division of
    * the cent·centiqty cross products. No window anywhere — candles
    * are pure aggregation. */
  val ohlcBars: Q = (s, dir) => {
    import s.implicits._
    val l = Tables(s, dir, "lineitem")
      .select(to_date($"l_shipdate").as("day"),
        ($"l_orderkey" * 10 + $"l_linenumber").as("seq"),
        round($"l_extendedprice" * 100).cast("long").as("price_c"),
        round($"l_quantity" * 100).cast("long").as("qty_c"))
    l.groupBy($"day")
      .agg(count(lit(1)).as("n_fills"),
        min_by($"price_c", $"seq").as("open_c"),
        max($"price_c").as("high_c"),
        min($"price_c").as("low_c"),
        max_by($"price_c", $"seq").as("close_c"),
        sum($"qty_c").as("vol_centi"),
        sum(expr("CAST(price_c AS DECIMAL(38,0)) * qty_c")).as("pv"))
      .select($"day", $"n_fills", $"open_c", $"high_c", $"low_c",
        $"close_c", $"vol_centi",
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * pv" +
          " div greatest(CAST(vol_centi AS DECIMAL(38,0)), 1)" +
          " AS BIGINT)").as("vwap_micro"))
  }

  /** q209 — isotonic (PAV) calibration of the acctbal→high-value-order
    * rate: the monotone least-squares fit over $100 balance buckets,
    * via functions.Isotonic — GCM convex hull distributed as
    * per-range-partition monotone chains + one O(hull)-task merge
    * (see Isotonic.scala for why hulls distribute), assignment back to
    * buckets through the rangeLastCarry step join. The oracle checks
    * the same numbers from the cubic minimax characterization
    * max_{j≤i} min_{k≥i} avg(y on (j,k]) — feasible at the O(grid)
    * bucket count, which is exactly why the hull form exists for the
    * corpus-scale path. Slopes are exact-rational micro quantities;
    * quantization commutes with min/max, so hull and minimax agree
    * integer-for-integer. */
  val isotonicCalibration: Q = (s, dir) => {
    import s.implicits._
    val scored = Tables(s, dir, "customer")
      .join(Tables(s, dir, "orders")
          .filter($"o_totalprice" > 450000.0)
          .select($"o_custkey").distinct()
          .withColumn("label", lit(1L)),
        $"c_custkey" === $"o_custkey", "left")
      .select(round($"c_acctbal" * 100).cast("long").as("cents"),
        coalesce($"label", lit(0L)).as("label"))
    val buckets = scored.groupBy(expr("cents div 10000").as("x"))
      .agg(count(lit(1)).as("n"), sum($"label").as("sy"))
    graft.functions.Isotonic.fit(buckets)
  }

  // q219's lag weights α(1-α)^j, α=0.25, micro-quantized ONCE in Scala —
  // both engines consume the same literals, so no float crosses the gate
  private val EwmaW: Seq[Long] = (0 until 8).map(j =>
    math.round(1000000.0 * 0.25 * math.pow(0.75, j)))

  /** q219 — per-user EWMA smoothing, WINDOWED form: the infinite
    * exponential recurrence y_t = αx_t + (1-α)y_{t-1} is inherently
    * sequential (a running product no partial aggregation expresses
    * exactly), so the scale-safe deployment truncates it at 8 lags —
    * weight α(1-α)⁷ ≈ 3% of mass — making each row a FIXED dot product
    * over a user-PARTITIONED ROWS window: embarrassingly parallel,
    * no cross-partition state, exact integer arithmetic (the weights
    * are micro literals quantized once in Scala). Missing lags (series
    * head, NULL values) renormalize by the present-weight sum, so the
    * smoother is well-defined from the first row. */
  val ewmaSmooth: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id")
      .orderBy($"sec".asc, $"event_id".asc)
    val base = Tables(s, dir, "events").select($"event_id", $"user_id",
      unix_timestamp(date_trunc("second", $"ts")).as("sec"),
      round($"value" * 100).cast("long").as("cents"))
    val withLags = EwmaW.indices.foldLeft(base) { (df, j) =>
      df.withColumn(s"l$j", lag($"cents", j).over(w))
    }
    val num = EwmaW.zipWithIndex.map { case (wt, j) =>
      coalesce(col(s"l$j"), lit(0L)) * lit(wt) }.reduce(_ + _)
    val den = EwmaW.zipWithIndex.map { case (wt, j) =>
      when(col(s"l$j").isNotNull, lit(wt)).otherwise(lit(0L)) }
      .reduce(_ + _)
    withLags
      .withColumn("num", num).withColumn("den", greatest(den, lit(1L)))
      .selectExpr("event_id", "user_id",
        "1000 * num div den AS ewma_milli")
  }

  // ---- q211 OLS: shared Spark/DuckDB expression texts ----------------
  // The moment sums are exact decimal(38,0)/HUGEINT; everything after is
  // double over those exact integers with the operation tree written ONCE
  // and parsed by both engines (q189/q193's rule), so the coefficients
  // are bit-identical despite different summation orders upstream.
  private val olsDbl: Seq[String] =
    Seq("n", "s1", "s2", "s11", "s12", "s22", "sy", "s1y", "s2y", "syy")
      .map(c => s"CAST($c AS DOUBLE) AS ${c}d")
  private val olsDetA =
    "(nd*(s11d*s22d - s12d*s12d) - s1d*(s1d*s22d - s12d*s2d)" +
      " + s2d*(s1d*s12d - s11d*s2d))"
  private val olsDet0 =
    "(syd*(s11d*s22d - s12d*s12d) - s1d*(s1yd*s22d - s12d*s2yd)" +
      " + s2d*(s1yd*s12d - s11d*s2yd))"
  private val olsDet1 =
    "(nd*(s1yd*s22d - s12d*s2yd) - syd*(s1d*s22d - s12d*s2d)" +
      " + s2d*(s1d*s2yd - s1yd*s2d))"
  private val olsDet2 =
    "(nd*(s11d*s2yd - s1yd*s12d) - s1d*(s1d*s2yd - s1yd*s2d)" +
      " + syd*(s1d*s12d - s11d*s2d))"
  private val olsBetas = Seq(
    s"($olsDet0) / ($olsDetA) AS b0d",
    s"($olsDet1) / ($olsDetA) AS b1d",
    s"($olsDet2) / ($olsDetA) AS b2d")
  private val olsOut = Seq(
    "CAST(n AS BIGINT) AS n",
    "CAST(round(b0d * 1000000.0) AS BIGINT) AS intercept_micro",
    "CAST(round(b1d * 1000000.0) AS BIGINT) AS beta_acctbal_micro",
    "CAST(round(b2d * 1000000.0) AS BIGINT) AS beta_norders_micro",
    "CAST(round((1.0 - (syyd - b0d*syd - b1d*s1yd - b2d*s2yd)" +
      " / (syyd - syd*syd/nd)) * 1000000.0) AS BIGINT) AS r2_micro")

  /** q211 — multi-feature OLS via the NORMAL EQUATIONS (the closed-form
    * regression every feature-importance / trend readout wants once
    * there is more than one regressor — q142 is the 1-feature case):
    * lifetime spend ~ intercept + acctbal + order count, solved by
    * Cramer's rule on the 3×3 Gram matrix. ONE map-side-combined
    * aggregate pass collects the 10 exact decimal(38,0) moment sums
    * (cents-scale features stay inside decimal38 to ~1e12 rows); the
    * 3×3 determinants and R² then run in double ON THE ONE-ROW frame
    * with the operand tree shared token-for-token with the oracle — no
    * second scan, no per-feature passes, nothing iterative. Scale
    * posture: identical to q201 (corr matrix) — the corpus is touched
    * exactly once. */
  val olsNormal: Q = (s, dir) => {
    import s.implicits._
    val o = Tables(s, dir, "orders").groupBy($"o_custkey")
      .agg(count(lit(1)).as("cnt"),
        sum(round($"o_totalprice" * 100).cast("long")).as("spend"))
    val feat = Tables(s, dir, "customer")
      .join(o, $"c_custkey" === $"o_custkey", "left")
      .select(round($"c_acctbal" * 100).cast("long").as("x1"),
        coalesce($"cnt", lit(0L)).as("x2"),
        coalesce($"spend", lit(0L)).as("y"))
    val m = feat.agg(
      count(lit(1)).as("n"),
      sum(expr("CAST(x1 AS DECIMAL(38,0))")).as("s1"),
      sum(expr("CAST(x2 AS DECIMAL(38,0))")).as("s2"),
      sum(expr("CAST(x1 AS DECIMAL(38,0)) * x1")).as("s11"),
      sum(expr("CAST(x1 AS DECIMAL(38,0)) * x2")).as("s12"),
      sum(expr("CAST(x2 AS DECIMAL(38,0)) * x2")).as("s22"),
      sum(expr("CAST(y AS DECIMAL(38,0))")).as("sy"),
      sum(expr("CAST(x1 AS DECIMAL(38,0)) * y")).as("s1y"),
      sum(expr("CAST(x2 AS DECIMAL(38,0)) * y")).as("s2y"),
      sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
    m.selectExpr("n" +: olsDbl: _*)
      .selectExpr(Seq("n", "nd", "syd", "s1yd", "s2yd", "syyd") ++
        olsBetas: _*)
      .selectExpr(olsOut: _*)
  }

  // ---- q212 PCA power iteration: shared expression texts -------------
  // One template generates both engines' round stages; the ONLY textual
  // difference is the integer-division operator (`div` vs `//`, both
  // truncate toward zero — q177's precedent), so every round's integer
  // state is identical by construction.
  private val pcaFeatures =
    Seq(1 -> "acctbal", 2 -> "n_orders", 3 -> "spend", 4 -> "max_order")
  private def pcaCorrCells: Seq[String] =
    (for (i <- 1 to 4; j <- 1 to 4) yield {
      if (i == j) s"CAST(1000000 AS BIGINT) AS c$i$j"
      else {
        val (a, b) = if (i < j) (i, j) else (j, i)
        s"CAST(round(CAST(n * s$a$b - s$a * s$b AS DOUBLE)" +
          s" / (sqrt(CAST(n * s$a$a - s$a * s$a AS DOUBLE))" +
          s" * sqrt(CAST(n * s$b$b - s$b * s$b AS DOUBLE)))" +
          s" * 1000000.0) AS BIGINT) AS c$i$j"
      }
    })
  private val pcaCarryC =
    for (i <- 1 to 4; j <- 1 to 4) yield s"c$i$j"
  private def pcaUStage: Seq[String] =
    (1 to 4).map(i =>
      s"c${i}1*v1 + c${i}2*v2 + c${i}3*v3 + c${i}4*v4 AS u$i")
  private val pcaSStage =
    "CASE WHEN abs(u1) >= abs(u2) AND abs(u1) >= abs(u3)" +
      " AND abs(u1) >= abs(u4) THEN u1" +
      " WHEN abs(u2) >= abs(u3) AND abs(u2) >= abs(u4) THEN u2" +
      " WHEN abs(u3) >= abs(u4) THEN u3 ELSE u4 END AS sca"
  private def pcaVStage(divOp: String): Seq[String] =
    (1 to 4).map(i => s"(u$i * 1000000) $divOp sca AS v$i")

  /** q212 — top principal component by POWER ITERATION over the 4×4
    * micro-quantized correlation matrix of q201's customer features.
    * The distributed work is exactly one moment-sum pass (the same 14
    * exact decimal(38,0) sums as q201); the 4×4 matrix then lives on a
    * ONE-ROW frame and the 10 iteration rounds are chained projections
    * over it — O(1) data, no driver collect, no loop over the corpus.
    * Each round is EXACT integer arithmetic: u = C·v stays ≤4·10¹²
    * (long-safe), and the L∞ re-normalization divides by the SIGNED
    * max-magnitude component with truncating integer division (shared
    * `div`/`//` semantics), which also pins the dominant loading to
    * exactly +1e6 — fully deterministic on any partitioning and
    * bit-identical across engines regardless of convergence state.
    * sca of the final round estimates the top eigenvalue in micro
    * (∈[1e6, 4e6] for a 4×4 correlation matrix; spec-asserted). */
  /** The one-row c11..c44 micro correlation-matrix frame q212
    * iterates over (also the spec's reference input). */
  private[graft] def pcaMat(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val o = Tables(s, dir, "orders").groupBy($"o_custkey")
      .agg(count(lit(1)).as("cnt"),
        sum(round($"o_totalprice" * 100).cast("long")).as("spend"),
        max(round($"o_totalprice" * 100).cast("long")).as("maxp"))
    val feat = Tables(s, dir, "customer")
      .join(o, $"c_custkey" === $"o_custkey", "left")
      .select(round($"c_acctbal" * 100).cast("long").as("x1"),
        coalesce($"cnt", lit(0L)).as("x2"),
        coalesce($"spend", lit(0L)).as("x3"),
        coalesce($"maxp", lit(0L)).as("x4"))
    val firsts = (1 to 4).map(i =>
      sum(expr(s"CAST(x$i AS DECIMAL(38,0))")).as(s"s$i"))
    val seconds = for (i <- 1 to 4; j <- i to 4) yield
      sum(expr(s"CAST(x$i AS DECIMAL(38,0)) * x$j")).as(s"s$i$j")
    val aggs = count(lit(1)).as("n") +: (firsts ++ seconds)
    feat.agg(aggs.head, aggs.tail: _*).selectExpr(pcaCorrCells: _*)
  }

  val pcaPower: Q = (s, dir) => {
    import s.implicits._
    val mat = pcaMat(s, dir)
    val v0 = mat.selectExpr(pcaCarryC ++
      (1 to 4).map(i => s"CAST(1000000 AS BIGINT) AS v$i"): _*)
    val iterated = (1 to 10).foldLeft(v0) { (df, _) =>
      df.selectExpr(pcaCarryC ++ pcaUStage: _*)
        .selectExpr(pcaCarryC ++ (1 to 4).map(i => s"u$i") :+
          pcaSStage: _*)
        .selectExpr(pcaCarryC ++ pcaVStage("div") :+ "sca": _*)
    }
    val cells = pcaFeatures.map { case (i, nm) =>
      struct(lit(nm).as("feature"), col(s"v$i").as("loading_micro"))
    }
    // sca = max|C_micro·v_micro| ≈ λ·1e12 (both factors micro-scaled);
    // one more truncating divide lands λ in plain micro units
    iterated.select(explode(array(cells: _*)).as("c"),
      expr("sca div 1000000").as("lambda_micro"))
      .select($"c.feature", $"c.loading_micro", $"lambda_micro")
  }

  // ---- q223 Markov attribution: shared expression texts --------------
  // Same one-row-matrix-iteration template as q212: the corpus reduces
  // to a 5×6 transition-count matrix; the five absorption chains (base
  // + one per removed channel) iterate in exact integer micro
  // arithmetic with `div`/`//` the only engine-text difference.
  private val MkChannels = Seq("view" -> "vw", "click" -> "ck",
    "signup" -> "su", "error" -> "er")
  private val MkFroms = Seq("start" -> "st") ++ MkChannels
  private val MkTargets = MkChannels :+ ("conv" -> "cv")
  private def mkPStage(divOp: String): Seq[String] =
    for ((_, f) <- MkFroms; (_, t) <- MkTargets) yield
      s"1000000 * c_${f}_$t $divOp greatest(rs_$f, 1) AS p_${f}_$t"
  private def mkCarryP: Seq[String] =
    for ((_, f) <- MkFroms; (_, t) <- MkTargets) yield s"p_${f}_$t"
  private val MkVariants: Seq[(String, Option[String])] =
    ("base", Option.empty[String]) +:
      MkChannels.map { case (_, c) => (s"rm_$c", Some(c)) }
  private def mkCarryA: Seq[String] =
    for ((v, _) <- MkVariants; (_, f) <- MkFroms) yield s"a_${v}_$f"
  private def mkInit: Seq[String] =
    mkCarryA.map(a => s"CAST(0 AS BIGINT) AS $a")
  private def mkRound(divOp: String): Seq[String] =
    for ((v, removed) <- MkVariants; (_, f) <- MkFroms) yield {
      val terms = MkChannels.map(_._2).filterNot(removed.contains)
        .map(j => s"p_${f}_$j * a_${v}_$j").mkString(" + ")
      s"($terms) $divOp 1000000 + p_${f}_cv AS a_${v}_$f"
    }
  // Removal effects floor at 0: a removal can only lower absorption, so
  // a negative difference is an integer-rounding artifact. The clamp is
  // BEFORE the division — Spark `div` truncates toward zero while DuckDB
  // `//` floors, and they only disagree on negative operands, so keeping
  // every dividend non-negative makes the two engines bit-identical.
  private def mkRe(divOp: String): Seq[String] =
    MkChannels.map { case (_, c) =>
      s"1000000 * greatest(a_base_st - a_rm_${c}_st, 0) $divOp " +
        s"greatest(a_base_st, 1) AS re_$c"
    }

  /** q223 — Markov removal-effect attribution (the data-driven upgrade
    * of q179's positional rules — Anderl et al.'s absorbing-chain
    * model): user journeys become a first-order Markov chain over
    * {start, view, click, signup, error} with absorbing {conversion,
    * drop}; a channel's credit is its REMOVAL EFFECT — how much the
    * start→conversion absorption probability falls when all edges into
    * that channel are cut. The corpus collapses to the 5×6
    * transition-count matrix in one pass (a lag window per user + a
    * per-user terminal row); the five absorption fixed-points (base +
    * 4 removals) then iterate 15 rounds on the ONE-ROW frame in exact
    * integer micro arithmetic — q212's small-model-over-big-data
    * template, deterministic on any partitioning and bit-identical
    * across engines regardless of convergence state. Journeys truncate
    * at the FIRST purchase (standard first-conversion model). */
  val markovAttribution: Q = (s, dir) => {
    import s.implicits._
    val ev = Tables(s, dir, "events").select($"user_id", $"event_id",
      $"event_type", unix_timestamp(date_trunc("second", $"ts"))
        .as("sec"))
    val fp = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id").agg(min(struct($"sec", $"event_id")).as("pk"))
    val pre = ev.filter($"event_type" =!= "purchase")
      .join(fp, Seq("user_id"), "left")
      .filter($"pk".isNull || struct($"sec", $"event_id") < $"pk")
    val wU = Window.partitionBy($"user_id")
      .orderBy($"sec".asc, $"event_id".asc)
    val mid = pre.select($"user_id",
      coalesce(lag($"event_type", 1).over(wU), lit("start")).as("f"),
      $"event_type".as("t"))
    val lastPre = pre.groupBy($"user_id")
      .agg(max(struct($"sec", $"event_id", $"event_type")).as("lk"))
      .select($"user_id", $"lk.event_type".as("lastt"))
    val term = ev.select($"user_id").distinct()
      .join(lastPre, Seq("user_id"), "left")
      .join(fp, Seq("user_id"), "left")
      .select($"user_id", coalesce($"lastt", lit("start")).as("f"),
        when($"pk".isNotNull, lit("conv")).otherwise(lit("null"))
          .as("t"))
    val trans = mid.unionByName(term).select($"f", $"t")
    val aggs = MkFroms.flatMap { case (fn, fc) =>
      sum(when($"f" === fn, 1L).otherwise(0L)).as(s"rs_$fc") +:
        MkTargets.map { case (tn, tc) =>
          sum(when($"f" === fn && $"t" === tn, 1L).otherwise(0L))
            .as(s"c_${fc}_$tc")
        }
    }
    val m = trans.agg(aggs.head, aggs.tail: _*)
    val p0 = m.selectExpr(mkPStage("div"): _*)
    val init = p0.selectExpr(mkCarryP ++ mkInit: _*)
    // barrier every 5 rounds (r9 VERDICT item 2): all 15 stacked
    // projection rounds in ONE WholeStageCodegen unit generate a
    // >64 KB processNext — janino rejects it and the whole stage
    // silently runs interpreted (the one ERROR line in full Verify
    // logs). The localCheckpoint is on the ONE-ROW carry frame, so
    // the split costs O(1) rows and each compiled unit stays small.
    import graft.Materialize.TrunkCheckpointOps
    val iterated = (1 to 15).foldLeft(init) { (df, i) =>
      val next = df.selectExpr(mkCarryP ++ mkRound("div"): _*)
      if (i % 5 == 0 && i < 15) next.trunkCheckpoint() else next
    }
    val withRe = iterated.selectExpr(
      Seq("a_base_st") ++
        MkChannels.map { case (_, c) => s"a_rm_${c}_st" } ++
        mkRe("div"): _*)
    val reSum = MkChannels.map { case (_, c) => col(s"re_$c") }
      .reduce(_ + _)
    val cells = MkChannels.map { case (nm, c) =>
      struct(lit(nm).as("channel"),
        col(s"a_rm_${c}_st").as("conv_removed_micro"),
        col(s"re_$c").as("removal_effect_micro"))
    }
    withRe.withColumn("re_sum", greatest(reSum, lit(1L)))
      .select($"a_base_st".as("conv_base_micro"), $"re_sum",
        explode(array(cells: _*)).as("cell"))
      .selectExpr("cell.channel AS channel", "conv_base_micro",
        "cell.conv_removed_micro AS conv_removed_micro",
        "cell.removal_effect_micro AS removal_effect_micro",
        "1000000 * cell.removal_effect_micro div re_sum" +
          " AS attribution_micro")
  }

  // ------------------------------------------- q439 GROUPING SETS

  /** q439 — explicit GROUPING SETS (the asymmetric-hierarchy shape
    * ROLLUP (q47) and CUBE (q93) can't express: detail + one marginal
    * + grand total, skipping the linestatus marginal), with
    * `grouping_id` disambiguating rolled-up NULLs from data NULLs.
    * Plans as ONE pass — Spark's Expand replicates each input row
    * once per grouping set before a single hash aggregate, so the
    * 100 TB cost is 3× map-side rows into partial aggregation, never
    * three scans. Money stays exact cents per row. */
  val groupingSets: Q = (s, dir) => {
    Tables(s, dir, "lineitem").createOrReplaceTempView("li_gsets")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS rev_cents,
        |  count(1) AS n_lines
        |FROM li_gsets
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), ())""".stripMargin)
  }

  private val sqlGroupingSets: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |  sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT
      |    AS rev_cents,
      |  count(*)::BIGINT AS n_lines
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
      |  (l_returnflag), ())""".stripMargin

  // --------------------------------- q443 multiset set operations

  /** q443 — INTERSECT ALL / EXCEPT ALL (the multiset forms q48's
    * distinct set ops can't express): per-user CLICK occurrences vs
    * PURCHASE occurrences as bags — intersect-all keeps
    * min(multiplicity) copies (paired click-for-purchase), except-all
    * keeps the excess clicks. Spark plans both as a single aggregate
    * computing the two per-key multiplicities then a generator
    * replicating rows — one shuffle each, no join. Output stays
    * compact by re-counting the multiset (the duplicated rows are the
    * operator's output; the count is just transport). */
  val setOpsAll: Q = (s, dir) => {
    import s.implicits._
    val e = Tables(s, dir, "events")
    def occ(t: String) =
      e.filter($"event_type" === t).select($"user_id")
    val paired = occ("click").intersectAll(occ("purchase"))
      .withColumn("segment", lit("click_matched_by_purchase"))
    val excess = occ("click").exceptAll(occ("purchase"))
      .withColumn("segment", lit("click_excess"))
    paired.unionByName(excess)
      .groupBy($"segment", $"user_id")
      .agg(count(lit(1)).as("n"))
      .orderBy($"segment", $"user_id")
  }

  private val sqlSetOpsAll: String =
    """WITH paired AS (
      |  SELECT 'click_matched_by_purchase' AS segment, user_id FROM (
      |    SELECT user_id FROM events WHERE event_type = 'click'
      |    INTERSECT ALL
      |    SELECT user_id FROM events WHERE event_type = 'purchase')),
      |excess AS (
      |  SELECT 'click_excess' AS segment, user_id FROM (
      |    SELECT user_id FROM events WHERE event_type = 'click'
      |    EXCEPT ALL
      |    SELECT user_id FROM events WHERE event_type = 'purchase'))
      |SELECT segment, user_id, count(*)::BIGINT AS n
      |FROM (SELECT * FROM paired UNION ALL SELECT * FROM excess)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------- q444 interval-RANGE window burst scan

  /** q444 — event-time RANGE frame (the value-based window family;
    * q57's moving average is ROWS-based): for every event, the count
    * and spend inside the user's trailing hour, reduced to each
    * user's worst one-hour burst — the rate-limit / fraud-scan shape.
    * The frame is `RANGE [-3599, 0]` over epoch seconds, so ties and
    * gaps are handled by VALUE, not row position — deterministic under
    * any partition order. Window partitions by user (scales with
    * users); spend is exact cents. */
  val burstScan: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"sec")
      .rangeBetween(-3599, 0)
    Tables(s, dir, "events")
      .select($"user_id",
        unix_timestamp(date_trunc("second", $"ts")).as("sec"),
        round($"value" * 100).cast("long").as("cents"))
      .select($"user_id",
        count(lit(1)).over(w).as("n_1h"),
        sum($"cents").over(w).as("cents_1h"))
      .groupBy($"user_id")
      .agg(max($"n_1h").as("max_burst_1h"),
        max($"cents_1h").as("max_spend_1h_cents"))
      .orderBy($"user_id")
  }

  private val sqlBurstScan: String =
    """WITH e AS (SELECT user_id,
      |    epoch(date_trunc('second', ts))::BIGINT AS sec,
      |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
      |w AS (SELECT user_id,
      |    count(*) OVER (PARTITION BY user_id ORDER BY sec
      |      RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW) AS n_1h,
      |    sum(cents) OVER (PARTITION BY user_id ORDER BY sec
      |      RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW) AS cents_1h
      |  FROM e)
      |SELECT user_id, max(n_1h)::BIGINT AS max_burst_1h,
      |  max(cents_1h)::BIGINT AS max_spend_1h_cents
      |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin

  // ------------------------------------- q447 top-k with ties (RANK)

  /** q447 — top-3 busiest days per event type WITH ties (RANK, not
    * row_number — q18-style top-k silently drops tied rows; reporting
    * and SLA queries need all of them). The rank window orders by a
    * non-unique count on purpose: tied rows share a rank, so the
    * output is deterministic without a tie-break column. Day counts
    * collapse first (map-side combine), so the window runs over
    * O(types × days) rows, never raw events. */
  val topkWithTies: Q = (s, dir) => {
    import s.implicits._
    val daily = Tables(s, dir, "events")
      .groupBy($"event_type",
        to_date(date_trunc("day", $"ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy($"event_type").orderBy($"n_events".desc)
    daily.withColumn("rnk", rank().over(w).cast("long"))
      .filter($"rnk" <= 3)
      .orderBy($"event_type", $"rnk", $"day")
  }

  private val sqlTopkWithTies: String =
    """WITH daily AS (SELECT event_type,
      |    CAST(date_trunc('day', ts) AS DATE) AS day,
      |    count(*)::BIGINT AS n_events
      |  FROM events GROUP BY 1, 2),
      |r AS (SELECT event_type, day, n_events,
      |    rank() OVER (PARTITION BY event_type ORDER BY n_events DESC)
      |      ::BIGINT AS rnk
      |  FROM daily)
      |SELECT event_type, day, n_events, rnk
      |FROM r WHERE rnk <= 3
      |ORDER BY event_type, rnk, day""".stripMargin

  // --------------------------------- q449 LATERAL correlated subquery

  /** q449 — the SQL LATERAL surface: per-nation top-2 suppliers by
    * account balance through a correlated LATERAL derived table
    * (`FROM nation, LATERAL (... WHERE s_nationkey = n.n_nationkey
    * ORDER BY ... LIMIT 2)`), the form ELT tools emit for per-row
    * lookups. Catalyst decorrelates the ORDER BY + LIMIT into a
    * partitioned rank window on ONE supplier shuffle — proving the
    * engine rewrites the row-at-a-time formulation into the same
    * distributed plan q07's explicit window uses, instead of
    * executing a nested loop. */
  val lateralTopk: Q = (s, dir) => {
    Tables(s, dir, "nation").createOrReplaceTempView("nation_lat")
    Tables(s, dir, "supplier").createOrReplaceTempView("supplier_lat")
    s.sql(
      """SELECT n.n_name, t.s_suppkey, t.bal_cents
        |FROM nation_lat n,
        |LATERAL (SELECT s_suppkey,
        |    CAST(round(s_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM supplier_lat
        |  WHERE s_nationkey = n.n_nationkey
        |  ORDER BY bal_cents DESC, s_suppkey ASC LIMIT 2) t
        |ORDER BY n.n_name, t.bal_cents DESC, t.s_suppkey""".stripMargin)
  }

  private val sqlLateralTopk: String =
    """SELECT n.n_name, t.s_suppkey, t.bal_cents
      |FROM nation n,
      |LATERAL (SELECT s_suppkey,
      |    CAST(round(s_acctbal * 100) AS BIGINT) AS bal_cents
      |  FROM supplier
      |  WHERE s_nationkey = n.n_nationkey
      |  ORDER BY bal_cents DESC, s_suppkey ASC LIMIT 2) t
      |ORDER BY n.n_name, t.bal_cents DESC, t.s_suppkey""".stripMargin

  /** q468 — the MODERN AGGREGATE surface in one statement (the
    * SQL:2023-era functions a user migrating from Snowflake/BigQuery
    * reaches for first): mode() with the deterministic lowest-value
    * tie-break, percentile_cont / percentile_disc as WITHIN GROUP
    * inverse-distribution aggregates, listagg(DISTINCT … ORDER BY),
    * count_if, bool_and/bool_or, and any_value — used honestly, on an
    * expression constant within its group, which is the only case
    * where any_value is deterministic. The oracle restates each in
    * DuckDB's dialect (quantile_cont/quantile_disc, string_agg,
    * explicit (freq DESC, value ASC) argmin for mode — pinning the
    * tie-break SEMANTICS, not the function name). percentile_cont
    * interpolates over exact cent longs so the double is grid-exact.
    * Scale: one partial-aggregable pass; percentile_cont/disc are the
    * only non-sketch members (exact quantiles need a sort per group —
    * five groups here; q54/q96 are the corpus-scale quantile paths). */
  val modernAggregates: Q = (s, dir) => {
    Tables(s, dir, "orders").createOrReplaceTempView("orders_ma")
    s.sql(
      """SELECT o_orderpriority,
        |  count(*) AS n,
        |  mode(o_orderstatus, true) AS modal_status,
        |  round(percentile_cont(0.5) WITHIN GROUP
        |    (ORDER BY CAST(round(o_totalprice * 100) AS BIGINT)), 6)
        |    AS med_cents,
        |  CAST(percentile_disc(0.25) WITHIN GROUP
        |    (ORDER BY CAST(round(o_totalprice * 100) AS BIGINT))
        |    AS BIGINT) AS p25_cents,
        |  listagg(DISTINCT o_orderstatus, ',') WITHIN GROUP
        |    (ORDER BY o_orderstatus) AS statuses,
        |  count_if(o_orderstatus = 'O') AS n_open,
        |  bool_and(o_totalprice > 0) AS all_positive,
        |  bool_or(CAST(round(o_totalprice * 100) AS BIGINT) > 45000000)
        |    AS any_above_450k,
        |  any_value(substring(o_orderpriority, 1, 1)) AS prio_digit
        |FROM orders_ma
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  private val sqlModernAggregates: String =
    """WITH o AS (SELECT o_orderpriority, o_orderstatus,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |    o_totalprice
      |  FROM orders),
      |modal AS (SELECT o_orderpriority, o_orderstatus AS modal_status
      |  FROM (SELECT o_orderpriority, o_orderstatus,
      |      row_number() OVER (PARTITION BY o_orderpriority
      |        ORDER BY count(*) DESC, o_orderstatus ASC) AS rnk
      |    FROM o GROUP BY o_orderpriority, o_orderstatus) t
      |  WHERE rnk = 1)
      |SELECT o.o_orderpriority,
      |  count(*)::BIGINT AS n,
      |  any_value(m.modal_status) AS modal_status,
      |  round(quantile_cont(cents, 0.5), 6) AS med_cents,
      |  quantile_disc(cents, 0.25)::BIGINT AS p25_cents,
      |  string_agg(DISTINCT o_orderstatus, ','
      |    ORDER BY o_orderstatus) AS statuses,
      |  count_if(o_orderstatus = 'O')::BIGINT AS n_open,
      |  bool_and(o_totalprice > 0) AS all_positive,
      |  bool_or(cents > 45000000) AS any_above_450k,
      |  substring(o.o_orderpriority, 1, 1) AS prio_digit
      |FROM o JOIN modal m USING (o_orderpriority)
      |GROUP BY o.o_orderpriority
      |ORDER BY o.o_orderpriority""".stripMargin

  // ------------------------------ q452 net-dollar-retention cohorts

  /** q452 — revenue-retention cohort matrix (the dollar counterpart
    * of q79's user-count cohorts): customers cohort by first-order
    * month; each (cohort, month-offset) cell reports active
    * customers, revenue, and net dollar retention vs the cohort's
    * month-0 revenue. NDR is the exact integer micro division
    * `rev·10⁶ div rev0` — no float share. Scale: orders collapse to
    * per-(customer, month) before anything else (map-side combine);
    * the first-order month is a per-customer min on the custkey
    * shuffle the cell aggregate reuses; the month-0 base joins back
    * on the O(months) cohort key. */
  val ndrCohorts: Q = (s, dir) => {
    import s.implicits._
    val o = Tables(s, dir, "orders")
      .select($"o_custkey",
        to_date(date_trunc("month", $"o_orderdate")).as("mon"),
        round($"o_totalprice" * 100).cast("long").as("cents"))
    val first = o.groupBy($"o_custkey").agg(min($"mon").as("cohort"))
    val cells = o.join(first, Seq("o_custkey"))
      .select($"cohort",
        months_between($"mon", $"cohort").cast("long").as("month_offset"),
        $"o_custkey", $"cents")
      .groupBy($"cohort", $"month_offset")
      .agg(countDistinct($"o_custkey").as("n_custs"),
        sum($"cents").as("rev_cents"))
    val base = cells.filter($"month_offset" === 0)
      .select($"cohort", $"rev_cents".as("rev0_cents"))
    cells.join(base, Seq("cohort"))
      .select($"cohort", $"month_offset", $"n_custs", $"rev_cents",
        expr("rev_cents * 1000000 div rev0_cents").as("ndr_micro"))
      .orderBy($"cohort", $"month_offset")
  }

  private val sqlNdrCohorts: String =
    """WITH o AS (SELECT o_custkey,
      |    CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders),
      |first AS (SELECT o_custkey, min(mon) AS cohort
      |  FROM o GROUP BY o_custkey),
      |cells AS (SELECT cohort,
      |    datediff('month', cohort, mon)::BIGINT AS month_offset,
      |    count(DISTINCT o.o_custkey)::BIGINT AS n_custs,
      |    sum(cents)::BIGINT AS rev_cents
      |  FROM o JOIN first ON o.o_custkey = first.o_custkey
      |  GROUP BY 1, 2),
      |base AS (SELECT cohort, rev_cents AS rev0_cents
      |  FROM cells WHERE month_offset = 0)
      |SELECT cells.cohort, month_offset, n_custs, rev_cents,
      |  rev_cents * 1000000 // rev0_cents AS ndr_micro
      |FROM cells JOIN base ON cells.cohort = base.cohort
      |ORDER BY cells.cohort, month_offset""".stripMargin

  val queries: Map[String, Q] = Map(
    "q452_ndr_cohorts" -> ndrCohorts,
    "q449_lateral_topk" -> lateralTopk,
    "q468_modern_aggregates" -> modernAggregates,
    "q447_topk_with_ties" -> topkWithTies,
    "q443_set_ops_all" -> setOpsAll,
    "q444_burst_scan" -> burstScan,
    "q439_grouping_sets" -> groupingSets,
    "q223_markov_attribution" -> markovAttribution,
    "q41_sessionize" -> sessionize,
    "q163_bounce_rate" -> bounceRate,
    "q164_churn_buckets" -> churnBuckets,
    "q165_session_lift" -> sessionLift,
    "q76_unpivot_counts" -> unpivotCounts,
    "q78_funnel" -> funnel,
    "q79_retention_cohorts" -> retentionCohorts,
    "q47_rollup_summary" -> rollupSummary,
    "q93_cube_summary" -> cubeSummary,
    "q94_quality_deciles" -> qualityDeciles,
    "q128_rank_normalize" -> rankNormalize,
    "q133_markov_transitions" -> markovTransitions,
    "q144_path_mining" -> pathMining,
    "q148_diversified_topk" -> diversifiedTopK,
    "q150_cube_serving" -> cubeServing,
    "q153_dwell_percentiles" -> dwellPercentiles,
    "q154_rfm_segments" -> rfmSegments,
    "q149_score_calibration" -> scoreCalibration,
    "q48_set_ops" -> setOps,
    "q49_pivot_counts" -> pivotCounts,
    "q09_backfill_window" -> backfillWindow,
    "q10_backfill_two_tier" -> backfillTwoTier,
    "q11_min_disjunctive" -> minDisjunctive,
    "q12_union_dedup" -> unionDedup,
    "q13_daily_resample" -> dailyResample,
    "q14_grouped_stats" -> groupedStats,
    "q15_event_type_counts" -> eventTypeCounts,
    "q171_gini_revenue" -> giniRevenue,
    "q172_abc_classes" -> abcClasses,
    "q173_association_rules" -> associationRules,
    "q174_winsorized_stats" -> winsorizedStats,
    "q175_interpolate_gaps" -> interpolateGaps,
    "q176_capped_balance" -> cappedBalance,
    "q179_attribution" -> attribution,
    "q180_mad_outliers" -> madOutliers,
    "q186_gains_table" -> gainsTable,
    "q191_auc_exact" -> aucExact,
    "q192_ks_test" -> ksTest,
    "q193_spearman" -> spearman,
    "q195_window_funnel" -> windowFunnel,
    "q197_best_split" -> bestSplit,
    "q198_kaplan_meier" -> kaplanMeier,
    "q199_mann_whitney" -> mannWhitney,
    "q201_corr_matrix" -> corrMatrix,
    "q202_quantile_normalize" -> quantileNormalize,
    "q205_twap" -> twap,
    "q206_ohlc_bars" -> ohlcBars,
    "q209_isotonic_calibration" -> isotonicCalibration,
    "q211_ols_normal" -> olsNormal,
    "q212_pca_power" -> pcaPower,
    "q219_ewma_smooth" -> ewmaSmooth,
  )

  /** q211 oracle — same moment CTE, then the SHARED double-stage texts. */
  private def sqlOlsNormal: String =
    s"""WITH o AS (SELECT o_custkey, count(*)::BIGINT AS cnt,
       |    sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT
       |      AS spend
       |  FROM orders GROUP BY 1),
       |feat AS (SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS x1,
       |    coalesce(cnt, 0)::BIGINT AS x2,
       |    coalesce(spend, 0)::BIGINT AS y
       |  FROM customer LEFT JOIN o ON o_custkey = c_custkey),
       |m AS (SELECT count(*)::BIGINT AS n,
       |    sum(x1::HUGEINT) AS s1, sum(x2::HUGEINT) AS s2,
       |    sum(x1::HUGEINT * x1) AS s11, sum(x1::HUGEINT * x2) AS s12,
       |    sum(x2::HUGEINT * x2) AS s22, sum(y::HUGEINT) AS sy,
       |    sum(x1::HUGEINT * y) AS s1y, sum(x2::HUGEINT * y) AS s2y,
       |    sum(y::HUGEINT * y) AS syy
       |  FROM feat),
       |dbl AS (SELECT n, ${olsDbl.mkString(", ")} FROM m),
       |bet AS (SELECT n, nd, syd, s1yd, s2yd, syyd,
       |  ${olsBetas.mkString(", ")} FROM dbl)
       |SELECT ${olsOut.mkString(", ")} FROM bet""".stripMargin

  /** q212 oracle — q201's moment CTE, the shared correlation-cell
    * texts, then the 10 power rounds as chained CTEs generated from
    * the SAME templates as the Spark plan (only `div`→`//`). */
  private def sqlPcaPower: String = {
    val firsts = (1 to 4).map(i => s"sum(x$i::HUGEINT) AS s$i")
    val seconds = for (i <- 1 to 4; j <- i to 4)
      yield s"sum(x$i::HUGEINT * x$j) AS s$i$j"
    val carry = pcaCarryC.mkString(", ")
    val rounds = (1 to 10).map { r =>
      val prev = if (r == 1) "r0" else s"r${r - 1}v"
      s"""r${r}u AS (SELECT $carry, ${pcaUStage.mkString(", ")}
         |  FROM $prev),
         |r${r}s AS (SELECT $carry, u1, u2, u3, u4, $pcaSStage
         |  FROM r${r}u),
         |r${r}v AS (SELECT $carry, ${pcaVStage("//").mkString(", ")},
         |  sca FROM r${r}s)""".stripMargin
    }.mkString(",\n")
    val finalRows = pcaFeatures.map { case (i, nm) =>
      s"SELECT '$nm' AS feature, v$i AS loading_micro," +
        s" sca // 1000000 AS lambda_micro FROM r10v"
    }.mkString("\nUNION ALL\n")
    s"""WITH o AS (SELECT o_custkey, count(*)::BIGINT AS cnt,
       |    sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT
       |      AS spend,
       |    max(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT
       |      AS maxp
       |  FROM orders GROUP BY 1),
       |feat AS (SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS x1,
       |    coalesce(cnt, 0)::BIGINT AS x2,
       |    coalesce(spend, 0)::BIGINT AS x3,
       |    coalesce(maxp, 0)::BIGINT AS x4
       |  FROM customer LEFT JOIN o ON o_custkey = c_custkey),
       |m AS (SELECT count(*)::BIGINT AS n, ${firsts.mkString(", ")},
       |  ${seconds.mkString(", ")} FROM feat),
       |mat AS (SELECT ${pcaCorrCells.mkString(", ")} FROM m),
       |r0 AS (SELECT $carry,
       |  ${(1 to 4).map(i => s"CAST(1000000 AS BIGINT) AS v$i")
           .mkString(", ")} FROM mat),
       |$rounds
       |$finalRows""".stripMargin
  }

  private def sqlEwma: String = {
    val lags = EwmaW.indices
      .map(j => s"lag(cents, $j) OVER w AS l$j").mkString(",\n    ")
    val num = EwmaW.zipWithIndex
      .map { case (wt, j) => s"coalesce(l$j, 0) * $wt" }
      .mkString(" + ")
    val den = EwmaW.zipWithIndex
      .map { case (wt, j) =>
        s"CASE WHEN l$j IS NOT NULL THEN $wt ELSE 0 END" }
      .mkString(" + ")
    s"""WITH b AS (SELECT event_id, user_id,
       |    epoch(date_trunc('second', ts))::BIGINT AS sec,
       |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
       |l AS (SELECT event_id, user_id,
       |    $lags
       |  FROM b WINDOW w AS (PARTITION BY user_id
       |    ORDER BY sec ASC, event_id ASC))
       |SELECT event_id, user_id,
       |  1000 * ($num) // greatest($den, 1) AS ewma_milli
       |FROM l""".stripMargin
  }

  /** q223 oracle — the same transition extraction relationally, then
    * the SAME generated iteration texts with `//`. */
  private def sqlMarkov: String = {
    // ::BIGINT on every sum: DuckDB's sum(BIGINT) yields HUGEINT, which
    // Arrow surfaces as decimal128 — value-equal to the Spark longs but
    // type-distinct under the driver's hash compare. Keeping the counts
    // BIGINT keeps every downstream //-expression BIGINT.
    val counts = MkFroms.flatMap { case (fn, fc) =>
      s"sum(CASE WHEN f = '$fn' THEN 1 ELSE 0 END)::BIGINT AS rs_$fc" +:
        MkTargets.map { case (tn, tc) =>
          s"sum(CASE WHEN f = '$fn' AND t = '$tn' THEN 1 ELSE 0 END)" +
            s"::BIGINT AS c_${fc}_$tc"
        }
    }.mkString(",\n    ")
    val carryP = mkCarryP.mkString(", ")
    val rounds = (1 to 15).map { r =>
      val prev = if (r == 1) "i0" else s"i${r - 1}"
      s"""i$r AS (SELECT $carryP,
         |  ${mkRound("//").mkString(",\n  ")}
         |  FROM $prev)""".stripMargin
    }.mkString(",\n")
    val rmCols = MkChannels.map { case (_, c) => s"a_rm_${c}_st" }
      .mkString(", ")
    val reSum = MkChannels.map { case (_, c) => s"re_$c" }
      .mkString(" + ")
    val finalRows = MkChannels.map { case (nm, c) =>
      s"""SELECT '$nm' AS channel, a_base_st AS conv_base_micro,
         |  a_rm_${c}_st AS conv_removed_micro,
         |  re_$c AS removal_effect_micro,
         |  1000000 * re_$c // re_sum AS attribution_micro
         |FROM fin""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ev AS (SELECT user_id, event_id, event_type,
       |    epoch(date_trunc('second', ts))::BIGINT AS sec FROM events),
       |fp AS (SELECT user_id, sec AS psec, event_id AS pid FROM (
       |    SELECT user_id, sec, event_id, row_number() OVER (
       |      PARTITION BY user_id ORDER BY sec, event_id) AS rn
       |    FROM ev WHERE event_type = 'purchase') x WHERE rn = 1),
       |pre AS (SELECT ev.user_id, ev.event_id, ev.event_type, ev.sec
       |  FROM ev LEFT JOIN fp USING (user_id)
       |  WHERE ev.event_type <> 'purchase'
       |    AND (fp.user_id IS NULL OR (sec, event_id) < (psec, pid))),
       |mid AS (SELECT coalesce(lag(event_type) OVER (
       |      PARTITION BY user_id ORDER BY sec, event_id), 'start')
       |      AS f,
       |    event_type AS t FROM pre),
       |lastpre AS (SELECT user_id, event_type AS lastt FROM (
       |    SELECT user_id, event_type, row_number() OVER (
       |      PARTITION BY user_id ORDER BY sec DESC, event_id DESC)
       |      AS rn
       |    FROM pre) x WHERE rn = 1),
       |term AS (SELECT coalesce(lastt, 'start') AS f,
       |    CASE WHEN fp.user_id IS NOT NULL THEN 'conv' ELSE 'null'
       |      END AS t
       |  FROM (SELECT DISTINCT user_id FROM ev) u
       |  LEFT JOIN lastpre USING (user_id) LEFT JOIN fp USING (user_id)),
       |trans AS (SELECT f, t FROM mid UNION ALL SELECT f, t FROM term),
       |m AS (SELECT $counts FROM trans),
       |p AS (SELECT ${mkPStage("//").mkString(",\n  ")} FROM m),
       |i0 AS (SELECT $carryP, ${mkInit.mkString(", ")} FROM p),
       |$rounds,
       |fin0 AS (SELECT a_base_st, $rmCols,
       |  ${mkRe("//").mkString(",\n  ")} FROM i15),
       |fin AS (SELECT *, greatest($reSum, 1) AS re_sum FROM fin0)
       |$finalRows""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q443_set_ops_all" -> sqlSetOpsAll,
    "q447_topk_with_ties" -> sqlTopkWithTies,
    "q449_lateral_topk" -> sqlLateralTopk,
    "q468_modern_aggregates" -> sqlModernAggregates,
    "q452_ndr_cohorts" -> sqlNdrCohorts,
    "q444_burst_scan" -> sqlBurstScan,
    "q439_grouping_sets" -> sqlGroupingSets,
    "q223_markov_attribution" -> sqlMarkov,
    "q219_ewma_smooth" -> sqlEwma,
    "q211_ols_normal" -> sqlOlsNormal,
    "q212_pca_power" -> sqlPcaPower,
    "q93_cube_summary" ->
      """SELECT o_orderstatus, o_orderpriority,
        | round(sum(o_totalprice), 2) AS revenue,
        | count(*) AS n_orders
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "q153_dwell_percentiles" ->
      """WITH seq AS (SELECT user_id, event_id, event_type,
        |    epoch(date_trunc('second', ts))::BIGINT AS sec
        |  FROM events),
        |gaps AS (SELECT event_type AS from_type,
        |    lead(event_type) OVER w AS to_type,
        |    lead(sec) OVER w - sec AS gap_s
        |  FROM seq WINDOW w AS (PARTITION BY user_id
        |    ORDER BY sec ASC, event_id ASC))
        |SELECT from_type, to_type, count(*)::BIGINT AS n,
        |  round(quantile_cont(gap_s, 0.5), 2) AS p50_s,
        |  round(quantile_cont(gap_s, 0.9), 2) AS p90_s
        |FROM gaps WHERE to_type IS NOT NULL
        |GROUP BY from_type, to_type""".stripMargin,
    "q154_rfm_segments" ->
      """WITH cust AS (SELECT o_custkey,
        |    date_diff('day', max(CAST(o_orderdate AS DATE)),
        |      DATE '1998-12-31') AS recency,
        |    count(*)::BIGINT AS freq,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS monetary_c
        |  FROM orders GROUP BY o_custkey)
        |SELECT o_custkey, CAST(recency AS INTEGER) AS recency, freq,
        |  monetary_c,
        |  CAST(ntile(4) OVER (ORDER BY recency ASC, o_custkey)
        |    AS INTEGER) AS r_quartile,
        |  CAST(ntile(4) OVER (ORDER BY freq DESC, o_custkey)
        |    AS INTEGER) AS f_quartile,
        |  CAST(ntile(4) OVER (ORDER BY monetary_c DESC, o_custkey)
        |    AS INTEGER) AS m_quartile
        |FROM cust""".stripMargin,
    "q150_cube_serving" ->
      """SELECT 'by_status' AS slice, o_orderstatus AS key,
        |  round(sum(o_totalprice), 2) AS revenue,
        |  count(*)::BIGINT AS n_orders
        |FROM orders GROUP BY o_orderstatus
        |UNION ALL
        |SELECT 'by_priority', o_orderpriority,
        |  round(sum(o_totalprice), 2), count(*)::BIGINT
        |FROM orders GROUP BY o_orderpriority
        |UNION ALL
        |SELECT 'grand', 'ALL', round(sum(o_totalprice), 2),
        |  count(*)::BIGINT
        |FROM orders""".stripMargin,
    "q148_diversified_topk" -> {
      val tk = graft.functions.TextOps.sqlTokens("text")
      s"""WITH scored AS (SELECT doc_id, source,
         |    CAST(len($tk) % 100 AS INTEGER) AS q_score
         |  FROM documents),
         |r AS (SELECT *, row_number() OVER (PARTITION BY source
         |    ORDER BY q_score DESC, doc_id ASC) AS src_rank
         |  FROM scored)
         |SELECT doc_id, source, q_score, CAST(src_rank AS INTEGER)
         |    AS src_rank
         |FROM r WHERE src_rank <= 2
         |ORDER BY q_score DESC, doc_id ASC LIMIT 10""".stripMargin
    },
    "q149_score_calibration" -> {
      val tk = graft.functions.TextOps.sqlTokens("text")
      val h = graft.functions.Hashing.sqlHash60(
        "'split|' || source || '|' || CAST(doc_id AS VARCHAR)")
      s"""WITH scored AS (SELECT doc_id, source,
         |    CAST(len($tk) % 100 AS INTEGER) AS q_score,
         |    CASE WHEN $h % 100 < 80 THEN 'train'
         |         WHEN $h % 100 < 90 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM documents),
         |counts AS (SELECT q_score, count(*)::BIGINT AS cnt
         |  FROM scored WHERE split = 'train' GROUP BY q_score),
         |hist AS (SELECT s.q_score, coalesce(cnt, 0)::BIGINT AS n
         |  FROM (SELECT CAST(unnest(range(0, 100)) AS INTEGER)
         |          AS q_score) s
         |  LEFT JOIN counts USING (q_score)),
         |cum AS (SELECT q_score, sum(n) OVER (ORDER BY q_score
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
         |    AS cum_n
         |  FROM hist),
         |tot AS (SELECT sum(n)::BIGINT AS train_total FROM hist)
         |SELECT doc_id, q_score,
         |  (1000000 * cum_n) // train_total AS pctile_micro
         |FROM scored JOIN cum USING (q_score) CROSS JOIN tot
         |WHERE split = 'val'""".stripMargin
    },
    "q144_path_mining" ->
      """WITH seq AS (SELECT user_id, event_id, event_type,
        |    epoch(date_trunc('second', ts))::BIGINT AS sec
        |  FROM events),
        |tri AS (SELECT event_type AS step1,
        |    lead(event_type, 1) OVER w AS step2,
        |    lead(event_type, 2) OVER w AS step3
        |  FROM seq WINDOW w AS (PARTITION BY user_id
        |    ORDER BY sec ASC, event_id ASC))
        |SELECT step1, step2, step3, count(*)::BIGINT AS n
        |FROM tri WHERE step3 IS NOT NULL
        |GROUP BY step1, step2, step3
        |ORDER BY n DESC, step1, step2, step3 LIMIT 10""".stripMargin,
    "q133_markov_transitions" ->
      """WITH seq AS (SELECT user_id, event_id, event_type,
        |    epoch(date_trunc('second', ts))::BIGINT AS sec
        |  FROM events),
        |pairs AS (SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY sec ASC, event_id ASC) AS to_type
        |  FROM seq),
        |counts AS (SELECT from_type, to_type, count(*)::BIGINT AS n
        |  FROM pairs WHERE to_type IS NOT NULL
        |  GROUP BY from_type, to_type),
        |tot AS (SELECT from_type, sum(n)::BIGINT AS row_total
        |  FROM counts GROUP BY from_type)
        |SELECT from_type, to_type, n,
        |  (1000000 * n) // row_total AS p_micro
        |FROM counts JOIN tot USING (from_type)""".stripMargin,
    "q128_rank_normalize" -> {
      val tk = graft.functions.TextOps.sqlTokens("text")
      s"""SELECT doc_id, source, q_score,
         | CAST(round(percent_rank() OVER w * 1000000.0) AS BIGINT)
         |   AS pct_rank_micro,
         | CAST(round(cume_dist() OVER w * 1000000.0) AS BIGINT)
         |   AS cume_dist_micro
         |FROM (SELECT doc_id, source,
         |      CAST(len($tk) % 100 AS INTEGER) AS q_score
         |      FROM documents) t
         |WINDOW w AS (PARTITION BY source ORDER BY q_score, doc_id)""".stripMargin
    },
    "q94_quality_deciles" -> {
      val tk = graft.functions.TextOps.sqlTokens("text")
      s"""SELECT doc_id, source, q_score,
         | CAST(ntile(10) OVER (ORDER BY q_score, doc_id) AS INTEGER)
         |   AS decile
         |FROM (SELECT doc_id, source,
         |      CAST(len($tk) % 100 AS INTEGER) AS q_score
         |      FROM documents) t""".stripMargin
    },
    "q47_rollup_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | count(*) AS n_rows
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q48_set_ops" ->
      """SELECT user_id, 'click_and_purchase' AS segment FROM (
        | SELECT user_id FROM events WHERE event_type = 'click'
        | INTERSECT
        | SELECT user_id FROM events WHERE event_type = 'purchase') a
        |UNION ALL
        |SELECT user_id, 'click_no_big_purchase' AS segment FROM (
        | SELECT user_id FROM events WHERE event_type = 'click'
        | EXCEPT
        | SELECT user_id FROM events
        |  WHERE event_type = 'purchase' AND value > 190.0) b""".stripMargin,
    "q49_pivot_counts" ->
      """SELECT user_id,
        | sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT
        |   AS n_click,
        | sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT
        |   AS n_view,
        | sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
        |   AS n_purchase,
        | sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT
        |   AS n_signup,
        | sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT
        |   AS n_error
        |FROM events GROUP BY user_id""".stripMargin,
    "q76_unpivot_counts" ->
      """WITH wide AS (
        |  SELECT user_id,
        |   sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT
        |     AS n_click,
        |   sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT
        |     AS n_view,
        |   sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
        |     AS n_purchase,
        |   sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT
        |     AS n_signup,
        |   sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT
        |     AS n_error
        |  FROM events GROUP BY user_id)
        |SELECT user_id, t.event_type,
        |  CASE t.event_type
        |    WHEN 'click' THEN n_click WHEN 'view' THEN n_view
        |    WHEN 'purchase' THEN n_purchase WHEN 'signup' THEN n_signup
        |    ELSE n_error END AS n
        |FROM wide CROSS JOIN (SELECT unnest(
        |  ['click', 'view', 'purchase', 'signup', 'error'])
        |  AS event_type) t""".stripMargin,
    "q78_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
        |    CAST(epoch(CAST(date_trunc('second', ts) AS TIMESTAMP))
        |      AS BIGINT) AS tsec FROM events),
        |t1 AS (SELECT user_id, min(tsec) AS t_click FROM e
        |  WHERE event_type = 'click' GROUP BY user_id),
        |t2 AS (SELECT e.user_id, min(e.tsec) AS t_view
        |  FROM e JOIN t1 USING (user_id)
        |  WHERE e.event_type = 'view' AND e.tsec >= t1.t_click
        |  GROUP BY e.user_id),
        |t3 AS (SELECT e.user_id, min(e.tsec) AS t_purchase
        |  FROM e JOIN t2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.tsec >= t2.t_view
        |  GROUP BY e.user_id)
        |SELECT u.user_id, t1.t_click, t2.t_view, t3.t_purchase,
        |  CASE WHEN t3.t_purchase IS NOT NULL THEN 3
        |       WHEN t2.t_view IS NOT NULL THEN 2
        |       WHEN t1.t_click IS NOT NULL THEN 1
        |       ELSE 0 END AS funnel_stage
        |FROM (SELECT DISTINCT user_id FROM e) u
        |LEFT JOIN t1 USING (user_id)
        |LEFT JOIN t2 USING (user_id)
        |LEFT JOIN t3 USING (user_id)""".stripMargin,
    "q79_retention_cohorts" ->
      """WITH e AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM e
        |  GROUP BY user_id)
        |SELECT c.cohort_day,
        |  CAST(e.day - c.cohort_day AS INTEGER) AS day_offset,
        |  count(DISTINCT e.user_id) AS n_users
        |FROM e JOIN c USING (user_id)
        |GROUP BY c.cohort_day, e.day - c.cohort_day""".stripMargin,
    "q164_churn_buckets" ->
      """WITH last AS (SELECT user_id,
        |    date_diff('day', max(CAST(ts AS DATE)), DATE '2024-01-31')
        |      AS days_idle
        |  FROM events GROUP BY user_id),
        |b AS (SELECT CASE WHEN days_idle < 2 THEN 'active'
        |    WHEN days_idle < 3 THEN 'cooling'
        |    ELSE 'churned' END AS bucket FROM last),
        |c AS (SELECT bucket, count(*)::BIGINT AS n_users FROM b
        |  GROUP BY bucket),
        |t AS (SELECT sum(n_users)::BIGINT AS t FROM c)
        |SELECT bucket, n_users, (1000000 * n_users) // t AS share_micro
        |FROM c CROSS JOIN t""".stripMargin,
    "q165_session_lift" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    CAST(epoch(CAST(date_trunc('second', ts) AS TIMESTAMP))
        |      AS BIGINT) AS sec
        |  FROM events),
        |l AS (SELECT *, lag(sec) OVER
        |    (PARTITION BY user_id ORDER BY sec ASC, event_id ASC) AS prev
        |  FROM e),
        |f AS (SELECT *, CASE WHEN prev IS NULL OR sec - prev > 1800
        |    THEN 1 ELSE 0 END AS brk FROM l),
        |s AS (SELECT *, sum(brk) OVER
        |    (PARTITION BY user_id ORDER BY sec ASC, event_id ASC
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS session_seq FROM f),
        |st AS (SELECT DISTINCT
        |    CAST(user_id AS VARCHAR) || '#' ||
        |      CAST(session_seq AS VARCHAR) AS sid,
        |    event_type
        |  FROM s),
        |ns AS (SELECT count(DISTINCT sid)::BIGINT AS n_sessions FROM st),
        |tc AS (SELECT event_type, count(*)::BIGINT AS n FROM st
        |  GROUP BY event_type),
        |pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    count(*)::BIGINT AS n_ab
        |  FROM st a JOIN st b ON a.sid = b.sid
        |    AND a.event_type < b.event_type
        |  GROUP BY a.event_type, b.event_type)
        |SELECT type_a, type_b, n_ab, ta.n AS n_a, tb.n AS n_b,
        |  (1000000 * n_ab * n_sessions) // (ta.n * tb.n) AS lift_micro
        |FROM pairs
        |JOIN tc ta ON pairs.type_a = ta.event_type
        |JOIN tc tb ON pairs.type_b = tb.event_type
        |CROSS JOIN ns""".stripMargin,
    "q163_bounce_rate" ->
      """WITH e AS (SELECT user_id, event_id,
        |    CAST(epoch(CAST(date_trunc('second', ts) AS TIMESTAMP))
        |      AS BIGINT) AS sec
        |  FROM events),
        |l AS (SELECT *, lag(sec) OVER
        |    (PARTITION BY user_id ORDER BY sec ASC, event_id ASC) AS prev
        |  FROM e),
        |f AS (SELECT *, CASE WHEN prev IS NULL OR sec - prev > 1800
        |    THEN 1 ELSE 0 END AS brk FROM l),
        |s AS (SELECT *, sum(brk) OVER
        |    (PARTITION BY user_id ORDER BY sec ASC, event_id ASC
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS session_seq FROM f),
        |sess AS (SELECT user_id, session_seq, count(*) AS n_events,
        |    min(sec) AS start_sec
        |  FROM s GROUP BY user_id, session_seq)
        |SELECT CAST(to_timestamp(start_sec) AS DATE) AS day,
        |  count(*)::BIGINT AS n_sessions,
        |  sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)::BIGINT
        |    AS n_bounces,
        |  CAST((1000000 * sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END))
        |    // count(*) AS BIGINT) AS bounce_micro
        |FROM sess GROUP BY 1""".stripMargin,
    "q41_sessionize" ->
      """WITH e AS (SELECT user_id, event_id,
        |    CAST(epoch(CAST(date_trunc('second', ts) AS TIMESTAMP))
        |      AS BIGINT) AS sec
        |  FROM events),
        |l AS (SELECT *, lag(sec) OVER
        |    (PARTITION BY user_id ORDER BY sec ASC, event_id ASC) AS prev
        |  FROM e),
        |f AS (SELECT *, CASE WHEN prev IS NULL OR sec - prev > 1800
        |    THEN 1 ELSE 0 END AS brk FROM l),
        |s AS (SELECT *, sum(brk) OVER
        |    (PARTITION BY user_id ORDER BY sec ASC, event_id ASC
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS session_seq FROM f)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |  count(*) AS n_events, min(sec) AS start_sec,
        |  max(sec) - min(sec) AS duration_s
        |FROM s GROUP BY user_id, session_seq""".stripMargin,
    "q09_backfill_window" ->
      """SELECT event_id, user_id,
        | coalesce(v, min(v) OVER (PARTITION BY user_id)) AS value_filled
        |FROM (SELECT event_id, user_id,
        |        CASE WHEN event_type = 'click' THEN NULL ELSE value END AS v
        |      FROM events) t""".stripMargin,
    "q10_backfill_two_tier" ->
      """SELECT event_id,
        | coalesce(v,
        |   min(v) OVER (PARTITION BY user_id, day),
        |   min(v) OVER (PARTITION BY user_id)) AS value_filled
        |FROM (SELECT event_id, user_id,
        |        CAST(date_trunc('day', ts) AS DATE) AS day,
        |        CASE WHEN event_type = 'click' THEN NULL ELSE value END AS v
        |      FROM events) t""".stripMargin,
    "q11_min_disjunctive" ->
      """SELECT l_orderkey, l_linenumber,
        | least(min(l_extendedprice) OVER (PARTITION BY l_partkey),
        |       min(l_extendedprice) OVER (PARTITION BY l_suppkey),
        |       min(l_extendedprice) OVER (PARTITION BY l_orderkey))
        |   AS min_related_price
        |FROM lineitem""".stripMargin,
    "q12_union_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM (
        | SELECT user_id, event_type FROM events WHERE event_type = 'click'
        | UNION ALL
        | SELECT user_id, event_type FROM events
        |  WHERE event_type IN ('click', 'view')) t""".stripMargin,
    "q13_daily_resample" ->
      """WITH daily AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    round(round(sum(value), 2) / count(*), 6) AS avg_value,
        |    count(*) AS n_events
        |  FROM events
        |  WHERE event_type = 'signup' AND value > 150.0 GROUP BY 1),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        |spine AS (SELECT CAST(unnest(generate_series(d0, d1,
        |    INTERVAL 1 DAY)) AS DATE) AS day FROM b)
        |SELECT spine.day, daily.avg_value,
        |  coalesce(daily.n_events, 0) AS n_events
        |FROM spine LEFT JOIN daily USING (day)""".stripMargin,
    "q14_grouped_stats" ->
      """SELECT event_type,
        | round(round(sum(value), 2) / count(*), 6) AS avg_value,
        | round(stddev_samp(value), 4) AS std_value,
        | min(value) AS min_value,
        | max(value) AS max_value,
        | count(value) AS n_nonnull
        |FROM events GROUP BY event_type""".stripMargin,
    "q15_event_type_counts" ->
      """SELECT event_type, count(*) AS cnt
        |FROM events GROUP BY event_type""".stripMargin,
    "q171_gini_revenue" ->
      """WITH rev AS (SELECT o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY o_custkey),
        |reg AS (SELECT c_custkey AS o_custkey, n_regionkey AS region
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
        |rk AS (SELECT region, cents,
        |    row_number() OVER (PARTITION BY region
        |      ORDER BY cents, o_custkey) AS rk
        |  FROM rev JOIN reg USING (o_custkey))
        |SELECT region, count(*)::BIGINT AS n_customers,
        |  sum(cents)::BIGINT AS total_cents,
        |  ((1000000 * (2 * sum(rk * cents)::HUGEINT
        |    - (count(*) + 1) * sum(cents)::HUGEINT))
        |    // (count(*) * sum(cents)::HUGEINT))::BIGINT AS gini_micro
        |FROM rk GROUP BY region""".stripMargin,
    "q172_abc_classes" ->
      """WITH rev AS (SELECT o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY o_custkey),
        |reg AS (SELECT c_custkey AS o_custkey, n_regionkey AS region
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
        |c AS (SELECT region, cents,
        |    sum(cents) OVER (PARTITION BY region
        |      ORDER BY cents DESC, o_custkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cents) OVER (PARTITION BY region) AS tot
        |  FROM rev JOIN reg USING (o_custkey))
        |SELECT region,
        |  CASE WHEN (1000000 * cum::HUGEINT) // tot <= 700000 THEN 'A'
        |       WHEN (1000000 * cum::HUGEINT) // tot <= 900000 THEN 'B'
        |       ELSE 'C' END AS abc_class,
        |  count(*)::BIGINT AS n_customers,
        |  sum(cents)::BIGINT AS class_cents
        |FROM c GROUP BY 1, 2""".stripMargin,
    "q173_association_rules" ->
      """WITH b AS (SELECT DISTINCT user_id,
        |    CAST(ts AS DATE) AS day, event_type FROM events),
        |nb AS (SELECT count(*)::BIGINT AS N
        |  FROM (SELECT DISTINCT user_id, day FROM b)),
        |supp AS (SELECT event_type, count(*)::BIGINT AS supp
        |  FROM b GROUP BY event_type),
        |pairs AS (SELECT x.event_type AS ante, y.event_type AS cons,
        |    count(*)::BIGINT AS n_ab
        |  FROM b x JOIN b y
        |    ON x.user_id = y.user_id AND x.day = y.day
        |   AND x.event_type <> y.event_type
        |  GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT ante, cons, n_ab,
        |  ((1000000 * n_ab::HUGEINT) // N)::BIGINT AS support_micro,
        |  ((1000000 * n_ab::HUGEINT) // sa.supp)::BIGINT
        |    AS confidence_micro,
        |  ((1000000 * N::HUGEINT * n_ab) // (sa.supp * sb.supp::HUGEINT))
        |    ::BIGINT AS lift_micro
        |FROM pairs
        |JOIN supp sa ON sa.event_type = ante
        |JOIN supp sb ON sb.event_type = cons
        |CROSS JOIN nb""".stripMargin,
    "q174_winsorized_stats" ->
      """WITH o AS (SELECT o_orderpriority AS priority,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |e AS (SELECT priority,
        |    CAST(round(quantile_cont(cents, 0.05) * 10000) AS BIGINT)
        |      AS p05_c4,
        |    CAST(round(quantile_cont(cents, 0.95) * 10000) AS BIGINT)
        |      AS p95_c4
        |  FROM o GROUP BY priority)
        |SELECT priority, count(*)::BIGINT AS n_orders,
        |  min(p05_c4)::BIGINT AS p05_c4,
        |  min(p95_c4)::BIGINT AS p95_c4,
        |  sum(greatest(least(cents * 10000, p95_c4), p05_c4))::BIGINT
        |    AS clipped_sum_c4,
        |  (sum(greatest(least(cents * 10000, p95_c4), p05_c4))
        |    // count(*))::BIGINT AS winsorized_mean_c4
        |FROM o JOIN e USING (priority)
        |GROUP BY priority""".stripMargin,
    "q175_interpolate_gaps" ->
      """WITH e AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |    value
        |  FROM events WHERE event_type = 'signup' AND value > 150.0),
        |daily AS (SELECT day,
        |    CAST(round(sum(value) * 100) AS BIGINT) AS cents
        |  FROM e GROUP BY day),
        |spine AS (SELECT unnest(generate_series(
        |    (SELECT min(day) FROM daily),
        |    (SELECT max(day) FROM daily), INTERVAL 1 DAY))::DATE AS day),
        |j AS (SELECT spine.day, daily.cents FROM spine
        |  LEFT JOIN daily USING (day)),
        |f AS (SELECT day, cents,
        |    last_value(cents IGNORE NULLS) OVER
        |      (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
        |        AND CURRENT ROW) AS pv,
        |    last_value(CASE WHEN cents IS NOT NULL THEN day END
        |      IGNORE NULLS) OVER
        |      (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
        |        AND CURRENT ROW) AS pd,
        |    first_value(cents IGNORE NULLS) OVER
        |      (ORDER BY day ROWS BETWEEN CURRENT ROW
        |        AND UNBOUNDED FOLLOWING) AS nv,
        |    first_value(CASE WHEN cents IS NOT NULL THEN day END
        |      IGNORE NULLS) OVER
        |      (ORDER BY day ROWS BETWEEN CURRENT ROW
        |        AND UNBOUNDED FOLLOWING) AS nd
        |  FROM j)
        |SELECT day, cents AS observed_cents,
        |  (1000000 * pv + CASE WHEN date_diff('day', pd, nd) > 0
        |    THEN ((nv - pv) * 1000000 * date_diff('day', pd, day))
        |      // date_diff('day', pd, nd)
        |    ELSE 0 END)::BIGINT AS interp_micro
        |FROM f""".stripMargin,
    "q176_capped_balance" ->
      """WITH e AS (SELECT user_id, ts, event_id,
        |    CAST(round((value - 150.0) * 100) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL),
        |s AS (SELECT user_id, list(c ORDER BY ts, event_id) AS cs
        |  FROM e GROUP BY user_id)
        |SELECT user_id, len(cs)::BIGINT AS n_events,
        |  list_reduce(list_prepend(0::BIGINT, cs),
        |    (acc, x) -> acc + x)::BIGINT AS uncapped_balance,
        |  list_reduce(list_prepend(0::BIGINT, cs),
        |    (acc, x) -> greatest(acc + x, 0))::BIGINT AS capped_balance
        |FROM s""".stripMargin,
    "q179_attribution" ->
      """WITH conv AS (SELECT user_id, event_id AS conv_id, ts AS conv_ts
        |    FROM events WHERE event_type = 'purchase'),
        |touch AS (SELECT user_id, event_id AS touch_id, ts AS touch_ts,
        |    event_type
        |  FROM events WHERE event_type <> 'purchase'),
        |j AS (SELECT c.conv_id, t.event_type, t.touch_ts, t.touch_id
        |  FROM conv c JOIN touch t ON t.user_id = c.user_id
        |    AND t.touch_ts < c.conv_ts
        |    AND t.touch_ts >= c.conv_ts - INTERVAL 7 DAY),
        |r AS (SELECT event_type,
        |    row_number() OVER (PARTITION BY conv_id
        |      ORDER BY touch_ts, touch_id) AS rn,
        |    count(*) OVER (PARTITION BY conv_id) AS n
        |  FROM j)
        |SELECT event_type,
        |  sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS first_touch,
        |  sum(CASE WHEN rn = n THEN 1 ELSE 0 END)::BIGINT AS last_touch,
        |  sum(1000000 // n)::BIGINT AS linear_micro,
        |  count(*)::BIGINT AS n_touches
        |FROM r GROUP BY event_type""".stripMargin,
    "q180_mad_outliers" ->
      """WITH e AS (SELECT event_type,
        |    CAST(round(value * 1000) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |med AS (SELECT event_type,
        |    CAST(2 * quantile_cont(v, 0.5) AS BIGINT) AS med2
        |  FROM e GROUP BY event_type),
        |dev AS (SELECT e.event_type, med2, abs(2 * v - med2) AS dev2
        |  FROM e JOIN med USING (event_type)),
        |mad AS (SELECT event_type,
        |    CAST(2 * quantile_cont(dev2, 0.5) AS BIGINT) AS mad4
        |  FROM dev GROUP BY event_type)
        |SELECT d.event_type, count(*)::BIGINT AS n, med2, mad4,
        |  sum(CASE WHEN dev2 * 20000 > mad4 * 51891 THEN 1 ELSE 0
        |    END)::BIGINT AS n_outliers
        |FROM dev d JOIN mad USING (event_type)
        |GROUP BY d.event_type, med2, mad4""".stripMargin,
    "q186_gains_table" ->
      """WITH scored AS (SELECT c_custkey,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS score_cents,
        |    CASE WHEN c_custkey IN (SELECT o_custkey FROM orders)
        |      THEN 1 ELSE 0 END AS label
        |  FROM customer),
        |dec AS (SELECT *, ntile(10) OVER
        |    (ORDER BY score_cents DESC, c_custkey ASC) AS decile
        |  FROM scored),
        |per AS (SELECT decile, count(*)::BIGINT AS n,
        |    sum(label)::BIGINT AS positives
        |  FROM dec GROUP BY decile),
        |cum AS (SELECT decile, n, positives,
        |    sum(positives) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      ::BIGINT AS cum_pos,
        |    sum(n) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      ::BIGINT AS cum_n,
        |    sum(positives) OVER ()::BIGINT AS tot_pos,
        |    sum(n) OVER ()::BIGINT AS tot_n
        |  FROM per)
        |SELECT decile::INTEGER AS decile, n, positives,
        |  CAST(1000000::HUGEINT * cum_pos // tot_pos::HUGEINT
        |    AS BIGINT) AS capture_micro,
        |  CAST(1000000::HUGEINT * cum_pos * tot_n
        |    // (cum_n::HUGEINT * tot_pos) AS BIGINT) AS lift_micro
        |FROM cum""".stripMargin,
    "q191_auc_exact" ->
      """WITH scored AS (SELECT
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS score,
        |    CASE WHEN c_custkey IN (SELECT o_custkey FROM orders
        |      WHERE o_totalprice > 450000)
        |      THEN 1 ELSE 0 END AS label
        |  FROM customer),
        |hist AS (SELECT score, sum(label)::BIGINT AS np,
        |    sum(1 - label)::BIGINT AS nn
        |  FROM scored GROUP BY score),
        |cum AS (SELECT score, np, nn,
        |    coalesce(sum(nn) OVER (ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |      0)::BIGINT AS cum_neg
        |  FROM hist)
        |SELECT sum(np)::BIGINT AS n_pos, sum(nn)::BIGINT AS n_neg,
        |  CAST(1000000::HUGEINT *
        |    sum(2::HUGEINT * np * cum_neg + np::HUGEINT * nn)
        |    // (2::HUGEINT * sum(np) * sum(nn)) AS BIGINT) AS auc_micro
        |FROM cum""".stripMargin,
    "q192_ks_test" -> {
      val h = graft.functions.Hashing.sqlHash60(
        "'ab|' || CAST(user_id AS VARCHAR)")
      s"""WITH e AS (SELECT $h % 2 AS arm,
         |    CAST(round(value * 100) AS BIGINT) AS y
         |  FROM events WHERE value IS NOT NULL),
         |hist AS (SELECT y,
         |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS na,
         |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS nb
         |  FROM e GROUP BY y),
         |cum AS (SELECT y,
         |    sum(na) OVER (ORDER BY y)::BIGINT AS ca,
         |    sum(nb) OVER (ORDER BY y)::BIGINT AS cb
         |  FROM hist),
         |tot AS (SELECT max(ca)::BIGINT AS ta, max(cb)::BIGINT AS tb
         |  FROM cum),
         |gaps AS (SELECT y, ta, tb,
         |    abs(ca::HUGEINT * tb - cb::HUGEINT * ta) AS gap
         |  FROM cum CROSS JOIN tot),
         |mx AS (SELECT max(gap) AS gmax FROM gaps)
         |SELECT ta AS n_a, tb AS n_b, min(y) AS at_y,
         |  CAST(1000000::HUGEINT * gmax
         |    // (ta::HUGEINT * tb) AS BIGINT) AS ks_micro
         |FROM gaps CROSS JOIN mx WHERE gap = gmax
         |GROUP BY ta, tb, gmax""".stripMargin
    },
    "q193_spearman" ->
      """WITH spend AS (SELECT o_custkey,
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS y
        |  FROM orders GROUP BY 1),
        |pts AS (SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS x,
        |    coalesce(y, 0)::BIGINT AS y
        |  FROM customer LEFT JOIN spend ON o_custkey = c_custkey),
        |hx AS (SELECT x, count(*)::BIGINT AS c FROM pts GROUP BY x),
        |rx AS (SELECT x, 2 * coalesce(sum(c) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + c + 1 AS r2x
        |  FROM hx),
        |hy AS (SELECT y, count(*)::BIGINT AS c FROM pts GROUP BY y),
        |ry AS (SELECT y, 2 * coalesce(sum(c) OVER (ORDER BY y
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + c + 1 AS r2y
        |  FROM hy),
        |cells AS (SELECT x, y, count(*)::BIGINT AS cnt
        |  FROM pts GROUP BY x, y),
        |m AS (SELECT sum(cnt)::BIGINT AS n,
        |    sum(cnt::HUGEINT * r2x) AS sx,
        |    sum(cnt::HUGEINT * r2y) AS sy,
        |    sum(cnt::HUGEINT * r2x * r2x) AS sxx,
        |    sum(cnt::HUGEINT * r2y * r2y) AS syy,
        |    sum(cnt::HUGEINT * r2x * r2y) AS sxy
        |  FROM cells JOIN rx USING (x) JOIN ry USING (y))
        |SELECT n,
        |  CAST(round((n * sxy - sx * sy)::DOUBLE /
        |    (sqrt((n * sxx - sx * sx)::DOUBLE) *
        |      sqrt((n * syy - sy * sy)::DOUBLE)) * 1000000.0)
        |    AS BIGINT) AS rho_micro
        |FROM m""".stripMargin,
    "q195_window_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
        |    CAST(epoch(CAST(date_trunc('second', ts) AS TIMESTAMP))
        |      AS BIGINT) AS tsec
        |  FROM events),
        |c AS (SELECT user_id, tsec AS tc FROM e
        |  WHERE event_type = 'click'),
        |v AS (SELECT user_id, tsec AS tv FROM e
        |  WHERE event_type = 'view'),
        |p AS (SELECT user_id, tsec AS tp FROM e
        |  WHERE event_type = 'purchase'),
        |cv AS (SELECT c.user_id, tc, tv FROM c JOIN v
        |  ON c.user_id = v.user_id AND tv > tc AND tv <= tc + 3600),
        |cvp AS (SELECT cv.user_id, tc, tv, tp FROM cv JOIN p
        |  ON cv.user_id = p.user_id AND tp > tv AND tp <= tv + 86400),
        |b1 AS (SELECT user_id, min(tc) AS b1 FROM c GROUP BY 1),
        |b2 AS (SELECT DISTINCT ON (user_id) user_id,
        |    tc AS tc2, tv AS tv2
        |  FROM cv ORDER BY user_id, tc, tv),
        |b3 AS (SELECT DISTINCT ON (user_id) user_id,
        |    tc AS tc3, tv AS tv3, tp AS tp3
        |  FROM cvp ORDER BY user_id, tc, tv, tp),
        |u AS (SELECT DISTINCT user_id FROM e)
        |SELECT u.user_id,
        |  CAST(CASE WHEN tp3 IS NOT NULL THEN 3
        |    WHEN tv2 IS NOT NULL THEN 2
        |    WHEN b1 IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS depth,
        |  CASE WHEN tp3 IS NOT NULL THEN tc3
        |    WHEN tv2 IS NOT NULL THEN tc2 ELSE b1 END AS t_click,
        |  CASE WHEN tp3 IS NOT NULL THEN tv3
        |    WHEN tv2 IS NOT NULL THEN tv2 END AS t_view,
        |  tp3 AS t_purchase
        |FROM u LEFT JOIN b1 USING (user_id)
        |  LEFT JOIN b2 USING (user_id)
        |  LEFT JOIN b3 USING (user_id)""".stripMargin,
    "q197_best_split" ->
      """WITH scored AS (SELECT
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS score,
        |    CASE WHEN c_custkey IN (SELECT o_custkey FROM orders
        |      WHERE o_totalprice > 450000)
        |      THEN 1 ELSE 0 END AS label
        |  FROM customer),
        |hist AS (SELECT score, sum(label)::BIGINT AS np,
        |    sum(1 - label)::BIGINT AS nn
        |  FROM scored GROUP BY score),
        |cum AS (SELECT score,
        |    sum(np) OVER (ORDER BY score)::BIGINT AS lp,
        |    sum(nn) OVER (ORDER BY score)::BIGINT AS ln
        |  FROM hist),
        |tot AS (SELECT max(lp)::BIGINT AS tp, max(ln)::BIGINT AS tn
        |  FROM cum),
        |q AS (SELECT score, lp, ln, tp - lp AS rp, tn - ln AS rn,
        |    lp + ln AS l, (tp - lp) + (tn - ln) AS r
        |  FROM cum CROSS JOIN tot),
        |p AS (SELECT score, l, r,
        |    CAST(1000000::HUGEINT *
        |      ((lp::HUGEINT * lp + ln::HUGEINT * ln) * r
        |        + (rp::HUGEINT * rp + rn::HUGEINT * rn) * l)
        |      // (l::HUGEINT * r) AS BIGINT) AS purity_micro
        |  FROM q WHERE r > 0),
        |mx AS (SELECT max(purity_micro) AS best FROM p)
        |SELECT min(score) AS split_at,
        |  arg_min(l, score) AS n_left, arg_min(r, score) AS n_right,
        |  best AS purity_micro
        |FROM p CROSS JOIN mx WHERE purity_micro = best
        |GROUP BY best""".stripMargin,
    "q198_kaplan_meier" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day, event_type
        |  FROM events),
        |pu AS (SELECT user_id, min(day) AS d0, max(day) AS dlast,
        |    min(CASE WHEN event_type = 'purchase' THEN day END) AS dp
        |  FROM e GROUP BY 1),
        |subj AS (SELECT CASE WHEN dp IS NOT NULL
        |      THEN CAST(dp - d0 AS INTEGER)
        |      ELSE CAST(dlast - d0 AS INTEGER) END AS t,
        |    CASE WHEN dp IS NOT NULL THEN 1 ELSE 0 END AS death
        |  FROM pu),
        |hist AS (SELECT t, sum(death)::BIGINT AS d,
        |    sum(1 - death)::BIGINT AS c
        |  FROM subj GROUP BY t),
        |tot AS (SELECT (sum(d) + sum(c))::BIGINT AS n0 FROM hist),
        |risk AS (SELECT t, d,
        |    (n0 - coalesce(sum(d + c) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      )::BIGINT AS n
        |  FROM hist CROSS JOIN tot),
        |f AS (SELECT t, d, n,
        |    CASE WHEN n > d THEN CAST(round(ln(
        |        CAST(n - d AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000.0)
        |      AS BIGINT) END AS lnf_micro
        |  FROM risk WHERE d > 0)
        |SELECT t, n AS n_risk, d AS deaths, lnf_micro,
        |  CAST(CASE WHEN lnf_micro IS NOT NULL THEN
        |    coalesce(sum(lnf_micro) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + lnf_micro END AS BIGINT) AS log_surv_micro
        |FROM f""".stripMargin,
    "q199_mann_whitney" -> {
      val h = graft.functions.Hashing.sqlHash60(
        "'ab|' || CAST(user_id AS VARCHAR)")
      s"""WITH e AS (SELECT $h % 2 AS arm,
         |    CAST(round(value * 100) AS BIGINT) AS y
         |  FROM events WHERE value IS NOT NULL),
         |hist AS (SELECT y,
         |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS na,
         |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS nb
         |  FROM e GROUP BY y),
         |cum AS (SELECT y, na, nb,
         |    coalesce(sum(nb) OVER (ORDER BY y
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |      0)::BIGINT AS cb
         |  FROM hist),
         |m AS (SELECT sum(na)::BIGINT AS ta, sum(nb)::BIGINT AS tb,
         |    sum(2::HUGEINT * na * cb + na::HUGEINT * nb) AS u2,
         |    sum((na + nb)::HUGEINT * (na + nb) * (na + nb)
         |      - (na + nb)::HUGEINT) AS tc
         |  FROM cum),
         |x AS (SELECT ta, tb, u2, tc, (ta + tb)::BIGINT AS n,
         |    u2 - ta::HUGEINT * tb AS diff
         |  FROM m),
         |x2 AS (SELECT *,
         |    (n + 1)::HUGEINT * n * (n - 1) - tc AS k
         |  FROM x)
         |SELECT ta AS n_a, tb AS n_b, CAST(u2 AS BIGINT) AS u2_a,
         |  CAST(tc AS BIGINT) AS tie_term,
         |  (diff::DOUBLE * diff::DOUBLE * 12.0 * n::DOUBLE
         |      * (n - 1)::DOUBLE) >
         |    (ta::DOUBLE * tb::DOUBLE * k::DOUBLE * 16.0)
         |    AS significant
         |FROM x2""".stripMargin
    },
    "q201_corr_matrix" -> {
      val names = Map(1 -> "acctbal", 2 -> "n_orders", 3 -> "spend",
        4 -> "max_order")
      val firsts = (1 to 4)
        .map(i => s"sum(x$i::HUGEINT) AS s$i").mkString(", ")
      val seconds = (for (i <- 1 to 4; j <- i to 4)
        yield s"sum(x$i::HUGEINT * x$j) AS s$i$j").mkString(", ")
      val cells = (for (i <- 1 to 4; j <- i + 1 to 4) yield
        s"""SELECT '${names(i)}' AS f1, '${names(j)}' AS f2,
           |  CAST(round((n * s$i$j - s$i * s$j)::DOUBLE
           |    / (sqrt((n * s$i$i - s$i * s$i)::DOUBLE)
           |      * sqrt((n * s$j$j - s$j * s$j)::DOUBLE)) * 1000000.0)
           |    AS BIGINT) AS corr_micro FROM m""".stripMargin)
        .mkString("\nUNION ALL\n")
      s"""WITH o AS (SELECT o_custkey, count(*)::BIGINT AS cnt,
         |    sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT
         |      AS spend,
         |    max(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT
         |      AS maxp
         |  FROM orders GROUP BY 1),
         |feat AS (SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS x1,
         |    coalesce(cnt, 0)::BIGINT AS x2,
         |    coalesce(spend, 0)::BIGINT AS x3,
         |    coalesce(maxp, 0)::BIGINT AS x4
         |  FROM customer LEFT JOIN o ON o_custkey = c_custkey),
         |m AS (SELECT count(*)::BIGINT AS n, $firsts, $seconds
         |  FROM feat)
         |$cells""".stripMargin
    },
    "q202_quantile_normalize" -> {
      val tk = graft.functions.TextOps.sqlTokens("text")
      s"""WITH d AS (SELECT source,
         |    CAST(len($tk) % 100 AS INTEGER) AS score FROM documents),
         |cell AS (SELECT source, score, count(*)::BIGINT AS cnt
         |  FROM d GROUP BY 1, 2),
         |src AS (SELECT source, score, cnt,
         |    sum(cnt) OVER (PARTITION BY source ORDER BY score
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         |      )::BIGINT AS cum,
         |    sum(cnt) OVER (PARTITION BY source)::BIGINT AS t
         |  FROM cell),
         |srcp AS (SELECT source, score, cnt,
         |    CAST((1000000 * cum) // t AS BIGINT) AS pct_micro
         |  FROM src),
         |ph AS (SELECT score, sum(cnt)::BIGINT AS pc
         |  FROM cell GROUP BY 1),
         |pooled AS (SELECT score,
         |    sum(pc) OVER (ORDER BY score
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         |      )::BIGINT AS pcum
         |  FROM ph),
         |ptot AS (SELECT sum(pc)::BIGINT AS tt FROM ph),
         |pp AS (SELECT score,
         |    CAST((1000000 * pcum) // tt AS BIGINT) AS cdf_micro
         |  FROM pooled CROSS JOIN ptot)
         |SELECT source, score, cnt AS n, pct_micro,
         |  (SELECT min(pp.score) FROM pp
         |    WHERE pp.cdf_micro >= srcp.pct_micro)::BIGINT
         |    AS norm_score
         |FROM srcp""".stripMargin
    },
    "q205_twap" ->
      """WITH e AS (SELECT user_id, event_id,
        |    CAST(epoch(CAST(date_trunc('second', ts) AS TIMESTAMP))
        |      AS BIGINT) AS sec,
        |    CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL),
        |d AS (SELECT user_id, v,
        |    lead(sec) OVER (PARTITION BY user_id
        |      ORDER BY sec ASC, event_id ASC) - sec AS dt
        |  FROM e)
        |SELECT user_id, count(*)::BIGINT AS n_intervals,
        |  sum(dt)::BIGINT AS span_s,
        |  CASE WHEN sum(dt) > 0 THEN
        |    CAST(1000000::HUGEINT * sum(v::HUGEINT * dt)
        |      // greatest(sum(dt)::HUGEINT, 1) AS BIGINT)
        |  END AS twap_micro
        |FROM d WHERE dt IS NOT NULL
        |GROUP BY user_id""".stripMargin,
    "q206_ohlc_bars" ->
      """WITH l AS (SELECT CAST(l_shipdate AS DATE) AS day,
        |    l_orderkey * 10 + l_linenumber AS seq,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
        |    CAST(round(l_quantity * 100) AS BIGINT) AS qty_c
        |  FROM lineitem)
        |SELECT day, count(*)::BIGINT AS n_fills,
        |  arg_min(price_c, seq)::BIGINT AS open_c,
        |  max(price_c)::BIGINT AS high_c,
        |  min(price_c)::BIGINT AS low_c,
        |  arg_max(price_c, seq)::BIGINT AS close_c,
        |  sum(qty_c)::BIGINT AS vol_centi,
        |  CAST(1000000::HUGEINT * sum(price_c::HUGEINT * qty_c)
        |    // greatest(sum(qty_c)::HUGEINT, 1) AS BIGINT)
        |    AS vwap_micro
        |FROM l GROUP BY day""".stripMargin,
    "q209_isotonic_calibration" ->
      """WITH scored AS (SELECT
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
        |    CASE WHEN c_custkey IN (SELECT o_custkey FROM orders
        |      WHERE o_totalprice > 450000)
        |      THEN 1 ELSE 0 END AS label
        |  FROM customer),
        |b AS (SELECT cents // 10000 AS x, count(*)::BIGINT AS n,
        |    sum(label)::BIGINT AS sy
        |  FROM scored GROUP BY 1),
        |c AS (SELECT x, n, sy,
        |    sum(n) OVER (ORDER BY x)::BIGINT AS cn,
        |    sum(sy) OVER (ORDER BY x)::BIGINT AS cy
        |  FROM b),
        |pts AS (SELECT 0::BIGINT AS pcn, 0::BIGINT AS pcy
        |  UNION ALL SELECT cn, cy FROM c),
        |mins AS (SELECT i.x, p.pcn,
        |    min(1000000::HUGEINT * (k.cy - p.pcy)
        |      // (k.cn - p.pcn)) AS mn
        |  FROM c i JOIN pts p ON p.pcn < i.cn
        |  JOIN c k ON k.cn >= i.cn
        |  GROUP BY i.x, p.pcn)
        |SELECT c.x, c.n, c.sy, CAST(f.fitted AS BIGINT) AS fitted_micro
        |FROM c JOIN (SELECT x, max(mn) AS fitted FROM mins
        |  GROUP BY x) f USING (x)""".stripMargin,
  )
}
