package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch aggregates for cardinality at scale.
  *
  * HyperLogLog (Flajolet et al. 2007) distinct-count: the exact
  * `COUNT(DISTINCT k)` needs a shuffle carrying every distinct key;
  * the HLL sketch shuffles at most `m` (here 1024) register rows per
  * group regardless of cardinality — the 100 TB path for "distinct
  * users per segment" style queries.
  *
  * This implementation is compositional (groupBy over register rows)
  * rather than a custom TypedImperativeAggregate, for two reasons:
  * map-side partial aggregation already collapses each partition to
  * ≤ m rows per group (the same state a UDAF buffer would hold), and
  * every step is portable SQL — the DuckDB oracle runs the identical
  * algorithm, so even the *approximate* result is hash-exact across
  * engines (unlike engine-native approx_count_distinct / approx_distinct
  * whose sketches differ). Spark's own `approx_count_distinct` remains
  * the drop-in when cross-engine determinism isn't required.
  *
  * Register derivation from the portable 60-bit hash60: top 10 bits →
  * bucket, remaining 50 bits w → rho = (leading zeros in 50-bit field)+1
  * = 51 - bitlength(w), computed as `length(ltrim(bin(w),'0'))` which
  * both engines evaluate identically (bin(0)='0' → ltrim '' → rho 51).
  */
object Sketches {
  val HllP = 10
  val HllM = 1024
  private val WBits = 60 - HllP
  private val WMask = (1L << WBits) - 1

  /** alpha_m * m^2 for m=1024 — both engines fold the same IEEE ops. */
  private def alphaM2: Column =
    lit(0.7213) / (lit(1.0) + lit(1.079) / lit(HllM.toDouble)) *
      lit(HllM.toDouble) * lit(HllM.toDouble)

  def hllBucket(h: Column): Column = shiftright(h, WBits)

  def hllRho(h: Column): Column =
    (lit(WBits + 1) -
      length(ltrim(bin(h.bitwiseAND(lit(WMask))), "0"))).cast("int")

  /** Distinct-count estimate of `key` per `groupCol`, with the standard
    * small-range linear-counting correction. Output column `hll_est`
    * (double, rounded to 4 decimals — the register sum is a dyadic
    * rational with < 52 significant bits here, so it is order-exact and
    * the estimate is bit-identical cross-engine). */
  /** Fine-grain register table (group, b, r) — the sketch in its
    * MERGEABLE form: registers max-merge to any coarser grain, and the
    * estimate over merged registers is identical to sketching at that
    * grain directly (max over per-day maxes = max). This is the table a
    * sketch cube materializes nightly; rollups never re-touch raw
    * data (q125). */
  def hllRegisters(df: DataFrame, groupCol: String,
      key: Column): DataFrame = {
    val h = Hashing.hash60(key)
    df.select(col(groupCol), hllBucket(h).as("b"), hllRho(h).as("rho"))
      .groupBy(col(groupCol), col("b")).agg(max("rho").as("r"))
  }

  /** The estimate step over a (group, b, r) register table. */
  def hllEstimate(regs: DataFrame, groupCol: String): DataFrame =
    regs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("nb"), sum(pow(lit(0.5), col("r"))).as("sp"))
      .select(col(groupCol), {
        val v = lit(HllM) - col("nb") // empty registers
        val raw = alphaM2 / (col("sp") + v.cast("double"))
        val linear = lit(HllM.toDouble) *
          log(lit(HllM.toDouble) / v.cast("double"))
        round(when(raw <= 2.5 * HllM && v > 0, linear).otherwise(raw), 4)
          .as("hll_est")
      })

  def hllDistinct(df: DataFrame, groupCol: String, key: Column): DataFrame =
    hllEstimate(hllRegisters(df, groupCol, key), groupCol)

  /** Buffer-based form of the same estimate: one TypedImperativeAggregate
    * buffer (1024 bytes) per group instead of ≤1024 register rows — the
    * better constant factor when groups are many (see
    * expressions.HllSketchAgg; bit-parity with hllDistinct is
    * spec-asserted). */
  def hllDistinctAgg(df: DataFrame, groupCol: String,
      key: Column): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val agg = ColumnBridge.column(
      graft.expressions.HllSketchAgg(ColumnBridge.expression(key))
        .toAggregateExpression())
    df.groupBy(col(groupCol)).agg(agg.as("hll_est"))
  }

  /** DuckDB SQL for the identical estimate — keep in lockstep. */
  def sqlHllDistinct(table: String, groupExpr: String, groupAlias: String,
      keyExpr: String): String = {
    val h = Hashing.sqlHash60(keyExpr)
    s"""SELECT g AS $groupAlias, round(CASE
       |    WHEN raw <= ${2.5 * HllM} AND v > 0
       |    THEN ${HllM}.0 * ln(${HllM}.0 / v) ELSE raw END, 4) AS hll_est
       |FROM (
       |  SELECT g, (${HllM} - count(*)) AS v,
       |    (0.7213 / (1.0 + 1.079 / ${HllM}.0)) * ${HllM}.0 * ${HllM}.0
       |      / (sum(power(0.5, r)) + (${HllM} - count(*))) AS raw
       |  FROM (
       |    SELECT g, b, max(rho) AS r FROM (
       |      SELECT $groupExpr AS g, ($h >> $WBits) AS b,
       |        CAST($WBits + 1
       |          - length(ltrim(bin($h & $WMask), '0')) AS INTEGER) AS rho
       |      FROM $table) x
       |    GROUP BY g, b) y
       |  GROUP BY g) z""".stripMargin
  }

  // ------------------------------------------------------------- bloom

  /** Bloom filter as a relational artifact: `mBits` bits packed into
    * 63-bit words as (word_idx, bits) rows — one groupBy bit_or over
    * `kLanes` seeded hash60 positions per key. Mergeable across
    * batches by word-wise OR (the HLL-registers discipline), and
    * O(mBits/63) rows — broadcast-sized at any corpus scale.
    * 63-bit words (shift 0..62) keep the mask arithmetic identical in
    * Spark and DuckDB (DuckDB raises on `1::BIGINT << 63`). */
  def bloomWords(keys: DataFrame, key: Column, prefix: String,
      mBits: Int, kLanes: Int): DataFrame =
    keys
      .select(key.cast("string").as("__k"),
        explode(sequence(lit(0), lit(kLanes - 1))).as("__lane"))
      .select((Hashing.hash60(concat_ws("|", lit(prefix), col("__lane"),
        col("__k"))) % mBits).as("__pos"))
      .select(expr("__pos div 63").as("word_idx"),
        expr("shiftleft(1L, cast(__pos % 63 as int))").as("__m"))
      .groupBy(col("word_idx"))
      .agg(expr("bit_or(__m)").as("bits"))

  /** Probe a [[bloomWords]] artifact: (key, bloom_hit) where hit ⇔
    * every lane's bit is set. A miss is a CERTAIN non-member (no false
    * negatives — oracle/spec-audited); hits carry the classic false-
    * positive rate. The filter broadcast-joins the probe side, so a
    * bloom semi-join reduction prunes a big probe frame before an
    * expensive join WITHOUT shuffling it. */
  def bloomProbe(probeKeys: DataFrame, key: Column, bloom: DataFrame,
      prefix: String, mBits: Int, kLanes: Int): DataFrame =
    probeKeys
      .select(key.cast("string").as("__k"),
        explode(sequence(lit(0), lit(kLanes - 1))).as("__lane"))
      .withColumn("__pos", Hashing.hash60(concat_ws("|", lit(prefix),
        col("__lane"), col("__k"))) % mBits)
      .withColumn("word_idx", expr("__pos div 63"))
      .withColumn("__m", expr("shiftleft(1L, cast(__pos % 63 as int))"))
      .join(broadcast(bloom), Seq("word_idx"), "left")
      .groupBy(col("__k").as("key"))
      .agg(min(coalesce(col("bits"), lit(0L)).bitwiseAND(col("__m")) =!= 0)
        .as("bloom_hit"))

  /** The aggregate-buffer form of [[sampleQuantiles]]'s membership rule
    * (expressions.MinKSampleAgg): ONE ≤k-pair buffer per group through
    * the exchange — and the only form a streaming state store can hold.
    * Returns (group, sample: array<double>). */
  def minKSampleAgg(df: DataFrame, groupCol: String, key: Column,
      value: Column, k: Int = 64): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val agg = ColumnBridge.column(
      graft.expressions.MinKSampleAgg(
        ColumnBridge.expression(Hashing.hash60(key)),
        ColumnBridge.expression(value), k).toAggregateExpression())
    df.groupBy(col(groupCol)).agg(agg.as("sample"))
  }

  /** Per-group quantile estimates from a deterministic min-hash sample:
    * keep the K rows with the smallest hash60 of a unique row key, take
    * exact quantiles of that sample. The min-K property is what makes
    * it a SKETCH: min-K(A ∪ B) = min-K(min-K(A) ∪ min-K(B)), so
    * partitions can sample independently and merge — Spark's
    * WindowGroupLimit plants exactly that (≤K rows per group survive
    * each partition BEFORE the shuffle), giving O(groups × K) exchange
    * bytes at any input size. Unlike approx_percentile the result is
    * bit-reproducible on any cluster AND cross-engine (the hash decides
    * membership, not arrival order); the price is sampling error
    * O(1/√K) instead of a rank bound.
    *
    * @param rowKey unique per row — hash ties would make row_number
    *               nondeterministic (tie-broken by rowKey too). */
  def sampleQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      rowKey: Column, ps: Seq[Double], k: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("_hk").asc, col("_rk").asc)
    df.select(col(groupCol), col(valueCol), rowKey.as("_rk"),
        Hashing.hash60(rowKey).as("_hk"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .groupBy(col(groupCol))
      .agg(percentile(col(valueCol), array(ps.map(lit): _*)).as("_qq"),
        count(lit(1)).as("n_sampled"))
  }
}
