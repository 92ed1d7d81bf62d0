package graft.functions

import graft.Materialize.TrunkCheckpointOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe replacements for unpartitioned (global-order) window
  * plans. A plain `ntile(k).over(Window.orderBy(...))` moves the WHOLE
  * frame to one task (Spark logs `WindowExec: No Partition Defined`);
  * correct at test SF, a single-partition sort of the corpus at 100 TB.
  *
  * [[rangeNtile]] reproduces ntile's exact bucket arithmetic from a
  * range-partitioned parallel sort plus a per-partition offset carry:
  *
  *   1. `repartitionByRange(P, keys)` — Spark's sampled range exchange
  *      gives P ordered, non-overlapping partitions (the same machinery
  *      a distributed sort uses; P scales with the cluster).
  *   2. per-partition row counts (P rows) → running offsets via a
  *      broadcast triangular join on the P-row frame — O(P²) on ≤ a few
  *      thousand rows, NO global window anywhere in the plan.
  *   3. `row_number` partitioned by range-partition id (parallel, each
  *      task sorts only its own range) + offset = the row's exact
  *      0-based global position.
  *   4. the SQL-standard ntile formula from (position, total): with
  *      q = total div k and r = total mod k, the first r buckets hold
  *      q+1 rows, the rest q — bit-identical to `ntile(k)` in Spark
  *      and DuckDB for any total order.
  *
  * Determinism: callers must pass a TOTAL order (tie-broken to a unique
  * key) — then bucket values are independent of where the sampled range
  * boundaries land, so AQE/sampling variance cannot change results.
  * The explicit partition count keeps AQE from re-coalescing the
  * exchange between its two consumers.
  *
  * Branch consistency: every operator here feeds the ranged frame to
  * TWO plan branches (per-partition aggregates + the final join), and
  * the sampled exchange is not reliably reused across them (column
  * pruning specializes the subtrees; re-sampling can pick different
  * boundaries when upstream row order is nondeterministic). All four
  * operators therefore materialize the exchange once by default
  * (`checkpoint = true`, an eager localCheckpoint) so both branches
  * see one boundary set.
  */
object ScaleWindows {

  /** parts <= 0 means "follow the cluster": defaultParallelism, never
    * a core-count literal baked at authoring time (local[32] today,
    * 400 cores tomorrow). Callers pass an explicit count only when the
    * frame is provably tiny and a fixed fan-out is part of the
    * contract. */
  private[graft] def resolveParts(df: DataFrame, parts: Int): Int =
    if (parts > 0) parts
    else df.sparkSession.sparkContext.defaultParallelism

  /** Exact `ntile(k)` over the global order `keys` without a
    * single-partition sort. `keys` must be a total order (unique
    * tie-break). Adds column `out` (int, 1..k). */
  def rangeNtile(df: DataFrame, k: Int, keys: Seq[Column], out: String,
                 parts: Int = -1,
                 checkpoint: Boolean = true): DataFrame = {
    require(k > 0, s"rangeNtile: k must be positive, got $k")
    val ranged0 = df.repartitionByRange(resolveParts(df, parts), keys: _*)
      .withColumn("__pid", spark_partition_id())
    val ranged = if (checkpoint) ranged0.trunkCheckpoint() else ranged0
    val counts = ranged.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"))
    // offsets without a window: triangular sum over the P-row frame
    val rhs = counts.select(col("__pid").as("__pid2"),
      col("__cnt").as("__cnt2"))
    val offs = counts.crossJoin(broadcast(rhs))
      .groupBy(col("__pid"))
      .agg(sum(when(col("__pid2") < col("__pid"), col("__cnt2"))
          .otherwise(lit(0L))).as("__off"),
        sum(col("__cnt2")).as("__total"))
    val wp = Window.partitionBy(col("__pid")).orderBy(keys: _*)
    ranged
      .withColumn("__rn", row_number().over(wp))
      .join(broadcast(offs), Seq("__pid"))
      .withColumn("__i", col("__off") + col("__rn") - 1)
      .withColumn("__q", expr(s"__total div ${k}L"))
      .withColumn("__r", col("__total") % k)
      .withColumn(out,
        when(col("__i") < col("__r") * (col("__q") + 1),
          expr("__i div (__q + 1)") + 1)
          .otherwise(col("__r") + expr("(__i - __r * (__q + 1)) div __q")
            + 1)
          .cast("int"))
      .drop("__pid", "__rn", "__off", "__total", "__i", "__q", "__r")
  }

  /** Exact EXCLUSIVE prefix sum of `value` over the global order
    * `keys` (sum of strictly-preceding rows; 0 for the first) without
    * a single-partition sort: range exchange → per-partition totals →
    * broadcast triangular offsets over the P-row frame → partition-
    * local running sum + carried offset. Same determinism contract as
    * [[rangeNtile]]: `keys` must be a total order. Adds `out` (long). */
  def rangeCumSum(df: DataFrame, keys: Seq[Column], value: Column,
                  out: String, parts: Int = -1,
                  checkpoint: Boolean = true): DataFrame =
    rangeCumSums(df, keys, Seq(value -> out), parts, checkpoint)

  /** Multi-value form of [[rangeCumSum]]: N exclusive prefix sums over
    * ONE range exchange and one partition-local WindowExec (all sums
    * share the frame). `values` maps each summed column to its output
    * column name.
    *
    * `checkpoint` (default ON): the ranged frame feeds BOTH the
    * per-partition-totals branch and the window branch. Column pruning
    * specializes the two subtrees differently, so Spark does not
    * always reuse the exchange — and a SAMPLED range exchange
    * re-evaluated independently can land on DIFFERENT boundaries
    * (sampling order depends on upstream shuffle-read order), making
    * the offsets describe the wrong partitioning. That divergence is
    * intermittent (surfaced by q312 after hundreds of green runs of
    * the same machinery), so the default materializes the exchange
    * ONCE via an eager localCheckpoint — both branches then share one
    * boundary set by construction. Opt out only when the caller
    * guarantees a deterministic, reusable input (and accepts the
    * risk). */
  def rangeCumSums(df: DataFrame, keys: Seq[Column],
                   values: Seq[(Column, String)],
                   parts: Int = -1,
                   checkpoint: Boolean = true): DataFrame = {
    val ranged0 = df.repartitionByRange(resolveParts(df, parts), keys: _*)
      .withColumn("__pid", spark_partition_id())
    val ranged = if (checkpoint) ranged0.trunkCheckpoint() else ranged0
    val psums = values.map { case (v, o) => sum(v).as(s"__psum_$o") }
    val sums = ranged.groupBy(col("__pid")).agg(psums.head, psums.tail: _*)
    val rhs = sums.select(col("__pid").as("__pid2") +:
      values.map { case (_, o) => col(s"__psum_$o").as(s"__psum2_$o") }: _*)
    val offAggs = values.map { case (_, o) =>
      sum(when(col("__pid2") < col("__pid"), col(s"__psum2_$o"))
        .otherwise(lit(0L))).as(s"__off_$o")
    }
    val offs = sums.crossJoin(broadcast(rhs))
      .groupBy(col("__pid")).agg(offAggs.head, offAggs.tail: _*)
    val wp = Window.partitionBy(col("__pid")).orderBy(keys: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val joined = ranged.join(broadcast(offs), Seq("__pid"))
    val withOut = values.foldLeft(joined) { case (d, (v, o)) =>
      d.withColumn(o, coalesce(sum(v).over(wp), lit(0L)) + col(s"__off_$o"))
    }
    withOut.drop("__pid" +: values.map { case (_, o) => s"__off_$o" }: _*)
  }

  /** Exact EXCLUSIVE prefix max of `value` over the global order
    * `keys` (max of strictly-preceding rows; NULL for the first row)
    * without a single-partition sort — the skyline/running-record
    * primitive. Same machinery and determinism contract as
    * [[rangeCumSum]]: range exchange → per-partition maxima →
    * broadcast triangular exclusive-max carry over the P-row frame →
    * partition-local exclusive running max `greatest`-merged with the
    * carry (Spark's `greatest` skips NULLs, so a first-partition row
    * with no carry still sees its local predecessors and the global
    * first row stays NULL). Adds `out`, typed as `value`. */
  def rangeCumMax(df: DataFrame, keys: Seq[Column], value: Column,
                  out: String, parts: Int = -1,
                  checkpoint: Boolean = true): DataFrame = {
    val ranged0 = df.withColumn("__v", value)
      .repartitionByRange(resolveParts(df, parts), keys: _*)
      .withColumn("__pid", spark_partition_id())
    // same hazard as rangeCumSums: the maxima branch and the final
    // join branch re-evaluate the input under independently-sampled
    // range boundaries; for a long or itself-range-exchanged lineage
    // the samples can disagree and the carry then describes a
    // DIFFERENT partitioning. `checkpoint = true` materializes the
    // exchange once so both branches share one boundary set.
    val ranged = if (checkpoint) ranged0.trunkCheckpoint() else ranged0
    val maxes = ranged.groupBy(col("__pid"))
      .agg(max(col("__v")).as("__pmax"))
    val rhs = maxes.select(col("__pid").as("__pid2"),
      col("__pmax").as("__pmax2"))
    val offs = maxes.crossJoin(broadcast(rhs))
      .groupBy(col("__pid"))
      .agg(max(when(col("__pid2") < col("__pid"), col("__pmax2")))
        .as("__carry"))
    val wp = Window.partitionBy(col("__pid")).orderBy(keys: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged.join(broadcast(offs), Seq("__pid"))
      .withColumn(out, greatest(max(col("__v")).over(wp), col("__carry")))
      .drop("__pid", "__v", "__carry")
  }

  /** Scale-safe LOCF (last-observation-carried-forward) over a global
    * order: for each row, the most recent non-null `value` at or
    * before it in `keys` order — the step-function/as-of primitive
    * (gap fill, inverse-CDF lookup, snapshot carry) without a
    * single-partition sort. Same machinery as [[rangeCumSum]]: range
    * exchange → per-partition LAST non-null (a struct-max over the
    * key tuple, so `keys` must be plain ASCENDING columns — negate a
    * column to descend) → nearest-preceding-partition carry via the
    * broadcast triangular join → partition-local
    * `last(ignoreNulls)` window + carry fallback. Adds `out`, typed
    * as `value`. */
  def rangeLastCarry(df: DataFrame, keys: Seq[Column], value: Column,
                     out: String, parts: Int = -1,
                     checkpoint: Boolean = true): DataFrame = {
    val tagged0 = df.withColumn("__v", value)
      .repartitionByRange(resolveParts(df, parts), keys: _*)
      .withColumn("__pid", spark_partition_id())
    val tagged = if (checkpoint) tagged0.trunkCheckpoint() else tagged0
    val keyStruct = struct(
      keys.zipWithIndex.map { case (k, i) => k.as(s"__k$i") } :+
        col("__v").as("__vv"): _*)
    val lasts = tagged.groupBy(col("__pid"))
      .agg(max(when(col("__v").isNotNull, keyStruct)).as("__last"))
      .select(col("__pid"), col("__last").getField("__vv").as("__lastv"))
    val rhs = lasts.select(col("__pid").as("__pid2"),
      col("__lastv").as("__lastv2"))
    val offs = lasts.crossJoin(broadcast(rhs))
      .groupBy(col("__pid"))
      .agg(max(when(col("__pid2") < col("__pid") &&
          col("__lastv2").isNotNull,
        struct(col("__pid2").as("__p"), col("__lastv2").as("__cv"))))
        .as("__carry"))
      .select(col("__pid"), col("__carry").getField("__cv").as("__carryv"))
    val wp = Window.partitionBy(col("__pid")).orderBy(keys: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    tagged.join(broadcast(offs), Seq("__pid"))
      .withColumn(out,
        coalesce(last(col("__v"), ignoreNulls = true).over(wp),
          col("__carryv")))
      .drop("__pid", "__v", "__carryv")
  }
}
