package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, the payload of the latest
  * right row with `right.time <= left.time` in the same key group.
  *
  * Spark has no ASOF JOIN operator (DuckDB/Pandas do), and the naive
  * formulation — range self-join then argmax per left row — explodes to
  * O(left × matching-right) intermediate rows. The scalable plan used
  * here is the classic union-and-sweep:
  *
  *   1. tag left (probe) and right (reference) rows and union them,
  *   2. one window partitioned by the join key, ordered by
  *      (time, isLeft, tieBreak) — reference rows sort BEFORE probe rows
  *      at equal time, so "preceding-or-equal" is inclusive,
  *   3. running `last(payload, ignoreNulls)` carries the latest
  *      reference payload forward onto each probe row.
  *
  * Cost: ONE shuffle on the key (the window), O(n log n) per-group sort,
  * zero fan-out — this survives a 1000-executor 100 TB run as long as
  * single key groups fit a partition (salt the key + two-phase merge if
  * one key dominates). Ref semantics match DuckDB `ASOF JOIN` with a
  * deterministic tie-break (largest tieBreak wins among equal times).
  */
object AsOfJoin {

  /** @param keys        equality-join key columns (present in both sides)
    * @param timeCol     event-time column name (same name both sides)
    * @param tieBreak    unique column ordering right rows at equal time
    * @param rightPayload right columns to attach (emitted as `asof_<c>`)
    * Left rows keep all their columns; unmatched probes get null payload.
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, tieBreak: String,
      rightPayload: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    val leftExtra = left.columns.filterNot(c =>
      keys.contains(c) || c == timeCol || c == tieBreak).toSeq
    val payloadAs = rightPayload.map(c => "asof_" + c)

    val probes = left.select(
      keyCols ++ Seq(col(timeCol), col(tieBreak), lit(1).as("_is_probe")) ++
        leftExtra.map(col) ++
        rightPayload.map(c =>
          lit(null).cast(right.schema(c).dataType).as("asof_" + c)): _*)
    val refs = right.select(
      keyCols ++ Seq(col(timeCol), col(tieBreak), lit(0).as("_is_probe")) ++
        leftExtra.map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightPayload.map(c => col(c).as("asof_" + c)): _*)

    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col(timeCol).asc, col("_is_probe").asc, col(tieBreak).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadAs.foldLeft(probes.unionByName(refs)) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("_is_probe") === 1).drop("_is_probe")
  }

  /** The native whole-operator form of [[backward]] — identical
    * semantics and output schema (equality spec-asserted in ScaleSpec),
    * executed by graft.plans.AsOfJoinExec: each side shuffles
    * separately on the key (no union row widening) and a two-pointer
    * merge replaces the window carry-forward. Requires the session to
    * load GraftExtensions (the planner strategy). */
  def backwardNative(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, tieBreak: String,
      rightPayload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Attribute,
      AttributeReference}
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val lPlan = left.queryExecution.analyzed
    // fresh exprIds on the right side: when both inputs derive from the
    // same relation (self-as-of), the analyzer's relation dedup re-ids
    // the right SUBTREE but cannot disambiguate this node's right-side
    // attribute fields (their ids collide with the left's). Aliasing
    // gives the right output unique ids that survive the dedup remap;
    // the optimizer collapses the extra Project away.
    val rPlan = right.select(right.columns.toIndexedSeq
        .map(c => col(c).as(c)): _*)
      .queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${plan.output.map(_.name)}"))
    val payloadAttrs = rightPayload.map(attr(rPlan, _))
    val payloadOut = payloadAttrs.map(a =>
      AttributeReference("asof_" + a.name, a.dataType, nullable = true)())
    ColumnBridge.ofRows(left.sparkSession,
      graft.plans.AsOfJoinPlan(lPlan, rPlan,
        keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
        attr(lPlan, timeCol), attr(rPlan, timeCol),
        attr(rPlan, tieBreak), payloadAttrs, payloadOut))
  }
}
