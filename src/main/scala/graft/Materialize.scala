package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.LogicalRDD

/** The materialization seam for every trunk/iteration checkpoint in the
  * query library.
  *
  * Queries and iterative kernels eagerly `localCheckpoint()` reusable
  * frames (trunk tables, fixpoint frontiers). That truncates lineage to
  * a `LogicalRDD`, which blinds plan-walking tools — most importantly
  * the mirrored-double hash-stability detector (HashStabilitySpec),
  * which must see every `Round(double)` in a query's FULL lineage to
  * enroll it in the partitioning-perturbation family (the r6 q316/q344
  * float-drift class escaped precisely through this hole).
  *
  * All library code therefore checkpoints through [[trunkCheckpoint]]
  * instead of calling `localCheckpoint` directly. Besides
  * checkpointing, it records PROVENANCE: the pre-truncation analyzed
  * plan, keyed by the checkpoint RDD's id. A plan walker that reaches a
  * `LogicalRDD` leaf can resume on the recorded original plan via
  * [[lineageOf]] — full-lineage analysis at zero rebuild cost (an
  * earlier design re-ran the query builder with checkpointing disabled;
  * iterative kernels then stack k rounds of un-truncated lineage and
  * plan analysis goes super-linear — unusably slow even at sf0.001).
  * The map key is the RDD id, not the plan node: self-joins copy the
  * `LogicalRDD` via `newInstance` (fresh exprIds) but share the RDD.
  *
  * Two thread-local modes adjust behavior for tools:
  *  - [[transparent]]: [[trunkCheckpoint]] is the identity and trunk
  *    memo caches bypass themselves — the caller sees the raw build
  *    lineage. For plan inspection of SMALL builds only (the planted
  *    detector spec); never execute an iterative kernel this way.
  *  - [[fresh]]: checkpoints behave normally (bounded plans) but memo
  *    caches bypass, so a perturbation harness re-executing a query
  *    rebuilds its trunks under the CURRENT session config instead of
  *    reading a frame materialized under the default config. Fresh
  *    builds are not pinned — CheckpointHygiene.release reclaims them
  *    at the next query boundary.
  */
object Materialize {

  private val transparentDepth = new ThreadLocal[Integer] {
    override def initialValue: Integer = 0
  }
  private val freshDepth = new ThreadLocal[Integer] {
    override def initialValue: Integer = 0
  }

  def isTransparent: Boolean = transparentDepth.get > 0

  /** True when trunk memo caches must bypass themselves (either
    * tool mode). Cache sites consult this, never the modes directly. */
  def bypassMemo: Boolean = isTransparent || freshDepth.get > 0

  /** Run `body` with every [[trunkCheckpoint]] a no-op and every memo
    * cache bypassed (full lineage). Reentrant, thread-local. */
  def transparent[T](body: => T): T = {
    transparentDepth.set(transparentDepth.get + 1)
    try body finally transparentDepth.set(transparentDepth.get - 1)
  }

  /** Run `body` with memo caches bypassed but checkpoints intact:
    * trunks rebuild under the caller's current session config. */
  def fresh[T](body: => T): T = {
    freshDepth.set(freshDepth.get + 1)
    try body finally freshDepth.set(freshDepth.get - 1)
  }

  /** Pre-truncation analyzed plan of each checkpoint, by RDD id.
    * Bounded: one small plan tree per checkpoint in the session (the
    * recorded plan's own upstream checkpoints are themselves truncated
    * `LogicalRDD`s, so entries never stack k rounds of lineage). */
  private val provenance =
    new java.util.concurrent.ConcurrentHashMap[Int, LogicalPlan]()

  /** The recorded pre-checkpoint plan behind a `LogicalRDD` leaf, if
    * the frame came from [[trunkCheckpoint]]. */
  def lineageOf(plan: LogicalPlan): Option[LogicalPlan] = plan match {
    case lr: LogicalRDD => Option(provenance.get(lr.rdd.id))
    case _ => None
  }

  /** `df.localCheckpoint()` (+ provenance recording) in normal and
    * [[fresh]] modes; identity inside [[transparent]]. */
  implicit class TrunkCheckpointOps(private val df: DataFrame)
      extends AnyVal {
    def trunkCheckpoint(): DataFrame =
      if (isTransparent) df
      else {
        val cp = df.localCheckpoint()
        cp.queryExecution.analyzed match {
          case lr: LogicalRDD =>
            provenance.put(lr.rdd.id, df.queryExecution.analyzed)
          case _ => // not a plain checkpoint leaf; nothing to record
        }
        cp
      }
  }
}
