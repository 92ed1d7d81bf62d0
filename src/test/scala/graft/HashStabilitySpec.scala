package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Round
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.types.DoubleType

/** Partitioning-perturbation hash stability for the mirrored-double
  * family (SURVEY.md q189 rule: a final float op tree mirrored
  * token-for-token in the oracle).
  *
  * The r6 regression class: a query whose last mile rounds a DOUBLE is
  * only oracle-hash-stable if every double input to that round() is
  * itself a deterministic function of exact (integral/decimal)
  * aggregates — i.e. no partial-aggregation order can leak into the
  * rounded value. This spec enforces that mechanically for EVERY
  * registry query that rounds a double anywhere in its analyzed plan:
  * run once under the default test config, once under a deliberately
  * hostile one (different reducer count, 1 MiB scan splits, AQE off),
  * and require bit-identical results.
  *
  * The family is discovered from the plan, not a hand-kept list, so a
  * new query that adds a fragile float tree is enrolled automatically.
  *
  * The former localCheckpoint blind spot (a Round UPSTREAM of a
  * checkpoint is invisible in the analyzed plan — the truncated
  * LogicalRDD hides it; this is how the r6 q316/q344 class escaped the
  * detector) is closed via [[Materialize]] provenance: every
  * trunkCheckpoint records its pre-truncation analyzed plan keyed by
  * the checkpoint RDD id, and the detector resumes its walk on the
  * recorded plan whenever it reaches a LogicalRDD leaf — full-lineage
  * discovery at zero rebuild cost. Queries whose Round is reachable
  * ONLY through provenance ("checkpoint-hidden") execute their
  * perturbation pair in [[Materialize.fresh]] mode, so the trunk
  * rebuilds under the hostile config instead of being read from a
  * frame materialized under the default one.
  */
class HashStabilitySpec extends SparkSpec {

  /** Pinned count of checkpoint-hidden family members (the enrollment
    * fence). Recount printed by the family-discovery `info` line.
    * 63 recounted at registry 488 after round-10's reused-subtree
    * checkpointing batches: pinning a frame whose upstream rounds a
    * double (q386's density grid, q441/q227's heldout scores, q475's
    * vote fingerprints, the LM count frames, …) moves that Round
    * behind a trunkCheckpoint, so 12 previously direct-only members
    * became provenance-reachable — each verified to execute
    * trunk-fresh here, which is exactly the behavior the
    * perturbation pair needs. (History: 51 at registry 486.) Any
    * query that newly rounds through a checkpoint must bump this
    * count IN THE SAME COMMIT.
    * 63 → 64 (r11): q448's value-histogram collapse pins the
    * (col, value, multiplicity) frame, moving its money/discount
    * Rounds behind the checkpoint — verified trunk-fresh here. */
  private val ExpectedCheckpointHidden = 64

  private def directRounds(plan: LogicalPlan): Boolean =
    plan.collectWithSubqueries {
      case p => p.expressions.flatMap(_.collect {
        case r: Round if r.child.dataType == DoubleType => r
      })
    }.flatten.nonEmpty

  /** A Round reachable ONLY through checkpoint provenance: walks the
    * recorded pre-checkpoint plan of every LogicalRDD leaf that came
    * from trunkCheckpoint, recursively. Detected INDEPENDENTLY of
    * direct Rounds — a query with both a direct Round and a hidden one
    * must still run trunk-fresh, or the hidden Round's trunk is served
    * from the default-config materialization and never sees the
    * perturbation (the r6-class blind spot for mixed queries).
    *
    * The verdict is MEMOIZED per checkpoint RDD id: provenance forms a
    * DAG (a pre-checkpoint plan references its own upstream checkpoints
    * several times — k-truss rounds reference the previous round ~5×,
    * and the fixpoint chain stacks four of those), and walking the DAG
    * as a tree is exponential in chain depth (the un-memoized form
    * burned 45+ CPU-minutes on round-9's registry). RDD ids are
    * monotone per context, never reused, and a checkpoint's lineage is
    * immutable, so the cache is sound across queries and modes. */
  private val lineageRoundMemo = scala.collection.mutable.Map[Int, Boolean]()

  private def leafHasRound(lr: LogicalRDD): Boolean =
    lineageRoundMemo.get(lr.rdd.id) match {
      case Some(b) => b
      case None =>
        val b = Materialize.lineageOf(lr).exists(p =>
          directRounds(p) || hiddenRounds(p))
        lineageRoundMemo(lr.rdd.id) = b
        b
    }

  private def hiddenRounds(plan: LogicalPlan): Boolean =
    plan.collectWithSubqueries { case lr: LogicalRDD => lr }
      .distinctBy(_.rdd.id).exists(leafHasRound)

  /** Full-lineage scan: the analyzed plan, plus (recursively) the
    * recorded pre-truncation plans behind every trunkCheckpoint. */
  private def scanLineage(plan: LogicalPlan): Boolean =
    directRounds(plan) || hiddenRounds(plan)

  private def rowsSorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("planted Round behind a localCheckpoint is visible through " +
    "checkpoint provenance (the r6 escape path)") {
    import Materialize.TrunkCheckpointOps
    import org.apache.spark.sql.functions.{avg, col, round => rnd}
    val planted = spark.range(100)
      .select(rnd(avg(col("id")).cast("double"), 2).as("x"))
      .trunkCheckpoint()
      .select(col("x") + 1)
    assert(!directRounds(planted.queryExecution.analyzed),
      "checkpointed plan should hide the Round from a direct walk " +
        "(LogicalRDD) — if this fires, localCheckpoint semantics " +
        "changed and the blind spot no longer exists")
    assert(scanLineage(planted.queryExecution.analyzed),
      "provenance recursion must surface the Round behind the " +
        "checkpoint")
    // and a self-join copy (newInstance → new exprIds, same RDD) must
    // still resolve through the RDD-id key
    val joined = planted.as("l").join(planted.as("r"))
    assert(scanLineage(joined.queryExecution.analyzed),
      "provenance lookup must survive LogicalRDD newInstance copies")
  }

  test("mirrored-double family: bit-identical under partitioning " +
    "perturbation (shuffle partitions, scan splits, AQE)") {
    val conf = spark.conf
    // discover on the FULL lineage (direct walk + checkpoint
    // provenance); members whose Round is reachable only through
    // provenance must EXECUTE trunk-fresh below
    val family = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan =
          try Some(fn(spark, sfDir).queryExecution.analyzed)
          catch { case _: Throwable => None } // analysis errors surface
                                              // in the query's own gate
        plan.flatMap { p =>
          if (!scanLineage(p)) None
          else Some((name, fn, hiddenRounds(p)))
        }
    }
    assert(family.nonEmpty, "family discovery returned nothing — the " +
      "Round-over-double detector is broken")
    val hidden = family.count(_._3)
    info(s"mirrored-double family: ${family.size} queries " +
      s"($hidden checkpoint-hidden)")
    // enrollment fence: the provenance-discovered count is pinned, so a
    // NEW trunkCheckpoint query that rounds a double upstream of its
    // checkpoint cannot land silently unenrolled (the r6 escape cannot
    // reopen for query 483+). Bump the constant when such a query
    // legitimately lands — the bump is the enrollment review.
    assert(hidden == ExpectedCheckpointHidden,
      s"checkpoint-hidden enrollment changed: $hidden discovered vs " +
        s"$ExpectedCheckpointHidden pinned. A query that rounds a " +
        "double behind a trunkCheckpoint was added or removed — verify " +
        "it executes trunk-fresh here, then bump " +
        "ExpectedCheckpointHidden.")
    val diffs = family.flatMap { case (name, fn, checkpointHidden) =>
      def run() =
        if (checkpointHidden)
          Materialize.fresh { rowsSorted(fn(spark, sfDir)) }
        else rowsSorted(fn(spark, sfDir))
      val base = run()
      val saved = Seq("spark.sql.shuffle.partitions",
        "spark.sql.files.maxPartitionBytes",
        "spark.sql.adaptive.enabled").map(k => k -> conf.get(k))
      try {
        conf.set("spark.sql.shuffle.partitions", "7")
        conf.set("spark.sql.files.maxPartitionBytes", "1m")
        conf.set("spark.sql.adaptive.enabled", "false")
        val perturbed = run()
        if (base == perturbed) None
        else Some(s"$name: ${base.size} vs ${perturbed.size} rows; " +
          s"first diff ${base.zip(perturbed).find(p => p._1 != p._2)}")
      } finally {
        saved.foreach { case (k, v) => conf.set(k, v) }
        CheckpointHygiene.release(spark) // reclaim fresh-mode trunks
      }
    }
    assert(diffs.isEmpty,
      s"${diffs.size} mirrored-double queries drifted under partitioning " +
        s"perturbation:\n${diffs.mkString("\n")}")
    CheckpointHygiene.release(spark)
  }
}
