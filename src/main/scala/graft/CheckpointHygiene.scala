package graft

import org.apache.spark.sql.SparkSession

/** Storage hygiene for `localCheckpoint`-heavy suites.
  *
  * Iterative kernels (connected components, PageRank, BPE, the
  * ScaleWindows range-exchange materialization) eagerly
  * `localCheckpoint()` intermediate frames; Spark persists those RDDs
  * and nothing ever unpersists them — a full 407-query sweep (≥2 runs
  * each) accumulates thousands of checkpoint blocks in block storage
  * for the whole session, degrading to eviction/disk-spill as a bench
  * progresses.
  *
  * [[release]] drops every LOCALLY-checkpointed persistent RDD. Safety
  * contract: call it only at a query boundary, after the consuming
  * action finished — a localCheckpoint truncates lineage, so its
  * blocks are unrecoverable once dropped (this is precisely why the
  * sweep must not unpersist mid-query). Explicit `persist()`/`cache()`
  * frames (e.g. the NewsPipeline shared trunk, which IS reused across
  * queries and CAN recompute from lineage) are deliberately left
  * alone.
  */
object CheckpointHygiene {
  /** RDD ids that [[release]] must never drop: cross-QUERY memoized
    * checkpoints (e.g. the near-dup group trunk in TrainingData) hand
    * out the same truncated-lineage frame to many queries — their
    * blocks are unrecoverable, so dropping them at a query boundary
    * would poison every later cache hit. */
  private val pinnedIds =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  /** Run `build` (which is expected to `localCheckpoint` something)
    * and pin every persistent RDD it newly registered, exempting them
    * from [[release]] for the life of the session. Queries run
    * sequentially in Verify/Bench, so the before/after diff is not
    * racy in practice; a concurrent caller could at worst over-pin. */
  def pinning[T](spark: SparkSession)(build: => T): T = {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = build
    spark.sparkContext.getPersistentRDDs.keysIterator
      .filterNot(before).foreach(pinnedIds.add(_))
    out
  }

  /** Unpersist all non-pinned checkpointed RDDs. Returns how many were
    * released. Non-blocking: block deletion proceeds async.
    * `isCheckpointed` is true only after the (eager) checkpoint
    * materialized, and false for plain persist()/cache() frames —
    * exactly the split we need (plain-persisted trunks like the
    * NewsPipeline marts keep their lineage and may recompute). */
  def release(spark: SparkSession): Int = {
    val doomed = spark.sparkContext.getPersistentRDDs
      .filter { case (id, rdd) =>
        rdd.isCheckpointed && !pinnedIds.contains(id) }
      .values.toSeq
    doomed.foreach(_.unpersist(blocking = false))
    doomed.size
  }
}
