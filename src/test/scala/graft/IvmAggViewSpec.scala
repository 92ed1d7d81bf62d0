package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.IvmAggView
import graft.streaming.IvmAggView.{Delta, ViewRow}

/** Streaming IVM-with-retractions parity (r8 VERDICT item 7): the
  * transformWithState view-maintenance operator must converge to
  * exactly the maintained view batch q481 computes — across a
  * checkpoint restart, with the signed retraction/bump batch arriving
  * in a SECOND stream run so the base view is restored from state, and
  * with the n→0 removal edge case exercised to the point of proving
  * the state was actually cleared (a re-created group restarts its
  * version counter). */
class IvmAggViewSpec extends SparkSpec {
  import spark.implicits._

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"

  private def withRocks[T](body: => T): T = {
    // transformWithState needs the RocksDB provider
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, "org.apache.spark.sql.execution." +
      "streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(p) => spark.conf.set(providerKey, p)
      case None => spark.conf.unset(providerKey)
    }
  }

  private def runAvailable(landing: String, ckpt: String,
      out: String): Unit = withRocks {
    val src = spark.readStream.schema("key STRING, dn LONG, dc LONG")
      .parquet(landing).as[Delta]
    val q = IvmAggView.run(src)
      .writeStream.format("parquet").option("path", out)
      .outputMode("append").option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("streamed view across a checkpoint restart equals batch q481's " +
    "maintained columns") {
    val base = Files.createTempDirectory("graft-ivmview").toString
    val landing = s"$base/landing"
    val out = s"$base/out"
    // the exact q481 derivation: base rows, then the signed delta batch
    val o = Tables(spark, sfDir, "orders").select($"o_orderkey",
      $"o_orderpriority".as("key"),
      round($"o_totalprice" * 100).cast("long").as("cents"))
    val mark = graft.functions.Hashing.hash60(
      concat(lit("ivr|"), $"o_orderkey".cast("string"))) % 10
    o.select($"key", lit(1L).as("dn"), $"cents".as("dc"))
      .coalesce(1).write.mode("append").parquet(landing)
    runAvailable(landing, s"$base/ckpt", out)
    // restart: retractions + bumped re-inserts land on the SAME
    // checkpoint — the base view must come out of restored state
    o.filter(mark === 0)
      .select($"key", lit(-1L).as("dn"), (-$"cents").as("dc"))
      .unionByName(o.filter(mark === 1)
        .select($"key", lit(1L).as("dn"), ($"cents" + 100L).as("dc")))
      .coalesce(1).write.mode("append").parquet(landing)
    runAvailable(landing, s"$base/ckpt", out)

    val rows = spark.read.parquet(out).as[ViewRow].collect().toSeq
    // each group was touched by both batches: changelog versions 1, 2
    assert(rows.groupBy(_.key).values.forall(
      _.map(_.ver).sorted == Seq(1L, 2L)),
      "expected exactly one changelog row per group per micro-batch")
    val latest = rows.groupBy(_.key).map { case (k, vs) =>
      val last = vs.maxBy(_.ver)
      (k, last.n, last.sc)
    }.filter(_._2 > 0L).toSeq.sorted
    val batch = queries.Governance.ivmAggRetract(spark, sfDir)
      .select($"priority", $"n_view", $"sum_view")
      .as[(String, Long, Long)].collect().sorted.toSeq
    assert(batch.nonEmpty, "batch q481 returned nothing at test SF")
    assert(latest == batch,
      s"streamed view ${latest.size} groups vs batch ${batch.size}; " +
        s"first diff: ${latest.zip(batch).find(p => p._1 != p._2)}")
    CheckpointHygiene.release(spark)
  }

  test("retraction to zero removes the group: tombstone emitted, " +
    "state cleared, re-create restarts the version counter") {
    val base = Files.createTempDirectory("graft-ivmtomb").toString
    val landing = s"$base/landing"
    val out = s"$base/out"
    def land(rows: Seq[(String, Long, Long)]): Unit =
      rows.toDF("key", "dn", "dc").coalesce(1)
        .write.mode("append").parquet(landing)
    // lifetime 1: two inserts → view (2, 12)
    land(Seq(("x", 1L, 5L), ("x", 1L, 7L)))
    runAvailable(landing, s"$base/ckpt", out)
    // full retraction → tombstone (0, 0) and the state must be GONE
    land(Seq(("x", -1L, -5L), ("x", -1L, -7L)))
    runAvailable(landing, s"$base/ckpt", out)
    // lifetime 2: re-create — ver restarts at 1 iff state was cleared
    land(Seq(("x", 1L, 9L)))
    runAvailable(landing, s"$base/ckpt", out)
    val got = spark.read.parquet(out).as[ViewRow].collect()
      .map(r => (r.ver, r.n, r.sc)).sorted.toSeq
    assert(got == Seq((1L, 1L, 9L), (1L, 2L, 12L), (2L, 0L, 0L)),
      s"changelog was $got")
    CheckpointHygiene.release(spark)
  }

  test("net-zero first batch for a never-existed group is a no-op: " +
    "no tombstone emitted, no state created (r9 ADVICE)") {
    val base = Files.createTempDirectory("graft-ivmzero").toString
    val landing = s"$base/landing"
    val out = s"$base/out"
    def land(rows: Seq[(String, Long, Long)]): Unit =
      rows.toDF("key", "dn", "dc").coalesce(1)
        .write.mode("append").parquet(landing)
    // 'ghost' nets to zero in its first-ever batch; 'real' is a
    // control that must still emit normally from the same batch
    land(Seq(("ghost", 1L, 3L), ("ghost", -1L, -3L), ("real", 1L, 4L)))
    runAvailable(landing, s"$base/ckpt", out)
    val b1 = spark.read.parquet(out).as[ViewRow].collect().toSeq
    assert(b1.map(r => (r.key, r.ver, r.n, r.sc)) == Seq(("real", 1L, 1L, 4L)),
      s"expected only the control row, got $b1")
    // no state was created for 'ghost': a later insert starts at ver 1
    land(Seq(("ghost", 1L, 8L)))
    runAvailable(landing, s"$base/ckpt", out)
    val ghost = spark.read.parquet(out).as[ViewRow].collect()
      .filter(_.key == "ghost").map(r => (r.ver, r.n, r.sc)).toSeq
    assert(ghost == Seq((1L, 1L, 8L)),
      s"ghost's first real lifetime must start at ver 1, got $ghost")
    CheckpointHygiene.release(spark)
  }

  test("over-retraction fails the query loudly instead of storing a " +
    "negative count (r9 ADVICE)") {
    val base = Files.createTempDirectory("graft-ivmneg").toString
    val landing = s"$base/landing"
    Seq(("y", -1L, -5L)).toDF("key", "dn", "dc").coalesce(1)
      .write.mode("append").parquet(landing)
    val ex = intercept[Exception] {
      runAvailable(landing, s"$base/ckpt", s"$base/out")
    }
    def causes(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(20).toSeq
    assert(causes(ex).exists(c =>
      Option(c.getMessage).exists(_.contains("retracted below zero"))),
      s"expected the malformed-changelog failure, got: $ex")
    CheckpointHygiene.release(spark)
  }
}
