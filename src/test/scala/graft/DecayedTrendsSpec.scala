package graft

import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.DecayedTrends
import graft.streaming.DecayedTrends.{TermHit, TermWeight}

/** Decayed trending-terms semantics: integer-state decay fold is
  * bit-identical to a plain fold over the same hits, state survives
  * restarts (decay continues from checkpointed weight, not from
  * scratch), and an idle re-run emits nothing.
  */
class DecayedTrendsSpec extends SparkSpec {
  import spark.implicits._

  private val halfLife = 1000000L // 1 s in micros

  private def runAvailable(landing: String, checkpoint: String,
      outDir: String): Unit = {
    val src = spark.readStream
      .schema("term STRING, tsMicros LONG, hitId LONG")
      .parquet(landing).as[TermHit]
    val q = DecayedTrends.run(src, halfLife)
      .writeStream.format("parquet")
      .option("path", outDir)
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def latestPerTerm(outDir: String): Map[String, TermWeight] =
    spark.read.parquet(outDir).as[TermWeight].collect()
      .groupBy(_.term).map { case (t, ws) =>
        t -> ws.maxBy(_.hits)
      }

  private def referenceFold(
      hits: Seq[TermHit]): Map[String, TermWeight] =
    hits.groupBy(_.term).map { case (t, hs) =>
      var lastTs = Long.MinValue
      var w = 0L
      hs.sortBy(h => (h.tsMicros, h.hitId)).foreach { h =>
        w = DecayedTrends.step(w, lastTs, h.tsMicros, halfLife)
        lastTs = h.tsMicros
      }
      t -> TermWeight(t, lastTs, w, hs.length)
    }

  // transformWithState needs the RocksDB provider (multiple column
  // families); scope it to this suite's query runs and restore after
  private def withRocksDb[A](f: => A): A = {
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, "org.apache.spark.sql.execution." +
      "streaming.state.RocksDBStateStoreProvider")
    try f finally prev match {
      case Some(p) => spark.conf.set(providerKey, p)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("stream fold equals the plain fold bit-for-bit; " +
    "state survives restart; idle re-run emits nothing") { withRocksDb {
    val base = Files.createTempDirectory("trend").toString
    val landing = s"$base/landing"
    val outDir = s"$base/out"
    def land(rows: Seq[TermHit]): Unit =
      rows.toDF().coalesce(1).write.mode("append").parquet(landing)

    // batch 1: two terms, spark hit twice within one half-life
    val b1 = Seq(TermHit("spark", 0L, 1L), TermHit("spark", 500000L, 2L),
      TermHit("flink", 0L, 3L))
    land(b1)
    runAvailable(landing, s"$base/ckpt", outDir)
    val after1 = latestPerTerm(outDir)
    assert(after1 == referenceFold(b1))
    // 1.0 decayed half a half-life + 1.0: 1e6/sqrt(2) + 1e6
    assert(after1("spark").weightMicro ==
      math.round(1000000L * math.pow(0.5, 0.5)) + 1000000L)

    // batch 2 (new run, same checkpoint): decay continues from state
    val b2 = Seq(TermHit("spark", 2500000L, 4L))
    land(b2)
    runAvailable(landing, s"$base/ckpt", outDir)
    val after2 = latestPerTerm(outDir)
    assert(after2 == referenceFold(b1 ++ b2))
    // two full half-lives after the last update: w/4 + 1
    assert(after2("spark").weightMicro ==
      math.round(after1("spark").weightMicro / 4.0) + 1000000L)
    assert(after2("flink") == after1("flink"),
      "untouched term state unchanged")

    // idle re-run: no new rows emitted (no duplicate emission)
    val before = spark.read.parquet(outDir).count()
    runAvailable(landing, s"$base/ckpt", outDir)
    assert(spark.read.parquet(outDir).count() == before)
  } }
}
