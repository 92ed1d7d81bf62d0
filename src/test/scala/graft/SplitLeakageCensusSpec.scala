package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.SplitLeakageCensus
import graft.streaming.SplitLeakageCensus.{CensusRow, PairRow}

/** Streaming split-leakage census parity (r9 VERDICT item 6): the
  * transformWithState census must converge to exactly batch q486's
  * (pair_class, n_pairs, share_micro) — with the pair stream split
  * across TWO stream runs over the same checkpoint, so the running
  * counts are restored from state, not recomputed. */
class SplitLeakageCensusSpec extends SparkSpec {
  import spark.implicits._

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"

  private def withRocks[T](body: => T): T = {
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
    val src = spark.readStream.schema("doc_a LONG, doc_b LONG")
      .parquet(landing).as[PairRow]
    val q = SplitLeakageCensus.run(src)
      .writeStream.format("parquet").option("path", out)
      .outputMode("append").option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("streamed census across a checkpoint restart equals batch " +
    "q486, micro shares included") {
    val batch = queries.TrainingData.splitLeakage(spark, sfDir)
      .select($"pair_class", $"n_pairs", $"share_micro")
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(batch.nonEmpty, "batch q486 returned nothing at test SF")
    val pairs = queries.TrainingData.splitLeakagePairs(spark, sfDir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
      .sorted.toSeq
    assert(pairs.size > 100, s"pair set too small: ${pairs.size}")

    val base = Files.createTempDirectory("graft-slcensus").toString
    val landing = s"$base/landing"
    val out = s"$base/out"
    val (c1, c2) = pairs.splitAt(pairs.size / 2)
    c1.toDF("doc_a", "doc_b").coalesce(1)
      .write.mode("append").parquet(landing)
    runAvailable(landing, s"$base/ckpt", out)
    // restart: the second chunk lands on the SAME checkpoint — the
    // running counts must come out of restored state
    c2.toDF("doc_a", "doc_b").coalesce(1)
      .write.mode("append").parquet(landing)
    runAvailable(landing, s"$base/ckpt", out)

    val rows = spark.read.parquet(out).as[CensusRow].collect().toSeq
    val latest = rows.groupBy(_.pair_class).map { case (k, vs) =>
      k -> vs.maxBy(_.ver).n_pairs }
    val tot = latest.values.sum
    val streamed = latest.map { case (k, n) =>
      (k, n, n * 1000000L / tot) }.toSeq.sortBy(_._1)
    assert(streamed == batch,
      s"streamed census $streamed != batch census $batch")
    // the restart actually exercised state restore: the dominant class
    // appears in both chunks, so its version must have advanced past 1
    // (small classes may land entirely in one chunk — their counts are
    // still covered by the census equality above)
    val dominant = latest.maxBy(_._2)._1
    assert(rows.filter(_.pair_class == dominant).map(_.ver).max >= 2L,
      s"class '$dominant' did not advance across the restart")
    CheckpointHygiene.release(spark)
  }
}
