package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.AsOfTopK
import graft.streaming.AsOfTopK.{Attribution, MixedEvent}

/** Streaming as-of top-k parity (r7 VERDICT item 6): the
  * flatMapGroupsWithState last-K-clicks operator must produce exactly
  * the multiset batch q474 computes over the same events — across a
  * checkpoint restart, with the second half of the feed arriving in a
  * separate stream run (so cross-restart state carries chunk-1 clicks
  * into chunk-2 purchases). */
class AsOfTopKSpec extends SparkSpec {
  import spark.implicits._

  private def runAvailable(landing: String, checkpoint: String,
      outDir: String): Unit = {
    val src = spark.readStream
      .schema("user_id LONG, tsus LONG, event_id LONG, is_click BOOLEAN")
      .parquet(landing).as[MixedEvent]
    val q = AsOfTopK.attributeStream(src, 3)
      .writeStream.format("parquet")
      .option("path", outDir)
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("streamed attributions across a checkpoint restart equal " +
    "batch q474's multiset") {
    val base = Files.createTempDirectory("asoftopk").toString
    val landing = s"$base/landing"
    val outDir = s"$base/out"

    val mixed = Tables(spark, sfDir, "events")
      .filter($"event_type".isin("click", "purchase"))
      .select($"user_id", unix_micros($"ts").as("tsus"), $"event_id",
        ($"event_type" === "click").as("is_click"))
    // time-split feed: chunk 1 = first half of event time, chunk 2 =
    // rest. Global time split preserves per-user order across runs.
    val mid = mixed.agg(
      expr("percentile_approx(tsus, 0.5)")).head().getLong(0)

    mixed.filter($"tsus" <= mid).coalesce(1)
      .write.mode("append").parquet(landing)
    runAvailable(landing, s"$base/ckpt", outDir)

    // restart: second half lands, same checkpoint — chunk-1 clicks
    // must attribute chunk-2 purchases out of restored state
    mixed.filter($"tsus" > mid).coalesce(1)
      .write.mode("append").parquet(landing)
    runAvailable(landing, s"$base/ckpt", outDir)

    val streamed = spark.read.parquet(outDir).as[Attribution]
      .collect().map(a =>
        (a.purchase_id, a.user_id, a.rank_back, a.click_id, a.gap_us))
      .sorted.toSeq
    val batch = queries.Scale.asofTopK(spark, sfDir)
      .select($"purchase_id", $"user_id", $"rank_back".cast("int"),
        $"click_id", $"gap_us")
      .as[(Long, Long, Int, Long, Long)].collect().sorted.toSeq
    assert(batch.nonEmpty, "batch q474 returned nothing at test SF")
    assert(streamed == batch,
      s"streamed ${streamed.size} vs batch ${batch.size} attributions; " +
        s"first diff: ${streamed.zip(batch).find(p => p._1 != p._2)}")
    CheckpointHygiene.release(spark)
  }
}
