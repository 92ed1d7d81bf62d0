package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.functions.{Dedup, TextOps}
import graft.streaming.StreamingNearDup
import graft.streaming.StreamingNearDup.Cand

/** Continuous LSH near-dup at ingest: streamed candidate pairs across
  * micro-batches must equal the batch operator's pairs over the same
  * corpus — including pairs arriving within one micro-batch, across
  * micro-batches, and idempotence under re-ingest of an already-seen
  * doc id. */
class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    1L -> ("the quick brown fox jumps over the lazy dog " +
      "and keeps on running through the quiet field"),
    2L -> ("the quick brown fox jumps over the lazy dog " +
      "and keeps on running through the quiet field tonight"),
    3L -> "completely unrelated text about parquet row groups and scans",
    // same-batch twin of 1 (arrives with it in batch 1)
    4L -> ("the quick brown fox jumps over the lazy dog " +
      "and keeps on running through the quiet field"),
    // cross-batch twin of 3 (arrives in batch 2)
    5L -> "completely unrelated text about parquet row groups and scan"
  )

  private def withShingles(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")
      .select($"doc_id",
        TextOps.shinglesFromTokens(TextOps.tokens($"text"), 3)
          .as("sh_set"))

  test("streamed LSH candidates equal batch candidates and re-ingest " +
    "is idempotent") {
    val base = Files.createTempDirectory("graft-snd").toString
    val landing = s"$base/landing"
    val b1 = texts.filter(_._1 <= 4)
    val b2 = texts.filter(_._1 == 5L) :+ (1L -> texts.toMap.apply(1L))
    b1.toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(landing)
    b2.toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(landing)

    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(landing)
      .select($"doc_id",
        TextOps.shinglesFromTokens(TextOps.tokens($"text"), 3)
          .as("sh_set"))
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, "org.apache.spark.sql.execution." +
      "streaming.state.RocksDBStateStoreProvider")
    try {
      val q = StreamingNearDup
        .run(StreamingNearDup.bucketRows(stream, "doc_id", "sh_set"))
        .writeStream.format("memory").queryName("snd_pairs")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set(providerKey, p)
        case None => spark.conf.unset(providerKey)
      }
    }
    val streamed = spark.table("snd_pairs").as[Cand].collect()
      .map(c => (c.docA, c.docB)).toSet

    // batch reference over the distinct corpus (doc 1 ingested once)
    val sigs = Dedup.minhashFromShingleSets(
      withShingles(texts), "doc_id", "sh_set", 64)
    val batch = Dedup.lshCandidates(Dedup.lshBands(sigs, 64, 4))
      .as[(Long, Long)].collect().toSet

    assert(streamed === batch,
      s"streamed=$streamed\nbatch=$batch")
    // the twins really are found, across both arrival patterns
    assert(streamed.contains((1L, 4L)), "same-batch twin pair")
    assert(streamed.contains((3L, 5L)), "cross-batch twin pair")
    // exactly-once per SHARED BUCKET (the documented emission
    // contract), which also proves re-ingest idempotence: doc 1's
    // re-arrival in batch 2 must add zero emissions. The expected
    // multiset is the batch band table's per-pair shared-bucket count.
    val bandTbl = Dedup.lshBands(sigs, 64, 4)
      .select($"doc_id",
        shiftleft($"band_hash", 4).bitwiseOR($"band").as("bucket"))
    val expectedCounts = bandTbl.as("a")
      .join(bandTbl.as("b"), col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .count()
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, n) => (a, b) -> n }.toMap
    val streamedCounts = spark.table("snd_pairs").as[Cand].collect()
      .groupBy(c => (c.docA, c.docB))
      .map { case (k, v) => k -> v.size.toLong }
    assert(streamedCounts === expectedCounts,
      "one emission per shared bucket, none added on re-ingest")
  }

  test("per-row signature lanes equal the batch minhash aggregation") {
    val docs = withShingles(texts)
    val batch = Dedup.minhashFromShingleSets(docs, "doc_id", "sh_set", 64)
    // bucketRows folds lanes into band hashes; comparing the band
    // tables directly pins the per-row lane arithmetic to the batch
    // aggregation lane for lane
    val batchBands = Dedup.lshBands(batch, 64, 4)
      .select($"doc_id",
        shiftleft($"band_hash", 4).bitwiseOR($"band").as("bucket"))
      .as[(Long, Long)].collect().toSet
    val rowBands = StreamingNearDup.bucketRows(docs, "doc_id", "sh_set")
      .collect().map(b => (b.docId, b.bucket)).toSet
    assert(rowBands === batchBands)
  }
}
