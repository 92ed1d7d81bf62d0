package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided synthetic tables (TESTDATA.md).
  *
  * Single IO entry point so every query reads through the same code path:
  * parquet scans that Catalyst can prune/push filters into. At cluster
  * scale the same call works on a directory of many files; nothing here
  * assumes single-file layout.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Tables whose queries are per-row CPU-heavy (tokenization, regex,
    * vector math). Their parquet files are single row-groups — Spark
    * cannot split below a row-group, so without an explicit repartition
    * every downstream operator runs on ONE core (measured: q45 5.6 s →
    * 0.9 s at local[32]). The shuffle is a few thousand small rows —
    * noise next to the 30× compute spread. */
  private val CpuHeavy = Set("documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts has shipped under two physical encodings across testdata
    // generations: INT64 TIMESTAMP(NANOS) (Spark 4 rejects it outright
    // without the legacy conf; read as nanos long, truncate to µs — the
    // same truncation DuckDB applies casting ns → timestamp) and plain
    // timestamp[us] (Spark reads TIMESTAMP_NTZ). Normalize both to
    // session-TZ TimestampType; the session TZ is pinned UTC, so the
    // NTZ→TZ cast is lossless and micros agree with DuckDB.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val ts = df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
    if (CpuHeavy(name)) ts.repartition(spark.sparkContext.defaultParallelism)
    else ts
  }
}
