package graft

import org.apache.spark.sql.functions._
import graft.plans.PlanQuality

/** Negative controls for the suite-wide BNLJ gate: the classifier must
  * FLAG a corpus-shaped nested loop and CLEAR each documented reducing
  * shape, otherwise the PlanSpec sweep is a gate that can never fail. */
class PlanQualitySpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame) = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try df.queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("corpus-shaped BNLJ build side is flagged") {
    val docs = Tables(spark, sfDir, "documents").select($"doc_id")
    val other = Tables(spark, sfDir, "documents")
      .select($"doc_id".as("other_id"), length($"text").as("len"))
    // non-equi condition forces BNLJ; the build side is a raw
    // projection of the corpus — exactly the 100 TB OOM shape
    val bad = docs.join(broadcast(other), $"doc_id" < $"other_id")
    val p = planOf(bad)
    assert(PlanQuality.bnljBuilds(p).nonEmpty, s"expected a BNLJ:\n$p")
    assert(PlanQuality.unreducedBnljs(p) > 0,
      "a corpus-shaped broadcast side must be flagged")
  }

  test("reducing shapes clear the gate: aggregate, limit, point filter") {
    val docs = Tables(spark, sfDir, "documents").select($"doc_id")
    val viaAgg = Tables(spark, sfDir, "documents")
      .agg(max(length($"text")).as("mx"))
    val viaLimit = Tables(spark, sfDir, "documents")
      .select($"doc_id".as("o"), length($"text").as("len")).limit(5)
    val viaFilter = Tables(spark, sfDir, "documents")
      .filter($"doc_id" === 0L).select($"doc_id".as("o"))
    for (small <- Seq(viaAgg, viaLimit, viaFilter)) {
      val df = docs.crossJoin(broadcast(small))
      val p = planOf(df)
      assert(PlanQuality.bnljBuilds(p).nonEmpty, s"expected a BNLJ:\n$p")
      assert(PlanQuality.unreducedBnljs(p) == 0,
        s"reduced build side must not be flagged:\n$p")
    }
  }

  test("cartesian product is counted") {
    val a = Tables(spark, sfDir, "region").select($"r_regionkey")
    val b = Tables(spark, sfDir, "nation").select($"n_nationkey")
    val prevT = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = planOf(a.crossJoin(b))
      assert(PlanQuality.cartesians(p) == 1, s"expected cartesian:\n$p")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevT)
  }

  test("dynamic partition pruning fires on a date-partitioned mart " +
    "joined through a filtered dimension") {
    // the 100 TB shape: a fact laid out by ingest date (the Warehouse
    // mart convention) joined to a dimension whose FILTER — not the
    // fact's own predicates — decides which partitions matter. DPP
    // must inject the dim's key set as a runtime partition filter so
    // the scan reads only the matching date directories.
    val base = java.nio.file.Files
      .createTempDirectory("graft-dpp").toString
    Tables(spark, sfDir, "orders")
      .withColumn("order_date", to_date($"o_orderdate"))
      .write.partitionBy("order_date").parquet(s"$base/fact")
    // dim: one row per date, filtered to a single month
    Tables(spark, sfDir, "orders")
      .select(to_date($"o_orderdate").as("d")).distinct()
      .withColumn("tag", lit("keep"))
      .write.parquet(s"$base/dim")
    val fact = spark.read.parquet(s"$base/fact")
    val dim = spark.read.parquet(s"$base/dim")
      .filter($"d" >= "1996-01-01" && $"d" < "1996-02-01")
    val joined = fact.join(dim, $"order_date" === $"d")
      .groupBy($"tag").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamicpruning subquery on the fact scan:\n$plan")
    // and the pruned result is correct (only January 1996 orders)
    val n = joined.collect().head.getAs[Long]("n")
    val expected = Tables(spark, sfDir, "orders")
      .filter($"o_orderdate" >= "1996-01-01" &&
        $"o_orderdate" < "1996-02-01").count()
    assert(n == expected, s"DPP changed the result: $n vs $expected")
  }
}
