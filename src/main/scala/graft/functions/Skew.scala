package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter join keys (SURVEY.md §4: the
  * author-ish backfill keys are dominated by NULL/agency authors).
  *
  * AQE's skew-join split handles sort-merge skew at runtime; explicit
  * salting is for the cases AQE can't touch — skewed aggregations and
  * broadcast-ineligible dimension joins. The pattern:
  *   fact side:  salt = pmod(hash(entire row id), S) appended to the key
  *   dim side:   replicated S× with salt 0..S-1
  * Each heavy key's rows spread over S reducers instead of one.
  */
object Skew {

  /** Left (large, skewed) ⋈ right (small-ish, replicated) on `key`,
    * spreading each key over `saltFactor` partitions. */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    // right/full outer would emit one null-extended row PER SALT for
    // unmatched replicated right rows — only left-preserving joins are
    // semantically safe under replication
    require(joinType == "inner" || joinType == "left" ||
      joinType == "left_outer" || joinType == "leftouter",
      s"saltedEquiJoin supports inner/left joins only, got $joinType")
    val salted = left.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltFactor)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Skew-safe aggregation: two-phase groupBy where phase 1 pre-combines
    * per (key, salt) and phase 2 merges per key. Use when one key holds
    * a large share of rows and partial aggregation alone can't spread
    * the reduce side. Aggregations must be algebraic (sum/count/min/max
    * re-aggregatable). */
  def saltedCount(df: DataFrame, key: String, saltFactor: Int): DataFrame =
    df.withColumn("__salt",
        pmod(spark_partition_id() + monotonically_increasing_id(),
          lit(saltFactor)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("cnt"))
}
