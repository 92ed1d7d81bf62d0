package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Band (interval-proximity) join: all (left, right) pairs with
  * `|left.time - right.time| <= band`, with NO equality key.
  *
  * Spark plans a bare inequality join as BroadcastNestedLoopJoin —
  * O(n×m) compares, a non-starter at scale. The standard rewrite is
  * bucketization: quantize time into band-width buckets, equi-join on
  * the bucket id with the left side probing its own and both adjacent
  * buckets (any pair within `band` differs by at most one bucket), then
  * re-check the exact predicate. This turns the nested loop into a
  * shuffled hash join whose key (the bucket) is time — uniform for
  * event streams, so no skew; cost O(n + m + true-pairs).
  */
object RangeJoin {

  /** Pairs within `bandUs` microseconds. Column sets of `left` and
    * `right` must be disjoint (rename before calling). */
  def pairsWithinBand(left: DataFrame, leftTime: String,
      right: DataFrame, rightTime: String, bandUs: Long): DataFrame = {
    // integer `div`, not double `/`+floor: epoch-µs quotients near a
    // bucket boundary would be subject to FP rounding
    val lb = left
      .withColumn("_lbucket", expr(s"unix_micros($leftTime) div $bandUs"))
      .withColumn("_probe",
        explode(array(col("_lbucket") - 1, col("_lbucket"),
          col("_lbucket") + 1)))
    val rb = right.withColumn("_rbucket",
      expr(s"unix_micros($rightTime) div $bandUs"))
    lb.join(rb, col("_probe") === col("_rbucket") &&
        abs(unix_micros(col(leftTime)) - unix_micros(col(rightTime)))
          <= bandUs)
      .drop("_lbucket", "_probe", "_rbucket")
  }
}
