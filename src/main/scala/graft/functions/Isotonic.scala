package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed isotonic regression (pool-adjacent-violators) — the
  * monotone-calibration primitive (score → probability curves that a
  * ranking pipeline can threshold without inversions).
  *
  * The L2 isotonic fit over x-ordered buckets equals the left-to-right
  * slope sequence of the GREATEST CONVEX MINORANT of the cumulative
  * plot P_i = (Σn, Σy) (Barlow et al. 1972) — so instead of the
  * inherently sequential PAV pooling loop, the fit is a convex hull of
  * an x-sorted point set, and hulls distribute: the lower hull of the
  * union of x-disjoint strips is a subset of the union of per-strip
  * lower hulls, so one `mapPartitions` monotone-chain pass per range
  * partition (imperative hull code is the legitimate use of the
  * mapPartitions escape hatch — no relational form computes a hull)
  * followed by ONE single-task chain over the O(hull) survivors gives
  * the exact global hull. The final task sees only hull points of the
  * value-grid-bounded frame, not the corpus.
  *
  * Arithmetic: hull orientation tests are exact BigInt cross products
  * (cn·cy products overflow a long past ~3e9 rows); segment slopes are
  * exact rationals Δcy/Δcn, micro-quantized by integral division.
  * Because quantization is monotone it commutes with min/max, so the
  * quantized slopes equal the quantized minimax characterization
  * max_{j≤i} min_{k≥i} avg(y on (j,k]) — which is what the DuckDB
  * oracle computes cubically at gate SF. Collinear hull points merge
  * (the chain pops on cross ≤ 0), which only widens pools — the fitted
  * function is identical.
  */
object Isotonic {

  /** Lower-hull monotone chain over cn-ascending points. */
  private def chain(
      it: Iterator[(Long, Long)]): Iterator[(Long, Long)] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    for (p <- it) {
      while (buf.size >= 2 && {
        val a = buf(buf.size - 2); val b = buf(buf.size - 1)
        (BigInt(b._1 - a._1) * BigInt(p._2 - a._2)
          - BigInt(b._2 - a._2) * BigInt(p._1 - a._1)) <= 0
      }) buf.remove(buf.size - 1)
      buf += p
    }
    buf.iterator
  }

  /** GCM segments of the cumulative plot. `cum` needs (cn, cy): the
    * INCLUSIVE cumulative count / label-sum per bucket, origin (0,0)
    * appended by this method. Returns (cn_start, cn_end, dy, dn) — one
    * row per hull segment, slopes strictly increasing. */
  def gcmSegments(cum: DataFrame, parts: Int = -1): DataFrame = {
    val ss = cum.sparkSession
    import ss.implicits._
    val pts = cum.select(col("cn").cast("long"), col("cy").cast("long"))
      .as[(Long, Long)]
      .union(ss.createDataset(Seq((0L, 0L))).toDF("cn", "cy")
        .as[(Long, Long)])
    // columns are (cn, cy) up to the first mapPartitions, (_1, _2)
    // after it (typed re-serialization renames)
    val local: Dataset[(Long, Long)] = pts
      .repartitionByRange(ScaleWindows.resolveParts(cum, parts), col("cn"))
      .sortWithinPartitions(col("cn"))
      .mapPartitions(chain)
    local.repartition(1).sortWithinPartitions(col("_1"))
      .mapPartitions { it =>
        val h = chain(it).toArray
        h.sliding(2).collect { case Array(a, b) =>
          (a._1, b._1, b._2 - a._2, b._1 - a._1)
        }
      }
      .toDF("cn_start", "cn_end", "dy", "dn")
  }

  /** Isotonic fit: `buckets` = (x, n, sy) with x the grid key, n > 0
    * the bucket size, sy the label sum. Adds `fitted_micro` — the
    * monotone least-squares rate in exact integral micros. The
    * segment→bucket assignment is a [[ScaleWindows.rangeLastCarry]]
    * step join keyed on the cumulative count (query rows sort BEFORE
    * segments at equal key: a bucket whose cn equals a segment start
    * is the END point of the previous segment). */
  def fit(buckets: DataFrame, parts: Int = -1): DataFrame = {
    val cum = ScaleWindows.rangeCumSums(buckets,
        Seq(col("x").asc), Seq(col("n") -> "cn0", col("sy") -> "cy0"),
        parts)
      .withColumn("cn", col("cn0") + col("n"))
      .withColumn("cy", col("cy0") + col("sy"))
      .drop("cn0", "cy0")
    val seg = gcmSegments(cum.select(col("cn"), col("cy")), parts)
      .withColumn("slope_micro",
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * dy" +
          " div CAST(dn AS DECIMAL(38,0)) AS BIGINT)"))
    val q = cum.select(col("x").cast("long").as("x"),
      col("n").cast("long").as("n"), col("sy").cast("long").as("sy"),
      col("cn"), lit(0).as("tag"), lit(null).cast("long").as("sv"))
    val sgs = seg.select(col("cn_start").as("cn"), lit(1).as("tag"),
      col("slope_micro").as("sv"), lit(null).cast("long").as("x"),
      lit(null).cast("long").as("n"), lit(null).cast("long").as("sy"))
    ScaleWindows.rangeLastCarry(q.unionByName(sgs),
        Seq(col("cn"), col("tag")), col("sv"), "fitted_micro", parts)
      .filter(col("tag") === 0)
      .select(col("x"), col("n"), col("sy"), col("fitted_micro"))
  }
}
