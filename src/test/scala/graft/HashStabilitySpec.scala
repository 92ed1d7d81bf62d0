package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Round
import org.apache.spark.sql.types.DoubleType

/** Partitioning-perturbation hash stability for the mirrored-double
  * family (SURVEY.md q189 rule: a final float op tree mirrored
  * token-for-token in the oracle).
  *
  * The r6 regression class: a query whose last mile rounds a DOUBLE is
  * only oracle-hash-stable if every double input to that round() is
  * itself a deterministic function of exact (integral/decimal)
  * aggregates — i.e. no partial-aggregation order can leak into the
  * rounded value. This spec enforces that mechanically for EVERY
  * registry query that rounds a double anywhere in its analyzed plan:
  * run once under the default test config, once under a deliberately
  * hostile one (different reducer count, 1 MiB scan splits, AQE off),
  * and require bit-identical results.
  *
  * The family is discovered from the plan, not a hand-kept list, so a
  * new query that adds a fragile float tree is enrolled automatically.
  *
  * Known blind spot: a Round sitting UPSTREAM of a localCheckpoint is
  * invisible here (the analyzed plan shows the truncated LogicalRDD),
  * so checkpoint-trunk queries (e.g. q458's quantized pool) must pin
  * determinism with their own replay specs — q458 does.
  */
class HashStabilitySpec extends SparkSpec {

  private def roundsADouble(df: DataFrame): Boolean =
    df.queryExecution.analyzed.collectWithSubqueries {
      case p => p.expressions.flatMap(_.collect {
        case r: Round if r.child.dataType == DoubleType => r
      })
    }.flatten.nonEmpty

  private def rowsSorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("mirrored-double family: bit-identical under partitioning " +
    "perturbation (shuffle partitions, scan splits, AQE)") {
    val conf = spark.conf
    val family = SparkEntry.queries.toSeq.sortBy(_._1).filter {
      case (_, fn) =>
        try roundsADouble(fn(spark, sfDir))
        catch { case _: Throwable => false } // analysis errors surface in
                                             // the query's own spec/gate
    }
    assert(family.nonEmpty, "family discovery returned nothing — the " +
      "Round-over-double detector is broken")
    info(s"mirrored-double family: ${family.size} queries")
    val diffs = family.flatMap { case (name, fn) =>
      val base = rowsSorted(fn(spark, sfDir))
      val saved = Seq("spark.sql.shuffle.partitions",
        "spark.sql.files.maxPartitionBytes",
        "spark.sql.adaptive.enabled").map(k => k -> conf.get(k))
      try {
        conf.set("spark.sql.shuffle.partitions", "7")
        conf.set("spark.sql.files.maxPartitionBytes", "1m")
        conf.set("spark.sql.adaptive.enabled", "false")
        val perturbed = rowsSorted(fn(spark, sfDir))
        if (base == perturbed) None
        else Some(s"$name: ${base.size} vs ${perturbed.size} rows; " +
          s"first diff ${base.zip(perturbed).find(p => p._1 != p._2)}")
      } finally saved.foreach { case (k, v) => conf.set(k, v) }
    }
    assert(diffs.isEmpty,
      s"${diffs.size} mirrored-double queries drifted under partitioning " +
        s"perturbation:\n${diffs.mkString("\n")}")
    CheckpointHygiene.release(spark)
  }
}
