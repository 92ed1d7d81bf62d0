package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => gq}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator family's named queries;
  * `oracleSql` carries the DuckDB-equivalent SQL for each (omitted only for
  * ops that aren't SQL-expressible, which the driver checks rows-only).
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (gq.Relational.queries, gq.Relational.oracles),
      (gq.Shaping.queries, gq.Shaping.oracles),
      (gq.Textual.queries, gq.Textual.oracles),
      (gq.TrainingData.queries, gq.TrainingData.oracles),
      (gq.NewsPipeline.queries, gq.NewsPipeline.oracles),
      (gq.Scale.queries, gq.Scale.oracles),
      (gq.Curation.queries, gq.Curation.oracles),
      (gq.Corpus.queries, gq.Corpus.oracles),
      (gq.Insights.queries, gq.Insights.oracles),
      (gq.Governance.queries, gq.Governance.oracles),
      (gq.Analytics.queries, gq.Analytics.oracles),
      (gq.Modeling.queries, gq.Modeling.oracles),
      (gq.Inference.queries, gq.Inference.oracles),
      (gq.Olap.queries, gq.Olap.oracles),
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    gq.Relational.revenueByNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
