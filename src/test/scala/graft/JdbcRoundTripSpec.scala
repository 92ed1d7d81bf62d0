package graft

import org.apache.spark.sql.functions._
import graft.sources.Warehouse

/** S6/S8 over a REAL JDBC database: embedded Derby (in-process, ships
  * with Spark's jars) stands in for the reference's Postgres — write
  * raw_news through the JDBC sink, read it back through the JDBC
  * source, and prove the predicate reaches the remote WHERE clause
  * (PushedFilters in the scan node), plus the parallel range-bounded
  * read splits into the requested partitions with no row lost.
  * Reference: newsairflowtasks.py:73-95 (COPY load),
  * sentiment_batch_job_tasks.py:46-60 (parameterized read). */
class JdbcRoundTripSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dbDir = {
    val d = java.nio.file.Files.createTempDirectory("graft-derby")
    // keep derby.log out of the repo working directory
    System.setProperty("derby.system.home", d.toString)
    d
  }
  private lazy val url = s"jdbc:derby:$dbDir/newsdb;create=true"

  private def rawNews = (1 to 120).map { i =>
    (i.toLong, s"outlet${i % 5}", s"headline $i",
      java.sql.Date.valueOf(f"2024-01-${i % 28 + 1}%02d"),
      (i % 7).toDouble / 7.0)
  }.toDF("article_id", "source", "title", "publishedat", "sentiment")

  test("JDBC round-trip: write to Derby, read back row-identical") {
    Warehouse.writeJdbc(rawNews, url, "raw_news", connections = 2,
      columnTypes = Some("source VARCHAR(32), title VARCHAR(128)"))
    val back = Warehouse.readJdbc(spark, url, "raw_news")
    assert(back.count() === 120)
    val want = rawNews.collect().map(_.toSeq).toSet
    val got = back.collect().map(_.toSeq).toSet
    assert(got === want, "rows diverged across the JDBC round-trip")
  }

  test("JDBC read pushes filters into the remote scan") {
    val q = Warehouse.readJdbc(spark, url, "raw_news")
      .filter($"article_id" > 50L)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") &&
      plan.contains("GreaterThan(article_id,50)"),
      s"filter did not push into the JDBC scan:\n$plan")
    assert(q.count() === 70)
  }

  test("parallel range-bounded JDBC read: N partitions, no row lost") {
    val back = Warehouse.readJdbcPartitioned(spark, url, "raw_news",
      "article_id", lower = 1L, upper = 120L, numPartitions = 4)
    assert(back.rdd.getNumPartitions === 4)
    assert(back.count() === 120)
    assert(back.agg(sum($"article_id")).as[Long].head() ===
      (1L to 120L).sum)
  }
}
