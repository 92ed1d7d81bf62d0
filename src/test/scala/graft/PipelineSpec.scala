package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.news.{ArticleSources, Enrichment, NewsTransform, Schemas,
  StubScorer, StubTranslator}
import graft.sources.Warehouse

/** End-to-end integration of the reference's two DAG entry points
  * (SURVEY.md §3.1 News_Ingestion, §3.2 Sentiment_Analysis) as one
  * library pipeline over fixtures: DSv2 scrape → parse → validate →
  * staging CSV → warehouse append → transformed → marts (with
  * contract checks) → translate → sentiment JSONL round-trip →
  * dashboard aggregate. Each stage's output feeds the next — what the
  * reference wires with Airflow tasks is plain driver sequencing here.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def articlePage(n: Int): String =
    s"""<html><head><title>Story $n</title>
       |<meta name="author" content="Jane Doe">
       |<meta name="date" content="2024-01-0${n % 5 + 1} 10:00:00">
       |</head><body><article><p>Politics story number $n about the
       |budget debate.</p></article></body></html>""".stripMargin

  test("ingest → marts → sentiment runs end-to-end on fixtures") {
    val base = Files.createTempDirectory("graft-pipe").toString

    // §3.1 extract: DSv2 source over a fixture outlet
    val linkPage = (1 to 4)
      .map(n => s"""<a href="/news/$n">s$n</a>""").mkString("\n")
    var reader = spark.read.format("graft-articles")
      .option("outlets", "globalnews|https://site/politics")
      .option("baseurl", "https://site")
      .option("keyword", "/news/")
      .option("narticles", "10")
      .option("page.https://site/politics", linkPage)
    (1 to 4).foreach { n =>
      reader = reader.option(s"page.https://site/news/$n", articlePage(n))
    }
    val parsed = ArticleSources.parseArticles(reader.load())
    assert(parsed.count() === 4)

    // load-shape: raw_news row-per-(article, author) with ingest_ts
    val raw = parsed.select(
      monotonically_increasing_id().as("id"),
      $"source_name", lit("ca").as("source_country"),
      lit("politics").as("category"), $"author",
      lit(null).cast("string").as("author_email"),
      lit(null).cast("string").as("author_page_url"),
      $"title", lit(null).cast("string").as("description"),
      $"url", $"publishedat", $"article_content",
      lit("left").as("bias"), lit("english").as("language"),
      to_timestamp(lit("2024-01-06 00:00:00")).as("ingest_ts"))

    // §3.1 validation gate (the Pydantic drop-not-error behavior)
    val valid = raw.filter(
      $"title".isNotNull && $"publishedat".isNotNull &&
      ($"author".isNull || $"author".rlike(Schemas.AuthorNameRe)))
    assert(valid.count() === 4)

    // staging CSV branch + warehouse append (S5/S6)
    Warehouse.writeStagingCsv(valid, Schemas.rawNews, s"$base/stage")
    val staged = Warehouse.readStagingCsv(spark, Schemas.rawNews,
      s"$base/stage")
    Warehouse.appendRaw(staged, base, "raw_news")
    val landed = spark.read.parquet(s"$base/raw_news")
    assert(landed.count() === 4)

    // dbt chain: transformed → marts, with the reference's own
    // integrity contracts (datamarts.yaml) checked on the result
    val tr = NewsTransform.transformed(landed.drop("ingest_date"),
      "2024-01-06 00:00:00")
    val articles = NewsTransform.articlesMart(tr)
    val authors = NewsTransform.authorsDim(tr)
    val bridge = NewsTransform.bridge(tr)
    assert(articles.count() === 4)
    assert(articles.select($"ARTICLE_ID").distinct().count() === 4,
      "articles mart must be unique by ARTICLE_ID")
    assert(authors.count() === 1, "one distinct author in the fixture")
    assert(bridge.count() === 4)

    // §3.2 enrichment: translate (stub), candidates → request JSONL →
    // simulated scoring → parse → recode
    val translated = Enrichment.translateFrench(landed, StubTranslator)
    assert(translated.count() === 4)
    val cand = Enrichment.sentimentCandidates(articles, "2024-01-01",
        Seq("budget"))
      .withColumn("CLEAN_CONTENT",
        Enrichment.cleanContent($"ARTICLE_CONTENT"))
    assert(cand.count() === 4, "every fixture story mentions the budget")
    val requests = Enrichment.buildRequests(cand)
    Warehouse.writeJsonl(requests, "request", s"$base/requests")
    val requestLines = Warehouse.readJsonl(spark, s"$base/requests")
    assert(requestLines.count() === 4)

    // dashboard-style aggregate over stub scores (§3.3 shape)
    val scored = cand.select($"ARTICLE_ID",
      StubScorer.score($"CLEAN_CONTENT", "mark").as("s"))
    val daily = articles.join(scored, Seq("ARTICLE_ID"))
      .groupBy(to_date($"PUBLISHEDAT").as("day"))
      .agg(round(avg($"s"), 4).as("mean_sentiment"),
        count(lit(1)).as("n"))
    assert(daily.count() === 4, "4 distinct publish days in the fixture")
    assert(daily.agg(sum($"n")).as[Long].head() === 4)
  }
}
