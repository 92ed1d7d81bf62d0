package graft

import org.apache.spark.sql.functions._
import graft.news.{ArticleSources, MapFetcher}

/** Inline-HTML fixture tests for the ingestion edge, mirroring the
  * reference's test_utils.py style (its fixture files are absent from
  * the repo; these fixtures derive from FIXTURES.md §3). */
class ArticleSourcesSpec extends SparkSpec {
  import spark.implicits._

  private val rss =
    """<rss><channel>
      |<item><title>A</title><link>https://site/news/a</link></item>
      |<item><title>B</title><link> https://site/news/b </link></item>
      |</channel></rss>""".stripMargin

  private val linkPage =
    """<html><body>
      |<a class="story" href="/news/one">One</a>
      |<a class="story" href="/news/two">Two</a>
      |<a class="story" href="/news/one">One again</a>
      |<a class="nav" href="/about">About</a>
      |<a class="story" href="https://site/news/three">Three</a>
      |</body></html>""".stripMargin

  private val article =
    """<html><head><title> Big Story </title>
      |<meta name="author" content="Jane Doe, Bob Li">
      |<meta name="date" content="2024-01-02 10:30:00">
      |</head><body><article><p>Hello   world</p>
      |<p>More text</p></article></body></html>""".stripMargin

  private val authorPage =
    """<html><body>Contact editor@site.com or
      |jane.doe@site.com for info</body></html>""".stripMargin

  test("S1: RSS item links extracted and trimmed") {
    val pages = Seq(("rss_src", rss)).toDF("source_name", "body")
    val links = ArticleSources.extractLinks(pages,
      ArticleSources.RssLinkRe, "https://site", None, 10)
    assert(links.select($"link").as[String].collect().toSet ==
      Set("https://site/news/a", "https://site/news/b"))
  }

  test("S2: hrefs absolutized, keyword-filtered, deduped, limited") {
    val pages = Seq(("lp", linkPage)).toDF("source_name", "body")
    val links = ArticleSources.extractLinks(pages,
      ArticleSources.HrefRe, "https://site", Some("/news/"), 2)
    val got = links.orderBy($"pos").select($"link").as[String].collect()
    // order-preserving dedup keeps first occurrence; head-2 limit
    assert(got.toSeq == Seq("https://site/news/one", "https://site/news/two"))
  }

  test("DSv2 source: one partition per outlet, agrees with the " +
    "DataFrame pipeline, prunes columns") {
    val pages = Map(
      "https://site/politics" -> linkPage,
      "https://site/news/one" -> article,
      "https://site/news/two" -> article,
      "https://other/feed" -> rss,
      "https://site/news/a" -> article)
    // (no page for /news/three or /news/b → fetch-failure rows drop)
    var reader = spark.read.format("graft-articles")
      .option("outlets",
        "lp|https://site/politics,rss_src|https://other/feed")
      .option("linkre", "href")
      .option("baseurl", "https://site")
      .option("keyword", "/news/")
      .option("narticles", "10")
    pages.foreach { case (u, b) => reader = reader.option(s"page.$u", b) }
    // only the href linkRe applies to both outlets here; the rss outlet
    // contributes via absolute <link> hrefs matched by HrefRe? No —
    // RSS <link> tags carry no href=, so rss_src yields nothing under
    // the href regex. The assertion pins that behavior too.
    val ds = reader.load()
    assert(ds.rdd.getNumPartitions == 2, "one partition per outlet")
    val got = ds.select($"source_name", $"url").as[(String, String)]
      .collect().toSet
    // DataFrame-pipeline formulation on the same fixture
    val links = ArticleSources.extractLinks(
      Seq(("lp", linkPage)).toDF("source_name", "body"),
      ArticleSources.HrefRe, "https://site", Some("/news/"), 10)
    val fetched = ArticleSources.fetchArticles(
      links.select($"source_name", $"link").as[(String, String)],
      new MapFetcher(pages))
    val expected = fetched.map(r => (r._1, r._2)).collect().toSet
    assert(got == expected,
      s"DSv2 $got must equal pipeline $expected")
    // column pruning reaches the scan: a bodyless projection must not
    // materialize article bodies
    val pruned = ds.select($"source_name", $"url")
      .queryExecution.executedPlan.toString
    assert(!pruned.contains("body"), s"body not pruned:\n$pruned")
  }

  test("DSv2 streaming: each trigger is one scrape round, offsets " +
    "resume across restarts") {
    val base = java.nio.file.Files.createTempDirectory("graft-mbs").toString
    val pages = Map(
      "https://site/politics" -> linkPage,
      "https://site/news/one" -> article,
      "https://site/news/two" -> article)
    def stream() = {
      var r = spark.readStream.format("graft-articles")
        .option("outlets", "lp|https://site/politics")
        .option("baseurl", "https://site")
        .option("keyword", "/news/")
        .option("narticles", "10")
      pages.foreach { case (u, b) => r = r.option(s"page.$u", b) }
      r.load()
    }
    def runRound(): Unit = {
      val q = stream().writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.Once())
        .start()
      q.awaitTermination()
    }
    runRound()
    val afterOne = spark.read.parquet(s"$base/out")
    assert(afterOne.count() === 2, "round 1 scrapes the two live links")
    // restart from the checkpoint: the offset advances one round and
    // the outlet is re-scraped (same pages → same articles, which the
    // downstream watermarked dedup is for)
    runRound()
    val afterTwo = spark.read.parquet(s"$base/out")
    assert(afterTwo.count() === 4, "round 2 re-scrapes, not replays")
    assert(afterTwo.select($"url").distinct().count() === 2)
  }

  test("S3: executor-side fetch drops failed URLs") {
    val fetcher = new MapFetcher(Map("u1" -> article))
    val fetched = ArticleSources.fetchArticles(
      Seq(("src", "u1"), ("src", "u404")).toDS(), fetcher)
    assert(fetched.count() == 1)
  }

  test("S3/UD4: article parse extracts title/date/text, fans out authors") {
    val fetched = Seq(("src", "u1", article))
      .toDF("source_name", "url", "body")
    val parsed = ArticleSources.parseArticles(fetched)
    val rows = parsed.select($"title", $"author", $"article_content",
      date_format($"publishedat", "yyyy-MM-dd HH:mm:ss").as("p"))
      .collect()
    assert(rows.length == 2, "one row per author")
    assert(rows.map(_.getString(1)).toSet == Set("Jane Doe", "Bob Li"))
    assert(rows.head.getString(0) == "Big Story")
    assert(rows.head.getString(2) == "Hello world More text")
    assert(rows.head.getString(3) == "2024-01-02 10:30:00")
  }

  test("robots.txt gate: disallowed links are dropped before fetch, " +
    "first-match-wins, unknown outlets pass") {
    import graft.news.RobotsGate
    val robots =
      """# politeness rules
        |User-agent: evilbot
        |Disallow: /
        |
        |User-agent: graftbot
        |User-agent: otherbot
        |Allow: /news/open/
        |Disallow: /news/
        |Disallow: /private/
        |
        |User-agent: *
        |Disallow: /private/
        |""".stripMargin
    val bodies = Seq(("outlet_a", robots)).toDF("source_name", "robots_body")
    val links = Seq(
      ("outlet_a", "https://a.com/news/open/story1"), // Allow beats later Disallow
      ("outlet_a", "https://a.com/news/paywalled/story2"), // Disallow /news/
      ("outlet_a", "https://a.com/private/x"), // Disallow /private/
      ("outlet_a", "https://a.com/sports/story3"), // no rule → allowed
      ("outlet_b", "https://b.com/private/y") // no robots for outlet → allowed
    ).toDF("source_name", "link")
    // graftbot group governs (longest agent substring match)
    val got = RobotsGate.filterAllowed(links, bodies, "Mozilla/5.0 graftbot/1.0")
      .select($"link").as[String].collect().toSet
    assert(got === Set("https://a.com/news/open/story1",
      "https://a.com/sports/story3", "https://b.com/private/y"))
    // the wildcard group governs an unknown agent: only /private/ blocked
    val wild = RobotsGate.filterAllowed(links, bodies, "randombot")
      .select($"link").as[String].collect().toSet
    assert(wild === Set("https://a.com/news/open/story1",
      "https://a.com/news/paywalled/story2",
      "https://a.com/sports/story3", "https://b.com/private/y"))
  }

  test("per-outlet selector config: two outlets parse with different " +
    "rules, unlisted outlet falls back to defaults") {
    import graft.news.ArticleSources.OutletParseConfig
    // outlet_np marks titles with h1 and dates as 'Jan 02, 2024'
    // (get_news_manual.py national_post shapes); outlet_ts uses the
    // default meta tags; outlet_x is not configured at all
    val npBody = """<html><h1 id="articleTitle">NP Story</h1>
      |<meta name="author" content="Ann NP">
      |<div class="published">Published Jan 02, 2024</div>
      |<section class="story-content"><p>np text here</p></section></html>"""
      .stripMargin
    val defBody = """<html><title>Default Story</title>
      |<meta name="author" content="Bob Def">
      |<meta name="date" content="2024-03-04 09:00:00">
      |<article><p>default text</p></article></html>""".stripMargin
    val fetched = Seq(
      ("outlet_np", "u1", npBody),
      ("outlet_ts", "u2", defBody),
      ("outlet_x", "u3", defBody)).toDF("source_name", "url", "body")
    val cfg = Map(
      "outlet_np" -> OutletParseConfig(
        titleRe = "(?s)<h1 id=\"articleTitle\">\\s*(.*?)\\s*</h1>",
        publishedRe = "(?s)Published\\s+([A-Z][a-z]{2} \\d{2}, \\d{4})",
        publishedFmt = "MMM dd, yyyy",
        textRe = "(?s)<section class=\"story-content\">(.*?)</section>"),
      "outlet_ts" -> OutletParseConfig()) // explicit defaults
    val parsed = ArticleSources.parseArticlesConfigured(fetched, cfg)
      .select($"source_name", $"title", $"author", $"article_content",
        date_format($"publishedat", "yyyy-MM-dd").as("p"))
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getString(2), r.getString(3), r.getString(4)))
      .toMap
    assert(parsed("outlet_np") ===
      (("NP Story", "Ann NP", "np text here", "2024-01-02")))
    assert(parsed("outlet_ts") ===
      (("Default Story", "Bob Def", "default text", "2024-03-04")))
    assert(parsed("outlet_x") ===
      (("Default Story", "Bob Def", "default text", "2024-03-04")))
  }

  test("S4: author email lookup de-prefers editor addresses") {
    val df = Seq(authorPage).toDF("body")
      .select(ArticleSources.extractAuthorEmail($"body").as("email"))
    assert(df.head().getString(0) == "jane.doe@site.com")
  }
}
