package graft.news

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Ingestion-edge sources (SURVEY.md §2.1 S1-S4, UD4) — the reference's
  * RSS / link-page / article scrapers re-expressed as deterministic
  * engine stages over a pluggable `Fetcher`.
  *
  * Network I/O is behind the Fetcher trait: production wires an HTTP
  * client (batched inside mapPartitions, executor-side, one client per
  * partition); tests and this zero-egress container wire a fixture map.
  * Parsing is regex-based column logic — public Spark built-ins, no
  * HTML library dependency.
  *
  * Scale note: the URL universe per run is tiny (9 sources × 10
  * articles in the reference), so the link lists live in a small
  * DataFrame; the per-URL fetch fan-out happens in executors via
  * mapPartitions, which is the piece that scales when the source list
  * does.
  */
trait Fetcher extends Serializable {
  /** Fetch a URL's body, or None on failure (failures drop the row —
    * the reference's permissive behavior, get_news.py:288-292). */
  def fetch(url: String): Option[String]
}

/** Deterministic fixture-backed fetcher. */
final class MapFetcher(pages: Map[String, String]) extends Fetcher {
  def fetch(url: String): Option[String] = pages.get(url)
}

object ArticleSources {

  /** S1 — RSS item-link extraction: `<item>...<link>URL</link>` (ref
    * get_news.py:54-68). */
  val RssLinkRe = "(?s)<item>.*?<link>\\s*([^<\\s]+)\\s*</link>"

  /** S2 — anchor-href extraction from a link page (ref utils.py:36-74). */
  val HrefRe = "href=[\"']([^\"']+)[\"']"

  /** Extract article links from fetched page bodies: regex extract-all,
    * absolutize relative hrefs, keyword filter, order-preserving dedup,
    * head-n limit (ref utils.py:36-74 + W3 n_articles). */
  def extractLinks(pages: DataFrame, linkRe: String, baseUrl: String,
      keywordFilter: Option[String], nArticles: Int): DataFrame = {
    val withLinks = pages.select(
      col("source_name"),
      posexplode(regexp_extract_all(col("body"), lit(linkRe), lit(1)))
        .as(Seq("pos", "link")))
      .withColumn("link",
        when(col("link").startsWith("http"), col("link"))
          .otherwise(concat(lit(baseUrl), col("link"))))
    val filtered = keywordFilter match {
      case Some(kw) => withLinks.filter(col("link").contains(kw))
      case None => withLinks
    }
    // order-preserving dedup (U2: first occurrence wins) then head-n
    filtered
      .groupBy(col("source_name"), col("link"))
      .agg(min(col("pos")).as("pos"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("source_name")).orderBy(col("pos"))))
      .filter(col("rn") <= nArticles)
      .select(col("source_name"), col("link"), col("pos"))
  }

  /** S3 — per-link article fetch in executors: mapPartitions over the
    * link list, one Fetcher per partition. Returns (source, url, body)
    * rows; fetch failures are dropped. */
  def fetchArticles(links: Dataset[(String, String)],
      fetcher: Fetcher): Dataset[(String, String, String)] = {
    import links.sparkSession.implicits._
    links.mapPartitions { it =>
      it.flatMap { case (source, url) =>
        fetcher.fetch(url).map(body => (source, url, body))
      }
    }
  }

  /** S3/UD4 — parse title / authors / date / text out of a fetched body
    * with the same regex-pinned approach as the cleaning layer. Authors
    * fan out one row per author (ref get_news.py:258-293 → explode). */
  def parseArticles(fetched: DataFrame): DataFrame =
    parseArticlesConfigured(fetched, Map.empty)

  /** Per-outlet extraction config as DATA, not code — the engine form
    * of the reference's manual-scraper selector config
    * (get_news_manual.py:354-424, driven by
    * config/manual_scraping_config.json, where each outlet declares
    * its own title/text/date selectors). An outlet listed here
    * overrides any extraction regex / date format; unlisted outlets
    * use the defaults. */
  final case class OutletParseConfig(
    titleRe: String = "(?s)<title>\\s*(.*?)\\s*</title>",
    authorsRe: String = "(?s)<meta name=\"author\" content=\"([^\"]*)\"",
    publishedRe: String = "(?s)<meta name=\"date\" content=\"([^\"]*)\"",
    publishedFmt: String = "yyyy-MM-dd HH:mm:ss",
    textRe: String = "(?s)<article>(.*?)</article>")

  /** S3/UD4 with per-outlet configs: the config map compiles into
    * CASE WHEN chains keyed on source_name, so per-outlet parsing
    * stays fully codegen'd column logic — adding an outlet changes
    * literals in the plan, never its shape, and the fan-out stays one
    * pass over the fetched frame. */
  def parseArticlesConfigured(fetched: DataFrame,
      configs: Map[String, OutletParseConfig]): DataFrame = {
    val default = OutletParseConfig()
    def per(f: OutletParseConfig => org.apache.spark.sql.Column)
        : org.apache.spark.sql.Column =
      configs.foldLeft(f(default)) { case (acc, (src, cfg)) =>
        when(col("source_name") === src, f(cfg)).otherwise(acc)
      }
    val title = per(c => regexp_extract(col("body"), c.titleRe, 1))
    val authorsCsv = per(c => regexp_extract(col("body"), c.authorsRe, 1))
    // try_: ANSI mode makes to_timestamp throw on malformed input;
    // the reference drops invalid rows instead (get_news.py:288-292)
    val publishedTs = per(c => try_to_timestamp(
      regexp_extract(col("body"), c.publishedRe, 1), lit(c.publishedFmt)))
    val text = per(c => regexp_replace(
      regexp_extract(col("body"), c.textRe, 1), "<[^>]+>", " "))
    fetchedWithCols(fetched, title, authorsCsv, publishedTs, text)
  }

  private def fetchedWithCols(fetched: DataFrame,
      title: org.apache.spark.sql.Column,
      authorsCsv: org.apache.spark.sql.Column,
      publishedTs: org.apache.spark.sql.Column,
      text: org.apache.spark.sql.Column): DataFrame =
    fetched
      .withColumn("title", title)
      // NULL publishedat (malformed/missing date) is kept here;
      // validation (F8) filters it downstream
      .withColumn("publishedat", publishedTs)
      .withColumn("article_content", trim(regexp_replace(text, "\\s+", " ")))
      // explode_outer: an author-less page keeps its article row with a
      // NULL author (raw_news.author is nullable; F1/validation decide
      // its fate downstream) instead of silently vanishing here
      .withColumn("author",
        explode_outer(filter(split(authorsCsv, ","), a => trim(a) =!= "")))
      .withColumn("author", trim(col("author")))
      .drop("body")

  /** S4 — author-page email lookup with editor-email de-preference
    * (ref utils.py:99-138): prefer a non-editor email when present. */
  def extractAuthorEmail(body: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val all = regexp_extract_all(body, lit(Schemas.EmailReBase), lit(0))
    val nonEditor = filter(all, e => !e.contains("editor"))
    when(size(nonEditor) > 0, element_at(nonEditor, 1))
      .otherwise(when(size(all) > 0, element_at(all, 1)))
  }
}
