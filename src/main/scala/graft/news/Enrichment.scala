package graft.news

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** External-service enrichment stages (translation, LLM sentiment)
  * behind deterministic traits so the whole pipeline runs hermetically
  * (SURVEY.md §7.1). The service calls in the reference are per-row
  * side-effecting Python (`translate_french_news.py:39-63`,
  * `sentiment_batch_job_tasks.py:165-292`); here each is a column
  * transform supplied by a pluggable implementation — a real one would
  * batch HTTP inside mapPartitions, the stub is a pure expression.
  */
trait Translator extends Serializable {
  /** Returns the translated-to-English column for `c`. */
  def translate(c: Column): Column
}

/** Deterministic stand-in: tags the text instead of calling a service. */
object StubTranslator extends Translator {
  def translate(c: Column): Column = concat(lit("[en] "), c)
}

trait SentimentScorer extends Serializable {
  /** Returns a score-string column ('0.00'-'1.00' or 'N/A') for text. */
  def score(text: Column, subject: String): Column
}

/** Deterministic stand-in: hash-derived two-decimal score, 'N/A' when the
  * subject doesn't appear in the text (mirrors the LLM prompt contract,
  * ref sentiment_batch_job_tasks.py:183). */
object StubScorer extends SentimentScorer {
  def score(text: Column, subject: String): Column =
    when(!text.contains(subject), lit("N/A"))
      .otherwise(format_number(
        (graft.functions.Hashing.hash60(concat(text, lit(subject))) % 101)
          .cast("double") / 100.0, 2))
}

object Enrichment {

  /** Translation stage (ref translate_french_news.py:17-63 + S11):
    * French rows get translated title/content and language='english';
    * other rows pass through unchanged. The reference's per-row UPDATE
    * becomes a recompute-and-overwrite projection — engine-native S11. */
  def translateFrench(raw: DataFrame, tr: Translator): DataFrame = {
    val isFr = col("language") === "french"
    raw
      .withColumn("title",
        when(isFr, tr.translate(col("title"))).otherwise(col("title")))
      .withColumn("article_content",
        when(isFr, tr.translate(col("article_content")))
          .otherwise(col("article_content")))
      .withColumn("language",
        when(isFr, lit("english")).otherwise(col("language")))
  }

  /** Sentiment-batch candidate selection (ref F5:
    * sentiment_batch_job_tasks.py:53-56): mention filter (case-sensitive),
    * min content length, recency cutoff. Subjects default to the
    * reference's two politicians. */
  def sentimentCandidates(articles: DataFrame, cutoff: String,
      subjects: Seq[String] = Seq("Carney", "Poilievre")): DataFrame =
    articles.filter(
      subjects.map(s => col("ARTICLE_CONTENT").contains(s))
        .reduce(_ || _) &&
        length(col("ARTICLE_CONTENT")) >= 20 &&
        col("PUBLISHEDAT") >= lit(cutoff).cast("timestamp"))

  /** Content cleaning before scoring (ref X6-X9:
    * sentiment_batch_job_tasks.py:82-106): strip literal backslash-n,
    * truncate at boilerplate markers, scrub emails and bare URLs. */
  def cleanContent(c: Column): Column = {
    val noNewline = replace(c, lit("\\n"), lit(""))
    val truncated = substring_index(
      substring_index(noNewline, "trending now", 1), "Trending Now", 1)
    val noEmail = regexp_replace(truncated, Schemas.EmailReBase, "")
    regexp_replace(noEmail, "www\\.[a-zA-Z0-9\\-]+\\.[\\w]{2,6}", "")
  }

  /** JSONL batch-request build (ref S9:
    * sentiment_batch_job_tasks.py:195-223): one nested request object per
    * article, custom_id = ARTICLE_ID. */
  def buildRequests(candidates: DataFrame): DataFrame =
    candidates.withColumn("request",
      to_json(struct(
        col("ARTICLE_ID").as("custom_id"),
        lit("POST").as("method"),
        lit("/v1/chat/completions").as("url"),
        struct(lit("news-scorer").as("model"),
          col("CLEAN_CONTENT").as("content")).as("body"))))

  private val messageT = StructType(Seq(
    StructField("content", StringType)))
  private val choiceT = StructType(Seq(
    StructField("message", messageT)))
  private val bodyT = StructType(Seq(
    StructField("choices", ArrayType(choiceT))))
  private val responseT = StructType(Seq(
    StructField("body", bodyT)))
  private val resultSchema = StructType(Seq(
    StructField("custom_id", StringType),
    StructField("response", responseT)))

  /** JSONL batch-result parse (ref S10:
    * sentiment_batch_job_tasks.py:258-292): nested JSON →
    * (article_id, sentiment_mark, sentiment_poilievre) score strings. */
  def parseResults(jsonl: DataFrame, jsonCol: String = "value",
      passThrough: Seq[String] = Nil): DataFrame = {
    val parsed = jsonl.select(
      (from_json(col(jsonCol), resultSchema).as("r") +:
        passThrough.map(col)): _*)
    val content = col("r.response.body.choices").getItem(0)
      .getField("message").getField("content")
    parsed.select(
      (Seq(col("r.custom_id").as("article_id"),
        get_json_object(content, "$.sentiment_mark").as("sentiment_mark"),
        get_json_object(content, "$.sentiment_poilievre")
          .as("sentiment_poilievre")) ++ passThrough.map(col)): _*)
  }

  /** Pre-load recode (ref S7: sentiment_batch_job_tasks.py:295-326):
    * 'N/A' → NULL before the sink append. */
  def recodeNA(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c, when(col(c) === "N/A", lit(null)).otherwise(col(c))))
}
