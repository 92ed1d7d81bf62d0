package graft.news

import org.apache.spark.sql.types._

/** Single source of truth for the news-domain schemas — replaces the
  * reference's triplicated declarations (SQLAlchemy `init_db.py:15-46`,
  * JSON template `config/scraper_output_schema.json:1-15`, Pydantic
  * `PydanticModels.py:9-29`).
  */
object Schemas {

  /** raw_news — append-only ingest log, one row per (article, author)
    * (ref init_db.py:15-33). */
  val rawNews: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("source_name", StringType, nullable = false),
    StructField("source_country", StringType),
    StructField("category", StringType, nullable = false),
    StructField("author", StringType),
    StructField("author_email", StringType),
    StructField("author_page_url", StringType),
    StructField("title", StringType, nullable = false),
    StructField("description", StringType),
    StructField("url", StringType),
    StructField("publishedat", TimestampType, nullable = false),
    StructField("article_content", StringType),
    StructField("bias", StringType),
    StructField("language", StringType),
    StructField("ingest_ts", TimestampType)))

  /** sentiment_raw — LLM scoring results (ref init_db.py:36-46). Scores
    * arrive as strings ('0.35' or 'N/A') and are recoded downstream
    * (ref stg_sentiment.sql:7-11). */
  val sentimentRaw: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("article_id", StringType, nullable = false),
    StructField("sentiment_mark", StringType),
    StructField("sentiment_poilievre", StringType),
    StructField("model", StringType),
    StructField("ingest_ts", TimestampType)))

  /** Validation rules for scraper output records (ref
    * PydanticModels.py:9-29): author name regex, email shape, required
    * fields, bias enum. */
  val AuthorNameRe = "^[A-Za-zÀ-ÖØ-öø-ÿ'\\.+ -]+$"
  /** Email shape shared by validation (anchored) and scrubbing/lookup
    * (unanchored) — ref uses the same pattern everywhere
    * (get_news.py:27, utils.py:123, sentiment_batch_job_tasks.py:86). */
  val EmailReBase = "[\\w\\.-]+@[\\w\\-]+\\.[a-zA-Z]{2,6}"
  val EmailRe = s"^$EmailReBase$$"
  val BiasValues = Seq("left", "right", "centre")
}
