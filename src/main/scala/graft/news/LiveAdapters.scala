package graft.news

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Live (network-backed) implementations of the external-service
  * seams. The engine's gate path stays hermetic — `MapFetcher`,
  * `StubTranslator`, `StubScorer` — and these adapters are what a
  * production deployment plugs in instead, config-gated via the
  * `*FromEnv` factories below:
  *
  *   - [[HttpFetcher]] — the reference's page download
  *     (get_news.py:83-112, requests.get + raise_for_status): GET,
  *     per-URL timeout, 2xx → body, anything else → None (failures
  *     drop the row — the reference's permissive behavior).
  *   - [[HttpTranslator]] — the reference's per-row googletrans call
  *     (translate_french_news.py:39-63) as a JSON POST per row. The
  *     reference loops row-by-row over a cursor; here the same per-row
  *     call runs inside executor tasks, so rows translate in parallel
  *     across partitions instead of serially on one driver.
  *   - [[HttpScorer]] — a synchronous scoring endpoint honoring the
  *     LLM prompt contract (score string '0.00'-'1.00', 'N/A' when the
  *     subject is absent; ref sentiment_batch_job_tasks.py:183).
  *   - [[BatchJobClient]] — the reference's OpenAI Batch-API
  *     orchestration (sentiment_batch_job_tasks.py:226-292): upload a
  *     JSONL request file, create a batch, poll until terminal,
  *     download the output file. Driver-side by design (the reference
  *     runs it in an Airflow task); the JSONL payloads come from the
  *     engine's S9 request sink and feed the S10 result source.
  *
  * All HTTP goes through one shared per-JVM [[HttpClient]] (it is
  * thread-safe and pools connections); adapters hold only their
  * endpoint/config strings, so closures serialize cleanly to
  * executors.
  */
object LiveAdapters {

  private[news] lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10))
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  private[news] def get(url: String, timeoutMs: Long,
      headers: Seq[(String, String)]): Option[String] =
    try {
      val b = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofMillis(timeoutMs)).GET()
      headers.foreach { case (k, v) => b.header(k, v) }
      val resp = client.send(b.build(),
        HttpResponse.BodyHandlers.ofString(StandardCharsets.UTF_8))
      if (resp.statusCode() / 100 == 2) Some(resp.body()) else None
    } catch { case _: Exception => None }

  private[news] def post(url: String, body: String, timeoutMs: Long,
      headers: Seq[(String, String)]): Option[String] =
    try {
      val b = HttpRequest.newBuilder(URI.create(url))
        .timeout(Duration.ofMillis(timeoutMs))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(body,
          StandardCharsets.UTF_8))
      headers.foreach { case (k, v) => b.header(k, v) }
      val resp = client.send(b.build(),
        HttpResponse.BodyHandlers.ofString(StandardCharsets.UTF_8))
      if (resp.statusCode() / 100 == 2) Some(resp.body()) else None
    } catch { case _: Exception => None }

  /** Minimal JSON string-field accessors — enough for the small fixed
    * envelopes these services speak (one level, string values). */
  private[graft] def jsonStr(field: String, json: String): Option[String] = {
    val re = ("\"" + java.util.regex.Pattern.quote(field) +
      "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
    re.findFirstMatchIn(json).map(m => unescape(m.group(1)))
  }

  private[graft] def escape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < 0x20 => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private[graft] def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb += '\n'; i += 2
          case 'r' => sb += '\r'; i += 2
          case 't' => sb += '\t'; i += 2
          case 'u' if i + 5 < s.length + 1 =>
            sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
            i += 6
          case other => sb += other; i += 2
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  /** Config-gated wiring: live adapters only when their endpoint env
    * var is set, deterministic stubs otherwise (the test/gate path).
    *   GRAFT_FETCHER_LIVE=1        → HttpFetcher for scraping
    *   GRAFT_TRANSLATOR_URL=<url>  → HttpTranslator
    *   GRAFT_SCORER_URL=<url>      → HttpScorer
    */
  def fetcherFromEnv(fixtures: Map[String, String]): Fetcher =
    if (sys.env.get("GRAFT_FETCHER_LIVE").contains("1")) new HttpFetcher()
    else new MapFetcher(fixtures)

  def translatorFromEnv: Translator =
    sys.env.get("GRAFT_TRANSLATOR_URL")
      .map(new HttpTranslator(_)).getOrElse(StubTranslator)

  def scorerFromEnv: SentimentScorer =
    sys.env.get("GRAFT_SCORER_URL")
      .map(new HttpScorer(_)).getOrElse(StubScorer)
}

/** Live page fetcher (ref get_news.py:83-112). GET with a polite
  * User-Agent; non-2xx / network errors / timeouts → None, so failed
  * URLs drop exactly as the fixture path does. Runs executor-side
  * inside `ArticleSources.fetchArticles`'s mapPartitions. */
final class HttpFetcher(timeoutMs: Long = 15000,
    userAgent: String = "graft-news/1.0") extends Fetcher {
  def fetch(url: String): Option[String] =
    LiveAdapters.get(url, timeoutMs, Seq("User-Agent" -> userAgent))
}

/** Live translator: per-row POST `{"q": text, "source": "fr",
  * "target": "en"}` → `{"translatedText": ...}` (the LibreTranslate
  * wire shape — a public, self-hostable contract; the reference's
  * googletrans speaks an equivalent per-row request,
  * translate_french_news.py:39-63). Service failure falls back to the
  * original text: a translation outage must not null out the corpus
  * (the reference crashes the task instead; dropping data is worse
  * than keeping French rows for a retry pass). */
final class HttpTranslator(endpoint: String, timeoutMs: Long = 20000)
    extends Translator {
  private val fn = (text: String) =>
    if (text == null) null
    else LiveAdapters.post(endpoint,
        s"""{"q":"${LiveAdapters.escape(text)}","source":"fr","target":"en"}""",
        timeoutMs, Nil)
      .flatMap(LiveAdapters.jsonStr("translatedText", _))
      .getOrElse(text)
  def translate(c: Column): Column = udf(fn).apply(c)
}

/** Live sentiment scorer: POST `{"text":..., "subject":...}` →
  * `{"score":"0.73"}` (or `"N/A"`). Honors the prompt contract
  * client-side too: a subject that never appears in the text is 'N/A'
  * without a network call — same short-circuit the stub applies, and
  * at 100 TB the mention filter upstream (F5) means the service only
  * ever sees candidate rows. Service failure → 'N/A' (the recode path
  * S7 already maps 'N/A' to NULL downstream). */
final class HttpScorer(endpoint: String, timeoutMs: Long = 20000)
    extends SentimentScorer {
  def score(text: Column, subject: String): Column = {
    val fn = (t: String) =>
      if (t == null || !t.contains(subject)) "N/A"
      else LiveAdapters.post(endpoint,
          s"""{"text":"${LiveAdapters.escape(t)}","subject":"${LiveAdapters.escape(subject)}"}""",
          timeoutMs, Nil)
        .flatMap(LiveAdapters.jsonStr("score", _))
        .getOrElse("N/A")
    udf(fn).apply(text)
  }
}

/** Asynchronous batch-job orchestration, the reference's OpenAI Batch
  * flow made concrete (sentiment_batch_job_tasks.py:226-292):
  *
  *   1. `POST {base}/files` with the JSONL request payload → file id
  *   2. `POST {base}/batches` `{"input_file_id": ...}` → batch id
  *   3. `GET {base}/batches/{id}` until status is terminal
  *      ("completed" → output_file_id; "failed"/"expired"/"cancelled"
  *      → error)
  *   4. `GET {base}/files/{id}/content` → result JSONL
  *
  * Driver-side single-threaded by design — the payload is one small
  * JSONL file per day-batch (the engine's S9 sink), not data-plane
  * traffic. The result string feeds `Enrichment.parseResults` (S10). */
final class BatchJobClient(baseUrl: String, apiKey: Option[String] = None,
    timeoutMs: Long = 30000) {
  private def auth: Seq[(String, String)] =
    apiKey.map(k => "Authorization" -> s"Bearer $k").toSeq

  def uploadFile(jsonl: String): Option[String] =
    LiveAdapters.post(s"$baseUrl/files",
        s"""{"purpose":"batch","content":"${LiveAdapters.escape(jsonl)}"}""",
        timeoutMs, auth)
      .flatMap(LiveAdapters.jsonStr("id", _))

  def createBatch(fileId: String): Option[String] =
    LiveAdapters.post(s"$baseUrl/batches",
        s"""{"input_file_id":"$fileId","endpoint":"/v1/chat/completions","completion_window":"24h"}""",
        timeoutMs, auth)
      .flatMap(LiveAdapters.jsonStr("id", _))

  /** Poll to a terminal state; Right(outputFileId) on completion,
    * Left(status) on failure/timeout. */
  def pollUntilDone(batchId: String, pollEveryMs: Long = 1000,
      maxPolls: Int = 120): Either[String, String] = {
    var n = 0
    while (n < maxPolls) {
      LiveAdapters.get(s"$baseUrl/batches/$batchId", timeoutMs, auth) match {
        case Some(body) =>
          LiveAdapters.jsonStr("status", body) match {
            case Some("completed") =>
              return LiveAdapters.jsonStr("output_file_id", body)
                .toRight("completed-without-output")
            case Some(s @ ("failed" | "expired" | "cancelled")) =>
              return Left(s)
            case _ => () // validating / in_progress / finalizing
          }
        case None => () // transient poll failure: keep polling
      }
      n += 1
      if (n < maxPolls) Thread.sleep(pollEveryMs)
    }
    Left("poll-timeout")
  }

  def downloadFile(fileId: String): Option[String] =
    LiveAdapters.get(s"$baseUrl/files/$fileId/content", timeoutMs, auth)

  /** The full reference flow: upload → create → poll → download. */
  def runBatch(jsonl: String, pollEveryMs: Long = 1000,
      maxPolls: Int = 120): Either[String, String] =
    for {
      fid <- uploadFile(jsonl).toRight("upload-failed")
      bid <- createBatch(fid).toRight("create-failed")
      out <- pollUntilDone(bid, pollEveryMs, maxPolls)
      body <- downloadFile(out).toRight("download-failed")
    } yield body
}
