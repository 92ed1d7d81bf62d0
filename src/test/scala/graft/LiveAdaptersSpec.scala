package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._

import graft.news._

/** Live-adapter seams against a real local HTTP server (JDK built-in
  * com.sun.net.httpserver — no new dependencies): the network clients a
  * production deployment plugs into the `Fetcher` / `Translator` /
  * `SentimentScorer` traits, plus the reference's batch create/poll/
  * retrieve orchestration (sentiment_batch_job_tasks.py:226-292). The
  * oracle gate never touches these — fixtures/stubs remain the
  * hermetic path — but each adapter is exercised end to end over a
  * socket here, including the failure modes (non-2xx, malformed
  * payloads, slow polls). */
class LiveAdaptersSpec extends SparkSpec {
  import spark.implicits._

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(code, b.length)
    ex.getResponseBody.write(b)
    ex.close()
  }

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

  private def withServer[T](routes: (String, HttpExchange => Unit)*)
      (f: String => T): T = {
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, h) =>
      srv.createContext(path, (ex: HttpExchange) => h(ex))
    }
    srv.start()
    try f(s"http://127.0.0.1:${srv.getAddress.getPort}")
    finally srv.stop(0)
  }

  test("HttpFetcher: 200 body returned, 404 and dead socket drop") {
    withServer(
      "/ok" -> (ex => respond(ex, 200, "<html>hello graft</html>")),
      "/gone" -> (ex => respond(ex, 404, "nope"))
    ) { base =>
      val fetcher = new HttpFetcher(timeoutMs = 5000)
      assert(fetcher.fetch(s"$base/ok").contains("<html>hello graft</html>"))
      assert(fetcher.fetch(s"$base/gone").isEmpty)
      assert(fetcher.fetch("http://127.0.0.1:1/dead").isEmpty)
    }
  }

  test("HttpFetcher drives the executor-side fetch seam end to end") {
    withServer(
      "/a" -> (ex => respond(ex, 200, "Body A")),
      "/b" -> (ex => respond(ex, 500, "boom"))
    ) { base =>
      val links = Seq(("src", s"$base/a"), ("src", s"$base/b")).toDS()
      val out = ArticleSources
        .fetchArticles(links, new HttpFetcher(timeoutMs = 5000))
        .collect().map { case (_, url, body) => url -> body }.toMap
      assert(out == Map(s"$base/a" -> "Body A")) // failed URL dropped
    }
  }

  test("HttpTranslator: per-row POST translates; outage keeps original") {
    withServer(
      "/tr" -> { ex =>
        val q = LiveAdapters.jsonStr("q", readBody(ex)).getOrElse("")
        respond(ex, 200,
          s"""{"translatedText":"EN(${LiveAdapters.escape(q)})"}""")
      }
    ) { base =>
      val tr = new HttpTranslator(s"$base/tr", timeoutMs = 5000)
      val df = Seq(
        ("bonjour \"le\" monde\nligne", "french"),
        ("already english", "english")
      ).toDF("title", "language")
        .withColumn("article_content", $"title")
      val got = Enrichment.translateFrench(df, tr)
        .select($"title", $"language").as[(String, String)]
        .collect().toMap
      // escape → wire → unescape round-trips quotes and newlines
      assert(got("EN(bonjour \"le\" monde\nligne)") == "english")
      assert(got("already english") == "english") // non-French untouched
      val dead = new HttpTranslator("http://127.0.0.1:1/tr",
        timeoutMs = 500)
      val kept = Enrichment.translateFrench(df, dead)
        .select($"title").as[String].collect().toSet
      assert(kept.contains("bonjour \"le\" monde\nligne")) // fallback
    }
  }

  test("HttpScorer: service score for mentions, N/A short-circuit " +
      "without a network call, N/A on outage") {
    val calls = new AtomicInteger(0)
    withServer(
      "/score" -> { ex =>
        calls.incrementAndGet()
        respond(ex, 200, """{"score":"0.42"}""")
      }
    ) { base =>
      val sc = new HttpScorer(s"$base/score", timeoutMs = 5000)
      val df = Seq("Trudeau spoke today", "weather was fine").toDF("text")
      val got = df.select($"text",
          sc.score($"text", "Trudeau").as("s"))
        .as[(String, String)].collect().toMap
      assert(got("Trudeau spoke today") == "0.42")
      assert(got("weather was fine") == "N/A")
      assert(calls.get() == 1) // absent subject never hit the wire
      val dead = new HttpScorer("http://127.0.0.1:1/s", timeoutMs = 500)
      val na = df.select(dead.score($"text", "Trudeau").as("s"))
        .as[String].collect().toSet
      assert(na == Set("N/A"))
    }
  }

  test("BatchJobClient: upload -> create -> poll(in_progress then " +
      "completed) -> download, and failure statuses surface") {
    val polls = new AtomicInteger(0)
    var uploaded: String = null
    withServer(
      "/files" -> { ex =>
        uploaded = LiveAdapters.jsonStr("content", readBody(ex)).orNull
        respond(ex, 200, """{"id":"file-1"}""")
      },
      "/batches" -> { ex =>
        if (ex.getRequestURI.getPath == "/batches") {
          val fid = LiveAdapters.jsonStr("input_file_id", readBody(ex))
          assert(fid.contains("file-1"))
          respond(ex, 200, """{"id":"batch-1","status":"validating"}""")
        } else if (polls.incrementAndGet() < 3)
          respond(ex, 200, """{"id":"batch-1","status":"in_progress"}""")
        else respond(ex, 200,
          """{"id":"batch-1","status":"completed","output_file_id":"file-2"}""")
      },
      "/files/file-2/content" -> (ex =>
        respond(ex, 200, """{"custom_id":"1","score":"0.9"}"""))
    ) { base =>
      val cli = new BatchJobClient(base, apiKey = Some("k"))
      // two JSONL lines with quotes, newline, backslash — the payload
      // must round-trip the wire escaping exactly
      val jsonl =
        "{\"custom_id\":\"1\",\"body\":\"t\"}\n{\"custom_id\":\"2\",\"b\":\"a\\\\b\"}"
      val out = cli.runBatch(jsonl, pollEveryMs = 10, maxPolls = 10)
      assert(out == Right("""{"custom_id":"1","score":"0.9"}"""))
      assert(uploaded == jsonl) // JSON escaping round-tripped the payload
      assert(polls.get() >= 3)  // really polled through in_progress
    }
    withServer(
      "/files" -> (ex => respond(ex, 200, """{"id":"f"}""")),
      "/batches" -> { ex =>
        if (ex.getRequestURI.getPath == "/batches")
          respond(ex, 200, """{"id":"b","status":"validating"}""")
        else respond(ex, 200, """{"id":"b","status":"failed"}""")
      }
    ) { base =>
      val cli = new BatchJobClient(base)
      assert(cli.runBatch("x", pollEveryMs = 10, maxPolls = 5)
        == Left("failed"))
    }
  }

  test("env gating picks stubs when no endpoint is configured") {
    assert(LiveAdapters.translatorFromEnv == StubTranslator)
    assert(LiveAdapters.scorerFromEnv == StubScorer)
    assert(LiveAdapters.fetcherFromEnv(Map("u" -> "b"))
      .isInstanceOf[MapFetcher])
  }
}
