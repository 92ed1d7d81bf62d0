package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.news.{Enrichment, NewsTransform, Schemas, StubTranslator}

/** Fixture-driven semantics tests for the news transform layer
  * (FIXTURES.md §1 edge cases + the dbt yaml contracts of SURVEY §5). */
class NewsTransformSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Hand-built raw_news exercising every cleaning/backfill rule. */
  private lazy val fixture: DataFrame = {
    val rows = Seq(
      // id, source, author, email, url, title, aurl, publishedat, content, ingest
      Row(1L, "globalnews", "ca", "politics", "Jane Doe",
        "Jane.Doe@Example.COM\\n", "https://g/jd", "T1", null, "u1",
        ts("2024-01-03 10:00:00"), "Some content here", "left", "english",
        ts("2024-01-03 10:00:00")),
      // same article re-scraped later with an EARLIER publish date (J7)
      // and missing content (J4) + missing author url (J5)
      Row(2L, "globalnews", "ca", "politics", "  Jane Doe  ",
        "jane.doe@example.com", null, "T1", null, "u1",
        ts("2024-01-01 09:00:00"), null, "left", "english",
        ts("2024-01-04 10:00:00")),
      // NULL author → dropped (F1, PG != semantics)
      Row(3L, "globalnews", "ca", "politics", null, null, null, "T2",
        null, "u2", ts("2024-01-02 00:00:00"), "X", "left", "english",
        ts("2024-01-02 00:00:00")),
      // blacklisted author value → dropped (F1)
      Row(4L, "globalnews", "ca", "politics", "www.facebook.com", null,
        null, "T3", null, "u3", ts("2024-01-02 00:00:00"), "X", "left",
        "english", ts("2024-01-02 00:00:00")),
      // blacklisted sources → dropped (F2)
      Row(5L, "toronto_star", "ca", "politics", "Al Bo", null, null, "T4",
        null, "u4", ts("2024-01-02 00:00:00"), "X", "centre", "english",
        ts("2024-01-02 00:00:00")),
      Row(6L, "cbc", "ca", "politics", "Al Bo", null, null, "T5", null,
        "u5", ts("2024-01-02 00:00:00"), "X", "centre", "english",
        ts("2024-01-02 00:00:00")),
      // email backfill via (AUTHOR, AUTHOR_URL) tier (J6)
      Row(7L, "ctvnews", "ca", "politics", "Bob Li", "bob@ctv.ca",
        "https://c/bob", "T6", null, "u6", ts("2024-01-02 00:00:00"),
        "Punct!!! Heavy... content#1 with tail", "right", "english",
        ts("2024-01-02 00:00:00")),
      Row(8L, "ctvnews", "ca", "politics", "Bob Li", null,
        "https://c/bob", "T7", null, "u7", ts("2024-01-02 00:00:00"),
        "Other content", "right", "french",
        ts("2024-01-02 00:00:00")))
    val schema = Schemas.rawNews
    val ordered = rows.map { r =>
      Row(r.get(0), r.get(1), r.get(2), r.get(3), r.get(4), r.get(5),
        r.get(6), r.get(7), null, r.get(9), r.get(10), r.get(11),
        r.get(12), r.get(13), r.get(14))
    }
    // fixture rows carry (id, source, country, category, author, email,
    // author_url, title, description=null, url, publishedat, content,
    // bias, language, ingest_ts) in schema order
    spark.createDataFrame(
      spark.sparkContext.parallelize(ordered), schema)
  }

  private lazy val tr = NewsTransform.transformed(fixture,
    "2026-01-01 00:00:00").cache()

  test("F1/F2: null, facebook authors and blacklisted sources dropped") {
    val ids = tr.select($"ID").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 7L, 8L))
  }

  test("X2/X3: author trimmed, email lowercased with backslash-n removed") {
    val r = tr.filter($"ID" === 2).select($"AUTHOR", $"AUTHOR_EMAIL").head()
    assert(r.getString(0) == "Jane Doe")
    assert(r.getString(1) == "jane.doe@example.com")
  }

  test("J4: null content backfilled from sibling with same keys") {
    // id=2 shares (author, email, title, source, url) with id=1 after
    // cleaning; id=1's email normalizes to the same value
    val c = tr.filter($"ID" === 2).select($"ARTICLE_CONTENT").head()
    assert(c.getString(0) == "Some content here")
  }

  test("J5: author_url backfilled from (author, email) tier") {
    val u = tr.filter($"ID" === 2).select($"AUTHOR_URL").head()
    assert(u.getString(0) == "https://g/jd")
  }

  test("J6: author_email backfilled from (author, author_url) tier") {
    val e = tr.filter($"ID" === 8).select($"AUTHOR_EMAIL").head()
    assert(e.getString(0) == "bob@ctv.ca")
  }

  test("J7: publish date repaired to earliest across match keys") {
    val dates = tr.filter($"ID".isin(1, 2))
      .select($"PUBLISHEDAT").as[Timestamp].collect().toSet
    assert(dates == Set(ts("2024-01-01 09:00:00")))
  }

  test("X1: content clean key strips punctuation, 50 chars, lowercase") {
    val c = tr.filter($"ID" === 7)
      .select($"ARTICLE_CONTENT_CLEAN").head().getString(0)
    assert(c == "punct heavy content1 with tail")
  }

  test("X4: first/last name split") {
    val r = tr.filter($"ID" === 1).select($"FIRST_NAME", $"LAST_NAME").head()
    assert(r.getString(0) == "Jane" && r.getString(1) == "Doe")
  }

  test("X5: surrogate key is the dbt_utils md5 recipe byte-for-byte") {
    val sid = tr.filter($"ID" === 1).select($"SOURCE_ID").head().getString(0)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("globalnews".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(sid == md)
  }

  test("dbt contracts: transformed grain + mart keys + FK integrity") {
    assert(tr.count() == tr.select($"ID").distinct().count())
    val arts = NewsTransform.articlesMart(tr)
    assert(arts.count() == arts.select($"ARTICLE_ID").distinct().count())
    val authors = NewsTransform.authorsDim(tr)
    assert(authors.count() ==
      authors.select($"AUTHOR_ID").distinct().count())
    val bridge = NewsTransform.bridge(tr)
    assert(bridge.join(arts, Seq("ARTICLE_ID"), "left_anti").count() == 0)
    assert(bridge.join(authors, Seq("AUTHOR_ID"), "left_anti").count() == 0)
  }

  test("idempotence: re-ingesting the same batch adds no mart rows") {
    val doubled = fixture.unionByName(
      fixture.withColumn("id", $"id" + 100L)
        .withColumn("ingest_ts",
          $"ingest_ts" + expr("INTERVAL 3 HOURS")))
    val arts2 = NewsTransform.articlesMart(
      NewsTransform.transformed(doubled, "2026-01-01 00:00:00"))
    val arts1 = NewsTransform.articlesMart(tr)
    assert(arts2.count() == arts1.count())
  }

  test("backfill monotonicity: non-null content is never overwritten") {
    val before = fixture.filter($"article_content".isNotNull)
      .select($"id", $"article_content").as[(Long, String)].collect().toMap
    val after = tr.select($"ID", $"ARTICLE_CONTENT")
      .as[(Long, String)].collect().toMap
    for ((id, c) <- before if after.contains(id))
      assert(after(id) == c, s"content overwritten for id=$id")
  }

  test("translate stage: french rows tagged + language overwritten") {
    val out = Enrichment.translateFrench(fixture, StubTranslator)
    assert(out.filter($"language" === "french").count() == 0)
    val t8 = out.filter($"id" === 8).select($"title").head().getString(0)
    assert(t8 == "[en] T7")
    val t1 = out.filter($"id" === 1).select($"title").head().getString(0)
    assert(t1 == "T1")
  }
}
