package graft

import org.apache.spark.sql.functions._
import graft.news.{Enrichment, StubScorer}

/** Crafted-input coverage for the cleaning regexes (X6-X9) and the
  * scoring stub — the synthetic corpus contains no emails, URLs or
  * boilerplate markers, so q39 alone never fires these branches. */
class EnrichmentSpec extends SparkSpec {
  import spark.implicits._

  private def clean(s: String): String =
    Seq(s).toDF("c").select(Enrichment.cleanContent($"c").as("out"))
      .as[String].head()

  test("X6: literal backslash-n sequences removed, real newlines kept") {
    assert(clean("a\\nb") == "ab")
    assert(clean("a\nb") == "a\nb")
  }

  test("X7: content truncated at both boilerplate marker casings") {
    assert(clean("keep this trending now drop this") == "keep this ")
    assert(clean("keep this Trending Now drop this") == "keep this ")
    assert(clean("lower trending now mid Trending Now tail") == "lower ")
  }

  test("X8: embedded emails scrubbed") {
    assert(clean("contact me at jane.doe@example.com for info") ==
      "contact me at  for info")
    assert(clean("no email here") == "no email here")
  }

  test("X9: bare www URLs scrubbed") {
    assert(clean("see www.example.com today") == "see  today")
    assert(clean("https stays: https://x.org/path") ==
      "https stays: https://x.org/path")
  }

  test("X6-X9 compose in the reference's order") {
    val messy = "Tip\\nfrom bob@news.ca via www.leaky.net trending now junk"
    assert(clean(messy) == "Tipfrom  via  ")
  }

  test("stub scorer: two-decimal strings in [0,1] or N/A") {
    val scored = Seq("has the subject word", "nothing relevant")
      .toDF("c")
      .select($"c", StubScorer.score($"c", "subject").as("s"))
      .as[(String, String)].collect().toMap
    assert(scored("nothing relevant") == "N/A")
    val v = scored("has the subject word")
    assert(v.matches("[01]\\.\\d{2}"), s"unexpected score format: $v")
    assert(v.toDouble >= 0.0 && v.toDouble <= 1.0)
  }

  test("recodeNA nulls only exact 'N/A' values") {
    val out = Enrichment.recodeNA(
      Seq(("N/A", "0.55"), ("0.10", "n/a")).toDF("a", "b"),
      Seq("a", "b")).as[(String, String)].collect().toSet
    assert(out == Set((null, "0.55"), ("0.10", "n/a")))
  }
}
