package graft

import org.apache.spark.sql.functions._

/** Frozen token-level fixture for the X13/UD5 nltk divergence
  * (r7 VERDICT item 7).
  *
  * The reference tokenizes with nltk `word_tokenize` (Penn-Treebank
  * rules), then drops non-alpha tokens and stopwords
  * (`sentiment_dashboard.py:138-145`). Our engine tokenizes with
  * `split(lower(text), "[^a-z]+")` (q18, `queries/Textual.scala`) —
  * deliberately, because word_tokenize's clitic/punctuation rules
  * would force a Scala UDF into a codegen'd hot path. The divergence
  * is DOCUMENTED (SURVEY X13/UD5); this spec pins it: each fixture row
  * freezes both tokenizations (the nltk column hand-derived from the
  * published PTB rules + the reference's isalpha filter), the engine
  * side is asserted by EXECUTING the q18 expression, and the set of
  * divergent rows must match the fixture's `diverges` flags exactly —
  * a tokenizer change that silently widens or narrows the divergence
  * fails here, not in a downstream word-count drift.
  *
  * Divergence classes frozen below:
  *  1. clitics/possessives: nltk splits "don't" → [do, n't] (n't then
  *     dies to isalpha) where the regex yields [don, t];
  *  2. hyphenated compounds: nltk keeps "state-of-the-art" as ONE
  *     token which dies to isalpha; the regex splits it into 4 words;
  *  3. accented (French) letters: "montréal" survives nltk isalpha
  *     whole; the ASCII regex splits at é;
  *  4. dotted abbreviations: nltk keeps "U.S." (dies to isalpha); the
  *     regex yields [u, s].
  *  Plain ASCII prose tokenizes identically (row 5).
  */
class TokenizerParitySpec extends SparkSpec {
  import spark.implicits._

  private case class Fixture(text: String, graftTokens: Seq[String],
      nltkAfterFilter: Seq[String], diverges: Boolean)

  // nltkAfterFilter = word_tokenize(text.lower()) filtered to
  // .isalpha() tokens — frozen by hand from the PTB tokenizer rules
  // the reference imports (nltk 3.x), NOT executed here (nltk is a
  // Python dependency; freezing is the point).
  //
  // DELIBERATELY EXCLUDED: the reference's stopword + 'said' filter
  // (`sentiment_dashboard.py` drops `word in sw` against nltk's
  // English stopword list, which includes 'do', 'of', 'the'). This
  // fixture freezes the TOKENIZER stage only: both engines apply an
  // equivalent stopword filter downstream (q18 side in
  // Textual.wordTopK), so including it here would (a) compare
  // different pipeline stages on the two columns and (b) mask class-1
  // divergence whenever the clitic stem happens to be a stopword —
  // e.g. with stopwords applied, fixture 1's nltk column would be
  // just (report), hiding that word_tokenize produced 'do' where the
  // regex produced 'don'. So nltkAfterFilter for "Don't report" is
  // (do, report) — tokenize + isalpha, NOT the reference's final
  // filtered output, which would further drop 'do' as a stopword.
  private val fixtures = Seq(
    Fixture("Don't report",
      Seq("don", "t", "report"), Seq("do", "report"), diverges = true),
    Fixture("state-of-the-art system",
      Seq("state", "of", "the", "art", "system"), Seq("system"),
      diverges = true),
    Fixture("Montréal economy",
      Seq("montr", "al", "economy"), Seq("montréal", "economy"),
      diverges = true),
    Fixture("U.S. growth",
      Seq("u", "s", "growth"), Seq("growth"), diverges = true),
    Fixture("ottawa reports strong growth",
      Seq("ottawa", "reports", "strong", "growth"),
      Seq("ottawa", "reports", "strong", "growth"), diverges = false))

  test("q18 tokenizer divergence from nltk is exactly the frozen " +
    "fixture set") {
    val got = fixtures.map(_.text).toDF("text")
      .select($"text",
        // the q18 expression, verbatim (Textual.wordTopK)
        filter(split(lower($"text"), "[^a-z]+"), w => w =!= "")
          .as("toks"))
      .as[(String, Seq[String])].collect().toMap
    fixtures.foreach { f =>
      assert(got(f.text) == f.graftTokens,
        s"engine tokenization drifted for '${f.text}'")
      val observedDivergence = f.graftTokens != f.nltkAfterFilter
      assert(observedDivergence == f.diverges,
        s"divergence flag wrong for '${f.text}': the documented set " +
          "changed — update SURVEY X13/UD5 and this fixture together")
    }
    assert(fixtures.count(_.diverges) == 4,
      "exactly the four documented divergence classes")
  }
}
