package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** String/regex/hash/JSON scalar-function surface (SURVEY.md §2.7) plus
  * the tokenize→count→top-k analytics pattern (§2.4 A10).
  * All regexes are pinned to ASCII character classes that behave
  * identically in Java (Spark) and RE2 (DuckDB) — the POSIX
  * `[[:punct:]]` dialect drift called out in SURVEY §7.3 is avoided by
  * construction.
  */
object Textual {

  private val NullSentinel = "_dbt_utils_surrogate_key_null_"
  /** Same email regex the reference scrubs with (X8:
    * sentiment_batch_job_tasks.py:86) — single source of truth. */
  private val EmailRe = graft.news.Schemas.EmailReBase

  /** q16 — dbt_utils.generate_surrogate_key parity: md5 over '-'-joined
    * string-cast columns with the NULL sentinel (ref X5:
    * transformed.sql:238-241). Byte-identical recipe enables hash-equality
    * testing downstream. */
  val surrogateKeys: Q = (s, dir) => {
    import s.implicits._
    import graft.news.NewsTransform.surrogateKey
    Tables(s, dir, "customer").select(
      $"c_custkey",
      surrogateKey($"c_name", $"c_nationkey", $"c_mktsegment")
        .as("customer_sk"),
      surrogateKey($"c_custkey").as("custkey_sk"))
  }

  /** q17 — cleaning pipeline over document text: punctuation-strip +
    * lowercase 50-char dedup prefix (X1), trim (X2), first-token split
    * (X4), email scrub (X8), truncate-at-marker (X7). */
  val stringClean: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "documents").select(
      $"doc_id",
      lower(substring(regexp_replace($"text", "[^a-zA-Z0-9 ]", ""), 1, 50))
        .as("clean_prefix"),
      trim($"text").as("trimmed"),
      split($"text", " ").getItem(0).as("first_word"),
      regexp_replace($"text", EmailRe, "").as("no_email"),
      substring_index($"text", " the ", 1).as("before_marker"))
  }

  /** q18 — tokenize → stopword-filter → count → deterministic top-k
    * (ref A10/X13/W4: sentiment_dashboard.py:138-166, max_words=50).
    * explode+groupBy gets map-side partial aggregation; the top-k is a
    * TakeOrderedAndProject, no global sort. */
  val wordTopK: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "documents")
      .select(explode(split(lower($"text"), "[^a-z]+")).as("word"))
      .filter($"word" =!= "" && !$"word".isin("the", "a", "said"))
      .groupBy($"word").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"word".asc)
      .limit(50)
  }

  /** q19 — case-insensitive substring predicates (ref F4:
    * sentiment_dashboard.py:103-105). */
  val ilikeFilter: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "documents")
      .filter($"text".ilike("%spark%") || $"text".ilike("%vector%"))
      .filter(length($"text") >= 100)
      .select($"doc_id", $"source", $"n_chars")
  }

  /** q20 — nested-JSON field extraction (ref S10/X16:
    * sentiment_batch_job_tasks.py:258-292). */
  val jsonExtract: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "events").select(
      $"event_id",
      get_json_object($"props", "$.k").cast("int").as("k"),
      (get_json_object($"props", "$.k").cast("int") % 10).as("k_mod"))
  }

  /** q21 — JSONL batch-request build: one JSON object per row with
    * renamed fields (ref S9: sentiment_batch_job_tasks.py:195-223). */
  val jsonlRequest: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "events").select(
      $"event_id",
      to_json(struct($"event_id".as("custom_id"),
        $"event_type".as("method"))).as("request"))
  }

  /** q185 — distinctive terms per source (keyness): which words does
    * each source over-use relative to the whole corpus — the
    * source-profiling / contamination-triage view of a crawl. Lift is
    * the exact integer cross-product (1e6·tf_s·tot_c) div
    * (tot_s·tf_c) in decimal(38,0) (the product overflows a long once
    * per-source token counts pass ~1e9 — the q130 discipline), so the
    * ranking is engine- and partitioning-exact. Both count passes are
    * map-side-combined explode→groupBy; the per-source top-10 is a
    * rank window over the VOCAB-sized (source, term) frame —
    * partitioned by source, and Spark 4 turns the rn≤10 filter into a
    * WindowGroupLimit partial top-k before the shuffle. min-support
    * tf_s ≥ 20 keeps hapax noise out of the lift tail. */
  val distinctiveTerms: Q = (s, dir) => {
    import s.implicits._
    val toks = Tables(s, dir, "documents")
      .select($"source",
        explode(split(lower($"text"), "[^a-z]+")).as("term"))
      .filter($"term" =!= "")
    val bySrc = toks.groupBy($"source", $"term")
      .agg(count(lit(1)).as("tf_s"))
    val srcTot = toks.groupBy($"source").agg(count(lit(1)).as("tot_s"))
    val byCorpus = toks.groupBy($"term").agg(count(lit(1)).as("tf_c"))
    val corpusTot = toks.agg(count(lit(1)).as("tot_c"))
    val w = Window.partitionBy($"source")
      .orderBy($"lift_micro".desc, $"term".asc)
    bySrc.filter($"tf_s" >= 20)
      .join(broadcast(srcTot), Seq("source"))
      .join(byCorpus, Seq("term"))
      .crossJoin(broadcast(corpusTot))
      .withColumn("lift_micro",
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * tf_s * tot_c" +
          " div (CAST(tot_s AS DECIMAL(38,0)) * tf_c) AS BIGINT)"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 10)
      .select($"source", $"term", $"tf_s", $"tf_c", $"lift_micro",
        $"rn".cast("long").as("rank"))
  }

  val queries: Map[String, Q] = Map(
    "q16_surrogate_keys" -> surrogateKeys,
    "q17_string_clean" -> stringClean,
    "q18_word_topk" -> wordTopK,
    "q19_ilike_filter" -> ilikeFilter,
    "q20_json_extract" -> jsonExtract,
    "q21_jsonl_request" -> jsonlRequest,
    "q185_distinctive_terms" -> distinctiveTerms,
  )

  val oracles: Map[String, String] = Map(
    "q16_surrogate_keys" ->
      s"""SELECT c_custkey,
         | md5(concat_ws('-',
         |   coalesce(CAST(c_name AS VARCHAR), '$NullSentinel'),
         |   coalesce(CAST(c_nationkey AS VARCHAR), '$NullSentinel'),
         |   coalesce(CAST(c_mktsegment AS VARCHAR), '$NullSentinel')))
         |   AS customer_sk,
         | md5(concat_ws('-',
         |   coalesce(CAST(c_custkey AS VARCHAR), '$NullSentinel')))
         |   AS custkey_sk
         |FROM customer""".stripMargin,
    "q17_string_clean" ->
      """SELECT doc_id,
        | lower(substr(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g'), 1, 50))
        |   AS clean_prefix,
        | trim(text) AS trimmed,
        | split_part(text, ' ', 1) AS first_word,
        | regexp_replace(text, '[\w\.-]+@[\w\-]+\.[a-zA-Z]{2,6}', '', 'g')
        |   AS no_email,
        | split_part(text, ' the ', 1) AS before_marker
        |FROM documents""".stripMargin,
    "q18_word_topk" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z]+'))
        |        AS word FROM documents) t
        |WHERE word <> '' AND word NOT IN ('the', 'a', 'said')
        |GROUP BY word
        |ORDER BY cnt DESC, word ASC
        |LIMIT 50""".stripMargin,
    "q19_ilike_filter" ->
      """SELECT doc_id, source, n_chars FROM documents
        |WHERE (text ILIKE '%spark%' OR text ILIKE '%vector%')
        |  AND length(text) >= 100""".stripMargin,
    "q20_json_extract" ->
      """SELECT event_id,
        | CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        | CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod
        |FROM events""".stripMargin,
    "q21_jsonl_request" ->
      """SELECT event_id,
        | CAST(to_json(struct_pack(custom_id := event_id,
        |   method := event_type)) AS VARCHAR) AS request
        |FROM events""".stripMargin,
    "q185_distinctive_terms" ->
      """WITH toks AS (SELECT source,
        |    unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
        |  FROM documents),
        |t AS (SELECT source, term FROM toks WHERE term <> ''),
        |by_src AS (SELECT source, term, count(*)::BIGINT AS tf_s
        |  FROM t GROUP BY source, term),
        |src_tot AS (SELECT source, count(*)::BIGINT AS tot_s
        |  FROM t GROUP BY source),
        |by_corpus AS (SELECT term, count(*)::BIGINT AS tf_c
        |  FROM t GROUP BY term),
        |corpus_tot AS (SELECT count(*)::BIGINT AS tot_c FROM t),
        |lifted AS (SELECT source, term, tf_s, tf_c,
        |    CAST(1000000::HUGEINT * tf_s * tot_c
        |      // (tot_s::HUGEINT * tf_c) AS BIGINT) AS lift_micro
        |  FROM by_src JOIN src_tot USING (source)
        |  JOIN by_corpus USING (term) CROSS JOIN corpus_tot
        |  WHERE tf_s >= 20),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |    ORDER BY lift_micro DESC, term ASC) AS rn
        |  FROM lifted)
        |SELECT source, term, tf_s, tf_c, lift_micro, rn::BIGINT AS rank
        |FROM r WHERE rn <= 10""".stripMargin,
  )
}
