package graft

import java.nio.file.{Files, Paths}
import scala.sys.process._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sources.Warehouse

/** Real-Postgres wire parity for the staging sink (S5/S6/S7 — ref
  * newsairflowtasks.py:56-95, sentiment_batch_job_tasks.py:295-326):
  * the reference stages a CSV and bulk-loads it with
  * `COPY … FROM STDIN WITH CSV` into Postgres; until r7 that path was
  * proxied through embedded Derby (JdbcRoundTripSpec covers the JDBC
  * semantics). This spec drives an ACTUAL scratch Postgres cluster
  * (initdb + pg_ctl on a unix socket, torn down after) and proves the
  * engine's staged CSV is COPY-compatible byte-for-byte:
  *
  *   - Warehouse.writeStagingCsv output loads via COPY (FORMAT csv,
  *     ESCAPE '\') with NO rewriting — quotes, commas, embedded
  *     newlines, backslashes, unicode, and the NULL vs empty-string
  *     distinction (unquoted empty vs `""`) all survive,
  *   - a COPY TO extract reads back through the Spark CSV source to
  *     the EXACT original rows (typed: bigint, text, double,
  *     timestamp),
  *   - COPY is append-shaped: re-loading the same staged batch doubles
  *     the row count (the reference's 3-hourly append).
  *
  * The cluster runs as the `postgres` OS user (postgres refuses root);
  * psql itself runs client-side so \copy needs no server-side file
  * permissions. If the environment can't start a cluster the tests
  * cancel rather than fail — wire parity is an environment capability,
  * not an engine property.
  */
class PostgresCopySpec extends SparkSpec {
  import spark.implicits._

  private val dir = s"/tmp/graft-pg-${ProcessHandle.current.pid}"
  private val data = s"$dir/data"

  private def sh(cmd: String): (Int, String) = {
    val out = new StringBuilder
    val rc = Seq("bash", "-c", cmd) ! ProcessLogger(
      l => out.append(l).append('\n'), l => out.append(l).append('\n'))
    (rc, out.toString)
  }

  private def psql(sql: String): (Int, String) = {
    val f = Files.createTempFile("graftpg", ".sql")
    Files.writeString(f, sql)
    val r = sh(s"psql -h $dir -U postgres -v ON_ERROR_STOP=1 -Atq -f $f")
    Files.delete(f)
    r
  }

  private lazy val clusterUp: Boolean = {
    val steps = Seq(
      s"mkdir -p $dir && chown postgres $dir",
      s"""cd /tmp && su postgres -c "initdb -D $data -A trust" """,
      s"""cd /tmp && su postgres -c "pg_ctl -D $data -o '-k $dir -c listen_addresses=' -l $dir/pg.log start" """)
    steps.forall(c => sh(c)._1 == 0) && psql("SELECT 1")._1 == 0
  }

  override def afterAll(): Unit = {
    try {
      sh(s"""cd /tmp && su postgres -c "pg_ctl -D $data stop -m immediate" """)
      sh(s"rm -rf $dir")
    } finally super.afterAll()
  }

  private val schema = StructType(Seq(
    StructField("article_id", LongType),
    StructField("title", StringType),
    StructField("body", StringType),
    StructField("sentiment", StringType),
    StructField("score", DoubleType),
    StructField("publishedat", TimestampType)))

  private def ts(iso: String) =
    java.sql.Timestamp.from(java.time.Instant.parse(iso))

  // edge rows: comma/quote/newline/backslash/unicode in text, NULL vs
  // empty string in every nullable slot, literal 'N/A' (S7's sentinel
  // must survive as a STRING — the nullif transform is upstream, the
  // wire must not invent it), zero/negative double, ms timestamps with
  // no trailing-zero fraction (PG trims them on output)
  private val rows = Seq(
    Row(1L, "plain title", "plain body", "positive", 0.5,
      ts("2024-01-01T12:00:00.123Z")),
    Row(2L, "comma, inside", "line1\nline2\nline3", "negative", -1.5,
      ts("2024-03-05T00:00:01Z")),
    Row(3L, """he said "hi"""", """back\slash and "q"""", "N/A", 0.0,
      ts("2024-12-31T23:59:59.999Z")),
    Row(4L, null, "", null, null, null),
    Row(5L, "", null, "naïve — ünïcode ✓", 2.25,
      ts("2023-06-15T08:30:45.5Z")))

  test("staged CSV loads into real Postgres via COPY and reads back " +
    "to the exact original rows") {
    assume(clusterUp, "scratch Postgres cluster unavailable")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val staged = s"$dir/staged"
    Warehouse.writeStagingCsv(df, schema, staged)

    val (rcT, outT) = psql(
      """CREATE TABLE sentiment(article_id bigint, title text,
        |  body text, sentiment text, score double precision,
        |  publishedat timestamp);""".stripMargin)
    assert(rcT == 0, s"create table failed: $outT")
    val parts = Files.list(Paths.get(staged)).toArray.map(_.toString)
      .filter(p => p.contains("part-") && p.endsWith(".csv")).sorted
    assert(parts.nonEmpty, s"no staged csv parts in $staged")
    for (p <- parts) {
      val (rc, out) = psql(
        s"\\copy sentiment FROM '$p' WITH (FORMAT csv, ESCAPE '\\')")
      assert(rc == 0, s"COPY FROM $p failed: $out")
    }

    // extract in PG's default CSV dialect (doubled quotes — COPY TO
    // with ESCAPE '\' escapes quotes but leaves literal backslashes
    // raw, ambiguous for any reader) and read back through the engine
    // with escape='"' so doubling round-trips exactly. NULL ships as
    // an explicit sentinel: the Spark reader nullifies any field equal
    // to nullValue AFTER unquoting, so PG's unquoted-empty-NULL vs
    // quoted-empty-string distinction would collapse to null on read —
    // with NULL '\N' both survive (PG quotes a REAL '\N' data value,
    // which our corpus doesn't contain).
    val extract = s"$dir/extract.csv"
    // FORCE_QUOTE *: with the NULL sentinel in place PG leaves empty
    // strings unquoted, and Spark's parser yields null (not "") for an
    // unquoted empty token no matter what nullValue is — quoting every
    // non-NULL field keeps '' as '""' which the reader preserves
    val (rcO, outO) = psql(
      s"""\\copy (SELECT * FROM sentiment ORDER BY article_id)
         | TO '$extract' WITH (FORMAT csv, NULL '\\N', FORCE_QUOTE *)"""
        .stripMargin.replace("\n", ""))
    assert(rcO == 0, s"COPY TO failed: $outO")
    val back = spark.read.schema(schema)
      .option("header", "false")
      .option("multiLine", "true")
      .option("escape", "\"")
      .option("nullValue", "\\N")
      // PG prints timestamps space-separated with trailing-zero
      // fractions trimmed; test data keeps fractions at ms precision
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSS]")
      .csv(extract)
      .collect().sortBy(_.getLong(0)).toSeq
    val want = rows.sortBy(_.getLong(0))
    assert(back == want,
      s"wire round-trip drift:\n  got  ${back.mkString("; ")}" +
        s"\n  want ${want.mkString("; ")}")

    // NULL vs empty string distinction landed server-side too
    val (_, nullProbe) = psql(
      """SELECT article_id, title IS NULL, body IS NULL,
        | body = '' FROM sentiment
        | WHERE article_id IN (4, 5) ORDER BY article_id;""".stripMargin
        .replace("\n", ""))
    assert(nullProbe.trim == "4|t|f|t\n5|f|t|", // '' = NULL is NULL in PG
      s"NULL/empty drift server-side: $nullProbe")

    // append semantics: re-loading the same staged batch appends
    for (p <- parts) {
      val (rc, out) = psql(
        s"\\copy sentiment FROM '$p' WITH (FORMAT csv, ESCAPE '\\')")
      assert(rc == 0, s"second COPY FROM failed: $out")
    }
    val (_, n) = psql("SELECT count(*) FROM sentiment;")
    assert(n.trim == (rows.size * 2).toString,
      s"COPY must append, not replace: count=$n")
  }
}
