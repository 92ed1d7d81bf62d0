package graft

/** cosine_similarity is callable from SQL once GraftExtensions is on the
  * session (SparkSpec sets spark.sql.extensions). */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine_similarity registered as a SQL function") {
    Tables(spark, sfDir, "embeddings").createOrReplaceTempView("emb")
    val r = spark.sql(
      """SELECT cosine_similarity(embedding, embedding) AS c
        |FROM emb LIMIT 3""".stripMargin).as[Double].collect()
    assert(r.forall(c => math.abs(c - 1.0) < 1e-12))
  }

  test("mink_sample SQL aggregate keeps exactly the K smallest-hash values") {
    Tables(spark, sfDir, "events").createOrReplaceTempView("ev_mink")
    val got = spark.sql(
      """SELECT event_type,
        |  mink_sample(hash60(encode(CAST(event_id AS STRING), 'UTF-8')),
        |              CAST(value AS DOUBLE), 8) AS sample
        |FROM ev_mink GROUP BY event_type""".stripMargin)
      .as[(String, Seq[Double])].collect().toMap
    // expected membership via the window form over the same hash
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy($"event_type")
      .orderBy($"hk".asc, $"v".asc)
    val want = Tables(spark, sfDir, "events")
      .select($"event_type",
        graft.functions.Hashing.hash60($"event_id".cast("string")).as("hk"),
        $"value".cast("double").as("v"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 8)
      .groupBy($"event_type")
      .agg(collect_list(struct($"hk", $"v")).as("s"))
      .select($"event_type", expr("transform(array_sort(s), x -> x.v)"))
      .as[(String, Seq[Double])].collect().toMap
    assert(got === want, "aggregate and window memberships diverge")
    assert(got.values.forall(_.length === 8))
  }

  test("ASOF JOIN SQL syntax lands on the native exec, matches the window form") {
    import org.apache.spark.sql.functions._
    import graft.functions.AsOfJoin
    val e = Tables(spark, sfDir, "events")
    val purchases = e.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id")
    val clicks = e.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id")
    purchases.createOrReplaceTempView("asof_probes")
    clicks.createOrReplaceTempView("asof_quotes")
    val viaSql = spark.sql(
      """SELECT * FROM asof_probes ASOF JOIN asof_quotes
        |  ON asof_probes.user_id = asof_quotes.user_id
        |  AND asof_probes.ts >= asof_quotes.ts
        |  TIEBREAK event_id PAYLOAD event_id, ts""".stripMargin)
    assert(viaSql.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      "SQL form must plan through AsOfJoinExec")
    val viaApi = AsOfJoin.backward(purchases, clicks, Seq("user_id"),
      "ts", "event_id", Seq("event_id", "ts"))
    val key = (r: org.apache.spark.sql.Row) => r.toSeq.map(String.valueOf)
    assert(viaSql.collect().map(key).sortBy(_.mkString("|")).toSeq ===
      viaApi.collect().map(key).sortBy(_.mkString("|")).toSeq,
      "SQL and window forms must agree row-for-row")
    // default payload = right minus keys/time/tiebreak; here that's empty
    val err = intercept[IllegalArgumentException] {
      spark.sql("""SELECT * FROM asof_probes ASOF JOIN asof_quotes
        |  ON asof_probes.user_id = asof_quotes.user_id
        |  AND asof_probes.ts >= asof_quotes.ts
        |  TIEBREAK event_id""".stripMargin)
    }
    assert(err.getMessage.contains("payload resolved to zero columns"))
    // malformed ASOF statements explain the dialect instead of a
    // cascading delegate error
    val err2 = intercept[IllegalArgumentException] {
      spark.sql("SELECT * FROM asof_probes ASOF JOIN asof_quotes ON 1=1 TIEBREAK x")
    }
    assert(err2.getMessage.contains("Dialect"))
    // everything else still parses through the delegate
    assert(spark.sql("SELECT 1 AS one").as[Int].head() === 1)
  }
}
