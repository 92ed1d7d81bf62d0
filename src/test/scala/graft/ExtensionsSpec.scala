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
}
