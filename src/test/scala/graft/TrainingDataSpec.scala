package graft

import org.apache.spark.sql.functions._
import graft.queries.TrainingData

/** Semantic checks the DuckDB oracle can't express: detector recall on
  * the constructed twin set, ANN sanity, multimodal decode behavior. */
class TrainingDataSpec extends SparkSpec {
  import spark.implicits._

  test("minhash LSH finds high-Jaccard twins and ≥99% of all twins") {
    val pairs = TrainingData.dedupMinhashLsh(spark, sfDir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val twinJ = TrainingData.ngramJaccard(spark, sfDir)
      .select($"doc_id", $"jaccard").as[(Long, Double)].collect()
    // 16 bands × 4 rows: detection prob at J=0.8 is 1-(1-0.41)^16 ≈
    // 0.9998 — misses there indicate a bug, not LSH randomness
    val strict = twinJ.filter(_._2 >= 0.8)
      .map { case (id, _) => (id, id + 100000L) }.toSet
    val strictMissed = strict -- pairs
    assert(strictMissed.isEmpty,
      s"LSH missed high-J twins: ${strictMissed.take(5)}")
    val all = twinJ.map { case (id, _) => (id, id + 100000L) }.toSet
    val recall = (all intersect pairs).size.toDouble / all.size
    assert(recall >= 0.99, s"twin recall $recall below 0.99")
  }

  test("simhash twin hamming distance is small") {
    val maxHam = TrainingData.dedupSimhash(spark, sfDir)
      .agg(max($"twin_hamming")).as[Int].head()
    // a 3-word suffix flips few of the 60 bits (observed max 16 at sf0.01);
    // random doc pairs average ~30
    assert(maxHam <= 25, s"twin hamming too large: $maxHam")
  }

  test("exact dedup collapses the re-ingested corpus 2:1") {
    val df = TrainingData.dedupExact(spark, sfDir)
    assert(df.filter($"n_copies" =!= 2).count() == 0)
    assert(df.filter($"keep_doc_id" >= 100000L).count() == 0,
      "keep-min-id policy violated")
  }

  test("brute-force ANN rank 1 is the query vector itself") {
    val top = TrainingData.annCosineTopK(spark, sfDir)
      .filter($"rank" === 1).select($"vec_id", $"cos_sim")
      .as[(Long, Double)].head()
    assert(top._1 == 0L && math.abs(top._2 - 1.0) < 1e-9)
  }

  test("LSH ANN results are a subset of brute-force candidates by cosine") {
    val lsh = TrainingData.annLshTopK(spark, sfDir)
    assert(lsh.filter($"rank" === 1).select($"vec_id").as[Long].head() == 0L)
    assert(lsh.count() > 0)
  }

  test("IVF ANN: rank 1 is the query, results confined to its cell") {
    val ivf = TrainingData.annIvfTopK(spark, sfDir)
    assert(ivf.filter($"rank" === 1).select($"vec_id").as[Long].head() == 0L)
    val assigned = graft.functions.Similarity.ivfAssign(
      Tables(spark, sfDir, "embeddings"), 16)
    val qcid = assigned.filter($"vec_id" === 0)
      .select($"cid").as[Long].head()
    val cellIds = assigned.filter($"cid" === qcid)
      .select($"vec_id").as[Long].collect().toSet
    val resultIds = ivf.select($"vec_id").as[Long].collect().toSet
    assert(resultIds.subsetOf(cellIds))
  }

  test("multimodal decode: dimensions equal first two bytes") {
    val row = TrainingData.multimodalMeta(spark, sfDir)
      .join(Tables(spark, sfDir, "documents"), "doc_id")
      .select($"width", $"height", $"n_bytes", $"text").head()
    val text = row.getString(3)
    assert(row.getInt(0) == text.charAt(0).toInt)
    assert(row.getInt(1) == text.charAt(1).toInt)
    assert(row.getInt(2) == text.getBytes("UTF-8").length)
  }

  test("langid predicts en on the english-stopword corpus") {
    val dist = TrainingData.langId(spark, sfDir)
      .groupBy($"lang_pred").count().as[(String, Long)].collect().toMap
    assert(dist.getOrElse("en", 0L) > 0)
  }
}
