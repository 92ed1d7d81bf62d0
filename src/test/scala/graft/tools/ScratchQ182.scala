package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextOps

object ScratchQ182 {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._
    val dir = "/root/testdata/sf0.1"
    val d = graft.Tables(s, dir, "documents").select($"doc_id", $"text")
    val c = d.unionByName(d.select(($"doc_id" + 100000L).as("doc_id"),
      concat($"text", lit(" graft dedup probe")).as("text")))
    val groups = c
      .select($"doc_id", TextOps.tokens($"text").as("ws"))
      .select($"doc_id", TextOps.shinglesFromTokens($"ws", 3).as("sh_set"))
      .groupBy(md5(concat_ws("", $"sh_set")).as("gkey"))
      .agg(min($"doc_id").as("rep_id"), first($"sh_set").as("sh_set"),
        collect_list($"doc_id").as("ids"), count(lit(1)).as("gn"))
      .localCheckpoint()
    val shs = groups.select($"rep_id".as("doc_id"), $"sh_set")
    val toks = shs.select($"doc_id", explode($"sh_set").as("tok"))
    val freq = toks.groupBy($"tok").agg(count(lit(1)).as("df"))
    val wRank = Window.partitionBy($"doc_id").orderBy($"df".asc, $"tok".asc)
    val prefix = toks.join(freq, Seq("tok"))
      .withColumn("rn", row_number().over(wRank))
      .withColumn("sz", count(lit(1)).over(Window.partitionBy($"doc_id")))
      .filter($"rn" <= $"sz" - expr("(sz + 1) div 2") + 1)
      .select($"doc_id", $"tok", $"sz", $"rn").localCheckpoint()
    println("docs=" + shs.count() + " prefixRows=" + prefix.count())
    val joined = prefix.as("pa").join(prefix.as("pb"), Seq("tok"))
      .filter(col("pa.doc_id") < col("pb.doc_id"))
    println("collisions=" + joined.count())
    val lenOk = joined.filter(col("pb.sz") * 2 >= col("pa.sz") &&
        col("pb.sz") <= col("pa.sz") * 2)
    println("afterLen=" + lenOk.count())
    val posOk = lenOk.filter(
      least(col("pa.rn"), col("pb.rn")) +
        least(col("pa.sz") - col("pa.rn"), col("pb.sz") - col("pb.rn")) >=
      expr("(pa.sz + pb.sz + 2) div 3"))
    println("afterPos=" + posOk.count())
    println("candDistinct=" + posOk.select(col("pa.doc_id"), col("pb.doc_id")).distinct().count())
    val t0 = System.nanoTime()
    graft.queries.TrainingData.queries("q182_prefix_jaccard_join")(s, dir)
      .write.format("noop").mode("overwrite").save()
    println(f"full=${(System.nanoTime()-t0)/1e9}%.2f s")
    s.stop()
  }
}
