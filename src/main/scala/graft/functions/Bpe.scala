package graft.functions

import graft.Materialize.TrunkCheckpointOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction (Sennrich et al. 2016) as a
  * distributed trainer — the step beyond q97's single pair count: each
  * round counts adjacent symbol pairs over the DISTINCT-word table
  * (weighted by corpus counts), collects ONLY the argmax pair to the
  * driver (one row — the driver never sees data), and applies the merge
  * to every word in parallel.
  *
  * Words are kept as space-joined symbol strings ("hello" → "h e l l
  * o"); a merge (a, b) is one codegen'd regexp_replace of " a b(?= )"
  * on the space-padded form — the lookahead keeps the trailing space in
  * the stream so back-to-back occurrences (" a b a b ") merge in one
  * pass, and replacement scanning is left-to-right non-overlapping,
  * which IS greedy BPE order. All symbols come from tokens() ([a-z]+),
  * so pairs never contain regex metacharacters.
  *
  * Scale: the word table is Zipf-tiny relative to the corpus (q97's
  * observation), so R merge rounds = R × (one partial-aggregated
  * groupBy over distinct words + one map). State per round is one
  * driver row; lineage is truncated every round (localCheckpoint) so
  * the plan never grows with R. A 100 TB corpus still trains against
  * its ~100M distinct words, not its tokens.
  */
object Bpe {

  /** @param words (word, n): distinct words with corpus counts.
    * @return merge table (round, left, right, merged) in training
    *         order, and the final symbolized words (word, sym, n). */
  def train(words: DataFrame, rounds: Int): (DataFrame, DataFrame) = {
    val session = words.sparkSession
    import session.implicits._
    var syms = words
      .select(col("word"), concat_ws(" ", split(col("word"), "")).as("sym"),
        col("n"))
      .trunkCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, String)]
    var round = 0
    var exhausted = false
    while (round < rounds && !exhausted) {
      val pairExpr = "transform(sequence(1, size(split(sym, ' ')) - 1), " +
        "i -> concat(element_at(split(sym, ' '), i), ' ', " +
        "element_at(split(sym, ' '), i + 1)))"
      val top = syms
        .filter(size(split($"sym", " ")) >= 2)
        .select($"n", explode(expr(pairExpr)).as("pair"))
        .groupBy($"pair").agg(sum($"n").as("weight"))
        .orderBy($"weight".desc, $"pair".asc)
        .limit(1)
        .as[(String, Long)].collect()
      if (top.isEmpty) exhausted = true
      else {
        val Array(a, b) = top.head._1.split(" ", 2)
        merges += ((round, a, b, a + b))
        val prev = syms
        syms = syms.withColumn("sym",
          trim(regexp_replace(concat(lit(" "), $"sym", lit(" ")),
            lit(s" $a $b(?= )"), lit(s" $a$b"))))
          .trunkCheckpoint()
        // The new checkpoint is materialized; drop the previous round's
        // blocks so R-round training holds one word-table copy in
        // memory, not R of them (a 30k-merge vocab run would otherwise
        // accumulate 30k cached copies). Dataset.unpersist only clears
        // CacheManager entries — checkpoint blocks are RDD storage, so
        // unpersist the LogicalRDD's RDD directly (waiting for the
        // ContextCleaner to GC them is unbounded).
        prev.queryExecution.logical match {
          case lr: org.apache.spark.sql.execution.LogicalRDD =>
            lr.rdd.unpersist(blocking = false)
          case _ => prev.unpersist(blocking = false)
        }
        round += 1
      }
    }
    (merges.result().toDF("round", "left", "right", "merged"), syms)
  }
}
