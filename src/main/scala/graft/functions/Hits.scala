package graft.functions

import graft.Materialize.TrunkCheckpointOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS (hubs & authorities) in fixed-point integer arithmetic — the
  * second classic link-analysis primitive next to [[PageRank]], and
  * the natural one for BIPARTITE graphs (supplier↔part,
  * domain↔document, query↔url): hubs point at good authorities,
  * authorities are pointed at by good hubs.
  *
  * Determinism discipline mirrors [[PageRank]]: scores are BIGINT
  * micro-units and every half-round is (a) one src- or dst-keyed
  * shuffle join + partial-aggregated sum — exact long arithmetic,
  * associative/commutative under any partitioning — and (b) an L1
  * normalization `score·scale div Σscore` where the normalizer is a
  * one-row decimal(38,0) aggregate broadcast back (the classic L2
  * normalization needs sqrt, which would put a float in the loop; L1
  * keeps the iteration bit-exact and changes only the scale, not the
  * ranking). Truncation bias per node per half-round < 1 micro-unit.
  *
  * Per iteration: 2 joins + 2 aggregates + 2 one-row broadcasts. The
  * edge list is computed once and localCheckpointed. Σraw runs in
  * decimal(38,0) (a long Σ over edges of micro-scores overflows past
  * ~9e12 edge-contributions); per-node raw sums are long (overflow
  * only past ~9e12 in-degree).
  */
object Hits {

  /** @param edges directed (src, dst), duplicates allowed (distinct'd).
    * @return (id, role, score): final hub score per distinct src and
    *         authority score per distinct dst, L1-normalized to
    *         `scale` micro-units. (id, role) is unique even when src
    *         and dst id spaces overlap (bipartite encodings). */
  def scores(edges: DataFrame, iters: Int = 2,
      scale: Long = 1000000L): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
      .trunkCheckpoint()
    // checkpointed: each normalize() re-reads its id universe, so lazy
    // frames would re-run a distinct over the edge list once per
    // half-round (2·iters extra edge-list shuffles). O(nodes) each.
    val srcs = e.select(col("src").as("id")).distinct().trunkCheckpoint()
    val dsts = e.select(col("dst").as("id")).distinct().trunkCheckpoint()
    def normalize(raw: DataFrame, ids: DataFrame,
        out: String): DataFrame = {
      // localCheckpoint: the raw frame feeds BOTH the normalizer and
      // the re-scale join; left lazy, each half-round would re-derive
      // the whole preceding chain twice (2^halfrounds passes over the
      // edge list — measured 14 s vs 6 s at 6M edges). The frame is
      // O(nodes), so materializing it is cheap.
      val r = raw.trunkCheckpoint()
      val tot = r.agg(sum(col("raw").cast("decimal(38,0)")).as("tot"))
      ids.join(r, Seq("id"), "left")
        .crossJoin(broadcast(tot))
        .select(col("id"),
          expr(s"CAST(CAST(coalesce(raw, 0) AS DECIMAL(38,0))" +
            s" * $scale div tot AS BIGINT)").as(out))
    }
    var hub = srcs.select(col("id"), lit(scale).as("hub"))
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      val araw = e.join(hub, e("src") === hub("id"))
        .groupBy(col("dst")).agg(sum(col("hub")).as("raw"))
        .withColumnRenamed("dst", "id")
      auth = normalize(araw, dsts, "auth")
      val hraw = e.join(auth, e("dst") === auth("id"))
        .groupBy(col("src")).agg(sum(col("auth")).as("raw"))
        .withColumnRenamed("src", "id")
      hub = normalize(hraw, srcs, "hub")
    }
    hub.select(col("id"), lit("hub").as("role"),
        col("hub").as("score"))
      .unionByName(auth.select(col("id"),
        lit("authority").as("role"), col("auth").as("score")))
  }
}
