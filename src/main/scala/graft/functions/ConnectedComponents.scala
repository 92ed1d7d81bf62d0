package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the
  * grouping step of near-duplicate removal (LSH emits candidate PAIRS;
  * keep-one-per-cluster needs the transitive closure of those pairs).
  *
  * Each iteration: every node takes the min label among itself and its
  * neighbours — one join + one groupBy (two shuffles), converging in
  * O(component diameter) rounds. Near-dup graphs are shallow (clusters
  * of copies, diameter ≲ 3), so this beats the constant-factor-heavy
  * alternating small-star/large-star algorithm (Kiveris et al. 2014)
  * that a billion-node web graph would call for; swap it in if
  * diameters grow. `localCheckpoint` truncates the lineage each round —
  * without it the plan doubles per iteration and the driver, not the
  * data, becomes the bottleneck.
  */
object ConnectedComponents {

  /** @param nodes one column `id`; @param edges columns `src`,`dst`
    * (undirected; one direction suffices). Returns (id, component)
    * where component = min node id reachable. */
  def minLabel(nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 20): DataFrame = {
    val both = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    // iterate ONLY over nodes that touch an edge: in a near-dup graph
    // the overwhelming majority of nodes are singletons, and dragging
    // them through every join/groupBy/convergence-probe round multiplies
    // each iteration's work by nodes/endpoints for labels that cannot
    // change. Singletons are appended unchanged at the end.
    val touched = both.select(col("src").as("id")).distinct()
      .localCheckpoint()
    var labels = touched.select(col("id"), col("id").as("component"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val viaNeighbour = labels.join(both, labels("id") === both("src"))
        .select(col("dst").as("id"), col("component"))
      val next = labels.unionByName(viaNeighbour)
        .groupBy("id").agg(min("component").as("component"))
        .localCheckpoint()
      // convergence probe: scalar, short-circuits. Round 1 never
      // converges when edges exist (every edge's larger endpoint
      // adopts the smaller label), so its probe job is skipped.
      val changed =
        if (i == 0) 1L
        else next.as("n").join(labels.as("o"), Seq("id"))
          .filter(col("n.component") =!= col("o.component"))
          .limit(1).count()
      labels = next
      converged = changed == 0
      i += 1
    }
    labels.unionByName(
      nodes.join(touched, Seq("id"), "left_anti")
        .select(col("id"), col("id").as("component")))
  }
}
