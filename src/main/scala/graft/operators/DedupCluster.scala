package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate cluster assignment: connected components over a
  * candidate-pair edge set, by iterative min-label propagation on
  * DataFrames.
  *
  * The pipeline shape at scale: LSH produces candidate pairs, exact
  * verification prunes them, and the surviving pairs form a graph whose
  * connected components are the duplicate clusters (keep one doc per
  * component). Label propagation is the distributed formulation: every
  * node starts labeled with itself, each round every node adopts the
  * minimum label among itself and its neighbors, and the process
  * converges in O(component diameter) rounds. Near-dup components are
  * shallow (pairs/small cliques), so convergence is 2-4 rounds in
  * practice; each round is one shuffle on the edge key.
  *
  * Scale notes:
  *   - `localCheckpoint` truncates the lineage each round — without it
  *     the plan doubles per iteration and the optimizer chokes long
  *     before the data does.
  *   - the convergence check (`changed == 0`) is a count over the
  *     joined label frames, not a collect of the labels.
  *   - for graphs with deep components (not the near-dup case) the
  *     alternating large-star/small-star algorithm (Kiveris et al.,
  *     "Connected Components in MapReduce and Beyond") converges in
  *     O(log n) rounds with the same per-round primitive; the propagation
  *     loop below is the building block either way.
  */
object DedupCluster {

  /** Connected components of (`vertices`: one `node` column) under
    * (`edges`: `a`, `b` columns). Returns (node, cluster_id) where
    * cluster_id is the minimum node id in the component.
    */
  def connectedComponents(
      vertices: DataFrame, edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val und = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
    var labels = vertices.select(col("node"), col("node").as("label"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val neighborLabels = und
        .join(labels, und("a") === labels("node"))
        .select(col("b").as("node"), col("label"))
      val next = labels.union(neighborLabels)
        .groupBy(col("node"))
        .agg(min(col("label")).as("label"))
        .localCheckpoint(true)
      val changed = next.as("n")
        .join(labels.withColumnRenamed("label", "old_label"), "node")
        .filter(col("label") =!= col("old_label"))
        .limit(1).count()
      labels = next
      converged = changed == 0L
      iter += 1
    }
    labels.select(col("node"), col("label").as("cluster_id"))
  }
}
