package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — turns
  * near-duplicate PAIRS into dedup CLUSTERS (every doc gets its
  * component's minimum id as the canonical representative; keep one row
  * per component to dedup).
  *
  * Each iteration is one join + aggregate on the edge list (both
  * shuffles on the node key); labels converge in O(component diameter)
  * iterations — near-dup clusters are small chains, so 2-4 in practice,
  * and the loop stops as soon as a pass changes nothing. The driver only
  * orchestrates; all data work is distributed. For graphs with huge
  * diameters use the large-star/small-star variant; dedup graphs are not
  * that.
  */
object Components {

  /** @param edges (a, b) undirected pairs
    * @return (node, component) — component = min node id reachable.
    *         The result is cached (the iterative lineage is expensive to
    *         recompute); callers should `.unpersist()` it once consumed.
    * @throws IllegalStateException if labels have not converged after
    *         maxIter passes — unconverged labels are silently WRONG
    *         (over-segmented components), never return them. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(edges.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
      .cache()
    // seed with the first propagation round folded into initialization:
    // min(node, min neighbor) is exactly iteration 1 over identity labels,
    // for the same single shuffle the identity init would have cost
    var labels = sym.groupBy(col("src"))
      .agg(least(col("src"), min(col("dst"))).as("component"))
      .select(col("src").as("node"), col("component"))
      .cache()
    var iter = 1
    var converged = false
    while (!converged && iter < maxIter) {
      // each node offers its current label to every neighbor
      val offers = labels
        .join(sym, col("node") === col("src"))
        .select(col("dst").as("node"), col("component"))
        .groupBy(col("node")).agg(min(col("component")).as("__offer"))
      // keep the previous label alongside the new one so convergence
      // detection is a filter over this same cached frame — one action per
      // iteration, no extra self-join against the old labels
      val next = labels.select(col("node"), col("component"))
        .join(offers, Seq("node"), "left")
        .select(col("node"), col("component").as("__old"),
          least(col("component"), coalesce(col("__offer"), col("component")))
            .as("component"))
        .cache()
      val changed = next.filter(col("component") =!= col("__old")).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    if (!converged) {
      labels.unpersist()
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter iterations — " +
          "graph diameter exceeds maxIter; raise it or use a " +
          "large-star/small-star contraction for high-diameter graphs")
    }
    labels.select(col("node"), col("component"))
  }
}
