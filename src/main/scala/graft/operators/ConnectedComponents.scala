package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label propagation with
  * pointer-doubling, the clustering step of every near-dup pipeline
  * (SURVEY.md §2.11 ✦; used by q76).
  *
  * Each iteration does (a) one edge-propagation join — every node takes
  * the min label among itself and its neighbors — and (b) one label-table
  * self-join shortcut (`cluster := label(cluster)`), which is the
  * pointer-doubling trick: labels skip along already-discovered paths, so
  * convergence is O(log diameter) iterations instead of O(diameter). A
  * plain propagation loop looks correct on clique-like duplicate clusters
  * (diameter ≤ 2) and silently under-merges long chains — the property
  * test drives a 30-node path through this exact trap.
  *
  * Convergence is detected by the label sum: labels only ever decrease,
  * so an unchanged sum is a fixpoint. One scalar action per iteration.
  *
  * Scale notes (100 TB / 1e9 nodes): both joins shuffle on node id — the
  * same partitioning every iteration, so AQE reuses exchange layouts; the
  * per-iteration persist bounds lineage. This is the GraphX/GraphFrames
  * CC algorithm expressed as DataFrame joins.
  */
object ConnectedComponents {

  /** @param pairs two-column frame of undirected edges (any numeric id
    *              type); symmetrized internally.
    * @return (id, cluster) — cluster is the minimum id reachable from id;
    *         isolated nodes (absent from pairs) are absent here too.
    */
  def run(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    val cols = pairs.columns
    val e0 = pairs.select(col(cols(0)).as("src"), col(cols(1)).as("dst"))
    val edges = e0.unionByName(
      e0.select(col("dst").as("src"), col("src").as("dst"))).persist()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("cluster", col("id")).persist()
    var prevSum = Option.empty[Long]
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // (a) propagate: min over own label and all neighbors' labels.
      // Aliases are load-bearing: labels derives from edges, and repeated
      // self-joins otherwise trip the ambiguous-attribute check.
      val prop = labels.as("l").join(edges.as("e"), col("l.id") === col("e.src"))
        .select(col("e.dst").as("id"), col("l.cluster").as("cluster"))
      val l1 = labels.unionByName(prop)
        .groupBy(col("id")).agg(min(col("cluster")).as("cluster"))
      // (b) shortcut: follow my label's label (pointer doubling). A no-op
      // on the first iteration (labels are still identity), so start at
      // iter 1. The invariant cluster <= id makes the left join total in
      // practice; coalesce covers nodes whose label is already a root.
      val l2 = (if (iter == 0) l1
        else l1.as("x").join(l1.as("y"), col("x.cluster") === col("y.id"), "left")
          .select(col("x.id").as("id"),
            least(col("x.cluster"),
              coalesce(col("y.cluster"), col("x.cluster"))).as("cluster")))
        .persist()
      val row = l2.agg(sum(col("cluster"))).first()
      val s0 = if (row.isNullAt(0)) 0L else row.getLong(0)
      converged = prevSum.contains(s0)
      prevSum = Some(s0)
      // Superseded label table is dead from here on — at 1e9 nodes each
      // generation is executor-memory-sized, so release it eagerly.
      labels.unpersist()
      labels = l2
      iter += 1
    }
    labels
  }
}
