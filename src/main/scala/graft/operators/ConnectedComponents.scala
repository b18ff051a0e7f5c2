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
    * @param strict when true, reaching maxIter without a fixpoint throws
    *               IllegalStateException instead of only warning — callers
    *               that must not ship an under-merged clustering (q76) can
    *               detect non-convergence programmatically rather than
    *               relying on a stderr line the harness may drop.
    * @return (id, cluster) — cluster is the minimum id reachable from id;
    *         isolated nodes (absent from pairs) are absent here too.
    */
  def run(pairs: DataFrame, maxIter: Int = 25, strict: Boolean = false): DataFrame = {
    val cols = pairs.columns
    val e0 = pairs.select(col(cols(0)).as("src"), col(cols(1)).as("dst"))
    val sym = e0.unionByName(
      e0.select(col("dst").as("src"), col("src").as("dst")))
    // Self-loops make the propagation join self-contained: each node
    // receives its own current label through the same join that delivers
    // its neighbors' labels, so the loop needs no union with the previous
    // generation (a union of a checkpointed plan with its own derivation
    // trips Catalyst's constraint rewriting).
    val nodes = sym.select(col("src")).distinct()
    val edges = sym.unionByName(
      nodes.select(col("src"), col("src").as("dst"))).persist()
    // localCheckpoint (eager), not persist: the shortcut join references
    // the previous generation TWICE, so without truncation the logical
    // plan doubles every iteration and analyzer/optimizer time grows
    // exponentially with iteration count — persist caches data but keeps
    // the full lineage. Checkpointing materializes AND cuts the plan to a
    // scan of the cached partitions. (In a fault-tolerant production run,
    // swap for reliable `checkpoint()` against a checkpoint dir — same
    // shape, survives executor loss.)
    var labels = nodes.select(col("src").as("id"))
      .withColumn("cluster", col("id")).localCheckpoint(true)
    var prevSum = Option.empty[Long]
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // (a) propagate: min over own label and all neighbors' labels (the
      // self-loop delivers "own"). Aliases are load-bearing: repeated
      // self-joins otherwise trip the ambiguous-attribute check.
      val l1 = labels.as("l").join(edges.as("e"), col("l.id") === col("e.src"))
        .select(col("e.dst").as("id"), col("l.cluster").as("cluster"))
        .groupBy(col("id")).agg(min(col("cluster")).as("cluster"))
      // (b) shortcut: follow my label's label (pointer doubling). A no-op
      // on the first iteration (labels are still identity), so start at
      // iter 1. The invariant cluster <= id makes the left join total in
      // practice; coalesce covers nodes whose label is already a root.
      // l1 is referenced TWICE by the shortcut self-join, and exchange
      // reuse does not reliably kick in across the aliased sides under
      // AQE — without its own checkpoint the propagate join (the
      // edge-sized pass) executed twice per iteration (profiled at ~40%
      // of q269's CC wall before the fix).
      val l2 = (if (iter == 0) l1
        else {
          val l1c = l1.localCheckpoint(true)
          l1c.as("x").join(l1c.as("y"), col("x.cluster") === col("y.id"), "left")
            .select(col("x.id").as("id"),
              least(col("x.cluster"),
                coalesce(col("y.cluster"), col("x.cluster"))).as("cluster"))
        })
        .localCheckpoint(true)
      val row = l2.agg(sum(col("cluster"))).first()
      val s0 = if (row.isNullAt(0)) 0L else row.getLong(0)
      converged = prevSum.contains(s0)
      prevSum = Some(s0)
      // The superseded generation's blocks are dead from here on; the
      // ContextCleaner reclaims them once unreferenced.
      labels = l2
      iter += 1
    }
    // labels is a localCheckpoint scan — it no longer references edges, so
    // the cached edge blocks are dead the moment the loop exits. Without
    // this every run() leaks a persisted frame for the session lifetime
    // (this is a reusable library API; callers can't reach the persist).
    edges.unpersist(blocking = false)
    // Reaching maxIter without a fixpoint means labels may be under-merged
    // (high-diameter graph or too-small maxIter) — surface it instead of
    // silently returning a wrong clustering.
    if (!converged) {
      val msg = s"[ConnectedComponents] no fixpoint after $maxIter iterations — " +
        "labels may be under-merged; raise maxIter"
      if (strict) throw new IllegalStateException(msg)
      System.err.println(s"WARNING: $msg")
    }
    labels
  }
}
