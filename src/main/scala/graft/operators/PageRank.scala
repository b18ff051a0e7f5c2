package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic fixed-iteration PageRank over a directed edge list.
  *
  * rank'(v) = (1−d) + d · Σ_{(s→v)} rank(s)/outdeg(s), the classic
  * unnormalized formulation (Page et al. 1999): with rank₀ ≡ 1 the total
  * mass stays |V| every iteration when every node has out-degree ≥ 1
  * (the caller's contract here — feed a symmetrized edge list for
  * arbitrary graphs; a dangling-mass term is the standard extension).
  *
  * Determinism is the point of this implementation: the contribution sum
  * per node folds a SRC-SORTED collected list sequentially (the engine's
  * ordered-fold idiom — q141/q160), so the double addition order is
  * fixed regardless of partitioning, task order, or engine — a bare
  * SUM(double) would be partial-aggregation-order dependent and no two
  * runs would hash-match. Per-node list state is bounded by in-degree.
  *
  * Scale shape: edges+degree materialize once (persist) and every
  * iteration is ONE key-partitioned join + ONE aggregate shuffle —
  * ranks are node-sized, never edge-sized. Each generation is cut with
  * eager `localCheckpoint` (ConnectedComponents' lesson: persist keeps
  * lineage, and 10 chained iterations otherwise stack 10 joins into one
  * analyzer-exploding plan; production swaps reliable `checkpoint()`).
  */
object PageRank {

  /** @param edges distinct (src, dst) pairs; every node must appear as a
    *              src (out-degree ≥ 1). Self-loops are legal.
    */
  def run(edges: DataFrame, iterations: Int = 10,
      damping: Double = 0.85): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val withDeg = e.join(deg, Seq("src")).persist()
    val nodes = e.select(col("dst").as("node"))
      .union(e.select(col("src"))).distinct().persist()
    var ranks = nodes.withColumn("rank", lit(1.0)).localCheckpoint(true)
    (1 to iterations).foreach { _ =>
      val inMass = withDeg
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst"), col("src"),
          (col("rank") / col("deg").cast("double")).as("c"))
        .groupBy(col("dst").as("node"))
        .agg(aggregate(
          transform(sort_array(collect_list(struct(col("src"), col("c")))),
            x => x.getField("c")),
          lit(0.0), (a, x) => a + x).as("m"))
      val next = nodes.join(inMass, Seq("node"), "left")
        .select(col("node"),
          (lit(1.0 - damping) +
            lit(damping) * coalesce(col("m"), lit(0.0))).as("rank"))
        .localCheckpoint(true)
      ranks = next
    }
    withDeg.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    ranks
  }
}
