package graft

import org.apache.spark.sql.Row

/** q286 cluster agreement — the query's value is the METRIC FORMULA
  * (integer cleared-denominator ARI + purity over a contingency
  * table), so the spec pins the formula to its reference semantics:
  *   1. a Scala twin of the exact integer expression, checked against
  *      the cases that define ARI — identical partitions → 1 (under
  *      any relabeling), the textbook 6-point example → 8/33, a
  *      transpose-symmetry check (ARI is symmetric in its arguments).
  *   2. fixture invariants on the live query: n equals the corpus,
  *      purity is the fpTrunc of purity_num/n, ARI sits in the
  *      near-chance band (the embeddings are synthetic noise vs 10
  *      labels — a large |ARI| would mean the formula or the
  *      assignment broke).
  */
class ClusterAgreementSpec extends SparkSuite {

  /** The same cleared-denominator integer ARI as the query. */
  private def ari(ct: Map[(Int, Int), Long]): Double = {
    def c2(x: Long) = x * (x - 1) / 2
    val n = ct.values.sum
    val sumIj = ct.values.map(c2).sum
    val sumA = ct.groupBy(_._1._1).values.map(v => c2(v.values.sum)).sum
    val sumB = ct.groupBy(_._1._2).values.map(v => c2(v.values.sum)).sum
    val c2n = c2(n)
    (2.0 * c2n * sumIj - 2.0 * sumA * sumB) /
      (c2n.toDouble * (sumA + sumB) - 2.0 * sumA * sumB)
  }

  test("q286 ARI formula: reference cases") {
    // Identical partitions (3 groups of 2, 3, 4) → exactly 1.
    val ident = Map((0, 0) -> 2L, (1, 1) -> 3L, (2, 2) -> 4L)
    assert(ari(ident) == 1.0)
    // Relabeling invariance: same partition, permuted cluster ids.
    val relab = Map((0, 2) -> 2L, (1, 0) -> 3L, (2, 1) -> 4L)
    assert(ari(relab) == 1.0)
    // Textbook 6-point case: labels (a,a,a,b,b,b), clusters
    // (1,1,2,2,3,3): contingency [[2,1,0],[0,1,2]] → sumIj 2, sumA 6,
    // sumB 3, C(6,2) = 15 → ARI = (60−36)/(135−36) = 8/33 ≈ 0.2424.
    val mixed = Map((0, 0) -> 2L, (0, 1) -> 1L, (1, 1) -> 1L,
      (1, 2) -> 2L)
    assert(math.abs(ari(mixed) - 8.0 / 33.0) < 1e-12)
    // Symmetry: transposing labels/clusters leaves ARI unchanged.
    val t = mixed.map { case ((i, j), v) => ((j, i), v) }
    assert(math.abs(ari(mixed) - ari(t)) < 1e-12)
  }

  test("q286 fixture invariants") {
    val Row(n: Long, nl: Long, nc: Long, pn: Long, p: Double, a: Double) =
      SparkEntry.queries("q286_cluster_agreement")(spark, sfDir)
        .collect()(0)
    val corpus = Tables.embeddings(spark, sfDir).count()
    assert(n == corpus)
    assert(nl >= 2 && nc >= 2 && nc <= 4)
    assert(p == math.floor(pn.toDouble / n * 1e9) / 1e9)
    assert(pn >= n / nl, "purity below the uniform floor")
    assert(math.abs(a) < 0.2,
      s"noise embeddings scored far from chance: ari = $a")
  }
}
