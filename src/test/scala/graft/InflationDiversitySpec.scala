package graft

import org.apache.spark.sql.Row

/** q297 dedup-inflation economics + q298 mixture diversity — JVM
  * replicas at sf0.001 plus the structural bounds the metrics promise
  * (entropy ≤ ln k, inverse-Simpson ≤ source count, injected cluster
  * sizes land where the injection puts them).
  */
class InflationDiversitySpec extends SparkSuite {

  test("q297 replica: histogram and savings from the injected corpus") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val corpus = docs ++
      docs.filter(_._1 % 10 == 0).map { case (id, t) => (id + 10000, t) } ++
      docs.filter(_._1 % 30 == 0).map { case (id, t) => (id + 20000, t) }
    val clusters = corpus.groupBy(_._2).toSeq.map { case (t, xs) =>
      (xs.length.toLong, t.length.toLong) }
    val hist = clusters.groupBy(_._1).view.mapValues { cs =>
      (cs.length.toLong, cs.map(c => c._1 * c._2).sum,
        cs.map(c => (c._1 - 1) * c._2).sum)
    }.toMap
    val tc = hist.values.map(_._2).sum
    val ec = hist.values.map(_._3).sum
    val got = SparkEntry.queries("q297_dedup_inflation")(spark, sfDir)
      .collect()
    assert(got.length == hist.size)
    got.foreach { case Row(k: Long, ncl: Long, nd: Long, t: Long,
        e: Long, sr: Double) =>
      val (encl, etc2, eec) = hist(k)
      assert(ncl == encl && nd == k * encl && t == etc2 && e == eec)
      assert(sr == math.floor(ec.toDouble / tc * 1e9) / 1e9)
    }
    // The injection puts every 30th doc in a size-3 cluster and every
    // other 10th doc in a size-2 cluster (absent natural dups, which
    // the replica would also see).
    assert(hist.contains(2L) && hist.contains(3L))
    assert(hist(3L)._1 == docs.count(_._1 % 30 == 0).toLong)
  }

  test("q298 replica: entropy/HHI/effective sources from token masses") {
    val masses = Tables.documents(spark, sfDir).select("source", "text")
      .collect().map(r => (r.getString(0),
        r.getString(1).split(" ").length.toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val n = masses.map(_._2).sum
    val ent = -masses.map { case (_, c) =>
      val p = c.toDouble / n; p * math.log(p) }.sum
    val hhiNum = masses.map(c => c._2 * c._2).sum
    val Row(ns: Long, nt: Long, ge: Double, gh: Double, gf: Double,
      gt: Double) =
      SparkEntry.queries("q298_mixture_diversity")(spark, sfDir)
        .collect()(0)
    assert(ns == masses.length.toLong && nt == n)
    assert(ge == math.floor(ent * 1e9) / 1e9)
    assert(gh == math.floor(hhiNum.toDouble / (n.toDouble * n) * 1e9) / 1e9)
    assert(gf == math.floor(n.toDouble * n / hhiNum * 1e9) / 1e9)
    assert(gt == math.floor(
      masses.map(_._2).max.toDouble / n * 1e9) / 1e9)
    // Bounds the metrics promise: H ≤ ln k, 1 ≤ eff ≤ k, HHI ≥ 1/k.
    assert(ge <= math.log(ns.toDouble) + 1e-12)
    assert(gf >= 1.0 && gf <= ns.toDouble + 1e-9)
    assert(gh >= 1.0 / ns - 1e-12 && gh <= 1.0)
  }
}
