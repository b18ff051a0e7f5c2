package graft

import org.apache.spark.sql.Row

/** q303 domain KL signature + q304 centroid silhouette — JVM replicas
  * at sf0.001 with the information-theoretic bounds each metric
  * promises (Gibbs: KL ≥ 0; silhouette ∈ [−1, 1]).
  */
class KlSilhouetteSpec extends SparkSuite {

  test("q303 replica: per-source KL over the fixed top-64 vocab") {
    val tok = Tables.documents(spark, sfDir).select("source", "text")
      .collect().flatMap(r => r.getString(1).split(" ")
        .map(w => (r.getString(0), w)))
    val corpus = tok.groupBy(_._2).view.mapValues(_.length.toLong).toSeq
    val top = corpus.sortBy { case (w, c) => (-c, w) }.take(64)
    val cqTot = top.map(_._2).sum
    val topSet = top.map(_._1).toSet
    val bySource = tok.filter(x => topSet(x._2)).groupBy(_._1)
    val exp = bySource.toSeq.map { case (src, xs) =>
      val cp = xs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val cpTot = cp.values.sum
      // The query's fold order: signature words sorted ascending.
      val v = top.length
      val kl = top.map(_._1).sorted.map { w =>
        val p = (cp.getOrElse(w, 0L) + 1).toDouble / (cpTot + v)
        val q = (top.toMap.apply(w) + 1).toDouble / (cqTot + v)
        p * math.log(p / q)
      }.sum
      (src, math.floor(kl * 1e9) / 1e9)
    }
    val got = SparkEntry.queries("q303_domain_kl_signature")(spark, sfDir)
      .collect().map { case Row(s: String, k: Double) => (s, k) }
    assert(got.sortBy(_._1).toSeq == exp.sortBy(_._1))
    // Gibbs' inequality: smoothed KL is strictly nonnegative (the
    // fpTrunc floor can only shave toward zero from above).
    got.foreach { case (_, k) => assert(k >= -1e-9) }
    // Output is ranked most-distinctive first.
    assert(got.map(_._2).toSeq == got.map(_._2).sortBy(x => -x).toSeq)
  }

  test("q304 replica: micro silhouette from integer-unit distances") {
    val vecs = Tables.embeddings(spark, sfDir).collect().map { r =>
      (r.getLong(0), r.getSeq[Float](1).toArray
        .map(x => math.floor(x.toDouble * 1e6).toLong), r.getInt(2).toLong)
    }
    val dims = vecs.head._2.length
    val cents = vecs.groupBy(_._3).view.mapValues { xs =>
      Array.tabulate(dims)(p =>
        math.floor(xs.map(_._2(p)).sum.toDouble / xs.length).toLong)
    }.toMap
    def d2(v: Array[Long], c: Array[Long]): Long =
      v.zip(c).map { case (x, u) => (x - u) * (x - u) }.sum
    val perLabel = vecs.map { case (_, v, l) =>
      val a = d2(v, cents(l))
      val b = cents.collect { case (cl, c) if cl != l => d2(v, c) }.min
      (l, a, b)
    }.groupBy(_._1).toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q304_centroid_silhouette")(spark, sfDir)
      .collect()
    assert(got.length == perLabel.length)
    got.zip(perLabel).foreach { case (Row(lab: Long, n: Long, mis: Long,
        ms: Double, sil: Double), (el, xs)) =>
      assert(lab == el && n == xs.length.toLong)
      assert(mis == xs.count(x => x._3 < x._2).toLong)
      val num = xs.map(x => x._3 - x._2).sum
      val den = xs.map(x => math.max(x._2, x._3)).sum
      assert(sil == math.floor(num.toDouble / den * 1e9) / 1e9)
      assert(ms == math.floor(mis.toDouble / n * 1e9) / 1e9)
      // Silhouette is bounded by construction.
      assert(sil >= -1.0 && sil <= 1.0)
    }
    // Noise embeddings vs 10 labels: classes are NOT separable, so the
    // aggregate silhouette must sit near/below zero — a strongly
    // positive value would mean the metric (or the labels) broke.
    val sils = got.map(_.getDouble(4))
    assert(sils.max < 0.5, s"noise classes scored separable: ${sils.max}")
  }
}
