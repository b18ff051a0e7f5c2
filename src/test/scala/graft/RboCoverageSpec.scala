package graft

import org.apache.spark.sql.Row

/** q311 RBO quantization fidelity + q312 modality coverage — JVM
  * replicas at sf0.001 and the metric properties (RBO of identical
  * rankings is the exact truncated-geometric mass; coverage accounting
  * balances under the injection).
  */
class RboCoverageSpec extends SparkSuite {

  /** The query's truncated RBO@10 at p = 1/2 over two ranked lists. */
  private def rbo(a: Seq[Long], b: Seq[Long]): Double =
    (1 to 10).map { d =>
      val ov = a.take(d).toSet.intersect(b.take(d).toSet).size
      0.5 * math.pow(0.5, d - 1.0) * ov / d
    }.sum

  test("q311 RBO reference: identical lists hit the truncated mass") {
    val ids = (1L to 10L).toSeq
    // Σ_{d=1..10} (1/2)^d = 1 − 2^-10 — exactly, p=1/2 is binary-exact.
    assert(rbo(ids, ids) == 1.0 - math.pow(2.0, -10))
    // Disjoint lists → 0; reversal loses most of the top-weighted mass.
    assert(rbo(ids, ids.map(_ + 100)) == 0.0)
    assert(rbo(ids, ids.reverse) < rbo(ids, ids))
  }

  test("q311 replica: per-probe RBO of quantized vs exact rankings") {
    val vecs = Tables.embeddings(spark, sfDir).collect().map { r =>
      (r.getLong(0), r.getSeq[Float](1).toArray)
    }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def qdot(a: Array[Float], b: Array[Float]): Long =
      a.zip(b).map { case (x, y) =>
        (math.floor(x.toDouble * 64) * math.floor(y.toDouble * 64)).toLong
      }.sum
    val exp = vecs.filter(_._1 % 5 == 0).map { case (pid, pe) =>
      val others = vecs.filter(_._1 != pid)
      val ax = others.map { case (cid, ce) => (cos(pe, ce), cid) }
        .sortBy { case (s, cid) => (-s, cid) }.take(10).map(_._2).toSeq
      val aq = others.map { case (cid, ce) => (qdot(pe, ce), cid) }
        .sortBy { case (s, cid) => (-s, cid) }.take(10).map(_._2).toSeq
      (pid, ax.toSet.intersect(aq.toSet).size.toLong,
        math.floor(rbo(ax, aq) * 1e9) / 1e9)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q311_rbo_quantization")(spark, sfDir)
      .collect().map { case Row(p: Long, o: Long, r: Double) => (p, o, r) }
    assert(got.toSeq == exp.toSeq)
    got.foreach { case (_, ov, r) =>
      assert(ov >= 0L && ov <= 10L)
      assert(r >= 0.0 && r <= 1.0)
    }
  }

  test("q312 replica: coverage balances under the failed-job injection") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "source")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val emb = Tables.embeddings(spark, sfDir).select("vec_id")
      .collect().map(_.getLong(0)).filter(_ % 7 != 0).toSet
    val exp = docs.groupBy(_._2).toSeq.sortBy(_._1).map { case (src, xs) =>
      (src, xs.length.toLong, xs.count(x => emb(x._1)).toLong)
    }
    val docIds = docs.map(_._1).toSet
    val orphans = emb.count(!docIds(_)).toLong
    val got = SparkEntry.queries("q312_modality_coverage")(spark, sfDir)
      .collect()
    assert(got.length == exp.length)
    got.zip(exp).foreach { case (Row(src: String, n: Long, ne: Long,
        nm: Long, cov: Double, orph: Long), (es, en, ene)) =>
      assert(src == es && n == en && ne == ene)
      assert(nm == n - ne)
      assert(cov == math.floor(ne.toDouble / n * 1e9) / 1e9)
      assert(orph == orphans)
      // The 1-in-7 injection must actually open a gap.
      assert(nm > 0L || n < 7L)
    }
  }
}
