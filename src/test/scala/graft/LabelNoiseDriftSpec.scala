package graft

import org.apache.spark.sql.Row

/** q287 kNN label agreement + q290 embedding drift — both queries are
  * metric formulas over the embeddings fixture, so each gets a full
  * JVM replica at sf0.001 (the house MinhashReplicaSpec discipline):
  * recompute the metric from the raw parquet with plain Scala
  * arithmetic that spells the SAME fold/quantization order the query
  * uses, then require exact equality on every integer column and
  * fpTrunc-replicated equality on the doubles. Plus structural
  * invariants that hold at any SF.
  */
class LabelNoiseDriftSpec extends SparkSuite {

  private lazy val vecs: Array[(Long, Array[Float], Int)] =
    Tables.embeddings(spark, sfDir).collect().map { r =>
      (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2))
    }

  /** Left-to-right double fold — the cosineSim kernel's order. */
  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("q287 replica: per-label agreement equals brute-force kNN vote") {
    // Brute-force: for each probe (vec_id % 5 == 0) rank every other
    // vector by (cos desc, cid), count label agreement in the top 10.
    val byLabel = vecs.filter(_._1 % 5 == 0).map { case (pid, pe, plab) =>
      val top = vecs.filter(_._1 != pid)
        .map { case (cid, ce, clab) => (cos(pe, ce), cid, clab) }
        .sortBy { case (s, cid, _) => (-s, cid) }
        .take(10)
      (plab, top.count(_._3 == plab).toLong)
    }.groupBy(_._1).toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q287_knn_label_agreement")(spark, sfDir)
      .collect()
    assert(got.length == byLabel.length)
    got.zip(byLabel).foreach {
      case (Row(lab: Long, np: Long, at: Long, ns: Long, ag: Double),
            (elab, probes)) =>
        assert(lab == elab.toLong)
        assert(np == probes.length.toLong)
        assert(at == probes.map(_._2).sum)
        assert(ns == probes.count(_._2 <= 2).toLong)
        assert(ag == math.floor(at.toDouble / (np * 10.0) * 1e9) / 1e9)
        assert(ag >= 0.0 && ag <= 1.0)
    }
  }

  test("q290 replica: drift moments equal the quantized-mean recompute") {
    // Same quantization the query spells: xu = floor(x·1e6) once, then
    // mu = floor(exact-int-sum / count) per (parity half, dim).
    val dims = vecs.head._2.length
    def mu(parity: Int): Array[Long] = {
      val half = vecs.filter(v => (v._1 % 2).toInt == parity)
      Array.tabulate(dims) { p =>
        val su = half.map(v => math.floor(v._2(p).toDouble * 1e6).toLong).sum
        math.floor(su.toDouble / half.length.toDouble).toLong
      }
    }
    val (mr, mc) = (mu(0), mu(1))
    val dot = mr.zip(mc).map { case (a, b) => a * b }.sum
    val na = mr.map(a => a * a).sum
    val nb = mc.map(b => b * b).sum
    val diffs = mr.zip(mc).map { case (a, b) => math.abs(a - b) }
    val Row(nRef: Long, nCur: Long, dotU: Long, l1: Long, linf: Long,
      shifted: Long, cc: Double, nr: Double) =
      SparkEntry.queries("q290_embedding_drift")(spark, sfDir).collect()(0)
    assert(nRef == vecs.count(_._1 % 2 == 0).toLong)
    assert(nCur == vecs.count(_._1 % 2 == 1).toLong)
    assert(dotU == dot)
    assert(l1 == diffs.sum)
    assert(linf == diffs.max)
    assert(shifted == diffs.count(_ > 10000L).toLong)
    assert(cc == math.floor(
      dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
        * 1e9) / 1e9)
    assert(nr == math.floor(
      math.sqrt(na.toDouble) / math.sqrt(nb.toDouble) * 1e9) / 1e9)
    // Structural invariants (any SF): cosine in [-1,1], positive norm
    // ratio, L∞ ≤ L1 ≤ dims·L∞, shifted-dim count bounded by dims.
    assert(cc >= -1.0 && cc <= 1.0)
    assert(nr > 0.0)
    assert(linf <= l1 && l1 <= dims.toLong * linf)
    assert(shifted >= 0L && shifted <= dims.toLong)
  }
}
