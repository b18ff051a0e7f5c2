package graft

import org.apache.spark.sql.Row

/** q299 importance reweighting + q300 k-anonymity — JVM replicas at
  * sf0.001, the Kish-ESS Cauchy–Schwarz bound, and the uniform-weights
  * reference case.
  */
class ReweightAnonymitySpec extends SparkSuite {

  /** The query's ESS over (count, weight) cells, lang-sorted order. */
  private def ess(cells: Seq[(Double, Double)]): Double = {
    val s1 = cells.map { case (a, w) => a * w }.sum
    val s2 = cells.map { case (a, w) => a * w * w }.sum
    s1 * s1 / s2
  }

  test("q299 reference: uniform weights give ESS = n exactly") {
    val cells = Seq((10.0, 1.0), (20.0, 1.0), (5.0, 1.0))
    assert(ess(cells) == 35.0)
    // Degenerate mass on one cell: ESS collapses toward that cell.
    assert(ess(Seq((10.0, 1.0), (10.0, 0.0))) == 10.0)
  }

  test("q299 replica: weights and ESS from the parity cells") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val cells = docs.groupBy(_._2).toSeq.sortBy(_._1).map { case (l, xs) =>
      (l, xs.count(_._1 % 2 == 0).toLong, xs.count(_._1 % 2 != 0).toLong)
    }
    val nRef = cells.map(_._2).sum
    val nCur = cells.map(_._3).sum
    val ws = cells.map { case (_, a, b) =>
      (a.toDouble, b.toDouble * nRef / (a.toDouble * nCur)) }
    val e = ess(ws)
    val got = SparkEntry.queries("q299_importance_reweight")(spark, sfDir)
      .collect()
    assert(got.length == cells.length)
    got.zip(cells).foreach { case (Row(lang: String, a: Long, b: Long,
        w: Double, ge: Double, gr: Double), (el, ea, eb)) =>
      assert(lang == el && a == ea && b == eb)
      assert(w == math.floor(
        eb.toDouble * nRef / (ea.toDouble * nCur) * 1e9) / 1e9)
      assert(ge == math.floor(e * 1e6) / 1e6)
      assert(gr == math.floor(e / nRef * 1e9) / 1e9)
      // Kish ESS obeys Cauchy–Schwarz: 0 < ESS ≤ n_ref.
      assert(ge > 0.0 && ge <= nRef + 1e-6)
      assert(gr > 0.0 && gr <= 1.0 + 1e-12)
    }
  }

  test("q300 replica: k-anonymity and l-diversity from the QI classes") {
    val base = Tables.documents(spark, sfDir)
      .select("source", "lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2) / 100))
    val classes = base.groupBy(identity).values.map(_.length.toLong).toSeq
    val lDiv = base.groupBy(x => (x._1, x._3)).values
      .map(_.map(_._2).distinct.length.toLong).min
    val Row(nd: Long, ncl: Long, k: Long, risk: Long, share: Double,
      l: Long) =
      SparkEntry.queries("q300_k_anonymity")(spark, sfDir).collect()(0)
    assert(nd == base.length.toLong)
    assert(ncl == classes.length.toLong)
    assert(k == classes.min)
    assert(risk == classes.filter(_ < 5).sum)
    assert(share == math.floor(risk.toDouble / nd * 1e9) / 1e9)
    assert(l == lDiv)
    // Structural bounds: min class ≤ avg class, risk share in [0,1],
    // l-diversity bounded by the lang alphabet.
    assert(k <= nd / ncl)
    assert(share >= 0.0 && share <= 1.0)
    assert(l >= 1L && l <= 5L)
  }
}
