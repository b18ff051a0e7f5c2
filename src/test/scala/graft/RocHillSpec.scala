package graft

import org.apache.spark.sql.Row

/** q326 ROC curve + q327 Hill tail index — JVM replicas at sf0.001
  * plus the curve monotonicity (TPR and FPR are nonincreasing in the
  * threshold) and the Hill estimator's exact-Pareto reference case.
  */
class RocHillSpec extends SparkSuite {

  test("q326 replica: confusion cells at decile thresholds; monotone curve") {
    val base = Tables.documents(spark, sfDir)
      .select("n_chars", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1) == "en"))
    val n = base.length
    val sorted = base.map(_._1).sorted
    def thr(dec: Int): Long = sorted(((n.toLong * dec + 9) / 10 - 1).toInt)
    val got = SparkEntry.queries("q326_roc_curve")(spark, sfDir)
      .collect()
    assert(got.length == (1 to 9).map(thr).distinct.size
      || got.length == 9)
    got.foreach { case Row(dec: Long, t: Long, tp: Long, fp: Long,
        fn: Long, tn: Long, tpr: Double, fpr: Double, prec: Double,
        j: Double) =>
      assert(t == thr(dec.toInt))
      assert(tp == base.count(x => x._1 >= t && x._2).toLong)
      assert(fp == base.count(x => x._1 >= t && !x._2).toLong)
      assert(fn == base.count(x => x._1 < t && x._2).toLong)
      assert(tn == base.count(x => x._1 < t && !x._2).toLong)
      assert(tp + fp + fn + tn == n.toLong)
      assert(tpr == math.floor(tp.toDouble / (tp + fn) * 1e9) / 1e9)
      assert(fpr == math.floor(fp.toDouble / (fp + tn) * 1e9) / 1e9)
      assert(prec == math.floor(tp.toDouble / (tp + fp) * 1e9) / 1e9)
      assert(math.abs(j - (tpr - fpr)) < 2e-9)
    }
    // Raising the threshold can only shrink the kept set → both rates
    // nonincreasing in dec.
    val byDec = got.sortBy(_.getLong(0))
    byDec.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(6) >= b.getDouble(6) - 1e-12)
      assert(a.getDouble(7) >= b.getDouble(7) - 1e-12)
    }
  }

  /** The query's Hill form over a sorted descending sample. */
  private def hill(top: Seq[Long], k: Int): Double = {
    val xk1 = top(k)
    k / top.take(k).map(x => math.log(x.toDouble / xk1)).sum
  }

  test("q327 Hill reference: exact Pareto quantiles recover alpha") {
    // x_(i) = (n/i)^(1/a) quantiles of Pareto(α = 2), n = 10000:
    // Hill on the top-100 must land near 2.
    val a = 2.0
    val xs = (1 to 101).map(i =>
      (1e6 * math.pow(10000.0 / i, 1 / a)).toLong)
    val est = hill(xs, 100)
    assert(math.abs(est - a) < 0.15, s"Hill off on exact Pareto: $est")
  }

  test("q327 replica: top-100 order statistics from the fixture") {
    val cents = Tables.events(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .selectExpr("cast(cast(value as decimal(18,2)) * 100 as long) as c")
      .collect().map(_.getLong(0)).sorted(Ordering[Long].reverse)
    val top = cents.take(101).toSeq
    // The query folds ascending; replicate its order exactly.
    val logSum = top.take(100).sorted
      .map(x => math.log(x.toDouble / top(100))).sum
    val Row(nt: Long, xk1: Long, xmax: Long, ls: Double, ha: Double) =
      SparkEntry.queries("q327_hill_tail_index")(spark, sfDir)
        .collect()(0)
    assert(nt == 101L && xk1 == top(100) && xmax == top.head)
    assert(ls == math.floor(logSum * 1e9) / 1e9)
    assert(ha == math.floor(100.0 / logSum * 1e9) / 1e9)
    assert(ha > 0.0)
  }
}
