package graft

import org.apache.spark.sql.Row

/** q323 quantile treatment effect + q324 max drawdown + q325 lang
  * vocab overlap — JVM replicas at sf0.001 against the sorted/scan
  * definitions.
  */
class QteDrawdownOverlapSpec extends SparkSuite {

  private lazy val purchases: Array[(Long, Long, Long)] =
    Tables.events(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .selectExpr("user_id", "(ts div 1000) div 86400000000 as dd",
        "cast(cast(value as decimal(18,2)) * 100 as long) as cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("q323 replica: per-variant quantiles and effects") {
    def q(xs: Seq[Long], p: Int): Long = {
      val s = xs.sorted; s(((s.length.toLong * p + 99) / 100 - 1).toInt)
    }
    val a = purchases.filter(_._1 % 2 == 0).map(_._3).toSeq
    val b = purchases.filter(_._1 % 2 != 0).map(_._3).toSeq
    val Row(na: Long, nb: Long, p50a: Long, p50b: Long, q50: Long,
      p90a: Long, p90b: Long, q90: Long, ate: Double) =
      SparkEntry.queries("q323_quantile_treatment_effect")(spark, sfDir)
        .collect()(0)
    assert(na == a.length.toLong && nb == b.length.toLong)
    assert(p50a == q(a, 50) && p50b == q(b, 50) && q50 == p50b - p50a)
    assert(p90a == q(a, 90) && p90b == q(b, 90) && q90 == p90b - p90a)
    val expAte = b.sum.toDouble / b.length - a.sum.toDouble / a.length
    assert(math.abs(ate - expAte) < 1e-6)
    // Quantiles are order statistics: p50 ≤ p90 per variant.
    assert(p50a <= p90a && p50b <= p90b)
  }

  test("q324 replica: drawdown walk from the sequential definition") {
    val daily = purchases.groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (dd, xs) => (dd, xs.map(_._3).sum) }
    var cum = 0L; var peak = Long.MinValue
    val walk = daily.map { case (dd, rev) =>
      cum += rev; peak = math.max(peak, cum); (dd, cum, peak, peak - cum)
    }
    val maxDd = walk.map(_._4).max
    val trough = walk.sortBy(x => (-x._4, x._1)).head
    val Row(nd: Long, fc: Long, md: Long, td: Long, pc: Long,
      ratio: Double) =
      SparkEntry.queries("q324_max_drawdown")(spark, sfDir).collect()(0)
    assert(nd == daily.length.toLong)
    assert(fc == walk.last._2)
    assert(md == maxDd)
    assert(td == trough._1 && pc == trough._3)
    assert(ratio == math.floor(maxDd.toDouble / trough._3 * 1e9) / 1e9)
    assert(md >= 0L && ratio >= 0.0 && ratio <= 1.0)
  }

  test("q325 replica: pairwise Jaccard of per-lang top-50 vocab") {
    val counts = Tables.documents(spark, sfDir).select("lang", "text")
      .collect().flatMap(r => r.getString(1).split(" ")
        .map(w => (r.getString(0), w)))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
    val top = counts.groupBy(_._1._1).view.mapValues { xs =>
      xs.map { case ((_, w), c) => (w, c) }
        .sortBy { case (w, c) => (-c, w) }.take(50).map(_._1).toSet
    }.toMap
    val langs = top.keys.toSeq.sorted
    val exp = (for {
      i <- langs.indices; j <- i + 1 until langs.length
      (la, lb) = (langs(i), langs(j))
      inter = top(la).intersect(top(lb)).size.toLong
      uni = top(la).size + top(lb).size - inter
    } yield (la, lb, inter, uni,
      math.floor(inter.toDouble / uni * 1e9) / 1e9))
      .filter(_._3 > 0)
    val got = SparkEntry.queries("q325_lang_vocab_overlap")(spark, sfDir)
      .collect().map { case Row(a: String, b: String, i: Long, u: Long,
        j: Double) => (a, b, i, u, j) }
    assert(got.toSeq == exp.toSeq)
    got.foreach { case (_, _, i, u, j) =>
      assert(i <= u && j >= 0.0 && j <= 1.0)
    }
  }
}
