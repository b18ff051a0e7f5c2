package graft

import org.apache.spark.sql.Row

/** q307 pinball-loss eval + q308 Hodges–Lehmann — JVM replicas at
  * sf0.001 against the sorted-order-statistic definitions, plus the
  * estimator properties (HL between min and max Walsh average; the
  * pinball minimizer IS the quantile on the calibration half).
  */
class PinballHodgesSpec extends SparkSuite {

  test("q307 replica: per-source p90 forecast and pinball loss") {
    val base = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val exp = base.groupBy(_._2).toSeq.sortBy(_._1).flatMap {
      case (src, xs) =>
        val cal = xs.filter(_._1 % 2 == 0).map(_._3).sorted
        val ev = xs.filter(_._1 % 2 != 0).map(_._3)
        if (cal.isEmpty || ev.isEmpty) None else {
          // smallest y with 10·rank ≥ 9·n — the query's cum rule.
          val k = (9 * cal.length + 9) / 10
          val yhat = cal(k - 1)
          val pin = ev.map(y =>
            if (y >= yhat) (y - yhat) * 9 else yhat - y).sum
          val cov = ev.count(_ <= yhat).toLong
          Some((src, cal.length.toLong, yhat, ev.length.toLong, pin, cov))
        }
    }
    val got = SparkEntry.queries("q307_pinball_eval")(spark, sfDir)
      .collect()
    assert(got.length == exp.length)
    got.zip(exp).foreach { case (Row(src: String, nc: Long, yh: Long,
        ne: Long, p10: Long, mp: Double, cov: Double),
        (es, enc, eyh, ene, ep, ecov)) =>
      assert(src == es && nc == enc && yh == eyh && ne == ene)
      assert(p10 == ep)
      assert(mp == math.floor(ep.toDouble / (ene * 10) * 1e9) / 1e9)
      assert(cov == math.floor(ecov.toDouble / ene * 1e9) / 1e9)
      // The p90 forecast of same-generator data must cover most of the
      // held-out half (generously banded for tiny strata).
      assert(cov >= 0.5)
    }
    // On the CALIBRATION half the chosen quantile minimizes pinball
    // loss among observed candidate thresholds — the scoring-rule
    // property that justifies the estimator.
    val all = base.filter(_._1 % 2 == 0).map(_._3).sorted
    val k = (9 * all.length + 9) / 10
    val q90 = all(k - 1)
    def pin(t: Long) =
      all.map(y => if (y >= t) (y - t) * 9L else t - y).sum
    assert(all.distinct.forall(t => pin(q90) <= pin(t)))
  }

  test("q308 replica: HL is the median Walsh average of daily revenue") {
    val daily = Tables.events(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .selectExpr("(ts div 1000) div 86400000000 as dd",
        "cast(cast(value as decimal(18,2)) * 100 as long) as cents")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).toSeq.map { case (dd, xs) => (dd, xs.map(_._2).sum) }
    val revs = daily.sortBy(_._1).map(_._2)
    val w2 = for (i <- revs.indices; j <- i until revs.length)
      yield revs(i) + revs(j)
    val sorted = w2.sorted
    val med = sorted((sorted.length + 1) / 2 - 1)
    val Row(nd: Long, np: Long, wm: Long, hl: Double, mean: Double) =
      SparkEntry.queries("q308_hodges_lehmann")(spark, sfDir)
        .collect()(0)
    assert(nd == revs.length.toLong)
    assert(np == (revs.length.toLong * (revs.length + 1)) / 2)
    assert(wm == med)
    assert(hl == med.toDouble / 2.0)
    assert(mean == math.floor(
      revs.sum.toDouble / revs.length * 1e9) / 1e9)
    // Location estimator: HL sits inside the data range.
    assert(hl >= revs.min.toDouble && hl <= revs.max.toDouble)
  }
}
