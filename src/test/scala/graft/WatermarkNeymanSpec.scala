package graft

import org.apache.spark.sql.Row

/** q301 watermark planner + q302 Neyman allocation — JVM replicas at
  * sf0.001: the sequential-scan definition of lateness (the thing the
  * two-phase decomposition must equal), and the full Neyman pipeline
  * from exact moment sums through Hamilton seats.
  */
class WatermarkNeymanSpec extends SparkSuite {

  test("q301 replica: sequential-scan lateness quantiles") {
    val ev = Tables.events(spark, sfDir).select("event_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    var hi = Long.MinValue
    val late = ev.map { case (_, ts) =>
      hi = math.max(hi, ts); (hi - ts) / 1000000L
    }
    val n = late.length.toLong
    val sorted = late.sorted
    def q(p: Int): Long = sorted(((n * p + 99) / 100 - 1).toInt)
    val Row(ne: Long, nl: Long, p50: Long, p95: Long, p99: Long,
      mx: Long) =
      SparkEntry.queries("q301_watermark_planner")(spark, sfDir)
        .collect()(0)
    assert(ne == n)
    assert(nl == late.count(_ > 0).toLong)
    assert(p50 == q(50) && p95 == q(95) && p99 == q(99))
    assert(mx == sorted.last)
    assert(p50 <= p95 && p95 <= p99 && p99 <= mx)
  }

  test("q302 replica: Neyman weights, Hamilton seats, design effect") {
    val rows = Tables.events(spark, sfDir).select("event_type", "value")
      .collect().map(r => (r.getString(0),
        BigDecimal(r.getDouble(1)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact))
    val strata = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, xs) =>
      val cs = xs.map(_._2)
      val n = cs.length.toDouble
      // dvar's exact spelling: decimal moment sums, double arithmetic.
      val sx = cs.sum.toDouble
      val sxx = cs.map(c => c * c).sum.toDouble
      val s = math.sqrt((sxx - sx * sx / n) / (n - 1.0))
      (t, cs.length.toLong, s)
    }
    val wq = strata.map { case (t, nh, s) =>
      (t, nh, s, math.floor(nh.toDouble * s * 1e6).toLong) }
    val wTotal = wq.map(_._4).sum
    val nTotal = wq.map(_._2).sum
    val base = wq.map { case (t, nh, s, w) =>
      (t, nh, s, w, 200L * w / wTotal, 200L * w % wTotal) }
    val seats = 200L - base.map(_._5).sum
    val extraSet = base.sortBy { case (t, _, _, _, _, rem) => (-rem, t) }
      .take(seats.toInt).map(_._1).toSet
    // Design effect from the type-sorted fold order.
    val ws = strata.map { case (_, nh, s) => (nh.toDouble / nTotal, s) }
    val s1 = ws.map { case (w, s) => w * s }.sum
    val s2 = ws.map { case (w, s) => w * s * s }.sum
    val deff = s1 * s1 / s2
    val got = SparkEntry.queries("q302_neyman_allocation")(spark, sfDir)
      .collect()
    assert(got.length == base.length)
    got.zip(base).foreach { case (Row(t: String, nh: Long, s6: Double,
        w: Long, bq: Long, ex: Long, al: Long, gd: Double),
        (et, enh, es, ew, ebq, _)) =>
      assert(t == et && nh == enh && w == ew && bq == ebq)
      assert(s6 == math.floor(es * 1e6) / 1e6)
      assert(ex == (if (extraSet(et)) 1L else 0L))
      assert(al == bq + ex)
      assert(gd == math.floor(deff * 1e9) / 1e9)
      // Cauchy–Schwarz: reweighting can only help → deff ≤ 1.
      assert(gd > 0.0 && gd <= 1.0 + 1e-12)
    }
    // Hamilton conserves the budget exactly.
    assert(got.map(_.getLong(6)).sum == 200L)
  }
}
