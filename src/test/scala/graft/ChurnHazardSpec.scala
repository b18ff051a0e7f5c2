package graft

import org.apache.spark.sql.Row

/** q329 churn hazard — replica from per-user spans plus the two
  * conservation laws the construction guarantees: every user churns in
  * exactly one tenure week (Σ churned = users), and the Kaplan–Meier
  * product of the km_factor column telescopes to zero survival at the
  * horizon (the last week's hazard is exactly 1).
  */
class ChurnHazardSpec extends SparkSuite {

  test("q329 replica: hazard table from per-user spans") {
    val spans = Tables.events(spark, sfDir)
      .selectExpr("user_id", "(ts div 1000) div 86400000000 as dd")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values
      .map(xs => (xs.map(_._2).max - xs.map(_._2).min) / 7).toSeq
    val g = spans.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    val exp = g.zipWithIndex.map { case ((w, c), i) =>
      val atRisk = g.drop(i).map(_._2).sum
      (w, c, atRisk, math.floor(c.toDouble / atRisk * 1e9) / 1e9)
    }
    val got = SparkEntry.queries("q329_churn_hazard")(spark, sfDir)
      .collect()
    assert(got.length == exp.length)
    got.zip(exp).foreach { case (Row(w: Long, c: Long, ar: Long,
        h: Double, km: Double), (ew, ec, ear, eh)) =>
      assert(w == ew && c == ec && ar == ear)
      assert(h == eh)
      assert(math.abs(km - (1.0 - h)) < 2e-9)
      assert(h > 0.0 && h <= 1.0)
    }
    // Conservation: every user churns exactly once; the first at-risk
    // pool is the full user base; the final hazard is exactly 1.
    assert(got.map(_.getLong(1)).sum == spans.length.toLong)
    assert(got.head.getLong(2) == spans.length.toLong)
    assert(got.last.getDouble(3) == 1.0)
  }
}
