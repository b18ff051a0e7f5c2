package graft

import org.apache.spark.sql.Row

/** q328 power analysis — the closed form pinned to a textbook
  * reference case, plus a full fixture replica.
  */
class PowerAnalysisSpec extends SparkSuite {

  private def nPerArm(p1: Double, p2: Double): Long = {
    val z = 1.959964 + 0.841621
    math.ceil(z * z * (p1 * (1 - p1) + p2 * (1 - p2))
      / ((p2 - p1) * (p2 - p1))).toLong
  }

  test("q328 reference: textbook two-proportion sample size") {
    // Detecting 0.10 → 0.15 at α=.05 two-sided, power .80: the
    // standard tables give ~685 per arm with this (unpooled) form.
    val n = nPerArm(0.10, 0.15)
    assert(n >= 670 && n <= 700, s"reference case off: $n")
    // A smaller effect needs more samples — monotonicity.
    assert(nPerArm(0.10, 0.12) > nPerArm(0.10, 0.15))
  }

  test("q328 replica: planner row from the measured baseline") {
    val users = Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_type",
        "(ts div 1000) div 86400000000 as dd")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = users.groupBy(_._1)
    val nU = byUser.size.toLong
    val nC = byUser.values.count(_.exists(_._2 == "purchase")).toLong
    val nD = users.map(_._3).distinct.length.toLong
    val p1 = nC.toDouble / nU
    val exp = nPerArm(p1, p1 * 0.9)
    val Row(gu: Long, gc: Long, gd: Long, br: Double, mde: Double,
      npa: Long, dtp: Long) =
      SparkEntry.queries("q328_power_analysis")(spark, sfDir)
        .collect()(0)
    assert(gu == nU && gc == nC && gd == nD)
    assert(br == math.floor(p1 * 1e9) / 1e9)
    assert(mde == math.floor((p1 - p1 * 0.9) * 1e9) / 1e9)
    assert(npa == exp)
    assert(dtp == math.ceil(exp * 2.0 / (nU.toDouble / nD)).toLong)
    assert(npa > 0L && dtp > 0L)
  }
}
