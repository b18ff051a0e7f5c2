package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q283 CUSUM — the operator IS the closed-form reformulation
  * (S_t = y_t − min(0, min_{j≤t} y_j) for y_t = Σx − k·t), so the spec
  * proves it against the textbook recurrence S_t = max(0, S_{t−1} + x_t
  * − k) twice:
  *   1. on the real fixture, per event type, end-to-end through the
  *      registry query;
  *   2. on a synthetic series WITH an injected burst — the fixture's
  *      flat rates never alarm, so without this leg the alarm path
  *      (threshold crossing, first-alarm hour) would be untested. The
  *      same closed-form window expressions run over the synthetic
  *      frame and must match the loop exactly, alarm hours included.
  */
class CusumSpec extends SparkSuite {

  private def loop(xs: Seq[Long], k: Long): Seq[Long] =
    xs.scanLeft(0L)((s, x) => math.max(0L, s + x - k)).tail

  test("q283 closed form equals the textbook recurrence on the fixture") {
    val hourly = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("(ts div 1000) div 3600000000").as("hr"))
      .groupBy("event_type", "hr").agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = hourly.groupBy(_._1).map { case (t, rows) =>
      val xs = rows.sortBy(_._2).map(_._3).toSeq
      val hrs = rows.sortBy(_._2).map(_._2).toSeq
      val k = math.floor(xs.sum.toDouble / xs.size).toLong + 1
      val s = loop(xs, k)
      val alarms = s.zip(hrs).filter(_._1 > 4 * k)
      (t, (xs.size.toLong, k, alarms.size.toLong,
        alarms.headOption.map(_._2).getOrElse(-1L), s.max))
    }
    val got = SparkEntry.queries("q283_cusum_changepoint")(spark, sfDir)
      .collect().map { case Row(t: String, n: Long, k: Long, a: Long,
        f: Long, m: Long) => (t, (n, k, a, f, m)) }.toMap
    assert(got == want)
  }

  test("q283 alarm path: an injected burst fires where the loop says") {
    import spark.implicits._
    // Flat rate 2/hour with a 5-hour burst of 9 starting at hour 40.
    val xs = (1L to 80L).map(h => (h, if (h >= 40 && h < 45) 9L else 2L))
    val k = math.floor(xs.map(_._2).sum.toDouble / xs.size).toLong + 1
    val s = loop(xs.map(_._2), k)
    val wantAlarms = s.zip(xs.map(_._1)).filter(_._1 > 4 * k).map(_._2)
    assert(wantAlarms.nonEmpty, "burst must alarm in the reference loop")
    val wOrd = Window.orderBy(col("hr"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = xs.toDF("hr", "x")
      .withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("y", sum(col("x")).over(wRun) - lit(k) * col("rn"))
      .withColumn("cusum", col("y") - least(lit(0L), min(col("y")).over(wRun)))
      .filter(col("cusum") > lit(4 * k))
      .select("hr").collect().map(_.getLong(0)).toSeq.sorted
    assert(got == wantAlarms, s"alarm hours $got vs $wantAlarms")
  }
}
