package graft

import org.apache.spark.sql.Row

/** q293 Heaps'-law growth fit + q294 Cohen's kappa — JVM replicas at
  * sf0.001 plus formula-reference cases for kappa's cleared-integer
  * form.
  */
class HeapsKappaSpec extends SparkSuite {

  private def r9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q293 replica: checkpoint curve and OLS fit from the shingle stream") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1).split(" ")))
      .filter(_._2.length >= 3)
    val sh = docs.flatMap { case (id, w) =>
      w.sliding(3).map(g => (id, g.mkString(" ")))
    }
    val maxd = sh.map(_._1).max
    val cps = (1 to 16).map(i => (i.toLong, (maxd + 1) * i / 16))
    val perDoc = sh.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val firstDoc = sh.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val curve = cps.map { case (i, cp) =>
      (i, perDoc.filter(_._1 < cp).values.sum,
        firstDoc.values.count(_ < cp).toLong)
    }
    // The query's fold order: checkpoints ascending.
    val xs = curve.map(c => math.log(c._2.toDouble))
    val ys = curve.map(c => math.log(c._3.toDouble))
    val n = curve.length.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(x => x * x).sum
    val beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val Row(np: Long, tt: Long, tv: Long, gb: Double, glk: Double) =
      SparkEntry.queries("q293_heaps_law")(spark, sfDir).collect()(0)
    assert(np == 16L)
    assert(tt == curve.last._2 && tv == curve.last._3)
    assert(gb == r9(beta))
    assert(glk == r9((sy - beta * sx) / n))
    // Heaps exponent of a growing corpus sits strictly inside (0, 1].
    assert(gb > 0.0 && gb <= 1.0)
    // Both curve coordinates are monotone nondecreasing by construction.
    assert(curve.sliding(2).forall { case Seq(a, b) =>
      a._2 <= b._2 && a._3 <= b._3 })
  }

  /** The query's cleared-integer kappa. */
  private def kappa(a: Long, b: Long, c: Long, d: Long): Double = {
    val n = a + b + c + d
    val peNum = (a + b) * (a + c) + (c + d) * (b + d)
    (n * (a + d) - peNum).toDouble / (n * n - peNum).toDouble
  }

  test("q294 kappa formula: reference cases") {
    // Perfect agreement → 1 regardless of marginals.
    assert(kappa(7, 0, 0, 3) == 1.0)
    // Independent raters at 50/50 → 0: cells (25,25,25,25).
    assert(kappa(25, 25, 25, 25) == 0.0)
    // Textbook 2x2 (a=20,b=5,c=10,d=15): po=0.7, pe=0.5 → kappa=0.4.
    assert(math.abs(kappa(20, 5, 10, 15) - 0.4) < 1e-12)
  }

  test("q294 replica: cells and kappa from the document corpus") {
    val en = Set("the", "a", "value", "fast")
    val cells = Tables.documents(spark, sfDir).select("text", "lang")
      .collect().map { r =>
        val w = r.getString(0).split(" ")
        val pred = w.count(en) / w.length.toDouble > 0.05
        (pred, r.getString(1) == "en")
      }
    val a = cells.count(x => x._1 && x._2).toLong
    val b = cells.count(x => x._1 && !x._2).toLong
    val c = cells.count(x => !x._1 && x._2).toLong
    val dd = cells.count(x => !x._1 && !x._2).toLong
    val Row(ga: Long, gb: Long, gc: Long, gd: Long, gn: Long,
      po: Double, pe: Double, gk: Double) =
      SparkEntry.queries("q294_cohens_kappa")(spark, sfDir).collect()(0)
    assert((ga, gb, gc, gd) == ((a, b, c, dd)))
    assert(gn == a + b + c + dd)
    assert(po == math.floor((a + dd).toDouble / gn * 1e9) / 1e9)
    assert(gk == math.floor(kappa(a, b, c, dd) * 1e9) / 1e9)
    assert(gk >= -1.0 && gk <= 1.0 && pe > 0.0 && pe < 1.0)
  }
}
