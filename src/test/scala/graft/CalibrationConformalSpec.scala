package graft

import org.apache.spark.sql.Row

/** q295 calibration audit + q296 split-conformal gate — JVM replicas at
  * sf0.001 against the definitions (per-row Brier mean, weighted-|gap|
  * ECE, sorted order statistic), not the queries' cleared forms — so
  * the telescoped integer numerators are themselves under test.
  */
class CalibrationConformalSpec extends SparkSuite {

  private lazy val docRows: Array[(Long, Long, Boolean)] =
    Tables.documents(spark, sfDir).select("doc_id", "n_chars", "lang")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2) == "en"))

  test("q295 replica: bins, Brier and ECE from the definitions") {
    val m = docRows.map(_._2).max
    val n = docRows.length
    val byBin = docRows.groupBy { case (_, nc, _) =>
      math.min(nc * 10 / m, 9L) }
    val got = SparkEntry.queries("q295_calibration_bins")(spark, sfDir)
      .collect()
    assert(got.length == byBin.size)
    // Definition-level Brier: mean of (p̂ − y)² per row.
    val brier = docRows.map { case (_, nc, y) =>
      val p = nc.toDouble / m
      val e = p - (if (y) 1.0 else 0.0); e * e
    }.sum / n
    // Definition-level ECE: Σ_b (n_b/n)·|mean_conf_b − emp_b|.
    val ece = byBin.values.map { rows =>
      val conf = rows.map(_._2.toDouble / m).sum / rows.length
      val emp = rows.count(_._3).toDouble / rows.length
      rows.length.toDouble / n * math.abs(conf - emp)
    }.sum
    got.foreach { case Row(bin: Long, bn: Long, pos: Long, mc: Double,
        er: Double, gbrier: Double, gece: Double) =>
      val rows = byBin(bin)
      assert(bn == rows.length.toLong)
      assert(pos == rows.count(_._3).toLong)
      val snc = rows.map(_._2).sum
      assert(mc == math.floor(
        snc.toDouble / (rows.length.toLong * m) * 1e9) / 1e9)
      assert(er == math.floor(
        pos.toDouble / rows.length * 1e9) / 1e9)
      // The cleared-integer numerators must agree with the float
      // definitions to well inside the fpTrunc grain.
      assert(math.abs(gbrier - brier) < 2e-9, s"brier $gbrier vs $brier")
      assert(math.abs(gece - ece) < 2e-9, s"ece $gece vs $ece")
      assert(gbrier >= 0.0 && gbrier <= 1.0 && gece >= 0.0 && gece <= 1.0)
    }
  }

  test("q296 replica: threshold is the sorted k-th; coverage in band") {
    val cal = docRows.filter(_._1 % 2 == 0).map(_._2).sorted
    val ev = docRows.filter(_._1 % 2 != 0).map(_._2)
    val k = ((cal.length + 1) * 9 + 9) / 10
    val thr = cal(k - 1)
    val covered = ev.count(_ <= thr).toLong
    val Row(nCal: Long, gk: Long, gthr: Long, nEval: Long, nCov: Long,
      cov: Double) =
      SparkEntry.queries("q296_conformal_coverage")(spark, sfDir)
        .collect()(0)
    assert(nCal == cal.length.toLong && gk == k.toLong)
    assert(gthr == thr)
    assert(nEval == ev.length.toLong && nCov == covered)
    assert(cov == math.floor(covered.toDouble / ev.length * 1e9) / 1e9)
    // Finite-sample band: nominal 1−α = 0.9; the parity halves draw
    // from the same generator, so coverage must land near nominal
    // (±3·binomial sd, floored generously for the 25-doc sf0.001 half).
    val sd = math.sqrt(0.9 * 0.1 / ev.length)
    assert(cov >= 0.9 - math.max(3 * sd, 0.15) && cov <= 1.0,
      s"coverage $cov far below nominal")
  }
}
