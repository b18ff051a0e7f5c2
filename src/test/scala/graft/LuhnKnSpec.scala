package graft

import org.apache.spark.sql.Row

/** q291 Luhn audit + q292 Kneser–Ney bigram LM.
  *
  * q291: a general right-anchored JVM Luhn (the textbook definition)
  * pinned to the canonical reference cases, then a full per-segment
  * replica of the query's synthesized-PAN audit.
  *
  * q292: the KN normalization THEOREM the cleared-ratio form makes
  * exact — for every context v, the integer numerators over the full
  * word-type vocabulary sum to exactly the denominator 4·c(v)·T
  * (probabilities sum to 1 with no float in sight) — plus a full
  * per-doc replica of the scored output with the query's fold order.
  */
class LuhnKnSpec extends SparkSuite {

  /** Textbook Luhn: from the rightmost digit, double every second. */
  private def luhnValid(s: String): Boolean = {
    val sum = s.reverse.zipWithIndex.map { case (c, i) =>
      val d = c - '0'
      if (i % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
    }.sum
    sum % 10 == 0
  }

  test("q291 Luhn reference cases") {
    assert(luhnValid("79927398713"))          // the canonical example
    assert(!luhnValid("79927398710"))
    assert(luhnValid("4539578763621486"))     // 16-digit valid PAN
    assert(!luhnValid("4539578763621487"))
  }

  test("q291 replica: per-segment audit of the synthesized PANs") {
    val cust = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def pan(k: Long): String =
      f"$k%07d" + f"${(k * 7919L) % 9999991L}%08d" + (k % 10L).toString
    cust.foreach { case (k, _) => assert(pan(k).length == 16) }
    val exp = cust.groupBy(_._2).view.mapValues { ks =>
      (ks.length.toLong, ks.count(x => luhnValid(pan(x._1))).toLong)
    }.toMap
    val got = SparkEntry.queries("q291_luhn_checksum_audit")(spark, sfDir)
      .collect()
    assert(got.length == exp.size)
    got.foreach { case Row(seg: String, n: Long, nv: Long, rate: Double) =>
      assert((n, nv) == exp(seg))
      assert(rate == math.floor(nv.toDouble / n * 1e9) / 1e9)
    }
    // The synthesized check digit is key-mod-10 noise, so validity
    // should sit near the 1-in-10 base rate, not at 0 or 1.
    val (tn, tv) = (exp.values.map(_._1).sum, exp.values.map(_._2).sum)
    assert(tv > 0 && tv < tn)
  }

  /** Bigram type counts of the sf fixture corpus, as the query builds
    * them (per-doc adjacency, no cross-doc bigrams). */
  private lazy val bigrams: Seq[((String, String), Long)] =
    Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .flatMap { r =>
        val w = r.getString(1).split(" ")
        w.sliding(2).collect { case Array(a, b) => (a, b) }
      }.groupBy(identity).view.mapValues(_.length.toLong).toSeq

  test("q292 theorem: KN numerators sum exactly to the denominator per context") {
    val cv = bigrams.groupBy(_._1._1).view
      .mapValues(xs => (xs.map(_._2).sum, xs.size.toLong)).toMap
    val n1w = bigrams.groupBy(_._1._2).view.mapValues(_ => 1L)
      .keys.map(w => w -> bigrams.count(_._1._2 == w).toLong).toMap
    val t = bigrams.size.toLong
    val words = n1w.keys.toSeq
    cv.foreach { case (v, (c, n1v)) =>
      val seen = bigrams.filter(_._1._1 == v)
        .map { case ((_, w), cvw) => (4 * cvw - 3) * t + 3 * n1v * n1w(w) }
        .sum
      val unseen = words.filterNot(w => bigrams.exists(_._1 == (v, w)))
        .map(w => 3 * n1v * n1w(w)).sum
      assert(seen + unseen == 4 * c * t,
        s"context '$v': numerators do not normalize")
    }
  }

  test("q292 replica: per-doc mean neg log-prob matches the query") {
    val bc = bigrams.toMap
    val cvm = bigrams.groupBy(_._1._1).view
      .mapValues(xs => (xs.map(_._2).sum, xs.size.toLong)).toMap
    val n1w = bigrams.groupBy(_._1._2).view
      .mapValues(_.map(_._2).size.toLong).toMap
    val t = bigrams.size.toLong
    def lp(v: String, w: String): Double = {
      val (c, n1v) = cvm(v)
      math.log(((bc((v, w)) * 4 - 3).toDouble * t.toDouble
        + (n1v * 3).toDouble * n1w(w).toDouble)
        / ((c * 4).toDouble * t.toDouble))
    }
    val exp = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map { r =>
        val w = r.getString(1).split(" ")
        val lps = w.sliding(2).collect { case Array(a, b) => lp(a, b) }.toSeq
        (r.getLong(0), lps.length.toLong,
          math.floor(-(lps.sum / lps.length) * 1e9) / 1e9)
      }.filter(_._2 > 0).sortBy(_._1)
    val got = SparkEntry.queries("q292_kneser_ney_bigram")(spark, sfDir)
      .collect().map { case Row(id: Long, n: Long, s: Double) => (id, n, s) }
    assert(got.toSeq == exp.toSeq)
  }
}
