package graft

import org.apache.spark.sql.Row

/** q313 winnowing dedup + q314 SPRT — JVM replicas at sf0.001 plus
  * the winnowing guarantee (an exact duplicate shares every window
  * minimum, so injected copies must pair with maximal sharing) and
  * the SPRT stopping-rule properties.
  */
class WinnowSprtSpec extends SparkSuite {

  private def md5hex8(sh: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(sh.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  test("q313 replica: winnowing pairs and the duplicate guarantee") {
    val base = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val corpus = base ++
      base.filter(_._1 % 10 == 0).map { case (id, t) => (id + 10000, t) }
    val fp0 = corpus.flatMap { case (id, t) =>
      val w = t.split(" ")
      if (w.length < 6) Seq.empty else {
        val hs = (0 to w.length - 3)
          .map(i => md5hex8(w.slice(i, i + 3).mkString(" ")))
        (0 to hs.length - 4).map(j => (id, hs.slice(j, j + 4).min))
          .distinct
      }
    }
    val dfOk = fp0.groupBy(_._2).filter(_._2.length <= 50)
      .values.flatten.toSeq
    val byFp = dfOk.groupBy(_._2)
    val pairCount = byFp.values.flatMap { xs =>
      val ids = xs.map(_._1).sorted
      for (i <- ids.indices; j <- i + 1 until ids.length)
        yield (ids(i), ids(j))
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= 2L).toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q313_winnowing_dedup")(spark, sfDir)
      .collect().map { case Row(a: Long, b: Long, n: Long) =>
        ((a, b), n) }.sortBy(_._1)
    assert(got.toSeq == pairCount)
    // Winnowing guarantee: every injected exact copy pairs with its
    // original (identical docs share ALL surviving fingerprints).
    val dupPairs = base.filter(_._1 % 10 == 0).map(_._1)
      .map(k => (k, k + 10000)).toSet
    val found = got.map(_._1).toSet
    val missing = dupPairs -- found
    assert(missing.isEmpty, s"injected duplicates unpaired: $missing")
  }

  test("q314 replica: LLR walk, boundary crossing, decision") {
    val c1 = math.log(0.30 / 0.25)
    val c2 = math.log(0.70 / 0.75)
    val bound = math.floor(math.log(19.0) * 1e9).toLong
    val daily = Tables.events(spark, sfDir)
      .selectExpr("(ts div 1000) div 86400000000 as dd", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1) == "purchase"))
      .groupBy(_._1).toSeq.sortBy(_._1).map { case (dd, xs) =>
        (dd, xs.count(_._2).toLong, xs.length.toLong)
      }
    val llr = daily.map { case (dd, x, m) =>
      (dd, math.floor((x.toDouble * c1 + (m - x).toDouble * c2) * 1e9)
        .toLong)
    }
    val cums = llr.scanLeft((0L, 0L)) { case ((_, acc), (dd, u)) =>
      (dd, acc + u) }.drop(1)
    val crossing = cums.find { case (_, c) => math.abs(c) >= bound }
    val Row(nd: Long, cf: Long, dday: Long, dec: String) =
      SparkEntry.queries("q314_sprt_sequential")(spark, sfDir)
        .collect()(0)
    assert(nd == daily.length.toLong)
    assert(cf == llr.map(_._2).sum)
    crossing match {
      case Some((dd, c)) =>
        assert(dday == dd)
        assert(dec == (if (c >= bound) "accept_h1" else "accept_h0"))
        // The stopping rule: no earlier day crosses.
        assert(cums.takeWhile(_._1 < dd)
          .forall { case (_, cc) => math.abs(cc) < bound })
      case None =>
        assert(dday == -1L && dec == "continue")
    }
  }
}
