package graft

import org.apache.spark.sql.Row

/** q305 NDCG retrieval eval + q306 gate-attrition matrix — JVM
  * replicas at sf0.001 (brute-force ranking for NDCG, conditional
  * counting for the gates) plus the bounds each metric promises.
  */
class NdcgAttritionSpec extends SparkSuite {

  test("q305 replica: per-probe NDCG from the brute-force ranking") {
    val vecs = Tables.embeddings(spark, sfDir).collect().map { r =>
      (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2).toLong)
    }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val labCount = vecs.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val exp = vecs.filter(_._1 % 5 == 0).map { case (pid, pe, plab) =>
      val top = vecs.filter(_._1 != pid)
        .map { case (cid, ce, clab) => (cos(pe, ce), cid, clab) }
        .sortBy { case (s, cid, _) => (-s, cid) }.take(10)
      val dcg = top.zipWithIndex.map { case ((_, _, clab), i) =>
        (if (clab == plab) 1.0 else 0.0) / math.log(i + 2.0) }.sum
      val nIdeal = math.min(10L, labCount(plab) - 1)
      val idcg = (1L to nIdeal).map(i => 1.0 / math.log(i + 1.0)).sum
      (pid, plab, top.count(_._3 == plab).toLong, nIdeal,
        math.floor(dcg * 1e9) / 1e9, math.floor(idcg * 1e9) / 1e9,
        math.floor(dcg / idcg * 1e9) / 1e9)
    }.sortBy(_._1)
    val got = SparkEntry.queries("q305_ndcg_retrieval")(spark, sfDir)
      .collect().map { case Row(pid: Long, pl: Long, nr: Long, ni: Long,
        d: Double, i: Double, n: Double) => (pid, pl, nr, ni, d, i, n) }
    assert(got.toSeq == exp.toSeq)
    // NDCG is bounded and the ideal is achievable: dcg ≤ idcg.
    got.foreach { case (_, _, _, _, d, i, n) =>
      assert(d <= i + 1e-9 && n >= 0.0 && n <= 1.0 + 1e-9)
    }
  }

  test("q306 replica: gate×source pass counts and attrition") {
    val exp = Tables.documents(spark, sfDir)
      .select("source", "text").collect().map { r =>
        val t = r.getString(1); val w = t.split(" ")
        val stop = w.count(x => x == "the" || x == "a").toLong
        (r.getString(0), t.length >= 200,
          stop * 100 >= w.length.toLong * 2,
          w.distinct.length.toLong * 5 >= w.length.toLong * 2)
      }.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, xs) =>
        val all = xs.count(x => x._2 && x._3 && x._4).toLong
        (src, xs.length.toLong, xs.count(_._2).toLong,
          xs.count(_._3).toLong, xs.count(_._4).toLong, all)
      }
    val got = SparkEntry.queries("q306_gate_attrition")(spark, sfDir)
      .collect()
    assert(got.length == exp.length)
    got.zip(exp).foreach { case (Row(src: String, n: Long, pl: Long,
        ps: Long, pd: Long, pa: Long, at: Double),
        (es, en, epl, eps, epd, epa)) =>
      assert(src == es && n == en && pl == epl && ps == eps && pd == epd)
      assert(pa == epa)
      assert(at == math.floor((n - pa).toDouble / n * 1e9) / 1e9)
      // Conjunction can never beat its weakest gate.
      assert(pa <= math.min(pl, math.min(ps, pd)))
    }
  }
}
