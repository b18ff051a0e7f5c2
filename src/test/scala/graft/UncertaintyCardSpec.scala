package graft

import org.apache.spark.sql.Row

/** q317 uncertainty sampling + q318 dataset card — JVM replicas at
  * sf0.001 with the selection-rule properties (picked margins are the
  * global minima; the card's fields balance against the raw corpus).
  */
class UncertaintyCardSpec extends SparkSuite {

  test("q317 replica: picks are the 20 smallest best-vs-second margins") {
    // Replicate the 3-round integer Lloyd loop and the composite keys.
    val vecs = Tables.embeddings(spark, sfDir).collect().map { r =>
      (r.getLong(0), r.getSeq[Float](1).toArray
        .map(x => math.floor(x.toDouble * 1e6).toLong))
    }
    val dims = vecs.head._2.length
    var cents: Map[Long, Array[Long]] =
      vecs.filter(_._1 < 4).map { case (id, xu) => (id, xu) }.toMap
    def d2(v: Array[Long], c: Array[Long]): Long =
      v.zip(c).map { case (x, u) => (x - u) * (x - u) }.sum
    var asg: Map[Long, Long] = Map.empty
    for (_ <- 1 to 3) {
      asg = vecs.map { case (id, xu) =>
        id -> cents.map { case (cid, c) => d2(xu, c) * 8 + cid }.min % 8
      }.toMap
      cents = vecs.groupBy(v => asg(v._1)).map { case (cid, xs) =>
        cid -> Array.tabulate(dims)(p =>
          math.floor(xs.map(_._2(p)).sum.toDouble / xs.length).toLong)
      }
    }
    val margins = vecs.map { case (id, xu) =>
      val keys = cents.map { case (cid, c) => d2(xu, c) * 8 + cid }.toSeq
        .sorted
      val (k1, k2) = (keys.head, keys(1))
      (id, k1 % 8, k1 / 8, k2 / 8, k2 / 8 - k1 / 8)
    }
    val exp = margins.sortBy(m => (m._5, m._1)).take(20).toSeq
    val got = SparkEntry.queries("q317_uncertainty_sampling")(spark, sfDir)
      .collect().map { case Row(id: Long, cid: Long, a: Long, b: Long,
        m: Long) => (id, cid, a, b, m) }
    assert(got.toSeq == exp)
    // Selection property: nothing outside the pick has a smaller
    // (margin, vec_id) key than anything inside it.
    val cut = exp.last
    margins.filterNot(m => exp.contains(m)).foreach { m =>
      assert(m._5 > cut._5 || (m._5 == cut._5 && m._1 > cut._1))
    }
  }

  test("q318 replica: the card balances against the raw corpus") {
    val rows = Tables.documents(spark, sfDir)
      .select("source", "lang", "n_chars", "text").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getString(3).split(" ").length.toLong))
    val n = rows.length.toLong
    val langs = rows.groupBy(_._2).view.mapValues(_.length.toLong).toSeq
    val (topLang, topDocs) = langs.sortBy { case (l, c) => (-c, l) }.head
    val lens = rows.map(_._3).sorted
    def q(p: Int) = lens(((n * p + 99) / 100 - 1).toInt)
    val Row(nd: Long, ns: Long, nl: Long, nt: Long, nc: Long,
      tl: String, tls: Double, tpd: Double, p50: Long, p90: Long) =
      SparkEntry.queries("q318_dataset_card")(spark, sfDir).collect()(0)
    assert(nd == n)
    assert(ns == rows.map(_._1).distinct.length.toLong)
    assert(nl == rows.map(_._2).distinct.length.toLong)
    assert(nt == rows.map(_._4).sum)
    assert(nc == rows.map(_._3).sum)
    assert(tl == topLang)
    assert(tls == math.floor(topDocs.toDouble / n * 1e9) / 1e9)
    assert(tpd == math.floor(nt.toDouble / n * 1e9) / 1e9)
    assert(p50 == q(50) && p90 == q(90))
    assert(p50 <= p90)
  }
}
