package graft

import org.apache.spark.sql.Row

/** q319 Gini mean difference + q320 kNN hubness — the sorted-order
  * identity certified against the literal all-pairs sum, and the
  * hubness accounting balanced against the brute-force graph.
  */
class GmdHubnessSpec extends SparkSuite {

  test("q319 identity: collapse formula equals the all-pairs sum") {
    val revs = Tables.events(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .selectExpr("(ts div 1000) div 86400000000 as dd",
        "cast(cast(value as decimal(18,2)) * 100 as long) as cents")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.map(_.map(_._2).sum).toSeq
    val n = revs.length.toLong
    val pairs = (for (i <- revs.indices; j <- i + 1 until revs.length)
      yield math.abs(revs(i) - revs(j))).sum
    val Row(nd: Long, rt: Long, pas: Long, gmd: Double, gr: Double) =
      SparkEntry.queries("q319_gini_mean_difference")(spark, sfDir)
        .collect()(0)
    assert(nd == n && rt == revs.sum)
    assert(pas == pairs, s"identity broke: $pas vs $pairs")
    assert(gmd == math.floor(
      pairs.toDouble * 2.0 / (n * (n - 1)) * 1e9) / 1e9)
    assert(gr == math.floor(
      pairs.toDouble / ((n - 1).toDouble * revs.sum) * 1e9) / 1e9)
    // Relative dispersion of a nonnegative variable lives in [0, 1].
    assert(gr >= 0.0 && gr <= 1.0)
  }

  test("q320 replica: hubness accounting balances the brute-force graph") {
    val vecs = Tables.embeddings(spark, sfDir).collect().map { r =>
      (r.getLong(0), r.getSeq[Float](1).toArray)
    }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val edges = vecs.filter(_._1 % 5 == 0).flatMap { case (pid, pe) =>
      vecs.filter(_._1 != pid)
        .map { case (cid, ce) => (cos(pe, ce), cid) }
        .sortBy { case (s, cid) => (-s, cid) }.take(10).map(_._2)
    }
    val indeg = edges.groupBy(identity).view.mapValues(_.length.toLong)
    val hist = indeg.values.groupBy(identity).view
      .mapValues(_.size.toLong).toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q320_knn_hubness")(spark, sfDir)
      .collect()
    assert(got.length == hist.size)
    val nCand = vecs.length.toLong
    got.zip(hist).foreach { case (Row(deg: Long, nv: Long, ne: Long,
        md: Long, nnr: Long, hr: Double), (ed, env)) =>
      assert(deg == ed && nv == env)
      assert(ne == edges.length.toLong)
      assert(md == indeg.values.max)
      assert(nnr == nCand - indeg.size.toLong)
      assert(hr == math.floor(
        md.toDouble * nCand / ne * 1e9) / 1e9)
      // A hub by definition exceeds the mean in-degree → ratio ≥ 1
      // whenever anything is retrieved at all.
      assert(hr >= 1.0)
    }
    // Edge conservation: Σ deg·n_vecs = probes·10.
    assert(hist.map { case (d, c) => d * c }.sum ==
      vecs.count(_._1 % 5 == 0).toLong * 10)
  }
}
