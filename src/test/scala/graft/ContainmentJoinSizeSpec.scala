package graft

import org.apache.spark.sql.Row

/** q309 containment dedup + q310 join-size estimation — replicas and
  * the estimator guarantees (containment sees what Jaccard misses on
  * the injected quote-inclusions; CMS inner product never
  * underestimates).
  */
class ContainmentJoinSizeSpec extends SparkSuite {

  test("q309: injected quote-inclusions surface with high containment") {
    val got = SparkEntry.queries("q309_containment_dedup")(spark, sfDir)
      .collect().map { case Row(da: Long, db: Long, na: Long, nb: Long,
        inter: Long, j: Double, c: Double) => (da, db, na, nb, inter, j, c) }
    // Every reported pair satisfies the gate and the score algebra.
    got.foreach { case (da, db, na, nb, inter, j, c) =>
      assert(da < db)
      assert(c >= 0.8 && c <= 1.0 + 1e-9)
      assert(inter <= math.min(na, nb))
      assert(j == math.floor(
        inter.toDouble / (na + nb - inter) * 1e9) / 1e9)
      assert(c == math.floor(
        inter.toDouble / math.min(na, nb) * 1e9) / 1e9)
      // Containment dominates Jaccard — the asymmetry the gate is for.
      assert(c >= j - 1e-9)
    }
    // The injection appends doc k+1 into doc k for k % 25 == 0: those
    // pairs must be found, and at near-total containment.
    val nDocs = Tables.documents(spark, sfDir).count()
    val injected = (0L until nDocs by 25L)
      .filter(_ + 1 < nDocs).map(k => (k, k + 1)).toSet
    val found = got.map(p => (p._1, p._2)).toSet
    val hits = injected.intersect(found)
    assert(hits.size >= (injected.size * 9) / 10,
      s"only ${hits.size}/${injected.size} injected inclusions found")
    // And Jaccard alone would have missed some of them (that is the
    // query's reason to exist): at least one hit sits below 0.5.
    val hitJacc = got.filter(p => injected((p._1, p._2))).map(_._6)
    assert(hitJacc.exists(_ < 0.5),
      s"no Jaccard-blind inclusion in fixture: $hitJacc")
  }

  test("q310 replica: exact dot product; CMS estimate is one-sided") {
    val la = Tables.lineitem(spark, sfDir).select("l_orderkey")
      .collect().map(_.getLong(0))
    val ob = Tables.orders(spark, sfDir).select("o_orderkey")
      .collect().map(_.getLong(0))
    val ca = la.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cb = ob.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val exact = ca.keySet.intersect(cb.keySet).toSeq
      .map(k => ca(k) * cb(k)).sum
    val Row(na: Long, nb: Long, nk: Long, ex: Long, est: Long,
      over: Long, f: Double) =
      SparkEntry.queries("q310_join_size_estimate")(spark, sfDir)
        .collect()(0)
    assert(na == la.length.toLong && nb == ob.length.toLong)
    assert(nk == ca.keySet.intersect(cb.keySet).size.toLong)
    assert(ex == exact)
    // CMS inner product is a ONE-SIDED overestimate: collisions only
    // add mass, so est ≥ exact always.
    assert(est >= ex, s"CMS underestimated: $est < $ex")
    assert(over == est - ex)
    assert(f == math.floor(est.toDouble / ex * 1e9) / 1e9)
    assert(f >= 1.0)
  }
}
