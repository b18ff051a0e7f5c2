package graft

import java.security.MessageDigest

import org.apache.spark.sql.Row

/** q281 epoch-reshuffle audit — two legs:
  *   1. JVM replica: epoch-2's permutation re-derived driver-side from
  *      the raw doc ids (JVM MD5 hex, same (hash, id) total order) must
  *      reproduce the query's displacement and invariant sums exactly.
  *   2. the audit's decision semantics: every epoch reports the same
  *      n(n−1)/2 permutation invariant, epoch 1 (the seed baseline)
  *      reports zero displacement, and reseeded epochs land in the
  *      healthy-decorrelation band (mean |Δ| ≈ n/3 for independent
  *      permutations; a re-used seed would report 0, a shifted copy a
  *      constant — both far outside the band).
  */
class EpochShuffleSpec extends SparkSuite {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private lazy val got: Vector[(Long, Long, Long, Double, Long)] =
    SparkEntry.queries("q281_epoch_shuffle")(spark, sfDir)
      .collect().map { case Row(e: Long, n: Long, s: Long, m: Double,
        x: Long) => (e, n, s, m, x) }.toVector

  test("q281 replica: epoch-2 displacement re-derived from raw ids") {
    val ids = Tables.documents(spark, sfDir).select("doc_id")
      .collect().map(_.getLong(0)).toVector
    def ranks(e: Int): Map[Long, Long] =
      ids.map(id => (id, md5hex(s"epoch:$e:$id")))
        .sortBy { case (id, h) => (h, id) }
        .zipWithIndex.map { case ((id, _), i) => (id, i.toLong) }.toMap
    val (r1, r2) = (ranks(1), ranks(2))
    val disp = ids.map(id => math.abs(r2(id) - r1(id)))
    val (_, n, sumIdx, meanDisp, maxDisp) = got(1)
    assert(n == ids.size.toLong)
    assert(sumIdx == ids.size.toLong * (ids.size - 1) / 2)
    assert(maxDisp == disp.max)
    val want = math.floor(disp.sum.toDouble / ids.size * 1e9) / 1e9
    assert(meanDisp == want, s"mean disp $meanDisp vs $want")
  }

  test("q281 audit semantics: invariant sums, zero baseline, healthy band") {
    val n = got.head._2
    assert(got.map(_._3).distinct.size == 1,
      "permutation invariant differs across epochs")
    assert(got(0)._4 == 0.0 && got(0)._5 == 0L)
    got.drop(1).foreach { case (e, _, _, mean, _) =>
      // E|Δ| = n/3 for independent uniform permutations; ±25% band is
      // ~10 sigma wide at n = 500.
      assert(mean > n / 4.0 && mean < n * 5.0 / 12.0,
        s"epoch $e mean displacement $mean outside the healthy band")
    }
  }
}
