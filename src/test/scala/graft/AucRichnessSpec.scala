package graft

import org.apache.spark.sql.Row

/** q288 AUC + q289 vocab richness — JVM replicas at sf0.001 against the
  * DEFINITIONS, not the closed forms the queries compute: AUC by
  * brute-force pair counting (each pos/neg pair contributes 2, 1, or 0
  * to U·2 — the tie-aware Mann–Whitney definition), Chao1/Good–Turing
  * from the literal shingle multiset. Exact equality on integers,
  * fpTrunc-replicated equality on doubles, plus range invariants.
  */
class AucRichnessSpec extends SparkSuite {

  test("q288 replica: U2 equals brute-force tie-aware pair counting") {
    val docs = Tables.documents(spark, sfDir)
      .select("n_chars", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1) == "en"))
    val pos = docs.filter(_._2).map(_._1)
    val neg = docs.filterNot(_._2).map(_._1)
    val u2 = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    val Row(np: Long, nn: Long, gu2: Long, auc: Double, gini: Double) =
      SparkEntry.queries("q288_auc_ranking")(spark, sfDir).collect()(0)
    assert(np == pos.length.toLong && nn == neg.length.toLong)
    assert(gu2 == u2)
    assert(auc == math.floor(
      u2.toDouble / (2.0 * np * nn) * 1e9) / 1e9)
    assert(gini == math.floor(
      (u2.toDouble / (np.toDouble * nn) - 1.0) * 1e9) / 1e9)
    assert(auc >= 0.0 && auc <= 1.0)
    assert(gini >= -1.0 && gini <= 1.0)
  }

  test("q289 replica: Chao1/Good–Turing from the literal shingle multiset") {
    val tf = Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0).split(" "))
      .filter(_.length >= 3)
      .flatMap(w => w.sliding(3).map(_.mkString(" ")))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val v = tf.size.toLong
    val n = tf.values.sum
    val f1 = tf.values.count(_ == 1L).toLong
    val f2 = tf.values.count(_ == 2L).toLong
    val num = (f2 + 1) * 2 * v + f1 * (f1 - 1)
    val Row(gn: Long, gv: Long, gf1: Long, gf2: Long, gnum: Long,
      chao1: Double, p0: Double, ttr: Double) =
      SparkEntry.queries("q289_vocab_richness")(spark, sfDir).collect()(0)
    assert(gn == n && gv == v && gf1 == f1 && gf2 == f2 && gnum == num)
    assert(chao1 == math.floor(
      num.toDouble / ((f2 + 1) * 2).toDouble * 1e9) / 1e9)
    assert(p0 == math.floor(f1.toDouble / n * 1e9) / 1e9)
    assert(ttr == math.floor(v.toDouble / n * 1e9) / 1e9)
    // Chao1 is a LOWER bound estimator that can only add species.
    assert(chao1 >= v.toDouble)
    assert(p0 >= 0.0 && p0 <= 1.0 && ttr > 0.0 && ttr <= 1.0)
  }
}
