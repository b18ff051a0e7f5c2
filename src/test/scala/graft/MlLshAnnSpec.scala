package graft

/** q64's at-scale mode (r15 verdict #2): above the corpus threshold the
  * spark.ml `approxSimilarityJoin` — whose single-hash OR-amplified
  * bands explode candidate volume on a dense corpus — swaps to a
  * 2×AND-band candidate join over the SAME fitted model's hashes with
  * an ml-exact index-set jaccard verify. Honesty pins:
  *
  *  1. SUBSET with IDENTICAL distances — a composite (h0,h1) collision
  *     implies both single-hash collisions, so banded candidates ⊂ the
  *     library's, and the verify recomputes keyDistance's exact
  *     arithmetic (|A∩B| and |A∪B| as the same ints, one double
  *     division), so any pair that survives carries the same distance.
  *  2. RECALL on the fixture corpus — AND-amplification trades recall
  *     for precision (collision prob s² per band vs s per table); the
  *     fixture's near-dup pairs sit at high similarity where s² stays
  *     close to s, measured >= 0.6 here.
  */
class MlLshAnnSpec extends SparkSuite {

  test("q64 banded mode: subset of library result with identical distances, recall >= 0.6") {
    val exact = graft.queries.Extras.mlLshPairs(spark, sfDir,
      forceAnn = Some(false)).collect()
    val ann = graft.queries.Extras.mlLshPairs(spark, sfDir,
      forceAnn = Some(true)).collect()

    val exactByPair = exact.map { r =>
      (r.getLong(0), r.getLong(1)) -> r.getDouble(2)
    }.toMap
    assert(exactByPair.nonEmpty, "library mode found no pairs — fixture degenerate")

    ann.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      val got = exactByPair.get(k)
      assert(got.isDefined, s"banded mode invented pair $k absent from library result")
      assert(got.get == r.getDouble(2),
        s"distance mismatch for $k: library ${got.get} vs banded ${r.getDouble(2)}")
    }
    val recall = ann.length.toDouble / exactByPair.size
    info(f"q64 banded recall $recall%.3f (${ann.length}/${exactByPair.size})")
    assert(recall >= 0.6,
      s"banded recall $recall < 0.6 (${ann.length}/${exactByPair.size})")
  }

  test("fixture scale defaults to the library path") {
    val auto = graft.queries.Extras.mlLshPairs(spark, sfDir).collect()
    val exact = graft.queries.Extras.mlLshPairs(spark, sfDir,
      forceAnn = Some(false)).collect()
    assert(auto.toSeq == exact.toSeq)
  }
}
