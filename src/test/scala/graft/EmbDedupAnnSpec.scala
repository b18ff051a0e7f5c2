package graft

import org.apache.spark.sql.functions._

import scala.util.Random

/** q50's at-scale mode (r15 verdict #2): above the corpus threshold the
  * label-blocked EXACT all-pairs near-dup swaps to IVF-cell-blocked
  * candidates with the identical exact-cosine >= 0.35 verify. This spec
  * pins the two properties that make the swap honest:
  *
  *  1. SUBSET — every ANN pair is an exact pair with the bit-identical
  *     score (candidates only shrink; the verify is the same fold), so
  *     the scale path can never invent a duplicate.
  *  2. RECALL — on a CLUSTERED corpus (the geometry near-dup detection
  *     exists for: duplicates are tight clusters) the ANN path recovers
  *     >= 0.8 of the exact pairs. Like every IVF deployment, recall is
  *     a data-geometry property — structureless uniform noise has no
  *     cells to exploit (AuditAnnSpec's same caveat).
  */
class EmbDedupAnnSpec extends SparkSuite {

  test("q50 ANN mode: subset of exact with identical scores, recall >= 0.8 on clusters") {
    graft.functions.CosineSimilarity.register(spark)
    val rng = new Random(11)
    val dim = 16
    val centers = Array.fill(40)(Array.fill(dim)(rng.nextDouble() * 2 - 1))
    val rows = (0 until 2000).map { i =>
      val c = centers(i % 40)
      (i.toLong, c.map(x => (x + (rng.nextDouble() - 0.5) * 0.2).toFloat).toSeq,
        i % 40)
    }
    val dir = java.nio.file.Files.createTempDirectory("embdedupann").toString
    try {
      import spark.implicits._
      rows.toDF("vec_id", "embedding", "label")
        .repartition(4).write.mode("overwrite")
        .parquet(s"$dir/embeddings.parquet")

      val exact = graft.queries.Dedup.embCosinePairs(spark, dir,
        forceAnn = Some(false)).collect()
      val ann = graft.queries.Dedup.embCosinePairs(spark, dir,
        forceAnn = Some(true)).collect()

      val exactByPair = exact.map { r =>
        (r.getLong(1), r.getLong(2)) -> r.getDouble(3)
      }.toMap
      assert(exactByPair.nonEmpty, "exact mode found no pairs — fixture degenerate")

      ann.foreach { r =>
        val k = (r.getLong(1), r.getLong(2))
        val got = exactByPair.get(k)
        assert(got.isDefined, s"ANN invented pair $k absent from exact")
        assert(got.get == r.getDouble(3),
          s"score mismatch for $k: exact ${got.get} vs ann ${r.getDouble(3)}")
      }
      val recall = ann.length.toDouble / exactByPair.size
      info(f"q50 ANN recall $recall%.3f (${ann.length}/${exactByPair.size})")
      assert(recall >= 0.8,
        s"ANN recall $recall < 0.8 (${ann.length}/${exactByPair.size})")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(dir))
    }
  }

  test("fixture scale defaults to the exact path (oracle bit-compat)") {
    // At <= 10k vectors the auto gate must pick the exact all-pairs
    // scan: identical rows to the explicit exact mode on the fixture.
    val auto = graft.queries.Dedup.embCosinePairs(spark, sfDir).collect()
    val exact = graft.queries.Dedup.embCosinePairs(spark, sfDir,
      forceAnn = Some(false)).collect()
    assert(auto.toSeq == exact.toSeq)
  }
}
