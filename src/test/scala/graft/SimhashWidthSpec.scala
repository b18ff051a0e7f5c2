package graft

import org.apache.spark.sql.functions._

/** The SimHash kernel at BOTH promised widths: 32-bit (the fixture/oracle
  * geometry of q49/q78/q84) and 64-bit (the documented 1e9-doc widening).
  * For each geometry where Hamming-threshold <= bands-1, pigeonhole makes
  * banded candidate generation LOSSLESS: the banded pair set filtered to
  * the threshold must EQUAL the brute-force all-pairs set — subset proves
  * no false positives survive the hamming filter, equality proves banding
  * lost nothing. Run on the sf0.001 corpus (~hundreds of docs, so the
  * driver-side ground truth is a trivial quadratic loop). */
class SimhashWidthSpec extends SparkSuite {

  private def bandedPairs(fp: org.apache.spark.sql.DataFrame,
      bands: Int, bits: Int, maxHam: Int): Set[(Long, Long)] = {
    import spark.implicits._
    val banded = graft.queries.Dedup.simhashBanded(fp, bands, bits)
    banded.select(col("doc_id").as("da"), col("fp").as("fa"), col("b"), col("bandval"))
      .join(banded.select(col("doc_id").as("db"), col("fp").as("fb"), col("b"), col("bandval")),
        Seq("b", "bandval"))
      .filter(col("da") < col("db"))
      .filter(expr(s"bit_count(fa ^ fb) <= $maxHam"))
      .select(col("da"), col("db")).distinct()
      .as[(Long, Long)].collect().toSet
  }

  private def brutePairs(fps: Map[Long, Long], maxHam: Int): Set[(Long, Long)] = {
    val ids = fps.keys.toSeq.sorted
    (for {
      i <- ids; j <- ids if i < j
      if java.lang.Long.bitCount(fps(i) ^ fps(j)) <= maxHam
    } yield (i, j)).toSet
  }

  test("banded hamming pairs == brute force at width 32 (q49 geometry) and 64") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    // (width, bands, bits): q49's 4×8 over 32 bits; the widened 4×16 over
    // 64 bits — same Hamming<=3 guarantee, 256× more buckets per band.
    Seq((32, 4, 8), (64, 4, 16)).foreach { case (width, bands, bits) =>
      val fp = graft.queries.Dedup.simhashFp(docs, "text", width).persist()
      val fps = fp.as[(Long, Long)].collect().toMap
      if (width == 64) {
        // the widening actually populates the high 32 bits (incl. some
        // fingerprints landing in the sign-bit range the unsigned band
        // extraction must handle)
        assert(fps.values.exists(v => (v >>> 32) != 0L), "high bits unused")
      }
      val got = bandedPairs(fp, bands, bits, maxHam = bands - 1)
      val want = brutePairs(fps, maxHam = bands - 1)
      fp.unpersist(blocking = false)
      assert(got == want, s"width=$width bands=$bands bits=$bits: " +
        s"banded ${got.size} vs brute ${want.size}")
    }
  }

  test("band 0 is sign-blind: fps differing only in bit 63 stay candidates") {
    import spark.implicits._
    // Regression for the band-0 remainder bug: doc 1's fp has bit 63 set
    // (negative long), doc 2's differs ONLY in bit 63 — they agree on
    // bits 0-15 (= band 0 of the 4×16 geometry) and on nothing else that
    // matters for the pigeonhole (Hamming distance 1 <= bands-1). With
    // `%` extraction doc 1's band 0 was 0xBEEF - 65536 (negative) while
    // doc 2's was 0xBEEF, so the pair never met in a bucket; the mask
    // extraction makes both 0xBEEF. brutePairs is the ground truth.
    val lo = 0xBEEFL
    val fps = Map(1L -> ((1L << 63) | lo), 2L -> lo)
    val fp = fps.toSeq.toDF("doc_id", "fp")
    val got = bandedPairs(fp, bands = 4, bits = 16, maxHam = 3)
    val want = brutePairs(fps, maxHam = 3)
    assert(want == Set((1L, 2L)), "fixture must be a genuine Hamming-1 pair")
    assert(got == want, s"cross-sign band-0 pair lost: banded $got vs brute $want")
  }

  test("q78-style head candidates keep exact-dup recall at width 64") {
    import spark.implicits._
    // The q78/q84 candidate generator (2×16 bands over 40-char heads, the
    // doubled corpus) run at the widened fingerprint: identical heads have
    // identical 64-bit fingerprints, hence share ALL bands — every
    // (id, id+10000) pair must survive candidate generation, whatever the
    // band geometry. 4×16 is the 64-bit production shape.
    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id"), substring(col("text"), 1, 40).as("head"))
    val corpus = base.unionByName(
      base.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 10000).as("doc_id"), col("head")))
    val banded = graft.queries.Dedup.simhashBanded(
      graft.queries.Dedup.simhashFp(corpus, "head", width = 64), bands = 4, bits = 16)
    val cand = banded.select(col("doc_id").as("da"), col("b"), col("bandval"))
      .join(banded.select(col("doc_id").as("db"), col("b"), col("bandval")),
        Seq("b", "bandval"))
      .filter(col("da") < col("db"))
      .select(col("da"), col("db")).distinct()
      .as[(Long, Long)].collect().toSet
    val ids = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 10 === 0).select("doc_id").as[Long].collect()
    ids.foreach { id =>
      assert(cand.contains((id, id + 10000)), s"missing exact-dup pair for $id")
    }
  }

  test("capped candidate kernel == uncapped below the cap (fixture invisibility)") {
    import spark.implicits._
    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id"), substring(col("text"), 1, 40).as("head"))
    val corpus = base.unionByName(
      base.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 10000).as("doc_id"), col("head")))
    val fp = graft.queries.Dedup.simhashFp(corpus, "head", width = 64)
    val banded = graft.queries.Dedup.simhashBanded(fp, bands = 4, bits = 16)
    val uncapped = banded.select(col("doc_id").as("da"), col("b"), col("bandval"))
      .join(banded.select(col("doc_id").as("db"), col("b"), col("bandval")),
        Seq("b", "bandval"))
      .filter(col("da") < col("db"))
      .select(col("da"), col("db")).distinct()
      .as[(Long, Long)].collect().toSet
    val capped = graft.queries.Dedup.simhashCandidates(fp, bands = 4, bits = 16)
      .as[(Long, Long)].collect().toSet
    assert(capped == uncapped,
      s"capped kernel diverged below the cap: ${capped.size} vs ${uncapped.size}")
  }

  test("hot-bucket sub-split: identical-fp families <= cap keep ALL pairs; cross-family pairs sample") {
    import spark.implicits._
    // Injected fingerprints: family A (40 docs, fp = X) and family B
    // (50 docs, fp = X with bits 16..63 flipped) share band 0's bucket
    // (90 members > cap 64 -> the sub-split fires) and no other band.
    // The identical-fp channel must emit every within-family pair (the
    // distance-0 guarantee for groups <= cap); cross-family pairs exist
    // only for doc ids hashing to the same sub-bucket (sampled, strictly
    // fewer than all 40x50).
    val x = 0x0000000000001234L
    val y = x ^ 0xFFFFFFFFFFFF0000L
    val rows = (0L until 40L).map(i => (i, x)) ++
      (100L until 150L).map(i => (i, y))
    val fp = rows.toDF("doc_id", "fp")
    val cand = graft.queries.Dedup.simhashCandidates(fp, bands = 4, bits = 16)
      .as[(Long, Long)].collect().toSet
    val withinA = for (i <- 0L until 40L; j <- (i + 1) until 40L) yield (i, j)
    val withinB = for (i <- 100L until 150L; j <- (i + 1) until 150L) yield (i, j)
    withinA.foreach(p => assert(cand.contains(p), s"family-A pair $p lost"))
    withinB.foreach(p => assert(cand.contains(p), s"family-B pair $p lost"))
    val cross = cand.filter { case (a, b) => a < 100L && b >= 100L }
    assert(cross.nonEmpty, "hot bucket emitted no cross-family candidates at all")
    assert(cross.size < 40 * 50,
      "hot bucket emitted ALL cross-family pairs - sub-split never fired")
  }
}
