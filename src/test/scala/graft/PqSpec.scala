package graft

import org.apache.spark.sql.Row

/** q277 product quantization — three legs:
  *   1. full JVM replica: the integer Lloyd training (m=8 subspaces,
  *      k=16, 3 rounds, vec 0..15 init), encode, LUT, ADC shortlist-60,
  *      and the exact re-ranked top-15 recomputed driver-side from the
  *      raw fixture must equal the distributed result row-for-row —
  *      pins every tie rule (composite d²·16+cid argmin,
  *      FLOOR(sum/count) update, FLOOR 1e-6 unit quantization) to its
  *      definition.
  *   2. Lloyd improvement: total quantization SSE of the TRAINED
  *      codebook ≤ SSE of the init codebook. (Per-step monotonicity is
  *      only a theorem up to the integer-FLOOR centroid rounding, so
  *      the assert is train-start vs train-end — robustly true here.)
  *   3. ADC quality: recall@15 of the re-ranked shortlist vs the true
  *      exact top-15 is deterministic on the fixture; asserted as a
  *      floor so a silent codebook regression (e.g. a broken tie rule
  *      collapsing clusters) turns the suite red.
  */
class PqSpec extends SparkSuite {

  private val m = 8
  private val subDims = 8
  private val dims = m * subDims

  /** (vec_id → 64 integer-unit coords), sorted by vec_id. */
  private lazy val corpus: Vector[(Long, Array[Long])] =
    Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      .collect()
      .map { r =>
        val id = r.getLong(0)
        val xs = r.getSeq[Float](1)
        (id, xs.map(x => math.floor(x.toDouble * 1e6).toLong).toArray)
      }
      .sortBy(_._1).toVector

  /** cent((sub, cid)) = 16 integer-unit coords; replica of the query's
    * training loop (2 rounds) followed by the final encode. Returns
    * (trained codebook, codes per vec, init codebook). */
  private lazy val (cent, codes, initCent) = {
    def init: Map[(Int, Int), Array[Long]] = (for {
      (id, xs) <- corpus.take(16)
      sub <- 0 until m
    } yield ((sub, id.toInt),
      xs.slice(sub * subDims, (sub + 1) * subDims))).toMap
    def assign(c: Map[(Int, Int), Array[Long]]): Map[(Long, Int), Int] =
      (for {
        (id, xs) <- corpus
        sub <- 0 until m
      } yield {
        val sv = xs.slice(sub * subDims, (sub + 1) * subDims)
        val key = (0 until 16).iterator
          .filter(cid => c.contains((sub, cid)))
          .map { cid =>
            val cu = c((sub, cid))
            val d2 = sv.zip(cu).map { case (a, b) => (a - b) * (a - b) }.sum
            d2 * 16 + cid
          }.min
        ((id, sub), (key % 16).toInt)
      }).toMap
    def update(a: Map[(Long, Int), Int]): Map[(Int, Int), Array[Long]] =
      corpus.flatMap { case (id, xs) =>
        (0 until m).map(sub => ((sub, a((id, sub))),
          xs.slice(sub * subDims, (sub + 1) * subDims)))
      }.groupBy(_._1).map { case (k, vs) =>
        val n = vs.size
        val cu = Array.tabulate(subDims) { j =>
          math.floor(vs.map(_._2(j)).sum.toDouble / n.toDouble).toLong
        }
        (k, cu)
      }
    val c0 = init
    var c = c0
    for (_ <- 1 to 3) c = update(assign(c))
    (c, assign(c), c0)
  }

  private def sse(c: Map[(Int, Int), Array[Long]],
      a: Map[(Long, Int), Int]): BigInt =
    corpus.map { case (id, xs) =>
      (0 until m).map { sub =>
        val cu = c((sub, a((id, sub))))
        val sv = xs.slice(sub * subDims, (sub + 1) * subDims)
        BigInt(sv.zip(cu).map { case (x, u) => (x - u) * (x - u) }.sum)
      }.sum
    }.sum

  private lazy val adcExact: Vector[(Long, Long, Long)] = {
    val q = corpus.find(_._1 == 7L).get._2
    val lut: Map[(Int, Int), Long] = cent.map { case ((sub, cid), cu) =>
      val qv = q.slice(sub * subDims, (sub + 1) * subDims)
      ((sub, cid), qv.zip(cu).map { case (a, b) => (a - b) * (a - b) }.sum)
    }
    corpus.filter(_._1 != 7L).map { case (id, xs) =>
      val adc = (0 until m).map(sub => lut((sub, codes((id, sub))))).sum
      val ex = xs.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
      (id, adc, ex)
    }
  }

  test("q277 replica: distributed PQ equals the driver-side recompute") {
    val got = SparkEntry.queries("q277_product_quantization")(spark, sfDir)
      .collect().map { case Row(v: Long, a: Long, e: Long) => (v, a, e) }
      .toVector
    val want = adcExact.sortBy { case (id, adc, _) => (adc, id) }.take(60)
      .sortBy { case (id, _, ex) => (ex, id) }.take(15)
    assert(got == want)
  }

  test("q277 Lloyd training strictly reduces fixture quantization SSE") {
    // Init assignment/SSE replicate the query's round-1 assign against
    // the vec-0..15 seed codebook.
    def assignTo(c: Map[(Int, Int), Array[Long]]): Map[(Long, Int), Int] =
      (for {
        (id, xs) <- corpus
        sub <- 0 until m
      } yield {
        val sv = xs.slice(sub * subDims, (sub + 1) * subDims)
        val key = (0 until 16).iterator
          .filter(cid => c.contains((sub, cid)))
          .map { cid =>
            val cu = c((sub, cid))
            val d2 = sv.zip(cu).map { case (a, b) => (a - b) * (a - b) }.sum
            d2 * 16 + cid
          }.min
        ((id, sub), (key % 16).toInt)
      }).toMap
    val sse0 = sse(initCent, assignTo(initCent))
    val sse2 = sse(cent, codes)
    assert(sse2 < sse0, s"trained SSE $sse2 vs init $sse0")
  }

  test("q277 shortlist recall@15 against the exact ranking clears the floor") {
    val short = adcExact.sortBy { case (id, adc, _) => (adc, id) }
      .take(60).map(_._1).toSet
    val byExact = adcExact.sortBy { case (id, _, ex) => (ex, id) }
      .take(15).map(_._1).toSet
    val recall = byExact.count(short).toDouble / 15.0
    // Measured 14/15 at sf0.001 (8×k16 codebook, 3 rounds, shortlist
    // 60); pure ADC@15 is 0.40 on this near-isotropic fixture — the
    // re-rank stage is what buys the quality, which is exactly the
    // production PQ contract. A tie/update regression collapses this
    // toward chance (~60/499).
    assert(recall >= 0.8, s"shortlist recall@15 = $recall")
  }
}
