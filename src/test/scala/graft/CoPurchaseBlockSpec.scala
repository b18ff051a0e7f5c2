package graft

import org.apache.spark.sql.functions._

import scala.util.Random

/** The density-adaptive co-purchase block builder (r14): a >32-user
  * (hour, band) block is re-blocked at minute granularity; a minute
  * that is itself hot falls to deterministic ~32-user hash sub-buckets
  * (the subSplit trade — sampled pairs at c·32 cost instead of c² or
  * zero). These tests pin (a) that the refined key only activates
  * above the cutoff — a cool hour block pairs users ACROSS minutes
  * exactly as before, (b) the minute-level semantics on hot blocks,
  * (c) the terminal hash sub-split (no cross-bucket pair, non-empty),
  * (d) the 1056-user id-sorted truncation, and (e) agreement with a
  * naive JVM replica on random inputs.
  */
class CoPurchaseBlockSpec extends SparkSuite {

  private val Cap = 1056

  private def pairsDf(rows: Seq[(Long, Long, Long, Long)]) = {
    import spark.implicits._
    graft.queries.Relational.blockedCoPurchasePairs(
      rows.toDF("h", "b", "m", "u"))
      .as[(Long, Long)].collect().toSet
  }

  /** JVM replica of dsl.hashMod2L for non-negative long ids. */
  private def hashMod(u: Long, m: Long): Long =
    (u % 2147483647L) * 2654435761L % 2147483647L * 2654435761L % m

  /** Naive replica of the three-level ladder. */
  private def replica(rows: Seq[(Long, Long, Long, Long)]): Set[(Long, Long)] = {
    def allPairs(us: Iterable[Long]): Set[(Long, Long)] = {
      val s = us.toSet
      for (x <- s; y <- s if x < y) yield (x, y)
    }
    // .values before flatMap: flatMapping a Map with a tuple-producing
    // function rebuilds a Map and silently dedups pairs by their first
    // element.
    rows.groupBy(r => (r._1, r._2)).values.flatMap { blk =>
      val hourUsers = blk.map(_._4).toSet
      if (hourUsers.size <= 32) allPairs(hourUsers)
      else blk.groupBy(_._3).values.flatMap { mblk =>
        val mu = mblk.map(_._4).toSet
        if (mu.size <= 32) allPairs(mu)
        else {
          val kept = mu.toSeq.sorted.take(Cap)
          val nsub = (kept.size + 31) / 32
          kept.groupBy(u => hashMod(u, nsub.toLong)).values
            .flatMap(allPairs)
        }
      }
    }.toSet
  }

  test("cool hour block pairs users across minutes (refinement inactive)") {
    // 4 users in one (h, b) block spread over 3 minutes: every pair must
    // appear, including cross-minute ones — the refined key must NOT
    // activate below the cutoff.
    val rows = Seq[(Long, Long, Long, Long)](
      (1L, 5L, 60L, 10L), (1L, 5L, 61L, 11L), (1L, 5L, 61L, 12L),
      (1L, 5L, 62L, 13L), (1L, 5L, 60L, 10L)) // duplicate event too
    val got = pairsDf(rows)
    val want = Set((10L, 11L), (10L, 12L), (10L, 13L), (11L, 12L),
      (11L, 13L), (12L, 13L))
    assert(got == want, s"$got != $want")
  }

  test("hot hour block re-blocks at minute granularity; hot minute hash-buckets") {
    // Hour block with 50 distinct users (> 32): minute 60 holds users
    // 0..9 (cool -> all pairs), minute 61 holds users 100..134 (35
    // users, hot minute -> 2 hash buckets, pairs within a bucket only),
    // minute 62 holds users 10..14 (cool -> all pairs). No cross-minute
    // pair may survive.
    val rows =
      (0L until 10L).map(u => (7L, 2L, 60L, u)) ++
      (100L until 135L).map(u => (7L, 2L, 61L, u)) ++
      (10L until 15L).map(u => (7L, 2L, 62L, u))
    val got = pairsDf(rows)
    val want = replica(rows)
    assert(want.nonEmpty && got == want, s"got ${got.size}, want ${want.size}")
    assert(got.contains((0L, 9L)) && got.contains((10L, 14L)))
    assert(!got.exists { case (x, y) => x < 15L && y >= 15L },
      "cross-minute pair leaked out of a hot hour block")
    // The hot minute emits SOME pairs (non-empty sampling) but never a
    // cross-bucket one, so strictly fewer than all C(35,2) pairs.
    val hot = got.filter { case (x, y) => x >= 100L && y >= 100L }
    assert(hot.nonEmpty, "hot minute emitted nothing - terminal level dead")
    assert(hot.size < 35 * 34 / 2, "hot minute emitted ALL pairs - no bucketing")
    val nsub = (35 + 31) / 32
    hot.foreach { case (x, y) =>
      assert(hashMod(x, nsub.toLong) == hashMod(y, nsub.toLong),
        s"cross-bucket pair ($x, $y)")
    }
  }

  test("minute sets beyond 1056 users truncate to the smallest ids, deterministically") {
    // One minute with 1100 users: the builder keeps the 1056 smallest
    // ids and hash-buckets those; users 5000.. (the 44 largest) must
    // never appear. Replica mirrors the truncation exactly.
    val rows =
      (0L until 1056L).map(u => (9L, 1L, 120L, u)) ++
      (5000L until 5044L).map(u => (9L, 1L, 120L, u))
    val got = pairsDf(rows)
    val want = replica(rows)
    assert(got == want, s"got ${got.size}, want ${want.size}")
    assert(got.nonEmpty && !got.exists { case (x, y) => x >= 5000L || y >= 5000L },
      "truncated user leaked into pairs")
  }

  test("terminal-level retained-pair fraction meets the design bound (2000-user hot block)") {
    // One minute with 2000 users — the sf10 replica-degenerate shape
    // the terminal level exists for. Design bound: after the id-sorted
    // truncation to kept = 1056, pairs survive only inside one of
    // nsub = ceil(kept/32) = 33 hash buckets, so the ideal uniform-hash
    // retained fraction vs the truncated-exact volume C(kept,2) is
    // ~1/nsub (= kept*32/ (2*C(kept,2)) up to rounding). Assert at
    // least HALF the ideal (hash-imbalance tolerance: recall is
    // sampled, never vanishing) and at most twice it (the c*32 cost
    // bound really bounds the volume) — the two sides of the
    // subSplit trade, now measured instead of asserted-by-comment.
    val rows = (0L until 2000L).map(u => (11L, 3L, 200L, u))
    val got = pairsDf(rows)
    assert(got == replica(rows))
    assert(!got.exists { case (x, y) => x >= Cap || y >= Cap },
      "truncated id leaked into terminal-level pairs")
    val nsub = (Cap + 31) / 32
    val full = Cap.toLong * (Cap - 1) / 2
    val frac = got.size.toDouble / full
    assert(frac >= 0.5 / nsub,
      f"retained fraction $frac%.4f < half the 1/nsub ideal ${1.0 / nsub}%.4f")
    assert(frac <= 2.0 / nsub,
      f"retained fraction $frac%.4f > twice the 1/nsub ideal — cost bound broken")
  }

  test("random inputs match the naive JVM replica") {
    val rng = new Random(42)
    (1 to 3).foreach { round =>
      val rows = (0 until 1200).map { _ =>
        val h = rng.nextInt(3).toLong
        val b = rng.nextInt(2).toLong
        val m = h * 60 + rng.nextInt(3).toLong // few minutes -> hot blocks + hot minutes
        val u = rng.nextInt(90).toLong
        (h, b, m, u)
      }
      val got = pairsDf(rows)
      val want = replica(rows)
      assert(got == want,
        s"round $round mismatch: got-want=${(got -- want).take(5)} want-got=${(want -- got).take(5)}")
    }
  }
}
