package graft

import org.apache.spark.sql.functions._

import scala.util.Random

/** The density-adaptive co-purchase block builder (r14): a >32-user
  * (hour, band) block is RE-BLOCKED at minute granularity instead of
  * dropped, and only still-hot minutes are dropped. These tests pin
  * (a) that the refined key only activates above the cutoff — a cool
  * hour block pairs users ACROSS minutes exactly as before, (b) the
  * refinement semantics on hot blocks, (c) the clamp's invisibility,
  * and (d) agreement with a naive JVM replica on random inputs.
  */
class CoPurchaseBlockSpec extends SparkSuite {

  private def pairsDf(rows: Seq[(Long, Long, Long, Long)]) = {
    import spark.implicits._
    graft.queries.Relational.blockedCoPurchasePairs(
      rows.toDF("h", "b", "m", "u"))
      .as[(Long, Long)].collect().toSet
  }

  /** Naive replica of the two-level semantics. */
  private def replica(rows: Seq[(Long, Long, Long, Long)]): Set[(Long, Long)] = {
    def allPairs(us: Set[Long]): Set[(Long, Long)] =
      for (x <- us; y <- us if x < y) yield (x, y)
    // .values before flatMap: flatMapping a Map with a tuple-producing
    // function rebuilds a Map and silently dedups pairs by their first
    // element.
    rows.groupBy(r => (r._1, r._2)).values.flatMap { blk =>
      val hourUsers = blk.map(_._4).toSet
      if (hourUsers.size <= 32) allPairs(hourUsers)
      else blk.groupBy(_._3).values.flatMap { mblk =>
        val mu = mblk.map(_._4).toSet
        if (mu.size <= 32) allPairs(mu) else Set.empty[(Long, Long)]
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

  test("hot hour block re-blocks at minute granularity; hot minutes drop") {
    // Hour block with 40 distinct users (> 32): minute 60 holds users
    // 0..9 (cool -> pairs), minute 61 holds users 100..134 (35 users,
    // hot minute -> dropped), minute 62 holds users 10..14 (cool ->
    // pairs). No cross-minute pair may survive.
    val rows =
      (0L until 10L).map(u => (7L, 2L, 60L, u)) ++
      (100L until 135L).map(u => (7L, 2L, 61L, u)) ++
      (10L until 15L).map(u => (7L, 2L, 62L, u))
    val got = pairsDf(rows)
    val want = replica(rows)
    assert(want.nonEmpty && got == want, s"got ${got.size}, want ${want.size}")
    // Refinement really happened: pairs exist, but none cross minutes
    // and none involve the hot minute's users.
    assert(got.contains((0L, 9L)) && got.contains((10L, 14L)))
    assert(!got.exists { case (x, y) => x < 10L && y >= 10L },
      "cross-minute pair leaked out of a hot hour block")
    assert(!got.exists { case (x, y) => x >= 100L || y >= 100L },
      "hot minute emitted pairs")
  }

  test("clamp is unobservable: a >33-user minute changes nothing it shouldn't") {
    // One hot minute (40 users — the collect_set clamp truncates it to
    // 33) next to a cool minute in the same hour block: result must be
    // exactly the cool minute's pairs, as if no clamp existed.
    val rows =
      (200L until 240L).map(u => (9L, 1L, 120L, u)) ++
      Seq[(Long, Long, Long, Long)]((9L, 1L, 121L, 1L), (9L, 1L, 121L, 2L))
    val got = pairsDf(rows)
    assert(got == Set((1L, 2L)), s"clamp leaked: $got")
  }

  test("random inputs match the naive JVM replica") {
    val rng = new Random(42)
    (1 to 3).foreach { _ =>
      val rows = (0 until 800).map { _ =>
        val h = rng.nextInt(4).toLong
        val b = rng.nextInt(2).toLong
        val m = h * 60 + rng.nextInt(4).toLong // few minutes -> hot blocks occur
        val u = rng.nextInt(60).toLong
        (h, b, m, u)
      }
      val got = pairsDf(rows)
      val want = replica(rows)
      assert(got == want,
        s"mismatch: got-want=${(got -- want).take(5)} want-got=${(want -- got).take(5)}")
    }
  }
}
