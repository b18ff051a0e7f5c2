package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Jdbc

/** S9's testable core: the range→predicate split planner. Pure JVM —
  * no database, no Spark session needed. The properties below are the
  * contract a partitioned ingest lives or dies by: every row of the
  * source table (including NULL keys and rows outside [lower, upper])
  * lands in EXACTLY one partition's predicate.
  */
class JdbcSplitSpec extends AnyFunSuite {

  /** Evaluate a planner predicate against a candidate key (None = NULL). */
  private def matches(pred: Option[String], col: String,
      v: Option[Long]): Boolean = pred match {
    case None => true
    case Some(p) =>
      // Grammar is closed (the planner only emits these three shapes),
      // so a tiny structural evaluator is exact — no SQL engine needed.
      val orNull = s" OR $col IS NULL"
      val (core, acceptsNull) =
        if (p.endsWith(orNull)) (p.dropRight(orNull.length), true)
        else (p, false)
      v match {
        case None => acceptsNull
        case Some(x) =>
          core.split(" AND ").forall { c =>
            c match {
              case s"$cc >= $b" if cc == col => x >= b.toLong
              case s"$cc < $b" if cc == col  => x < b.toLong
              case other => fail(s"unexpected predicate clause: $other")
            }
          }
      }
  }

  private def coverageExactlyOnce(col: String, lower: Long, upper: Long,
      n: Int, probes: Seq[Option[Long]]): Unit = {
    val preds = Jdbc.columnPartition(col, lower, upper, n)
    probes.foreach { v =>
      val hits = preds.count(matches(_, col, v))
      assert(hits == 1, s"key $v matched $hits partitions (want 1) in $preds")
    }
  }

  test("4-way split over 0..100: half-open strides, ends unbounded, nulls in first") {
    val got = Jdbc.columnPartition("id", 0, 100, 4)
    assert(got == Seq(
      Some("id < 25 OR id IS NULL"),
      Some("id >= 25 AND id < 50"),
      Some("id >= 50 AND id < 75"),
      Some("id >= 75")))
  }

  test("every key (incl. NULL and out-of-range) lands in exactly one partition") {
    val probes = Seq[Option[Long]](None, Some(Long.MinValue), Some(-1),
      Some(0), Some(24), Some(25), Some(49), Some(50), Some(99), Some(100),
      Some(101), Some(Long.MaxValue))
    coverageExactlyOnce("id", 0, 100, 4, probes)
    coverageExactlyOnce("id", 0, 100, 7, probes)   // non-dividing stride
    coverageExactlyOnce("id", -50, 37, 5, probes)  // negative lower bound
  }

  test("numPartitions = 1 scans without a predicate") {
    assert(Jdbc.columnPartition("id", 0, 100, 1) == Seq(None))
  }

  test("range narrower than requested parallelism clamps the split count") {
    val got = Jdbc.columnPartition("id", 10, 13, 16)
    assert(got.size == 3, s"width-3 range must clamp 16 -> 3, got $got")
    coverageExactlyOnce("id", 10, 13, 16,
      Seq(None, Some(9), Some(10), Some(11), Some(12), Some(13), Some(14)))
    // Degenerate empty range: one full-scan partition, never zero.
    assert(Jdbc.columnPartition("id", 5, 5, 8) == Seq(None))
  }

  test("stride arithmetic is overflow-safe at extreme bounds") {
    val got = Jdbc.columnPartition("id", Long.MinValue / 2, Long.MaxValue / 2, 4)
    assert(got.size == 4)
    coverageExactlyOnce("id", Long.MinValue / 2, Long.MaxValue / 2, 4,
      Seq(None, Some(Long.MinValue), Some(0), Some(Long.MaxValue)))
    // div-first: bounds must be monotone increasing (a naive
    // (upper-lower)/n would have wrapped negative here).
    val bounds = got.flatten.flatMap(_.split(" ")
      .filter(t => t.forall(c => c.isDigit || c == '-')).map(_.toLong))
    assert(bounds == bounds.sorted)
  }

  test("small cross-zero range keeps distinct boundaries (no stride-0 funnel)") {
    // -5..6 with n=8: width 11 >= 8 so the clamp doesn't fire, but the
    // div-first stride truncates to 0 (6/8 − (-5)/8 = 0). The planner
    // must re-derive stride 1 so each partition gets a distinct boundary
    // instead of funnelling every in-range row into the last connection.
    val got = Jdbc.columnPartition("id", -5, 6, 8)
    assert(got.size == 8)
    val bounds = got.flatten.flatMap(_.stripSuffix(" OR id IS NULL")
      .split(" AND ").map(_.split(" ").last.toLong)).distinct
    assert(bounds == bounds.sorted && bounds.size == 7,
      s"boundaries must be 7 distinct increasing values, got $bounds in $got")
    coverageExactlyOnce("id", -5, 6, 8,
      Seq(None, Some(-6), Some(-5), Some(-1), Some(0), Some(1), Some(5),
        Some(6), Some(7), Some(Long.MinValue), Some(Long.MaxValue)))
    // Each middle partition is non-vacuous: lower bound strictly below
    // its upper bound.
    got.flatten.foreach { p =>
      val core = p.stripSuffix(" OR id IS NULL")
      core.split(" AND ").toSeq match {
        case Seq(s"id >= $l", s"id < $u") =>
          assert(l.toLong < u.toLong, s"vacuous middle stride: $p")
        case _ => ()
      }
    }
  }

  test("planner rejects inverted bounds and non-positive partition counts") {
    intercept[IllegalArgumentException](Jdbc.columnPartition("id", 10, 5, 2))
    intercept[IllegalArgumentException](Jdbc.columnPartition("id", 0, 10, 0))
  }
}
