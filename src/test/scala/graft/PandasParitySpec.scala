package graft

import org.apache.spark.sql.functions._

import scala.util.Random

/** The pandas-parity variants (q120-q122) against NAIVE JVM recomputation
  * on randomized fixtures — the DuckDB oracle only proves the one shipped
  * fixture; these runs hit ties, ragged group sizes, and single-row groups
  * the fixture may not contain. Pattern from `PackingCurationSpec`: write a
  * temp orders.parquet, call the registry query on the temp dir, compare.
  */
class PandasParitySpec extends SparkSuite {

  private def withRandomOrders[T](seed: Int)(body: String => T): T = {
    import spark.implicits._
    val rng = new Random(seed)
    val dir = java.nio.file.Files.createTempDirectory(s"orders_$seed").toString
    // Ragged groups incl. singletons; 2-decimal prices incl. exact ties;
    // colliding order dates so keep-last exercises the key tie-break.
    val rows = (0L until 400L).map { k =>
      (k, rng.nextInt(40).toLong,
        java.sql.Date.valueOf(f"1995-${1 + rng.nextInt(12)}%02d-${1 + rng.nextInt(28)}%02d"),
        (100 + rng.nextInt(2000)) / 4.0) // .0/.25/.5/.75 → exact doubles, many ties
    }
    rows.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    try body(dir)
    finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(dir))
    }
  }

  test("q120 rolling median == naive sliding-window median on random orders") {
    import spark.implicits._
    withRandomOrders(31) { dir =>
      val got = SparkEntry.queries("q120_rolling_median")(spark, dir)
        .select("o_orderkey", "rolling_median").as[(Long, Double)]
        .collect().toMap
      val raw = spark.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
        .as[(Long, Long, java.sql.Date, Double)].collect()
      raw.groupBy(_._2).values.foreach { g =>
        val ordered = g.sortBy(r => (r._3.toString, r._1))
        ordered.indices.foreach { i =>
          val frame = ordered.slice(math.max(0, i - 4), i + 1)
            .map(r => math.round(r._4 * 100)).sorted
          val m = frame.length
          val medCents =
            if (m % 2 == 1) frame(m / 2).toDouble
            else (frame(m / 2 - 1) + frame(m / 2)) / 2.0
          val want = medCents / 100.0
          val key = ordered(i)._1
          assert(got(key) == want, s"order $key: ${got(key)} != $want")
        }
      }
    }
  }

  test("q121 z-score == naive per-group standardization on random orders") {
    import spark.implicits._
    withRandomOrders(47) { dir =>
      val got = SparkEntry.queries("q121_group_transform_zscore")(spark, dir)
        .select("o_orderkey", "z").as[(Long, Double)].collect().toMap
      val raw = spark.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .as[(Long, Long, Double)].collect()
      var checked = 0
      raw.groupBy(_._2).values.foreach { g =>
        val cents = g.map(r => math.round(r._3 * 100))
        val n = cents.length.toDouble
        val sx = cents.sum.toDouble
        val sxx = cents.map(c => c * c).sum.toDouble
        val sigma = math.sqrt((sxx - sx * sx / n) / (n - 1.0))
        if (cents.length >= 2 && sigma > 0) {
          val mu = sx / n
          g.foreach { r =>
            val want = (math.round(r._3 * 100) - mu) / sigma
            assert(got(r._1) == want, s"order ${r._1}: ${got(r._1)} != $want")
            checked += 1
          }
        } else g.foreach(r => assert(!got.contains(r._1),
          s"order ${r._1} from a degenerate group must be filtered"))
      }
      assert(checked > 100, "fixture failed to exercise enough groups")
    }
  }

  test("q122 keep-last == naive latest-by-(date,key) on random orders") {
    import spark.implicits._
    withRandomOrders(59) { dir =>
      val got = SparkEntry.queries("q122_dedup_keep_last")(spark, dir)
        .select("o_custkey", "o_orderkey", "n_orders")
        .as[(Long, Long, Long)].collect()
      val raw = spark.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_orderdate")
        .as[(Long, Long, java.sql.Date)].collect()
      val want = raw.groupBy(_._2).map { case (ck, g) =>
        ck -> (g.maxBy(r => (r._3.toString, r._1))._1, g.length.toLong)
      }
      assert(got.length == want.size)
      got.foreach { case (ck, ok, n) =>
        assert(want(ck) == ((ok, n)), s"custkey $ck: ($ok,$n) != ${want(ck)}")
      }
    }
  }

  test("q137 null-safe join == equality pairs + null-null cross pairs") {
    import spark.implicits._
    val rng = new Random(61)
    val dir = java.nio.file.Files.createTempDirectory("nullsafe").toString
    try {
      // Random nationkeys; % 5 == 2 becomes the NULL bucket on both sides.
      val cust = (0L until 300L).map(k => (k, rng.nextInt(25)))
      val supp = (0L until 40L).map(k => (k, rng.nextInt(25)))
      cust.toDF("c_custkey", "c_nationkey")
        .write.mode("overwrite").parquet(s"$dir/customer.parquet")
      supp.toDF("s_suppkey", "s_nationkey")
        .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
      val got = SparkEntry.queries("q137_nullsafe_join")(spark, dir)
        .select("key_group", "n_pairs").as[(Long, Long)].collect().toMap
      def key(nk: Int): Option[Int] = Some(nk % 5).filter(_ != 2)
      val want = (for {
        (_, cn) <- cust
        (_, sn) <- supp
        if key(cn) == key(sn) // None == None: the NaN==NaN merge semantics
      } yield key(cn).getOrElse(-1).toLong)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(got == want, s"$got != $want")
      // the NULL group must exist and be the full null×null cross product
      val nullPairs =
        cust.count(c => key(c._2).isEmpty).toLong *
          supp.count(s => key(s._2).isEmpty)
      assert(got(-1L) == nullPairs)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(dir))
    }
  }

  test("q138 pivot_table == naive conditional aggregation, incl. empty cells") {
    import spark.implicits._
    val rng = new Random(67)
    val dir = java.nio.file.Files.createTempDirectory("pivot").toString
    try {
      // No '1-URGENT' order ever has status 'P': the empty pivot cell is
      // the case the shipped fixture never exercises (count 0 vs NULL is
      // where engines can silently diverge).
      val rows = (0L until 500L).map { k =>
        val pri = s"${1 + rng.nextInt(3)}-PRI"
        val st0 = Seq("F", "O", "P")(rng.nextInt(3))
        val st = if (pri == "1-PRI" && st0 == "P") "F" else st0
        (k, pri, st, (100 + rng.nextInt(2000)) / 4.0)
      }
      rows.toDF("o_orderkey", "o_orderpriority", "o_orderstatus", "o_totalprice")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      val got = SparkEntry.queries("q138_pivot_table_multi")(spark, dir)
        .select("o_orderpriority", "F_n", "F_total", "O_n", "O_total",
          "P_n", "P_total")
        .as[(String, java.lang.Long, java.lang.Double, java.lang.Long,
          java.lang.Double, java.lang.Long, java.lang.Double)]
        .collect().map(r => r._1 -> r).toMap
      rows.groupBy(_._2).foreach { case (pri, g) =>
        val r = got(pri)
        def cell(st: String): (Long, Option[Double]) = {
          val xs = g.filter(_._3 == st).map(t => BigDecimal(t._4))
          (xs.size.toLong, if (xs.isEmpty) None else Some(xs.sum.toDouble))
        }
        val (fn, ft) = cell("F"); val (on, ot) = cell("O"); val (pn, pt) = cell("P")
        assert(r._2 == fn && r._4 == on && r._6 == pn,
          s"$pri counts: $r vs ($fn,$on,$pn)")
        assert(Option(r._3).map(_.toDouble) == ft
          && Option(r._5).map(_.toDouble) == ot
          && Option(r._7).map(_.toDouble) == pt,
          s"$pri sums: $r vs ($ft,$ot,$pt)")
      }
      // the engineered empty cell really is empty
      assert(got("1-PRI")._6 == 0L && got("1-PRI")._7 == null)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(dir))
    }
  }

  test("q142 rolling corr == naive sliding-window moments on random data") {
    import spark.implicits._
    val rng = new Random(73)
    val dir = java.nio.file.Files.createTempDirectory("rollcorr").toString
    try {
      // Duplicate (orderkey, linenumber) keys, colliding shipdates, and a
      // constant-quantity supplier (zero-variance windows → NULL) — the
      // degenerate shapes the fixture may not contain.
      val rows = (0 until 300).map { _ =>
        val sk = rng.nextInt(6).toLong
        (sk,
          java.sql.Timestamp.valueOf(f"1995-01-${1 + rng.nextInt(9)}%02d 00:00:00"),
          rng.nextInt(40).toLong, rng.nextInt(3) + 1,
          if (sk == 5L) 7.0 else (rng.nextInt(5000) + 1) / 100.0,
          (rng.nextInt(2000000) + 1) / 100.0)
      }
      rows.toDF("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber",
        "l_quantity", "l_extendedprice")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      val key = (r: (Long, java.sql.Timestamp, Long, Int, Double, Double)) =>
        (r._1, r._2.getTime, r._3, r._4, r._5, r._6)
      val got = SparkEntry.queries("q142_rolling_corr")(spark, dir)
        .select("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber",
          "l_quantity", "l_extendedprice", "roll_corr")
        .as[(Long, java.sql.Timestamp, Long, Int, Double, Double,
          java.lang.Double)]
        .collect().sortBy(r => key((r._1, r._2, r._3, r._4, r._5, r._6)))
      // naive recomputation mirroring the query's exact arithmetic: BD
      // sums of the 2-decimal inputs / half-up scale-4 products, then the
      // identical double expression tree
      import scala.math.BigDecimal.RoundingMode.HALF_UP
      val want = rows.groupBy(_._1).toSeq.flatMap { case (_, g) =>
        val sorted = g.sortBy(key)
        sorted.indices.map { i =>
          val fr = sorted.slice(math.max(0, i - 6), i + 1)
          val n = fr.size.toDouble
          def bd(f: ((Long, java.sql.Timestamp, Long, Int, Double, Double)) => Double) =
            fr.map(r => BigDecimal(f(r)).setScale(6, HALF_UP)).sum.toDouble
          def bd4(f: ((Long, java.sql.Timestamp, Long, Int, Double, Double)) => Double) =
            fr.map(r => BigDecimal(f(r)).setScale(4, HALF_UP)).sum.toDouble
          val sx = bd(_._5); val sy = bd(_._6)
          val sxx = bd4(r => r._5 * r._5); val syy = bd4(r => r._6 * r._6)
          val sxy = bd4(r => r._5 * r._6)
          val vx = sxx - sx * sx / n; val vy = syy - sy * sy / n
          val corr: java.lang.Double =
            if (n >= 2 && vx > 0 && vy > 0)
              (sxy - sx * sy / n) / (math.sqrt(vx) * math.sqrt(vy))
            else null
          (sorted(i), corr)
        }
      }.sortBy(r => key(r._1)).map(_._2)
      assert(got.length == want.length)
      got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
        assert(g._7 == w, s"row $i: ${g._7} != $w (${got(i)})")
      }
      assert(want.contains(null) && want.exists(_ != null),
        "fixture failed to exercise both branches")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(dir))
    }
  }

  // q151 parity edge 1: DUPLICATE timestamps. pandas `ewm(halflife=h,
  // times=t)` permits non-strictly-increasing times; coincident
  // observations get Δt = 0 → decay 0.5^0 = 1, i.e. EQUAL weights
  // (w_i = 0.5^{(t_last − t_i)/h} coincide). The struct fold must
  // reproduce that — and keep doing so when the equal-time run straddles
  // a block boundary (blockRows = 2 forces the first duplicate pair
  // astride blocks 0/1, so phase 2's re-anchor decay is exactly 1).
  // Values are halves and the lone decay is 0.5 (a power of two), so
  // every sum is exact in binary — the pins are exact constants.
  test("q151 duplicate timestamps: Δt=0 decays by 1 (pandas equal weights)") {
    import spark.implicits._
    val h = 3600.0
    val data = Seq( // (user_id, ts sec, event_id, value)
      (1L, 0L, 0L, 10.0), (1L, 0L, 1L, 20.0),
      (1L, 3600L, 2L, 30.0), (1L, 3600L, 3L, 40.0), (1L, 3600L, 4L, 50.0))
    val df = data.toDF("user_id", "ts", "event_id", "value")
    val (n, sx, sw) = graft.queries.Windows
      .ewmHalflifeTwoPhase(df, h, blockRows = 2)
      .select("n_events", "sx", "sw").as[(Long, Double, Double)]
      .collect().head
    // explicit pandas weights: 0.5^{(3600−0)/3600} = 0.5 for the two
    // t=0 rows, 1 for the three t=3600 rows
    assert(n == 5L)
    assert(sx == 0.5 * (10.0 + 20.0) + 30.0 + 40.0 + 50.0, s"sx $sx") // 135
    assert(sw == 0.5 * 2 + 3.0, s"sw $sw")                            // 4
    assert(sx / sw == 33.75, s"mean ${sx / sw}")
  }

  // q151 parity edge 2: min_periods. pandas `ewm(..., times=...,
  // min_periods=k).mean()` leaves the result NaN until k observations
  // have arrived — at the series' LAST row (q151's per-key surface)
  // that is NaN iff the key has fewer than k events. q151 ships
  // n_events for exactly this gate: `when(n_events >= k, mean)` is the
  // documented consumer idiom, pinned here against keys below, at, and
  // above the floor.
  test("q151 min_periods floor: n_events gates the mean like pandas") {
    import spark.implicits._
    val h = 3600.0
    val minP = 3
    val data = (1 to 4).flatMap { k => // key k has exactly k events
      (0 until k).map(i => (k.toLong, i * 1800L, i.toLong, (k * 10 + i).toDouble))
    }
    val got = graft.queries.Windows
      .ewmHalflifeTwoPhase(data.toDF("user_id", "ts", "event_id", "value"),
        h, blockRows = 2)
      .select(col("user_id"),
        when(col("n_events") >= minP, col("sx") / col("sw")).as("mean"))
      .as[(Long, Option[Double])].collect().toMap
    assert(got(1L).isEmpty && got(2L).isEmpty,
      s"keys under min_periods=3 must be NULL: $got")
    Seq(3L, 4L).foreach { k =>
      val rows = data.filter(_._1 == k)
      val tLast = rows.map(_._2).max
      val w = rows.map(r => math.pow(0.5, (tLast - r._2).toDouble / h))
      val want = w.zip(rows.map(_._4)).map { case (a, b) => a * b }.sum / w.sum
      val m = got(k).getOrElse(fail(s"key $k unexpectedly NULL"))
      assert(math.abs(m - want) <= 1e-12 * math.max(1.0, math.abs(want)),
        s"key $k: $m vs pandas-weight $want")
    }
  }

  // pandas qcut parity edge: on a CONSTANT column all quantile edges
  // coincide. pandas' default raises ValueError("Bin edges must be
  // unique"); with duplicates='drop' it merges the coincident bins and
  // returns ONE bin holding every row. q150 takes the drop-like path
  // without raising: `cents > edge` is false for every coincident edge,
  // so every row lands in bin 1 and bins 2-4 are EMPTY (absent from the
  // grouped output) — the same single-bin partition, keeping 1-based
  // positional labels where pandas renumbers. This test pins that
  // divergence-by-design (documented in q150's scaladoc).
  test("q150 qcut constant column: coincident edges collapse to one bin") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("qcut_const").toString
    try {
      (0L until 100L).map(k =>
          (k, k % 7, java.sql.Date.valueOf("1995-01-01"), 42.5))
        .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      val got = SparkEntry.queries("q150_qcut")(spark, dir)
        .select("bin", "n", "lo", "hi").as[(Long, Long, Double, Double)]
        .collect().toSeq
      assert(got == Seq((1L, 100L, 42.5, 42.5)),
        s"constant column must yield exactly bin 1 with all rows: $got")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(dir))
    }
  }
}
