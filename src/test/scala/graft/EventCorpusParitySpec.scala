package graft

import org.apache.spark.sql.functions._

import scala.util.Random

/** q158–q162 against naive JVM recomputation / property checks on
  * randomized temp fixtures — the DuckDB oracle proves the one shipped
  * fixture; these runs hit the edges the fixture may not contain (leading/
  * trailing gaps, changelog re-delivery, single-source groups, top-k
  * truncation ties). Pattern from `PandasParitySpec`: write a temp
  * parquet fixture, call the registry query on the temp dir, compare.
  */
class EventCorpusParitySpec extends SparkSuite {

  private def withTempDir[T](tag: String)(body: String => T): T = {
    val dir = java.nio.file.Files.createTempDirectory(tag).toString
    try body(dir)
    finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(dir))
    }
  }

  /** Events rows as the fixture's nanos-BIGINT generation (the loader
    * normalizes either physical type to this contract). */
  private def writeEvents(dir: String,
      rows: Seq[(Long, Long, Long, String, Double)]): Unit = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def round9(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()

  // q158 vs a naive pandas `resample('10min').sum().interpolate()` replica:
  // sparse buckets force interior gaps, one type starts late (leading-NULL
  // edge) and one ends early (trailing carry-forward edge).
  test("q158 linear interpolation == naive pandas-replica on sparse random events") {
    val rng = new Random(83)
    val stepUs = 10L * 60 * 1000000
    val types = Seq("click", "view", "purchase")
    val rows = (0L until 300L).flatMap { i =>
      val t = types(rng.nextInt(3))
      // sparse: ~half the 40-bucket axis has no event for a given type;
      // 'view' only in the back half (leading gap), 'purchase' only in
      // the front half (trailing gap).
      val bucket = t match {
        case "view"     => 20 + rng.nextInt(20)
        case "purchase" => rng.nextInt(20)
        case _          => rng.nextInt(40)
      }
      if (rng.nextBoolean()) Nil
      else {
        val us = bucket * stepUs + rng.nextInt(600) * 1000000L
        Seq((i, us * 1000L, rng.nextInt(50).toLong, t,
          (100 + rng.nextInt(100000)) / 1000.0))
      }
    }
    withTempDir("q158_parity") { dir =>
      writeEvents(dir, rows)
      val got = SparkEntry.queries("q158_resample_interpolate")(spark, dir)
        .select(col("event_type"), col("n"), col("filled_value"), col("was_gap"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getBoolean(3)))

      // replica: decimal-exact bucket sums, then pandas 'linear' fill.
      val byKey = rows.groupBy(r => (r._4, r._2 / 1000 / stepUs))
      val known = byKey.map { case (k, g) =>
        k -> (g.size.toLong,
          g.map(r => java.math.BigDecimal.valueOf(r._5)
            .setScale(6, java.math.RoundingMode.HALF_UP))
            .reduce(_ add _).doubleValue())
      }
      val buckets = rows.map(r => r._2 / 1000 / stepUs)
      val (lo, hi) = (buckets.min, buckets.max)
      val want = rows.map(_._4).distinct.sorted.flatMap { t =>
        val kb = known.keys.filter(_._1 == t).map(_._2)
        (lo to hi).map { b =>
          known.get((t, b)) match {
            case Some((n, v)) => (t, n, Some(v), false)
            case None =>
              val prev = kb.filter(_ < b) match { case e if e.isEmpty => None
                case e => Some(e.max) }
              val next = kb.filter(_ > b) match { case e if e.isEmpty => None
                case e => Some(e.min) }
              val fv = (prev, next) match {
                case (None, _) => None
                case (Some(p), None) => Some(known((t, p))._2)
                case (Some(p), Some(nx)) =>
                  val pv = known((t, p))._2; val nv = known((t, nx))._2
                  Some(pv + (nv - pv) * ((b - p).toDouble / (nx - p).toDouble))
              }
              (t, 0L, fv, true)
          }
        }
      }
      assert(got.length == want.length, s"${got.length} != ${want.length}")
      got.zip(want).foreach { case (g, w) => assert(g == w, s"$g != $w") }
      assert(want.exists(r => r._4 && r._3.isEmpty), "no leading-NULL edge hit")
      assert(want.exists(r => r._4 && r._3.isDefined), "no interpolated gap hit")
    }
  }

  // q159 idempotence: applying the same changelog to the already-applied
  // snapshot is a no-op — the at-least-once-delivery safety property the
  // scaladoc claims. Re-deliver by feeding run 1's output back as the base.
  test("q159 CDC apply is idempotent under changelog re-delivery") {
    import spark.implicits._
    val rng = new Random(19)
    val base = (0L until 50L).map(k =>
      (k, s"cust$k", (1000 + rng.nextInt(9000)) / 100.0))
    // users 20..79: keys 50..79 → inserts, base keys 0..19 stay untouched
    // (pass-through path); duplicate (user, ts) pairs → the event_id
    // tie-break decides the winner; 'error' → delete.
    val evs = (0L until 400L).map { i =>
      val user = (20 + rng.nextInt(60)).toLong
      val tsNs = (rng.nextInt(50) * 60L * 1000000 * 1000)
      val et = Seq("click", "purchase", "error")(rng.nextInt(3))
      (i, tsNs, user, et, rng.nextInt(10000) / 100.0)
    }
    def runOn(dir: String) =
      SparkEntry.queries("q159_cdc_upsert")(spark, dir)
        .select("key", "name", "bal", "src")
        .as[(Long, String, Double, String)].collect().toSeq
    withTempDir("q159_idem") { dir1 =>
      base.toDF("c_custkey", "c_name", "c_acctbal")
        .write.mode("overwrite").parquet(s"$dir1/customer.parquet")
      writeEvents(dir1, evs)
      val r1 = runOn(dir1)
      withTempDir("q159_idem2") { dir2 =>
        r1.toDF("c_custkey", "c_name", "c_acctbal", "src")
          .drop("src")
          .write.mode("overwrite").parquet(s"$dir2/customer.parquet")
        writeEvents(dir2, evs)
        val r2 = runOn(dir2)
        assert(r2.map(t => (t._1, t._2, t._3)) == r1.map(t => (t._1, t._2, t._3)))
      }
      // the changelog actually exercised all three ops
      assert(r1.exists(_._4 == "cdc") && r1.exists(_._4 == "base"))
      assert(r1.exists(_._2.startsWith("new-")), "no insert path hit")
      val deleted = evs.groupBy(_._3).filter { case (_, g) =>
        val w = g.maxBy(e => (e._2, e._1)); w._4 == "error"
      }.keySet.filter(_ < 50)
      assert(deleted.nonEmpty && deleted.forall(k => !r1.exists(_._1 == k)),
        "no delete path hit")
    }
  }

  // q172 vs a naive JVM TWAP replica on random irregular readings — same
  // holding intervals, same FLOOR quantization, same fpTrunc; exact
  // equality. A constant-value type is planted: its TWAP must equal the
  // constant (the invariant a row-mean also satisfies here, but with
  // quantization ≤1e-6 truncation per row allowed for).
  test("q172 TWAP == naive JVM replica; constant series → its constant") {
    val rng = new Random(37)
    val rows = (0L until 300L).flatMap { i =>
      val t = Seq("click", "view", "flat")(rng.nextInt(3))
      val us = rng.nextInt(36000) * 100000L // irregular, collisions likely
      val v = if (t == "flat") 42.25 else (rng.nextInt(20000)) / 100.0
      Seq((i, us * 1000L, rng.nextInt(9).toLong, t, v))
    }
    withTempDir("q172_twap") { dir =>
      writeEvents(dir, rows)
      val got = SparkEntry.queries("q172_twap")(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3)))
      val endUs = rows.map(_._2 / 1000).max
      val want = rows.groupBy(_._4).toSeq.sortBy(_._1).map { case (t, g) =>
        val ordered = g.map(r => (r._2 / 1000, r._1, r._5))
          .sortBy(r => (r._1, r._2))
        val su = ordered.zipWithIndex.map { case ((us, _, v), i) =>
          val next = if (i + 1 < ordered.size) ordered(i + 1)._1 else endUs
          math.floor(v * ((next - us).toDouble / 1e6) * 1e6).toLong
        }.sum
        val dur = (endUs - ordered.head._1).toDouble / 1e6
        (t, g.size.toLong, math.floor(dur * 1e6) / 1e6,
          math.floor(((su.toDouble / 1e6) / dur) * 1e6) / 1e6)
      }
      assert(got.toSeq == want, s"${got.toSeq} != $want")
      val flat = got.find(_._1 == "flat").get
      assert(math.abs(flat._4 - 42.25) < 1e-5,
        s"constant series TWAP ${flat._4} != 42.25")
    }
  }

  private def writeDocs(dir: String,
      rows: Seq[(Long, String, String, String)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  // q160 vs a naive replica + the information-theoretic bounds:
  // 0 ≤ H ≤ ln(n_sources), H = 0 iff one source. A single-source lang is
  // planted to pin the boundary case.
  test("q160 mode/entropy == naive replica; entropy within [0, ln k]") {
    val rng = new Random(41)
    val rows = (0L until 500L).map { i =>
      val lang = Seq("en", "fr", "de", "zz")(rng.nextInt(4))
      val source = if (lang == "zz") "web"
        else Seq("web", "book", "code", "wiki", "news")(rng.nextInt(5))
      (i, s"doc $i", lang, source)
    }
    withTempDir("q160_parity") { dir =>
      writeDocs(dir, rows)
      val got = SparkEntry.queries("q160_group_mode_entropy")(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getString(4), r.getLong(5)))
      val want = rows.groupBy(_._3).toSeq.sortBy(_._1).map { case (lang, g) =>
        val counts = g.groupBy(_._4).map { case (s, d) => (s, d.size.toLong) }
        val (modeSrc, modeCnt) = counts.toSeq.minBy { case (s, c) => (-c, s) }
        val n = g.size.toLong
        val h = -counts.toSeq.sortBy(_._1).map { case (_, c) =>
          (c.toDouble / n.toDouble) * math.log(c.toDouble / n.toDouble)
        }.foldLeft(0.0)(_ + _)
        (lang, n, counts.size.toLong, round9(h), modeSrc, modeCnt)
      }
      assert(got.toSeq == want, s"${got.toSeq} != $want")
      got.foreach { r =>
        assert(r._4 >= 0.0 && r._4 <= math.log(r._3.toDouble) + 1e-9,
          s"entropy out of [0, ln k]: $r")
      }
      val single = got.find(_._1 == "zz").get
      assert(single._3 == 1L && single._4 == 0.0, s"single-source H != 0: $single")
    }
  }

  private def randomCorpus(rng: Random, nDocs: Int, vocab: IndexedSeq[String])
      : Seq[(Long, String, String, String)] =
    (0L until nDocs.toLong).map { i =>
      // Zipf-ish skew so counts are ragged and ties still occur.
      val n = 5 + rng.nextInt(35)
      val words = Seq.fill(n)(vocab(
        math.min(vocab.size - 1, (math.pow(rng.nextDouble(), 2) * vocab.size).toInt)))
      (i, words.mkString(" "), "en", "web")
    }

  // q161 vs a naive unigram-LM replica: same fold order (position-sorted),
  // same ln inputs, same 9-decimal rounding → exact equality.
  test("q161 unigram log-prob == naive JVM replica on a random corpus") {
    val rng = new Random(59)
    val vocab = (0 until 30).map(i => s"w$i")
    // 120 stereotyped docs + 5 gibberish docs of singleton rare tokens —
    // the latter land far above the 3.8 gate, so the flag splits.
    val rows = randomCorpus(rng, 120, vocab) ++
      (120L until 125L).map(i =>
        (i, (0 until 8).map(j => s"junk${i}_$j").mkString(" "), "en", "web"))
    withTempDir("q161_parity") { dir =>
      writeDocs(dir, rows)
      val got = SparkEntry.queries("q161_unigram_logprob")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getBoolean(3)))
      val toks = rows.flatMap(r => r._2.split(" ").map(w => (r._1, w)))
      val tot = toks.size.toLong
      val logp = toks.groupBy(_._2).map { case (w, g) =>
        w -> math.log(g.size.toDouble / tot.toDouble) }
      val want = rows.map { r =>
        val ws = r._2.split(" ")
        val s = ws.map(logp).foldLeft(0.0)(_ + _)
        val avg = round9(-(s / ws.length.toDouble))
        (r._1, ws.length.toLong, avg, avg > 3.8)
      }
      assert(got.toSeq == want)
      assert(got.exists(_._4) && got.exists(!_._4), "gate never split the corpus")
    }
  }

  // q169's orphan arithmetic on a fixture with KNOWN violations injected
  // into every FK edge — the shipped fixture's first three checks are
  // clean, so without this the anti-join counting would only ever see 0.
  test("q169 counts injected FK violations exactly") {
    import spark.implicits._
    withTempDir("q169_fk") { dir =>
      // 5 nations; customers 0..19 but 17..19 point at nations 90..92
      // (3 orphan rows / 3 bad keys); orders 0..29 over custkeys 0..25
      // (custkeys 20..25 missing → orphans); lineitems reference
      // orderkeys 0..34 (30..34 missing); events users 0..14 vs
      // allowlist custkey<10 → users 10..14 orphaned.
      (0L until 5L).map(n => (n, s"nation$n")).toDF("n_nationkey", "n_name")
        .write.mode("overwrite").parquet(s"$dir/nation.parquet")
      (0L until 20L).map(c => (c, s"cust$c",
          (if (c >= 17) 90 + c - 17 else c % 5).toInt))
        .toDF("c_custkey", "c_name", "c_nationkey")
        .write.mode("overwrite").parquet(s"$dir/customer.parquet")
      (0L until 30L).map(o => (o, o % 26))
        .toDF("o_orderkey", "o_custkey")
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      (0L until 70L).map(l => (l, l % 35))
        .toDF("l_linenumber", "l_orderkey")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      (0L until 40L).map(i => (i, i % 15, i * 60000000000L, "click", 1.0, "{}"))
        .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = SparkEntry.queries("q169_fk_audit")(spark, dir)
        .as[(String, Long, Long, Long)].collect().toSeq
      val want = Seq(
        ("customer.nationkey->nation", 20L, 3L, 3L),
        ("events.user->allowlist", 40L, 10L, 5L),
        ("lineitem.orderkey->orders", 70L, 10L, 5L),
        ("orders.custkey->customer", 30L, 6L, 6L))
      assert(got == want, s"$got != $want")
    }
  }

  // q171 vs a naive bigram-LM replica: same counts, same smoothing
  // arithmetic, same position-sorted fold, same fpTrunc — exact equality.
  test("q171 bigram log-prob == naive JVM replica on a random corpus") {
    val rng = new Random(97)
    val vocab = (0 until 25).map(i => s"w$i")
    val rows = randomCorpus(rng, 100, vocab)
    withTempDir("q171_parity") { dir =>
      writeDocs(dir, rows)
      val got = SparkEntry.queries("q171_bigram_logprob")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      val bigrams = rows.flatMap { r =>
        val ws = r._2.split(" ")
        (1 until ws.length).map(i => (r._1, i.toLong, ws(i - 1), ws(i)))
      }
      val v = bigrams.map(_._4).distinct.size
      val cb = bigrams.groupBy(b => (b._3, b._4)).map { case (k, g) =>
        (k, g.size.toLong) }
      val cp = bigrams.groupBy(_._3).map { case (k, g) => (k, g.size.toLong) }
      val want = bigrams.groupBy(_._1).toSeq.sortBy(_._1).map { case (id, g) =>
        val s = g.sortBy(_._2).map { b =>
          math.log((cb((b._3, b._4)).toDouble + 0.5) /
            (cp(b._3).toDouble + 0.5 * v.toDouble))
        }.foldLeft(0.0)(_ + _)
        val avg = math.floor(-(s / g.size.toDouble) * 1e9) / 1e9
        (id, g.size.toLong, avg)
      }
      assert(got.toSeq == want)
    }
  }

  // q173 vs a naive JVM hashing-trick replica: same md5-prefix word hash,
  // same bucket/sign arithmetic — exact equality, and collisions with
  // cancelling signs must actually occur (else the signed variant is
  // untested against the unsigned one).
  test("q173 feature hashing == naive JVM replica on a random corpus") {
    val rng = new Random(89)
    val vocab = (0 until 200).map(i => s"w$i")
    val rows = randomCorpus(rng, 25, vocab)
    withTempDir("q173_parity") { dir =>
      writeDocs(dir, rows)
      val got = SparkEntry.queries("q173_feature_hashing")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
      def h32(w: String): Long = {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(w.getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString.take(8)
        java.lang.Long.parseLong(hex, 16)
      }
      val want = rows.filter(_._1 < 30).flatMap { r =>
        r._2.split(" ").map { w => (r._1, h32(w)) }
      }.groupBy { case (id, h) => (id, h % 64) }
        .toSeq.sortBy(_._1).map { case ((id, fidx), g) =>
          val v = g.map { case (_, h) => if ((h / 64) % 2 == 0) 1L else -1L }.sum
          (id, fidx, v, g.size.toLong)
        }
      assert(got == want, s"$got != $want")
      // signed cancellation exercised: some bucket's |val| < n_terms
      assert(want.exists(t => math.abs(t._3) < t._4),
        "no sign cancellation occurred — fixture too small")
    }
  }

  // q174's merge contract replayed in JVM decimals: daily BigDecimal
  // partials rolled monthly == direct monthly — exact.
  test("q174 partial-aggregate merge == direct JVM decimal totals") {
    val rng = new Random(61)
    val rows = (0L until 500L).map { i =>
      val day = 19000L + rng.nextInt(70) // spans 3 m30 buckets
      val us = day * 86400000000L + rng.nextInt(86400) * 1000000L
      (i, us * 1000L, rng.nextInt(9).toLong,
        Seq("click", "view")(rng.nextInt(2)), rng.nextInt(100000) / 1000.0)
    }
    withTempDir("q174_merge") { dir =>
      writeEvents(dir, rows)
      val got = SparkEntry.queries("q174_partial_agg_merge")(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSeq
      val want = rows.groupBy(r => (r._4, r._2 / 1000 / 86400000000L / 30))
        .toSeq.sortBy(_._1).map { case ((t, m), g) =>
          val days = g.map(_._2 / 1000 / 86400000000L).distinct.size.toLong
          val tot = g.map(r => java.math.BigDecimal.valueOf(r._5)
              .setScale(6, java.math.RoundingMode.HALF_UP))
            .reduce(_ add _).doubleValue()
          (t, m, days, g.size.toLong, tot)
        }
      assert(got == want, s"$got != $want")
    }
  }

  // q162 vs a naive least-squares replica — 150-word vocab so the top-100
  // LIMIT actually truncates and the (cnt desc, word) tie-break at the
  // cut line is exercised; identical sequential fold → exact equality.
  test("q162 Zipf slope == naive JVM replica with top-k truncation") {
    val rng = new Random(67)
    val vocab = (0 until 150).map(i => f"w$i%03d")
    val rows = randomCorpus(rng, 200, vocab)
    withTempDir("q162_parity") { dir =>
      writeDocs(dir, rows)
      val Array(r) = SparkEntry.queries("q162_zipf_slope")(spark, dir).collect()
      val counts = rows.flatMap(_._2.split(" ")).groupBy(identity)
        .map { case (w, g) => (w, g.size.toLong) }
      val top = counts.toSeq.sortBy { case (w, c) => (-c, w) }.take(100)
      val n = top.size
      val xs = (0 until n).map(i => math.log((i + 1).toDouble))
      val ys = top.map { case (_, c) => math.log(c.toDouble) }
      def fsum(v: Seq[Double]) = v.foldLeft(0.0)(_ + _)
      val (sx, sy) = (fsum(xs), fsum(ys))
      val sxy = fsum(xs.zip(ys).map { case (a, b) => a * b })
      val sxx = fsum(xs.map(x => x * x))
      val slope = (n.toDouble * sxy - sx * sy) / (n.toDouble * sxx - sx * sx)
      val intercept = (sy - slope * sx) / n.toDouble
      assert(r.getLong(0) == n.toLong)
      assert(r.getDouble(1) == round9(slope), s"${r.getDouble(1)} != $slope")
      assert(r.getDouble(2) == round9(intercept))
      assert(r.getDouble(1) < 0.0, "Zipf slope should be negative")
    }
  }
}
