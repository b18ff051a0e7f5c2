package graft

import org.apache.spark.sql.functions._

import scala.util.Random

/** q164–q168 properties and naive JVM replicas on randomized fixtures —
  * the DuckDB oracle proves the shipped fixture; these pin the invariants
  * the scaladocs claim: exact shard balance, bloom no-false-negatives,
  * BM25 scoring parity, PageRank mass conservation + parity, OLS exact
  * recovery of a noiseless line.
  */
class GraphRetrievalPropertySpec extends SparkSuite {

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

  // q164: shard sizes are EXACTLY balanced (⌈n/N⌉/⌊n/N⌋ — the claim that
  // distinguishes the ordinal deal from hash-mod's ±√n wobble), the idx
  // column is a permutation of 0..n−1, and the assignment is stable
  // across partitioning (the determinism contract).
  test("q164 shards are exactly balanced and partition-count-invariant") {
    import spark.implicits._
    // 403 = 8·50 + 3 → three shards must carry 51, five carry 50. Sparse
    // non-contiguous ids (multiples of 7919) so idx ≠ any id function.
    val rows = (0 until 403).map(i => i * 7919L)
    withTempDir("q164_bal") { dir =>
      rows.toDF("doc_id").withColumn("text", lit("x"))
        .withColumn("lang", lit("en")).withColumn("source", lit("web"))
        .withColumn("n_chars", lit(1L))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val n = rows.size
      def run() = SparkEntry.queries("q164_training_shards")(spark, dir)
        .select("doc_id", "idx", "shard").as[(Long, Long, Long)].collect().toSeq
      val got = run()
      assert(got.map(_._2).sorted == (0L until n.toLong), "idx not a permutation")
      val sizes = got.groupBy(_._3).view.mapValues(_.size).values.toSeq
      assert(sizes.max - sizes.min <= 1, s"unbalanced shards: $sizes")
      assert(sizes.sum == n && sizes.size == 8)
      // same deal under a different shuffle width
      val before = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        assert(run().sortBy(_._1) == got.sortBy(_._1),
          "assignment changed with partitioning")
      } finally spark.conf.set("spark.sql.shuffle.partitions", before)
    }
  }

  // q165's load-bearing bloom property: NO false negatives (every true
  // dim key passes the probe), and the prune actually prunes (most
  // non-matching fact rows drop before the join).
  test("bloom prefilter passes every true key and prunes most others") {
    import spark.implicits._
    graft.functions.BloomJoin.register(spark)
    val dimKeys = (0L until 2000L).map(_ * 7L)
    val dim = dimKeys.toDF("k")
    val bf = graft.functions.BloomJoin.buildFilter(dim, "k", 2000L, 0.01)
    val probe = (0L until 100000L).toDF("k")
      .filter(graft.functions.BloomJoin.mightContain(bf, col("k")))
      .as[Long].collect().toSet
    assert(dimKeys.forall(k => k < 100000L || true), "fixture sanity")
    dimKeys.filter(_ < 100000L).foreach(k =>
      assert(probe(k), s"false negative for $k"))
    val trueHits = dimKeys.count(_ < 100000L)
    val fp = probe.size - trueHits
    // fpp=0.01 sized for 2k items; ~86k negatives → expect ≲ 2% through.
    assert(fp < 4000, s"bloom passed $fp false positives of ~86k negatives")
  }

  // q166 vs a naive BM25 replica (same fold order, same rounding).
  test("q166 BM25 top-k == naive JVM replica on a random corpus") {
    val rng = new Random(73)
    val vocab = IndexedSeq("filter", "merge", "vector") ++
      (0 until 20).map(i => s"w$i")
    val rows = (0L until 150L).map { i =>
      val n = 5 + rng.nextInt(30)
      val words = Seq.fill(n)(vocab(rng.nextInt(vocab.size)))
      (i, words.mkString(" "), "en", "web")
    }
    withTempDir("q166_parity") { dir =>
      import spark.implicits._
      rows.toDF("doc_id", "text", "lang", "source")
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = SparkEntry.queries("q166_bm25_topk")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSeq
      val qTerms = Seq("filter", "merge", "vector")
      val (k1, b) = (1.2, 0.75)
      val toks = rows.map(r => (r._1, r._2.split(" ").toSeq))
      val nDocs = toks.size.toLong
      val totdl = toks.map(_._2.size.toLong).sum
      val avgdl = totdl.toDouble / nDocs.toDouble
      val df = qTerms.map(t =>
        t -> toks.count(_._2.contains(t)).toLong).toMap
      val scored = toks.flatMap { case (id, ws) =>
        val dl = ws.size.toLong
        val s = qTerms.sorted.flatMap { t =>
          val tf = ws.count(_ == t).toLong
          if (tf == 0) None
          else {
            val idf = math.log((nDocs.toDouble - df(t).toDouble + 0.5) /
              (df(t).toDouble + 0.5) + 1.0)
            Some(idf * ((tf.toDouble * (k1 + 1)) /
              (tf.toDouble + k1 * ((1 - b) + b * (dl.toDouble / avgdl)))))
          }
        }
        if (s.isEmpty) None
        else {
          val r9 = java.math.BigDecimal.valueOf(s.foldLeft(0.0)(_ + _))
            .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
          Some((id, dl, s.size.toLong, r9))
        }
      }
      val want = scored.sortBy(t => (-t._4, t._1)).take(10)
      assert(got == want, s"$got != $want")
    }
  }

  // q167's operator: total mass stays ≈|V| every iteration on a symmetric
  // graph (rank₀ ≡ 1, out-degree ≥ 1; "≈" because each contribution
  // truncates to integer 1e-9 units, leaking ≤ d·|E|·1e-9 per iteration —
  // the documented deterministic model), and ranks EXACTLY equal a naive
  // JVM replica of the quantized walk.
  test("PageRank conserves mass and matches a naive JVM replica") {
    import spark.implicits._
    val rng = new Random(11)
    val raw = (0 until 300).map(_ =>
      (rng.nextInt(40).toLong, rng.nextInt(40).toLong))
    val und = raw.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    val edges = und.toDF("src", "dst")
    val got = graft.operators.PageRank.run(edges, iterations = 10,
      damping = 0.85)
      .as[(Long, Double)].collect().toMap
    val nodes = und.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val deg = und.groupBy(_._1).map { case (s, g) => (s, g.size.toLong) }
    val inEdges = und.groupBy(_._2).map { case (d, g) => (d, g.map(_._1)) }
    var rank = nodes.map(_ -> 1.0).toMap
    (1 to 10).foreach { _ =>
      rank = nodes.map { v =>
        val units = inEdges.getOrElse(v, Nil)
          .map(s => math.floor(rank(s) / deg(s).toDouble * 1e9).toLong)
          .sum
        v -> ((1.0 - 0.85) + 0.85 * (units.toDouble / 1e9))
      }.toMap
    }
    assert(got.keySet == rank.keySet)
    nodes.foreach(v => assert(got(v) == rank(v), s"node $v: ${got(v)} != ${rank(v)}"))
    val mass = nodes.map(rank).sum
    assert(math.abs(mass - nodes.size.toDouble) < 1e-4,
      s"mass $mass drifted from |V|=${nodes.size}")
    // The big-|V| escape path (broadcastRanks = false: edges pinned by
    // src, node-sized ranks shuffled per iteration) must be a pure
    // EXECUTION-strategy swap: bit-identical ranks, same quantized walk.
    val gotShuffle = graft.operators.PageRank.run(edges, iterations = 10,
      damping = 0.85, broadcastRanks = Some(false))
      .as[(Long, Double)].collect().toMap
    assert(gotShuffle == got,
      "broadcastRanks=false diverged from the broadcast path")
    // Hint-directed escape (r17): an edgeCountHint above the cache
    // ceiling routes straight to the src-pinned disk checkpoint (the
    // un-pinned edge cache is never materialized) — still a pure
    // execution-strategy swap, bit-identical ranks.
    val gotHint = graft.operators.PageRank.run(edges, iterations = 10,
      damping = 0.85,
      edgeCountHint = Some(graft.operators.PageRank.EdgeCacheMaxRows + 1))
      .as[(Long, Double)].collect().toMap
    assert(gotHint == got,
      "hint-directed escape diverged from the broadcast path")
    // Auto-select threshold logic (r14): the operator flips to the
    // shuffle escape exactly when the source-node count outgrows the
    // broadcast ceiling — no caller flag needed at scale.
    val lim = graft.operators.PageRank.BroadcastRanksMaxNodes
    assert(graft.operators.PageRank.chooseBroadcast(1L))
    assert(graft.operators.PageRank.chooseBroadcast(lim))
    assert(!graft.operators.PageRank.chooseBroadcast(lim + 1))
    assert(!graft.operators.PageRank.chooseBroadcast(Long.MaxValue))
  }

  test("PageRank dangling redistribution: arbitrary digraphs with sinks " +
      "conserve mass and match a naive JVM replica") {
    import spark.implicits._
    // Random digraphs, NOT symmetrized: ~1/3 of nodes never appear as a
    // src (pure sinks), the case the redistributeDangling flag exists
    // for. Replica mirrors the operator's integer-unit arithmetic
    // exactly: floor-quantized contributions AND sink ranks, long sums,
    // integer div of the dangling units by |V|.
    (1 to 3).foreach { seed =>
      val rng = new Random(seed)
      val raw = (0 until 250).map { _ =>
        (rng.nextInt(25).toLong, (25 + rng.nextInt(12)).toLong)
      }.distinct // srcs 0..24; dsts 25..36 are sinks (never a src)
      val edges = raw.toDF("src", "dst")
      val got = graft.operators.PageRank.run(edges, iterations = 10,
        damping = 0.85, redistributeDangling = true)
        .as[(Long, Double)].collect().toMap
      val nodes = raw.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val n = nodes.size.toLong
      val srcs = raw.map(_._1).toSet
      val sinks = nodes.filterNot(srcs)
      val deg = raw.groupBy(_._1).map { case (s, g) => (s, g.size.toLong) }
      val inEdges = raw.groupBy(_._2).map { case (d, g) => (d, g.map(_._1)) }
      var rank = nodes.map(_ -> 1.0).toMap
      (1 to 10).foreach { _ =>
        val du = sinks.map(s => math.floor(rank(s) * 1e9).toLong).sum
        val share = du / n
        rank = nodes.map { v =>
          val units = inEdges.getOrElse(v, Nil)
            .map(s => math.floor(rank(s) / deg(s).toDouble * 1e9).toLong)
            .sum + share
          v -> ((1.0 - 0.85) + 0.85 * (units.toDouble / 1e9))
        }.toMap
      }
      assert(got.keySet == rank.keySet, s"seed $seed node sets differ")
      nodes.foreach(v =>
        assert(got(v) == rank(v), s"seed $seed node $v: ${got(v)} != ${rank(v)}"))
      // With redistribution the walk conserves total mass at |V| (up to
      // the documented ≤1e-9-scale deterministic truncation) even
      // though a third of the nodes are sinks.
      val mass = nodes.map(rank).sum
      assert(math.abs(mass - n.toDouble) < 1e-3,
        s"seed $seed: mass $mass drifted from |V|=$n")
    }
  }

  test("KCore peel to fixpoint == naive JVM replica; survivors all have deg >= k") {
    import spark.implicits._
    (1 to 3).foreach { seed =>
      val rng = new Random(seed * 31)
      val raw = (0 until 120).map { _ =>
        val a = rng.nextInt(30); val b = rng.nextInt(30)
        (math.min(a, b).toLong, math.max(a, b).toLong)
      }.filter(e => e._1 != e._2).distinct
      val (coreDf, converged) = graft.operators.KCore.run(
        raw.toDF("x", "y"), k = 3, rounds = 50)
      assert(converged, s"seed $seed: 50 rounds did not converge on 30 nodes")
      val got = coreDf.as[(Long, Long)].collect().toMap
      // naive fixpoint peel
      var edges = raw
      var stable = false
      while (!stable) {
        val deg = edges.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).map { case (n, g) => (n, g.size.toLong) }
        val keep = deg.filter(_._2 >= 3).keySet
        val next = edges.filter(e => keep(e._1) && keep(e._2))
        stable = next.size == edges.size
        edges = next
      }
      val want = edges.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (n, g) => (n, g.size.toLong) }
      assert(got == want, s"seed $seed: core mismatch $got vs $want")
      got.values.foreach(dg => assert(dg >= 3))
    }
  }

  // q170 vs a naive JVM miner: same sequential-fold cosine, same
  // (ord, cid) tie-break, same fpTrunc — exact equality per anchor/side.
  test("q170 hard pos/neg mining == naive JVM replica on random embeddings") {
    import spark.implicits._
    val rng = new Random(53)
    val rows = (0L until 80L).map { i =>
      (i, Array.fill(8)(rng.nextFloat() * 2 - 1), (i % 3).toInt)
    }
    withTempDir("q170_parity") { dir =>
      rows.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val got = SparkEntry.queries("q170_hard_pair_mining")(spark, dir)
        .as[(Long, String, Long, Double)].collect().toSeq
      def cos(a: Array[Float], b: Array[Float]): Double = {
        def fold(v: Seq[Double]) = v.foldLeft(0.0)(_ + _)
        val dot = fold(a.zip(b).map { case (x, y) => x.toDouble * y.toDouble })
        val na = fold(a.map(x => x.toDouble * x.toDouble))
        val nb = fold(b.map(x => x.toDouble * x.toDouble))
        dot / (math.sqrt(na) * math.sqrt(nb))
      }
      val want = rows.filter(_._1 < 20).flatMap { case (aid, ae, al) =>
        val cands = rows.filter(_._1 != aid).map { case (cid, ce, cl) =>
          (if (cl == al) "pos" else "neg", cid, cos(ae, ce))
        }
        Seq("neg", "pos").flatMap { side =>
          val inSide = cands.filter(_._1 == side)
          if (inSide.isEmpty) None
          else {
            val (_, cid, sc) = inSide.minBy { case (_, c, s) =>
              (if (side == "neg") -s else s, c) }
            Some((aid, side, cid, math.floor(sc * 1e9) / 1e9))
          }
        }
      }
      assert(got == want, s"$got != $want")
    }
  }

  // q175 vs a naive JVM replica on a skewed random fixture: the top-10
  // must be the true global heavy hitters with exact share arithmetic,
  // and the planted hot key must surface at rank 1.
  test("q175 skew audit == naive JVM replica; planted hot key at rank 1") {
    import spark.implicits._
    val rng = new Random(23)
    // Zipf-ish key draw + a planted hot key 999 with ~20% of all rows.
    val keys = (0 until 5000).map { _ =>
      if (rng.nextInt(5) == 0) 999L
      else math.min(199, (math.pow(rng.nextDouble(), 2) * 200).toInt).toLong
    }
    withTempDir("q175_skew") { dir =>
      keys.zipWithIndex.map { case (k, i) => (i.toLong, k) }
        .toDF("l_linenumber", "l_suppkey")
        .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
      val got = SparkEntry.queries("q175_skew_audit")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
      val counts = keys.groupBy(identity).map { case (k, g) =>
        (k, g.size.toLong) }
      val total = keys.size.toLong
      val nKeys = counts.size.toLong
      def f9(x: Double) = math.floor(x * 1e9) / 1e9
      var cum = 0L
      val want = counts.toSeq.sortBy { case (k, c) => (-c, k) }.take(10)
        .zipWithIndex.map { case ((k, c), i) =>
          cum += c
          (i + 1L, k, c, f9(c.toDouble / total.toDouble),
            f9(cum.toDouble / total.toDouble),
            f9(c.toDouble * nKeys.toDouble / total.toDouble))
        }
      assert(got == want, s"$got != $want")
      assert(got.head._2 == 999L && got.head._6 > 10.0,
        s"planted hot key not diagnosed: ${got.head}")
    }
  }

  // q176 invariants + replica on an imbalanced random fixture: never
  // oversample (keep ≤ cnt), the binding source keeps every doc, and
  // achieved shares sit within 1/K of targets.
  test("q176 mixture solver == replica; no oversampling; binding source exhausted") {
    import spark.implicits._
    val rng = new Random(47)
    val rows = (0L until 600L).map { i =>
      // src3 deliberately scarce relative to its target weight
      val src = if (i % 40 == 0) "src3"
        else s"src${Seq(0, 1, 2, 4, 5)(rng.nextInt(5))}"
      (i, s"doc $i", "en", src)
    }
    withTempDir("q176_mix") { dir =>
      rows.toDF("doc_id", "text", "lang", "source")
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = SparkEntry.queries("q176_mixture_solver")(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getLong(3), r.getDouble(4), r.getDouble(5))).toSeq
      val counts = rows.groupBy(_._4).map { case (s0, g) => (s0, g.size.toLong) }
      val tden = counts.keys.map(s0 => s0.drop(3).toLong + 1).sum
      def f9(x: Double) = math.floor(x * 1e9) / 1e9
      val t = counts.map { case (s0, c) =>
        val tg = (s0.drop(3).toLong + 1).toDouble / tden.toDouble
        (s0, c, tg, c.toDouble / tg)
      }
      val k = t.map(_._4).min
      val keeps = t.map { case (s0, c, tg, _) =>
        (s0, c, tg, math.floor(k * tg).toLong) }
      val ksum = keeps.map(_._4).sum
      val want = keeps.toSeq.sortBy(_._1).map { case (s0, c, tg, kp) =>
        (s0, c, f9(tg), kp, f9(kp.toDouble / c.toDouble),
          f9(kp.toDouble / ksum.toDouble))
      }
      assert(got == want, s"$got != $want")
      got.foreach(r => assert(r._4 <= r._2, s"oversampled: $r"))
      val binding = t.minBy(_._4)
      val bindRow = got.find(_._1 == binding._1).get
      assert(bindRow._4 >= bindRow._2 - 1,
        s"binding source not exhausted: $bindRow")
      got.foreach(r => assert(math.abs(r._6 - r._3) < 2.0 / k,
        s"achieved share off target: $r"))
    }
  }

  // q168 on a noiseless per-group line: OLS must recover slope/intercept
  // EXACTLY (a noiseless fit has zero residual — R² = 1 and the moment
  // arithmetic is exact in doubles at this magnitude).
  test("q168 recovers a noiseless linear trend exactly, R² = 1") {
    import spark.implicits._
    withTempDir("q168_line") { dir =>
      // type A: y = 2·day_offset + 10; type B: y = −1·day_offset + 100.
      // value splits each day's total across 4 events of y/4 (exact
      // quarters so the decimal sum reconstructs y exactly).
      val day0 = 20000L
      val rows = (0 until 30).flatMap { i =>
        Seq(("A", 2.0 * i + 10.0), ("B", -1.0 * i + 100.0)).flatMap {
          case (t, y) => (0 until 4).map { j =>
            val us = (day0 + i) * 86400000000L + j * 1000000L
            ((day0 + i) * 10 + j, us * 1000L, 1L, t, y / 4.0)
          }
        }
      }
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .withColumn("props", lit("{}"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = SparkEntry.queries("q168_group_ols_trend")(spark, dir)
        .select("event_type", "n_days", "slope", "intercept", "r2")
        .as[(String, Long, Double, Double, Double)].collect().sortBy(_._1)
      // intercept is at day=0 epoch, i.e. y(day0+i) = s·(day0+i) + c with
      // c = b − s·day0 for the per-offset line y = s·i + b.
      val want = Seq(
        ("A", 30L, 2.0, 10.0 - 2.0 * day0, 1.0),
        ("B", 30L, -1.0, 100.0 + 1.0 * day0, 1.0))
      got.zip(want).foreach { case (g, w) =>
        assert(g._1 == w._1 && g._2 == w._2)
        assert(math.abs(g._3 - w._3) < 1e-9, s"slope ${g._3} != ${w._3}")
        assert(math.abs(g._4 - w._4) < 1e-6, s"intercept ${g._4} != ${w._4}")
        assert(math.abs(g._5 - w._5) < 1e-9, s"r2 ${g._5} != 1")
      }
    }
  }
}
