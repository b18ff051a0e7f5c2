package graft

import org.apache.spark.sql.functions._

/** Round-5 curation additions (q111-q115): each query's oracle proves the
  * fixture result, so these tests pin the properties the oracle can't see
  * — a naive JVM recomputation of q111's HOF metrics, q112's near-dup
  * recall and broadcast shape, q113's quartile semantics, q115's
  * ingest/reject partition — and the plan shapes the scale story rests on.
  */
class CurationGateSpec extends SparkSuite {

  test("q111 metrics == naive JVM recomputation on every fixture doc") {
    import spark.implicits._
    val got = SparkEntry.queries("q111_gopher_repetition")(spark, sfDir)
      .select("doc_id", "n_lines", "dup_line_frac", "dup_char_frac",
        "top_bigram", "top_bigram_frac")
      .as[(Long, Long, Double, Double, String, Double)]
      .collect().map(r => r._1 -> r).toMap
    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    assert(raw.length == got.size)
    raw.foreach { case (id, text) =>
      val ws = text.split(" ", -1).toSeq
      val lines0 = ws.grouped(8).map(_.mkString(" ")).toSeq
      val lines = if (id % 7 == 0) lines0 ++ lines0.take(2) else lines0
      val lineCnt = lines.groupBy(identity).view.mapValues(_.size).toMap
      val dupChars = lineCnt.collect {
        case (l, c) if c >= 2 => c.toLong * l.length
      }.sum
      val bg = ws.sliding(2).map(_.mkString(" ")).toSeq
      val bgCnt = bg.groupBy(identity).view.mapValues(_.size).toMap
      val maxCnt = bgCnt.values.max
      val topBg = bgCnt.collect { case (g, c) if c == maxCnt => g }.min
      val (nl, dlf, dcf, tb, tbf) = (lines.size.toLong,
        (lines.size - lines.distinct.size).toDouble / lines.size,
        dupChars.toDouble / lines.map(_.length.toLong).sum,
        topBg,
        (maxCnt.toLong * topBg.length).toDouble / text.length)
      val g = got(id)
      assert(g._2 == nl && g._3 == dlf && g._4 == dcf && g._5 == tb && g._6 == tbf,
        s"doc $id: got $g want ($nl,$dlf,$dcf,$tb,$tbf)")
    }
  }

  test("q112 flags most mutated eval twins and only non-eval docs") {
    import spark.implicits._
    val flagged = SparkEntry.queries("q112_decontam_fuzzy")(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    val injected = flagged.count(id => id >= 10000L && id < 10020L)
    // A one-word edit on a >=10-word doc keeps the shingle set ~90%+
    // intact; with 2 bands of 4 minhashes the per-doc miss odds are a few
    // percent — 20 twins landing under 15 recalls means the banding broke.
    assert(injected >= 15, s"only $injected/20 mutated eval twins recalled")
    assert(flagged.forall(_ >= 20L), "an eval doc (id<20) leaked into the output")
  }

  test("q112 probes eval bands via broadcast; q113 gates via broadcast") {
    Seq("q112_decontam_fuzzy", "q113_quality_quantile_gate").foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.collect() // let AQE settle on the final plan
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"$n: corpus side must never shuffle for the probe, got:\n$plan")
      spark.catalog.clearCache() // release q112's harness-owned sig cache
    }
  }

  test("q113 keeps 75% +- ties per language and thresholds on a real score") {
    import spark.implicits._
    val rows = SparkEntry.queries("q113_quality_quantile_gate")(spark, sfDir)
      .select("lang", "threshold", "n_total", "n_kept")
      .as[(String, Double, Long, Long)].collect()
    assert(rows.length == 5)
    val w = split(col("text"), " ")
    val scores = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("lang"),
        (size(array_distinct(w)).cast("double") / size(w)).as("score"))
      .as[(String, Double)].collect().groupBy(_._1)
    rows.foreach { case (lang, thr, nTotal, nKept) =>
      val s = scores(lang).map(_._2)
      assert(s.length == nTotal)
      assert(s.contains(thr), s"$lang: threshold $thr is not a data value")
      assert(nKept == s.count(_ >= thr), s"$lang: gate count drifted")
      // rank-based cut: at least 75% survive; ties can only add docs
      assert(nKept.toDouble / nTotal >= 0.75 && nKept < nTotal)
    }
  }

  test("q116 prunes map-side via WindowGroupLimit; caps hold per source") {
    import spark.implicits._
    val df = SparkEntry.queries("q116_source_cap")(spark, sfDir)
    val rows = df.select("source", "rk").as[(String, Long)].collect()
    assert(rows.groupBy(_._1).values.forall(_.length <= 15))
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "rank<=k filter must compile to map-side WindowGroupLimit pruning")
  }

  test("q117 plans as a hash join on label, not a nested loop") {
    val df = SparkEntry.queries("q117_filtered_knn")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"label constraint must hash-prune candidates before any cosine:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "filtered kNN degenerated to the all-pairs nested loop")
  }

  test("q126 sketch union over shards == global sketch, near exact count") {
    import spark.implicits._
    val r = SparkEntry.queries("q126_hll_mergeable")(spark, sfDir)
      .select("merged_estimate", "global_estimate", "exact_distinct", "merge_equals_global")
      .as[(Long, Long, Long, Boolean)].head()
    assert(r._4, s"union of per-shard sketches must equal the global sketch: $r")
    // lgK=12 keeps HLL relative error ~1.6%; this fixture is far smaller
    val err = math.abs(r._1 - r._3).toDouble / r._3
    assert(err < 0.05, s"sketch estimate drifted ${err * 100}% from exact: $r")
  }

  test("q125 range join plans as an equi-join, never a nested loop") {
    val df = SparkEntry.queries("q125_range_join_binned")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval join degenerated to O(n*m):\n$plan")
    assert(plan.contains("Join"), "bin rewrite must still be a join")
  }

  test("q124 correlated subquery decorrelates to one aggregate + join") {
    val df = SparkEntry.queries("q124_correlated_subquery")(spark, sfDir)
    val physical = df.queryExecution.executedPlan.toString
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("scalar-subquery"),
      s"subquery survived optimization (per-row re-execution at scale):\n$optimized")
    assert(physical.contains("Join"), "decorrelation must produce a join")
  }

  test("q115 ingests exactly the novel shard content") {
    import spark.implicits._
    val rows = SparkEntry.queries("q115_incremental_dedup")(spark, sfDir)
      .select("doc_id", "n_in_shard").as[(Long, Long)].collect()
    // Injected copies (id+20000) of indexed docs die at the anti-join;
    // copies of shard docs collapse onto the min id — so every surviving
    // id is an original shard doc, and each %10==0 shard doc carries its
    // injected twin in n_in_shard.
    assert(rows.nonEmpty)
    assert(rows.forall { case (id, _) => id >= 400L && id < 500L })
    rows.foreach { case (id, n) =>
      if (id % 10 == 0) assert(n == 2L, s"doc $id: injected twin not counted")
      else assert(n == 1L, s"doc $id: unexpected duplicate")
    }
  }

  test("q136 chunks tile with overlap and reconstruct every fixture doc") {
    import spark.implicits._
    val stride = 48
    val chunks = SparkEntry.queries("q136_doc_chunk")(spark, sfDir)
      .select("doc_id", "chunk_id", "n_tokens", "chunk")
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    assert(raw.length == chunks.size)
    raw.foreach { case (id, text) =>
      val toks = text.split(" ", -1).toSeq
      val cs = chunks(id)
      assert(cs.length == (toks.length - 1) / stride + 1,
        s"doc $id: wrong chunk count")
      cs.zipWithIndex.foreach { case ((_, cid, n, c), i) =>
        assert(cid == i)
        assert(n == c.split(" ", -1).length, s"doc $id chunk $i: n_tokens drift")
        assert(n == math.min(64, toks.length - stride * i))
      }
      // chunk i overlaps chunk i+1 by win-stride tokens: taking the first
      // `stride` tokens of every chunk but the last, then the whole last
      // chunk, must rebuild the document exactly
      val rebuilt =
        (cs.init.flatMap(_._4.split(" ", -1).take(stride)) ++
          cs.last._4.split(" ", -1)).toSeq
      assert(rebuilt == toks, s"doc $id: reconstruction drift")
    }
  }

  test("q140 keeps exactly one survivor per distinct paragraph") {
    import spark.implicits._
    val got = SparkEntry.queries("q140_paragraph_dedup")(spark, sfDir)
      .select("doc_id", "n_paras", "n_removed")
      .as[(Long, Long, Long)].collect()
    // naive corpus recomputation: chunk every doc into aligned 8-word
    // paragraphs; dedup-keep-first leaves one survivor per DISTINCT
    // paragraph, so Σ(n_paras - n_removed) must equal the distinct count
    // and Σn_paras the total count
    val paras = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
      .flatMap { case (_, text) =>
        text.split(" ", -1).grouped(8).map(_.mkString(" "))
      }
    assert(got.map(_._2).sum == paras.length.toLong)
    assert(got.map(r => r._2 - r._3).sum == paras.distinct.length.toLong)
    assert(got.exists(_._3 > 0), "fixture has no repeated paragraph — weak test")
  }

  // q154 edge semantics on a crafted corpus with KNOWN echo placement:
  // multi-shingle span coalescing, two separated spans in one doc, the
  // touching-interval merge (gap exactly K), keep-first WITHIN a doc, and
  // the sub-K doc emitting nothing. Hand-computed expected rows — the
  // fixture oracle proves engine agreement, this proves the semantics.
  test("q154 spans on injected cross-doc echoes match hand-computed intervals") {
    import spark.implicits._
    val R = (0 to 9).map(i => s"r$i")           // 10-token echo source
    val E = (0 to 7).map(i => s"e$i")           // 8-token echo source
    val S = (0 to 7).map(i => s"s$i")
    def f(p: String, n: Int) = (0 until n).map(i => s"$p$i")
    val corpus = Seq(
      0L -> (R ++ f("f0", 5) ++ E),                          // all firsts
      1L -> (f("f1", 3) ++ R ++ f("g1", 9) ++ E ++ f("h1", 2)), // 2 spans
      2L -> (E ++ E ++ f("k2", 4)),                          // touching merge
      3L -> (S ++ f("m3", 2) ++ S),                          // within-doc echo
      4L -> f("t4", 3))                                      // shorter than K
    val dir = java.nio.file.Files.createTempDirectory("q154_inject").toString
    corpus.map { case (id, ws) =>
      val t = ws.mkString(" "); (id, t, "xx", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q154_substring_dedup")(spark, dir)
      .select("doc_id", "span_id", "start_tok", "end_tok", "n_toks")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    spark.catalog.clearCache()
    // doc 1: R echo covers shingle starts 3..5 → [3,13); E echo [22,30).
    // doc 2: flagged starts {0, 8}, gap == K → ONE merged span [0,16).
    // doc 3: only the SECOND in-doc occurrence flagged → [10,18).
    val want = Seq((1L, 0L, 3L, 13L, 10L), (1L, 1L, 22L, 30L, 8L),
      (2L, 0L, 0L, 16L, 16L), (3L, 0L, 10L, 18L, 8L))
    assert(got == want, s"got $got want $want")
  }

  // q155 on the same crafted corpus as the q154 span test: the cleaned
  // output must cut EXACTLY the tokens covered by q154's spans — firsts
  // untouched, both spans of doc 1 cut, the touching merge of doc 2 cut
  // whole, only the SECOND in-doc echo of doc 3 cut, sub-K doc 4 intact.
  test("q155 removal on injected echoes matches hand-computed cleaned docs") {
    import spark.implicits._
    val R = (0 to 9).map(i => s"r$i")
    val E = (0 to 7).map(i => s"e$i")
    val S = (0 to 7).map(i => s"s$i")
    def f(p: String, n: Int) = (0 until n).map(i => s"$p$i")
    val corpus = Seq(
      0L -> (R ++ f("f0", 5) ++ E),
      1L -> (f("f1", 3) ++ R ++ f("g1", 9) ++ E ++ f("h1", 2)),
      2L -> (E ++ E ++ f("k2", 4)),
      3L -> (S ++ f("m3", 2) ++ S),
      4L -> f("t4", 3))
    val dir = java.nio.file.Files.createTempDirectory("q155_inject").toString
    corpus.map { case (id, ws) =>
      val t = ws.mkString(" "); (id, t, "xx", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q155_substring_remove")(spark, dir)
      .select("doc_id", "n_toks", "n_removed", "cleaned")
      .as[(Long, Long, Long, String)].collect().toSeq
    spark.catalog.clearCache()
    val want = Seq(
      (0L, 23L, 0L, (R ++ f("f0", 5) ++ E).mkString(" ")),
      (1L, 32L, 18L, (f("f1", 3) ++ f("g1", 9) ++ f("h1", 2)).mkString(" ")),
      (2L, 20L, 16L, f("k2", 4).mkString(" ")),
      (3L, 18L, 8L, (S ++ f("m3", 2)).mkString(" ")),
      (4L, 3L, 0L, f("t4", 3).mkString(" ")))
    assert(got == want, s"got $got\nwant $want")
  }

  test("q156 drops mutated injections, keeps index out, covers the shard") {
    import spark.implicits._
    val rows = SparkEntry.queries("q156_incremental_fuzzy")(spark, sfDir)
      .select("doc_id", "ingest").as[(Long, Boolean)].collect()
    spark.catalog.clearCache() // release the harness-owned sh/sig caches
    val ids = rows.map(_._1).toSet
    assert(ids.forall(_ >= 400L), "an index doc (id<400) leaked into the output")
    val nShard = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") >= 400).count()
    assert(rows.length == nShard + 20,
      s"shard coverage: got ${rows.length}, want $nShard originals + 20 injected")
    // One-word edits keep ~85% Jaccard; with 2 bands of 4 the per-doc miss
    // odds are a few percent (q112's bound) — and verification must not
    // turn band recalls into false keeps at 0.5.
    val dropped = rows.count { case (id, ing) => id >= 30000L && !ing }
    assert(dropped >= 15, s"only $dropped/20 mutated injections were dropped")
  }

  // Full naive JVM recomputation of q157's greedy admit: score every doc
  // with q51's quality formula, rank per source on the composite BIGINT
  // key, admit while the running token sum stays within 600 — the
  // distributed two-window form must pick exactly this set.
  test("q157 == naive greedy token-budget admit; prunes via WindowGroupLimit") {
    import spark.implicits._
    val df = SparkEntry.queries("q157_token_budget")(spark, sfDir)
    val got = df.select("source", "doc_id", "cum_tokens")
      .as[(String, Long, Long)].collect().toSeq.sorted
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "rank<=B filter must compile to map-side WindowGroupLimit pruning")
    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source", "text").as[(Long, String, String)].collect()
    val want = raw.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      val scored = ds.map { case (id, _, text) =>
        val ws = text.split(" ", -1).toSeq
        val stop = ws.count(w => w == "the" || w == "a")
        val q = ws.distinct.size.toDouble / ws.size *
          (1.0 - stop.toDouble / ws.size)
        (id, ws.size.toLong, math.floor(q * 1e9).toLong * 8589934592L - id)
      }.sortBy(-_._3)
      scored.scanLeft((0L, 0L)) { case ((_, cum), (id, n, _)) => (id, cum + n) }
        .drop(1).takeWhile(_._2 <= 600L)
        .map { case (id, cum) => (src, id, cum) }
    }.sorted
    assert(got.nonEmpty && got == want,
      s"admit sets differ: got ${got.size} want ${want.size}")
  }

  // Full naive JVM recomputation of q154 on the real fixture: same
  // shingle/first-key/merge algorithm written sequentially — proves the
  // distributed decomposition (hash-agg MIN + join-back + per-doc window)
  // equals the straight-line definition on data it didn't choose.
  test("q154 == naive JVM recomputation on the fixture corpus") {
    import spark.implicits._
    val K = 8
    val got = SparkEntry.queries("q154_substring_dedup")(spark, sfDir)
      .select("doc_id", "start_tok", "end_tok")
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val sh = raw.flatMap { case (id, t) =>
      val ws = t.split(" ", -1)
      (0 to ws.length - K).map(p => (id, p.toLong, ws.slice(p, p + K).mkString(" ")))
    }
    val first = sh.groupBy(_._3).view
      .mapValues(_.map(x => x._1 * 1048576L + x._2).min).toMap
    val want = sh.filter { case (id, p, g) => id * 1048576L + p != first(g) }
      .groupBy(_._1).toSeq.flatMap { case (id, occ) =>
        val ps = occ.map(_._2).sorted
        val spans = ps.tail.foldLeft(List((ps.head, ps.head))) {
          case ((a, b) :: rest, p) =>
            if (p - b <= K) (a, p) :: rest else (p, p) :: (a, b) :: rest
          case (Nil, p) => List((p, p))
        }
        spans.map { case (a, b) => (id, a, b + K) }
      }.sorted
    assert(got.nonEmpty, "fixture produced no echo spans — weak test")
    assert(got == want, s"span sets differ: got ${got.size} want ${want.size}")
  }
}
