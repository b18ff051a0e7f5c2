package graft

import org.apache.spark.sql.Row

/** q278 BPE merge training — three legs:
  *   1. full JVM replica: word-frequency collapse, 3 rounds of weighted
  *      pair counting, (cnt DESC, l, r) argmax, and greedy
  *      left-to-right merge recomputed driver-side from the raw
  *      fixture must equal the distributed result row-for-row.
  *   2. the greedy fold's overlap rule, exercised directly on the
  *      adversarial same-symbol case ("aaaa" under the a+a merge must
  *      become [aa, aa], "aaa" must become [aa, a]) — the case the
  *      no-flag fold argument in the query comment is about.
  *   3. BPE theorems on the output: chosen pair counts are
  *      non-increasing across rounds (a pair born from a merge can
  *      never beat the pair it came from), and each round's weighted
  *      symbol total drops by at least 1 and at most that round's
  *      pair count (greedy non-overlap can only skip overlapped
  *      occurrences).
  */
class BpeSpec extends SparkSuite {

  private def replica(): Vector[(Long, String, String, Long, Long)] = {
    val freqs = Tables.documents(spark, sfDir).select("text").collect()
      .iterator.flatMap(_.getString(0).split(" ", -1)).filter(_.nonEmpty)
      .foldLeft(Map.empty[String, Long]) { (m, w) =>
        m.updated(w, m.getOrElse(w, 0L) + 1L)
      }
    var vocab: Map[Vector[String], Long] = freqs.map { case (w, f) =>
      (w.map(_.toString).toVector :+ "</w>", f)
    }
    def mergeGreedy(sy: Vector[String], l: String, r: String)
        : Vector[String] =
      sy.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == l && x == r)
          acc.init :+ (l + r)
        else acc :+ x
      }
    (1 to 3).map { step =>
      val pc = vocab.iterator.flatMap { case (sy, f) =>
        sy.zip(sy.tail).map(p => (p, f))
      }.foldLeft(Map.empty[(String, String), Long]) { case (m, (p, f)) =>
        m.updated(p, m.getOrElse(p, 0L) + f)
      }
      val ((l, r), cnt) = pc.minBy { case ((a, b), c) => (-c, a, b) }
      vocab = vocab.map { case (sy, f) => (mergeGreedy(sy, l, r), f) }
      val symbolsAfter = vocab.iterator.map { case (sy, f) =>
        f * sy.size
      }.sum
      (step.toLong, l, r, cnt, symbolsAfter)
    }.toVector
  }

  private lazy val got: Vector[(Long, String, String, Long, Long)] =
    SparkEntry.queries("q278_bpe_merge_training")(spark, sfDir)
      .collect().map {
        case Row(st: Long, l: String, r: String, c: Long, sa: Long) =>
          (st, l, r, c, sa)
      }.toVector

  test("q278 replica: distributed BPE training equals the recompute") {
    assert(got == replica())
  }

  test("q278 greedy fold resolves same-symbol overlap left-to-right") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, Seq("a", "a", "a", "a")),
      (2L, Seq("a", "a", "a")),
      (3L, Seq("b", "a", "a", "b"))).toDF("id", "syms")
      .withColumn("m", aggregate(col("syms"),
        array().cast("array<string>"), (acc, x) =>
          when(size(acc) > 0 && element_at(acc, -1) === lit("a")
              && x === lit("a"),
            concat(slice(acc, lit(1), size(acc) - 1),
              array(lit("aa"))))
            .otherwise(concat(acc, array(x)))))
    val m = df.orderBy("id").collect()
      .map(_.getSeq[String](2).toList).toList
    assert(m == List(
      List("aa", "aa"), List("aa", "a"), List("b", "aa", "b")))
  }

  test("q279 encode replica: memoized vocab encode equals the recompute") {
    val merges = Seq(("e", "</w>"), ("e", "r"), ("i", "n"),
      ("t", "i"), ("d", "</w>"))
    def mergeGreedy(sy: Vector[String], l: String, r: String)
        : Vector[String] =
      sy.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
        else acc :+ x
      }
    def encode(w: String): Int =
      merges.foldLeft(w.map(_.toString).toVector :+ "</w>") {
        case (sy, (l, r)) => mergeGreedy(sy, l, r)
      }.size
    val rows = Tables.documents(spark, sfDir).select("source", "text")
      .collect()
    val agg = rows.iterator.flatMap { r =>
      r.getString(1).split(" ", -1).filter(_.nonEmpty)
        .map(w => (r.getString(0), w))
    }.toVector.groupBy(_._1).map { case (src, ws) =>
      val nBase = ws.iterator.map(_._2.length.toLong + 1L).sum
      val nSub = ws.iterator.map(w => encode(w._2).toLong).sum
      (src, ws.size.toLong, nBase, nSub,
        math.floor(nSub.toDouble / nBase.toDouble * 1e9) / 1e9)
    }.toVector.sortBy(_._1)
    val got = SparkEntry.queries("q279_bpe_encode")(spark, sfDir)
      .collect().map { case Row(s: String, w: Long, b: Long, n: Long,
        c: Double) => (s, w, b, n, c) }.toVector
    assert(got == agg)
  }

  test("q278 BPE theorems: counts non-increasing, symbols shrink by <= cnt") {
    val counts = got.map(_._4)
    assert(counts == counts.sorted(Ordering[Long].reverse),
      s"pair counts increased across rounds: $counts")
    // Round-0 total = weighted (len+1) over the fixture words.
    val base = Tables.documents(spark, sfDir).select("text").collect()
      .iterator.flatMap(_.getString(0).split(" ", -1)).filter(_.nonEmpty)
      .map(_.length.toLong + 1L).sum
    val totals = base +: got.map(_._5)
    got.indices.foreach { i =>
      val delta = totals(i) - totals(i + 1)
      assert(delta >= 1L && delta <= got(i)._4,
        s"round ${i + 1}: symbol delta $delta vs cnt ${got(i)._4}")
    }
  }
}
