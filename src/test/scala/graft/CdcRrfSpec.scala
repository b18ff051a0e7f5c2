package graft

import org.apache.spark.sql.functions._

import scala.util.Random

/** q275 content-defined chunking + q276 reciprocal-rank fusion — JVM
  * replicas on randomized fixtures plus the one property each query
  * exists to deliver: CDC's boundary-shift resilience (a one-word
  * insertion leaves every later chunk byte-identical, where aligned
  * blocks lose ALL sharing), and RRF's exact integer fusion of the two
  * top-100 rank lists. The DuckDB oracle proves the shipped fixture;
  * these pin the algorithmic claims on inputs the fixture can't produce.
  */
class CdcRrfSpec extends SparkSuite {

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

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }

  /** JVM replica of q275's chunker: (chunks, tokenCounts) per doc. */
  private def cdcChunks(words: IndexedSeq[String]): IndexedSeq[String] = {
    val n = words.size
    val hs = words.map(w => java.lang.Long.parseLong(md5hex(w).substring(0, 8), 16))
    // 1-based cut positions s (2 <= s <= n-3): weighted window hash over
    // words s..s+3 lands on residue 0 mod 16 — mirrors the query exactly.
    val cuts =
      if (n >= 5) (2 to (n - 3)).filter { s =>
        ((hs(s - 1) + hs(s) * 2 + hs(s + 1) * 3 + hs(s + 2) * 4)
          % 1000000007L) % 16L == 0L
      } else Seq.empty
    val starts = 1 +: cuts
    starts.indices.map { j =>
      val a = starts(j)
      val b = if (j + 1 < starts.size) starts(j + 1) else n + 1
      words.slice(a - 1, b - 1).mkString(" ")
    }.toIndexedSeq
  }

  test("q275 CDC census == naive JVM replica; chunks partition each doc") {
    val rng = new Random(41)
    val vocab = (0 until 23).map(i => s"w$i")
    val rows = (0L until 120L).map { i =>
      val n = 1 + rng.nextInt(60) // includes docs below the 5-word cut floor
      (i, Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" "), "en", "web")
    }
    withTempDir("q275_parity") { dir =>
      import spark.implicits._
      rows.toDF("doc_id", "text", "lang", "source")
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = SparkEntry.queries("q275_cdc_chunk_dedup")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq

      // Replica census: first occurrence by composite key over chunk hash.
      val perDoc = rows.map { case (id, text, _, _) =>
        id -> cdcChunks(text.split(" ").toIndexedSeq)
      }
      // Partition property: chunks reassemble the document verbatim.
      perDoc.foreach { case (id, chunks) =>
        assert(chunks.mkString(" ") == rows(id.toInt)._2,
          s"doc $id: chunks do not partition the text")
      }
      val keyed = perDoc.flatMap { case (id, chunks) =>
        chunks.zipWithIndex.map { case (c, ci) =>
          val chash = java.lang.Long.parseLong(md5hex(c).substring(0, 12), 16)
          (id, ci.toLong, c.split(" ").length.toLong, chash,
            id * 1048576L + ci)
        }
      }
      val firstK = keyed.groupBy(_._4).map { case (h, g) =>
        h -> g.map(_._5).min
      }
      val want = keyed.groupBy(_._1).toSeq.sortBy(_._1).map { case (id, g) =>
        val dup = g.filter(t => t._5 != firstK(t._4))
        val tot = g.map(_._3).sum
        val dupTok = dup.map(_._3).sum
        (id, g.size.toLong, tot, dup.size.toLong, dupTok,
          math.floor(dupTok.toDouble / tot.toDouble * 1e9) / 1e9)
      }
      assert(got == want, s"${got.take(3)}... != ${want.take(3)}...")
    }
  }

  test("q275 boundary-shift: one-word insertion keeps later chunks shared " +
    "(aligned 8-word blocks lose everything)") {
    val rng = new Random(59)
    val vocab = (0 until 23).map(i => s"w$i")
    val words = IndexedSeq.fill(400)(vocab(rng.nextInt(vocab.size)))
    val docA = words.mkString(" ")
    val docB = ("zzz" +: words).mkString(" ")
    withTempDir("q275_shift") { dir =>
      import spark.implicits._
      Seq((0L, docA, "en", "web"), (1L, docB, "en", "web"))
        .toDF("doc_id", "text", "lang", "source")
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val rowsOut = SparkEntry.queries("q275_cdc_chunk_dedup")(spark, dir)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
      val (nChunksB, nDupB, dupTokB, dupFracB) = rowsOut(1L)
      // Content-defined cuts re-synchronize after the insertion: at most
      // the head chunk (plus one possible extra cut the shifted window
      // range newly admits) differs — every later chunk is byte-equal to
      // a doc-0 chunk and the duplicated token mass dominates.
      assert(nDupB >= nChunksB - 2,
        s"CDC lost re-sync: $nDupB dup of $nChunksB chunks")
      assert(dupFracB > 0.85, s"dup_frac $dupFracB (dupTok $dupTokB)")
      // The contrast CDC exists for: ALIGNED 8-word blocks of the shifted
      // doc share nothing with the original (every block is offset by 1).
      val blocksA = words.grouped(8).map(_.mkString(" ")).toSet
      val sharedAligned = ("zzz" +: words).grouped(8)
        .count(b => blocksA.contains(b.mkString(" ")))
      assert(sharedAligned == 0,
        s"aligned blocks unexpectedly survived the shift: $sharedAligned")
    }
  }

  test("q276 RRF fusion == naive JVM replica on random corpus + embeddings") {
    val rng = new Random(91)
    val vocab = IndexedSeq("filter", "merge", "vector") ++
      (0 until 20).map(i => s"w$i")
    val docRows = (0L until 150L).map { i =>
      val n = 5 + rng.nextInt(30)
      (i, Seq.fill(n)(vocab(rng.nextInt(vocab.size))).mkString(" "), "en", "web")
    }
    val embRows = (0L until 150L).map { i =>
      (i, Seq.fill(8)(rng.nextFloat() * 2f - 1f), i.toInt % 4)
    }
    withTempDir("q276_parity") { dir =>
      import spark.implicits._
      docRows.toDF("doc_id", "text", "lang", "source")
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      embRows.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val got = SparkEntry.queries("q276_rrf_hybrid_retrieval")(spark, dir)
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          r.getLong(3))).toSeq

      // Lexical leg replica (q166's scoring — same fold, same rounding).
      val qTerms = Seq("filter", "merge", "vector")
      val (k1, b) = (1.2, 0.75)
      val toks = docRows.map(r => (r._1, r._2.split(" ").toSeq))
      val nDocs = toks.size.toLong
      val avgdl = toks.map(_._2.size.toLong).sum.toDouble / nDocs.toDouble
      val dfm = qTerms.map(t => t -> toks.count(_._2.contains(t)).toLong).toMap
      val bm = toks.flatMap { case (id, ws) =>
        val dl = ws.size.toLong
        val parts = qTerms.sorted.flatMap { t =>
          val tf = ws.count(_ == t).toLong
          if (tf == 0) None
          else Some(math.log((nDocs.toDouble - dfm(t).toDouble + 0.5) /
            (dfm(t).toDouble + 0.5) + 1.0) * ((tf.toDouble * (k1 + 1)) /
            (tf.toDouble + k1 * ((1 - b) + b * (dl.toDouble / avgdl)))))
        }
        if (parts.isEmpty) None
        else Some((id, java.math.BigDecimal.valueOf(parts.foldLeft(0.0)(_ + _))
          .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()))
      }
      val rLex = bm.sortBy(t => (-t._2, t._1)).take(100)
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap

      // Semantic leg replica (CosineSimilarity's exact fold + fpTrunc 9).
      val embMap = embRows.map(r => r._1 -> r._2).toMap
      val qe = embMap(7L)
      val cs = embRows.filter(_._1 != 7L).map { case (id, e, _) =>
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < e.size) {
          val x = e(i).toDouble; val y = qe(i).toDouble
          dot += x * y; na += x * x; nb += y * y; i += 1
        }
        val c = dot / (math.sqrt(na) * math.sqrt(nb))
        (id, math.floor(c * 1e9) / 1e9)
      }
      val rSem = cs.sortBy(t => (-t._2, t._1)).take(100)
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap

      val want = (rLex.keySet ++ rSem.keySet).toSeq.map { id =>
        val contrib = (r: Option[Long]) =>
          r.map(x => math.floor(1.0e9 / (60.0 + x.toDouble)).toLong).getOrElse(0L)
        (id, rLex.get(id), rSem.get(id),
          contrib(rLex.get(id)) + contrib(rSem.get(id)))
      }.sortBy(t => (-t._4, t._1)).take(15)
      assert(got == want, s"${got.take(5)}... != ${want.take(5)}...")
    }
  }
}
