package graft

import java.security.MessageDigest

import scala.util.Random

/** Full independent JVM replica of the q48 MinHash+LSH pipeline on a
  * RANDOM corpus with planted near-duplicates: shingling (distinct word
  * 3-grams, df<=100 cutoff), md5-sliced 8-hash signatures, 2x4 banding,
  * candidate generation, and exact-Jaccard verification are recomputed
  * from scratch in plain Scala and must match the Spark output pair for
  * pair, value for value. The DuckDB oracle proves the one shipped
  * fixture; this proves the algorithm on corpora it has never seen, and
  * measures banding recall against ground truth.
  */
class MinhashReplicaSpec extends SparkSuite {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def hex8(h: String, off: Int): Long =
    java.lang.Long.parseLong(h.substring(off, off + 8), 16)

  test("q48 == independent JVM replica on random corpora with planted near-dups") {
    import spark.implicits._
    val rng = new Random(97)
    val vocab = (0 until 200).map(i => s"w$i")
    def doc(n: Int): Seq[String] = Seq.fill(n)(vocab(rng.nextInt(vocab.size)))

    // 30 base docs; ids 0-9 get a twin at id+1000 with 2 words replaced
    val bases = (0L until 30L).map(id => id -> doc(40 + rng.nextInt(20)))
    val twins = bases.take(10).map { case (id, ws) =>
      val mutated = ws.updated(3, "zq1").updated(17, "zq2")
      (id + 1000L) -> mutated
    }
    val corpus = (bases ++ twins).map { case (id, ws) => id -> ws.mkString(" ") }

    val dir = java.nio.file.Files.createTempDirectory("minhash_rep").toString
    corpus.map { case (id, t) => (id, t, "xx", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = SparkEntry.queries("q48_dedup_minhash_lsh")(spark, dir)
      .select("da", "db", "jacc").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    spark.catalog.clearCache()

    // ---- JVM replica ----
    val rawShingles: Map[Long, Set[String]] = corpus.map { case (id, t) =>
      val ws = t.split(" ", -1)
      id -> ws.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }.toMap
    val df = rawShingles.values.flatten.groupBy(identity).view.mapValues(_.size)
    val sh = rawShingles.view.mapValues(_.filter(df(_) <= 100)).toMap
    val sig: Map[Long, IndexedSeq[Long]] = sh.collect {
      case (id, ss) if ss.nonEmpty =>
        id -> (0 to 7).map { i =>
          ss.map { g =>
            val h = if (i < 4) md5hex(g) else md5hex("x:" + g)
            hex8(h, 8 * (i % 4))
          }.min
        }
    }
    val bands = sig.toSeq.flatMap { case (id, m) =>
      Seq(md5hex(m.slice(0, 4).mkString(",")), md5hex(m.slice(4, 8).mkString(",")))
        .map(b => b -> id)
    }
    val cands = bands.groupBy(_._1).values.flatMap { g =>
      val ids = g.map(_._2).distinct.sorted
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet
    val want = cands.flatMap { case (a, b) =>
      val (sa, sb) = (sh(a), sh(b))
      val inter = sa.intersect(sb).size
      val j = inter.toDouble / (sa.size + sb.size - inter)
      if (j >= 0.5) Some((a, b) -> j) else None
    }.toMap

    assert(got == want,
      s"Spark vs JVM replica drifted: ${got.size} vs ${want.size} pairs\n" +
        s"only-spark=${got.keySet -- want.keySet} only-jvm=${want.keySet -- got.keySet}")

    // ground-truth recall of the planted twins (2-word edits keep
    // Jaccard well above the 0.5 verify bar; banding theory at s~0.9
    // gives per-pair candidate probability ~0.88)
    val planted = (0L until 10L).map(id => (id, id + 1000L))
    val recalled = planted.count(want.contains)
    assert(recalled >= 6, s"banding recalled only $recalled/10 planted twins")

    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(new java.io.File(dir))
  }
}
