package graft

import org.apache.spark.sql.functions._

/** Multibyte robustness: a 100 TB multilingual corpus is mostly NOT
  * ASCII, while the shipped fixture text is. These tests run the text
  * operators on CJK / emoji / combining-accent documents via a temp
  * fixture dir and pin (a) no crashes, (b) character (not byte)
  * semantics against plain JVM string ops, (c) hash-dedup stability on
  * identical unicode content.
  */
class UnicodeRobustnessSpec extends SparkSuite {

  private val texts = Seq(
    0L -> "the quick brown fox jumps over a lazy dog today",
    1L -> "数据 处理 引擎 在 大 规模 语料 上 运行 良好",
    2L -> "café naïve résumé façade über straße",
    3L -> "mixed 数据 café 😀 emoji tokens work fine here",
    4L -> "mixed 数据 café 😀 emoji tokens work fine here", // dup of 3
    5L -> "étoile élève combining marks stay intact")

  private def withUnicodeDocs[T](body: String => T): T = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("unicode_docs").toString
    texts.map { case (id, t) => (id, t, "xx", "src1", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try body(dir)
    finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(dir))
    }
  }

  test("q51 quality metrics use character semantics on multibyte text") {
    import spark.implicits._
    withUnicodeDocs { dir =>
      val got = SparkEntry.queries("q51_text_quality")(spark, dir)
        .select("doc_id", "n_chars", "n_words", "n_distinct")
        .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
      texts.foreach { case (id, t) =>
        val ws = t.split(" ", -1)
        val want = (id, t.codePointCount(0, t.length).toLong,
          ws.length.toLong, ws.distinct.length.toLong)
        assert(got(id) == want, s"doc $id: ${got(id)} != $want")
      }
    }
  }

  test("q91 collapse and q46 hash-dedup are unicode-stable") {
    import spark.implicits._
    withUnicodeDocs { dir =>
      val cleaned = SparkEntry.queries("q91_text_clean")(spark, dir)
        .select("doc_id", "cleaned").as[(Long, String)].collect().toMap
      texts.foreach { case (id, t) =>
        // no consecutive duplicate words in the fixture -> identity
        assert(cleaned(id) == t, s"doc $id mangled: ${cleaned(id)}")
      }
      // exact dedup groups the two identical unicode docs (q46 doubles
      // every 10th doc; ids here are <10 so only the organic 3/4 pair dups)
      val hashes = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), sha2(col("text"), 256).as("h"))
        .as[(Long, String)].collect().toMap
      assert(hashes(3L) == hashes(4L), "identical unicode text must hash equal")
      assert(hashes(2L) != hashes(5L))
    }
  }

  test("q110 vocabulary counts multibyte tokens as whole words") {
    import spark.implicits._
    withUnicodeDocs { dir =>
      val vocab = SparkEntry.queries("q110_vocab_topk")(spark, dir)
        .select("word", "cf").as[(String, Long)].collect().toMap
      assert(vocab("数据") == 3L, s"CJK token miscounted: ${vocab.get("数据")}")
      assert(vocab("😀") == 2L, "emoji token miscounted")
      assert(vocab("café") == 3L, "accented token miscounted")
    }
  }
}
