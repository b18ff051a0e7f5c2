package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** q285 largest-remainder quotas — the fixture's sources are perfectly
  * balanced (every remainder 0), so the apportionment tie-break path
  * never fires there. Two legs:
  *   1. fixture contract: Σquota = k = Σn_selected exactly (the reason
  *      the op exists vs hash-threshold sampling).
  *   2. SYNTHETIC uneven strata (37/211/53/99 docs, k = 100): the
  *      exact-seat counts, largest-remainder extras, and realized
  *      selections must match a JVM Hamilton-apportionment replica,
  *      and every quota must sit within one seat of its exact share
  *      (the apportionment theorem the method guarantees).
  */
class QuotaSplitSpec extends SparkSuite {

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

  private def collect(d: String): Vector[(String, Long, Long, Long, Long,
      Long, Long)] =
    SparkEntry.queries("q285_quota_split")(spark, d)
      .collect().map { case Row(s: String, n: Long, b: Long, r: Long,
        e: Long, q: Long, ns: Long) => (s, n, b, r, e, q, ns) }.toVector

  test("q285 fixture contract: quotas and selections sum to exactly k") {
    val rows = collect(sfDir)
    assert(rows.map(_._6).sum == 100L)
    assert(rows.map(_._7).sum == 100L)
    assert(rows.forall(r => r._6 == r._7), "a stratum missed its quota")
  }

  test("q285 uneven strata: Hamilton replica and the one-seat bound") {
    val sizes = Seq(("src_a", 37), ("src_b", 211), ("src_c", 53),
      ("src_d", 99))
    val k = 100L
    withTempDir("q285_uneven") { dir =>
      import spark.implicits._
      val docRows = sizes.flatMap { case (src, n) =>
        (0 until n).map(i => (src.hashCode.abs.toLong * 1000 + i,
          s"doc $i of $src", "en", src))
      }
      docRows.toDF("doc_id", "text", "lang", "source")
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = collect(dir)
      // Hamilton replica.
      val nTotal = sizes.map(_._2).sum.toLong
      val base = sizes.map { case (s, n) =>
        (s, n.toLong, k * n / nTotal, (k * n) % nTotal)
      }
      val seats = k - base.map(_._3).sum
      val extras = base.sortBy { case (s, _, _, rem) => (-rem, s) }
        .take(seats.toInt).map(_._1).toSet
      val want = base.map { case (s, n, b, rem) =>
        val e = if (extras(s)) 1L else 0L
        (s, n, b, rem, e, b + e, b + e)
      }.sortBy(_._1).toVector
      assert(got == want)
      assert(got.map(_._6).sum == k)
      // One-seat bound: |quota − k·n/N| < 1.
      got.foreach { case (s, n, _, _, _, q, _) =>
        val exact = k.toDouble * n / nTotal
        assert(math.abs(q - exact) < 1.0, s"$s quota $q vs exact $exact")
      }
    }
  }
}
