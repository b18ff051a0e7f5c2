package graft

import graft.functions.BoundedLevenshtein
import org.apache.spark.sql.functions._

import scala.util.Random

/** The banded expression must agree with the built-in full-matrix
  * levenshtein on every distance <= k, and report exactly k+1 beyond —
  * in both the interpreted and whole-stage-codegen paths. */
class BoundedLevenshteinSpec extends SparkSuite {

  private def randomPairs(n: Int): Seq[(String, String)] = {
    val rng = new Random(17)
    val alpha = "abcde"
    def word(len: Int) = Seq.fill(len)(alpha(rng.nextInt(alpha.length))).mkString
    (1 to n).map { _ =>
      val s = word(1 + rng.nextInt(60))
      // mutate s with 0..12 random edits so distances straddle the bound
      var t = s
      (1 to rng.nextInt(13)).foreach { _ =>
        val pos = if (t.isEmpty) 0 else rng.nextInt(t.length)
        rng.nextInt(3) match {
          case 0 if t.nonEmpty => t = t.updated(pos, alpha(rng.nextInt(alpha.length)))
          case 1 => t = t.substring(0, pos) + alpha(rng.nextInt(alpha.length)) + t.substring(pos)
          case _ if t.nonEmpty => t = t.substring(0, pos) + t.substring(math.min(pos + 1, t.length))
          case _ =>
        }
      }
      (s, t)
    }
  }

  test("bounded_levenshtein == min(levenshtein, k+1) on random pairs (SQL/codegen)") {
    import spark.implicits._
    BoundedLevenshtein.register(spark)
    val k = 6
    val rows = randomPairs(300).toDF("s", "t")
      .select(col("s"), col("t"),
        BoundedLevenshtein.boundedLev(col("s"), col("t"), lit(k)).as("bounded"),
        levenshtein(col("s"), col("t")).as("full"))
      .as[(String, String, Int, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (s, t, bounded, full) =>
      assert(bounded == math.min(full, k + 1), s"s=$s t=$t full=$full bounded=$bounded")
    }
  }

  test("banded kernel edge cases") {
    assert(BoundedLevenshtein.banded("", "", 3) == 0)
    assert(BoundedLevenshtein.banded("", "ab", 3) == 2)
    assert(BoundedLevenshtein.banded("abc", "", 2) == 3) // == k+1, exact here
    assert(BoundedLevenshtein.banded("abcdefgh", "", 3) == 4) // length gap > k
    assert(BoundedLevenshtein.banded("kitten", "sitting", 10) == 3)
    assert(BoundedLevenshtein.banded("kitten", "sitting", 2) == 3) // k+1
    assert(BoundedLevenshtein.banded("same", "same", 0) == 0)
    assert(BoundedLevenshtein.banded("a", "b", 0) == 1) // k+1 for k=0
  }

  test("null inputs propagate null") {
    BoundedLevenshtein.register(spark)
    val r = spark.sql(
      "SELECT bounded_levenshtein(CAST(NULL AS STRING), 'x', 5) AS v").collect().head
    assert(r.isNullAt(0))
  }
}
