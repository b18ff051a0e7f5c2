package graft

import graft.functions.WordNgrams
import org.apache.spark.sql.functions._

/** The fused word_ngrams kernel must agree with the HOF formulation it
  * replaces across the text/dedup family — exactly, element for element,
  * on every input the guarded call sites can see (`size(w) >= n`), and
  * its sub-n behaviour (EMPTY array where the HOF form is undefined and
  * the sites guarded) is its own pinned contract (WordNgrams scaladoc).
  * Space pathologies matter: split(" ") produces empty words on leading/
  * trailing/doubled spaces and concat_ws rejoins them byte-identically,
  * which is the identity the kernel's zero-copy byte spans rely on. */
class WordNgramsSpec extends SparkSuite {

  private def hofForm(n: Int) = {
    val w = split(col("text"), " ")
    transform(sequence(lit(1), size(w) - (n - 1)),
      i => concat_ws(" ", slice(w, i, lit(n))))
  }

  test("word_ngrams == HOF transform/slice/concat_ws on the fixture corpus, n = 2, 3, 8") {
    WordNgrams.register(spark)
    for (n <- Seq(2, 3, 8)) {
      val w = split(col("text"), " ")
      val mismatches = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text")).filter(size(w) >= n)
        .select(WordNgrams.wordNgrams(col("text"), n).as("fused"),
          hofForm(n).as("hof"))
        .filter(not(col("fused") <=> col("hof")))
        .count()
      assert(mismatches == 0L, s"n=$n")
    }
  }

  test("word_ngrams: space pathologies match the HOF form byte-for-byte") {
    WordNgrams.register(spark)
    import spark.implicits._
    val rows = Seq(
      "a b c", "a  b c", " a b c", "a b c ", "a   b", "  ",
      "one two three four", "x y x y x y", "padded  mid  spaces here")
      .toDF("text").filter(size(split(col("text"), " ")) >= 2)
    val bad = rows.select(WordNgrams.wordNgrams(col("text"), 2).as("fused"),
        hofForm(2).as("hof"))
      .filter(not(col("fused") <=> col("hof"))).count()
    assert(bad == 0L)
  }

  test("word_ngrams: fewer than n words yields an empty array; NULL text yields NULL") {
    WordNgrams.register(spark)
    val r = spark.sql(
      """SELECT word_ngrams('one two', 3) AS short,
                word_ngrams('', 2) AS empty,
                word_ngrams(CAST(NULL AS STRING), 3) AS nul,
                word_ngrams('solo', 1) AS unigram
      """).collect().head
    assert(r.getSeq[String](0).isEmpty)
    assert(r.getSeq[String](1).isEmpty)
    assert(r.isNullAt(2))
    assert(r.getSeq[String](3) == Seq("solo"))
  }

  test("word_ngrams: eval and codegen agree (Literal path vs codegen'd projection)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val texts = Seq("a b c d", "a  b", " lead", "trail ", "", "one")
    for (t <- texts; n <- Seq(1, 2, 3)) {
      val interpreted = WordNgrams(Literal(t), Literal(n)).eval()
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toArray[org.apache.spark.unsafe.types.UTF8String](
          org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      WordNgrams.register(spark)
      import spark.implicits._
      val viaCodegen = Seq(t).toDF("text")
        .select(WordNgrams.wordNgrams(col("text"), n).as("g"))
        .collect().head.getSeq[String](0)
      assert(interpreted == viaCodegen, s"text='$t' n=$n")
    }
  }

  test("word_ngrams: non-positive or non-foldable n is a clean error, wrong arity too") {
    WordNgrams.register(spark)
    intercept[Exception] {
      spark.sql("SELECT word_ngrams('a b c', 0)").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT word_ngrams('a b c')").collect()
    }
  }

  test("word_ngrams stays inside WholeStageCodegen (no fallback to interpreted projection)") {
    WordNgrams.register(spark)
    val prevFb = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val out = Tables.documents(spark, sfDir).limit(50)
        .select(explode(array_distinct(
          WordNgrams.wordNgrams(col("text"), 3))).as("shingle"))
        .count()
      assert(out > 0L)
    } finally spark.conf.set("spark.sql.codegen.fallback", prevFb)
  }
}
