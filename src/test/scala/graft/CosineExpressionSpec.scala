package graft

import graft.functions.CosineSimilarity
import org.apache.spark.sql.functions._

/** The fused codegen'd cosine expression must be bit-identical to the
  * higher-order-function formulation (same left-to-right double folds). */
class CosineExpressionSpec extends SparkSuite {

  test("cosine_sim == HOF cosine bit-for-bit on fixture pairs") {
    import spark.implicits._
    CosineSimilarity.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val a = e.select(col("vec_id").as("ida"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("idb"), col("embedding").as("eb"))
    def hofDot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    def hofN2(x: org.apache.spark.sql.Column) =
      aggregate(x, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))
    val both = a.join(b, col("idb") === col("ida") + 7)
      .select(
        CosineSimilarity.cosineSim(col("ea"), col("eb")).as("fused"),
        (hofDot(col("ea"), col("eb")) / (sqrt(hofN2(col("ea"))) * sqrt(hofN2(col("eb")))))
          .as("hof"))
      .as[(Double, Double)].collect()
    assert(both.nonEmpty)
    both.foreach { case (f, h) =>
      assert(java.lang.Double.doubleToLongBits(f) == java.lang.Double.doubleToLongBits(h))
    }
  }

  test("cosine_sim returns NULL on empty arrays, NaN on zero-norm") {
    CosineSimilarity.register(spark)
    // SQL path (interpreted + codegen'd depending on plan) — empty arrays
    // must yield NULL (SQL convention, matches DuckDB list_sum of []),
    // zero-norm non-empty arrays keep the IEEE 0/0 = NaN of the HOF fold.
    val rows = spark.sql(
      """SELECT
        cosine_sim(CAST(array() AS ARRAY<FLOAT>), CAST(array() AS ARRAY<FLOAT>)) AS empty,
        cosine_sim(CAST(array(0.0) AS ARRAY<FLOAT>), CAST(array(0.0) AS ARRAY<FLOAT>)) AS zero,
        cosine_sim(CAST(NULL AS ARRAY<FLOAT>), CAST(array(1.0) AS ARRAY<FLOAT>)) AS nul
      """).collect().head
    assert(rows.isNullAt(0))
    assert(rows.getDouble(1).isNaN)
    assert(rows.isNullAt(2))
  }

  test("cosine_sim is callable from SQL after registration") {
    CosineSimilarity.register(spark)
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("emb_t")
    val r = spark.sql(
      "SELECT cosine_sim(embedding, embedding) AS c FROM emb_t LIMIT 5")
      .collect().map(_.getDouble(0))
    assert(r.forall(c => math.abs(c - 1.0) < 1e-12))
  }
}
