package graft

import graft.functions.IntDotProduct
import org.apache.spark.sql.functions._

/** The fused codegen'd integer dot must agree with the HOF formulation
  * it replaced in q129's pair loop — exactly, not approximately:
  * integer products in a BIGINT accumulator are associative and exact,
  * which is the determinism property the quantized-retrieval queries
  * are built on. */
class IntDotExpressionSpec extends SparkSuite {

  test("int_dot == HOF aggregate(zip_with) exactly on quantized fixture pairs") {
    import spark.implicits._
    IntDotProduct.register(spark)
    val quant = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        transform(col("embedding"), x => (x * 100).cast("int")).as("qv"))
    val a = quant.select(col("vec_id").as("ida"), col("qv").as("qa"))
    val b = quant.select(col("vec_id").as("idb"), col("qv").as("qb"))
    val both = a.join(b, col("idb") === col("ida") + 3)
      .select(
        IntDotProduct.intDot(col("qa"), col("qb")).as("fused"),
        aggregate(zip_with(col("qa"), col("qb"),
          (x, y) => (x * y).cast("long")), lit(0L), (acc, v) => acc + v)
          .as("hof"))
      .as[(Long, Long)].collect()
    assert(both.nonEmpty)
    both.foreach { case (f, h) => assert(f == h) }
  }

  test("int_dot: empty arrays fold to 0, NULL side yields NULL, mismatch truncates") {
    IntDotProduct.register(spark)
    val r = spark.sql(
      """SELECT
        int_dot(CAST(array() AS ARRAY<INT>), CAST(array() AS ARRAY<INT>)) AS empty,
        int_dot(CAST(NULL AS ARRAY<INT>), array(1, 2)) AS nul,
        int_dot(array(2, 3, 100), array(5, 7)) AS trunc,
        int_dot(array(2000000000, 2000000000),
                array(2000000000, 2000000000)) AS wide
      """).collect().head
    assert(r.getLong(0) == 0L)    // aggregate's initial value, not NULL
    assert(r.isNullAt(1))
    assert(r.getLong(2) == 31L)   // shorter side bounds the loop
    assert(r.getLong(3) == 8e18.toLong) // per-element long widening, no overflow
  }

  test("int_dot is callable from SQL after registration") {
    IntDotProduct.register(spark)
    assert(spark.sql("SELECT int_dot(array(1, -2), array(3, 4)) AS d")
      .collect()(0).getLong(0) == -5L)
  }
}
