package graft

import graft.functions.IntDotProduct
import org.apache.spark.sql.functions._

/** The fused codegen'd integer dot must agree with the HOF formulation
  * it replaced in q129's pair loop — exactly, not approximately, on the
  * envelope that loop guarantees: equal-length, null-free arrays whose
  * products fit in INT. Outside that envelope the kernel INTENTIONALLY
  * diverges from the HOF form (truncation instead of a NULL-poisoned
  * fold, widen-before-multiply instead of INT wraparound, null elements
  * skipped) — the `trunc`/`wide`/null-element cases below pin the
  * kernel's OWN contract, not HOF parity (IntDotProduct scaladoc). */
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

  test("int_dot: NULL elements contribute 0, identically in eval and codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, IntegerType}
    IntDotProduct.register(spark)
    // Codegen path (UnsafeArrayData) via SQL …
    val viaSql = spark.sql(
      "SELECT int_dot(array(2, CAST(NULL AS INT), 5), array(3, 7, 11)) AS d")
      .collect()(0).getLong(0)
    // … and the interpreted path (GenericArrayData) via direct eval —
    // before the r15-advice guard, this NPE'd while codegen read 0.
    val viaEval = graft.functions.IntDotProduct(
      Literal.create(Seq[Integer](2, null, 5), ArrayType(IntegerType, containsNull = true)),
      Literal.create(Seq[Integer](3, 7, 11), ArrayType(IntegerType, containsNull = true)))
      .eval(null)
    assert(viaSql == 61L) // 2*3 + skip + 5*11
    assert(viaEval == 61L)
  }

  test("int_dot: wrong arity is a clean analysis error, not an index crash") {
    IntDotProduct.register(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT int_dot(array(1))").collect()
    }
    assert(e.getMessage.contains("int_dot"))
    assert(e.getCondition != null && e.getCondition.startsWith("WRONG_NUM_ARGS"))
  }
}
