package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Threshold-bounded Levenshtein distance: returns the exact edit distance
  * when it is <= k, and k+1 otherwise.
  *
  * Why a native Catalyst expression (SURVEY.md §2.10 ladder): edit-distance
  * dedup only ever asks "is the distance <= k?", but the built-in
  * `levenshtein` fills the full O(n·m) dynamic-programming matrix before
  * the comparison. Ukkonen's banding observes that cells farther than k
  * from the diagonal cannot contribute to a distance <= k, so only a
  * 2k+1-wide band is computed — O(k·min(n,m)) — and the row minimum gives
  * an early exit the moment the band exceeds k. For near-dup filtering of
  * documents (k ~ 8, strings ~ 10^3 chars) that is two orders of magnitude
  * less work per pair, on the operator that runs once per candidate pair.
  *
  * Exactness contract: for inputs with true distance <= k the result
  * equals the full Levenshtein distance (the band provably contains every
  * optimal path); for larger distances the result is exactly k+1. A
  * `WHERE bounded_levenshtein(a, b, k) <= k` filter therefore selects the
  * identical rows, with identical values, as `WHERE levenshtein(a, b) <= k`
  * — which is what lets the DuckDB oracle keep using plain `levenshtein`.
  *
  * Distance is over UTF-16 code units (Java chars), matching the built-in
  * for ASCII/BMP text (the fixture corpus is ASCII).
  */
case class BoundedLevenshtein(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bounded_levenshtein"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, StringType, IntegerType) if third.foldable =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (STRING, STRING, INT literal bound), got " +
            s"(${first.dataType.catalogString}, ${second.dataType.catalogString}, " +
            s"${third.dataType.catalogString})")
    }
  }

  override def nullSafeEval(a: Any, b: Any, kAny: Any): Any =
    BoundedLevenshtein.banded(
      a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString,
      kAny.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = BoundedLevenshtein.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b, k) =>
      s"${ev.value} = $cls.banded($a.toString(), $b.toString(), $k);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BoundedLevenshtein =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BoundedLevenshtein {

  /** Banded Levenshtein: exact distance if <= k, else k+1. Static so the
    * generated code calls straight into one JIT-compiled method (the DP
    * loop itself gains nothing from inlining into the consuming stage). */
  def banded(s: String, t: String, k: Int): Int = {
    if (k < 0) return 0
    val n = s.length
    val m = t.length
    if (math.abs(n - m) > k) return k + 1
    if (n == 0) return m // m <= k here
    if (m == 0) return n
    val inf = k + 1
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= k) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      val from = math.max(1, i - k)
      val to = math.min(m, i + k)
      cur(from - 1) = if (from == 1) i else inf
      var rowMin = cur(from - 1)
      j = from
      while (j <= to) {
        val cost = if (s.charAt(i - 1) == t.charAt(j - 1)) 0 else 1
        var best = prev(j - 1) + cost // substitute / match
        val del = (if (j <= math.min(m, i - 1 + k)) prev(j) else inf) + 1
        if (del < best) best = del
        val ins = cur(j - 1) + 1
        if (ins < best) best = ins
        cur(j) = if (best > inf) inf else best
        if (cur(j) < rowMin) rowMin = cur(j)
        j += 1
      }
      if (rowMin > k) return k + 1 // whole band exceeded the bound
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    math.min(prev(m), k + 1)
  }

  /** Column-API entry point (requires [[register]] on the session once). */
  def boundedLev(a: Column, b: Column, k: Column): Column =
    call_function("bounded_levenshtein", a, b, k)

  /** Register `bounded_levenshtein` for SQL callers on an existing session. */
  def register(spark: SparkSession): Unit = {
    val info = new ExpressionInfo(classOf[BoundedLevenshtein].getName, "bounded_levenshtein")
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("bounded_levenshtein"),
      info,
      (children: Seq[Expression]) =>
        BoundedLevenshtein(children(0), children(1), children(2)))
  }
}
