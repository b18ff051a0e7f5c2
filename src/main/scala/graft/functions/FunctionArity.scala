package graft.functions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.expressions.Expression

/** Shared arity guard for the SQL-registry builders (r15 advice): a
  * builder that blindly indexes `children(0)/children(1)` turns a
  * user's `int_dot(array(1))` into an `IndexOutOfBoundsException`
  * instead of the analysis error every built-in function raises. The
  * guard throws Spark's own `WRONG_NUM_ARGS` error class, so the SQL
  * caller sees the same shape of message (function name, expected
  * arity, actual arity, SQLSTATE 42605) as for a mis-called built-in.
  */
private[graft] object FunctionArity {

  /** Build a binary expression, or raise the standard arity error. */
  def two(name: String, children: Seq[Expression])(
      build: (Expression, Expression) => Expression): Expression =
    children match {
      case Seq(a, b) => build(a, b)
      case _         => throw wrongNumArgs(name, "2", children.size)
    }

  /** Build a 4-ary expression, or raise the standard arity error. */
  def four(name: String, children: Seq[Expression])(
      build: (Expression, Expression, Expression, Expression) => Expression): Expression =
    children match {
      case Seq(a, b, c, d) => build(a, b, c, d)
      case _               => throw wrongNumArgs(name, "4", children.size)
    }

  /** Build a unary expression, or raise the standard arity error. */
  def one(name: String, children: Seq[Expression])(
      build: Expression => Expression): Expression =
    children match {
      case Seq(a) => build(a)
      case _      => throw wrongNumArgs(name, "1", children.size)
    }

  private def wrongNumArgs(name: String, expected: String,
      actual: Int): AnalysisException =
    new AnalysisException(
      "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      Map(
        "functionName" -> s"`$name`",
        "expectedNum" -> expected,
        "actualNum" -> actual.toString,
        "docroot" -> "https://spark.apache.org/docs/latest"))
}
