package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One oracle-checked query: the product surface is the set of these.
  *
  * @param name   stable key; becomes the parquet dir name under verify out
  * @param doc    which SURVEY.md §2 operator(s) this exercises
  * @param fn     Spark implementation `(session, sfDir) => result`
  * @param oracle equivalent ANSI SQL for DuckDB over the same parquet
  *               tables; None for ops DuckDB cannot express (driver then
  *               records a weaker rows-only check)
  */
final case class Q(
    name: String,
    doc: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Registry modules implement this. */
  trait Module { def defs: Seq[Q] }
}
