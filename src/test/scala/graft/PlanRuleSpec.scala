package graft

import graft.plans.ThresholdLevenshteinRule
import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.apache.spark.sql.functions._

/** The injected optimizer rule must rewrite naive levenshtein bound
  * filters into the threshold-limited builtin — and must not change
  * results. */
class PlanRuleSpec extends SparkSuite {

  // The bound may live in a Filter or (after predicate pushdown) a Join
  // condition — collect thresholded levenshteins from the whole plan.
  private def thresholdedFilters(df: org.apache.spark.sql.DataFrame): Seq[Levenshtein] =
    df.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.collect { case l: Levenshtein if l.threshold.isDefined => l }
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        j.condition.toSeq.flatMap(_.collect {
          case l: Levenshtein if l.threshold.isDefined => l
        })
    }.flatten

  test("naive levenshtein <= k filter is planned with the threshold kernel") {
    // Parquet-backed plans (the real case): a tiny LocalRelation would be
    // collapsed by ConvertToLocalRelation before user rules run.
    ThresholdLevenshteinRule.install(spark)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), substring(col("text"), 1, 12).as("head"))
    val a = docs.select(col("doc_id").as("da"), col("head").as("ha"))
    val b = docs.select(col("doc_id").as("db"), col("head").as("hb"))
    val joined = a.crossJoin(b).filter(col("da") < col("db"))
    val le = joined.filter(levenshtein(col("ha"), col("hb")) <= 2)
    assert(thresholdedFilters(le).nonEmpty, "<= bound not rewritten")
    val lt = joined.filter(levenshtein(col("ha"), col("hb")) < 3)
    assert(thresholdedFilters(lt).nonEmpty, "< bound not rewritten")
    // identical row sets with and without the rewrite (same bound: < 3)
    val naive = joined.filter(levenshtein(col("ha"), col("hb")) < 3)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val explicit = joined.filter(levenshtein(col("ha"), col("hb"), 2) >= 0)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive == explicit && naive.nonEmpty)
  }

  test("q84's own filter is rewritten by the installed rule") {
    val df = SparkEntry.queries("q84_dedup_levenshtein_rule")(spark, sfDir)
    assert(thresholdedFilters(df).nonEmpty, "q84 filter not thresholded")
  }

  test("projected levenshtein outputs and other comparisons are untouched") {
    import spark.implicits._
    ThresholdLevenshteinRule.install(spark)
    val df = Seq(("kitten", "sitting")).toDF("a", "b")
    // output column: full distance must survive (no -1 sentinel)
    val out = df.select(levenshtein(col("a"), col("b")).as("d")).as[Int].collect()
    assert(out.toSeq == Seq(3))
    // >= k lower-bound filter is not a candidate for the rewrite
    val ge = df.filter(levenshtein(col("a"), col("b")) >= 2)
    assert(thresholdedFilters(ge).isEmpty)
    assert(ge.count() == 1)
  }

  test("install is idempotent") {
    ThresholdLevenshteinRule.install(spark)
    ThresholdLevenshteinRule.install(spark)
    assert(spark.experimental.extraOptimizations.count(_ == ThresholdLevenshteinRule) == 1)
  }
}
