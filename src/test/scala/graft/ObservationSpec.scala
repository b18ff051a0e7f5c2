package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Dataset.observe: data-quality counters computed inside the same pass
  * as the consuming action — at 100 TB this is how a pipeline reports
  * row counts / null rates / domain violations without a second scan. */
class ObservationSpec extends SparkSuite {

  test("observe rides quality metrics along a single pass") {
    val obs = Observation("doc_quality")
    val docs = Tables.documents(spark, sfDir)
      .observe(obs,
        count(lit(1)).as("n_docs"),
        sum(when(col("text").isNull || length(col("text")) === 0, 1L)
          .otherwise(0L)).as("n_empty"),
        sum(when(col("lang").isin("de", "en", "es", "fr", "zh"), 0L)
          .otherwise(1L)).as("n_bad_lang"))
    // One action drives both the aggregate below AND the metrics.
    val perLang = docs.groupBy(col("lang")).count().collect()
    val m = obs.get
    assert(perLang.map(_.getLong(1)).sum == m("n_docs").asInstanceOf[Long])
    assert(m("n_empty").asInstanceOf[Long] == 0L)
    assert(m("n_bad_lang").asInstanceOf[Long] == 0L)
  }
}
