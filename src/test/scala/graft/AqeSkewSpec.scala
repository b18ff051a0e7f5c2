package graft

import org.apache.spark.sql.functions._

/** Runtime skew handling: q92 shows MANUAL salting; this pins the AQE
  * path the scale notes lean on — a skewed sort-merge join partition is
  * SPLIT by AdaptiveSparkPlan (skew=true in the final plan) without any
  * query rewrite. Thresholds are lowered so fixture-scale data exhibits
  * "skew"; the mechanism is identical at 100 TB defaults.
  */
class AqeSkewSpec extends SparkSuite {

  test("AQE splits a skewed sort-merge join partition (skew=true)") {
    import spark.implicits._
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // key 0 carries ~100x the median partition's bytes; payload widens rows
      val left = spark.range(0, 120000)
        .select(when(col("id") % 4 =!= 0, lit(0L)).otherwise(col("id") % 50 + 1).as("k"),
          concat(lit("payload-payload-payload-"), col("id")).as("pay"))
      val right = (0L to 50L).toDF("k").withColumn("rv", col("k") * 10)
      // Global agg over the payload: a groupBy(k) parent would REQUIRE
      // hash distribution on k, which forbids splitting the join's
      // partitions (AQE skips OptimizeSkewedJoin rather than break the
      // requirement) — and referencing pay stops column pruning from
      // shrinking the skewed partition below the threshold.
      val joined = left.join(right, Seq("k"))
        .agg(sum(length(col("pay"))).as("bytes"), count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed join partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
