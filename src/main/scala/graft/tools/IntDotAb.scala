package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Isolated A/B for the fused int-dot kernel (r15 verdict #6: the r15
  * kernel shipped with a parity spec but no recorded before/after).
  * Times q129's hot pair loop — broadcast 10 probes × full corpus,
  * integer dot per pair, top-3 window — twice in one session: the HOF
  * form `aggregate(zip_with(...))` (interpreter per element, blocks
  * whole-stage codegen) vs the fused codegen'd `int_dot`. Min-of-3
  * each, HOF first (any warm-up bias favors the baseline, so the
  * reported win is a floor).
  *
  *   SPARK_GRAFT_CPUS=32 sbt -batch \
  *     "runMain graft.tools.IntDotAb /root/testdata/sf0.1"
  */
object IntDotAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.IntDotProduct.register(spark)

    val quant = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        sqrt(aggregate(col("embedding"), lit(0.0),
          (acc, v) => acc + v.cast("double") * v.cast("double"))).as("n"))
      .select(col("vec_id"),
        transform(col("embedding"),
          x => ((x.cast("double") / col("n")) * 127.0).cast("int")).as("qv"))
    val q = quant.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("qv").as("qq"))
    val c = quant.select(col("vec_id").as("cid"), col("qv").as("cq"))

    def run(label: String, dot: (Column, Column) => Column): Double = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("dot_q").desc, col("cid"))
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = broadcast(q).join(c, col("qid") =!= col("cid"))
          .select(col("qid"), col("cid"), dot(col("qq"), col("cq")).as("dot_q"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .count()
        spark.catalog.clearCache()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val t = times.map(_._1).min
      println(f"$label%-6s min-of-3 $t%.3f s (rows ${times.head._2})")
      t
    }

    val hof = run("hof", (a, b) =>
      aggregate(zip_with(a, b, (x, y) => (x * y).cast("long")),
        lit(0L), (acc, v) => acc + v))
    val fused = run("fused", (a, b) =>
      graft.functions.IntDotProduct.intDot(a, b))
    println(f"speedup ${hof / fused}%.2fx (hof $hof%.3f s -> fused $fused%.3f s)")
    spark.stop()
  }
}
