package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for q50's ANN legs at a decade dir (not product
  * surface): times the IVF probe-map materialization (train + assign +
  * sub-split) separately from the bucketed pair verify, so a decade
  * receipt's wall decomposes into its two plans instead of one number.
  * Usage: Prof50 <dir> (default tmp/sf100).
  */
object Prof50 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("tmp/sf100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOGLVL", "WARN"))
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[prof50] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val pm = t("ivfProbeMap build (train + assign + subsplit)") {
      val pm = graft.queries.Scale.ivfProbeMap(s, d, nprobe = 2)
      if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1"))
        pm.explain("formatted")
      System.err.println("[prof50] pm rows=" + pm.count())
      pm
    }
    // The query call builds its OWN probe map (no memo), so this leg's
    // wall = pm-build + verify; verify alone = this minus the leg above.
    t("full query (pm rebuild + bucketed verify)") {
      val n = graft.queries.Dedup.embCosinePairs(s, d, forceAnn = Some(true))
        .count()
      System.err.println("[prof50] pairs=" + n)
    }
    pm.unpersist(blocking = false)
    s.stop()
  }
}
