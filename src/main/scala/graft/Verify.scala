package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, rest @ _*) = args
    // Optional trailing query names restrict the run (local iteration).
    val only: Set[String] = rest.toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // Compress serialized RDD caches: the DISK_ONLY edge checkpoints
      // of the iterative operators (PageRank's src-pinned pin) are long
      // pairs that compress ~3x, and the sf100 receipt died with the
      // UNcompressed pin + setup shuffles within a rounding error of
      // the whole spill disk. Deserialized caches (Memo, persist) are
      // unaffected by this flag. A production cluster sets it for the
      // same reason.
      .config("spark.rdd.compress", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Correctness runs always take the exact audit path: see
    // Vectors.honorAuditAnnEnv. Warn so a confused local run is visible.
    graft.queries.Vectors.honorAuditAnnEnv = false
    if (sys.env.contains("SPARK_GRAFT_AUDIT_ANN"))
      System.err.println("[verify] SPARK_GRAFT_AUDIT_ANN is set but " +
        "ignored: oracle runs always use the exact audit path")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // Release this query's persisted frames: the 90-query single-session
      // run otherwise accumulates cached blocks (intra-query persists are
      // load-bearing during the action but dead after it) and the cache
      // pressure bleeds into every later query's timing/memory.
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
