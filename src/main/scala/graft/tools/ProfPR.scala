package graft.tools
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch phase-profiler for operators.PageRank on the q167 trade graph
  * (not part of the product surface; PLANS.md records its numbers).
  * Replicates the operator's current structure with per-phase timing so
  * the fixed per-iteration floor is visible separately from data work.
  */
object ProfPR {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[profpr] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    (1 to 3).foreach { round =>
      System.err.println(s"[profpr] === round $round ===")
      val li = graft.Tables.lineitem(s, sfDir)
        .join(graft.Tables.orders(s, sfDir),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").cast("long").as("a"),
          (col("l_suppkey").cast("long") + lit(1000000L)).as("b"))
        .distinct()
      val edges = li.select(col("a").as("src"), col("b").as("dst"))
        .union(li.select(col("b"), col("a")))

      // Inline replica of PageRank.runWithDeg with per-phase timing.
      val e = t("ckpt-edges") {
        edges.select(col("src"), col("dst")).localCheckpoint(true)
      }
      val deg = t("ckpt-deg") {
        e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
          .localCheckpoint(true)
      }
      val nodes = deg.select(col("src").as("node"))
      val degN = deg.withColumnRenamed("src", "node")
      var ranks: DataFrame = nodes.withColumn("rank", lit(1.0))
      var gen: Option[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]] = None
      (1 to 10).foreach { i =>
        t(s"iter-$i") {
          val rpd = ranks.join(broadcast(degN), Seq("node"))
            .select(col("node").as("src"),
              floor((col("rank") / col("deg").cast("double")) * lit(1e9))
                .as("c"))
          val contribs = e.join(broadcast(rpd), Seq("src"))
            .select(col("dst").as("node"), col("c"))
            .union(nodes.select(col("node"), lit(0L).as("c")))
          val next = contribs.groupBy(col("node"))
            .agg(sum(col("c")).as("msum"))
            .select(col("node"),
              (lit(0.15) + lit(0.85) *
                (col("msum").cast("double") / lit(1e9))).as("rank"))
          val t0 = System.nanoTime()
          val rdd = next.rdd.persist(
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          System.err.println(
            f"[profpr]   plan-to-rdd: ${(System.nanoTime() - t0) / 1e9}%.3f s")
          val df = s.createDataFrame(rdd, next.schema)
          rdd.count()
          gen.foreach(_.unpersist(blocking = false))
          gen = Some(rdd)
          ranks = df
        }
      }
      t("readout-join") {
        ranks.join(broadcast(degN), Seq("node"))
          .select(col("node"), col("deg"),
            (floor(col("rank") * lit(1e9)).cast("double") / lit(1e9))
              .as("rank"))
          .orderBy(col("node")).count()
      }
      gen.foreach(_.unpersist(blocking = false))
      s.catalog.clearCache()
      System.gc()
    }
  }
}
