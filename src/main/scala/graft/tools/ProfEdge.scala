package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r14 probe: which part of q167's sf10 pipeline exhausts an 8 GB heap. */
object ProfEdge {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/tmp/sf10")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[profedge] $name: ${(System.nanoTime()-t0)/1e9}%.1f s"); r
    }
    val li = t("edge build + count (no cache)") {
      val x = graft.Tables.lineitem(s, d)
        .join(graft.Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").cast("long").as("a"),
          (col("l_suppkey").cast("long") + lit(1000000L)).as("b"))
        .distinct()
      val e = x.select(col("a").as("src"), col("b").as("dst"))
        .union(x.select(col("b"), col("a")))
      e.count()
    }
    System.err.println(s"[profedge] edges: $li")
    val e2 = t("edge build + localCheckpoint(true)") {
      val x = graft.Tables.lineitem(s, d)
        .join(graft.Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").cast("long").as("a"),
          (col("l_suppkey").cast("long") + lit(1000000L)).as("b"))
        .distinct()
      x.select(col("a").as("src"), col("b").as("dst"))
        .union(x.select(col("b"), col("a")))
        .localCheckpoint(true)
    }
    t("deg aggregate over cache") {
      e2.groupBy(col("src")).agg(count(lit(1)).as("deg")).count()
    }
    s.stop()
  }
}
