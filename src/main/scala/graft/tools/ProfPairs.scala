package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r14 probe: co-purchase pair volume under the two-level block
  * builder at each fixture scale (item-3 receipt: non-empty graphs at
  * bounded cost where the r13 drop-based cutoff went near-empty). */
object ProfPairs {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    args.foreach { d =>
      val pe = graft.Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(expr("(ts div 1000) div 3600000000").as("h"),
          expr("(ts div 1000) div 60000000").as("m"),
          floor(col("value") / 10).as("b"),
          col("user_id").cast("long").as("u"))
      val pairs = graft.queries.Relational.blockedCoPurchasePairs(pe)
      val n = pairs.count()
      val nodes = pairs.select(col("x")).union(pairs.select(col("y")))
        .distinct().count()
      System.err.println(s"[profpairs] $d: pairs=$n nodes=$nodes")
    }
    s.stop()
  }
}
