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
      // Terminal-level recall readout (r15): for every HOT minute
      // (inside a hot hour block), the raw pair volume each ladder
      // stage admits — unsampled C(c,2), after the 1056-id truncation
      // C(min(c,1056),2), and after the ~32-user hash sub-buckets
      // sum C(n_bkt,2) — all computed arithmetically from bucket
      // sizes, no pair enumeration. retained = emitted/truncated is
      // the sampling dial's measured recall; truncated/unsampled is
      // the truncation's own cost, reported separately.
      val du = pe.select(col("h"), col("b"), col("m"), col("u")).distinct()
      val hotH = du.groupBy(col("h"), col("b"))
        .agg(countDistinct(col("u")).as("ch")).filter(col("ch") > 32)
      val mc = du.groupBy(col("h"), col("b"), col("m"))
        .agg(count(lit(1)).as("cm"))
      val hotM = mc.join(hotH.select(col("h"), col("b")), Seq("h", "b"))
        .filter(col("cm") > 32)
      val kept = du.join(hotM, Seq("h", "b", "m"))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("h"), col("b"), col("m")).orderBy(col("u"))))
        .filter(col("rk") <= 1056)
        .withColumn("nsub", expr("(least(cm, 1056) + 31) div 32"))
        .withColumn("bkt", graft.dsl.hashMod2L(col("u"), col("nsub")))
      val emitted = kept.groupBy(col("h"), col("b"), col("m"), col("bkt"))
        .agg(count(lit(1)).as("nb"))
        .agg(coalesce(sum(expr("nb * (nb - 1) div 2")), lit(0L)))
        .head().getLong(0)
      val vols = hotM.agg(
        sum(expr("cm * (cm - 1) div 2")),
        sum(expr("least(cm, 1056) * (least(cm, 1056) - 1) div 2")),
        count(lit(1))).head()
      if (vols.isNullAt(2) || vols.getLong(2) == 0L)
        System.err.println(s"[profpairs] $d: no hot minutes (terminal level inactive)")
      else {
        val (unsampled, truncated, nHot) =
          (vols.getLong(0), vols.getLong(1), vols.getLong(2))
        System.err.println(f"[profpairs] $d: hot_minutes=$nHot " +
          f"unsampled=$unsampled truncated=$truncated emitted=$emitted " +
          f"retained_vs_truncated=${emitted.toDouble / truncated}%.4f " +
          f"retained_vs_unsampled=${emitted.toDouble / unsampled}%.6f")
      }
    }
    s.stop()
  }
}
