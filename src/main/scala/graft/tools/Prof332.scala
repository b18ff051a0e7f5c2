package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for q332's A-priori legs at a decade dir (not
  * product surface): times the shared basketItems materialization, the
  * relative-minsup L1 prune, the L2 pair aggregation, and the full
  * query separately, so a decade receipt's wall decomposes into its
  * plans instead of one number (the q50-receipt-hunt discipline).
  * basketItems is memoized per dir, so the legs are additive: each
  * later leg reuses the earlier materialization.
  * Usage: Prof332 <dir> (default tmp/sf100).
  */
object Prof332 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("tmp/sf100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sp = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", sp)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.rdd.compress", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOGLVL", "WARN"))
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(
        f"[prof332] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val ba = t("basketArrays (groupBy(o) collect_set + SER checkpoint)") {
      val ba = graft.queries.Extras.basketArrays(s, d)
      System.err.println("[prof332] baskets=" + ba.count())
      ba
    }
    val no = t("basket count (count of the checkpointed frame)") {
      ba.count()
    }
    val ms = math.max(2L, no / 50000L)
    System.err.println(s"[prof332] baskets=$no minsup=$ms")
    val f1 = t("L1 prune (explode + item supports >= ms)") {
      val f1 = graft.queries.Extras.basketItems(s, d)
        .groupBy(col("p")).agg(count(lit(1)).as("s1"))
        .filter(col("s1") >= ms)
      System.err.println("[prof332] f1 rows=" + f1.count())
      f1
    }
    t("L2 pair aggregation (generated pairs + count >= ms)") {
      val l2 = ba.select(col("o"), col("items"),
          posexplode(col("items")).as(Seq("i", "pa")))
        .select(col("o"), col("pa"),
          explode(slice(col("items"), col("i") + lit(2),
            size(col("items")))).as("pb"))
        .join(broadcast(f1.select(col("p").as("pa"))), Seq("pa"), "semi")
        .join(broadcast(f1.select(col("p").as("pb"))), Seq("pb"), "semi")
        .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("s2"))
        .filter(col("s2") >= ms)
      System.err.println("[prof332] l2 rows=" + l2.count())
    }
    t("full q332 (triple closure + top-20; reuses memoized op)") {
      val n = graft.SparkEntry
        .queries("q332_frequent_triples_relative")(s, d).collect().length
      System.err.println("[prof332] result rows=" + n)
    }
    s.stop()
  }
}
