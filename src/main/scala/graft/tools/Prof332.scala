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
    val op = t("basketItems (distinct (o,p) + SER checkpoint)") {
      val op = graft.queries.Extras.basketItems(s, d)
      System.err.println("[prof332] op rows=" + op.count())
      op
    }
    val no = t("basket count") {
      op.select(col("o")).distinct().count()
    }
    val ms = math.max(2L, no / 50000L)
    System.err.println(s"[prof332] baskets=$no minsup=$ms")
    val f1 = t("L1 prune (item supports >= ms)") {
      val f1 = op.groupBy(col("p")).agg(count(lit(1)).as("s1"))
        .filter(col("s1") >= ms)
      System.err.println("[prof332] f1 rows=" + f1.count())
      f1
    }
    t("L2 pair aggregation (pruned self-join + count >= ms)") {
      val pr = op.join(broadcast(f1.select(col("p"))), Seq("p"))
      val l2 = pr.select(col("o"), col("p").as("pa")).as("a")
        .join(pr.select(col("o").as("o2"), col("p").as("pb")).as("b"),
          col("o") === col("o2") && col("pa") < col("pb"))
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
