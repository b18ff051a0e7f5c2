package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scratch profiler for the dedup family's shared shingle pipeline (r18
  * optimization round; not product surface): times (a) the raw scan +
  * word split, (b) the interpreted-HOF shingle construction + explode,
  * (c) the df cutoff window pass, and (d) the aggregate+broadcast-anti
  * alternative to (c) — so the family's dominant shared cost decomposes
  * before any rewrite. Usage: ProfSh [dir] [reps]
  */
object ProfSh {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Unit): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[profsh] $name: min ${times.min}%.3f s  (${times.map(x => f"$x%.2f").mkString(",")})")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = graft.Tables.fanOut(graft.Tables.documents(s, d))
      .select(col("doc_id"), col("text"))
    val w = split(col("text"), " ")
    def sh0 = docs.filter(size(w) >= 3)
      .select(col("doc_id"),
        explode(array_distinct(
          transform(sequence(lit(1), size(w) - 2),
            i => concat_ws(" ", slice(w, i, lit(3)))))).as("shingle"))
    // ws materialized as a column first: the lambda's `slice` then
    // references an attribute, not the split expression — interpreted
    // HOF eval otherwise recomputes split(text) once per lambda call.
    def sh0b = docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"),
        explode(array_distinct(
          transform(sequence(lit(1), size(col("ws")) - 2),
            i => concat_ws(" ", slice(col("ws"), i, lit(3)))))).as("shingle"))
    t("a: scan+split+size filter (noop)") { noop(docs.filter(size(w) >= 3)) }
    t("b: shingle HOF construct+explode (noop)") { noop(sh0) }
    t("b2: ws-materialized shingle construct (noop)") { noop(sh0b) }
    t("b2 count (must equal b)") {
      System.err.println("[profsh] rows b2=" + sh0b.count())
    }
    t("c: b + df window + cutoff (noop)") {
      noop(sh0.withColumn("df",
          count(lit(1)).over(Window.partitionBy(col("shingle"))))
        .filter(col("df") <= 100))
    }
    t("d: b + agg hot set + bcast anti (noop)") {
      val hot = sh0.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
        .filter(col("df") > 100).select(col("shingle"))
      noop(sh0.join(broadcast(hot), Seq("shingle"), "left_anti"))
    }
    t("e: count rows of b") {
      System.err.println("[profsh] rows=" + sh0.count())
    }
    s.stop()
  }
}
