package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch profiler for q313's winnowing pipeline (not product surface):
  * times each stage at a given SF dir, and A/B-tests whether the `hs`
  * 3-gram hash array is re-evaluated per window inside the outer
  * transform lambda (inlined expression) vs once per row (materialized
  * column).
  */
object ProfWin {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/tmp/sf1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[profwin] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val base = graft.Tables.documents(s, sfDir).select(col("doc_id"), col("text"))
    val corpus = graft.Tables.fanOut(base.unionByName(
      base.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 10000).as("doc_id"), col("text"))))
    val w = split(col("text"), " ")
    val hs = transform(sequence(lit(1), size(w) - 2), i =>
      conv(substring(md5(concat_ws(" ", slice(w, i, lit(3)))), 1, 8),
        16, 10).cast("long"))

    // A: current shape — hs inlined in the window lambda.
    t("A-inline-fps-count") {
      corpus.filter(size(w) >= 6)
        .select(col("doc_id"),
          explode(array_distinct(
            transform(sequence(lit(1), size(w) - 5), j =>
              array_min(slice(hs, j, lit(4)))))).as("fp"))
        .count()
    }
    // B: hs materialized once per row.
    t("B-materialized-fps-count") {
      corpus.filter(size(w) >= 6)
        .withColumn("hs", hs)
        .select(col("doc_id"),
          explode(array_distinct(
            transform(sequence(lit(1), size(col("hs")) - 3), j =>
              array_min(slice(col("hs"), j, lit(4)))))).as("fp"))
        .count()
    }
    // C: full query with materialized hs, through the join.
    t("C-full-materialized") {
      val fps = corpus.filter(size(w) >= 6)
        .withColumn("hs", hs)
        .select(col("doc_id"),
          explode(array_distinct(
            transform(sequence(lit(1), size(col("hs")) - 3), j =>
              array_min(slice(col("hs"), j, lit(4)))))).as("fp"))
        .withColumn("df",
          count(lit(1)).over(Window.partitionBy(col("fp"))))
        .filter(col("df") <= 50)
        .persist()
      val a = fps.select(col("doc_id").as("da"), col("fp"))
      val b = fps.select(col("doc_id").as("db"), col("fp"))
      val n = a.join(b.hint("shuffle_hash"), Seq("fp"))
        .filter(col("da") < col("db"))
        .groupBy(col("da"), col("db")).agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 2)
        .count()
      fps.unpersist(blocking = false)
      System.err.println(s"[profwin] pairs: $n")
    }
  }
}
