package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for q269's CC leg at sf0.1 (not part of the product
  * surface; PLANS.md r12 records its before/after traces). Unlike the
  * r11 version this calls the REAL operators.ConnectedComponents with
  * verbose per-round timing instead of an inline replica — a replica
  * can silently drift from the code it claims to measure.
  */
object Prof269 {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[prof] $name: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val eps = 0.01
    val p = graft.Tables.embeddings(s, d).select(col("vec_id"),
      element_at(col("embedding"), 1).cast("double").as("x"),
      element_at(col("embedding"), 2).cast("double").as("y"))
    val cells = p.withColumn("cx", floor(col("x") / eps))
      .withColumn("cy", floor(col("y") / eps))
    val probe = cells.select(col("vec_id").as("vb"), col("x").as("xb"),
      col("y").as("yb"), col("cx"), col("cy"))
    val build = cells
      .withColumn("ox", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("oy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("vec_id").as("va"), col("x").as("xa"), col("y").as("ya"),
        (col("cx") + col("ox")).as("cx"), (col("cy") + col("oy")).as("cy"))
    val pairs = build.join(probe, Seq("cx", "cy"))
      .filter(col("va") =!= col("vb"))
      .filter((col("xa") - col("xb")) * (col("xa") - col("xb"))
        + (col("ya") - col("yb")) * (col("ya") - col("yb")) <= lit(eps * eps))
      .select(col("va"), col("vb")).persist()
    t("pairs count")(System.err.println("pairs=" + pairs.count()))
    val core = pairs.groupBy(col("va")).agg(count(lit(1)).as("n"))
      .filter(col("n") + 1 >= 4).select(col("va").as("v")).persist()
    t("core count")(System.err.println("core=" + core.count()))
    val ce = pairs
      .join(core.select(col("v").as("va")), Seq("va"), "semi")
      .join(core.select(col("v").as("vb")), Seq("vb"), "semi")
      .select(col("va"), col("vb"))
    t("ce count")(System.err.println("ce=" + ce.count()))
    t("CC run (strict, verbose)") {
      val cc = graft.operators.ConnectedComponents
        .run(ce, strict = true, verbose = true)
      System.err.println("[prof] components=" +
        cc.agg(countDistinct(col("cluster"))).head().getLong(0) +
        " nodes=" + cc.count())
    }
    s.stop()
  }
}
