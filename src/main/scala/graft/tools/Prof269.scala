package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for q269's CC leg at sf0.1 (not part of the product
  * surface; kept because PLANS.md cites its numbers). Replicates the
  * ConnectedComponents loop inline with per-iteration stderr timing.
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

    // Inline CC replica with per-iteration timing.
    t("CC inline") {
      val e0 = ce.select(col("va").as("src"), col("vb").as("dst"))
      val sym = e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
      val nodes = sym.select(col("src")).distinct()
      val edges = sym.unionByName(
        nodes.select(col("src"), col("src").as("dst"))).persist()
      var labels = nodes.select(col("src").as("id"))
        .withColumn("cluster", col("id")).localCheckpoint(true)
      var prevSum = Option.empty[Long]
      var converged = false
      var iter = 0
      while (!converged && iter < 25) {
        val t0 = System.nanoTime()
        val l1 = labels.as("l").join(edges.as("e"), col("l.id") === col("e.src"))
          .select(col("e.dst").as("id"), col("l.cluster").as("cluster"))
          .groupBy(col("id")).agg(min(col("cluster")).as("cluster"))
        val l2 = (if (iter == 0) l1
          else {
            val l1c = l1.localCheckpoint(true)
            l1c.as("x").join(l1c.as("y"), col("x.cluster") === col("y.id"), "left")
              .select(col("x.id").as("id"),
                least(col("x.cluster"),
                  coalesce(col("y.cluster"), col("x.cluster"))).as("cluster"))
          })
          .localCheckpoint(true)
        val row = l2.agg(sum(col("cluster"))).first()
        val s0 = if (row.isNullAt(0)) 0L else row.getLong(0)
        converged = prevSum.contains(s0)
        prevSum = Some(s0)
        labels = l2
        System.err.println(f"[prof] iter $iter sum=$s0 " +
          f"${(System.nanoTime()-t0)/1e9}%.2f s parts=${l2.rdd.getNumPartitions}")
        iter += 1
      }
      edges.unpersist(blocking = false)
      System.err.println("[prof] converged=" + converged + " iters=" + iter)
    }
    s.stop()
  }
}
