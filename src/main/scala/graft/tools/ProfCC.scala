package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch scale-profiler for operators.ConnectedComponents (not part
  * of the product surface; PLANS.md r12 records its numbers). Two
  * adversarial shapes well beyond fixture size:
  *   - a 10,001-node PATH with ids scrambled relative to chain position
  *     (worst case for min-label propagation: the r11 scheme needed
  *     O(n) iterations here; large-star/small-star is O(log² n) rounds)
  *   - a 100k-node / 300k-edge random graph (supercritical — one giant
  *     component plus fragments, the near-dup-clustering regime)
  * Verifies label correctness against a driver-side union-find.
  */
object ProfCC {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._

    def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.map(k => k -> find(k)).toMap
    }

    def drive(name: String, edges: Seq[(Long, Long)]): Unit = {
      val df = edges.toDF("a", "b").repartition(32)
      val t0 = System.nanoTime()
      val cc = graft.operators.ConnectedComponents
        .run(df, strict = true, verbose = true)
      val got = cc.as[(Long, Long)].collect().toMap
      val secs = (System.nanoTime() - t0) / 1e9
      val want = unionFind(edges)
      val ok = got == want
      System.err.println(f"[profcc] $name: nodes=${want.size} " +
        f"comps=${want.values.toSet.size} wall=$secs%.1f s correct=$ok")
      if (!ok) sys.error(s"$name: labels diverge from union-find")
    }

    // path with position-scrambled ids: node i <-> multiplicative shuffle
    val n = 10000L
    val scramble = (i: Long) => (i * 7919L) % (n + 1)
    drive("path-10k-scrambled",
      (0L until n).map(i => (scramble(i), scramble(i + 1))))

    val rng = new scala.util.Random(97)
    drive("random-100k-300k",
      Seq.fill(300000)((rng.nextInt(100000).toLong,
        rng.nextInt(100000).toLong)).filter { case (a, b) => a != b })

    s.stop()
  }
}
