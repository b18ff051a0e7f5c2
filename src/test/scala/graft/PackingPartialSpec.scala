package graft

import org.apache.spark.sql.Row

/** q321 packing efficiency + q322 partial correlation — JVM replicas
  * at sf0.001 plus the regime ordering (concat never uses more bins
  * than padded) and the partial-correlation identity on constructed
  * exact cases.
  */
class PackingPartialSpec extends SparkSuite {

  test("q321 replica: both regimes from per-doc lengths; concat wins") {
    val lens = Tables.documents(spark, sfDir).select("text").collect()
      .map(_.getString(0).split(" ").length.toLong)
    val n = lens.sum
    val got = SparkEntry.queries("q321_packing_efficiency")(spark, sfDir)
      .collect()(0)
    assert(got.getLong(0) == lens.length.toLong)
    assert(got.getLong(1) == n)
    Seq(256, 512, 1024).zipWithIndex.foreach { case (ctx, i) =>
      val base = 2 + i * 4
      val concat = (n + ctx - 1) / ctx
      val padded = lens.map(l => (l + ctx - 1) / ctx).sum
      assert(got.getLong(base) == concat)
      assert(got.getLong(base + 1) == padded)
      assert(got.getLong(base + 2) == padded * ctx - n)
      assert(got.getDouble(base + 3) ==
        math.floor(n.toDouble / (padded * ctx) * 1e9) / 1e9)
      // Concatenation can never need more sequences than padding.
      assert(concat <= padded)
    }
    // Padded waste grows with ctx on multi-doc corpora (each doc's
    // tail pad grows) — the economics the audit exists to show.
    val w = Seq(256, 512, 1024).map(ctx =>
      lens.map(l => (l + ctx - 1) / ctx).sum * ctx - n)
    assert(w(0) <= w(1) && w(1) <= w(2))
  }

  test("q322: partial-correlation formula reference cases + fixture") {
    def partial(rxy: Double, rxz: Double, ryz: Double): Double =
      (rxy - rxz * ryz) /
        math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))
    // Pure confounding: x and y correlate only through z.
    assert(math.abs(partial(0.5 * 0.5, 0.5, 0.5) - 0.0) < 1e-12)
    // No confounder involvement: partial equals raw.
    assert(partial(0.7, 0.0, 0.0) == 0.7)
    val Row(n: Long, raw: Double, rxz: Double, ryz: Double, p: Double) =
      SparkEntry.queries("q322_partial_correlation")(spark, sfDir)
        .collect()(0)
    assert(n == Tables.documents(spark, sfDir).count())
    // The output respects its own formula at fpTrunc grain (recompute
    // from the truncated components — equality within the grain each
    // truncation can shift).
    assert(math.abs(p - partial(raw, rxz, ryz)) < 1e-6)
    Seq(raw, rxz, ryz, p).foreach(r => assert(r >= -1.0 && r <= 1.0))
  }
}
