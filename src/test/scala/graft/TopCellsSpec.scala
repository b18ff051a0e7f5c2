package graft

import org.apache.spark.sql.functions._

import scala.util.Random

/** functions/TopCells — the fused IVF cell-ranking expression behind the
  * scaled probe map (Scale.ivfProbeMap). Pins:
  *  1. replica parity: top-k ids == a naive JVM replica computing the
  *     identical cosine fold over random data (cs desc, cid asc order);
  *  2. eval/codegen agreement: the interpreted path (forced through a
  *     non-codegen context) matches the generated loop bit-for-bit;
  *  3. tie + edge semantics: equal scores break on cid; k larger than
  *     K returns all cells; mismatched matrix length fails loudly;
  *  4. arity: wrong argument count is a clean analysis error.
  */
class TopCellsSpec extends SparkSuite {

  private def naive(emb: Array[Float], cids: Array[Long],
      ces: Array[Float], k: Int): Seq[Long] = {
    val dims = emb.length
    cids.indices.map { ci =>
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < dims) {
        val x = emb(i).toDouble; val y = ces(ci * dims + i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      (dot / (math.sqrt(na) * math.sqrt(nb)), cids(ci))
    }.sortBy { case (cs, cid) => (-cs, cid) }.take(k).map(_._2)
  }

  test("top_cells == naive JVM replica on random data, both exec paths") {
    graft.functions.TopCells.register(spark)
    import spark.implicits._
    // Codegen failures normally fall back to interpreted SILENTLY — the
    // r17 profile caught exactly that (a stripMargin-corrupted '||'
    // line cost ~30x). Disable the fallback so a codegen regression
    // FAILS this spec instead of just slowing the decades down. The
    // checkpoint input is load-bearing: a local Seq scan never enters
    // WholeStageCodegen, and the bug only compiled wrong THERE.
    val prevFb = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try { topCellsReplicaCase() }
    finally spark.conf.set("spark.sql.codegen.fallback", prevFb)
  }

  private def topCellsReplicaCase(): Unit = {
    import spark.implicits._
    val rng = new Random(17)
    val dims = 16
    val K = 37
    val cids = Array.tabulate(K)(i => (i * 3 + 5).toLong)
    val ces = Array.fill(K * dims)((rng.nextDouble() * 2 - 1).toFloat)
    val rows = (0 until 200).map(i =>
      (i.toLong, Seq.fill(dims)((rng.nextDouble() * 2 - 1).toFloat)))
    val df = rows.toDF("vec_id", "embedding").localCheckpoint(true)
    val cidsL = typedlit(cids.toSeq)
    val cesL = typedlit(ces.toSeq)
    for (k <- Seq(1, 2, 4, K + 10)) {
      val got = df.select(col("vec_id"),
          graft.functions.TopCells.topCells(col("embedding"), cidsL, cesL, k)
            .as("top"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      rows.foreach { case (id, emb) =>
        val want = naive(emb.toArray, cids, ces, k)
        assert(got(id) == want, s"k=$k vec $id: ${got(id)} vs $want")
      }
      // interpreted path: the same expression evaluated row-by-row
      // outside codegen (filter on a scalar predicate over the result
      // forces eval in the interpreted Predicate when codegen is off).
      val prevWsc = spark.conf.get("spark.sql.codegen.wholeStage")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      try {
        val interp = df.select(col("vec_id"),
            graft.functions.TopCells.topCells(col("embedding"), cidsL, cesL, k)
              .as("top"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
        assert(interp == got, s"k=$k: interpreted != codegen")
      } finally {
        spark.conf.set("spark.sql.codegen.wholeStage", prevWsc)
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    }
  }

  test("ties break on cid; duplicate centroids rank deterministically") {
    graft.functions.TopCells.register(spark)
    import spark.implicits._
    val df = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    // three identical centroids (same cosine) with shuffled ids
    val cidsL = typedlit(Seq(9L, 2L, 5L))
    val cesL = typedlit(Seq(1.0f, 0.0f, 1.0f, 0.0f, 1.0f, 0.0f))
    val got = df.select(graft.functions.TopCells.topCells(
      col("embedding"), cidsL, cesL, 2)).head().getSeq[Long](0)
    assert(got == Seq(2L, 5L), s"tie order: $got")
  }

  test("k <= 0 returns empty; null embedding elements contribute 0") {
    graft.functions.TopCells.register(spark)
    import spark.implicits._
    val cidsL = typedlit(Seq(9L, 2L, 5L))
    val cesL = typedlit(Seq(1.0f, 0.0f, 0.0f, 1.0f, 1.0f, 1.0f))
    val df = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    // k = 0 and k < 0 → empty array, not AIOOBE/NegativeArraySize
    // (r17 advice — SQL registration makes arbitrary k reachable).
    for (k <- Seq(0, -3)) {
      val got = df.select(graft.functions.TopCells.topCells(
        col("embedding"), cidsL, cesL, k)).head().getSeq[Long](0)
      assert(got.isEmpty, s"k=$k: $got")
    }
    // A null slot is skipped (contributes 0 to dot and the query norm),
    // and interpreted eval agrees with codegen — IntDotProduct's
    // contract. (1, null) with the null skipped scores centroid 9
    // (cos=1) above 5 (cos≈0.707) above 2 (cos=0): same as (1, 0).
    val nullDf = Seq((1L, Seq[java.lang.Float](1.0f, null)))
      .toDF("vec_id", "embedding")
    def run(frame: org.apache.spark.sql.DataFrame): Seq[Long] =
      frame.select(graft.functions.TopCells.topCells(
        col("embedding"), cidsL, cesL, 3)).head().getSeq[Long](0)
    assert(run(nullDf) == Seq(9L, 5L, 2L), s"null slot: ${run(nullDf)}")
    assert(run(nullDf.localCheckpoint(true)) == Seq(9L, 5L, 2L),
      "null slot (checkpointed/codegen path)")
  }

  test("mismatched centroid matrix fails loudly, wrong arity is clean") {
    graft.functions.TopCells.register(spark)
    import spark.implicits._
    val df = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val bad = df.select(graft.functions.TopCells.topCells(
      col("embedding"), typedlit(Seq(1L, 2L)), typedlit(Seq(1.0f)), 1))
    val ex = intercept[Exception] { bad.collect() }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).exists(c => c.getMessage != null &&
        c.getMessage.contains("centroid matrix")), s"got: $ex")
    val arity = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("top_cells", col("embedding"))).collect()
    }
    assert(arity.getCondition != null &&
      arity.getCondition.startsWith("WRONG_NUM_ARGS"))
  }

  test("literal-matrix size guard: past the 128 MB design edge it fails " +
      "with the go-hierarchical message, at the cap it passes") {
    // The guard itself is a pure size check — exercising it directly
    // avoids allocating a >128 MB boxed literal in the test JVM. Its
    // wiring into the fold is exercised by every other case here (small
    // matrices pass through it), plus the boundary values below.
    import graft.functions.TopCells.{MaxLiteralMatrixElems,
      requireLiteralMatrixFits}
    requireLiteralMatrixFits(0L)
    requireLiteralMatrixFits(MaxLiteralMatrixElems)
    val ex = intercept[IllegalArgumentException] {
      requireLiteralMatrixFits(MaxLiteralMatrixElems + 1)
    }
    assert(ex.getMessage.contains("hierarchical"), s"got: ${ex.getMessage}")
  }
}
