package graft

import org.apache.spark.sql.functions._

/** Error-band / soundness asserts for the four rows-only query families
  * where hash parity with DuckDB is impossible BY NATURE (Spark-internal
  * sketch encodings and spark.ml hash tables, not arithmetic choices).
  * The driver contract permits rows-only checks there; these tests close
  * the remaining gap by pinning each sketch's output to the exact
  * sibling computation inside the same JVM:
  *   - q24:  HLL++ per-group estimates land within a 10% band of exact
  *           distincts (rsd is configured at 2%; 10% allows fixture-size
  *           variance without ever letting a broken sketch through).
  *   - q126: the in-result merge_equals_global invariant holds, and the
  *           merged estimate stays within 15% of the exact distinct the
  *           query itself carries.
  *   - q193: the in-result within_tol (inclusion-exclusion overlap vs
  *           exact semi-join overlap, 10%) holds.
  *   - q83:  BRP-LSH is SOUND (every returned pair is a true ≤-radius
  *           pair at exact euclidean distance — LSH only prunes
  *           candidates, so a false positive means broken plumbing) and
  *           USEFUL (recall ≥ 0.5 of q44-style brute-force truth; 3
  *           OR-ed hash tables at bucketLength 2.0 comfortably clear
  *           this on the fixture).
  */
class SketchInvariantSpec extends SparkSuite {

  test("q24 HLL estimates sit within 10% of exact per-group distincts") {
    val approx = SparkEntry.queries("q24_agg_approx_distinct")(spark, sfDir)
      .select(col("l_linestatus"), col("approx_orders")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_linestatus"))
      .agg(countDistinct(col("l_orderkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    for ((k, ex) <- exact) {
      val ap = approx(k)
      assert(math.abs(ap - ex) <= 0.10 * ex,
        s"group $k: approx $ap vs exact $ex exceeds 10% band")
    }
  }

  test("q126 mergeability invariant holds and estimate tracks exact") {
    val r = SparkEntry.queries("q126_hll_mergeable")(spark, sfDir).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Boolean]("merge_equals_global"),
      "per-shard HLL union estimate != global-sketch estimate")
    val merged = row.getAs[Long]("merged_estimate")
    val exact = row.getAs[Long]("exact_distinct")
    assert(math.abs(merged - exact) <= 0.15 * exact,
      s"merged estimate $merged vs exact $exact exceeds 15% band")
  }

  test("q193 inclusion-exclusion overlap estimate is within tolerance") {
    val r = SparkEntry.queries("q193_hll_overlap")(spark, sfDir).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Boolean]("within_tol"),
      s"sketched overlap outside 10% of exact: ${r.head}")
  }

  test("q83 BRP-LSH pairs are sound (all true pairs) with recall >= 0.5") {
    val got = SparkEntry.queries("q83_ml_brp_lsh")(spark, sfDir)
      .select(col("qid"), col("nid"), col("dist")).collect()
    assert(got.nonEmpty, "LSH join returned nothing")
    // Soundness: dist is the exact euclidean distance and must be within
    // the query radius for every emitted pair.
    got.foreach { r =>
      assert(r.getDouble(2) <= 1.2 + 1e-9,
        s"pair outside radius: $r")
    }
    // Recall vs brute-force truth on the same query set.
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = e.select(col("vec_id").as("nid"), col("embedding").as("ce"))
    val truth = broadcast(q).join(c, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        sqrt(aggregate(zip_with(col("qe"), col("ce"),
          (x, y) => (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))),
          lit(0.0), (acc, v) => acc + v)).as("dist"))
      .filter(col("dist") <= 1.2)
      .select(col("qid"), col("nid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotPairs = got.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotPairs.subsetOf(truth),
      s"LSH emitted non-true pairs: ${(gotPairs -- truth).take(5)}")
    assert(truth.nonEmpty, "degenerate fixture: no true pairs in radius")
    val recall = gotPairs.size.toDouble / truth.size
    assert(recall >= 0.5, s"recall $recall < 0.5 (${gotPairs.size}/${truth.size})")
  }

  // q273's scaladoc names the production swap for its uniqueness
  // constraint at 100 TB: replace COUNT(DISTINCT key) with the HLL
  // sketch. The swap is only safe if the sketch's estimate stays inside
  // a band tight enough that |n_rows − approx_distinct| over a unique
  // key column cannot cross the constraint threshold spuriously — pin
  // that band here (orderkey IS unique in the fixture, so exact
  // distinct = row count and the sketch must land within 10%).
  test("q273 uniqueness HLL swap: approx distinct within 10% of exact") {
    val o = Tables.orders(spark, sfDir)
    val r = o.agg(
      count(lit(1)).as("n"),
      approx_count_distinct(col("o_orderkey"), 0.02).as("ad"),
      countDistinct(col("o_orderkey")).as("d")).head()
    val (n, ad, d) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(n == d, "fixture contract: o_orderkey unique")
    assert(math.abs(ad - d) <= 0.10 * d,
      s"HLL estimate $ad vs exact $d exceeds 10% band")
  }
}
