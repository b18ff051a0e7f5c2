package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** q280 span corruption — two legs:
  *   1. JVM replica of the union-of-intervals semantics (hash starts,
  *      merged 3-token windows, maximal-run span count) against the
  *      distributed per-source aggregates.
  *   2. the merge semantics exercised DIRECTLY on handcrafted candidate
  *      sets (the fixture's 1/20 rate rarely produces overlaps, so
  *      without this leg the merge path would be tested only by luck):
  *      overlapping and adjacent windows must fuse into one span,
  *      disjoint ones must not.
  */
class SpanCorruptionSpec extends SparkSuite {

  test("q280 replica: distributed audit equals the driver recompute") {
    val rows = Tables.documents(spark, sfDir)
      .select("source", "doc_id", "text").collect()
    val per = rows.groupBy(_.getString(0)).map { case (src, rs) =>
      var (tok, spans, masked) = (0L, 0L, 0L)
      rs.foreach { r =>
        val n = r.getString(2).split(" ", -1).length
        tok += n
        if (n >= 3) {
          val cand = (1L to (n - 2).toLong).filter(p =>
            ((BigInt(r.getLong(1)) * 4096 + p) * BigInt(2654435761L))
              .mod(BigInt(20)) == 0)
          val covered = cand.flatMap(p => p to p + 2).toSet
          masked += covered.size
          spans += covered.count(c => !covered(c - 1))
        }
      }
      (src, rs.length.toLong, tok, spans, masked,
        math.floor(masked.toDouble / tok.toDouble * 1e9) / 1e9)
    }.toVector.sortBy(_._1)
    val got = SparkEntry.queries("q280_span_corruption")(spark, sfDir)
      .collect().map { case Row(s: String, d: Long, t: Long, sp: Long,
        m: Long, r: Double) => (s, d, t, sp, m, r) }.toVector
    assert(got == per)
  }

  test("q280 merged-window semantics on handcrafted candidates") {
    import spark.implicits._
    // candidate starts → (n_spans, n_masked) under 3-token windows
    val cases = Seq(
      (Seq(2L, 3L), (1, 4)),        // overlap: [2,4]∪[3,5] = [2,5]
      (Seq(2L, 5L), (1, 6)),        // adjacent: [2,4]∪[5,7] fuses
      (Seq(2L, 6L), (2, 6)),        // gap of one: two spans
      (Seq(1L, 2L, 3L), (1, 5)),    // chain: [1,5]
      (Seq.empty[Long], (0, 0)))
    val df = cases.map(_._1).toDF("cand")
      .withColumn("covered", array_distinct(flatten(
        transform(col("cand"), p => sequence(p, p + 2)))))
      .withColumn("n_masked", size(col("covered")))
      .withColumn("n_spans", size(filter(col("covered"),
        c => !array_contains(col("covered"), c - 1))))
    val got = df.select("n_spans", "n_masked").collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(got == cases.map(_._2))
  }
}
