package graft

import org.apache.spark.sql.Row

/** q284 preference pairs — JVM replica of the composite-key argmax:
  * chosen = (max score, then max doc_id), rejected = (min score, then
  * min doc_id) — the tie semantics the packed BIGINT encodes, checked
  * per source against a driver-side recompute, plus the pair sanity
  * invariants (chosen ≠ rejected wherever the group has ≥ 2 docs and a
  * positive margin; margin = score difference).
  */
class PreferencePairSpec extends SparkSuite {

  test("q284 replica and pair invariants") {
    // distinct-token count INCLUDING empty tokens (split keeps them —
    // the replica mirrors array_distinct(split(...)) exactly).
    val fixed = Tables.documents(spark, sfDir)
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getString(2).split(" ", -1).distinct.length.toLong))
    val want = fixed.groupBy(_._1).map { case (src, rows) =>
      val chosen = rows.maxBy(r => (r._3, r._2))
      val rejected = rows.minBy(r => (r._3, r._2))
      (src, (rows.length.toLong, chosen._2, chosen._3,
        rejected._2, rejected._3, chosen._3 - rejected._3))
    }
    val got = SparkEntry.queries("q284_preference_pairs")(spark, sfDir)
      .collect().map { case Row(s: String, n: Long, cd: Long, cs: Long,
        rd: Long, rs: Long, m: Long) => (s, (n, cd, cs, rd, rs, m)) }.toMap
    assert(got == want)
    got.values.foreach { case (n, cd, _, rd, _, m) =>
      assert(m >= 0)
      if (n > 1 && m > 0) assert(cd != rd)
    }
  }
}
