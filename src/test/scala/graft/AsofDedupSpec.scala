package graft

import org.apache.spark.sql.functions._

/** Semantics checks for the composed operators (as-of join, dedup family)
  * against naive single-node reference implementations. */
class AsofDedupSpec extends SparkSuite {

  test("as-of attribution (q39) matches a naive per-row scan") {
    import spark.implicits._
    val got = SparkEntry.queries("q39_asof_join")(spark, sfDir)
      .as[(Long, Long, Option[Long])].collect()
      .map { case (p, _, v) => p -> v }.toMap

    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), expr("ts div 1000").as("us"))
      .as[(Long, Long, String, Long)].collect()
    val views = ev.filter(_._3 == "view")
    val want = ev.filter(_._3 == "purchase").map { case (pid, user, _, pus) =>
      val cand = views.filter(v => v._2 == user && v._4 <= pus)
      pid -> (if (cand.isEmpty) None
              else Some(cand.maxBy(v => (v._4, v._1))._1))
    }.toMap
    assert(got == want)
  }

  test("minhash-LSH candidates (q48) are a subset of exact jaccard pairs (q47)") {
    import spark.implicits._
    val exact = SparkEntry.queries("q47_dedup_ngram_jaccard")(spark, sfDir)
      .select("da", "db").as[(Long, Long)].collect().toSet
    val lsh = SparkEntry.queries("q48_dedup_minhash_lsh")(spark, sfDir)
      .select("da", "db").as[(Long, Long)].collect().toSet
    assert(lsh.nonEmpty, "LSH found no near-duplicates on the fixture")
    assert(lsh.subsetOf(exact))
  }

  test("exact dedup (q46) keeps one row per distinct text") {
    val df = SparkEntry.queries("q46_dedup_exact")(spark, sfDir)
    val total = Tables.documents(spark, sfDir).count()
    assert(df.count() == total) // all fixture texts are distinct
    assert(df.filter(col("n_copies") === 2).count() == total / 10)
  }

  test("sessionize (q38) session bounds are consistent") {
    val df = SparkEntry.queries("q38_sessionize")(spark, sfDir)
    assert(df.filter(col("sess_end") < col("sess_start")).count() == 0)
    assert(df.filter(col("n_events") <= 0).count() == 0)
  }
}
