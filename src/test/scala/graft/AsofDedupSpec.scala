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

  test("as-of forward+tolerance (q89) matches a naive per-row scan") {
    import spark.implicits._
    val tolUs = 15L * 60 * 1000000
    val got = SparkEntry.queries("q89_asof_forward_tolerance")(spark, sfDir)
      .as[(Long, Long, Option[Long])].collect()
      .map { case (p, _, v) => p -> v }.toMap

    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), expr("ts div 1000").as("us"))
      .as[(Long, Long, String, Long)].collect()
    val views = ev.filter(_._3 == "view")
    val want = ev.filter(_._3 == "purchase").map { case (pid, user, _, pus) =>
      val cand = views.filter(v => v._2 == user && v._4 >= pus && v._4 - pus <= tolUs)
      pid -> (if (cand.isEmpty) None
              else Some(cand.minBy(v => (v._4, v._1))._1))
    }.toMap
    assert(got == want)
  }

  test("as-of backward+tolerance (q106) matches a naive per-row scan") {
    import spark.implicits._
    val tolUs = 15L * 60 * 1000000
    val got = SparkEntry.queries("q106_asof_backward_tolerance")(spark, sfDir)
      .as[(Long, Long, Option[Long])].collect()
      .map { case (p, _, v) => p -> v }.toMap

    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), expr("ts div 1000").as("us"))
      .as[(Long, Long, String, Long)].collect()
    val views = ev.filter(_._3 == "view")
    val want = ev.filter(_._3 == "purchase").map { case (pid, user, _, pus) =>
      val cand = views.filter(v => v._2 == user && v._4 <= pus && pus - v._4 <= tolUs)
      pid -> (if (cand.isEmpty) None
              else Some(cand.maxBy(v => (v._4, v._1))._1))
    }.toMap
    assert(got == want)
    // the tolerance must actually bite on the fixture: some purchase has
    // a prior view but none within 15 min
    val anyPrior = ev.filter(_._3 == "purchase").exists { case (pid, user, _, pus) =>
      want(pid).isEmpty && views.exists(v => v._2 == user && v._4 <= pus)
    }
    assert(anyPrior, "fixture exercises no out-of-tolerance backward match")
  }

  test("as-of nearest (q90) matches a naive per-row scan, backward wins ties") {
    import spark.implicits._
    val got = SparkEntry.queries("q90_asof_nearest")(spark, sfDir)
      .as[(Long, Long, Option[Long])].collect()
      .map { case (p, _, v) => p -> v }.toMap

    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), expr("ts div 1000").as("us"))
      .as[(Long, Long, String, Long)].collect()
    val views = ev.filter(_._3 == "view")
    val want = ev.filter(_._3 == "purchase").map { case (pid, user, _, pus) =>
      val cand = views.filter(_._2 == user)
      pid -> (if (cand.isEmpty) None
              else {
                // order: distance, then backward side first, then latest
                // event_id on the backward side / earliest on the forward
                val best = cand.minBy { v =>
                  val fwd = v._4 > pus
                  ((v._4 - pus).abs, fwd, if (fwd) v._1 else -v._1)
                }
                Some(best._1)
              })
    }.toMap
    assert(got == want)
  }

  test("edit-distance candidates (q78) contain every duplicated head pair") {
    import spark.implicits._
    // Every doubled doc (doc_id % 10 == 0 → doc_id + 10000) has an
    // identical 40-char head, so (id, id+10000) MUST appear with lev=0:
    // identical fingerprints share all bands, so exact dups cannot be
    // lost by banding, whatever the band geometry.
    val got = SparkEntry.queries("q78_dedup_levenshtein")(spark, sfDir)
      .as[(Long, Long, Int)].collect()
    val pairs = got.map(r => (r._1, r._2)).toSet
    val ids = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 10 === 0).select("doc_id").as[Long].collect()
    ids.foreach { id =>
      assert(pairs.contains((id, id + 10000)), s"missing exact-dup pair for $id")
    }
    assert(got.filter(r => r._2 == r._1 + 10000).forall(_._3 == 0))
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

  test("LSH ANN pairs (q57) are exact-verified and match banding theory") {
    import spark.implicits._
    val lsh = SparkEntry.queries("q57_ann_lsh_buckets")(spark, sfDir)
      .select("da", "db").as[(Long, Long)].collect().toSet

    // Brute-force ground truth: every pair with cosine >= 0.3.
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val exactScores = for {
      (ia, ea) <- vecs.toSeq; (ib, eb) <- vecs.toSeq
      c = cos(ea, eb) if ia < ib && c >= 0.3
    } yield ((ia, ib), c)
    val exact = exactScores.map(_._1).toSet

    assert(exact.nonEmpty, "fixture has no cos>=0.3 pairs")
    // precision is 1.0 by construction: every candidate is exact-reranked
    assert(lsh.subsetOf(exact))
    // Recall must MATCH sign-LSH theory, not an arbitrary floor: a pair
    // at angle θ agrees with one random plane with p = 1-θ/π, with one
    // 8-bit band with p^8, and with any of the 4 independent bands with
    // q = 1-(1-p^8)^4. The md5-derived planes behave pseudo-randomly, so
    // the observed detection count should sit near Σq. (The fixture's
    // pairs all lie at cos 0.3-0.48 where q is small — the near-dup
    // regime cos>=0.9 would give q≈0.75; that is the documented trade.)
    val qs = exactScores.map { case (_, c) =>
      val p = 1.0 - math.acos(c) / math.Pi
      1.0 - math.pow(1.0 - math.pow(p, 8), 4)
    }
    val expected = qs.sum
    val sigma = math.sqrt(qs.map(q => q * (1 - q)).sum)
    val observed = lsh.size.toDouble
    // generous 5σ+5 band: pairs share planes, so detections are not
    // fully independent — this still catches a broken banding (0 or
    // all-pairs) and any silent geometry drift by an order of magnitude.
    assert((observed - expected).abs <= 5 * sigma + 5,
      s"observed $observed vs expected $expected (sigma $sigma)")
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
