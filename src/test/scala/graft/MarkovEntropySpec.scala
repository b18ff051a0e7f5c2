package graft

import org.apache.spark.sql.Row

/** q315 Markov predictor eval + q316 char-bigram entropy — JVM
  * replicas at sf0.001 plus the properties each metric carries (the
  * argmax beats or ties the majority baseline ON THE TRAINING SET by
  * construction; normalized entropy lives in (0, 1]).
  */
class MarkovEntropySpec extends SparkSuite {

  test("q315 replica: train/test accuracy of the argmax predictor") {
    val trans = Tables.events(spark, sfDir)
      .selectExpr("user_id", "ts", "event_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
      .groupBy(_._1).toSeq.flatMap { case (uid, xs) =>
        val o = xs.sortBy(x => (x._2, x._3)).map(_._4)
        o.sliding(2).collect { case Array(p, t) => (uid, p, t) }
      }
    val train = trans.filter(_._1 % 2 == 0)
    val tc = train.groupBy(x => (x._2, x._3)).view
      .mapValues(_.size.toLong).toMap
    val pred = tc.keys.map(_._1).toSeq.distinct.map { p =>
      val row = tc.filter(_._1._1 == p)
      val cmax = row.values.max
      p -> row.filter(_._2 == cmax).keys.map(_._2).min
    }.toMap
    val basePred = train.groupBy(_._3).toSeq
      .map { case (t, xs) => (t, xs.size) }
      .sortBy { case (t, c) => (-c, t) }.head._1
    val evalT = trans.filter(_._1 % 2 != 0).filter(x => pred.contains(x._2))
    val exp = evalT.groupBy(_._2).toSeq.sortBy(_._1).map { case (p, xs) =>
      (p, pred(p), xs.length.toLong,
        xs.count(_._3 == pred(p)).toLong,
        xs.count(_._3 == basePred).toLong)
    }
    val got = SparkEntry.queries("q315_markov_eval")(spark, sfDir)
      .collect()
    assert(got.length == exp.length)
    got.zip(exp).foreach { case (Row(p: String, pr: String, n: Long,
        nc: Long, acc: Double, bacc: Double), (ep, epr, en, enc, enb)) =>
      assert(p == ep && pr == epr && n == en && nc == enc)
      assert(acc == math.floor(enc.toDouble / en * 1e9) / 1e9)
      assert(bacc == math.floor(enb.toDouble / en * 1e9) / 1e9)
    }
    // On the TRAINING transitions the per-prior argmax cannot lose to
    // any single fixed guess — the property that defines it.
    val trainByPrev = train.groupBy(_._2)
    trainByPrev.foreach { case (p, xs) =>
      val hitArg = xs.count(_._3 == pred(p))
      val hitBase = xs.count(_._3 == basePred)
      assert(hitArg >= hitBase, s"argmax lost on training prior '$p'")
    }
  }

  test("q316 replica: per-source bigram entropy, bounded alphabet") {
    val exp = Tables.documents(spark, sfDir).select("source", "text")
      .collect().flatMap { r =>
        val t = r.getString(1)
        (0 until t.length - 1).map(i =>
          (r.getString(0), t.substring(i, i + 2)))
      }.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, xs) =>
        val cs = xs.groupBy(_._2).toSeq.sortBy(_._1)
          .map(_._2.length.toLong)
        val n = cs.sum
        val h = -cs.map { c =>
          val p = c.toDouble / n; p * math.log(p) }.sum
        (src, n, cs.length.toLong, math.floor(h * 1e9) / 1e9,
          math.floor(h / math.log(cs.length.toDouble) * 1e9) / 1e9)
      }
    val got = SparkEntry.queries("q316_char_entropy")(spark, sfDir)
      .collect().map { case Row(s: String, n: Long, v: Long, h: Double,
        nh: Double) => (s, n, v, h, nh) }
    assert(got.toSeq == exp.toSeq)
    got.foreach { case (_, _, v, h, nh) =>
      // Bounded alphabet: [a-z ]² on this fixture.
      assert(v <= 729L)
      assert(h >= 0.0 && nh > 0.0 && nh <= 1.0 + 1e-9)
    }
  }
}
