package graft

import java.security.MessageDigest

import org.apache.spark.sql.Row

/** q282 rendezvous resharding — two legs:
  *   1. the minimal-disruption THEOREM, checked doc-by-doc against a
  *      JVM MD5 recompute: under HRW, a doc moves on 8→9 ONLY into the
  *      new shard (argmax over 9 differs from argmax over 8 ⇒ it is 8).
  *      Mod assignment has no such property — and the same recompute
  *      certifies the query's moved counts for both schemes exactly.
  *   2. the audit bands: HRW moved fraction near 1/9, mod near 8/9 —
  *      the numbers the operator exists to surface.
  */
class ReshardSpec extends SparkSuite {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private lazy val assigns: Vector[(Long, Int, Int, Long, Long)] = {
    val ids = Tables.documents(spark, sfDir).select("doc_id")
      .collect().map(_.getLong(0)).toVector
    ids.map { id =>
      val w = (0 to 8).map(sh => md5hex(s"$sh:$id"))
      val hrw8 = w.take(8).zipWithIndex.maxBy(_._1)._2
      val hrw9 = w.zipWithIndex.maxBy(_._1)._2
      val mod8 = (BigInt(id) * BigInt(2654435761L)).mod(BigInt(8)).toLong
      val mod9 = (BigInt(id) * BigInt(2654435761L)).mod(BigInt(9)).toLong
      (id, hrw8, hrw9, mod8, mod9)
    }
  }

  private lazy val got: Vector[(String, Long, Long, Double, Long, Long)] =
    SparkEntry.queries("q282_rendezvous_shard")(spark, sfDir)
      .collect().map { case Row(s: String, n: Long, m: Long, f: Double,
        mx: Long, mn: Long) => (s, n, m, f, mx, mn) }.toVector

  test("q282 HRW moves only into the new shard; counts match the recompute") {
    assigns.foreach { case (id, h8, h9, _, _) =>
      assert(h8 == h9 || h9 == 8,
        s"doc $id moved between OLD shards under HRW: $h8 -> $h9")
    }
    val hrwMoved = assigns.count { case (_, h8, h9, _, _) => h8 != h9 }
    val modMoved = assigns.count { case (_, _, _, m8, m9) => m8 != m9 }
    val byScheme = got.map(r => (r._1, r._3)).toMap
    assert(byScheme("hrw") == hrwMoved.toLong)
    assert(byScheme("mod") == modMoved.toLong)
    assert(got.forall(_._2 == assigns.size.toLong))
  }

  test("q282 audit bands: HRW ~1/9 moved, mod ~8/9 moved") {
    val f = got.map(r => (r._1, r._4)).toMap
    assert(f("hrw") > 0.05 && f("hrw") < 0.18, s"hrw frac ${f("hrw")}")
    assert(f("mod") > 0.75, s"mod frac ${f("mod")}")
  }
}
