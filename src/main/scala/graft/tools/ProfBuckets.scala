package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r14 probe: simhash band-bucket size distribution for the q78/q84
  * candidate corpora — picks the hot-bucket cap (must exceed every
  * fixture bucket so the sub-split is provably inactive there). */
object ProfBuckets {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    args.foreach { d =>
      Seq(40, 24).foreach { hl =>
        val base = graft.Tables.documents(s, d)
          .select(col("doc_id"), substring(col("text"), 1, hl).as("head"))
        val corpus = base.unionByName(
          base.filter(col("doc_id") % 10 === 0)
            .select((col("doc_id") + 10000).as("doc_id"), col("head")))
        val banded = graft.queries.Dedup.simhashBanded(
          graft.queries.Dedup.simhashFp(corpus, "head", width = 64),
          bands = 4, bits = 16)
        val st = banded.groupBy(col("b"), col("bandval"))
          .agg(count(lit(1)).as("c"))
          .agg(max(col("c")).as("mx"),
            sum(col("c") * col("c")).as("pairvol"),
            count(lit(1)).as("nbuckets")).head()
        System.err.println(s"[profbuckets] $d head=$hl maxBucket=${st.getLong(0)} " +
          s"sumC2=${st.getLong(1)} nBuckets=${st.getLong(2)}")
      }
    }
    s.stop()
  }
}
