package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.GenerateExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

/** The q332 sf100 lesson as a failing check (r18, the q50-receipt-hunt
  * discipline): A-priori levels must be GENERATED per basket row from
  * the shared sorted-array frame, never SELF-JOINED on the basket key —
  * the join form sort-merge-joined two 600M-row sides for 223.7 s at
  * the sf100 receipt to keep two surviving pairs
  * (`tmp/r18/prof332.log`). These tests pin the shape: no equi-join in
  * any basket-mining plan may be keyed on the basket id, pair/triple
  * generation must appear as Generate (explode) nodes, and a negative
  * control reconstructs the removed anti-shape to prove the detector
  * sees it.
  */
class BasketPlanSpec extends SparkSuite {

  /** Number of equi-join operators keyed on an attribute named `o`
    * (the basket id) in df's physical plan. AQE is switched off for
    * the planning so the join tree is statically visible. */
  private def basketKeyJoins(df: => DataFrame): Int = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def keyedOnO(keys: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Boolean =
        keys.exists(_.references.exists(_.name == "o"))
      df.queryExecution.executedPlan.collect {
        case j: SortMergeJoinExec if keyedOnO(j.leftKeys ++ j.rightKeys) => 1
        case j: ShuffledHashJoinExec if keyedOnO(j.leftKeys ++ j.rightKeys) => 1
        case j: BroadcastHashJoinExec if keyedOnO(j.leftKeys ++ j.rightKeys) => 1
      }.sum
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def generates(df: => DataFrame): Int = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try df.queryExecution.executedPlan.collect {
      case g: GenerateExec => g
    }.size
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  for (q <- Seq("q190_frequent_pairs", "q226_frequent_triples",
      "q230_assoc_rules", "q332_frequent_triples_relative")) {
    test(s"$q never joins on the basket key and generates its levels") {
      val df = SparkEntry.queries(q)(spark, sfDir)
      assert(basketKeyJoins(df) == 0,
        s"$q plans a basket-key self-join — the shape the r18 rewrite " +
          "removed is back")
      // q230 consumes the memoized pair frame (its generation happened
      // at build time behind the checkpoint); the others generate
      // their own levels in-plan.
      if (q != "q230_assoc_rules")
        assert(generates(df) >= 1, s"$q has no Generate node — levels " +
          "are not per-row generated")
    }
  }

  test("q332's prunes survive with auto-broadcast disabled (explicit hints)") {
    // The production form's f1/l2/count prunes are EXPLICIT broadcasts
    // (scale-stable by the relative threshold), so even with the
    // planner's size-based broadcasting off, no basket-key join and no
    // basket-sized shuffle may appear.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SparkEntry.queries("q332_frequent_triples_relative")(
        spark, sfDir)
      assert(basketKeyJoins(df) == 0)
      assert(df.collect().nonEmpty)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("the basket checkpoint is SERIALIZED (the sf100 OOM class)") {
    // The deserialized localCheckpoint unroll OOM'd a 48 GB heap at
    // sf100 (putIteratorAsValues holds ~80 B of objects per 24 B row
    // ahead of the store's accounting) — invisible at fixture scale,
    // so the storage level is pinned here: a refactor that drops the
    // MEMORY_AND_DISK_SER argument fails this test, not a receipt run.
    val ba = graft.queries.Extras.basketArrays(spark, sfDir)
    val levels = ba.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.getStorageLevel
    }
    assert(levels.nonEmpty, "basketArrays is not a checkpointed frame")
    levels.foreach { lvl =>
      assert(!lvl.deserialized && lvl.useDisk,
        s"basket checkpoint level is $lvl — must be serialized with a " +
          "disk tier (MEMORY_AND_DISK_SER) or the sf100 unroll OOMs")
    }
  }

  test("negative control: the removed self-join shape IS detected") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val op = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val pairs = op.select(col("o"), col("p").as("pa")).as("a")
        .join(op.select(col("o").as("o2"), col("p").as("pb")).as("b"),
          col("o") === col("o2") && col("pa") < col("pb"))
        .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("s2"))
      assert(basketKeyJoins(pairs) >= 1,
        "detector failed to see a basket-key self-join")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
