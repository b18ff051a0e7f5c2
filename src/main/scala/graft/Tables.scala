package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the fixture tables (see /root/repo/FIXTURES.md).
  *
  * All loads are plain parquet scans: Catalyst performs column pruning and
  * predicate/partition pushdown into the vectorized reader automatically,
  * which is what lets identical code run from the 6k-row sf0.001 fixture to
  * a 100 TB lake — task parallelism follows input splits
  * (`spark.sql.files.maxPartitionBytes`), not anything hard-coded here.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Fan a freshly-scanned frame out to the session's core count ONLY when
    * the scan itself yields materially fewer splits than cores.
    *
    * Why conditional: the round-robin repartition exists for the one-file
    * test fixture (a single parquet split runs every downstream per-row
    * stage on one core — round-1 bench: q53 11 s, q54 23 s), but
    * `repartition(n)` ALWAYS shuffles every row regardless of input split
    * count, so baking it in unconditionally would add a full extra pass
    * over the corpus to every text-pipeline plan at the 100 TB design
    * point. The split count comes from the planned scan:
    * `rdd.getNumPartitions` resolves FilePartition packing (under
    * `spark.sql.files.maxPartitionBytes` / `openCostInBytes`) at PLANNING
    * time — no job runs, and the probed plan shares the scan's FileIndex
    * so the file listing is not repeated. On any input whose scan already
    * yields >= half the cores the helper is the identity and the plan
    * stays Exchange-free (pinned by PlanEvidenceSpec).
    */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 >= target) df else df.repartition(target)
  }

  /** `events.parquet` stores `ts` as INT64 TIMESTAMP(NANOS), which Spark 4
    * rejects by default (`PARQUET_TYPE_ILLEGAL`). With the legacy conf the
    * column reads as nanoseconds-since-epoch BIGINT; convert with
    * `timestamp_micros(ts div 1000)` when a real timestamp is needed.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
  }
}
