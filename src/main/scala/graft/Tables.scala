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

  /** `events.parquet` — the fixture's timestamp physical type has varied
    * across driver generations: INT64 TIMESTAMP(NANOS) (which Spark 4
    * rejects without the legacy conf, then reads as nanos-since-epoch
    * BIGINT) and plain TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ). Every
    * downstream query is written against ONE stable contract — `ts` is
    * BIGINT nanoseconds since epoch, `timestamp_micros(ts div 1000)`
    * recovers the instant — so this loader normalizes whichever physical
    * type the file carries to that contract. The µs→ns conversion is a
    * zero-shuffle projection (exact integer multiply; µs-precision input
    * means no information is invented), and the cast through TIMESTAMP
    * is UTC-safe because every entry point (Verify/Bench/tests) pins the
    * session timezone to UTC. DuckDB sees TIMESTAMP(µs) either way, so
    * the oracles are unaffected by the fixture generation.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw // nanos fixture
      case _ =>
        import org.apache.spark.sql.functions._
        raw.withColumn("ts",
          (unix_micros(col("ts").cast("timestamp")) * lit(1000L)))
    }
  }
}
