package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bin-based RANGE JOIN: `probe.v BETWEEN build.lo AND build.hi` executed
  * as an EQUI-join on a bin key plus a residual filter.
  *
  * Spark plans a pure inequality join as BroadcastNestedLoopJoin (or a
  * cartesian product when neither side broadcasts) — O(|probe|·|build|)
  * comparisons, the shape that dies first at scale. Binning is the
  * standard public fix: intervals are exploded onto every bin of width
  * `binWidth` they overlap, probe rows carry their single bin, and the
  * join becomes a shuffled equi-join on the bin key with the exact
  * BETWEEN as a residual — O(matches + bin collisions) comparisons, both
  * sides hash-partitioned and spillable.
  *
  * Correctness: a (probe, interval) pair can only meet in the probe
  * row's unique bin, so no post-join dedup is needed. Pick `binWidth`
  * near the typical interval span: each interval then lands in ≤2 bins
  * (fan-out ≤ span/binWidth + 1), and a hot bin is ordinary equi-join
  * skew — AQE's skew-join splitting applies, unlike a nested loop.
  *
  * Contract: `v`/`lo`/`hi` must reference distinct column names of the
  * two inputs (both frames' columns are in scope after the join).
  */
object RangeJoin {
  def binned(probe: DataFrame, build: DataFrame,
      v: Column, lo: Column, hi: Column, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val pb = probe.withColumn("__bin", floor(v / binWidth).cast("long"))
    val bb = build.withColumn("__bin",
      explode(sequence(floor(lo / binWidth).cast("long"),
        floor(hi / binWidth).cast("long"))))
    pb.join(bb, Seq("__bin")).filter(v >= lo && v <= hi).drop("__bin")
  }
}
