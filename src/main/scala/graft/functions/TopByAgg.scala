package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Bounded per-group top-k aggregate: `top_by(score, id, k)` returns the
  * k highest-scoring `(cs DOUBLE, cid BIGINT)` entries of the group,
  * ordered (cs desc, cid asc) — the total order every ranked shortlist
  * in this library uses, so ties are deterministic.
  *
  * Why a native `TypedImperativeAggregate` (SURVEY.md §2.10 ladder —
  * built-ins genuinely can't express this): the window formulation
  * (`row_number().over(partitionBy(g).orderBy(cs.desc, cid)) <= k`)
  * must SHUFFLE every candidate row to its group's reducer before
  * ranking — for an N×K assignment frame (every vector scored against
  * every IVF centroid) that is an N·K-row exchange, the exact
  * shuffle-spill class the r16 sf100 q50 receipt measured (~28×/decade
  * past the heap). `collect_list` + sort caps nothing: its partial
  * buffers hold all K entries per group. This aggregate's buffer is k
  * entries AT MOST at every stage, so hash aggregation collapses the
  * N·K rows to N map-side partials and the exchange carries N small
  * rows — the aggregation analogue of TakeOrderedAndProject.
  *
  * k must be a foldable non-negative INT literal (it shapes the buffer,
  * not the data). Null scores/ids are skipped, like every builtin agg.
  */
case class TopByAgg(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  override def prettyName: String = "top_by"
  override def children: Seq[Expression] = Seq(score, id, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("cs", DoubleType, nullable = false),
      StructField("cid", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a DOUBLE score, got ${score.dataType.catalogString}")
    else if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a BIGINT id, got ${id.dataType.catalogString}")
    else if (kExpr.dataType != IntegerType || !kExpr.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a foldable INT k, got ${kExpr.sql}")
    else if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects k >= 1, got $k")
    else TypeCheckResult.TypeCheckSuccess
  }

  private lazy val k: Int = kExpr.eval() match {
    case i: Int => i
    case null   => -1
    case other  => other.toString.toInt
  }

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] =
    ArrayBuffer.empty

  /** (cs desc, cid asc): a beats b iff higher score, or equal score and
    * lower id. */
  private def beats(aCs: Double, aCid: Long, bCs: Double, bCid: Long): Boolean =
    aCs > bCs || (aCs == bCs && aCid < bCid)

  private def insert(buf: ArrayBuffer[(Double, Long)], cs: Double,
      cid: Long): Unit = {
    if (buf.size >= k) {
      val last = buf(buf.size - 1)
      if (!beats(cs, cid, last._1, last._2)) return
      buf.remove(buf.size - 1)
    }
    // Linear insertion keeps the buffer sorted best-first; k is a small
    // dial (nprobe-sized), so this is cheaper than any tree for real k.
    var i = 0
    while (i < buf.size && beats(buf(i)._1, buf(i)._2, cs, cid)) i += 1
    buf.insert(i, (cs, cid))
  }

  override def update(buf: ArrayBuffer[(Double, Long)],
      input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      insert(buf, s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: ArrayBuffer[(Double, Long)],
      other: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    other.foreach { case (cs, cid) => insert(buf, cs, cid) }
    buf
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any =
    new GenericArrayData(buf.map { case (cs, cid) =>
      new GenericInternalRow(Array[Any](cs, cid)): Any
    }.toArray)

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (cs, cid) => bb.putDouble(cs); bb.putLong(cid) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[(Double, Long)](n)
    var i = 0
    while (i < n) { buf += ((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopByAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopByAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopByAgg =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
}

object TopByAgg {
  /** Column-API entry point (requires [[register]] on the session once):
    * `topBy($"cs", $"cid", 4)` inside an `agg(...)`. */
  def topBy(score: Column, id: Column, k: Int): Column =
    call_function("top_by", score, id,
      org.apache.spark.sql.functions.lit(k))

  /** Register `top_by` for SQL/Column callers on an existing session. */
  def register(spark: SparkSession): Unit = {
    val info = new ExpressionInfo(classOf[TopByAgg].getName, "top_by")
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("top_by"),
      info,
      (children: Seq[Expression]) =>
        FunctionArity.three("top_by", children)(TopByAgg(_, _, _)))
  }
}
