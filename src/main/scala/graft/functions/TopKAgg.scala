package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Bounded top-k-per-group aggregate — grouped top-k WITHOUT sorting
  * the group: a native `TypedImperativeAggregate` holding a ≤ k-entry
  * heap of (score, id) pairs. The window-rank formulation
  * (`row_number() OVER (PARTITION BY g ORDER BY s) <= k`) shuffles
  * and SORTS every row of every group; this aggregate's partial step
  * reduces each task's rows to k pairs BEFORE the shuffle, so the
  * exchange moves O(k · tasks · groups) pairs and nothing is ever
  * globally sorted — the shape that survives a 100-TB fact table with
  * million-row groups. Exact for any data (top-k merge is exact,
  * unlike sketches).
  *
  * Total order: score DESC, id ASC on ties — deterministic, mirrored
  * by `ORDER BY s DESC, id` in the oracle. Evaluates to
  * array<struct<score double, id long>> in rank order.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
  with ImplicitCastInputTypes with BinaryLike[Expression] {

  require(k > 0, "top_k k must be positive")

  override def left: Expression = score
  override def right: Expression = id
  override def inputTypes: Seq[bridge.SqlAbstractDataType] =
    Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))

  /** "a ranks strictly better than b": higher score first, ties to
    * the smaller id. Comparison goes through java.lang.Double.compare
    * — the IEEE-total-order Spark's own sort uses (NaN greater than
    * everything, equal to itself) — so NaN rows rank exactly where the
    * window-rank oracle puts them instead of poisoning `>` compares.
    */
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  /** Heap with the WORST pair at `head` (scala PriorityQueue is a
    * max-heap — head is the ordering's maximum, so the ordering must
    * rank "worse" higher).
    */
  private def worstFirst: Ordering[(Double, Long)] =
    (a: (Double, Long), b: (Double, Long)) =>
      if (better(a, b)) -1 else if (better(b, a)) 1 else 0

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def add(buf: mutable.PriorityQueue[(Double, Long)],
                  s: Double, i: Long): Unit = {
    if (buf.size < k) buf.enqueue((s, i))
    else if (better((s, i), buf.head)) { buf.dequeue(); buf.enqueue((s, i)) }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val sv = score.eval(input)
    val iv = id.eval(input)
    if (sv != null && iv != null)
      add(buf, sv.asInstanceOf[Double], iv.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
                     other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { case (s, i) => add(buf, s, i) }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sortWith(better)
    new GenericArrayData(sorted.map { case (s, i) => InternalRow(s, i) })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach { _ =>
      val s = in.readDouble(); val i = in.readLong(); buf.enqueue((s, i))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKAgg =
    copy(score = newLeft, id = newRight)
}

object TopKAgg {

  def top_k(score: Column, id: Column, k: Int): Column =
    bridge.toColumn(TopKAgg(bridge.toExpression(score),
      bridge.toExpression(id), k).toAggregateExpression())

  /** SQL registration with arg validation: top_k(score, id, k), k a
    * foldable integer literal.
    */
  def fromExprs(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 3)
      bridge.analysisError(
        s"top_k(score, id, k) takes exactly 3 arguments, got ${exprs.length}")
    if (!exprs(2).foldable)
      bridge.analysisError("top_k k must be a literal integer")
    exprs(2).eval() match {
      case n: Number if n.intValue > 0 =>
        TopKAgg(exprs.head, exprs(1), n.intValue).toAggregateExpression()
      case n: Number => bridge.analysisError(
        s"top_k k must be positive, got ${n.intValue}")
      case other => bridge.analysisError(
        s"top_k k must be a literal integer, got: $other")
    }
  }
}
