package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a native
  * `TypedImperativeAggregate` — top terms at 100-TB scale in ONE pass
  * with bounded memory. The partial-aggregation contract is the whole
  * point: each task folds its rows into a ≤ k-entry sketch, and the
  * shuffle moves ONE serialized sketch per partition per group instead
  * of a (group, term) row per distinct term — the sketches then merge
  * by the Agarwal et al. "Mergeable Summaries" (PODS'12) reduction,
  * which preserves the deterministic error bound: every estimate
  * undercounts its true frequency by at most N/(k+1). With k ≥ the
  * number of distinct values the sketch never evicts and the counts
  * are EXACT regardless of partitioning — the config the oracle query
  * checks bit-for-bit; the approximation regime is spec-tested.
  *
  * Evaluates to array<struct<term,cnt>> ordered by (cnt desc, term) —
  * deterministic whenever counts are (they are in the exact regime).
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(k > 0, "heavy_hitters k must be positive")

  override def inputTypes: Seq[bridge.SqlAbstractDataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType), StructField("cnt", LongType))))

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  /** Classic MG update: known key increments; a miss with a full
    * sketch decrements every counter (dropping zeros) — the shared
    * "pay one from everyone" step that caps the undercount at
    * N/(k+1).
    */
  private def add(buf: mutable.HashMap[String, Long], term: String,
                  by: Long): Unit = {
    buf.get(term) match {
      case Some(c) => buf.update(term, c + by)
      case None if buf.size < k => buf.update(term, by)
      case None =>
        // decrement all by min(by, smallest counter chain): for the
        // row-at-a-time path by = 1, the textbook step
        var dec = by
        while (dec > 0 && !buf.contains(term)) {
          val step = math.min(dec, buf.valuesIterator.min)
          buf.mapValuesInPlace((_, c) => c - step)
          buf.filterInPlace((_, c) => c > 0)
          dec -= step
          if (buf.size < k && dec > 0) { buf.update(term, dec); dec = 0 }
        }
    }
  }

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.toString, 1L)
    buf
  }

  /** Mergeable-summaries reduction: sum counts, then if > k entries
    * subtract the (k+1)-th largest count from everything and drop the
    * non-positive remainder.
    */
  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (t, c) => buf.update(t, buf.getOrElse(t, 0L) + c) }
    if (buf.size > k) {
      val kth = buf.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      buf.mapValuesInPlace((_, c) => c - kth)
      buf.filterInPlace((_, c) => c > 0)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) => out.writeUTF(t); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ => val t = in.readUTF(); buf.update(t, in.readLong()) }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

object MisraGries {
  /** `heavy_hitters(c, k)` as an aggregate Column. */
  def heavy_hitters(c: Column, k: Int): Column =
    bridge.toColumn(MisraGries(bridge.toExpression(c), k).toAggregateExpression())

  /** Validated SQL-registration builder: `heavy_hitters(col, k)` needs
    * exactly two arguments and a foldable integral k — anything else
    * fails analysis with a readable message instead of an
    * IndexOutOfBounds/ClassCast from inside the planner.
    */
  def fromExprs(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2)
      bridge.analysisError(
        s"heavy_hitters(col, k) takes exactly 2 arguments, got ${exprs.length}")
    if (!exprs(1).foldable)
      bridge.analysisError("heavy_hitters k must be a literal integer")
    exprs(1).eval() match {
      case n: Number => MisraGries(exprs.head, n.intValue).toAggregateExpression()
      case other => bridge.analysisError(
        s"heavy_hitters k must be a literal integer, got: $other")
    }
  }
}
