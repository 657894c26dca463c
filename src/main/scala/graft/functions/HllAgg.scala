package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** HyperLogLog cardinality estimate as a native
  * `TypedImperativeAggregate` — the one-pass, bounded-memory shape of
  * the ES `cardinality` aggregation (HLL++-served) that the
  * reference's eland nunique maps to. Each task folds its rows into a
  * fixed 4096-byte register array; the shuffle moves ONE buffer per
  * partition per group and merge is the bytewise max — the textbook
  * mergeable sketch (Flajolet et al. 2007).
  *
  * Numerically IDENTICAL to the dataflow formulation in
  * `ops/Sketches.scala` (same md5-derived `hash60`, same exact-integer
  * register sum over denominator 2^49, same single rounded division),
  * so `hll_est(col, seed)` is DuckDB-oracle-checkable against the
  * composed groupBy form — the spec and `q_sketch_hll` assert
  * equality.
  */
case class HllAgg(
    child: Expression,
    seed: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  import graft.ops.Sketches.{HllM, HllNum, HllWBits}

  override def inputTypes: Seq[bridge.SqlAbstractDataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](HllM)

  @transient private lazy val md5 =
    java.security.MessageDigest.getInstance("MD5")

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val digest = md5.digest(s"$seed:$v".getBytes("UTF-8"))
      md5.reset()
      // first 15 hex chars = top 60 bits of the digest — the exact
      // Sampling.hash60 value (conv(substr(md5, 1, 15), 16, 10))
      var h = 0L
      var i = 0
      while (i < 8) { // 7.5 bytes; mask the low nibble of byte 7 off
        val b = digest(i) & 0xff
        h = if (i < 7) (h << 8) | b else (h << 4) | (b >> 4)
        i += 1
      }
      val bucket = (h % HllM).toInt
      val w = h / HllM
      val rho =
        if (w == 0L) HllWBits + 1
        else HllWBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < HllM) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  /** est = round(α_m·m²·2^49 / Σ 2^(49−r), 4) with empty registers
    * (r = 0) contributing 2^49 — the same exact BIGINT numerator and
    * single IEEE division as `Sketches.hllEstimate`, including its
    * small-range linear-counting branch (raw ≤ 2.5m with empty
    * registers → m·ln(m/empty)).
    */
  override def eval(buf: Array[Byte]): Any = {
    var sNum = 0L
    var empty = 0L
    var i = 0
    while (i < HllM) {
      sNum += 1L << (HllWBits + 1 - buf(i))
      if (buf(i) == 0) empty += 1
      i += 1
    }
    val raw = HllNum / sNum.toDouble
    val est =
      if (empty > 0 && raw <= 2.5 * HllM)
        HllM.toDouble * math.log(HllM.toDouble / empty.toDouble)
      else raw
    BigDecimal(est).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllAgg =
    copy(child = newChild)
}

object HllAgg {
  /** `hll_est(c, seed)` as an aggregate Column. */
  def hll_est(c: Column, seed: Long): Column =
    bridge.toColumn(HllAgg(bridge.toExpression(c), seed).toAggregateExpression())

  /** Validated SQL-registration builder: `hll_est(col, seed)`. */
  def fromExprs(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2)
      bridge.analysisError(
        s"hll_est(col, seed) takes exactly 2 arguments, got ${exprs.length}")
    if (!exprs(1).foldable)
      bridge.analysisError("hll_est seed must be a literal integer")
    exprs(1).eval() match {
      case n: Number => HllAgg(exprs.head, n.longValue).toAggregateExpression()
      case other => bridge.analysisError(
        s"hll_est seed must be a literal integer, got: $other")
    }
  }
}
