package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Dot product of two numeric arrays (float or double elements),
  * accumulated SEQUENTIALLY in double — bit-identical to the
  * interpreted `aggregate(zip_with(...))` formulation it replaces and
  * to the DuckDB `list_reduce` oracle, but ~10-50× faster: a native
  * Catalyst expression with whole-stage codegen (tight primitive
  * loop, no per-element closures). This is the hot kernel of the
  * embedding similarity/dedup operators: at 100 TB the dot product
  * runs billions of times per scan, so it must live inside codegen.
  *
  * Null-free arrays assumed (embedding columns are). Mismatched
  * lengths throw (a silent min-length truncation would turn an
  * upstream dimension bug into a plausible-but-wrong product).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"VecDot expects array<float|double>, got $other")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (lf, rf) = (elemIsFloat(left), elemIsFloat(right))
    val n = a.numElements()
    if (n != b.numElements()) {
      throw new IllegalArgumentException(
        s"vec_dot: dimension mismatch (${a.numElements()} vs ${b.numElements()})")
    }
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getL = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val getR = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "vec_dot: dimension mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.$getL($i)) * ((double) $b.$getR($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  def vec_dot(a: Column, b: Column): Column =
    bridge.toColumn(VecDot(bridge.toExpression(a), bridge.toExpression(b)))
}
