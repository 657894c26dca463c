package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of a string — the document-fingerprinting
  * primitive (north-star text-analysis pack): h = foldl over UTF-16
  * code units of (h·B + c) mod M. Implemented as a native Catalyst
  * expression WITH whole-stage codegen (`doGenCode`) so it fuses into
  * the scan stage — no UDF, no codegen fallback.
  *
  * Equivalent DuckDB spec (ASCII inputs):
  *   list_reduce([ord(c) FOR c IN string_split(s, '')],
  *               (a, b) -> (a * B + b) % M)
  */
case class RollingHash(child: Expression, base: Long, mod: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var i = 0
    while (i < s.length) { h = (h * base + s.charAt(i).toLong) % mod; i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val p = ctx.freshName("rh")
      s"""
         |String ${p}str = $c.toString();
         |long ${p}h = 0L;
         |for (int ${p}i = 0; ${p}i < ${p}str.length(); ${p}i++) {
         |  ${p}h = (${p}h * ${base}L + (long) ${p}str.charAt(${p}i)) % ${mod}L;
         |}
         |${ev.value} = ${p}h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  val DefaultBase = 31L
  val DefaultMod = 1000000007L

  def rolling_hash(c: Column): Column =
    bridge.toColumn(
      RollingHash(bridge.toExpression(c), DefaultBase, DefaultMod))
}
