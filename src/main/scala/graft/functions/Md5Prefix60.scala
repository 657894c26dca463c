package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Top 60 bits of md5(input) as a non-negative long — BIT-IDENTICAL to
  * the `conv(substring(md5(x), 1, 15), 16, 10) CAST AS LONG` chain it
  * replaces (15 hex digits = the digest's leading 60 bits; the DuckDB
  * oracles keep replaying exactly that SQL), but computed straight
  * from the digest bytes.
  *
  * Why (r19 optimization, guide §1.2 "per-task work"): the chain is
  * the engine's hottest scalar — every shingle, token and n-gram of
  * the dedup/minhash/simhash/hashing-trick operators runs it — and
  * pays four string materializations per call (hex-encode the digest,
  * substring, conv's parse-then-reformat, the final string→long cast)
  * for a value that is just `bigEndianLong(digest[0..7]) >>> 4`. This
  * expression allocates nothing but the digest array; the MessageDigest
  * instance is thread-local (one per task thread, reused across rows).
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_prefix60 expects a string argument, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    Md5Prefix60.hash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Md5Prefix60.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

object Md5Prefix60 {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** bigEndian(digest[0..7]) >>> 4 — the first 15 hex digits of the
    * md5 hex string as an unsigned 60-bit value, without the hex
    * round-trip. Called from generated code (hence public + Java-
    * friendly signature).
    */
  def hash60(s: UTF8String): Long = {
    val d = md.get().digest(s.getBytes)
    val hi =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    hi >>> 4
  }

  def md5_prefix60(c: Column): Column =
    bridge.toColumn(Md5Prefix60(bridge.toExpression(c)))
}
