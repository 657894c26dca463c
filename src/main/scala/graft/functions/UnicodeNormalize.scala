package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFKC/NFD/NFKD) — the canonicalization
  * stage every multilingual training corpus runs before hashing or
  * dedup (two byte-distinct encodings of "é" must fingerprint
  * identically). Spark has no builtin for it; this is a native
  * Catalyst expression WITH whole-stage codegen over
  * `java.text.Normalizer` (ICU-equivalent for the normalization
  * forms) — no UDF, fuses into the scan stage, and skips the
  * normalizer entirely for strings `isNormalized` already accepts
  * (the overwhelming majority of real corpus rows; the check is a
  * single quick-check pass).
  *
  * DuckDB mirror (oracle): `nfc_normalize(s)` for the NFC form.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(Seq("NFC", "NFKC", "NFD", "NFKD").contains(form),
    s"unsupported normalization form $form")

  override def inputTypes: Seq[bridge.SqlAbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  @transient private lazy val f = java.text.Normalizer.Form.valueOf(form)

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, f)) input
    else UTF8String.fromString(java.text.Normalizer.normalize(s, f))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val p = ctx.freshName("un")
      s"""
         |String ${p}s = $c.toString();
         |java.text.Normalizer.Form ${p}f = java.text.Normalizer.Form.$form;
         |if (java.text.Normalizer.isNormalized(${p}s, ${p}f)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize(${p}s, ${p}f));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  def nfc(c: Column): Column =
    bridge.toColumn(UnicodeNormalize(bridge.toExpression(c), "NFC"))
  def nfkc(c: Column): Column =
    bridge.toColumn(UnicodeNormalize(bridge.toExpression(c), "NFKC"))

  /** Validated SQL-registration builder for a given form. */
  def fromExprs(form: String)(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 1)
      bridge.analysisError(
        s"${form.toLowerCase}_normalize(s) takes exactly 1 argument, " +
          s"got ${exprs.length}")
    UnicodeNormalize(exprs.head, form)
  }
}
