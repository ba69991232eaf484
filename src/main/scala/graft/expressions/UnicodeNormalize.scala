package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a codegen'd expression.
  *
  * A crawl-scale corpus mixes precomposed ('é') and decomposed ('e'+U+0301)
  * encodings of the same text; every content-keyed operator downstream —
  * exact dedup digests, MinHash shingles, fingerprints, group-by-text —
  * silently treats them as distinct documents unless ingestion
  * canonicalizes first. Spark has no built-in normalizer (DuckDB ships
  * `nfc_normalize`), so this wraps `java.text.Normalizer` as a
  * UnaryExpression with `doGenCode`: the call stays inside whole-stage
  * codegen, and the dominant all-ASCII case takes the `isNormalized`
  * fast path (a scan, no allocation) rather than re-encoding every row.
  *
  * Strip-accents composes from this: NFD then regex-drop `\p{M}` — see
  * QueriesG.t26.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize expects STRING, got ${child.dataType.simpleString}")
    else if (!Seq("NFC", "NFD", "NFKC", "NFKD").contains(form))
      TypeCheckResult.TypeCheckFailure(s"unknown normalization form: $form")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(v: Any): Any =
    UnicodeNormalize.normalize(v.asInstanceOf[UTF8String],
      Normalizer.Form.valueOf(form))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    // `form` is validated plan-time, so it inlines as a Form constant in
    // the generated source — no per-row valueOf.
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.UnicodeNormalize.normalize($c, " +
        s"java.text.Normalizer.Form.$form)")

  override protected def withNewChildInternal(
      newChild: Expression): UnicodeNormalize = copy(child = newChild)
}

object UnicodeNormalize {
  /** Shared by interpreted and generated paths. Returns the input object
    * unchanged when already normalized (the overwhelmingly common case for
    * ASCII/NFC corpora) — `isNormalized` is a scan with no allocation.
    */
  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }

  def nfc(c: Column): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(c), "NFC"))
  def nfd(c: Column): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(c), "NFD"))

  /** SQL constructor: `unicode_normalize(str[, 'NFC'|'NFD'|'NFKC'|'NFKD'])`.
    * The form must be a string literal — it selects the codegen'd constant,
    * so it cannot vary per row.
    */
  def fromSql(children: Seq[Expression]): Expression = children match {
    case Seq(c) => UnicodeNormalize(c, "NFC")
    case Seq(c, org.apache.spark.sql.catalyst.expressions.Literal(f, StringType))
        if f != null =>
      UnicodeNormalize(c, f.toString.toUpperCase)
    case _ => throw new IllegalArgumentException(
      "unicode_normalize(str[, form-literal])")
  }
}
