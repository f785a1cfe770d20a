package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization for corpus preprocessing — the canonical first
  * pass of a text pipeline (dedup fingerprints, tokenizers and n-gram
  * hashes all assume one canonical byte form per visible string;
  * composed "é" vs "e"+U+0301 would otherwise hash as two different
  * documents through the whole md5/xxhash family in this package).
  *
  * Spark has no built-in normalization function; a Scala UDF would
  * carry per-row serialization overhead and fall out of whole-stage
  * codegen. This expression calls `java.text.Normalizer` (the JDK's
  * conformant implementation of UAX #15) from generated code, with an
  * `isNormalized` fast path: for already-NFC text — the overwhelming
  * case in real corpora — the input `UTF8String` is returned as-is
  * with zero allocation beyond the transient String decode.
  *
  * Engine parity (the oracle bridge): NFC output is defined by the
  * Unicode standard, so DuckDB's `nfc_normalize` (utf8proc) restates
  * it byte-for-byte — verified by hash in the e66 conformance query.
  */
object UnicodeNorm {
  /** Forms by wire ordinal (stable — codegen embeds the ordinal). */
  private val forms: Array[Normalizer.Form] = Array(
    Normalizer.Form.NFC, Normalizer.Form.NFD,
    Normalizer.Form.NFKC, Normalizer.Form.NFKD)

  def ordinalOf(name: String): Int = {
    val i = forms.indexWhere(_.name == name.toUpperCase(java.util.Locale.ROOT))
    require(i >= 0, s"unknown normalization form: $name (use NFC|NFD|NFKC|NFKD)")
    i
  }

  def normalize(s: UTF8String, formOrdinal: Int): UTF8String = {
    val form = forms(formOrdinal)
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }
}

/** `graft_unicode_norm(text, 'NFC'|'NFD'|'NFKC'|'NFKD')` → string. */
case class UnicodeNormalize(child: Expression, formOrdinal: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_unicode_norm"

  override def nullSafeEval(input: Any): Any =
    UnicodeNorm.normalize(input.asInstanceOf[UTF8String], formOrdinal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnicodeNorm.normalize($c, $formOrdinal); // graft_unicode_norm")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}
