package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Unicode canonicalization ahead of
  * shingling: NFC normalization + lowercase, optionally preceded by
  * east-asian WIDTH FOLDING (full-width ASCII U+FF01–FF5E → ASCII,
  * ideographic space U+3000 → space).
  *
  * Why it exists: `TextOps.normText` is lower+trim+whitespace-collapse
  * only, so two canonically-equal Unicode spellings (é composed vs
  * e+COMBINING ACUTE) shingle differently and evade every near-dup
  * operator — the standard pre-shingle step for multilingual crawls is
  * NFC (or NFKC) first. Kept a SEPARATE opt-in expression rather than
  * folded into normText so the shipped oracles stay byte-stable;
  * `TextOps.normTextUnicode` composes the two.
  *
  * Oracle twin: DuckDB `lower(nfc_normalize(x))` — same operation
  * order (NFC, then lowercase). Width folding has no DuckDB builtin and
  * is spec-covered only. Caveat: Java's full case mapping and DuckDB's
  * utf8proc simple mapping disagree on a handful of special codepoints
  * (İ U+0130, contextual final sigma); the fixture corpus is ASCII and
  * the spec fixtures stay inside the agreeing subset.
  *
  * Native rather than a UDF for the usual reason (SimHash64.scala): it
  * sits at the head of the shingle pipeline over every document, and a
  * UDF would break whole-stage codegen around the scan projection.
  */
case class UnicodeNorm(child: Expression, widthFold: Boolean = false)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING, got ${t.catalogString}")
    }

  override def dataType: DataType = StringType

  override def prettyName: String = "unicode_norm"

  override protected def nullSafeEval(a: Any): Any =
    UTF8String.fromString(
      UnicodeNorm.norm(a.asInstanceOf[UTF8String].toString, widthFold))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
      |  graft.functions.UnicodeNorm.norm($c.toString(), $widthFold));
    """.stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): UnicodeNorm = copy(child = newChild)
}

object UnicodeNorm {

  /** NFC + ROOT-locale lowercase, optionally width-folded first.
    * Shared by the interpreted eval path and the codegen template.
    */
  def norm(s: String, widthFold: Boolean): String = {
    val pre = if (widthFold) foldWidth(s) else s
    val nfc =
      if (java.text.Normalizer.isNormalized(pre,
          java.text.Normalizer.Form.NFC)) pre // ASCII fast path, no alloc
      else java.text.Normalizer.normalize(pre, java.text.Normalizer.Form.NFC)
    nfc.toLowerCase(java.util.Locale.ROOT)
  }

  /** Full-width ASCII → ASCII; ideographic space → space. A plain
    * char-level map — the affected ranges are all BMP, outside any
    * surrogate pair.
    */
  def foldWidth(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch >= '\uFF01' && ch <= '\uFF5E') sb.append((ch - 0xFEE0).toChar)
      else if (ch == '\u3000') sb.append(' ')
      else sb.append(ch)
      i += 1
    }
    sb.toString
  }

  /** Column-API entry point: NFC + lowercase. */
  def apply(c: Column): Column =
    ColumnBridge.column(UnicodeNorm(ColumnBridge.expression(c)))

  /** Column-API entry point with width folding (spec-covered only —
    * no DuckDB twin exists for the fold).
    */
  def folded(c: Column): Column =
    ColumnBridge.column(
      UnicodeNorm(ColumnBridge.expression(c), widthFold = true))
}
