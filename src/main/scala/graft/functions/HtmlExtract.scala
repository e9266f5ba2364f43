package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the FRONT of the curation funnel:
  * markup → text. Two linear passes over the string, one allocation
  * each:
  *
  *  1. tag strip with exactly the `<[^>]*>` regex semantics (from each
  *     `<`, drop through the next `>`; an unclosed `<` stays literal) —
  *     spelled as a char scan so it needs no regex engine per row;
  *  2. entity decode of the fixed six-entity core set
  *     (`&amp; &lt; &gt; &quot; &#39; &nbsp;`) in one left-to-right
  *     scan. The entities have pairwise-distinct second characters and
  *     no internal `&`, so matches can never overlap and the scan is
  *     provably equivalent to chained `replace()` calls with `&amp;`
  *     LAST — which is exactly how the DuckDB oracle twin is spelled
  *     (`&amp;` last so its output `&` can never re-trigger a match,
  *     mirroring the no-rescan scan). Unknown entities pass through
  *     unchanged (both engines).
  *
  * The decode runs AFTER the strip as a separate pass on purpose: a
  * removed tag can join `&am` + `p;` into `&amp;` — a fused single scan
  * would miss it, and the oracle (regexp_replace, then replaces) would
  * not.
  *
  * This is deliberately an extraction CORE, not an HTML5 parser: no
  * script/style content suppression, no numeric-entity table beyond
  * `&#39;`, no comment (`<!-- -->`) special-casing (a comment holding a
  * literal `>` terminates at it, exactly as the regex would). The
  * contract is "same answer as the published regexp oracle", which is
  * what makes it drivable by the hash gate; richer parsing belongs in a
  * dedicated extractor upstream.
  *
  * Native rather than a UDF for the usual reason (SimHash64.scala): it
  * heads the text pipeline over every raw crawl document, and a UDF
  * would break whole-stage codegen around the scan projection.
  */
case class HtmlExtract(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING, got ${t.catalogString}")
    }

  override def dataType: DataType = StringType

  override def prettyName: String = "html_extract"

  override protected def nullSafeEval(a: Any): Any =
    UTF8String.fromString(
      HtmlExtract.extract(a.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
      |  graft.functions.HtmlExtract.extract($c.toString()));
    """.stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): HtmlExtract = copy(child = newChild)
}

object HtmlExtract {

  /** Tag strip then entity decode; shared by the interpreted eval path
    * and the codegen template.
    */
  def extract(s: String): String = decodeEntities(stripTags(s))

  /** `<[^>]*>` removal as a scan: from `<`, if a `>` exists later, drop
    * through it (the regex's leftmost-match-then-continue behavior);
    * otherwise the `<` is literal text.
    */
  def stripTags(s: String): String = {
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val ch = s.charAt(i)
      if (ch == '<') {
        val close = s.indexOf('>', i + 1)
        if (close >= 0) i = close + 1
        else { out.append(ch); i += 1 }
      } else { out.append(ch); i += 1 }
    }
    out.toString
  }

  /** One left-to-right pass over the six-entity core set; emitted
    * output is never rescanned (≡ chained replace with `&amp;` last).
    */
  def decodeEntities(s: String): String = {
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val ch = s.charAt(i)
      if (ch == '&') {
        if (s.startsWith("amp;", i + 1)) { out.append('&'); i += 5 }
        else if (s.startsWith("lt;", i + 1)) { out.append('<'); i += 4 }
        else if (s.startsWith("gt;", i + 1)) { out.append('>'); i += 4 }
        else if (s.startsWith("quot;", i + 1)) { out.append('"'); i += 6 }
        else if (s.startsWith("#39;", i + 1)) { out.append('\''); i += 5 }
        else if (s.startsWith("nbsp;", i + 1)) { out.append(' '); i += 6 }
        else { out.append(ch); i += 1 }
      } else { out.append(ch); i += 1 }
    }
    out.toString
  }

  /** Column-API entry point. */
  def apply(c: Column): Column =
    ColumnBridge.column(HtmlExtract(ColumnBridge.expression(c)))
}
