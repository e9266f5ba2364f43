package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression,
  UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** All character-k-gram hashes of a string in ONE pass: returns the
  * 62-bit twin-family hash (graft.ext.DedupOps) of every k-length window,
  * one element per 1-based start position.
  *
  * Why a custom Expression (SURVEY §7.3): the composable per-position form
  * — `explode(sequence(...))` + k × `substr(pos + j, 1)` — hides an
  * O(len²) trap: UTF8String.substring must WALK from byte 0 to find the
  * codepoint boundary at `pos`, so hashing all positions of a doc costs
  * O(k·len²) byte steps (measured: the dominant cost of the whole MinHash
  * pipeline at sf0.1, ~6 s of a ~8 s cold build for ~1 M windows). This
  * expression decodes the codepoints once into an array and then hashes
  * each window with plain integer arithmetic — O(k·len).
  *
  * Semantics parity: `length()`/`substr()` are codepoint-indexed in both
  * Spark and DuckDB, and so is this loop; strings shorter than k yield an
  * empty array (explode then drops the row, matching the pre-filtered
  * composable form). Hash contract identical to DedupOps.shingleHashAt:
  * h31·2³¹ + h37, each fold mod P = 2³¹−1.
  */
case class ShingleHashes(child: Expression, k: Int, distinct: Boolean)
    extends UnaryExpression {
  require(k > 0)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING, got ${t.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(a: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      ShingleHashes.hashWindows(a.toString, k, distinct))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      s"""
         |long[] $out = graft.functions.ShingleHashes.hashWindows(
         |    $a.toString(), $k, $distinct);
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): ShingleHashes = copy(child = newChild)
}

object ShingleHashes {
  import SimHash64.P

  /** Static hot loop shared by eval and codegen (JIT-compiled either way;
    * the expression boilerplate around it is what codegen fuses).
    *
    * `distinct = true` dedups IN the expression (sort + unique): the
    * per-doc shingle SET materializes map-side with no `distinct()`
    * exchange, and the per-doc array needs no explode→collect_list
    * round-trip — two whole shuffles removed from the dedup pipelines.
    * Element order is then ascending rather than positional, which no
    * consumer observes (set semantics: min-aggregates, array_intersect,
    * size).
    */
  def hashWindows(s: String, k: Int, distinct: Boolean): Array[Long] = {
    // decode codepoints once — this is the O(len) pass that replaces the
    // per-position substring walks
    val n = s.codePointCount(0, s.length)
    val cps = new Array[Int](n)
    var idx = 0; var ci = 0
    while (idx < s.length) {
      val cp = s.codePointAt(idx)
      cps(ci) = cp; ci += 1
      idx += Character.charCount(cp)
    }
    val m = math.max(0, n - k + 1)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h31 = 0L; var h37 = 0L
      var j = 0
      while (j < k) {
        val cp = cps(i + j)
        h31 = (h31 * 31L + cp) % P
        h37 = (h37 * 37L + cp) % P
        j += 1
      }
      out(i) = (h31 << 31) + h37
      i += 1
    }
    if (!distinct || m == 0) return out
    java.util.Arrays.sort(out)
    var w = 1; var r = 1
    while (r < m) {
      if (out(r) != out(r - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    if (w == m) out else java.util.Arrays.copyOf(out, w)
  }

  /** Column-API entry point. */
  def apply(s: Column, k: Int, distinct: Boolean = false): Column =
    ColumnBridge.column(
      ShingleHashes(ColumnBridge.expression(s), k, distinct))
}
