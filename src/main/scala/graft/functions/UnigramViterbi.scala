package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-style) VITERBI segmentation of one word
  * against a fixed piece table with integer costs: among all ways to
  * cover the word with vocabulary pieces, pick the one minimizing the
  * lexicographic objective
  *
  *   (sum of piece costs,  number of pieces,  per-cell smallest start)
  *
  * via the standard O(len · maxPieceLen) dynamic program. The cost of
  * a piece is a FIXED-POINT inverse-frequency surrogate for -log p
  * (`total·SCALE div count` — the repo's no-ln discipline, cf.
  * [[graft.ext.LmOps]]): rarer pieces cost more, so the DP prefers few,
  * frequent pieces — the unigram-LM objective with exactly-reproducible
  * integer arithmetic in BOTH engines (Spark and the DuckDB oracle).
  *
  * Tie-breaks make the segmentation a pure function of the model:
  * within one DP cell, candidates are ordered by (accumulated cost,
  * accumulated piece count, start position j) and the smallest wins —
  * the oracle's `row_number() OVER (ORDER BY v, n, j)` on the same
  * candidate set. A word with an unreachable cell (a character no
  * vocabulary piece covers) degrades to the single `unk` token, the
  * [[WordPieceGreedy]] whole-word failure semantics; training always
  * seeds every corpus character, so on in-corpus text the path is
  * structurally dead (spec-pinned, not assumed).
  *
  * This is the THIRD encode algorithm family beside BPE merge replay
  * and WordPiece greedy longest-match (cf. reference `tasks/`
  * tokenizer-adjacent passes): globally optimal per word where greedy
  * is local, which is why it earns a first-class operator. The piece
  * table ships inside the expression (model-sized, bounded — the
  * BpeMergeFold pattern), so the hot path is compiled, stays inside
  * whole-stage codegen, and does at most `maxPieceLen` hash probes per
  * DP cell.
  */
case class UnigramViterbi(child: Expression, pieces: Seq[(String, Long)],
                          unk: String = WordPieceGreedy.defaultUnk)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING, got ${t.catalogString}")
    }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "unigram_viterbi"

  @transient private lazy val table =
    new UnigramViterbi.Model(pieces.toArray, unk)

  override protected def nullSafeEval(w: Any): Any =
    UnigramViterbi.encode(w.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("uniModel", table,
      classOf[UnigramViterbi.Model].getName)
    nullSafeCodeGen(ctx, ev, w => s"""
      |${ev.value} = graft.functions.UnigramViterbi.encode($w, $ref);
    """.stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramViterbi = copy(child = newChild)
}

object UnigramViterbi {

  /** The piece-cost table, shipped as plain (string, cost) pairs;
    * UTF8String map built lazily per JVM. `maxLen` bounds the DP
    * window (candidate start positions per cell).
    */
  final class Model(private val entries: Array[(String, Long)],
                    unkStr: String)
      extends Serializable {
    @transient lazy val costs: java.util.HashMap[UTF8String, java.lang.Long] = {
      val m = new java.util.HashMap[UTF8String, java.lang.Long](
        entries.length * 2)
      entries.foreach { case (p, c) =>
        m.put(UTF8String.fromString(p), java.lang.Long.valueOf(c))
      }
      m
    }
    @transient lazy val maxLen: Int =
      if (entries.isEmpty) 0
      else entries.iterator.map(e => UTF8String.fromString(e._1).numChars).max
    @transient lazy val unk: UTF8String = UTF8String.fromString(unkStr)
  }

  /** Static entry point shared by eval and generated code. */
  def encode(w: UTF8String, m: Model): ArrayData = {
    val len = w.numChars()
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    val inf = java.lang.Long.MAX_VALUE
    val v = new Array[Long](len + 1)
    val n = new Array[Int](len + 1)
    val ptr = new Array[Int](len + 1)
    var pos = 1
    while (pos <= len) { v(pos) = inf; pos += 1 }
    pos = 1
    while (pos <= len) {
      // ascending j + strictly-better keeps the smallest j among ties —
      // the oracle's ORDER BY v, n, j per cell
      var j = math.max(0, pos - m.maxLen)
      while (j < pos) {
        if (v(j) != inf) {
          val cost = m.costs.get(w.substring(j, pos))
          if (cost != null) {
            val cv = v(j) + cost.longValue()
            val cn = n(j) + 1
            if (cv < v(pos) || (cv == v(pos) && cn < n(pos))) {
              v(pos) = cv; n(pos) = cn; ptr(pos) = j
            }
          }
        }
        j += 1
      }
      pos += 1
    }
    if (v(len) == inf)
      return new GenericArrayData(Array[Any](m.unk))
    val out = new Array[Any](n(len))
    var i = n(len) - 1
    pos = len
    while (pos > 0) {
      out(i) = w.substring(ptr(pos), pos)
      i -= 1
      pos = ptr(pos)
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, pieces: Seq[(String, Long)]): Column =
    ColumnBridge.column(
      UnigramViterbi(ColumnBridge.expression(c), pieces))
}
