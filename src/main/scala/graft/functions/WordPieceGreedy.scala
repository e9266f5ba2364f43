package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece-style GREEDY longest-match tokenization of one word against
  * a fixed subword vocabulary: repeatedly take the longest vocabulary
  * entry that prefixes the remaining suffix; if at any position no entry
  * matches, the WHOLE word becomes the single `unk` token (the BERT
  * tokenizer's word-level failure semantics, cf. the published WordPiece
  * algorithm). Deterministic — ties are impossible (equal-length
  * matching prefixes are the same string).
  *
  * This is the second ENCODE algorithm over the trained BPE vocabulary
  * (graft.ext.BpeOps): BPE encoding replays merges in training order,
  * WordPiece matches greedily by length — the two can tokenize the same
  * word differently, which is exactly why both exist as first-class
  * operators. The vocabulary ships inside the expression (bounded,
  * model-sized — the BpeMergeFold pattern), so the hot path is a
  * compiled scan with at most `maxLen` hash probes per emitted piece
  * and stays inside whole-stage codegen (CodegenGateSpec-gated).
  */
/** @param byteFallback when true, a position no vocabulary entry
  *   matches consumes ONE code point and emits its UTF-8 bytes as
  *   `<0xNN>` tokens (the SentencePiece/Llama byte-fallback guarantee:
  *   any UTF-8 input encodes with zero UNK), then matching RESUMES on
  *   the rest of the word — instead of the whole-word `unk` collapse.
  */
case class WordPieceGreedy(child: Expression, vocab: Seq[String],
                           unk: String = WordPieceGreedy.defaultUnk,
                           byteFallback: Boolean = false)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING, got ${t.catalogString}")
    }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "wordpiece_greedy"

  @transient private lazy val table =
    new WordPieceGreedy.Vocab(vocab.toArray, unk, byteFallback)

  override protected def nullSafeEval(w: Any): Any =
    WordPieceGreedy.encode(w.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpVocab", table,
      classOf[WordPieceGreedy.Vocab].getName)
    nullSafeCodeGen(ctx, ev, w => s"""
      |${ev.value} = graft.functions.WordPieceGreedy.encode($w, $ref);
    """.stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordPieceGreedy = copy(child = newChild)
}

object WordPieceGreedy {

  val defaultUnk = "[UNK]"

  /** The vocabulary set, shipped as plain strings (UTF8String interning
    * lazily per JVM) with the max entry length that bounds the probe
    * window.
    */
  final class Vocab(private val words: Array[String], unkStr: String,
                    val byteFallback: Boolean = false)
      extends Serializable {
    @transient lazy val set: java.util.HashSet[UTF8String] = {
      val s = new java.util.HashSet[UTF8String](words.length * 2)
      words.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }
    @transient lazy val maxLen: Int =
      if (words.isEmpty) 0
      else words.iterator.map(UTF8String.fromString(_).numChars).max
    @transient lazy val unk: UTF8String = UTF8String.fromString(unkStr)
  }

  /** Static entry point shared by eval and generated code. */
  def encode(w: UTF8String, v: Vocab): ArrayData = {
    val n = w.numChars()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = new ArrayBuffer[Any](n)
    var pos = 0
    while (pos < n) {
      var len = math.min(v.maxLen, n - pos)
      var hit: UTF8String = null
      while (len >= 1 && hit == null) {
        val cand = w.substring(pos, pos + len)
        if (v.set.contains(cand)) hit = cand else len -= 1
      }
      if (hit == null) {
        if (!v.byteFallback)
          return new GenericArrayData(Array[Any](v.unk))
        // consume ONE code point, emit its UTF-8 bytes, keep matching
        val bytes = w.substring(pos, pos + 1).getBytes
        var i = 0
        while (i < bytes.length) {
          out += UTF8String.fromString(f"<0x${bytes(i) & 0xFF}%02X>")
          i += 1
        }
        pos += 1
      } else {
        out += hit
        pos += hit.numChars()
      }
    }
    new GenericArrayData(out.toArray)
  }

  def apply(c: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(WordPieceGreedy(ColumnBridge.expression(c), vocab))

  def byteFallback(c: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(WordPieceGreedy(ColumnBridge.expression(c), vocab,
      byteFallback = true))
}
