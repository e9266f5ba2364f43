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

/** One greedy left-to-right pass of a NON-INTERACTING BPE merge batch
  * over a symbol array: at each position, if (sy[i], sy[i+1]) is an
  * accepted pair, emit the merged symbol and skip both, else emit sy[i].
  * Batch non-interaction (operand symbols pairwise disjoint, merged
  * symbols never operands — graft.ext.BpeOps.selectBatch's invariant)
  * makes this single pass ≡ applying the pairs one-at-a-time in any
  * order, and ≡ the higher-order `aggregate` fold it replaces
  * (BpeOpsSpec pins the equivalence property).
  *
  * Why a custom Expression: the lambda fold runs INTERPRETED (Catalyst
  * higher-order functions don't codegen) and its when-chain grows with
  * the batch width — at the 64-wide candidate batches a ≥1k-merge
  * vocabulary needs, that is width × length interpreted Column ops per
  * word. This is one compiled scan with two hash probes per position,
  * independent of batch width, and it keeps the merge application
  * inside whole-stage codegen (CodegenGateSpec-gated).
  */
case class BpeMergeFold(child: Expression,
                        pairs: Seq[(String, String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<STRING>, got ${t.catalogString}")
    }

  override def dataType: DataType = ArrayType(StringType,
    containsNull = child.dataType match {
      case ArrayType(_, n) => n
      case _ => true
    })

  override def prettyName: String = "bpe_merge_fold"

  @transient private lazy val table = new BpeMergeFold.PairTable(
    pairs.map { case (a, b, ab) => Array(a, b, ab) }.toArray)

  override protected def nullSafeEval(a: Any): Any =
    BpeMergeFold.fold(a.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpePairs", table,
      classOf[BpeMergeFold.PairTable].getName)
    nullSafeCodeGen(ctx, ev, a => s"""
      |${ev.value} = graft.functions.BpeMergeFold.fold($a, $ref);
    """.stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeMergeFold = copy(child = newChild)
}

object BpeMergeFold {

  /** The batch's (a, b) → ab lookup, shipped as plain strings (UTF8String
    * interning happens lazily per JVM) with a two-level hash table so the
    * hot loop does no per-position string concatenation.
    */
  final class PairTable(private val rows: Array[Array[String]])
      extends Serializable {
    @transient private lazy val m: java.util.HashMap[UTF8String,
        java.util.HashMap[UTF8String, UTF8String]] = {
      val t = new java.util.HashMap[UTF8String,
        java.util.HashMap[UTF8String, UTF8String]]()
      rows.foreach { r =>
        val a = UTF8String.fromString(r(0))
        val inner = t.computeIfAbsent(a,
          _ => new java.util.HashMap[UTF8String, UTF8String]())
        inner.put(UTF8String.fromString(r(1)), UTF8String.fromString(r(2)))
      }
      t
    }

    def lookup(a: UTF8String, b: UTF8String): UTF8String = {
      if (a == null || b == null) return null
      val inner = m.get(a)
      if (inner == null) null else inner.get(b)
    }
  }

  /** Shared by interpreted eval and the codegen template. */
  def fold(in: ArrayData, t: PairTable): ArrayData = {
    val n = in.numElements()
    val out = new Array[Any](n)
    var i = 0
    var k = 0
    while (i < n) {
      val s = in.getUTF8String(i)
      val merged =
        if (i + 1 < n) t.lookup(s, in.getUTF8String(i + 1)) else null
      if (merged != null) { out(k) = merged; i += 2 }
      else { out(k) = s; i += 1 }
      k += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(
      out.asInstanceOf[Array[AnyRef]], k).asInstanceOf[Array[Any]])
  }

  def apply(c: Column, pairs: Seq[(String, String, String)]): Column =
    ColumnBridge.column(BpeMergeFold(ColumnBridge.expression(c), pairs))
}
