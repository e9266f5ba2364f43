package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression,
  UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All 64 MinHash rows of a hashed-shingle SET in one fused pass:
  * sig_i = min over the set of (a_i·(s mod P) + b_i) mod P.
  *
  * Why a custom Expression: the aggregate formulation (explode the set,
  * 64 MIN aggregates, group back by doc) is exchange-bound — it shuffles
  * the per-doc partial minima through a hash aggregation even though the
  * whole signature is a pure function of one row's array. This expression
  * turns the signature step into a map-side projection: no exploded
  * window table, no groupBy, nothing on the wire but the 64-long result.
  * Value-identical to the aggregate form (spec'd in DedupOpsSpec).
  *
  * Family constants are THE single source for both the Spark plan and the
  * generated DuckDB oracle (graft.ext.DedupOps references them), so the
  * twin stays exact by construction.
  */
case class MinHashSignature(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<BIGINT>, got ${t.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(a: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      MinHashSignature.signature(a.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      s"""
         |long[] $out = graft.functions.MinHashSignature.signature($a);
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSignature = copy(child = newChild)
}

object MinHashSignature {
  /** Shared modulus of the twin family. */
  val P = 2147483647L
  val numHashes = 64

  /** Affine family constants: derived from two public mixing primes
    * (Knuth's 2654435761, xxHash's 2246822519); distinct and nonzero for
    * all rows because P is prime.
    */
  def aCoef(i: Int): Long = {
    val a = ((i + 1) * 2654435761L) % P; if (a == 0L) 1L else a
  }
  def bCoef(i: Int): Long = ((i + 1) * 2246822519L) % P

  private val as: Array[Long] = Array.tabulate(numHashes)(aCoef)
  private val bs: Array[Long] = Array.tabulate(numHashes)(bCoef)

  /** Static hot loop shared by eval and codegen. Empty sets yield an
    * all-P sentinel signature (the aggregate form yields no row at all —
    * both pipelines pre-filter empty documents, see DedupOps.shingleSets).
    * Null elements are SKIPPED (treated as absent from the set),
    * mirroring SimHash64's token handling — the expression is
    * SQL-registered, so arbitrary user arrays can reach it and a blind
    * getLong would read a null slot as garbage.
    */
  def signature(sh: ArrayData): Array[Long] = {
    val n = sh.numElements()
    val out = Array.fill(numHashes)(P)
    var j = 0
    while (j < n) {
      if (!sh.isNullAt(j)) {
        val x = sh.getLong(j) % P
        var i = 0
        while (i < numHashes) {
          val h = (as(i) * x + bs(i)) % P
          if (h < out(i)) out(i) = h
          i += 1
        }
      }
      j += 1
    }
    out
  }

  /** Column-API entry point over a hashed-shingle set column. */
  def apply(sh: Column): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(sh)))
}
