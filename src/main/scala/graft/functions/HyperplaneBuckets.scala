package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression,
  UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType,
  IntegerType}

/** Random-hyperplane (sign) LSH sketch over an ARRAY<DOUBLE> embedding,
  * returned as per-band bucket keys — the unblocked scale path for
  * embedding near-dup detection (vector SimHash: Charikar's sign sketch).
  *
  * Bit j is the sign of ⟨v, r_j⟩ against a PSEUDO-hyperplane r_j whose
  * components are derived from the arithmetic twin family
  * (graft.ext.DedupOps): r_j[i] = ((A·t + B) mod P)/P − 0.5 for
  * t = j·dim + i + 1. Deterministic and seedless, and — like the MinHash
  * and SimHash stacks — EXACTLY reproducible in DuckDB SQL, so the whole
  * candidate pipeline is oracle-checkable despite being approximate as a
  * recall statement. The dot accumulates left-to-right in DOUBLE, the
  * same IEEE order the SQL twin uses.
  *
  * The 64 bits are grouped into `nBands` buckets of `bitsPerBand` bits
  * (banded sign-LSH: a candidate pair must agree on ALL bits of some
  * band). Returning per-band SMALL bucket keys avoids assembling a 64-bit
  * sketch whose high bit would need signed-overflow care in SQL.
  *
  * Native expression for the usual reason (SURVEY §7.3): 64 dot products
  * per row as composed higher-order lambdas run interpreted; this is one
  * fused pass.
  */
case class HyperplaneBuckets(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<DOUBLE>, got ${t.catalogString}")
    }

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "hyperplane_buckets"

  override protected def nullSafeEval(a: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      HyperplaneBuckets.buckets(a.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      s"""
         |int[] $out = graft.functions.HyperplaneBuckets.buckets($a);
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneBuckets = copy(child = newChild)
}

object HyperplaneBuckets {
  /** Shared modulus of the twin family. */
  val P = 2147483647L
  /** Hyperplane-component affine constants: the two public mixing primes
    * of the MinHash family reduced mod P (2654435761, 2246822519).
    */
  val A = 506952114L
  val B = 99338872L

  val numBits = 64
  val nBands = 8
  val bitsPerBand: Int = numBits / nBands

  /** One fused pass: 64 signed projections → 8 byte-sized bucket keys.
    * Null elements contribute 0 to the projection (skipped), mirroring
    * SimHash64's null handling — SQL callers can pass arbitrary arrays
    * and getDouble on a null slot would otherwise read garbage.
    */
  def buckets(v: ArrayData): Array[Int] = {
    val dim = v.numElements()
    val out = new Array[Int](nBands)
    var j = 0
    while (j < numBits) {
      var acc = 0.0
      var i = 0
      while (i < dim) {
        if (!v.isNullAt(i)) {
          val t = j.toLong * dim + i + 1
          val r = ((A * t + B) % P).toDouble / P - 0.5
          acc += v.getDouble(i) * r
        }
        i += 1
      }
      if (acc >= 0.0) out(j / bitsPerBand) |= 1 << (j % bitsPerBand)
      j += 1
    }
    out
  }

  /** Column-API entry point. */
  def apply(v: Column): Column =
    ColumnBridge.column(HyperplaneBuckets(ColumnBridge.expression(v)))
}
