package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression,
  UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Johnson–Lindenstrauss-style random projection of an ARRAY<DOUBLE>
  * embedding to `outDim` dimensions: y_j = ⟨v, r_j⟩ against the SAME
  * deterministic pseudo-hyperplanes as [[HyperplaneBuckets]]
  * (r_j[i] = ((A·t + B) mod P)/P − 0.5, t = j·dim + i + 1) — so for
  * j < 64 the SIGN of y_j is exactly bit j of the sign-LSH sketch
  * (spec-pinned), and the whole projection is reproducible in DuckDB
  * SQL with zero stored projection matrix.
  *
  * Components are uniform on [−0.5, 0.5); the JL lemma's distance
  * preservation holds for any sub-Gaussian component family, so the
  * reduced vectors preserve pairwise cosine/distance structure in
  * expectation — the standard pre-step that makes downstream
  * brute-force/ANN over 100 TB of embeddings 8–64× cheaper.
  *
  * Native expression for the usual reason (SURVEY §7.3): `outDim`
  * interpreted dot-product lambdas per row fuse into one codegen'd
  * pass. Accumulation is the same left-to-right IEEE order as the SQL
  * twin's list_reduce fold. Null elements contribute 0, mirroring
  * [[HyperplaneBuckets]].
  */
case class RandomProject(child: Expression, outDim: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<DOUBLE>, got ${t.catalogString}")
    }

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "random_project"

  override protected def nullSafeEval(a: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      RandomProject.project(a.asInstanceOf[ArrayData], outDim))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      s"""
         |double[] $out =
         |  graft.functions.RandomProject.project($a, $outDim);
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): RandomProject = copy(child = newChild)
}

object RandomProject {
  import HyperplaneBuckets.{A, B, P}

  /** Default reduced dimensionality (128 → 16 on the fixture). */
  val defaultOutDim = 16

  def project(v: ArrayData, outDim: Int): Array[Double] = {
    val dim = v.numElements()
    val out = new Array[Double](outDim)
    var j = 0
    while (j < outDim) {
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
      out(j) = acc
      j += 1
    }
    out
  }

  /** Column-API entry point. */
  def apply(v: Column): Column = apply(v, defaultOutDim)

  def apply(v: Column, outDim: Int): Column =
    ColumnBridge.column(RandomProject(ColumnBridge.expression(v), outDim))
}
