package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native hashed-feature bucket for DSIR-style importance weighting
  * ([[graft.ext.SampleOps.dsirWeights]]): the first 16 bits of md5(s),
  * big-endian, mod `buckets`.
  *
  * SEMANTIC CONTRACT: bit-identical to the composed-builtin SQL formula
  * both engines interpret —
  * `(instr(hex, substr(md5(g),1,1))-1)*4096 + … ) % buckets` — because
  * the first four hex digits of an md5 ARE its first two bytes. The
  * Spark query uses this native form (one digest, two byte reads, zero
  * string materialization); the DuckDB oracle keeps the builtin formula;
  * Md5BucketSpec pins the equivalence property on random strings, and
  * CodegenGateSpec compiles the generated code with fallback disabled.
  *
  * Native rather than the 4×-instr expr for the usual reason
  * (SimHash64.scala): the composed form hex-encodes the digest and runs
  * four string searches per row in the hot gram loop; this reads two
  * bytes off the raw digest.
  */
case class Md5Bucket(child: Expression, buckets: Int)
    extends UnaryExpression {

  require(buckets > 0 && buckets <= 65536,
    s"buckets must be in (0, 65536], got $buckets")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires STRING, got ${t.catalogString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "md5_bucket"

  override protected def nullSafeEval(a: Any): Any =
    Md5Bucket.bucket(a.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = graft.functions.Md5Bucket.bucket($c, $buckets);
    """.stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): Md5Bucket = copy(child = newChild)
}

object Md5Bucket {

  private val digests = ThreadLocal.withInitial(
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First 16 md5 bits (big-endian) mod buckets. Shared by interpreted
    * eval and the codegen template.
    */
  def bucket(s: UTF8String, buckets: Int): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    (((d(0) & 0xff) << 8) | (d(1) & 0xff)).toLong % buckets
  }

  def apply(c: Column, buckets: Int): Column =
    ColumnBridge.column(Md5Bucket(ColumnBridge.expression(c), buckets))
}
