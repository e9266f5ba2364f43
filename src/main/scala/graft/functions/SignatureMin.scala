package graft.functions

import org.apache.spark.sql.{Column, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Element-wise minimum over MinHash signatures — the merge algebra of
  * the dedup index, as a typed `Aggregator` (the UDAF rung of the
  * extension ladder: Expression for scalars, this for custom aggregate
  * state).
  *
  * MinHash's defining property is that the signature of a UNION is the
  * element-wise min of the parts' signatures, so this aggregate makes
  * LSH indexes mergeable along any partitioning of the input: combine
  * per-shard signatures into a corpus signature, per-chunk signatures
  * of a split document into the document's, or yesterday's index
  * signature with today's batch — without ever re-touching the shingle
  * sets (SignatureMinSpec pins the algebra against MinHashSignature).
  *
  * The neutral element is P per slot — MinHashSignature's own
  * empty-set sentinel (every real hash is < P), so an empty group
  * aggregates to exactly the signature of an empty shingle set and the
  * algebra has no edge case. Buffer is a primitive long array: fixed
  * 64·8 bytes of state per group through map-side partial aggregation,
  * the same scale contract as the built-in sketch aggregates.
  */
object SignatureMin
    extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {

  val width: Int = MinHashSignature.numHashes
  private val neutral: Long = MinHashSignature.P

  override def zero: Array[Long] = Array.fill(width)(neutral)

  private def minInto(b: Array[Long], a: Seq[Long]): Array[Long] = {
    if (a == null) return b // null rows are ignored, like builtin aggs
    require(a.length == width,
      s"sig_min expects ARRAY<BIGINT> of length $width, got ${a.length}")
    var i = 0
    while (i < width) {
      if (a(i) < b(i)) b(i) = a(i)
      i += 1
    }
    b
  }

  override def reduce(b: Array[Long], a: Seq[Long]): Array[Long] =
    minInto(b, a)

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] =
    minInto(x, y.toSeq)

  override def finish(b: Array[Long]): Seq[Long] = b.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()

  /** The aggregate as a Column, for DataFrame `agg`. */
  def column(sig: Column): Column = udaf(SignatureMin).apply(sig)

  /** SQL registration (UDAFs bind to a session's registry, not to the
    * extension injector the scalar expressions use).
    */
  def register(spark: SparkSession): Unit =
    spark.udf.register("sig_min", udaf(SignatureMin))
}
