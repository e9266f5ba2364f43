package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** |A ∩ B| for two SORTED ASCENDING ARRAY<BIGINT> set columns via a
  * linear merge — the hot loop of every pairwise-Jaccard verification.
  *
  * Why a custom Expression: `size(array_intersect(a, b))` allocates and
  * fills a hash set PER PAIR, and the dedup pipelines evaluate it for
  * every surviving candidate pair (10⁵+ pairs × 10²–10³ elements at
  * sf0.1; quadratically more at scale). The merge walk does the same
  * count with zero allocation and sequential access.
  *
  * Input contract: both arrays ascending with no duplicates — exactly
  * what ShingleHashes(distinct = true) emits. The merge verifies
  * monotonicity as it walks (the check is one extra comparison per step)
  * and fails loudly on unsorted input rather than miscounting.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<BIGINT> arguments, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |${ev.value} =
         |  graft.functions.SortedIntersectCount.count($a, $b);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {

  /** Static merge loop shared by eval and codegen. The monotonicity
    * validation walks BOTH arrays to the end (the merge alone skips the
    * tail of whichever side outlives the other, and an unsorted prefix
    * there could silently miscount). The contract is STRICTLY ascending:
    * an element equal to its predecessor (a duplicate) fails too — a
    * duplicate would be counted with multiplicity, silently diverging
    * from the set semantics of size(array_intersect). Null elements are
    * rejected as well (getLong on a null slot reads garbage).
    */
  def count(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    var prevA = 0L; var prevB = 0L
    while (i < na && j < nb) {
      if (a.isNullAt(i) || b.isNullAt(j)) nullElement()
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) {
        if (i > 0 && x <= prevA) unsorted()
        prevA = x; i += 1
      } else if (y < x) {
        if (j > 0 && y <= prevB) unsorted()
        prevB = y; j += 1
      } else {
        if ((i > 0 && x <= prevA) || (j > 0 && y <= prevB)) unsorted()
        prevA = x; prevB = y
        c += 1; i += 1; j += 1
      }
    }
    while (i < na) {
      if (a.isNullAt(i)) nullElement()
      val x = a.getLong(i)
      if (i > 0 && x <= prevA) unsorted()
      prevA = x; i += 1
    }
    while (j < nb) {
      if (b.isNullAt(j)) nullElement()
      val y = b.getLong(j)
      if (j > 0 && y <= prevB) unsorted()
      prevB = y; j += 1
    }
    c
  }

  private def unsorted(): Nothing =
    throw new IllegalArgumentException(
      "sorted_intersect_count: input array is not sorted strictly " +
        "ascending (out-of-order or duplicate element) — use " +
        "ShingleHashes(distinct = true) or sort/dedup the sets first")

  private def nullElement(): Nothing =
    throw new IllegalArgumentException(
      "sorted_intersect_count: input array contains a null element — " +
        "sorted sets must be null-free")

  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
