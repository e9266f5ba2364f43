package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native Catalyst expression computing a 64-bit dHash-style PERCEPTUAL
  * hash over a binary media payload, with whole-stage codegen.
  *
  * dHash (difference hash — a public-domain perceptual-hash family:
  * resize to a (W+1)×H grayscale grid, emit one bit per adjacent-pixel
  * comparison) is robust to re-encoding because comparisons depend on
  * relative gradients, not absolute values. The two stages here:
  *
  *  1. DECODE/RESIZE — produce the [[ImageHash64.rows]]×[[ImageHash64.cols]]
  *     grid. The harness container has no image codecs (the
  *     MultimodalOps.decodeStub situation), so the grid is a
  *     deterministic fake: the payload's BYTE-VALUE PERCENTILE curve,
  *     sample k of 72 = the ⌊k·n/72⌋-th smallest byte (counting sort +
  *     72 order statistics). Order-invariance is the point — a
  *     re-encoded copy of the same content permutes and shifts bytes,
  *     which destroys any position-aligned sampling, but barely moves
  *     the value distribution (measured on the fixture's near-dup
  *     clones: ≤ 8 bits moved vs ≥ 13 for unrelated pairs). In
  *     production this stage is replaced at the decode seam by a real
  *     decode+resize+grayscale; stage 2 is the actual dHash and is
  *     independent of where the grid came from.
  *  2. COMPARE — bit (r·8+c) is set iff grid[r][c+1] > grid[r][c]:
  *     8 rows × 9 samples → 8 comparisons/row → 64 bits.
  *
  * Same rationale as [[SimHash64]] for being a native expression: the
  * per-row work is a tight primitive loop (one counting-sort pass + 64
  * compares) that a higher-order-function formulation would run
  * interpreted, and the whole construction is exact integer arithmetic
  * a DuckDB oracle reproduces from the hex encoding of the same payload
  * (list_sort + order-statistic indexing) — so the near-dup operator
  * built on it stays hash-checkable end to end.
  *
  * Empty payloads yield NULL (no grid exists), mirroring the oracle's
  * `octet_length > 0` guard.
  */
case class ImageHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires BINARY, got ${t.catalogString}")
    }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "imagehash64"

  override protected def nullSafeEval(a: Any): Any = {
    val bytes = a.asInstanceOf[Array[Byte]]
    if (bytes.isEmpty) null else ImageHash64.hash(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      import ImageHash64.{cols, rows, samples}
      val v = ctx.freshName("v")
      val hist = ctx.freshName("hist")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val r = ctx.freshName("r")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val b = ctx.freshName("b")
      val cum = ctx.freshName("cum")
      val t = ctx.freshName("t")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $a.length;
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $hist = new int[256];
         |  for (int $i = 0; $i < $n; $i++) $hist[$a[$i] & 0xff]++;
         |  int[] $v = new int[$samples];
         |  int $b = 0;
         |  long $cum = $hist[0];
         |  for (int $k = 0; $k < $samples; $k++) {
         |    long $t = ((long) $k * $n) / $samples;
         |    while ($cum <= $t) { $b++; $cum += $hist[$b]; }
         |    $v[$k] = $b;
         |  }
         |  long $sig = 0L;
         |  for (int $r = 0; $r < $rows; $r++) {
         |    for (int $c = 0; $c < ${cols - 1}; $c++) {
         |      if ($v[$r * $cols + $c + 1] > $v[$r * $cols + $c]) {
         |        $sig |= (1L << ($r * ${cols - 1} + $c));
         |      }
         |    }
         |  }
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): ImageHash64 = copy(child = newChild)
}

object ImageHash64 {
  /** Grid shape: 8 rows × 9 columns = 72 samples → 8×8 = 64 bits, the
    * classic dHash geometry.
    */
  val rows = 8
  val cols = 9
  val samples: Int = rows * cols

  /** Shared by the interpreted eval path; `bytes` must be non-empty.
    * The percentile grid reads order statistics off a 256-bucket
    * counting sort — one O(n) pass, no full sort; the target rank
    * t = ⌊k·n/72⌋ is monotone in k so the bucket walk never restarts.
    */
  def hash(bytes: Array[Byte]): Long = {
    val n = bytes.length
    val hist = new Array[Int](256)
    var i = 0
    while (i < n) { hist(bytes(i) & 0xff) += 1; i += 1 }
    val v = new Array[Int](samples)
    var b = 0
    var cum: Long = hist(0).toLong
    var k = 0
    while (k < samples) {
      val t = k.toLong * n / samples
      while (cum <= t) { b += 1; cum += hist(b) }
      v(k) = b
      k += 1
    }
    var sig = 0L
    var r = 0
    while (r < rows) {
      var c = 0
      while (c < cols - 1) {
        if (v(r * cols + c + 1) > v(r * cols + c))
          sig |= 1L << (r * (cols - 1) + c)
        c += 1
      }
      r += 1
    }
    sig
  }

  /** Column-API entry point over a BINARY payload column. */
  def apply(payload: Column): Column =
    ColumnBridge.column(ImageHash64(ColumnBridge.expression(payload)))
}
