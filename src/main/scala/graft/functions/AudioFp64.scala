package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native Catalyst expression computing a 64-bit SPECTRAL-BAND audio
  * fingerprint over a binary payload, with whole-stage codegen — the
  * audio member of the perceptual-fingerprint family
  * ([[ImageHash64]] for stills, frame-fingerprints for video).
  *
  * The construction is the Chromaprint/Haitsma–Kalker SHAPE in exact
  * integer arithmetic:
  *
  *  1. FRAME — the payload's `n` bytes (the stand-in PCM stream; the
  *     harness container has no audio codecs, the
  *     MultimodalOps.decodeStub situation) split into
  *     [[AudioFp64.frames]] equal time windows, sample `i` landing in
  *     frame ⌊i·frames/n⌋.
  *  2. BAND — per frame, [[AudioFp64.bands]] dyadic "spectral band"
  *     energies: E[f][b] = Σ s_i·χ_b(i) with χ_b the ±1 square wave of
  *     period 2^(b+1) (sign = bit b of the sample index — the
  *     Walsh-function surrogate for a filter bank: exact, integral,
  *     and genuinely frequency-selective on periodic content). A real
  *     deployment swaps stage 1–2 at the decode seam for
  *     decode → FFT band energies; stage 3 is unchanged.
  *  3. COMPARE — bit (f·8+b) set iff |E[f][b+1]| > |E[f][b]| — the
  *     band-energy-difference bit of the Haitsma–Kalker fingerprint
  *     (gradient across bands, robust to level/gain changes the way
  *     dHash is robust to brightness).
  *
  * Exact integer arithmetic end to end, so the DuckDB oracle
  * reproduces the value from the hex encoding of the same payload
  * (byte decode → per-(frame, band) signed sums → the same 64
  * comparisons). Empty payloads yield NULL, mirroring the oracle's
  * `octet_length > 0` guard.
  */
case class AudioFp64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires BINARY, got ${t.catalogString}")
    }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "audiofp64"

  override protected def nullSafeEval(a: Any): Any = {
    val bytes = a.asInstanceOf[Array[Byte]]
    if (bytes.isEmpty) null else AudioFp64.hash(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      import AudioFp64.{bands, frames}
      val n = ctx.freshName("n")
      val e = ctx.freshName("e")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val f = ctx.freshName("f")
      val b = ctx.freshName("b")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $a.length;
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $e = new long[${frames * bands}];
         |  for (int $i = 0; $i < $n; $i++) {
         |    int $s = $a[$i] & 0xff;
         |    int $f = (int) (((long) $i * $frames) / $n);
         |    for (int $b = 0; $b < $bands; $b++) {
         |      $e[$f * $bands + $b] += ((($i >> $b) & 1) == 0) ? $s : -$s;
         |    }
         |  }
         |  long $sig = 0L;
         |  for (int $f = 0; $f < $frames; $f++) {
         |    for (int $b = 0; $b < ${bands - 1}; $b++) {
         |      long $x = Math.abs($e[$f * $bands + $b]);
         |      long $y = Math.abs($e[$f * $bands + $b + 1]);
         |      if ($y > $x) $sig |= (1L << ($f * ${bands - 1} + $b));
         |    }
         |  }
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): AudioFp64 = copy(child = newChild)
}

object AudioFp64 {
  /** 8 frames × 9 bands → 8×8 = 64 band-difference bits (the dHash
    * geometry transposed onto time×frequency).
    */
  val frames = 8
  val bands = 9

  /** Shared by the interpreted eval path; `bytes` must be non-empty.
    * One O(n·bands) pass over the payload, no allocation beyond the
    * 72-cell energy grid.
    */
  def hash(bytes: Array[Byte]): Long = {
    val n = bytes.length
    val e = new Array[Long](frames * bands)
    var i = 0
    while (i < n) {
      val s = bytes(i) & 0xff
      val f = ((i.toLong * frames) / n).toInt
      var b = 0
      while (b < bands) {
        e(f * bands + b) += (if (((i >> b) & 1) == 0) s else -s)
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var f = 0
    while (f < frames) {
      var b = 0
      while (b < bands - 1) {
        if (math.abs(e(f * bands + b + 1)) > math.abs(e(f * bands + b)))
          sig |= 1L << (f * (bands - 1) + b)
        b += 1
      }
      f += 1
    }
    sig
  }

  def apply(c: Column): Column =
    ColumnBridge.column(AudioFp64(ColumnBridge.expression(c)))
}
