package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression computing a 64-bit SimHash signature over a
  * token array in ONE fused pass, with whole-stage codegen.
  *
  * Why a custom Expression (SURVEY §7.3, same rationale as
  * [[CosineSimilarity]]): the composable form — `aggregate(tokens, ...)`
  * folding a 64-element vote array through `zip_with` per token — is a
  * higher-order lambda chain that Spark evaluates INTERPRETED, and it was
  * the per-doc hot loop of the simhash near-dup query. This expression
  * hashes each token once and updates 64 vote counters in a tight loop.
  *
  * Hash contract (the DuckDB-twin family of graft.ext.DedupOps): per
  * token, two polynomial codepoint folds h = Σ c·base^j mod P (base
  * 31/37, P = 2³¹−1), each passed through a fixed affine mix mod P, packed
  * as g31·2³¹ | g37 — a 62-bit hash whose exact integer arithmetic DuckDB
  * reproduces, making the whole near-dup operator oracle-checkable. Bits
  * 62–63 are structurally zero: their votes are always −n so they never
  * set signature bits, identically in both engines (a 62-bit effective
  * SimHash; Hamming distances are unaffected as both engines agree).
  *
  * The affine mix matters: polynomial folds of SHORT tokens are small
  * integers with most high bits zero, which would bias every vote toward
  * −1; the affine map spreads them across [0, P) (standard LCG mixing
  * constants — public domain since Knuth).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<STRING>, got ${t.catalogString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Long](64)
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = SimHash64.tokenHash62(arr.getUTF8String(j).toString)
        var i = 0
        while (i < 64) {
          votes(i) += (if (((h >>> i) & 1L) == 1L) 1L else -1L)
          i += 1
        }
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0L) sig |= (1L << i); i += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      import SimHash64._
      val votes = ctx.freshName("votes")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val h31 = ctx.freshName("h31")
      val h37 = ctx.freshName("h37")
      val g31 = ctx.freshName("g31")
      val g37 = ctx.freshName("g37")
      val h = ctx.freshName("h")
      val cp = ctx.freshName("cp")
      val idx = ctx.freshName("idx")
      val sig = ctx.freshName("sig")
      s"""
         |long[] $votes = new long[64];
         |for (int $j = 0; $j < $a.numElements(); $j++) {
         |  if ($a.isNullAt($j)) continue;
         |  String $s = $a.getUTF8String($j).toString();
         |  long $h31 = 0L; long $h37 = 0L;
         |  int $idx = 0;
         |  while ($idx < $s.length()) {
         |    int $cp = $s.codePointAt($idx);
         |    $idx += java.lang.Character.charCount($cp);
         |    $h31 = ($h31 * 31L + $cp) % ${P}L;
         |    $h37 = ($h37 * 37L + $cp) % ${P}L;
         |  }
         |  long $g31 = (${A31}L * $h31 + ${B31}L) % ${P}L;
         |  long $g37 = (${A37}L * $h37 + ${B37}L) % ${P}L;
         |  long $h = ($g31 << 31) | $g37;
         |  for (int $i = 0; $i < 64; $i++) {
         |    $votes[$i] += (($h >>> $i) & 1L) == 1L ? 1L : -1L;
         |  }
         |}
         |long $sig = 0L;
         |for (int $i = 0; $i < 64; $i++) {
         |  if ($votes[$i] > 0L) $sig |= (1L << $i);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): SimHash64 = copy(child = newChild)
}

object SimHash64 {
  /** 2³¹−1 — the shared modulus of the DuckDB-twin hash family. */
  val P = 2147483647L
  /** Affine mixing constants (classic public LCG multipliers/increments). */
  val A31 = 1103515245L
  val B31 = 12345L
  val A37 = 69069L
  val B37 = 362437L

  /** The per-token hash, shared by the interpreted eval path. Codepoint
    * iteration matches Spark's `ascii()` / DuckDB's `ord()` per character.
    */
  def tokenHash62(s: String): Long = {
    var h31 = 0L; var h37 = 0L
    var idx = 0
    while (idx < s.length) {
      val cp = s.codePointAt(idx)
      idx += Character.charCount(cp)
      h31 = (h31 * 31L + cp) % P
      h37 = (h37 * 37L + cp) % P
    }
    (((A31 * h31 + B31) % P) << 31) | ((A37 * h37 + B37) % P)
  }

  /** Column-API entry point over an ARRAY<STRING> token column. */
  def apply(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
}
