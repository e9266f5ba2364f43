package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.DedupOps

/** Compile gate for every native codegen expression.
  *
  * Round-3 postmortem: SimHash64's generated Java failed Janino
  * compilation on every run, and no test noticed — Spark logged the
  * CompileException and silently fell back to interpreted eval, so all
  * value-equality specs stayed green while the expression's entire
  * purpose (fused whole-stage codegen) was dead. This suite closes that
  * class of hole: each native expression is evaluated with codegen
  * fallback DISABLED, so a generated-code compile failure fails the
  * suite instead of degrading silently.
  *
  * Two codegen paths are gated, because they fail differently:
  *  - whole-stage (`spark.sql.codegen.wholeStage=true` +
  *    `spark.sql.codegen.fallback=false`): the expression's doGenCode is
  *    inlined into the fused stage; Janino errors throw instead of
  *    falling back to the interpreted stage.
  *  - non-whole-stage (`wholeStage=false` +
  *    `spark.sql.codegen.factoryMode=CODEGEN_ONLY`): ProjectExec builds
  *    an UnsafeProjection via the codegen factory, which in CODEGEN_ONLY
  *    mode propagates compile failures.
  *
  * ConvertToLocalRelation is excluded so the optimizer can't constant-fold
  * the tiny literal inputs through the INTERPRETED projection it uses —
  * that would bypass codegen entirely and void the gate.
  *
  * Values from both gated paths are also checked against the interpreted
  * path (factoryMode=NO_CODEGEN), so doGenCode and nullSafeEval can't
  * drift.
  */
class CodegenGateSpec extends SparkSpec {

  private val noLocalRelFold =
    "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation"

  private def expressions: Seq[(String, () => DataFrame)] = {
    import spark.implicits._
    Seq(
      ("ShingleHashes", () =>
        Seq("the quick brown fox jumps", "abc", "a", "")
          .toDF("norm")
          .select(ShingleHashes(col("norm"), DedupOps.shingleLen,
            distinct = true).as("out"))),
      ("SimHash64", () =>
        Seq("the quick brown fox", "lorem ipsum dolor", "x", "")
          .toDF("text")
          .select(SimHash64(split(col("text"), " ")).as("out"))),
      ("MinHashSignature", () =>
        Seq("the quick brown fox jumps over the lazy dog", "hello world!")
          .toDF("norm")
          .select(MinHashSignature(
            ShingleHashes(col("norm"), DedupOps.shingleLen,
              distinct = true)).as("out"))),
      ("HyperplaneBuckets", () =>
        Seq(Seq(0.25, -0.5, 0.75, 1.0), Seq(-1.0, 0.0, 0.5, -0.25))
          .toDF("v")
          .select(HyperplaneBuckets(col("v")).as("out"))),
      ("CosineSimilarity", () =>
        Seq((Seq(1.0, 2.0, 3.0), Seq(-1.0, 0.5, 2.0)),
            (Seq(0.5, 0.5, 0.5), Seq(1.0, 1.0, 1.0)))
          .toDF("a", "b")
          .select(CosineSimilarity(col("a"), col("b")).as("out"))),
      ("SortedIntersectCount", () =>
        Seq((Seq(1L, 4L, 9L, 16L), Seq(2L, 4L, 16L, 32L)),
            (Seq.empty[Long], Seq(1L, 2L)))
          .toDF("a", "b")
          .select(SortedIntersectCount(col("a"), col("b")).as("out"))),
      ("ImageHash64", () =>
        Seq("the quick brown fox", "lorem ipsum", "x", "")
          .toDF("text")
          .select(ImageHash64(col("text").cast("binary")).as("out"))),
      ("AudioFp64", () =>
        Seq("the quick brown fox", "lorem ipsum", "x", "")
          .toDF("text")
          .select(AudioFp64(col("text").cast("binary")).as("out"))),
      ("RandomProject", () =>
        Seq(Seq(0.25, -0.5, 0.75, 1.0), Seq(-1.0, 0.0, 0.5, -0.25))
          .toDF("v")
          .select(RandomProject(col("v")).as("out"))),
      ("UnicodeNorm", () =>
        Seq("MiXeD Case", "e\u0301 decomposed vs \u00e9 composed", "\uFF21\uFF22 full-width", "")
          .toDF("text")
          .select(UnicodeNorm(col("text")).as("out"),
            UnicodeNorm.folded(col("text")).as("folded"))),
      ("HtmlExtract", () =>
        Seq("<p>a &amp; b</p>", "no markup", "un<closed", "&amp;lt;", "")
          .toDF("html")
          .select(HtmlExtract(col("html")).as("out"))),
      ("Md5Bucket", () =>
        Seq("the", "quick brown", "", "fox jumps over")
          .toDF("g")
          .select(Md5Bucket(col("g"),
            graft.ext.SampleOps.dsirBuckets).as("out"))),
      ("BpeMergeFold", () =>
        Seq("banana", "aaaaa", "b", "", "cabab")
          .toDF("w")
          .select(BpeMergeFold(split(col("w"), ""),
            Seq(("a", "n", "an"), ("c", "d", "cd"))).as("out"))),
      ("WordPieceGreedy", () =>
        Seq("lowest", "low", "er", "newest", "zz", "")
          .toDF("w")
          .select(WordPieceGreedy(col("w"),
            Seq("l", "o", "w", "e", "s", "t", "n", "r",
              "low", "est", "er")).as("out"))),
      ("UnigramViterbi", () =>
        Seq("lowest", "low", "er", "newest", "zz", "")
          .toDF("w")
          .select(UnigramViterbi(col("w"),
            Seq("l" -> 9L, "o" -> 9L, "w" -> 9L, "e" -> 9L, "s" -> 9L,
              "t" -> 9L, "n" -> 9L, "r" -> 9L, "low" -> 5L, "est" -> 4L,
              "er" -> 3L)).as("out"))))
  }

  /** Collect under a conf overlay, restoring prior values afterwards. */
  private def collectUnder(conf: Map[String, String])
                          (mk: () => DataFrame): Seq[Row] = {
    val prev = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    try mk().collect().toSeq
    finally prev.foreach { case (k, vOpt) =>
      vOpt.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  private val interpretedConf = Map(
    "spark.sql.codegen.wholeStage" -> "false",
    "spark.sql.codegen.factoryMode" -> "NO_CODEGEN",
    "spark.sql.optimizer.excludedRules" -> noLocalRelFold)

  private val wholeStageGate = Map(
    "spark.sql.codegen.wholeStage" -> "true",
    "spark.sql.codegen.fallback" -> "false",
    "spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY",
    "spark.sql.optimizer.excludedRules" -> noLocalRelFold)

  private val projectionGate = Map(
    "spark.sql.codegen.wholeStage" -> "false",
    "spark.sql.codegen.fallback" -> "false",
    "spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY",
    "spark.sql.optimizer.excludedRules" -> noLocalRelFold)

  for ((name, mk) <- expressions) {
    test(s"$name compiles under whole-stage codegen (no silent fallback)") {
      val expected = collectUnder(interpretedConf)(mk)
      val got = collectUnder(wholeStageGate)(mk)
      assert(got == expected, s"$name codegen values diverge from eval")
    }

    test(s"$name compiles as a CODEGEN_ONLY unsafe projection") {
      val expected = collectUnder(interpretedConf)(mk)
      val got = collectUnder(projectionGate)(mk)
      assert(got == expected, s"$name codegen values diverge from eval")
    }
  }
}
