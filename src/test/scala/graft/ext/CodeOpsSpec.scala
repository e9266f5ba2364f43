package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Code-vs-prose detection: both verdict arms exercised from both
  * sides on the seeded fixture, and the whole signal battery pinned
  * against a plain-Scala recomputation over the seeded strings.
  */
class CodeOpsSpec extends SparkSpec {
  import spark.implicits._

  test("seeded shapes: keyword arm fires, indent-only block does not") {
    val r = CodeOps.codeDetect(spark, sfDir)
      .select(col("doc_id"), col("kw_cnt"), col("sym_cnt"),
        col("indent_share"), col("is_code"))
      .as[(Long, Long, Long, Double, Boolean)].collect()
    assert(r.nonEmpty)
    val byMod = r.groupBy(_._1 % 8)

    // m=5: the code tail carries def/return/class → keyword arm
    val code = byMod(5L)
    assert(code.nonEmpty)
    assert(code.forall(_._2 == 3L), "seeded code tail must hit 3 keywords")
    assert(code.forall(_._5), "keyworded code must flag is_code")

    // m=2: indented data block — high indent share, ZERO symbols and
    // keywords: must NOT flag (pins the second arm's conjunction)
    val dataBlock = byMod(2L)
    assert(dataBlock.nonEmpty)
    assert(dataBlock.forall(d => d._2 == 0L && d._3 == 0L))
    assert(dataBlock.forall(_._4 >= CodeOps.minIndentShare),
      "seeded indent block must clear the indent threshold")
    assert(dataBlock.forall(!_._5),
      "indent without symbols/keywords must not flag")

    // plain prose: every signal exactly zero, never flagged
    val prose = r.filter(d => d._1 % 8 != 5 && d._1 % 8 != 2)
    assert(prose.forall(d => d._2 == 0L && d._3 == 0L && d._4 == 0.0))
    assert(prose.forall(!_._5))
  }

  test("full battery ≡ plain-Scala recomputation over seeded text") {
    val got = CodeOps.codeDetect(spark, sfDir)
      .select("doc_id", "n_lines", "sym_cnt", "kw_cnt", "indent_lines",
        "semi_lines", "symbol_ratio", "indent_share", "is_code")
      .as[(Long, Long, Long, Long, Long, Long, Double, Double, Boolean)]
      .collect().map(x => x._1 -> x).toMap
    val seeded = TextOps.documents(spark, sfDir)
      .select(col("doc_id"), CodeOps.seededText.as("t"))
      .as[(Long, String)].collect()
    assert(seeded.length == got.size)
    val kwRe = s"\\b(${CodeOps.codeKeywords.mkString("|")})\\b".r
    val symRe = CodeOps.symbolClass.r
    for ((id, t) <- seeded) {
      val lines = t.split("\n", -1)
      val nLines = lines.length.toLong
      val sym = symRe.findAllIn(t).length.toLong
      val kw = kwRe.findAllIn(t).length.toLong
      val ind = lines.count(l =>
        l.startsWith("  ") || l.startsWith("\t")).toLong
      val semi = lines.count(_.endsWith(";")).toLong
      val symRatio = sym.toDouble / math.max(t.length, 1).toDouble
      val indShare = ind.toDouble / nLines.toDouble
      val isCode = kw >= CodeOps.minKwHits ||
        (symRatio >= CodeOps.minSymbolRatio &&
          indShare >= CodeOps.minIndentShare)
      assert(got(id) == ((id, nLines, sym, kw, ind, semi,
        symRatio, indShare, isCode)), s"doc $id diverges")
    }
  }
}
