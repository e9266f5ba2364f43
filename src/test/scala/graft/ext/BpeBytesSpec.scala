package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The byte-level BPE arm's capability contract on NON-ASCII input
  * (the fixture corpus is ASCII after normalization, so the zero-UNK
  * guarantee the arm exists for is proven here on multi-byte strings):
  *
  *  - byte symbolization is the UTF-8 hex-pair sequence;
  *  - ANY trained merge state is LOSSLESS: unhex(concat(symbols))
  *    round-trips Greek/CJK/astral/emoji words exactly — the zero-UNK
  *    guarantee GPT-2-style tokenizers give by construction;
  *  - the zero-merge state agrees with WordPieceGreedy's byte-fallback
  *    escape (the `<0xNN>` tokens), tying the two byte paths together.
  */
class BpeBytesSpec extends SparkSpec {
  import spark.implicits._

  /** Mixed-script fixture: 1/2/3/4-byte UTF-8 code points, including
    * an astral (surrogate-pair) one.
    */
  private val words = Seq(
    "abc", "café", "αβγαβ",
    "世界世界", "a😀b", "ßßß")

  private def wordsDf = words.zipWithIndex
    .map { case (w, i) => (w, (i % 3 + 1).toLong) }
    .toDF("w", "f")

  test("byteSymbols is the UTF-8 hex-pair sequence") {
    val got = wordsDf.select(col("w"),
        BpeOps.byteSymbols(col("w")).as("sy"))
      .as[(String, Seq[String])].collect().toMap
    for (w <- words) {
      val expect = w.getBytes("UTF-8")
        .map(b => f"${b & 0xff}%02X".toUpperCase).toSeq
      assert(got(w) == expect, s"symbols of '$w'")
    }
  }

  test("trained byte merges round-trip every word losslessly") {
    val merges = BpeOps.trainLoop(spark, wordsDf,
      budget = 64, maxRounds = 8, symbolize = BpeOps.byteSymbols _)
    assert(merges.nonEmpty, "fixture must train at least one merge")
    val rounds = merges.groupBy(_._2).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._1).map(m => (m._3, m._4, m._5)))
    val folded = rounds.foldLeft(BpeOps.byteSymbols(col("w"))) {
      (sy, pairs) => graft.functions.BpeMergeFold(sy, pairs)
    }
    val rt = wordsDf.select(col("w"), folded.as("sy"))
      .select(col("w"), col("sy"),
        decode(unhex(concat_ws("", col("sy"))), "UTF-8").as("back"))
      .as[(String, Seq[String], String)].collect()
    for ((w, sy, back) <- rt) {
      assert(back == w, s"round trip of '$w' via $sy")
      assert(sy.nonEmpty && sy.exists(_.length > 2),
        s"'$w' must use at least one MERGED symbol: $sy")
    }
  }

  test("zero-merge state == WordPieceGreedy byte-fallback escape") {
    // empty vocabulary: WordPiece can match nothing, so byte fallback
    // escapes every code point as <0xNN> tokens — exactly the byte-BPE
    // zero-merge symbol stream under the hex↔<0xNN> renaming
    val both = wordsDf.select(col("w"),
        BpeOps.byteSymbols(col("w")).as("bpe"),
        graft.functions.WordPieceGreedy.byteFallback(col("w"), Nil)
          .as("wp"))
      .as[(String, Seq[String], Seq[String])].collect()
    for ((w, bpe, wp) <- both) {
      assert(wp == bpe.map(h => s"<0x$h>"), s"parity on '$w'")
    }
  }

  test("ASCII corpus: byte merges are the hex image of char merges") {
    // on a pure-ASCII corpus the two arms are isomorphic (each char is
    // one byte); training must agree under the char→hex renaming
    val ascii = Seq(("banana", 3L), ("bandana", 2L), ("cabana", 1L))
      .toDF("w", "f")
    def hexOf(s: String) = s.getBytes("UTF-8")
      .map(b => f"${b & 0xff}%02X".toUpperCase).mkString
    val charM = BpeOps.trainLoop(spark, ascii, budget = 16, maxRounds = 4)
    val byteM = BpeOps.trainLoop(spark, ascii, budget = 16, maxRounds = 4,
      symbolize = BpeOps.byteSymbols _)
    assert(byteM.map(m => (m._1, m._2, m._3, m._4, m._5, m._6)) ==
      charM.map(m => (m._1, m._2, hexOf(m._3), hexOf(m._4),
        hexOf(m._5), m._6)))
  }
}
