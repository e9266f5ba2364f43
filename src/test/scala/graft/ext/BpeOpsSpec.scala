package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Independent driver-side BPE (greedy left-to-right merge, lexicographic
    * tie-break) — the semantics both the Spark job and the SQL oracle must
    * reproduce.
    */
  private def referenceBpe(words: Map[String, Long],
                           rounds: Int): Seq[(Int, String, String, Long)] = {
    def mergeWord(sym: List[String], a: String, b: String): List[String] =
      sym.foldLeft(List.empty[String]) { (acc, s) =>
        if (acc.nonEmpty && acc.last == a && s == b)
          acc.init :+ (a + b)
        else acc :+ s
      }
    var corpus = words.map { case (w, f) => w -> (w.split("").toList, f) }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 0 until rounds) {
      val counts = corpus.values.toSeq.flatMap { case (sym, f) =>
        sym.zip(sym.tail).map(p => p -> f)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      if (counts.nonEmpty) {
        val ((a, b), f) = counts.minBy { case ((x, y), c) => (-c, x, y) }
        out += ((r, a, b, f))
        corpus = corpus.map { case (w, (sym, fq)) =>
          w -> (mergeWord(sym, a, b), fq)
        }
      }
    }
    out.result()
  }

  test("bpeTrain reproduces the reference merge chain on fixture text") {
    val words = TextOps.documents(spark, sfDir)
      .select(TextOps.normText(col("text")).as("n")).as[String].collect()
      .flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = referenceBpe(words, BpeOps.bpeMerges)
    val got = BpeOps.bpeTrain(spark, sfDir)
      .select("round", "a", "b", "ab", "pair_freq")
      .as[(Long, String, String, String, Long)].collect().sortBy(_._1)
    assert(got.length == expected.length)
    got.zip(expected).foreach {
      case ((r, a, b, ab, f), (er, ea, eb, ef)) =>
        assert(r == er && a == ea && b == eb && f == ef,
          s"round $r: got ($a,$b,$f) expected ($ea,$eb,$ef)")
        assert(ab == a + b)
    }
    // later rounds must be able to merge MERGED symbols (multi-char
    // operands prove the chain is really iterative, not one-shot)
    assert(got.exists { case (_, a, b, _, _) =>
      a.length > 1 || b.length > 1 })
  }

  test("bpeEncode counts match re-segmenting each doc with the merges") {
    val mergeRows = BpeOps.bpeTrain(spark, sfDir)
      .select("a", "b").as[(String, String)].collect()
    def segment(w: String): Int =
      mergeRows.foldLeft(w.split("").toList) { case (sym, (a, b)) =>
        sym.foldLeft(List.empty[String]) { (acc, s) =>
          if (acc.nonEmpty && acc.last == a && s == b) acc.init :+ (a + b)
          else acc :+ s
        }
      }.length
    val docs = TextOps.documents(spark, sfDir)
      .select(col("doc_id"), TextOps.normText(col("text")).as("n"))
      .as[(Long, String)].collect()
    val got = BpeOps.bpeEncode(spark, sfDir)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length == docs.length)
    val expected = docs.map { case (id, n) =>
      val ws = n.split(" ").filter(_.nonEmpty)
      (id, ws.length.toLong, ws.map(segment(_).toLong).sum)
    }.sortBy(_._1)
    assert(got.toSeq == expected.toSeq)
    // merging must actually compress: fewer BPE tokens than characters
    val chars = docs.map(_._2.count(_ != ' ').toLong).sum
    assert(got.map(_._3).sum < chars)
  }

  test("greedy one-pass fold equals the first-occurrence fixpoint, " +
      "including identical-symbol runs >= 5") {
    // the two formulations the Spark side and the oracle use must agree
    // on the overlap edge cases. The oracle iterates FIRST-OCCURRENCE
    // single replacement (the model below) — a replace-ALL fixpoint is
    // NOT equivalent: on 'aaaaa' it yields [aa a aa] vs the fold's
    // [aa aa a], and on 'aaaaaa' 4 symbols vs the fold's 3 (the
    // replace-all match consumes the shared boundary space, skipping
    // the adjacent overlapping pair).
    def fixpoint(s0: String, a: String, b: String, ab: String): String = {
      val pat = s" $a $b "
      var s = s0
      var i = s.indexOf(pat)
      while (i >= 0) {
        s = s.substring(0, i) + s" $ab " + s.substring(i + pat.length)
        i = s.indexOf(pat)
      }
      s
    }
    def fold(sym: List[String], a: String, b: String): List[String] =
      sym.foldLeft(List.empty[String]) { (acc, s) =>
        if (acc.nonEmpty && acc.last == a && s == b) acc.init :+ (a + b)
        else acc :+ s
      }
    for ((word, a, b) <- Seq(("aaa", "a", "a"), ("abab", "a", "b"),
                             ("baab", "a", "b"), ("aaaa", "a", "a"),
                             ("aaaaa", "a", "a"), ("aaaaaa", "a", "a"),
                             ("aaaaaaa", "a", "a"), ("baaaaab", "a", "a"),
                             ("ababab", "a", "b"), ("aabaaa", "a", "a"))) {
      val sym = word.split("").toList
      val viaFold = fold(sym, a, b).mkString(" ")
      val viaFix = fixpoint(
        " " + sym.mkString(" ") + " ", a, b, a + b).trim
      assert(viaFold == viaFix, s"$word: fold=$viaFold fixpoint=$viaFix")
    }
    // and the old replace-all model really does diverge on runs >= 5 —
    // the regression this test exists to block
    def replaceAll(s0: String, a: String, b: String, ab: String): String = {
      var s = s0; var prev = ""
      while (s != prev) { prev = s; s = s.replace(s" $a $b ", s" $ab ") }
      s
    }
    assert(replaceAll(" a a a a a ", "a", "a", "aa").trim != "aa aa a")
  }

  test("compression ratio is the exact per-lang rollup of bpeEncode") {
    val enc = BpeOps.bpeEncode(spark, sfDir)
      .as[(Long, Long, Long)].collect().map { case (id, _, t) => id -> t }.toMap
    val docs = TextOps.documents(spark, sfDir)
      .select("doc_id", "lang", "n_chars").as[(Long, String, Long)].collect()
    val exp = docs.groupBy(_._2).map { case (lang, rows) =>
      val chars = rows.map(_._3).sum
      val toks = rows.map(r => enc(r._1)).sum
      (lang, rows.length.toLong, chars, toks,
        chars.toDouble / math.max(toks.toDouble, 1.0))
    }.toSet
    val got = BpeOps.compressionRatio(spark, sfDir)
      .as[(String, Long, Long, Long, Double)].collect().toSet
    assert(got == exp)
  }

}
