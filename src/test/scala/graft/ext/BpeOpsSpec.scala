package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Independent driver-side BATCHED BPE (rank top-C pairs, greedily
    * accept symbol-disjoint ones, apply the batch in one left-to-right
    * pass) — the semantics both the Spark job and the SQL oracle must
    * reproduce.
    */
  private def referenceBpe(words: Map[String, Long])
      : Seq[(Int, Int, String, String, String, Long)] = {
    def mergeBatch(sym: List[String],
                   pairs: Seq[(String, String, String)]): List[String] =
      sym.foldLeft(List.empty[String]) { (acc, s) =>
        pairs.find { case (a, b, _) =>
          acc.nonEmpty && acc.last == a && s == b
        } match {
          case Some((_, _, ab)) => acc.init :+ ab
          case None             => acc :+ s
        }
      }
    var corpus = words.map { case (w, f) => w -> (w.split("").toList, f) }
    val out = Seq.newBuilder[(Int, Int, String, String, String, Long)]
    var total = 0
    var round = 0
    var dry = false
    while (round < BpeOps.bpeRounds && total < BpeOps.bpeMerges && !dry) {
      val counts = corpus.values.toSeq.flatMap { case (sym, f) =>
        sym.zip(sym.tail).map(p => p -> f)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      if (counts.isEmpty) dry = true
      else {
        val cands = counts.toSeq
          .map { case ((a, b), f) => (a, b, f) }
          .sortBy { case (a, b, f) => (-f, a, b) }
          .take(BpeOps.bpeCandidates)
        var used = Set.empty[String]
        var n = 0
        val accepted = cands.flatMap { case (a, b, f) =>
          val ab = a + b
          if (n < BpeOps.bpeMerges - total &&
              !used(a) && !used(b) && !used(ab)) {
            used ++= Seq(a, b, ab); n += 1
            Some((a, b, ab, f))
          } else None
        }
        accepted.zipWithIndex.foreach { case ((a, b, ab, f), i) =>
          out += ((total + i, round, a, b, ab, f))
        }
        corpus = corpus.map { case (w, (sym, fq)) =>
          w -> (mergeBatch(sym, accepted.map(t => (t._1, t._2, t._3))), fq)
        }
        total += accepted.size
        round += 1
      }
    }
    out.result()
  }

  test("bpeTrain reproduces the reference batched merge chain; reaches " +
      "the full budget in far fewer rounds") {
    val words = TextOps.documents(spark, sfDir)
      .select(TextOps.normText(col("text")).as("n")).as[String].collect()
      .flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = referenceBpe(words)
    val got = BpeOps.bpeTrain(spark, sfDir)
      .select("merge_idx", "batch_round", "a", "b", "ab", "pair_freq")
      .as[(Long, Long, String, String, String, Long)].collect()
      .sortBy(_._1)
    assert(got.length == expected.length)
    got.zip(expected).foreach {
      case ((i, r, a, b, ab, f), (ei, er, ea, eb, eab, ef)) =>
        assert(i == ei && r == er && a == ea && b == eb && f == ef,
          s"merge $i: got (r$r $a,$b,$f) expected (r$er $ea,$eb,$ef)")
        assert(ab == a + b && ab == eab)
    }
    // training runs to the budget OR to corpus exhaustion (the fixture's
    // 31-word vocabulary dries at 89 merges; the reference recompute
    // stops at exactly the same point — BpeScaleSpec exercises the full
    // 1024 budget on a large synthetic vocabulary)
    assert(got.length == expected.length &&
      (got.length == BpeOps.bpeMerges || expected.length < BpeOps.bpeMerges),
      s"trained ${got.length} merges, reference ${expected.length}, " +
        s"budget ${BpeOps.bpeMerges}")
    // ... in strictly fewer rounds than merges — the batching win
    val roundsUsed = got.map(_._2).distinct.length
    assert(roundsUsed * 2 < got.length,
      s"$roundsUsed rounds for ${got.length} merges — batching not engaged")
    // within a round, accepted pairs are symbol-disjoint ACROSS merges
    // (the invariant that makes one-pass batch application sound; a
    // single merge may repeat a symbol internally — (g,g)→gg is fine)
    got.groupBy(_._2).values.foreach { rnd =>
      val sets = rnd.map(m => Set(m._3, m._4, m._5)).toSeq
      for (Seq(x, y) <- sets.combinations(2))
        assert((x & y).isEmpty,
          s"round ${rnd.head._2} accepted conflicting pairs: $x vs $y")
    }
    // later rounds must merge MERGED symbols (multi-char operands prove
    // the chain is really iterative, not one-shot pair counting)
    assert(got.exists { case (_, _, a, b, _, _) =>
      a.length > 1 || b.length > 1 })
  }

  test("bpeEncode counts match re-segmenting each doc one merge at a time") {
    // the spec applies merges SEQUENTIALLY in merge_idx order; the Spark
    // side applies each round's batch in ONE fold pass — agreement here
    // is the non-interaction property under test
    val mergeRows = BpeOps.bpeTrain(spark, sfDir)
      .orderBy("merge_idx")
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

  test("greedy one-pass fold equals double-space replace AND the " +
      "first-occurrence fixpoint, including identical-symbol runs >= 5") {
    // three formulations must agree: the Spark fold (arrays), the
    // oracle's replace() over DOUBLE-SPACE delimited strings (one space
    // consumed from each boundary per match, so left-to-right
    // non-overlapping replace ≡ the fold), and the first-occurrence
    // fixpoint. A replace-all over SINGLE-space strings is NOT
    // equivalent: on 'aaaaa' it yields [aa a aa] vs the fold's
    // [aa aa a] (consecutive matches share the boundary space).
    def fold(sym: List[String], a: String, b: String): List[String] =
      sym.foldLeft(List.empty[String]) { (acc, s) =>
        if (acc.nonEmpty && acc.last == a && s == b) acc.init :+ (a + b)
        else acc :+ s
      }
    def viaReplace(sym: List[String], a: String, b: String): List[String] = {
      val s = " " + sym.mkString("  ") + " "
      s.replace(s" $a  $b ", s" ${a + b} ")
        .split(" ").filter(_.nonEmpty).toList
    }
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
    for ((word, a, b) <- Seq(("aaa", "a", "a"), ("abab", "a", "b"),
                             ("baab", "a", "b"), ("aaaa", "a", "a"),
                             ("aaaaa", "a", "a"), ("aaaaaa", "a", "a"),
                             ("aaaaaaa", "a", "a"), ("baaaaab", "a", "a"),
                             ("ababab", "a", "b"), ("aabaaa", "a", "a"))) {
      val sym = word.split("").toList
      val viaFold = fold(sym, a, b)
      assert(viaReplace(sym, a, b) == viaFold,
        s"$word: replace=${viaReplace(sym, a, b)} fold=$viaFold")
      val viaFix = fixpoint(
        " " + sym.mkString(" ") + " ", a, b, a + b).trim
        .split(" ").filter(_.nonEmpty).toList
      assert(viaFix == viaFold, s"$word: fixpoint=$viaFix fold=$viaFold")
    }
    // and the single-space replace-all really does diverge on runs >= 5
    // — the trap the double-space form exists to avoid
    def replaceAllSingle(s0: String, a: String, b: String,
                         ab: String): String = {
      var s = s0; var prev = ""
      while (s != prev) { prev = s; s = s.replace(s" $a $b ", s" $ab ") }
      s
    }
    assert(replaceAllSingle(" a a a a a ", "a", "a", "aa").trim != "aa aa a")
  }

  test("native BpeMergeFold ≡ the higher-order lambda fold on every " +
      "word shape (runs, overlaps, batch width, empties)") {
    // the compiled expression replaced the interpreted aggregate() in
    // the hot path; equivalence on a symbol-disjoint batch is the
    // contract (plus first-occurrence behavior on identical-symbol runs)
    val disjoint = Seq(("a", "a", "aa"), ("b", "c", "bc"),
      ("d", "e", "de")) // {a,aa},{b,bc},{d,de} pairwise symbol-disjoint
    val words = Seq("aaaaa", "abcde", "bcbcbc", "edcba", "aabbcc",
      "", "a", "zz", "abcabcde", "dedede", "aaabc")
    val df = words.toDF("w").select(col("w"), split(col("w"), "").as("sy"))
    val viaNative = df.select(col("w"),
        graft.functions.BpeMergeFold(col("sy"), disjoint).as("o"))
      .as[(String, Seq[String])].collect().toMap
    val viaLambda = df.select(col("w"),
        BpeOps.mergeFoldBatch(col("sy"), disjoint).as("o"))
      .as[(String, Seq[String])].collect().toMap
    assert(viaNative == viaLambda,
      words.map(w => s"$w: ${viaNative(w)} vs ${viaLambda(w)}").mkString("; "))
  }

  test("selectBatch accepts by rank, rejects symbol conflicts, caps budget") {
    // (e,r) conflicts with (h,e) via 'e' ONLY if (h,e) was ACCEPTED —
    // greedy-accepted semantics, not conflicts-with-any-higher-ranked
    val cands = Seq(
      ("t", "h", 100L), // accept: th
      ("h", "e", 90L),  // reject: h used
      ("i", "n", 80L),  // accept: in
      ("e", "r", 70L),  // accept: er (e,r untouched — (h,e) was rejected)
      ("a", "n", 60L),  // reject: n used
      ("e", "e", 50L),  // reject: e used
      ("o", "u", 40L))  // accept: ou
    val got = BpeOps.selectBatch(cands, remaining = 10)
    assert(got == Seq(("t", "h", "th", 100L), ("i", "n", "in", 80L),
      ("e", "r", "er", 70L), ("o", "u", "ou", 40L)))
    // the budget cap stops acceptance mid-rank but keeps scanning nothing
    val capped = BpeOps.selectBatch(cands, remaining = 2)
    assert(capped == Seq(("t", "h", "th", 100L), ("i", "n", "in", 80L)))
    // a pair whose output symbol collides with an accepted operand is
    // rejected too (ab in the conflict set keeps batches cascade-free)
    val cascade = Seq(("a", "b", 10L), ("ab", "c", 9L), ("c", "d", 8L))
    assert(BpeOps.selectBatch(cascade, 10) ==
      Seq(("a", "b", "ab", 10L), ("c", "d", "cd", 8L)))
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

  test("wordpiece greedy matches a driver reimplementation; UNK on gaps") {
    import graft.functions.WordPieceGreedy
    val vocab = Seq("a", "b", "c", "ab", "bc", "abc", "bcb")
    def refEncode(w: String): Seq[String] = {
      val maxLen = vocab.map(_.length).max
      val out = Seq.newBuilder[String]
      var pos = 0
      while (pos < w.length) {
        val hit = (math.min(maxLen, w.length - pos) to 1 by -1)
          .map(l => w.substring(pos, pos + l)).find(vocab.contains)
        hit match {
          case None => return Seq("[UNK]")
          case Some(t) => out += t; pos += t.length
        }
      }
      out.result()
    }
    val words = Seq("abc", "abcb", "cab", "bbb", "azb", "", "abcbcabc")
    val got = words.toDF("w")
      .select(col("w"), WordPieceGreedy(col("w"), vocab).as("p"))
      .as[(String, Seq[String])].collect().toMap
    for (w <- words)
      assert(got(w) == refEncode(w), s"$w: ${got(w)} vs ${refEncode(w)}")
    // the greedy/merge-order disagreement this operator exists to expose:
    // greedy takes the longest prefix 'abc' + UNK-free tail, while a
    // (b,c)-first merge path would segment a|bc|b
    assert(got("abcb") == Seq("abc", "b"))
    // unseen alphabet → whole-word UNK, not a partial emit
    assert(got("azb") == Seq("[UNK]"))
  }

  test("wordpiece corpus encode: per-word consistency and zero UNKs") {
    val enc = BpeOps.wordpieceEncode(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
    assert(enc.nonEmpty)
    for ((id, nWords, nWp, nUnk) <- enc) {
      assert(nUnk == 0, s"doc $id: UNK on the training corpus")
      assert(nWp >= nWords, s"doc $id: a word produced < 1 piece")
    }
    // greedy over the BPE vocab can never need more pieces than
    // characters; tie to the doc dimension
    val chars = TextOps.documents(spark, sfDir)
      .select("doc_id", "n_chars").as[(Long, Long)].collect().toMap
    for ((id, _, nWp, _) <- enc)
      assert(nWp <= chars(id), s"doc $id: more pieces than characters")
  }

  test("byte fallback: zero UNK on arbitrary UTF-8, and the pieces " +
      "round-trip to the original bytes") {
    import graft.functions.WordPieceGreedy
    val vocab = Seq("a", "b", "ab", "he", "llo")
    // Latin with diacritics, Greek, CJK, and an ASTRAL emoji (4-byte
    // UTF-8, a surrogate pair in the JVM) — none matchable beyond the
    // ascii vocab entries
    val words = Seq("ab12", "héllo", "καλημέρα", "日本語ab", "a😀b", "𝕏")
    val got = words.toDF("w")
      .select(col("w"),
        WordPieceGreedy.byteFallback(col("w"), vocab).as("p"))
      .as[(String, Seq[String])].collect().toMap
    val byteTok = "<0x([0-9A-F]{2})>".r
    for (w <- words) {
      val pieces = got(w)
      assert(!pieces.contains("[UNK]"), s"$w: $pieces")
      // decode: byte tokens to their byte, others to their UTF-8 bytes
      val bytes = pieces.flatMap {
        case byteTok(h) => Seq(Integer.parseInt(h, 16).toByte)
        case t =>
          assert(vocab.contains(t), s"$w: non-vocab piece $t")
          t.getBytes("UTF-8").toSeq
      }.toArray
      assert(new String(bytes, "UTF-8") == w,
        s"$w round-trip broke: $pieces")
    }
    // mid-word escape and RESUME: greedy matches 'ab', bytes the
    // digits, never collapses the word
    assert(got("ab12") == Seq("ab", "<0x31>", "<0x32>"))
    // an astral code point is ONE fallback unit of four bytes
    assert(got("𝕏").length == 4 && got("𝕏").forall(_.startsWith("<0x")))
    // with full coverage the flag is equivalent to plain wordpiece
    val both = Seq("abab", "ab").toDF("w")
      .select(WordPieceGreedy(col("w"), vocab).as("p"),
        WordPieceGreedy.byteFallback(col("w"), vocab).as("q"))
      .as[(Seq[String], Seq[String])].collect()
    both.foreach { case (p, q) => assert(p == q) }
  }

  test("byte-fallback corpus encode: no word collapses, fallback " +
      "words are exactly the hole-bearing ones") {
    val enc = BpeOps.wordpieceEncodeByteFallback(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
    assert(enc.nonEmpty)
    // driver truth: which docs contain hole-character ('e' or digit)
    // words, and the shared word counts
    val docs = TextOps.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val words = docs.map { case (id, text) =>
      val norm = text.replaceAll("\\s+", " ").trim
        .toLowerCase(java.util.Locale.ROOT)
      id -> norm.split(" ").filter(_.nonEmpty).toSeq
    }.toMap
    var fallbackSeen = 0L
    for ((id, nWords, nBf, nFb) <- enc) {
      assert(nWords == words(id).size.toLong, s"doc $id word count")
      val expFb = words(id)
        .count(_.exists(c => c == 'e' || (c >= '0' && c <= '9'))).toLong
      assert(nFb == expFb, s"doc $id: fallback words $nFb != $expFb")
      // every word still yields >= 1 piece — nothing collapsed to UNK
      assert(nBf >= nWords, s"doc $id")
      fallbackSeen += nFb
    }
    assert(fallbackSeen > 0L,
      "fixture never exercised the fallback path — the vocab hole is gone")
  }

}
