package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.UnigramViterbi

/** Pins the unigram-LM tokenizer (UnigramOps + UnigramViterbi):
  *
  *  1. the native Viterbi expression ≡ an independent driver DP
  *     reimplementation, across deterministic pseudo-random models;
  *  2. the DP value is OPTIMAL: exponential enumeration of every
  *     segmentation finds no cheaper (cost, then piece-count) cover;
  *  3. failure semantics: uncoverable word → [UNK]; empty word → [];
  *  4. capability: on a corpus built from repeated motifs, training
  *     keeps the motif pieces and encoding uses them (fewer pieces
  *     than characters — the compression unigram exists for);
  *  5. determinism + artifact: trainLoop is pure (same words → same
  *     model), and trainedPieces' parquet round trip returns exactly
  *     the in-memory training result.
  */
class UnigramOpsSpec extends SparkSpec {
  import spark.implicits._

  // driver-side mirror of UnigramViterbi.encode (JVM strings; the
  // suites stay in the BMP so String indices == code points)
  private def viterbiRef(w: String, costs: Map[String, Long])
      : Seq[String] = {
    if (w.isEmpty) return Seq.empty
    val maxLen = if (costs.isEmpty) 0 else costs.keys.map(_.length).max
    val inf = Long.MaxValue
    val len = w.length
    val v = Array.fill(len + 1)(inf); v(0) = 0L
    val n = new Array[Int](len + 1)
    val ptr = new Array[Int](len + 1)
    for (pos <- 1 to len; j <- math.max(0, pos - maxLen) until pos
         if v(j) != inf) {
      costs.get(w.substring(j, pos)).foreach { c =>
        val cv = v(j) + c; val cn = n(j) + 1
        if (cv < v(pos) || (cv == v(pos) && cn < n(pos))) {
          v(pos) = cv; n(pos) = cn; ptr(pos) = j
        }
      }
    }
    if (v(len) == inf) return Seq("[UNK]")
    val out = List.newBuilder[String]
    var stack = List.empty[String]
    var pos = len
    while (pos > 0) { stack ::= w.substring(ptr(pos), pos); pos = ptr(pos) }
    out ++= stack
    out.result()
  }

  // every segmentation of w into vocabulary pieces (exponential; tiny)
  private def allSegs(w: String, costs: Map[String, Long])
      : Seq[Seq[String]] =
    if (w.isEmpty) Seq(Seq.empty)
    else (1 to w.length).flatMap { l =>
      val h = w.substring(0, l)
      if (costs.contains(h)) allSegs(w.substring(l), costs).map(h +: _)
      else Seq.empty
    }

  private def encodeNative(words: Seq[String],
                           model: Seq[(String, Long)])
      : Map[String, Seq[String]] =
    words.toDF("w")
      .select(col("w"), UnigramViterbi(col("w"), model).as("pcs"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap

  // deterministic LCG so the property sweep needs no Random
  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L)

  test("native expression matches the driver DP on pseudo-random models") {
    val alphabet = "abcd"
    val rs = lcg(42).map(x => math.abs(x >>> 16))
    for (trial <- 0 until 8) {
      val r = rs.drop(trial * 200).take(200).toArray
      var i = 0
      def nxt(bound: Int): Int = { val x = (r(i) % bound).toInt; i += 1; x }
      val words = (0 until 12).map { _ =>
        val len = 1 + nxt(8)
        (0 until len).map(_ => alphabet(nxt(4))).mkString
      }.distinct
      val singles = alphabet.map(c => c.toString -> (10L + nxt(90)))
      val multis = (0 until 10).map { _ =>
        val len = 2 + nxt(4)
        (0 until len).map(_ => alphabet(nxt(4))).mkString
      }.distinct.map(p => p -> (1L + nxt(50)))
      val costs = (singles ++ multis).toMap
      val model = costs.toSeq
      val got = encodeNative(words, model)
      for (w <- words) {
        val want = viterbiRef(w, costs)
        assert(got(w) == want, s"word $w: got ${got(w)}, want $want")
      }
    }
  }

  test("DP value is optimal against exponential enumeration") {
    val costs = Map("a" -> 7L, "b" -> 9L, "c" -> 8L, "ab" -> 10L,
      "ba" -> 4L, "abc" -> 30L, "bc" -> 5L, "cab" -> 6L, "abab" -> 13L)
    for (w <- Seq("ababab", "abcabc", "bacab", "ccc", "abba", "cabab")) {
      val segs = allSegs(w, costs)
      assert(segs.nonEmpty, s"$w uncoverable in test vocab")
      val best = segs.map(s =>
        (s.map(costs).sum, s.length)).min
      val got = viterbiRef(w, costs)
      val native = encodeNative(Seq(w), costs.toSeq)(w)
      assert(native == got)
      assert((got.map(costs).sum, got.length) == best,
        s"$w: DP ${(got.map(costs).sum, got.length)} vs best $best")
    }
  }

  test("uncoverable word degrades to [UNK]; empty word to []") {
    val model = Seq("a" -> 5L, "ab" -> 3L)
    val got = encodeNative(Seq("axa", "a", ""), model)
    assert(got("axa") == Seq("[UNK]"))
    assert(got("a") == Seq("a"))
    assert(got("") == Seq.empty)
  }

  test("training keeps motif pieces and encoding compresses with them") {
    // motifs 'kura' and 'zemi' dominate; chars alone are rare fillers
    val words = Seq.fill(40)("kurakura") ++ Seq.fill(40)("zemizemi") ++
      Seq.fill(30)("kurazemi") ++ Seq.fill(3)("qvxw")
    val wdf = words.toDF("w").groupBy("w").agg(count(lit(1)).as("f"))
    val model = UnigramOps.trainLoop(spark, wdf)
    val byPiece = model.map(e => e._1 -> e._3).toMap
    assert(byPiece.contains("kura") || byPiece.contains("kurakura"),
      s"motif lost: ${model.map(_._1).filter(_.length > 1).sorted}")
    // every corpus char survives (coverage smoothing)
    for (c <- words.flatten.distinct)
      assert(byPiece.contains(c.toString), s"char $c dropped")
    val enc = encodeNative(words.distinct, model.map(e => (e._1, e._3)))
    val nPieces = words.distinct.map(w => enc(w).size).sum
    val nChars = words.distinct.map(_.length).sum
    assert(nPieces < nChars,
      s"no compression: $nPieces pieces over $nChars chars")
    assert(enc("kurakura").forall(_.length > 1),
      s"motif word fell back to chars: ${enc("kurakura")}")
  }

  test("lifecycle: merged == rebuilt, forget(merge(base,X),X) == base") {
    val batch = Seq((900001L, "kurakura zemizemi"),
      (900002L, "kurazemi kurakura"), (900003L, "qvxw zemi"))
      .toDF("doc_id", "text")
    val baseDir = UnigramOps.unigramIndex(spark, sfDir)
    val mergedDir =
      UnigramOps.unigramIndexMerge(spark, sfDir, batch, "specbatch")
    val forgotDir =
      UnigramOps.unigramIndexForget(spark, mergedDir, batch, "specbatch")
    def pieces(dir: String): Seq[(String, Long, Long)] =
      spark.read.parquet(s"$dir/pieces")
        .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    // forget round trip lands exactly on the never-merged base
    assert(pieces(forgotDir) == pieces(baseDir))
    // merged == a from-scratch build over base ∪ batch
    val unionWords = TextOps.documents(spark, sfDir)
      .filter(col("doc_id") % 2 === 0).select("doc_id", "text")
      .union(batch)
      .select(explode(CurationOps.toksCol).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
    val rebuilt = UnigramOps.trainLoop(spark, unionWords).sortBy(_._1)
    assert(pieces(mergedDir) == rebuilt)
    // and the merge actually changed the model (batch words counted)
    assert(pieces(mergedDir) != pieces(baseDir))
  }

  test("drift gate: same-distribution text is silent, shifted text " +
      "fires, fixture proxy fires") {
    // model on a motif corpus; measure single-char emission share on
    // (a) more text from the same distribution, (b) motif-reversed
    // text — the operator's exact arithmetic, synthetic seam
    val words = (Seq.fill(40)("kurakura") ++ Seq.fill(40)("zemizemi") ++
      Seq.fill(30)("kurazemi")).toDF("w")
      .groupBy("w").agg(count(lit(1)).as("f"))
    val model = UnigramOps.trainLoop(spark, words)
    def share(ws: Seq[String]): (Long, Long) = {
      val enc = encodeNative(ws.distinct, model.map(e => (e._1, e._3)))
      val emits = ws.map(w => enc(w).size.toLong).sum
      val singles = ws.map(w => enc(w).count(_.length == 1).toLong).sum
      (emits, singles)
    }
    val (sameE, sameS) = share(Seq("kurakura", "zemizemi", "kurazemi"))
    val (drifE, drifS) = share(
      Seq("kurakura", "zemizemi", "kurazemi").map(_.reverse))
    def gate(bs: Long, be: Long, ds: Long, de: Long): Boolean =
      BigInt(ds) * be > BigInt(bs) * de * UnigramOps.uniDriftFactor
    assert(!gate(sameS, sameE, sameS, sameE), "gate fired on baseline")
    assert(gate(sameS, sameE, drifS, drifE),
      s"gate silent on shifted text: base $sameS/$sameE drift $drifS/$drifE")
    // and the fixture-gated operator itself: reversed-token proxy fires
    val row = UnigramOps.unigramDrift(spark, sfDir).collect().head
    assert(row.getAs[Boolean]("drift_gate"))
    assert(row.getAs[Double]("drift_share") >
      row.getAs[Double]("base_share"))
  }

  test("fertility rollup equals a driver recompute off the encode") {
    val enc = UnigramOps.unigramEncode(spark, sfDir)
      .select("doc_id", "n_pieces", "n_single")
      .as[(Long, Long, Long)].collect()
      .map { case (id, p, s) => id -> ((p, s)) }.toMap
    val docs = TextOps.documents(spark, sfDir)
      .select("doc_id", "lang", "n_chars")
      .as[(Long, String, Long)].collect()
    val expected = docs.groupBy(_._2).map { case (lang, rows) =>
      val chars = rows.map(_._3).sum
      val pieces = rows.map(r => enc(r._1)._1).sum
      val singles = rows.map(r => enc(r._1)._2).sum
      lang -> ((rows.size.toLong, chars, pieces, singles,
        chars.toDouble / math.max(pieces.toDouble, 1.0),
        singles.toDouble / math.max(pieces.toDouble, 1.0)))
    }
    val got = UnigramOps.unigramFertility(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    assert(got == expected)
    // non-vacuous: the model compresses the fixture somewhere
    assert(got.values.exists(_._5 > 1.0), s"no lang compresses: $got")
  }

  test("trainLoop is deterministic and the artifact round-trips") {
    val words = Seq("kurakura", "zemizemi", "kurazemi", "kura", "zemi")
      .zipWithIndex.flatMap { case (w, i) => Seq.fill(i + 2)(w) }
      .toDF("w").groupBy("w").agg(count(lit(1)).as("f"))
    val a = UnigramOps.trainLoop(spark, words)
    val b = UnigramOps.trainLoop(spark, words)
    assert(a.sortBy(_._1) == b.sortBy(_._1))
    // the fixture-backed artifact: reload equals the memoized result
    val tp1 = UnigramOps.trainedPieces(spark, sfDir)
    val tp2 = UnigramOps.trainedPieces(spark, sfDir)
    assert(tp1 == tp2 && tp1.nonEmpty)
    // model invariants: positive costs, all counts >= 1, budget held
    assert(tp1.forall(e => e._2 >= 1L && e._3 >= 1L))
    assert(tp1.count(_._1.length > 1) <= UnigramOps.uniBudget)
    assert(tp1.forall(_._1.length <= UnigramOps.uniMaxPiece))
  }
}
