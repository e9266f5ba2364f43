package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.UnigramViterbi

/** Drives the unigram trainer PAST the fixture's scale (31 distinct
  * words) on a generated large-vocabulary corpus — the BpeScaleSpec
  * discipline applied to the hard-EM loop:
  *
  *  - a 2048-seed / 1024-piece budget trains on a ~16k-distinct-word
  *    corpus without the emission stream collapsing (the budget is
  *    actually reachable);
  *  - a sampled slice of the scaled model's segmentations equals an
  *    independent driver DP recompute (the native expression never
  *    diverges as the model grows);
  *  - the trained model COMPRESSES: mean pieces/word well under mean
  *    chars/word, and syllable-or-larger pieces dominate emissions —
  *    the capability claim a 31-word fixture cannot make;
  *  - per-round wall is logged for the SURVEY scale record.
  */
class UnigramScaleSpec extends SparkSpec {
  import spark.implicits._

  /** ~16k distinct words, all ≤ 8 chars (the DP unroll bound): 2- and
    * 3-syllable compositions over 100 CV syllables, zipf-ish
    * deterministic frequencies.
    */
  private def syntheticWords(): Seq[(String, Long)] = {
    val cons = "bcdfghjklmnpqrstvwxz"
    val vows = "aeiou"
    val syl = for (c <- cons; v <- vows) yield s"$c$v" // 100 syllables
    val two = for {
      (a, i) <- syl.zipWithIndex
      (b, j) <- syl.zipWithIndex
      if (i + j) % 2 == 0 // 5,000 four-char words
    } yield (a + b, ((i * 31 + j) % 17 + 1).toLong)
    val three = for {
      (a, i) <- syl.zipWithIndex
      (b, j) <- syl.zipWithIndex
      if (i * 3 + j) % 9 == 0 // ~1,100 bases
      (c, k) <- syl.take(10).zipWithIndex
    } yield (a + b + c, ((i + j * 5 + k) % 7 + 1).toLong) // 6-char words
    two ++ three
  }

  // driver-side mirror of UnigramViterbi.encode (UnigramOpsSpec's)
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
    var stack = List.empty[String]
    var pos = len
    while (pos > 0) { stack ::= w.substring(ptr(pos), pos); pos = ptr(pos) }
    stack
  }

  test("a 1024-piece budget trains on a ~16k-word corpus, matches the " +
      "driver DP on a sample, and compresses") {
    val wordSeq = syntheticWords()
    assert(wordSeq.size > 5000, s"corpus too small: ${wordSeq.size}")
    val words = wordSeq.toDF("w", "f").repartition(8)
    val (seedBudget, budget) = (2048, 1024)
    val t0 = System.nanoTime()
    val model =
      UnigramOps.trainLoop(spark, words, seedBudget, budget, rounds = 2)
    val wallSec = (System.nanoTime() - t0) / 1e9
    info(f"scale train: ${wordSeq.size} words, seed $seedBudget, " +
      f"budget $budget, 2 EM rounds: $wallSec%.1f s")

    // unigram prune SELF-SIZES: the model keeps every piece the
    // corpus actually segments with (at minimum the full syllable
    // inventory) and nothing above budget — on this corpus optimal
    // covers are syllable-aligned, so collapsing far below budget is
    // the CORRECT behavior, not exhaustion (contrast BPE, which
    // manufactures symbols to fill its budget)
    val multis = model.filter(_._1.length > 1)
    info(s"retained multi-char pieces: ${multis.size} (budget $budget)")
    assert(multis.size >= 100 && multis.size <= budget,
      s"kept ${multis.size} multi-char pieces (budget $budget)")

    // native expression == driver DP on a deterministic sample of the
    // scaled model (every 97th distinct word)
    val costs = model.map(e => e._1 -> e._3).toMap
    val sample = wordSeq.map(_._1).distinct.zipWithIndex
      .filter(_._2 % 97 == 0).map(_._1)
    val native = sample.toDF("w")
      .select(col("w"),
        UnigramViterbi(col("w"), model.map(e => (e._1, e._3))).as("pcs"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    for (w <- sample)
      assert(native(w) == viterbiRef(w, costs),
        s"$w: native ${native(w)} vs ref ${viterbiRef(w, costs)}")

    // compression: weighted mean pieces/word well under chars/word,
    // and multi-char pieces carry most of the segmentation
    val freq = wordSeq.groupBy(_._1).view.mapValues(_.map(_._2).sum)
    var pieces = 0L; var chars = 0L; var multiEmits = 0L; var emits = 0L
    for ((w, f) <- freq) {
      val seg = native.getOrElse(w, viterbiRef(w, costs))
      pieces += seg.size * f
      chars += w.length * f
      emits += seg.size * f
      multiEmits += seg.count(_.length > 1) * f
    }
    assert(pieces * 2 <= chars,
      s"no compression: $pieces pieces vs $chars chars")
    assert(multiEmits * 10 >= emits * 8,
      s"single chars dominate: $multiEmits of $emits emissions multi")
  }
}
