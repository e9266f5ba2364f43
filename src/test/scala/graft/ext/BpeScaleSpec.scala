package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Drives the BPE trainer PAST the fixture's exhaustion point (the
  * 31-word synthetic vocabulary dries at 89 merges) on a generated
  * large-vocabulary corpus, proving the ≥1024-merge budget is actually
  * reachable by the incremental-pair-maintenance loop:
  *  - ≥ [[BpeOps.bpeMerges]] merges train without the pair stream
  *    running dry;
  *  - the merge chain equals an independent driver-side recompute
  *    (the incremental pair table never diverges from a full recount
  *    across ~50 rounds — the invariant that broke would break THIS);
  *  - round count stays far below merge count (the batching win), so
  *    wall grows with rounds, sublinearly in merges.
  */
class BpeScaleSpec extends SparkSpec {
  import spark.implicits._

  /** ~3.4k-word vocabulary with deterministic zipf-ish frequencies:
    * all ordered pairs of the base tokens plus a slice of triples,
    * concatenated WITHOUT separators so BPE has real multi-round
    * structure to discover (shared prefixes/suffixes at many scales).
    */
  private def syntheticWords(): Seq[(String, Long)] = {
    val base = Seq("the", "fast", "key", "order", "sort", "table", "scan",
      "merge", "part", "window", "small", "hash", "join", "batch",
      "stream", "spark", "dup", "row", "col", "disk", "mem", "net",
      "cpu", "io", "agg", "map", "sink", "src", "plan", "cost", "skew")
    val pairs = for {
      (a, i) <- base.zipWithIndex
      (b, j) <- base.zipWithIndex
    } yield (a + b, ((i * 31 + j) % 13 + 1).toLong)
    val triples = for {
      (a, i) <- base.zipWithIndex
      (b, j) <- base.zipWithIndex
      if (i + j) % 4 == 0
    } yield (a + b + "x" + a, ((i * 7 + j) % 5 + 1).toLong)
    pairs ++ triples
  }

  /** Independent driver-side batched BPE over an explicit word table —
    * the same semantics BpeOpsSpec.referenceBpe pins on the fixture,
    * parameterized for the scale run.
    */
  private def referenceBpe(words: Map[String, Long], budget: Int,
                           maxRounds: Int, candWidth: Int)
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
    while (round < maxRounds && total < budget && !dry) {
      val counts = corpus.values.toSeq.flatMap { case (sym, f) =>
        sym.zip(sym.tail).map(p => p -> f)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      if (counts.isEmpty) dry = true
      else {
        val cands = counts.toSeq
          .map { case ((a, b), f) => (a, b, f) }
          .sortBy { case (a, b, f) => (-f, a, b) }
          .take(candWidth)
        val accepted = BpeOps.selectBatch(cands, budget - total)
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

  test("the full 1024-merge budget trains on a large vocabulary and " +
      "matches the driver recompute merge-for-merge") {
    val wordSeq = syntheticWords()
    val words = wordSeq.toDF("w", "f")
    val budget = BpeOps.bpeMerges // 1024
    val maxRounds = 200
    val got = BpeOps.trainLoop(spark, words, budget, maxRounds,
      BpeOps.bpeCandidates)
    val expected = referenceBpe(wordSeq.toMap, budget, maxRounds,
      BpeOps.bpeCandidates)
    assert(got.length == expected.length,
      s"trained ${got.length}, reference ${expected.length}")
    if (got != expected) {
      val i = got.zip(expected).indexWhere { case (g, e) => g != e }
      fail(s"first divergence at merge $i: ${got(i)} vs ${expected(i)}")
    }
    // the budget is actually reachable — the round-7 weakness was a
    // 64-merge ceiling; the fixture queries stop at corpus exhaustion
    // but the loop itself runs to 1024 here
    assert(got.length == budget,
      s"trained ${got.length} of $budget — vocabulary exhausted early")
    // batching: rounds ≪ merges (wall grows with rounds)
    val roundsUsed = got.map(_._2).distinct.length
    assert(roundsUsed * 8 <= got.length,
      s"$roundsUsed rounds for ${got.length} merges")
  }
}
