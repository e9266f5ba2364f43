package graft.ext

import scala.util.Random

import graft.SparkSpec

/** Maximal-run semantics of the long-span dedup on CONSTRUCTED
  * overlaps, plus a randomized brute-force equivalence: the operator's
  * merged intervals must equal independently computed interval unions
  * of cross-doc duplicated w-gram positions.
  */
class DupSpanRunsSpec extends SparkSpec {
  import spark.implicits._

  private val w = 5

  /** (doc_id, n_tokens, n_runs, n_dup_tokens, max_run_len, frac) */
  private def runsOf(docs: Seq[(Long, String)])
      : Map[Long, (Long, Long, Long, Long)] =
    DedupOps.dupSpanRunsDocs(
        docs.toDF("doc_id", "text"), w)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap

  private def toks(i: Int) = s"t$i"

  test("a single shared passage reports as ONE maximal run") {
    val shared = (0 until 12).map(toks).mkString(" ") // 12-token copy
    val a = s"a0 a1 a2 $shared a3 a4 a5 a6 a7"
    val b = s"b0 $shared b1 b2 b3 b4 b5 b6 b7 b8"
    val got = runsOf(Seq(1L -> a, 2L -> b))
    // 12-token copy = 8 overlapping 5-gram seeds, but exactly 1 run
    assert(got(1L)._2 == 1L, s"doc 1 runs: ${got(1L)}")
    assert(got(1L)._3 == 12L && got(1L)._4 == 12L, got(1L).toString)
    assert(got(2L)._2 == 1L && got(2L)._3 == 12L, got(2L).toString)
  }

  test("separated passages stay TWO runs; contiguous coverage merges") {
    val s1 = (0 until 6).map(toks).mkString(" ")
    val s2 = (10 until 16).map(toks).mkString(" ")
    // ANY non-duplicated token between the copies separates the runs
    // (coverage is not contiguous) — here 8 of them
    val far = s"$s1 x0 x1 x2 x3 x4 x5 x6 x7 $s2"
    // directly adjacent copies: coverage is contiguous, runs merge
    // even though the junction grams are shared with no one
    val near = s"$s1 $s2"
    val donor = s"$s1 z0 z1 z2 z3 z4 z5 z6 z7 z8 $s2"
    val gFar = runsOf(Seq(1L -> far, 2L -> donor))
    assert(gFar(1L)._2 == 2L, s"far: ${gFar(1L)}")
    assert(gFar(1L)._3 == 12L && gFar(1L)._4 == 6L, gFar(1L).toString)
    val gNear = runsOf(Seq(1L -> near, 2L -> donor))
    assert(gNear(1L)._2 == 1L, s"near: ${gNear(1L)}")
    assert(gNear(1L)._3 == 12L && gNear(1L)._4 == 12L, gNear(1L).toString)
  }

  test("docs shorter than w and unshared docs report zero runs") {
    val got = runsOf(Seq(
      1L -> "a b c",                          // < w tokens
      2L -> (0 until 20).map(i => s"u$i").mkString(" "))) // unique
    assert(got(1L) == ((3L, 0L, 0L, 0L)), got(1L).toString)
    assert(got(2L) == ((20L, 0L, 0L, 0L)), got(2L).toString)
  }

  test("randomized brute-force equivalence of the interval union") {
    val rnd = new Random(42)
    // small token alphabet forces plenty of accidental w-gram sharing
    val docs = (1L to 12L).map { id =>
      id -> (0 until (30 + rnd.nextInt(40)))
        .map(_ => s"w${rnd.nextInt(6)}").mkString(" ")
    }
    val tokSeqs = docs.map { case (id, t) => id -> t.split(" ").toSeq }
    val gramOwners = tokSeqs.flatMap { case (id, ts) =>
      ts.sliding(w).filter(_.size == w).map(g => g.mkString(" ") -> id)
    }.groupBy(_._1).map { case (g, o) => g -> o.map(_._2).toSet }
    val expect = tokSeqs.map { case (id, ts) =>
      val starts = ts.sliding(w).zipWithIndex
        .filter(_._1.size == w)
        .collect { case (g, i)
          if (gramOwners(g.mkString(" ")) - id).nonEmpty => i }
        .toSeq
      // brute-force interval union of [i, i+w-1]
      val covered = starts.flatMap(i => i until (i + w)).toSet
      val runs = if (covered.isEmpty) Seq.empty[Int] else {
        val sorted = covered.toSeq.sorted
        sorted.tail.foldLeft(List(List(sorted.head))) { (acc, p) =>
          if (p == acc.head.head + 1) (p :: acc.head) :: acc.tail
          else List(p) :: acc
        }.map(_.size)
      }
      id -> ((ts.size.toLong, runs.size.toLong,
        runs.sum.toLong, if (runs.isEmpty) 0L else runs.max.toLong))
    }.toMap
    val got = runsOf(docs)
    for ((id, want) <- expect)
      assert(got(id) == want, s"doc $id: got ${got(id)}, want $want")
  }
}
