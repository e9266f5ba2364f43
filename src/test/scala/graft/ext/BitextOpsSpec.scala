package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Margin-based bitext mining: output contract properties plus full-set
  * equality against a plain-Scala recomputation (candidate retrieval,
  * fixed-point neighborhood sums, integer margin test, argmax) over
  * collected data — a second code path with no heaps and no joins.
  */
class BitextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bitextMine ≡ independent margin-mining recomputation") {
    val out = BitextOps.bitextMine(spark, sfDir)
      .select("src_id", "tgt_id", "lang", "cos", "margin")
      .as[(Long, Long, String, Double, Double)].collect()

    // contract properties
    assert(out.nonEmpty, "fixture mines nothing — the gate is vacuous")
    assert(out.map(_._1).distinct.length == out.length,
      "one best target per source")
    assert(out.forall(_._3 != BitextOps.bitextTgtLang),
      "sources are non-target-language docs")
    assert(out.forall(_._5 >= 1.05), "margin threshold")

    // independent recomputation over collected vectors
    val docsLang = TextOps.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"))
      .as[(Long, String)].collect().toMap
    val e = VectorOps.embeddings(spark, sfDir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .as[(Long, Seq[Double])].collect().toMap
    val sketch = VectorOps.embeddings(spark, sfDir)
      .select(col("vec_id"),
        posexplode(graft.functions.HyperplaneBuckets(
          transform(col("embedding"), x => x.cast("double"))))
          .as(Seq("band", "bucket")))
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    // mirror the mega-bucket cap (inert at this SF, but the contract
    // includes it); cells censused over docs present in BOTH tables —
    // exactly the banded frame the operator caps
    val cellSize = sketch.filter(kv => docsLang.contains(kv._1))
      .values.flatten.toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    def shared(a: Long, b: Long): Boolean =
      sketch(a).exists(c =>
        cellSize(c) <= VectorOps.signBucketCap && sketch(b).contains(c))
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
      val na = a.foldLeft(0.0)((s, x) => s + x * x)
      val nb = b.foldLeft(0.0)((s, x) => s + x * x)
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val ids = e.keys.filter(docsLang.contains).toSeq
    val (tgts, srcs) = ids.partition(
      docsLang(_) == BitextOps.bitextTgtLang)
    // retrieved candidates with positive quantized cosine
    val scored = (for {
      s <- srcs; t <- tgts
      if shared(s, t)
      c = cos(e(s), e(t))
      cq = math.floor(c * BitextOps.bitextCosScale).toLong
      if cq > 0L
    } yield (s, t, c, cq)).toSeq
    def knn(byKey: Map[Long, Seq[(Long, Long)]]): Map[Long, (Long, Long)] =
      byKey.map { case (k, cands) =>
        val top = cands.sortBy { case (o, cq) => (-cq, o) }
          .take(BitextOps.bitextNNk)
        k -> (top.map(_._2).sum, top.size.toLong)
      }
    val fwd = knn(scored.groupBy(_._1).view
      .mapValues(_.map(r => (r._2, r._4))).toMap)
    val rev = knn(scored.groupBy(_._2).view
      .mapValues(_.map(r => (r._1, r._4))).toMap)
    val passing = scored.flatMap { case (s, t, c, cq) =>
      val (fs, fn) = fwd(s)
      val (rs, rn) = rev(t)
      val num = 2L * cq * fn * rn
      val den = fs * rn + rs * fn
      if (num * BitextOps.bitextMarginDen >=
            den * BitextOps.bitextMarginNum)
        Some((s, t, c, num.toDouble / den.toDouble))
      else None
    }
    val want = passing.groupBy(_._1).map { case (s, ps) =>
      val (_, t, c, m) = ps.minBy { case (_, tid, _, mm) => (-mm, tid) }
      (s, t, docsLang(s), c, m)
    }.toSet
    assert(out.toSet == want,
      s"diverges: extra=${out.toSet.diff(want)} " +
        s"missing=${want.diff(out.toSet)}")
  }

  test("bitextRecall / _mp ≡ independent recomputation; mp ⊇ sp") {
    def row(df: org.apache.spark.sql.DataFrame) =
      df.select("n_exact", "n_lsh", "n_common", "recall")
        .as[(Long, Long, Long, Double)].head()
    val sp = row(BitextOps.bitextRecall(spark, sfDir))
    val mp = row(BitextOps.bitextRecallMultiProbe(spark, sfDir))

    import graft.ext.SampleOps.{A, B, P}
    import graft.functions.{HyperplaneBuckets => HB}
    val docsLang = TextOps.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"))
      .as[(Long, String)].collect().toMap
    val e = VectorOps.embeddings(spark, sfDir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .as[(Long, Seq[Double])].collect().toMap
    val sketch = VectorOps.embeddings(spark, sfDir)
      .select(col("vec_id"),
        posexplode(graft.functions.HyperplaneBuckets(
          transform(col("embedding"), x => x.cast("double"))))
          .as(Seq("band", "bucket")))
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap

    // deterministic hash-order sample, per side
    def hKey(id: Long): Long = ((id % P) * A + B) % P
    val ids = e.keys.filter(docsLang.contains).toSeq
    def side(tgt: Boolean): Seq[Long] =
      ids.filter(id => (docsLang(id) == BitextOps.bitextTgtLang) == tgt)
        .sortBy(id => (hKey(id), id)).take(BitextOps.bitextRecallSample)
    val srcs = side(tgt = false)
    val tgts = side(tgt = true)

    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
      val na = a.foldLeft(0.0)((s, x) => s + x * x)
      val nb = b.foldLeft(0.0)((s, x) => s + x * x)
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    // the shared margin machinery over an explicit candidate set
    def mine(cand: Seq[(Long, Long)]): Set[(Long, Long)] = {
      val scored = (for {
        (s, t) <- cand
        c = cos(e(s), e(t))
        cq = math.floor(c * BitextOps.bitextCosScale).toLong
        if cq > 0L
      } yield (s, t, cq)).toSeq
      def knn(byKey: Map[Long, Seq[(Long, Long)]])
          : Map[Long, (Long, Long)] =
        byKey.map { case (k, cands) =>
          val top = cands.sortBy { case (o, cq) => (-cq, o) }
            .take(BitextOps.bitextNNk)
          k -> (top.map(_._2).sum, top.size.toLong)
        }
      val fwd = knn(scored.groupBy(_._1).view
        .mapValues(_.map(r => (r._2, r._3))).toMap)
      val rev = knn(scored.groupBy(_._2).view
        .mapValues(_.map(r => (r._1, r._3))).toMap)
      val passing = scored.flatMap { case (s, t, cq) =>
        val (fs, fn) = fwd(s)
        val (rs, rn) = rev(t)
        val num = 2L * cq * fn * rn
        val den = fs * rn + rs * fn
        if (num * BitextOps.bitextMarginDen >=
              den * BitextOps.bitextMarginNum)
          Some((s, t, num.toDouble / den.toDouble))
        else None
      }
      passing.groupBy(_._1).map { case (s, ps) =>
        (s, ps.minBy { case (_, tid, m) => (-m, tid) }._2)
      }.toSet
    }

    def probe1(cells: Set[(Int, Long)]): Set[(Int, Long)] =
      cells.flatMap { case (b, k) =>
        (0 until HB.bitsPerBand).map(i => (b, k ^ (1L << i))) :+ ((b, k))
      }
    val all = for { s <- srcs; t <- tgts } yield (s, t)
    val spCand = all.filter { case (s, t) =>
      sketch(s).intersect(sketch(t)).nonEmpty }
    val mpCand = all.filter { case (s, t) =>
      probe1(sketch(s)).intersect(sketch(t)).nonEmpty }
    assert(spCand.toSet.subsetOf(mpCand.toSet),
      "Hamming-1 probing can only widen the candidate set")

    val exact = mine(all)
    def want(cand: Seq[(Long, Long)]): (Long, Long, Long, Double) = {
      val m = mine(cand)
      val common = exact.intersect(m).size.toLong
      (exact.size.toLong, m.size.toLong, common,
        if (exact.nonEmpty) common.toDouble / exact.size else 1.0)
    }
    assert(sp == want(spCand), "single-probe recall row diverges")
    assert(mp == want(mpCand), "multi-probe recall row diverges")
    assert(mp._3 >= sp._3,
      "fixture expectation: richer retrieval should not lose agreement")
  }

  test("dense margin beats any absolute-cosine cut on the fixture") {
    // the recipe's point: for ANY absolute threshold that keeps exactly
    // the mined pair count, the kept set differs — margin ranking is
    // not a monotone transform of raw cosine
    val out = BitextOps.bitextMine(spark, sfDir)
      .select("src_id", "cos", "margin")
      .as[(Long, Double, Double)].collect()
    val byCos = out.sortBy(-_._2).map(_._1).toSeq
    val byMargin = out.sortBy(-_._3).map(_._1).toSeq
    assert(byCos != byMargin,
      "margin order should differ from raw cosine order on the fixture")
  }
}
