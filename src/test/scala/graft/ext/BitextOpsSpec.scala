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
