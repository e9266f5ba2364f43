package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LmOpsSpec extends SparkSpec {
  import spark.implicits._

  /** The fixture re-tokenized in plain Scala with the operator's exact
    * rule (normalize → split → drop empties) — the brute-force twin.
    */
  private lazy val docs: Seq[(Long, String, Seq[String])] =
    TextOps.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), TextOps.normText(col("text")))
      .as[(Long, String, String)].collect().toSeq
      .map { case (id, lang, t) =>
        (id, lang, t.split(" ").filter(_.nonEmpty).toSeq)
      }
      .filter(_._3.nonEmpty)

  private def docBigrams(toks: Seq[String]): Seq[(String, String)] =
    (LmOps.lmBos +: toks).sliding(2).map(p => (p(0), p(1))).toSeq

  /** Reference-slice model per lang: bigram counts, context counts,
    * vocab size.
    */
  private lazy val model: Map[String,
      (Map[(String, String), Long], Map[String, Long], Long)] = {
    val ref = docs.filter(_._1 % LmOps.lmRefMod == 0)
    ref.groupBy(_._2).map { case (lang, ds) =>
      val bgs = ds.flatMap(d => docBigrams(d._3))
      val cAb = bgs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val cA = cAb.groupBy(_._1._1).map { case (a, m) => a -> m.values.sum }
      val v = ds.flatMap(_._3).distinct.size.toLong
      lang -> ((cAb, cA, v))
    }
  }

  test("ngram lm report matches brute-force reference counts and order") {
    val got = LmOps.ngramLm(spark, sfDir)
      .as[(String, Long, String, String, Long)].collect()
      .groupBy(_._1)
    assert(got.keySet == model.keySet)
    got.foreach { case (lang, rows) =>
      val (cAb, _, _) = model(lang)
      val expected = cAb.toSeq
        .map { case ((a, b), c) => (a, b, c) }
        .sortBy { case (a, b, c) => (-c, a, b) }
        .take(LmOps.lmTopK)
      val gotSorted = rows.sortBy(_._2).toSeq
        .map { case (_, _, a, b, c) => (a, b, c) }
      assert(gotSorted == expected, s"lang $lang top bigrams differ")
    }
  }

  test("perplexity buckets: exact brute-force score; terciles populated") {
    val got = LmOps.perplexityBuckets(spark, sfDir)
      .as[(Long, String, Long, Double, Long)].collect()
      .map { case (id, lang, n, s, b) => id -> ((lang, n, s, b)) }.toMap
    assert(got.size == docs.size)
    // exact fixed-point recomputation for every document
    docs.foreach { case (id, lang, toks) =>
      val (cAb, cA, v) = model(lang)
      val invs = docBigrams(toks).map { case (a, b) =>
        (cA.getOrElse(a, 0L) + v) * LmOps.lmScale /
          (cAb.getOrElse((a, b), 0L) + 1L)
      }
      val expected = invs.sum.toDouble / (invs.size * LmOps.lmScale).toDouble
      val (gl, gn, gs, _) = got(id)
      assert(gl == lang && gn == toks.size.toLong)
      assert(gs == expected, s"doc $id score $gs != $expected")
    }
    // every lang splits into three non-empty fluency terciles
    got.values.groupBy(_._1).foreach { case (lang, rows) =>
      val buckets = rows.map(_._4).toSet
      assert(buckets == Set(1L, 2L, 3L), s"lang $lang buckets $buckets")
    }
    // reference-slice docs (all-seen bigrams) must skew more fluent than
    // the corpus at large: their mean score is below the global mean
    val refScores = docs.filter(_._1 % LmOps.lmRefMod == 0)
      .map(d => got(d._1)._3)
    val allScores = got.values.map(_._3)
    assert(refScores.sum / refScores.size <
      allScores.sum / allScores.size)
  }

  test("perplexity approx terciles stay within the GK rank-error of exact") {
    // the winsorize/curriculum contract on the per-lang tercile cuts:
    // cumulative bucket shares within n/accuracy + tie-run slack of
    // k·n/3; bucketing monotone in score; schema/count shared
    val approx = LmOps.perplexityBuckets(spark, sfDir, approxBounds = true)
    val exact = LmOps.perplexityBuckets(spark, sfDir)
    assert(approx.columns.toSeq == exact.columns.toSeq)
    assert(approx.count() == exact.count())
    val rows = approx.as[(Long, String, Long, Double, Long)].collect()
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      val n = rs.length
      val maxTie = rs.groupBy(_._4).values.map(_.size).max
      val slack = n.toDouble / graft.ext.SketchOps.percentileAccuracy + maxTie
      val byScore = rs.sortBy(_._4)
      assert(byScore.map(_._5).sliding(2).forall(p =>
        p.length < 2 || p(0) <= p(1)), s"$lang: buckets not monotone")
      for (k <- 1 to 2) {
        val below = rs.count(_._5 <= k)
        assert(math.abs(below - k * n / 3.0) <= slack,
          s"$lang: |buckets<=$k| = $below, target ${k * n / 3.0}, " +
            s"slack $slack")
      }
    }
  }

  test("scoreDocs on a language with no reference model: row kept, " +
      "scored=false, NULL score — never silently dropped") {
    val (cAb, cA, voc) = LmOps.trainTables(spark, sfDir)
    val feed = LmOps.withToks(Seq(
      (9000001L, "xx-new", "ein text in einer unbekannten sprache"),
      (9000002L, docs.head._2, "some ordinary words to score"))
      .toDF("doc_id", "lang", "text"))
    val got = LmOps.scoreDocs(feed, cAb, cA, voc)
      .select("doc_id", "scored", "mean_inv")
      .as[(Long, Boolean, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.size == 2, "unknown-lang doc was dropped from the output")
    assert(got(9000001L)._1 == false && got(9000001L)._2.isEmpty,
      "unknown lang must come back unscored with NULL mean_inv")
    assert(got(9000002L)._1 == true && got(9000002L)._2.nonEmpty,
      "known lang must score")
    // and the streaming gate's pass expression turns that into an
    // explicit false, not a NULL
    val pass = LmOps.scoreDocs(feed, cAb, cA, voc)
      .withColumn("pass", col("scored") && col("mean_inv") <= 1e18)
      .select("doc_id", "pass").as[(Long, Boolean)].collect().toMap
    assert(pass(9000001L) == false && pass(9000002L) == true)
  }

  test("lm index merge: merged ≡ rebuilt counts; report matches ngramLm") {
    val tmp = java.nio.file.Files
      .createTempDirectory("lm-merge").toString
    System.setProperty("graft.artifact.root", tmp)
    try {
      val merged = LmOps.ngramLmMerged(spark, sfDir)
        .as[(String, Long, String, String, Long)].collect().toSet
      val full = LmOps.ngramLm(spark, sfDir)
        .as[(String, Long, String, String, Long)].collect().toSet
      // merged report ≡ the report trained from scratch on the full
      // reference slice (additive count algebra, exact)
      assert(merged == full)
      // both index versions exist on disk, SUCCESS-gated, base untouched
      val dirs = new java.io.File(s"$tmp/lm_index").listFiles()
        .filter(_.isDirectory).map(_.getName).toSeq
      assert(dirs.exists(!_.contains("_m_")) &&
        dirs.exists(_.contains("_m_refhalf")), dirs.toString)
      // the merged cab equals a brute-force count over the FULL
      // reference slice (not just the base half)
      val mergedDir = new java.io.File(s"$tmp/lm_index").listFiles()
        .filter(_.getName.contains("_m_refhalf")).head.toString
      val cab = spark.read.parquet(s"$mergedDir/cab")
        .as[(String, String, String, Long)].collect()
        .map { case (l, a, b, c) => (l, a, b) -> c }.toMap
      val refDocs = docs.filter(_._1 % LmOps.lmRefMod == 0)
      val brute = refDocs.flatMap { case (_, lang, toks) =>
        docBigrams(toks).map { case (a, b) => (lang, a, b) }
      }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      assert(cab == brute)
    } finally System.clearProperty("graft.artifact.root")
  }

  test("lm index forget: merge then forget returns exactly the base index") {
    val tmp = java.nio.file.Files
      .createTempDirectory("lm-forget").toString
    System.setProperty("graft.artifact.root", tmp)
    try {
      LmOps.ngramLmForgotten(spark, sfDir).collect() // drive the lifecycle
      val dirs = new java.io.File(s"$tmp/lm_index").listFiles()
        .filter(_.isDirectory).map(_.getName).toSeq
      val baseDir = dirs.filter(d =>
        !d.contains("_m_") && !d.contains("_f_")).head
      val fDir = dirs.filter(_.endsWith("_f_refhalf")).head
      def tables(d: String) = (
        spark.read.parquet(s"$tmp/lm_index/$d/cab")
          .as[(String, String, String, Long)].collect().toSet,
        spark.read.parquet(s"$tmp/lm_index/$d/vocab")
          .as[(String, String, Long)].collect().toSet)
      val (baseCab, baseVocab) = tables(baseDir)
      val (fCab, fVocab) = tables(fDir)
      // subtractive algebra is exact: forgetting the merged half yields
      // the base tables bit-for-bit, no residue, no zero rows
      assert(fCab == baseCab)
      assert(fVocab == baseVocab)
      assert(fCab.forall(_._4 > 0L) && fVocab.forall(_._3 > 0L))
    } finally System.clearProperty("graft.artifact.root")
  }


  test("minKProb: tail-mean dominance, exact m, quantile flag, and real membership separation") {
    val mk = LmOps.minKProb(spark, sfDir)
      .select("doc_id", "lang", "n_bigrams", "m_tail", "mink_inv",
        "in_ref", "suspect")
      .as[(Long, String, Long, Long, Double, Boolean, Boolean)].collect()
    assert(mk.nonEmpty)
    // m = ceil(n * K / 100), exactly
    for ((_, _, n, m, _, _, _) <- mk)
      assert(m == (n * LmOps.minKPct + 99) / 100)
    // the min-K statistic averages the LARGEST surprisals, so it
    // dominates the same doc's overall mean — cross-query invariant
    // against the gated perplexity output
    val meanInv = LmOps.perplexityBuckets(spark, sfDir)
      .select("doc_id", "mean_inv").as[(Long, Double)].collect().toMap
    for ((id, _, _, _, mink, _, _) <- mk)
      assert(mink >= meanInv(id) - 1e-9, s"doc $id tail mean below mean")
    // suspect ⇔ mink_inv ≤ per-lang 25th percentile (Spark percentile
    // interpolation, recomputed here from the collected statistics)
    for ((lang, rows) <- mk.groupBy(_._2)) {
      val xs = rows.map(_._5).sorted
      val pos = LmOps.minKFlagQuantile * (xs.length - 1)
      val (lo, hi) = (math.floor(pos).toInt, math.ceil(pos).toInt)
      val q25 = xs(lo) + (pos - lo) * (xs(hi) - xs(lo))
      for ((id, _, _, _, mink, _, sus) <- rows)
        assert(sus == (mink <= q25), s"doc $id flag vs quantile $q25")
    }
    // membership inference WORKS on the fixture: the LM's own training
    // slice scores lower min-K surprise and is flagged far more often
    val (ref, non) = mk.partition(_._6)
    assert(ref.nonEmpty && non.nonEmpty)
    def mean(a: Array[Double]) = a.sum / a.length
    assert(mean(ref.map(_._5)) < mean(non.map(_._5)),
      "reference-slice docs must score lower min-K surprise")
    val refRate = ref.count(_._7).toDouble / ref.length
    val nonRate = non.count(_._7).toDouble / non.length
    assert(refRate > 2 * nonRate,
      s"suspect rate ref=$refRate non=$nonRate: no separation")
  }
}
