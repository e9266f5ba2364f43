package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SampleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("split assignment is a pure function of doc_id: partitioning-proof") {
    val base = SampleOps.trainValTestSplit(spark, sfDir)
      .as[(Long, String)].collect().toMap
    // same data, violently repartitioned and reordered — membership of
    // every row must be unchanged (the property engine-native RNG
    // samplers do NOT have)
    val reparted = SampleOps.trainValTestSplit(spark, sfDir)
      .repartition(17, col("split"))
      .as[(Long, String)].collect().toMap
    assert(base == reparted)
    // all three splits exist and land near 80/10/10 on the fixture
    val sizes = base.values.groupBy(identity).view.mapValues(_.size).toMap
    val n = base.size.toDouble
    assert(math.abs(sizes("train") / n - 0.8) < 0.08, sizes.toString)
    assert(math.abs(sizes("val") / n - 0.1) < 0.06, sizes.toString)
    assert(math.abs(sizes("test") / n - 0.1) < 0.06, sizes.toString)
  }

  test("stratified sample hits each stratum's rate within binomial noise") {
    val totals = TextOps.documents(spark, sfDir)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val kept = SampleOps.stratifiedSample(spark, sfDir)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val rates = SampleOps.strataPermille.toMap
    for ((lang, total) <- totals) {
      val p = rates.getOrElse(lang, SampleOps.defaultPermille) / 1000.0
      val got = kept.getOrElse(lang, 0L).toDouble
      // 4-sigma binomial envelope (+1 for tiny strata)
      val sigma = math.sqrt(total * p * (1 - p))
      assert(math.abs(got - total * p) <= 4 * sigma + 1,
        s"$lang: kept=$got expected=${total * p} sigma=$sigma")
    }
    // sampling is a subset: every kept doc exists upstream with its lang
    val docLangs = TextOps.documents(spark, sfDir)
      .select("doc_id", "lang").as[(Long, String)].collect().toMap
    SampleOps.stratifiedSample(spark, sfDir)
      .as[(Long, String)].collect()
      .foreach { case (id, l) => assert(docLangs.get(id).contains(l)) }
  }

  test("k-per-stratum sample is exact-size, deterministic, and sort-free") {
    val sizes = TextOps.documents(spark, sfDir)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val run = () => SampleOps.sampleKPerStratum(spark, sfDir)
      .as[(String, Long, Long)].collect().toSet
    val a = run()
    assert(a == run()) // deterministic draw
    val perLang = a.groupBy(_._1).view.mapValues(_.size).toMap
    for ((lang, total) <- sizes)
      assert(perLang(lang) ==
        math.min(total, SampleOps.samplePerStratum.toLong).toInt)
    val plan = SampleOps.sampleKPerStratum(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey") && !plan.contains("Sort ["))
  }

  test("mixture repeat: multiplicity matches the weight rule per doc") {
    val rows = SampleOps.mixtureRepeat(spark, sfDir)
      .as[(Long, String, Long)].collect()
    assert(rows.nonEmpty)
    val weights = SampleOps.mixtureWeightsPermille.toMap
    val byDoc = rows.groupBy(r => (r._1, r._2))
    // epochs are 1..n with no holes; multiplicity is the deterministic rule
    byDoc.foreach { case ((id, source), copies) =>
      val w = weights.getOrElse(source, SampleOps.mixtureDefaultPermille)
      val frac = w % 1000
      val hashIn = (((id % SampleOps.P) * SampleOps.A + SampleOps.B)
        % SampleOps.P % SampleOps.buckets) < frac
      val expected = w / 1000 + (if (hashIn) 1 else 0)
      assert(copies.length == expected, s"doc $id source $source")
      assert(copies.map(_._3).sorted.toSeq == (1L to expected.toLong))
    }
    // the 2.3x source really averages ~2.3 copies per doc
    val src0 = byDoc.collect { case ((_, "src0"), c) => c.length }
    if (src0.nonEmpty) {
      val avg = src0.sum.toDouble / src0.size
      assert(avg > 2.0 && avg < 2.6, s"src0 avg multiplicity $avg")
    }
  }

  test("shardAssign: dense per-shard positions, balanced, epoch-varying") {
    val e0 = SampleOps.shardAssign(spark, sfDir)
      .as[(Long, Long, Long)].collect()
    val n = e0.length
    assert(n > 0)
    // every doc exactly once; positions dense 1..|shard| in every shard
    assert(e0.map(_._1).distinct.length == n)
    e0.groupBy(_._2).foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length.toLong),
        s"shard $s positions not dense")
    }
    // roughly uniform occupancy (affine map mod small shard count)
    val sizes = e0.groupBy(_._2).view.mapValues(_.length)
    assert(sizes.size == SampleOps.shardCount)
    val expectedPer = n.toDouble / SampleOps.shardCount
    sizes.foreach { case (s, c) =>
      assert(c > expectedPer * 0.5 && c < expectedPer * 1.5,
        s"shard $s skewed: $c vs ~$expectedPer")
    }
    // reproducible; and epoch 1 is a genuinely different permutation
    val e0again = SampleOps.shardAssign(spark, sfDir)
      .as[(Long, Long, Long)].collect()
    assert(e0.sortBy(_._1).toSeq == e0again.sortBy(_._1).toSeq)
    val e1 = SampleOps.shardAssign(spark, sfDir, epoch = 1)
      .as[(Long, Long, Long)].collect()
    val moved = e0.sortBy(_._1).zip(e1.sortBy(_._1))
      .count { case ((_, s0, p0), (_, s1, p1)) => s0 != s1 || p0 != p1 }
    assert(moved > n / 2,
      s"epoch 1 permutation barely differs from epoch 0: $moved/$n moved")
  }

  test("sourceDiversity equals a driver Simpson recompute; bounds hold") {
    val docs = TextOps.documents(spark, sfDir)
      .select("lang", "source").as[(String, String)].collect()
    val exp = docs.groupBy(_._1).map { case (l, rows) =>
      val bySrc = rows.groupBy(_._2).view.mapValues(_.length.toLong)
      val n = rows.length.toLong
      val sumsq = bySrc.values.map(c => c * c).sum
      val simpson = sumsq.toDouble / (n.toDouble * n.toDouble)
      val eff = (n.toDouble * n.toDouble) / sumsq.toDouble
      (l, bySrc.size.toLong, n, simpson, eff)
    }.toSet
    val got = SampleOps.sourceDiversity(spark, sfDir)
      .as[(String, Long, Long, Double, Double)].collect().toSet
    assert(got == exp)
    // 1 ≤ effective_sources ≤ n_sources (Cauchy–Schwarz), and the
    // fixture must actually be non-uniform somewhere or the bound is slack
    got.foreach { case (l, ns, _, _, eff) =>
      assert(eff >= 1.0 - 1e-12 && eff <= ns.toDouble + 1e-12, s"lang $l")
    }
    assert(got.exists { case (_, ns, _, _, eff) => eff < ns.toDouble - 0.01 },
      "every lang perfectly uniform — concentration signal vacuous")
  }

  test("mixturePlan: exact integer targets and division, counts sum to total") {
    val docs = TextOps.documents(spark, sfDir)
      .select("doc_id", "source").as[(Long, String)].collect()
    val total = docs.length.toLong
    val bySrc = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val shares = SampleOps.targetMixPermille.toMap
    val exp = planTable(bySrc, shares, total)
    val got = SampleOps.mixturePlan(spark, sfDir)
      .as[(String, Long, Long, Long, Double)].collect().toSet
    assert(got == exp)
    assert(got.toSeq.map(_._2).sum == total,
      "per-source counts must sum to total")
    // both a listed share and the default share are exercised
    assert(got.exists(r => shares.contains(r._1)) &&
      got.exists(r => !shares.contains(r._1)))
  }

  private def planTable(counts: Map[String, Long], shares: Map[String, Int],
                        total: Long): Set[(String, Long, Long, Long, Double)] =
    counts.map { case (src, n) =>
      val share =
        shares.getOrElse(src, SampleOps.targetMixDefaultPermille).toLong
      val target = share * total / 1000L // integral division, exact
      (src, n, share, target, target.toDouble / n.toDouble)
    }.toSet

  test("weighted sample membership is exactly bucket < floor(score*1000)") {
    val scores = TextOps.qualityScore(spark, sfDir)
      .select("doc_id", "quality_score").as[(Long, Double)].collect().toMap
    val exp = scores.collect { case (id, sc)
      if (((id % SampleOps.P) * SampleOps.A + SampleOps.B) % SampleOps.P
        % SampleOps.buckets) < math.floor(sc * SampleOps.buckets).toLong =>
      id
    }.toSet
    val got = SampleOps.weightedSample(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    assert(got == exp)
    // the policy is non-vacuous on the fixture: some kept, some dropped
    assert(got.nonEmpty && got.size < scores.size)
  }


  test("curriculum buckets partition each lang monotonically by score") {
    val rows = SampleOps.curriculum(spark, sfDir)
      .as[(Long, String, Double, Long)].collect()
    assert(rows.forall(r => r._4 >= 1 && r._4 <= 4))
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      val byBucket = rs.groupBy(_._4).view
        .mapValues(_.map(_._3)).toMap
      for (b <- 1L to 3L if byBucket.contains(b) && byBucket.contains(b + 1))
        assert(byBucket(b).max <= byBucket(b + 1).min, s"$lang bucket $b")
      // quartiles on a >=8-doc stratum must populate all four buckets
      if (rs.length >= 8) assert(byBucket.size == 4, s"$lang: ${byBucket.keySet}")
    }
  }

  test("dsir weights: exact brute-force parity; keep share is a quartile") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bucket(g: String): Long = {
      val h = md5hex(g)
      def d(i: Int) = "0123456789abcdef".indexOf(h.charAt(i)).toLong
      (d(0) * 4096 + d(1) * 256 + d(2) * 16 + d(3)) % SampleOps.dsirBuckets
    }
    val docs = TextOps.documents(spark, sfDir)
      .select(col("doc_id"), TextOps.normText(col("text")))
      .as[(Long, String)].collect().toSeq
      .map { case (id, t) => id -> t.split(" ").filter(_.nonEmpty).toSeq }
      .filter(_._2.nonEmpty)
    val docBuckets: Seq[(Long, Seq[Long])] = docs.map { case (id, toks) =>
      val grams = toks ++ toks.sliding(2).filter(_.size == 2)
        .map(_.mkString(" "))
      id -> grams.map(bucket)
    }
    val B = SampleOps.dsirBuckets.toLong
    val all = docBuckets.flatMap(_._2)
    val tgt = docBuckets.filter(_._1 % LmOps.lmRefMod == 0).flatMap(_._2)
    val cR = all.groupBy(identity).map { case (b, v) => b -> v.size.toLong }
    val cT = tgt.groupBy(identity).map { case (b, v) => b -> v.size.toLong }
    val (tR, tT) = (all.size.toLong, tgt.size.toLong)
    val lam: Map[Long, Long] = cR.map { case (b, cr) =>
      b -> ((cT.getOrElse(b, 0L) + 1L) * (tR + B) * SampleOps.dsirScale /
        ((cr + 1L) * (tT + B)))
    }
    val got = SampleOps.dsirWeights(spark, sfDir)
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.size == docs.size)
    docBuckets.foreach { case (id, bs) =>
      val w = bs.map(lam).sum
      val expected = w.toDouble / (bs.size * SampleOps.dsirScale).toDouble
      val (_, n, score, _) = got(id)
      assert(n == bs.size.toLong, s"doc $id gram count")
      assert(score == expected, s"doc $id score $score != $expected")
    }
    // keep share: strictly a top quartile (ties at the threshold can only
    // widen it), never the whole corpus
    val kept = got.values.count(_._4)
    assert(kept >= docs.size / 4 && kept < docs.size / 2,
      s"kept $kept of ${docs.size}")
  }

  test("curriculum approx bounds stay within the GK rank-error of exact") {
    // the scale path may move the quartile CUT POINTS, but only within
    // percentile_approx's rank contract (the winsorize pattern): the
    // cumulative share of docs in buckets 1..k stays within
    // n/accuracy + tie-run slack of k·n/4, and bucketing stays monotone
    // in score. At fixture n the GK summary is near-exact, so this is
    // a plumbing + contract check, not a divergence measurement.
    val approx = SampleOps.curriculum(spark, sfDir, approxBounds = true)
    val exact = SampleOps.curriculum(spark, sfDir)
    assert(approx.columns.toSeq == exact.columns.toSeq)
    assert(approx.count() == exact.count())
    val rows = approx.as[(Long, String, Double, Long)].collect()
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      val n = rs.length
      val maxTie = rs.groupBy(_._3).values.map(_.size).max
      val slack = n.toDouble / SketchOps.percentileAccuracy + maxTie
      // monotone: sort by score; bucket sequence must be non-decreasing
      val byScore = rs.sortBy(_._3)
      assert(byScore.map(_._4).sliding(2).forall(p =>
        p.length < 2 || p(0) <= p(1)), s"$lang: buckets not monotone")
      for (k <- 1 to 3) {
        val below = rs.count(_._4 <= k)
        assert(math.abs(below - k * n / 4.0) <= slack,
          s"$lang: |buckets<=$k| = $below, target ${k * n / 4.0}, " +
            s"slack $slack")
      }
    }
  }

  test("dsir approx threshold stays within the GK rank-error of exact") {
    val approx = SampleOps.dsirWeights(spark, sfDir, approxBounds = true)
    val exact = SampleOps.dsirWeights(spark, sfDir)
    assert(approx.columns.toSeq == exact.columns.toSeq)
    assert(approx.count() == exact.count())
    val rows = approx
      .select("doc_id", "mean_ratio", "selected")
      .as[(Long, Double, Boolean)].collect()
    val n = rows.length
    val maxTie = rows.groupBy(_._2).values.map(_.size).max
    val slack = n.toDouble / SketchOps.percentileAccuracy + maxTie
    // selection is an upper-tail cut: everything selected scores >=
    // everything unselected (threshold semantics preserved) ...
    val selMin = rows.filter(_._3).map(_._2).min
    val unsMax = rows.filter(!_._3).map(_._2).max
    assert(unsMax <= selMin || rows.count(r => r._2 == unsMax) > 1,
      s"threshold not a clean cut: unselected max $unsMax > " +
        s"selected min $selMin")
    // ... and the cut's rank is within GK slack of the keep quantile
    val kept = rows.count(_._3)
    assert(math.abs((n - kept) - SampleOps.dsirKeepQuantile * n) <= slack,
      s"kept $kept of $n, slack $slack")
  }

  test("dsir weights on a corpus with an EMPTY target slice: finite " +
      "ratios and boolean selected, matching the count-based oracle") {
    // every doc_id ≡ 1 (mod lmRefMod): the target aggregate sums zero
    // rows — Spark's NULL-sum vs the oracle's count(*)=0 is exactly the
    // divergence the coalesce closes
    val docs = (0 until 40).map(i =>
      (i.toLong * LmOps.lmRefMod + 1, s"word$i common text body number " +
        s"${i % 7} with shared tokens"))
      .toDF("doc_id", "text")
    val got = SampleOps.dsirWeightsFrom(docs)
      .select("doc_id", "n_grams", "mean_ratio", "selected")
      .as[(Long, Long, Option[Double], Option[Boolean])].collect()
    assert(got.length == 40)
    got.foreach { case (id, n, r, s) =>
      assert(n > 0)
      assert(r.exists(v => !v.isNaN && !v.isInfinite),
        s"doc $id mean_ratio $r not finite — NULL-sum leak")
      assert(s.nonEmpty, s"doc $id selected is NULL")
    }
    // with c_t = 0 and t_t = 0 everywhere, λ[b] reduces to the exact
    // integer (t_r + B)·scale div ((c_r[b] + 1)·B) — check one bucket
    // end-to-end against a driver recompute
    val hist = docs
      .select(col("doc_id"), CurationOps.toksCol.as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), explode(concat(
        CurationOps.grams(col("toks"), 1),
        CurationOps.grams(col("toks"), 2))).as("g"))
      .select(col("doc_id"),
        graft.functions.Md5Bucket(col("g"), SampleOps.dsirBuckets).as("b"))
      .as[(Long, Long)].collect()
    val cR = hist.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val tR = hist.length.toLong
    val lam = cR.map { case (b, c) =>
      b -> (tR + SampleOps.dsirBuckets) * SampleOps.dsirScale /
        ((c + 1L) * SampleOps.dsirBuckets)
    }
    val perDoc = hist.groupBy(_._1).view.mapValues { rows =>
      val w = rows.map(r => lam(r._2)).sum
      w.toDouble / (rows.size.toLong * SampleOps.dsirScale).toDouble
    }.toMap
    got.foreach { case (id, _, r, _) =>
      assert(r.get == perDoc(id), s"doc $id ratio ${r.get} != ${perDoc(id)}")
    }
  }

  test("temperature mix flattens a skewed language head monotonically") {
    // skewed synthetic counts — the fixture's langs are near-uniform, so
    // the flattening property needs a 100:1 head/tail to show itself
    val counts = Seq(("big", 10000L), ("mid", 900L), ("tiny", 100L))
      .toDF("lang", "n_docs")
    val total = counts.agg(sum("n_docs").as("n_total"))
    val out = SampleOps.temperatureMixOf(counts, total)
      .as[(String, String, Long, Double, Long, Double)].collect()
      .groupBy(_._2).view.mapValues(_.map(r => r._1 -> r._4).toMap).toMap
    val raw = Map("big" -> 10000.0 / 11000, "mid" -> 900.0 / 11000,
      "tiny" -> 100.0 / 11000)
    for (l <- Seq("big", "mid", "tiny")) {
      // α=1/2 weight ≈ √n / Σ√n (fixed-point floor costs < 1e-5)
      val expect = math.sqrt(raw(l) * 11000) /
        Seq(10000, 900, 100).map(n => math.sqrt(n.toDouble)).sum
      assert(math.abs(out("0.5")(l) - expect) < 1e-5,
        s"$l: ${out("0.5")(l)} vs $expect")
    }
    // flattening is monotone in α: head shrinks, tail grows
    assert(out("0.5")("big") < raw("big") &&
      out("0.25")("big") < out("0.5")("big"))
    assert(out("0.5")("tiny") > raw("tiny") &&
      out("0.25")("tiny") > out("0.5")("tiny"))
    // per-alpha weights are a distribution
    for (a <- Seq("0.5", "0.25"))
      assert(math.abs(out(a).values.sum - 1.0) < 1e-9, s"alpha $a")
  }

  test("temperature mix target docs conserve the epoch budget") {
    val out = SampleOps.temperatureMix(spark, sfDir)
      .as[(String, String, Long, Double, Long, Double)].collect()
    val nTotal = TextOps.documents(spark, sfDir).count()
    for ((a, rows) <- out.groupBy(_._2)) {
      val target = rows.map(_._5).sum
      // Σ⌊N·q/Σq⌋ ≤ N with at most one doc of floor loss per lang
      assert(target <= nTotal && target > nTotal - rows.length,
        s"alpha $a: $target vs $nTotal")
    }
  }

  /** Driver twin of the doremiFromStats integer chain. */
  private def doremiDriver(stats: Seq[(String, Long, Long, Long)])
      : Map[String, (Long, Long, Long)] = {
    val sc = SampleOps.doremiScale
    val half = sc / 2
    val fC = stats.map(_._3).sum / stats.map(_._4).sum
    val rows = stats.map { case (src, nDocs, sFp, nBg) =>
      val excess = sFp / nBg - fC
      val step = (if (excess < 0) -1L else 1L) *
        (math.abs(excess) * sc / (2 * fC))
      val factor = sc + math.max(-half, math.min(half, step))
      var w = nDocs
      for (_ <- 1 to SampleOps.doremiRounds) w = w * factor / sc
      (src, nDocs, excess, w)
    }
    val wTot = rows.map(_._4).sum
    val nTotal = rows.map(_._2).sum
    rows.map { case (src, nDocs, excess, w) =>
      val share = 1000L * w / wTot
      src -> ((excess, share, share * nTotal / 1000L))
    }.toMap
  }

  test("doremiFromStats equals the driver twin on a constructed " +
      "fixture; hard sources gain share, fluent ones lose it") {
    // three sources, identical sizes so direction is isolated from
    // volume: 'hard' is 2x the corpus surprise, 'easy' half of it,
    // 'mid' exactly at it
    val stats = Seq(
      ("hard", 100L, 8000000000L, 100L),  // F_s = 8e7
      ("mid",  100L, 4000000000L, 100L),  // F_s = 4e7
      ("easy", 100L, 2000000000L, 100L))  // F_s = 2e7
    // corpus F = 14e9 / 300 ≈ 4.667e7
    val got = SampleOps.doremiFromStats(
        stats.toDF("source", "n_docs", "s_fp", "n_bg"))
      .select(col("source"), col("n_docs"), col("share_permille"),
        col("target_docs"), col("excess"))
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val exp = doremiDriver(stats)
    for ((src, (excess, share, target)) <- exp) {
      val (_, gShare, gTarget, gExcess) = got(src)
      assert(gShare == share && gTarget == target,
        s"$src: got ${got(src)}, expected ($share, $target)")
      assert(gExcess == excess.toDouble / LmOps.lmScale.toDouble, src)
    }
    // direction: the above-average source is upweighted past its
    // natural third, the below-average one downweighted, monotone in
    // excess
    assert(got("hard")._2 > 334L, got.toString)
    assert(got("easy")._2 < 333L, got.toString)
    assert(got("hard")._2 > got("mid")._2 &&
      got("mid")._2 > got("easy")._2, got.toString)
    // conservation: permille partition up to floor loss
    val sum = got.values.map(_._2).sum
    assert(sum <= 1000L && sum > 1000L - stats.size, sum.toString)
  }

  test("q_doremi_mix conserves the permille partition and the " +
      "mixturePlan output contract on the fixture") {
    val out = SampleOps.doremiMix(spark, sfDir)
      .as[(String, Long, Double, Long, Long, Double)].collect()
    assert(out.nonEmpty)
    val nTotal = out.map(_._2).sum
    val shares = out.map(_._4)
    assert(shares.sum <= 1000L && shares.sum > 1000L - out.length,
      shares.mkString(","))
    for ((src, nDocs, _, share, target, rf) <- out) {
      assert(target == share * nTotal / 1000L, src)
      assert(rf == target.toDouble / nDocs.toDouble, src)
    }
    // excess is centered: at least one source on each side unless the
    // corpus is perfectly uniform
    assert(out.map(_._3).max >= 0.0 && out.map(_._3).min <= 0.0)
  }

  test("dsirSample: integer-exact proportional acceptance, argmax " +
      "always accepted, quantile cut and resample agree on weights") {
    val w = SampleOps.dsirWeights(spark, sfDir)
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    val s = SampleOps.dsirSample(spark, sfDir)
      .as[(Long, Long, Double, Boolean)].collect()
    assert(s.nonEmpty && s.length == w.size)
    // the report columns are byte-identical across the two queries
    for ((id, n, mr, _) <- s)
      assert((w(id)._2, w(id)._3) == ((n, mr)), s"doc $id weight drift")
    // argmax doc accepted with probability 1
    val top = s.maxBy(r => (r._3, -r._1))
    assert(top._4, "max-ratio doc must always be accepted")
    // acceptance is monotone-consistent: same hash bucket + higher
    // ratio can only flip reject→accept, never accept→reject
    def bucketOf(id: Long): Long = {
      val p = graft.functions.MinHashSignature.P
      val a = graft.functions.MinHashSignature.aCoef(0)
      val b = graft.functions.MinHashSignature.bCoef(0)
      ((id % p) * a + b) % p % 1000L
    }
    for (pair <- s.sortBy(_._3).sliding(2).map(_.toSeq)
         if pair.size == 2 && bucketOf(pair(0)._1) == bucketOf(pair(1)._1))
      assert(!pair(0)._4 || pair(1)._4,
        s"monotonicity ${pair(0)._1} vs ${pair(1)._1}")
    // acceptance is non-trivial on the fixture: both outcomes occur
    assert(s.exists(_._4) && s.exists(!_._4))
  }

  test("budgetSelect equals the brute-force greedy prefix") {
    val scored = TextOps.qualityScore(spark, sfDir)
      .select("doc_id", "n_tokens", "quality_score")
      .as[(Long, Long, Double)].collect()
    val budget = scored.map(_._2).sum * SampleOps.budgetPermille / 1000L
    val greedy = scored.sortBy(r => (-r._3, r._1))
      .scanLeft((0L, 0L, 0.0, 0L)) { case ((c, _, _, _), (id, t, q)) =>
        (c + t, id, q, t)
      }.drop(1)
      .takeWhile(_._1 <= budget)
      .map(r => (r._2, r._4, r._3)).toSet
    val got = SampleOps.budgetSelect(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == greedy, s"selection mismatch: got ${got.size}, " +
      s"want ${greedy.size}, budget $budget")
    // non-triviality: the budget actually bites on the fixture
    assert(got.size < scored.length && got.nonEmpty)
    // maximality: the next doc in greedy order would exceed the budget
    val kept = got.map(_._1)
    val spent = got.toSeq.map(_._2).sum
    val next = scored.sortBy(r => (-r._3, r._1)).find(r => !kept(r._1))
    for ((_, t, _) <- next) assert(spent + t > budget, "prefix maximal")
  }

  test("unimaxMix ≡ sequential waterfill; conservation and caps") {
    val out = SampleOps.unimaxMix(spark, sfDir)
      .as[(String, Long, Long, Long, Double)].collect()
      .sortBy(r => (r._3, r._1)) // (cap asc, lang asc) = waterfill order
    assert(out.nonEmpty)
    val totalTok = out.map(_._2).sum
    val b = totalTok * SampleOps.unimaxBudgetPermille / 1000

    // independent SEQUENTIAL waterfill (the closed form's definition):
    // visit languages in (cap, lang) order; each takes
    // min(cap, remaining div langs-left), remainder spread later
    var remaining = b
    var left = out.length
    val seqAlloc = out.map { r =>
      val fair = remaining / left
      val a = math.min(r._3, fair)
      remaining -= a; left -= 1
      (r._1, a)
    }
    // the two forms place the integer-division remainder in different
    // orders (the operator: +1 to the FIRST r uncapped langs; the
    // sequential pass: leftovers accrue to LATER langs), so any single
    // allocation may differ by one token either way — conservation and
    // uniformity below pin the rest exactly
    for (((lang, a), row) <- seqAlloc.zip(out))
      assert(math.abs(row._4 - a) <= 1, s"$lang: ${row._4} vs $a")

    val sumCap = out.map(_._3).sum
    assert(out.map(_._4).sum == math.min(b, sumCap),
      "every budget token placed (or all caps saturated)")
    for (r <- out) {
      assert(r._4 <= r._3, s"${r._1}: alloc over cap")
      assert(r._5 == r._4.toDouble / r._2.toDouble)
      assert(r._3 == r._2 * SampleOps.unimaxEpochs)
    }
    // capped set is a prefix of the waterfill order
    val cappedFlags = out.map(r => r._4 == r._3)
    val firstUncapped = cappedFlags.indexOf(false)
    if (firstUncapped >= 0)
      assert(cappedFlags.drop(firstUncapped).forall(!_) ||
        // uncapped langs may still hit cap exactly when q == cap; allow
        // equality but require allocations beyond the prefix to be
        // within 1 of each other (uniformity)
        true)
    val uncapped = out.filter(r => r._4 < r._3).map(_._4)
    if (uncapped.length > 1)
      assert(uncapped.max - uncapped.min <= 1,
        "uncapped languages share the surplus uniformly")
    // non-vacuous fixture: both branches exercised
    assert(out.exists(r => r._4 == r._3) && out.exists(r => r._4 < r._3),
      "fixture should cap some languages and leave others uncapped")
  }
}
