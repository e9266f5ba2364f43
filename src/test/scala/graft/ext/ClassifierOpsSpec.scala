package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ClassifierOpsSpec extends SparkSpec {
  import spark.implicits._

  test("trained quality classifier beats the class prior and the seam " +
      "output equals an independent DataFrame-path recompute") {
    val out = ClassifierOps.qualityClassifier(spark, sfDir)
      .as[(Long, Long, Long, Double, Boolean)].collect()
    assert(out.nonEmpty)
    // 1. it LEARNS: in-sample accuracy clears the majority-class prior
    // by a real margin
    val n = out.length
    val pos = out.count(_._2 == 1L)
    val prior = math.max(pos, n - pos).toDouble / n
    val acc = out.count(r => r._5 == (r._2 == 1L)).toDouble / n
    assert(acc >= prior + 0.05, s"acc $acc vs prior $prior — not learning")
    // ... and it errs in BOTH directions (not a constant predictor)
    assert(out.exists(_._5) && out.exists(!_._5))

    // 2. the batched-seam inference (JVM tokenization inside the model)
    // equals a recompute through the Spark expression path: gram buckets
    // from the operator's own column expressions, weights from the
    // trained map — a genuinely independent feature-extraction twin
    val w = ClassifierOps.trainWeights(spark, sfDir)
    val byDoc = ClassifierOps.gramBuckets(spark, sfDir)
      .as[(Long, Int)].collect().groupBy(_._1)
    val expected = byDoc.map { case (id, rows) =>
      id -> ((rows.length.toLong, rows.map(r => w(r._2)).sum))
    }
    assert(out.length == expected.size)
    val scale = ClassifierOps.qcScale
    out.foreach { case (id, _, ng, ratio, pred) =>
      val (en, es) = expected(id)
      assert(ng == en, s"doc $id n_grams $ng != $en")
      assert(ratio == es.toDouble / (en * scale).toDouble, s"doc $id ratio")
      assert(pred == (es >= en * scale), s"doc $id pred")
    }

    // 3. the weights really discriminate (not all λ = S — a degenerate
    // model would collapse to the constant ratio 1)
    assert(w.values.exists(_ != scale) && w.values.exists(_ > scale) &&
      w.values.exists(_ < scale))
  }

  test("quality classifier GENERALIZES: trained on two-thirds of the " +
      "docs, it beats the class prior on the HELD-OUT third") {
    // the flagship query's in-sample accuracy could in principle be
    // memorization; this pins real signal transfer — weights never see
    // the held-out slice (hash membership, partitioning-independent)
    val y = ClassifierOps.labels(spark, sfDir)
    val db = ClassifierOps.gramBuckets(spark, sfDir)
    val trainCond = col("doc_id") % 3 =!= 0
    val w = ClassifierOps.trainWeightsOn(spark,
      y.filter(trainCond), db.filter(trainCond))
    val heldLabels = y.filter(!trainCond)
      .as[(Long, Int)].collect().toMap
    val held = db.filter(!trainCond).as[(Long, Int)].collect()
      .groupBy(_._1)
    assert(held.nonEmpty)
    val results = held.toSeq.map { case (id, rows) =>
      val s = rows.map(r => w(r._2)).sum
      (heldLabels(id) == 1,
        s >= rows.length.toLong * ClassifierOps.qcScale)
    }
    val n = results.size
    val pos = results.count(_._1)
    val prior = math.max(pos, n - pos).toDouble / n
    val acc = results.count(r => r._1 == r._2).toDouble / n
    assert(acc >= prior + 0.03,
      s"held-out acc $acc vs prior $prior (n=$n) — memorization, " +
        "not generalization")
  }

  test("reference-slice classifier separates text the HEURISTIC provably " +
      "cannot: constant quality score, disjoint gram styles, held out") {
    // The circularity fix's capability pin. Every doc has EXACTLY the
    // same heuristic ingredients — 120 tokens (term1 capped at 0.4),
    // 24 stopwords (term2 = 0.3·0.2), zero punctuation (term3 = 0.3) —
    // so quality_score is one constant across the corpus and the
    // heuristic gate cannot rank any doc above any other. The
    // reference slice (id ≡ 0 mod lmRefMod) is written in a "clean"
    // vocabulary and the crawl in a disjoint "noisy" one; the
    // ref-labeled classifier must recover that split on docs NO label
    // touched (id % lmRefMod >= 2) — signal the heuristic does not
    // encode, which is what makes it an independent funnel gate.
    val cleanW = Seq("apple", "berry", "cider", "dough",
      "eagle", "fable", "grape", "honey")
    val noisyW = Seq("zxqwv", "kjhgf", "pqzxw", "vbnml",
      "qwzxc", "xcvbq", "mnbvz", "llkjh")
    val m = LmOps.lmRefMod.toInt
    def text(ws: Seq[String], seed: Int): String =
      (0 until 24).flatMap(g =>
        (0 until 4).map(j => ws((seed + g * 4 + j) % ws.length)) :+ "the")
        .mkString(" ")
    val docs = (0 until 200).map { i =>
      val clean = i % m == 0 || i % m == 2
      (i.toLong, if (clean) text(cleanW, i) else text(noisyW, i))
    }.toDF("doc_id", "text")

    // 1. the heuristic really is blind here: ONE distinct score
    val scores = TextOps.withQualityScore(
        docs.withColumn("norm", TextOps.normText(col("text"))))
      .select("quality_score").as[Double].collect()
    assert(scores.distinct.length == 1,
      s"heuristic not constant: ${scores.distinct.toSeq.take(3)}")

    // 2. train on the two labeled slices, score everything through the
    // production seam
    val w = ClassifierOps.trainWeightsOn(spark,
      ClassifierOps.refLabelsFrom(docs),
      ClassifierOps.gramBucketsFrom(docs))
    val h = ClassifierOps.TrainedQualityModel(w).open()
    val verdicts = h.scoreBatch(
        docs.as[(Long, String)].collect().toSeq)
      .map { case (id, n, s) =>
        id -> (s >= n * ClassifierOps.qcScale)
      }.toMap
    h.close()

    // 3. held-out separation: clean extrapolated docs accepted, noisy
    // rejected — perfectly, the vocabularies are disjoint
    val held = (0 until 200).filter(_ % m >= 2)
    assert(held.nonEmpty)
    held.foreach { i =>
      val clean = i % m == 2
      assert(verdicts(i.toLong) == clean,
        s"held-out doc $i (clean=$clean) misclassified — the " +
          "reference-slice signal did not transfer")
    }
  }

  test("ingest funnel gated by the REFERENCE-slice classifier obeys the " +
      "equality law — the independent-signal gate wiring") {
    import graft.streaming.EventStream
    val (cAb, cA, voc) = LmOps.trainTables(spark, sfDir)
    val feed = DedupOps.incrementalBatchDocs(spark, sfDir)
      .join(TextOps.documents(spark, sfDir).select("doc_id", "lang"),
        Seq("doc_id"))
      .select("doc_id", "lang", "text")
    val (ungated, _) = EventStream.ingestFunnelBatch(
      feed, sfDir, cAb, cA, voc, TextOps.curateQualityMin,
      EventStream.funnelFluencyMax)
    val u = ungated.select("doc_id").as[Long].collect().toSet
    ungated.unpersist(false)
    val ref = ClassifierOps.qualityClassifierRef(spark, sfDir)
      .select("doc_id", "pred").persist()
    val (gated, _) = EventStream.ingestFunnelBatch(
      feed, sfDir, cAb, cA, voc, TextOps.curateQualityMin,
      EventStream.funnelFluencyMax, modelGate = Some(ref))
    val g = gated.select("doc_id").as[Long].collect().toSet
    val pos = ref.filter(col("pred")).select("doc_id")
      .as[Long].collect().toSet
    gated.unpersist(false); ref.unpersist(false)
    assert(g == (u & pos),
      s"ref-gated != ungated ∩ ref-positive: " +
        s"missing=${((u & pos) -- g).take(5)} " +
        s"extra=${(g -- (u & pos)).take(5)}")
  }

  test("langIdNb on languages that actually differ: near-perfect, and " +
      "decisively above the marker baseline (which scores zero there)") {
    // three synthetic languages with DISJOINT character inventories —
    // the signal the shared-vocabulary fixture cannot provide. Doc ids
    // are laid out so each lang has reference-slice members
    // (id % lmRefMod == 0) and held-out members.
    val langWords = Map(
      "aa" -> Seq("abc", "bace", "cabba", "deca", "eadb"),
      "nn" -> Seq("nop", "pqrs", "qonn", "rstq", "sunor"),
      "xx" -> Seq("xyz", "zwyx", "wvzz", "vuwx", "yxvu"))
    val langs = langWords.keys.toSeq.sorted
    val docs = (0 until 120).map { i =>
      val lang = langs(i % 3)
      val ws = langWords(lang)
      val text = (0 until 30).map(j => ws((i * 7 + j) % ws.length))
        .mkString(" ")
      (i.toLong, lang, text)
    }.toDF("doc_id", "lang", "text")
    val out = ClassifierOps.langIdNbFrom(docs)
      .select("doc_id", "labeled_lang", "predicted_lang")
      .as[(Long, String, String)].collect()
    assert(out.length == 120)
    val acc = out.count(r => r._2 == r._3).toDouble / out.length
    assert(acc >= 0.95, s"NB accuracy $acc on separable languages")
    // held-out docs (NOT in the reference slice) are also classified —
    // the profiles generalize, this is not just memorization
    val heldOut = out.filter(_._1 % LmOps.lmRefMod != 0)
    assert(heldOut.nonEmpty)
    assert(heldOut.count(r => r._2 == r._3).toDouble / heldOut.length
      >= 0.95, "held-out accuracy collapsed")
    // the marker baseline has no markers for these languages: every
    // doc scores zero on every profile and falls through to 'und' —
    // the trained model is strictly better wherever text has signal
    val markers = TextOps.langMarkers.map(_._1).toSet
    assert(langs.forall(l => !markers.contains(l)))
  }

  test("langIdNb stays accurate under 4x language-size IMBALANCE " +
      "(the size-bias probe the quality classifier's redesign came from)") {
    // same disjoint alphabets, but one language dominates the corpus —
    // the mean-inverse surrogate must not collapse to predicting the
    // big language (smoothing-penalty asymmetry) on held-out docs
    val langWords = Map(
      "aa" -> Seq("abc", "bace", "cabba", "deca", "eadb"),
      "nn" -> Seq("nop", "pqrs", "qonn", "rstq", "sunor"),
      "xx" -> Seq("xyz", "zwyx", "wvzz", "vuwx", "yxvu"))
    val sizes = Map("aa" -> 120, "nn" -> 30, "xx" -> 30)
    val langOff = Map("aa" -> 0L, "nn" -> 1L, "xx" -> 2L)
    val docs = sizes.toSeq.sortBy(_._1).flatMap { case (lang, count) =>
      val ws = langWords(lang)
      (0 until count).map { j =>
        // ids distinct by construction (3j + per-lang offset), and 3j+k
        // mod lmRefMod=5 cycles every residue, so each lang hits the
        // reference slice
        (3L * j + langOff(lang), lang,
          (0 until 25).map(k => ws((j * 5 + k) % ws.length)).mkString(" "))
      }
    }.toDF("doc_id", "lang", "text")
    val out = ClassifierOps.langIdNbFrom(docs)
      .select("doc_id", "labeled_lang", "predicted_lang")
      .as[(Long, String, String)].collect()
    assert(out.length == 180)
    val acc = out.count(r => r._2 == r._3).toDouble / out.length
    assert(acc >= 0.9, s"imbalanced-language accuracy $acc")
    // per-language: the SMALL languages must not be swallowed
    out.groupBy(_._2).foreach { case (lang, rs) =>
      val a = rs.count(r => r._2 == r._3).toDouble / rs.length
      assert(a >= 0.8, s"lang $lang accuracy $a under imbalance")
    }
  }

  test("langIdNb fixture floor: above random guess, and the no-signal " +
      "caveat is real (NEITHER predictor clears the majority prior)") {
    // the fixture's five langs share one vocabulary — lang labels are
    // textually meaningless, which this test DOCUMENTS as much as
    // checks: trained NB must beat the 1/|langs| random floor (it
    // learns per-language volume/coverage quirks), and neither it nor
    // the marker baseline can reach the majority-class prior
    val nb = ClassifierOps.langIdNb(spark, sfDir)
      .select("labeled_lang", "predicted_lang")
      .as[(String, String)].collect()
    val langs = nb.map(_._1).distinct
    val accNb = nb.count(r => r._1 == r._2).toDouble / nb.length
    assert(accNb > 1.0 / langs.length,
      s"NB $accNb under the random floor")
    val prior = nb.groupBy(_._1).values.map(_.size).max.toDouble / nb.length
    assert(accNb < prior + 0.05,
      s"NB $accNb beats the prior $prior on label-shuffled text — " +
        "that would mean the fixture HAS lang signal and the synthetic " +
        "spec should be retired in favor of fixture accuracy")
  }

  test("ingest funnel composed with the trained model gate: accepted = " +
      "ungated accepted ∩ model-positive; stats still conserve") {
    import graft.streaming.EventStream
    val (cAb, cA, voc) = LmOps.trainTables(spark, sfDir)
    val feed = DedupOps.incrementalBatchDocs(spark, sfDir)
      .join(TextOps.documents(spark, sfDir).select("doc_id", "lang"),
        Seq("doc_id"))
      .select("doc_id", "lang", "text")
    val (ungated, uStats) = EventStream.ingestFunnelBatch(
      feed, sfDir, cAb, cA, voc, TextOps.curateQualityMin,
      EventStream.funnelFluencyMax)
    val u = ungated.select("doc_id").as[Long].collect().toSet
    ungated.unpersist(false)

    // the EQUALITY LAW with the real trained model's verdicts: the gate
    // sits in stage 1, upstream of dedup + fluency; a model-rejected
    // doc can never be accepted, and a model-accepted doc's fate
    // matches the ungated run (dropping batch docs only shrinks the
    // probe side — corpus-censused buckets are static)
    val real = ClassifierOps.qualityClassifier(spark, sfDir)
      .select("doc_id", "pred").persist()
    val (gatedReal, _) = EventStream.ingestFunnelBatch(
      feed, sfDir, cAb, cA, voc, TextOps.curateQualityMin,
      EventStream.funnelFluencyMax, modelGate = Some(real))
    val gReal = gatedReal.select("doc_id").as[Long].collect().toSet
    val posReal = real.filter(col("pred")).select("doc_id")
      .as[Long].collect().toSet
    gatedReal.unpersist(false); real.unpersist(false)
    assert(gReal == (u & posReal),
      s"gated != ungated ∩ positive: " +
        s"missing=${((u & posReal) -- gReal).take(5)} " +
        s"extra=${(gReal -- (u & posReal)).take(5)}")
    // (the trained model agrees with the heuristic on every accepted
    // feed doc here — which is the distillation working, and why the
    // FILTERING drill below uses synthetic verdicts instead)

    // gate MECHANISM drill with disagreeing verdicts: a third of the
    // docs model-rejected — the gate must actually remove them and the
    // stats must still conserve with stage 1 strictly tightened
    val synth = feed.select(col("doc_id"),
      (col("doc_id") % 3 =!= 0).as("pred"))
    val (gated, gStats) = EventStream.ingestFunnelBatch(
      feed, sfDir, cAb, cA, voc, TextOps.curateQualityMin,
      EventStream.funnelFluencyMax, modelGate = Some(synth))
    val g = gated.select("doc_id").as[Long].collect().toSet
    gated.unpersist(false)
    val posSynth = feed.filter(col("doc_id") % 3 =!= 0)
      .select("doc_id").as[Long].collect().toSet
    assert(g == (u & posSynth),
      s"synthetic gate: missing=${((u & posSynth) -- g).take(5)} " +
        s"extra=${(g -- (u & posSynth)).take(5)}")
    assert(g.nonEmpty && g.size < u.size,
      "synthetic gate vacuous — nothing filtered or nothing left")
    val s = gStats.select("n_in", "n_quality_drop", "n_dup_drop",
      "n_fluency_drop", "n_accepted")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(s._1 == s._2 + s._3 + s._4 + s._5)
    val su = uStats.select("n_quality_drop").as[Long].head()
    assert(s._2 > su, "gate did not tighten stage 1")
  }

  test("classifierCalibration: decile bounds, volume conservation, " +
      "bucket>=5 iff pred") {
    val cal = ClassifierOps.classifierCalibration(spark, sfDir)
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(cal.nonEmpty)
    val cls = ClassifierOps.qualityClassifier(spark, sfDir)
      .as[(Long, Long, Long, Double, Boolean)].collect()
    // every scored+labeled doc lands in exactly one bin
    assert(cal.map(_._2).sum == cls.length.toLong)
    for ((b, n, conf, rate, gap) <- cal) {
      assert(b >= 0 && b < ClassifierOps.calibBuckets, s"bucket $b")
      assert(n > 0)
      // mean confidence sits inside its own bin (fixed-point floor)
      assert(conf >= b.toDouble / 10.0 && conf < (b + 1).toDouble / 10.0,
        s"bucket $b avg_conf $conf outside bin")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(math.abs(gap - math.abs(conf - rate)) < 1e-12)
    }
    // the truncating fixed-point p is EXACTLY consistent with pred:
    // p_fp >= 500000 <=> s >= n*S <=> pred, so the upper-half bins
    // hold exactly the predicted-positive docs
    val upperMass = cal.filter(_._1 >= 5).map(_._2).sum
    assert(upperMass == cls.count(_._5).toLong,
      s"upper-bin mass $upperMass != predicted positives")
  }

  test("PR sweep is exactly the cumulative view of the calibration bins") {
    val cal = ClassifierOps.classifierCalibration(spark, sfDir)
      .select("bucket", "n_docs", "pos_rate")
      .as[(Long, Long, Double)].collect()
      .map { case (b, n, rate) =>
        // pos_rate = n_pos/n_docs in doubles; n_pos is a small exact
        // integer, so the round-trip is exact
        (b, n, math.round(rate * n))
      }
    val td = cal.map(_._2).sum
    val tpa = cal.map(_._3).sum
    val got = ClassifierOps.classifierPr(spark, sfDir)
      .select("k", "thr_fp", "tp", "fp", "fn", "tn",
        "precision", "recall", "f1")
      .as[(Long, Long, Long, Long, Long, Long, Double, Double, Double)]
      .collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == (0L until ClassifierOps.calibBuckets))
    for ((k, thr, tp, fp, fn, tn, p, r, f1) <- got) {
      val above = cal.filter(_._1 >= k)
      assert(thr == k * 100000L)
      assert(tp == above.map(_._3).sum, s"k=$k tp")
      assert(fp == above.map(_._2).sum - tp, s"k=$k fp")
      assert(fn == tpa - tp, s"k=$k fn")
      assert(tn == td - above.map(_._2).sum, s"k=$k tn")
      val ep = if (tp + fp == 0) 0.0 else tp.toDouble / (tp + fp).toDouble
      val er = if (tpa == 0) 0.0 else tp.toDouble / tpa.toDouble
      assert(math.abs(p - ep) < 1e-12 && math.abs(r - er) < 1e-12)
      val ef1 = if (ep + er == 0.0) 0.0 else 2.0 * ep * er / (ep + er)
      assert(math.abs(f1 - ef1) < 1e-12)
    }
    // the sweep is a real curve on the fixture: recall strictly falls
    // somewhere and precision moves — not a constant table
    assert(got.map(_._8).distinct.length > 1, "recall never moves")
  }
}
