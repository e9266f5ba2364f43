package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.Canon

/** TRAINED model-based quality filtering — the classifier stage between
  * heuristic filters and dedup in a pre-training pipeline (the
  * GPT-3/fastText quality-classifier recipe: train a cheap linear model
  * over hashed text features, run it over the whole crawl). This
  * replaces the closed-form [[ScoringOps.QualityStub]] toy with a model
  * whose weights are actually LEARNED from the corpus in-engine:
  *
  *  - **features**: hashed gram counts — unigram + bigram occurrences
  *    bucketed to [[qcBuckets]] dims by the shared
  *    [[graft.functions.Md5Bucket]] digest (the DSIR machinery);
  *  - **labels**: weak supervision by DISTILLATION — y = 1 iff the
  *    heuristic [[TextOps]] quality score clears
  *    [[TextOps.curateQualityMin]]. Distilling a heuristic/LLM judge
  *    into a fast hashed-feature model is the standard production
  *    pattern (the expensive labeler touches a slice; the distilled
  *    model touches everything);
  *  - **model**: per-bucket LIKELIHOOD RATIOS in the repo's
  *    exact-arithmetic discipline — the weight of bucket b is the
  *    add-one smoothed Bayes factor
  *    `λ[b] = ((c₁+1)·(t₀+D))·S div ((c₀+1)·(t₁+D))` (integer fixed
  *    point), a document scores `s = Σ_grams λ[bucket]`, and the
  *    prediction is the integer-exact `s ≥ n·S` (mean ratio ≥ 1 — more
  *    likely under the positive class per gram, on average). The ratio
  *    form rather than two per-class mean-inverse scores deliberately:
  *    both classes' totals normalize INSIDE each weight, so the
  *    class-size artifact of comparing raw inverse-frequency sums (the
  *    smaller class's sparser profile inflates its unseen-gram
  *    penalties and the bigger class wins by coverage, not content —
  *    measured as predict-the-prior on held-out docs) cancels. This is
  *    the [[SampleOps.dsirWeights]] λ construction pointed at a label
  *    instead of a target slice. Training is CLOSED-FORM — one keyed
  *    aggregation, no iterations — which is why it beats fixed-point
  *    SGD here: no learning-rate fragility, nothing to unroll, and the
  *    DuckDB twin is exact by construction. A likelihood-ratio sum IS
  *    a linear scorer over the count vector, trained where least
  *    squares would need a D×D inverse SQL can't do exactly. A
  *    LENGTH-BUCKET pseudo-gram (`##len_k`) rides the feature stream —
  *    the label's dominant component is token volume, which a
  *    length-normalized bag cannot see (fastText-style quality
  *    classifiers add exactly this feature), and held-out
  *    generalization is what the spec pins.
  *
  * The trained weights are a 2·[[qcBuckets]]-row TABLE (collect is
  * bounded by 2·D rows — the k-means centroid-sync pattern). The gated
  * queries score via the histogram × broadcast-λ join (one codegen
  * feature pass; r14 optimization) — s = Σ_b n·λ[b], bit-identical to
  * the [[TrainedQualityModel]] seam, which scoreBatch re-derives
  * JVM-side with the operator's exact tokenization rule and
  * ClassifierOpsSpec pins; the DuckDB oracle reproduces feature
  * extraction, training AND inference end-to-end.
  *
  * Scale shape: training is one corpus-sized gram pass folding into a
  * 2·D-row model (map-side combined keyed aggs — the DSIR histogram
  * shape); inference is embarrassingly parallel over documents with
  * the model broadcast inside the task closure. Both classes must be
  * present in the training slice (require-guarded, the A1 fail-fast
  * pattern) — a one-class corpus has nothing to separate.
  */
object ClassifierOps {

  /** Hashed feature dimensionality (Md5Bucket modulus). */
  val qcBuckets = 512

  /** Fixed-point scale of the likelihood-ratio weights. */
  val qcScale = 1000000L

  /** Token-count thresholds of the length-bucket pseudo-gram (the
    * driftCharBounds shape: `##len_k` with k = index of the first bound
    * the count fits under, else bounds.length).
    */
  val qcLenBounds: Seq[Int] = Seq(8, 16, 32, 64, 128)

  private[ext] def lenBucketOf(nToks: Int): Int = {
    val i = qcLenBounds.indexWhere(nToks <= _)
    if (i < 0) qcLenBounds.length else i
  }

  /** The trained weights: bucket → λ_fp likelihood ratio, complete over
    * the D grid. Bounded driver sync, like k-means centroids.
    */
  private[ext] def trainWeights(spark: SparkSession, sfDir: String)
      : Map[Int, Long] =
    trainWeightsOn(spark, labels(spark, sfDir), gramBuckets(spark, sfDir))

  /** Training core over explicit label/feature frames — the held-out
    * evaluation seam (train on one doc slice, score another; the
    * generalization spec drives it).
    */
  private[ext] def trainWeightsOn(spark: SparkSession, y: DataFrame,
                                  db: DataFrame): Map[Int, Long] =
    trainWeightsOnHist(spark, y,
      db.groupBy("doc_id", "b").agg(count(lit(1)).as("n")))

  /** Training core over the per-doc bucket HISTOGRAM (doc_id, b, n)
    * instead of the raw occurrence stream — same counts by weighted
    * sum (c1 = Σ n over y=1 docs), so λ is bit-identical; the join and
    * shuffle touch ≤ D·n_docs rows instead of one row per gram
    * occurrence (guide §2.3: aggregate before you shuffle). The
    * histogram is the frame [[scoredLabeled]] persists and scores
    * from, so feature extraction runs ONCE per query.
    */
  private[ext] def trainWeightsOnHist(spark: SparkSession, y: DataFrame,
                                      hist: DataFrame): Map[Int, Long] = {
    import spark.implicits._
    val byB = hist.join(y, Seq("doc_id"))
      .groupBy("b").agg(
        sum(when(col("y") === 1, col("n")).otherwise(0L)).as("c1"),
        sum(when(col("y") === 0, col("n")).otherwise(0L)).as("c0"))
      .persist()
    val (t0, t1) = byB.agg(sum("c0"), sum("c1"))
      .as[(Option[Long], Option[Long])].head() match {
      case (a, b) => (a.getOrElse(0L), b.getOrElse(0L))
    }
    require(t0 > 0 && t1 > 0,
      s"quality classifier needs both classes in the training slice " +
        s"(t0=$t0, t1=$t1)")
    val grid = spark.range(qcBuckets).select(col("id").cast("int").as("b"))
    // DECIMAL(38,0) intermediates: the numerator is count·total·scale —
    // three corpus-scaled factors whose BIGINT product overflows at
    // ~100× the bench corpus (caught by the ×100 posture run). The
    // integer quotient is unchanged and fits BIGINT (λ ≤ (t1+D)·S).
    val out = grid.join(byB, Seq("b"), "left")
      .select(col("b"), expr(
        s"""CAST(CAST(coalesce(c1, 0L) + 1L AS DECIMAL(38,0))
           | * ${t0 + qcBuckets}L * $qcScale
           | div (CAST(coalesce(c0, 0L) + 1L AS DECIMAL(38,0))
           | * ${t1 + qcBuckets}L) AS BIGINT)"""
          .stripMargin.replace("\n", "")).as("lam"))
      .as[(Int, Long)].collect().toMap
    byB.unpersist(false)
    out
  }

  /** y = 1 iff the heuristic quality score clears the curation bar —
    * the distillation label.
    */
  private[ext] def labels(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.withQualityScore(
        TextOps.documents(spark, sfDir)
          .withColumn("norm", TextOps.normText(col("text"))))
      .select(col("doc_id"),
        (col("quality_score") >= TextOps.curateQualityMin)
          .cast("int").as("y"))

  /** The CCNet/GPT-3 quality-filter label frame — reference-SLICE
    * membership, NOT a distilled heuristic: positive = the clean slice
    * the reference LM trains on (doc_id ≡ 0 mod [[LmOps.lmRefMod]] —
    * [[LmOps]]'s hash-membership corpus, the stand-in for
    * Wikipedia/WebText), negative = the equal-sized disjoint hash slice
    * of the remaining crawl (doc_id ≡ 1). Docs outside both slices are
    * scored but carry no training label — the whole point: the model
    * generalizes "looks like the reference corpus" onto text no labeler
    * touched, which makes it an INDEPENDENT second opinion beside the
    * heuristic gate rather than a re-approximation of it
    * (the round-8 circularity fix).
    */
  private[ext] def refLabelsFrom(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % LmOps.lmRefMod <= 1)
      .select(col("doc_id"),
        (col("doc_id") % LmOps.lmRefMod === 0).cast("int").as("y"))

  /** One row per gram OCCURRENCE (unigrams + bigrams + the length
    * pseudo-gram), bucketed.
    */
  private[ext] def gramBuckets(spark: SparkSession, sfDir: String): DataFrame =
    gramBucketsFrom(TextOps.documents(spark, sfDir))

  /** Feature core over an explicit docs frame — the synthetic-corpus
    * capability seam (the langIdNbFrom pattern).
    */
  private[ext] def gramBucketsFrom(docs: DataFrame): DataFrame = {
    val lenBucket = qcLenBounds.zipWithIndex.foldRight(
      lit(qcLenBounds.length)) { case ((bound, i), acc) =>
      when(size(col("toks")) <= bound, i).otherwise(acc)
    }
    docs
      .repartition(col("doc_id"))
      .select(col("doc_id"), CurationOps.toksCol.as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"),
        explode(concat(CurationOps.grams(col("toks"), 1),
          CurationOps.grams(col("toks"), 2),
          array(concat(lit("##len_"), lenBucket.cast("string"))))).as("g"))
      .select(col("doc_id"),
        graft.functions.Md5Bucket(col("g"), qcBuckets).cast("int").as("b"))
  }

  /** The trained model as a [[ScoringOps.BatchModel]]: weights learned
    * in-engine ride the production batched-inference seam. scoreBatch
    * re-derives the features JVM-side with the operator's exact
    * tokenization rule (normText ≡ replaceAll+trim+lowercase on the
    * ASCII fixture, grams ≡ sliding windows, bucket ≡ the shared
    * Md5Bucket digest), so seam output is bit-identical to the
    * DataFrame/SQL formulations.
    */
  final case class TrainedQualityModel(weights: Map[Int, Long])
      extends ScoringOps.BatchModel[(Long, String), (Long, Long, Long)] {
    val name = "quality-lr-v1"
    def open(): ScoringOps.BatchHandle[(Long, String), (Long, Long, Long)] =
      new ScoringOps.BatchHandle[(Long, String), (Long, Long, Long)] {
        def scoreBatch(batch: Seq[(Long, String)])
            : Seq[(Long, Long, Long)] =
          batch.map { case (id, text) =>
            val toks = text.replaceAll("\\s+", " ").trim
              .toLowerCase(java.util.Locale.ROOT)
              .split(" ").filter(_.nonEmpty).toSeq
            val grams = toks ++
              (if (toks.length >= 2) toks.sliding(2).map(_.mkString(" "))
               else Iterator.empty) ++
              (if (toks.nonEmpty) Seq(s"##len_${lenBucketOf(toks.length)}")
               else Nil)
            var n = 0L; var s = 0L
            grams.foreach { g =>
              val b = graft.functions.Md5Bucket
                .bucket(UTF8String.fromString(g), qcBuckets).toInt
              s += weights(b); n += 1L
            }
            (id, n, s)
          }
        def close(): Unit = ()
      }
  }

  /** q_quality_classifier: train on the whole fixture, score every
    * (tokenizable) document through the batched seam, and emit per doc
    * the label, the mean likelihood ratio (one final double division —
    * the LmOps output convention) and the integer-exact prediction
    * `pred = s ≥ n·S` (mean Bayes factor at least 1).
    */
  def qualityClassifier(spark: SparkSession, sfDir: String): DataFrame = {
    val (sl, inter) = scoredLabeled(spark, sfDir)
    Canon.materialized(Canon.canonicalize(sl
      .select(col("doc_id"), col("y").cast("long").as("label"),
        col("n_grams"),
        (col("s").cast("double") /
          (col("n_grams") * qcScale).cast("double")).as("mean_ratio"),
        (col("s") >= col("n_grams") * qcScale).as("pred"))), inter: _*)
  }

  /** Trained scores joined to the distilled labels — the shared core of
    * [[qualityClassifier]], [[classifierCalibration]] and
    * [[classifierPr]] (one feature pass, one training sync, one scoring
    * join; three reports). Returns the scored frame plus the persisted
    * intermediates the caller must release (the
    * [[SampleOps.dsirDocWeights]] convention).
    *
    * r14 optimization (guide §1.2 step 1 / §4.1): the original scoring
    * pass re-tokenized and re-hashed the whole corpus through the
    * per-row [[TrainedQualityModel]] JVM closure behind a full text
    * repartition — a third corpus text pass (labels, gram features,
    * scoreBatch) and a non-codegen hot path. Scoring is now the
    * histogram × broadcast-λ join: s = Σ_b n·λ[b] — the SAME
    * order-independent integer sum the seam computes (bit-identical
    * output; the seam itself stays pinned by ClassifierOpsSpec and
    * exercised by q_model_score). One corpus feature pass total, no
    * text shuffle, everything codegen.
    */
  private def scoredLabeled(spark: SparkSession, sfDir: String)
      : (DataFrame, Seq[DataFrame]) = {
    import spark.implicits._
    val hist = gramBuckets(spark, sfDir)
      .groupBy("doc_id", "b").agg(count(lit(1)).as("n")).persist()
    // no eager count needed: trainWeightsOnHist's driver collect is
    // itself an action that materializes the hist and y caches BEFORE
    // the scoring join is built — consumers are sequential, not racing
    val y = labels(spark, sfDir).persist() // training + the final join
    val w = trainWeightsOnHist(spark, y, hist)
    val lam = w.toSeq.toDF("b", "lam")
    val scored = hist.join(broadcast(lam), Seq("b"))
      .groupBy("doc_id")
      .agg(sum(col("n") * col("lam")).as("s"), sum("n").as("n_grams"))
      .filter(col("n_grams") > 0)
      .join(y, Seq("doc_id"))
    (scored, Seq(hist, y))
  }

  /** Calibration probability bins. */
  val calibBuckets = 10L

  /** Fixed-point unit of the calibration probability
    * p = s / (s + n·[[qcScale]]) — the Bayes-factor score mapped to
    * (0,1) by r/(1+r).
    */
  val calibScale = 1000000L

  /** CLASSIFIER CALIBRATION — the reliability diagram every deployed
    * filter needs before its scores can gate a corpus: documents
    * binned by predicted probability (decile of the fixed-point
    * p = s/(s + n·S)), each bin reporting volume, mean confidence and
    * OBSERVED positive rate; |avg_conf − pos_rate| is the per-bin
    * calibration gap whose volume-weighted sum is ECE. A
    * well-calibrated filter's threshold means what it says; a
    * miscalibrated one silently shifts the quality bar.
    *
    * Numeric discipline (the [[trainWeightsOn]] precedent): p is an
    * integer-exact DECIMAL(38,0) quotient per document (BIGINT s·10⁶
    * overflows once s carries corpus-scaled λ sums), bins and both
    * numerators are order-independent INTEGER sums, and doubles appear
    * only in the final per-bin divisions — so the table is
    * bit-deterministic under any partitioning.
    */
  def classifierCalibration(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val (sl, inter) = scoredLabeled(spark, sfDir)
    val withP = sl
      .withColumn("p_fp", expr(
        s"""CAST(CAST(s AS DECIMAL(38,0)) * $calibScale
           | div (CAST(s AS DECIMAL(38,0))
           |      + CAST(n_grams AS DECIMAL(38,0)) * $qcScale)
           | AS BIGINT)""".stripMargin.replace("\n", "")))
      .withColumn("bucket", expr(s"p_fp * $calibBuckets div $calibScale"))
    Canon.materialized(Canon.canonicalize(withP.groupBy("bucket").agg(
        count(lit(1)).as("n_docs"),
        sum("p_fp").as("conf_fp"),
        sum(col("y").cast("long")).as("n_pos"))
      .select(col("bucket"), col("n_docs"),
        (col("conf_fp").cast("double") /
          (col("n_docs") * calibScale).cast("double")).as("avg_conf"),
        (col("n_pos").cast("double") / col("n_docs").cast("double"))
          .as("pos_rate"),
        abs(col("conf_fp").cast("double") /
            (col("n_docs") * calibScale).cast("double") -
          col("n_pos").cast("double") / col("n_docs").cast("double"))
          .as("abs_gap"))), inter: _*)
  }

  /** PRECISION-RECALL threshold sweep — the operating-curve row that
    * turns [[classifierCalibration]]'s reliability diagram into a
    * deployment decision: for each decile threshold t = k/10 on the
    * same fixed-point probability p = s/(s + n·S), the confusion
    * counts (tp/fp/fn/tn) and precision/recall/F1 of "keep docs with
    * p ≥ t". A corpus filter is tuned by picking the point on this
    * curve that spends the token budget at the precision the mix can
    * afford — without the sweep, the threshold is folklore.
    *
    * Shape: one doc-level pass (the shared [[scoredLabeled]] seam),
    * one ≤10-row per-bucket rollup, and a grid × bucket inequality
    * join over ELEVEN total rows — the sweep costs nothing beyond the
    * classifier chain itself. All counts are exact integers
    * (threshold test p_fp ≥ k·10⁵ ⇔ bucket ≥ k under integer div);
    * precision/recall/F1 are final double ratios with zero-guards
    * mirrored in both twins.
    */
  def classifierPr(spark: SparkSession, sfDir: String): DataFrame = {
    val (sl, inter) = scoredLabeled(spark, sfDir)
    val withP = sl
      .withColumn("p_fp", expr(
        s"""CAST(CAST(s AS DECIMAL(38,0)) * $calibScale
           | div (CAST(s AS DECIMAL(38,0))
           |      + CAST(n_grams AS DECIMAL(38,0)) * $qcScale)
           | AS BIGINT)""".stripMargin.replace("\n", "")))
      .withColumn("bucket", expr(s"p_fp * $calibBuckets div $calibScale"))
    val byBucket = withP.groupBy("bucket").agg(
        count(lit(1)).as("n_docs"),
        sum(col("y").cast("long")).as("n_pos"))
      .persist() // ≤10 rows, but its lineage is the whole classifier
                 // chain — totals and the sweep must not re-train
    val tot = byBucket.agg(sum("n_docs").as("td"), sum("n_pos").as("tpa"))
    val grid = spark.range(calibBuckets).select(col("id").as("k"))
    val sweep = grid.join(byBucket, col("bucket") >= col("k"), "left")
      .groupBy("k").agg(
        coalesce(sum("n_pos"), lit(0L)).as("tp"),
        coalesce(sum("n_docs"), lit(0L)).as("n_above"))
      .crossJoin(tot)
      .withColumn("precision", when(col("n_above") === 0L, lit(0.0))
        .otherwise(col("tp").cast("double") / col("n_above").cast("double")))
      .withColumn("recall", when(col("tpa") === 0L, lit(0.0))
        .otherwise(col("tp").cast("double") / col("tpa").cast("double")))
      .withColumn("f1",
        when(col("precision") + col("recall") === 0.0, lit(0.0))
          .otherwise(lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall"))))
    Canon.materialized(
      Canon.canonicalize(sweep.select(col("k"),
        (col("k") * (calibScale / calibBuckets)).as("thr_fp"),
        col("tp"), (col("n_above") - col("tp")).as("fp"),
        (col("tpa") - col("tp")).as("fn"),
        (col("td") - col("n_above")).as("tn"),
        col("precision"), col("recall"), col("f1"))),
      (byBucket +: inter): _*)
  }

  /** q_quality_classifier_ref: the INDEPENDENT-signal variant — same
    * features, same closed-form training, same seam, but labels from
    * [[refLabelsFrom]] (reference-slice membership, the CCNet/GPT-3
    * construction) instead of the distilled heuristic. Trains on the
    * two labeled hash slices, scores EVERY tokenizable document
    * (including the 3/5 of the corpus no label touched), and tags each
    * row with its slice (`ref`/`neg`/`rest`) so downstream can separate
    * in-sample from genuinely extrapolated verdicts.
    *
    * FIXTURE CAVEAT (the langIdNb discipline): on the synthetic corpus,
    * slice membership is a pure id hash with no textual correlate, so
    * in-fixture accuracy against the slice label is memorization-only —
    * the fixture gates the ARITHMETIC (hash-exact DuckDB twin);
    * the capability claim (separating reference-like from crawl-like
    * text the heuristic scores identically) is pinned by
    * ClassifierOpsSpec's constant-heuristic synthetic corpus.
    */
  def qualityClassifierRef(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = TextOps.documents(spark, sfDir)
    // r14: one feature pass — the histogram feeds training AND scoring
    // (the scoredLabeled restructure; s = Σ_b n·λ[b] is bit-identical
    // to the per-row seam, which ClassifierOpsSpec pins separately)
    val hist = gramBucketsFrom(docs)
      .groupBy("doc_id", "b").agg(count(lit(1)).as("n")).persist()
    // training's driver collect materializes the cache (see
    // scoredLabeled) — consumers are sequential, no eager needed
    val w = trainWeightsOnHist(spark, refLabelsFrom(docs), hist)
    val lam = w.toSeq.toDF("b", "lam")
    val scored = hist.join(broadcast(lam), Seq("b"))
      .groupBy("doc_id")
      .agg(sum(col("n") * col("lam")).as("s"), sum("n").as("n_grams"))
      .filter(col("n_grams") > 0)
    val m = LmOps.lmRefMod
    Canon.materialized(Canon.canonicalize(scored
      .select(col("doc_id"),
        when(col("doc_id") % m === 0, "ref")
          .when(col("doc_id") % m === 1, "neg")
          .otherwise("rest").as("slice"),
        col("n_grams"),
        (col("s").cast("double") /
          (col("n_grams") * qcScale).cast("double")).as("mean_ratio"),
        (col("s") >= col("n_grams") * qcScale).as("pred"))), hist)
  }

  // ---- language ID: trained char-n-gram Naive Bayes -------------------

  /** Char n-gram width of the language-ID profiles (the classic
    * char-trigram NB — Cavnar & Trenkle's n-gram categorization shape).
    */
  val lidShingleLen = 3

  /** TRAINED language identification — the upgrade from
    * [[TextOps.langId]]'s hand-picked marker grams to per-language
    * char-trigram profiles LEARNED from the reference slice (doc_id ≡ 0
    * mod [[LmOps.lmRefMod]], the same hash-membership corpus the
    * reference LM trains on), scored with the [[LmOps]] fixed-point
    * discipline: a document's score under language L is the MEAN
    * add-one-smoothed inverse trigram frequency of L's profile
    * (exact-rational surrogate for NB log-likelihood, monotone per
    * gram), and the prediction is the integer-exact argmin with a
    * lexicographic language tie-break.
    *
    * Features are the shared [[graft.functions.ShingleHashes]] 62-bit
    * char-window hashes (distinct = false — occurrences, not the set).
    *
    * FIXTURE CAVEAT, stated openly: the synthetic corpus draws every
    * language's text from ONE shared vocabulary, so the lang label
    * carries almost no textual signal and NO classifier can reach real
    * accuracy here — the fixture gates the ARITHMETIC (hash-exact twin)
    * and the spec asserts parity-or-better against the marker baseline;
    * the capability claim (≈100% on languages that actually differ) is
    * pinned by ClassifierOpsSpec's distinct-alphabet synthetic corpus
    * through [[langIdNbFrom]].
    *
    * Scale shape: training folds the reference gram stream into a
    * (langs × grams)-keyed count table (map-side combined); scoring is
    * one explode + a langs-wide broadcast expansion + a per-(doc, lang)
    * agg — no corpus self-join, langs is a constant.
    */
  def langIdNb(spark: SparkSession, sfDir: String): DataFrame =
    langIdNbFrom(TextOps.documents(spark, sfDir))

  def langIdNbFrom(docs: DataFrame): DataFrame = {
    val d = docs.repartition(col("doc_id"))
      .select(col("doc_id"), col("lang"),
        TextOps.normText(col("text")).as("norm"))
      .filter(length(col("norm")) >= lidShingleLen)
    val grams = d.select(col("doc_id"),
      explode(graft.functions.ShingleHashes(col("norm"), lidShingleLen,
        distinct = false)).as("g"))
    val refGrams = grams
      .filter(col("doc_id") % LmOps.lmRefMod === 0)
    val cnt = refGrams
      .join(d.select("doc_id", "lang"), Seq("doc_id"))
      .groupBy("lang", "g").agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy("lang").agg(sum("c").as("t"))
    val voc = cnt.select("g").distinct()
      .agg(count(lit(1)).as("v"))
    // DECIMAL(38,0) product: (t+v)·S overflows BIGINT once a language
    // holds ≳9e12 reference grams (the 100 TB regime); the quotient is
    // unchanged. The per-doc SUM of quotients stays BIGINT-safe until
    // ~1e12 grams/lang × 1e3 grams/doc — rescale qcScale before that.
    val inv = expr(
      s"""CAST(CAST(t + v AS DECIMAL(38,0)) * ${qcScale}L
         | div (coalesce(c, 0L) + 1L) AS BIGINT)"""
        .stripMargin.replace("\n", ""))
    val perLang = grams
      .crossJoin(broadcast(tot.select(col("lang").as("ml"), col("t"))))
      .join(cnt.select(col("lang").as("ml"), col("g"), col("c")),
        Seq("ml", "g"), "left")
      .crossJoin(broadcast(voc))
      .groupBy("doc_id", "ml")
      .agg(sum(inv).as("s_fp"), count(lit(1)).as("n"))
    val best = perLang
      .groupBy("doc_id")
      .agg(min(struct(col("s_fp"), col("ml"), col("n"))).as("m"))
      .select(col("doc_id"), col("m.ml").as("predicted_lang"),
        col("m.n").as("n_grams"), col("m.s_fp").as("s_fp"))
    Canon.canonicalize(best
      .join(d.select(col("doc_id"), col("lang").as("labeled_lang")),
        Seq("doc_id"))
      .select(col("doc_id"), col("labeled_lang"), col("n_grams"),
        col("predicted_lang"),
        (col("s_fp").cast("double") /
          (col("n_grams") * qcScale).cast("double")).as("mean_inv")))
  }

  /** The char-trigram hash in SQL — generated from the same constants
    * as ShingleHashes (the DedupOps twin formula at k = 3).
    */
  private def lidHashSql(norm: String, pos: String): String = {
    val P = graft.functions.SimHash64.P
    def fold(base: Int): String =
      (0 until lidShingleLen).foldLeft("CAST(0 AS BIGINT)") { (acc, j) =>
        s"(($acc * $base + ord(substr($norm, $pos + $j, 1))) % $P)"
      }
    s"(${fold(31)} * ${1L << 31} + ${fold(37)})"
  }

  val langIdNbOracle: String = {
    import TextOps.normSql
    s"""WITH nd AS (
       |  SELECT doc_id, lang, $normSql AS norm FROM documents),
       |d AS (SELECT * FROM nd WHERE length(norm) >= $lidShingleLen),
       |st AS MATERIALIZED (
       |  SELECT doc_id, lang, ${lidHashSql("norm", "i")} AS g
       |  FROM d, unnest(range(1, length(norm) - ${lidShingleLen - 2}))
       |       AS t(i)),
       |cnt AS MATERIALIZED (
       |  SELECT lang, g, count(*) AS c FROM st
       |  WHERE doc_id % ${LmOps.lmRefMod} = 0 GROUP BY 1, 2),
       |tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS t
       |        FROM cnt GROUP BY 1),
       |voc AS (SELECT count(DISTINCT g) AS v FROM cnt),
       |sc AS MATERIALIZED (
       |  SELECT st.doc_id, m.lang AS ml,
       |         CAST(sum(CAST(m.t + voc.v AS HUGEINT) * $qcScale
       |                  // (coalesce(c.c, 0) + 1)) AS BIGINT) AS s_fp,
       |         count(*) AS n
       |  FROM st CROSS JOIN tot m CROSS JOIN voc
       |  LEFT JOIN cnt c ON c.lang = m.lang AND c.g = st.g
       |  GROUP BY 1, 2),
       |rk AS (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id
       |            ORDER BY s_fp ASC, ml ASC) AS r
       |  FROM sc)
       |SELECT rk.doc_id, d.lang AS labeled_lang,
       |       CAST(n AS BIGINT) AS n_grams, ml AS predicted_lang,
       |       CAST(s_fp AS DOUBLE) / CAST(n * $qcScale AS DOUBLE)
       |         AS mean_inv
       |FROM rk JOIN d ON rk.doc_id = d.doc_id
       |WHERE r = 1""".stripMargin
  }

  /** Md5 bucket in SQL with an explicit modulus (the SampleOps twin
    * formula, parameterized).
    */
  private def bucketSql(g: String, buckets: Int): String = {
    def d(i: Int) =
      s"(instr('0123456789abcdef', substr(md5($g), $i, 1)) - 1)"
    s"((${d(1)} * 4096 + ${d(2)} * 256 + ${d(3)} * 16 + ${d(4)})" +
      s" % $buckets)"
  }

  /** The shared feature-extraction + training + inference CTE chain
    * (`dt` tokens → `dg` grams → `db` buckets → `cnt`/`tot`/`model`
    * trained weights over whatever `yl` label CTE precedes it → `sc`
    * per-doc scores) — composed by both the distillation and the
    * reference-slice oracles so the arithmetic exists exactly once.
    * All divisions have non-negative operands, so DuckDB `//` (floor)
    * equals Spark `div` (truncate).
    */
  private def qcCoreCtes: String = {
    import TextOps.normSql
    s"""dt AS (
       |  SELECT doc_id, toks FROM (
       |    SELECT doc_id,
       |           list_filter(string_split($normSql, ' '), t -> t <> '')
       |             AS toks
       |    FROM documents)
       |  WHERE len(toks) > 0),
       |dg AS (
       |  SELECT doc_id, u.g FROM dt, unnest(toks) AS u(g)
       |  UNION ALL
       |  SELECT doc_id, toks[i] || ' ' || toks[i + 1]
       |  FROM dt, unnest(range(1, len(toks))) AS r(i)
       |  UNION ALL
       |  SELECT doc_id, '##len_' || CAST(
       |    CASE ${qcLenBounds.zipWithIndex
        .map { case (b, i) => s"WHEN len(toks) <= $b THEN $i" }
        .mkString(" ")}
       |    ELSE ${qcLenBounds.length} END AS VARCHAR)
       |  FROM dt),
       |db AS MATERIALIZED (
       |  SELECT doc_id, ${bucketSql("g", qcBuckets)} AS b FROM dg),
       |cnt AS (
       |  SELECT b,
       |         sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS c1,
       |         sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS c0
       |  FROM db JOIN yl USING (doc_id) GROUP BY 1),
       |tot AS (SELECT CAST(sum(c0) AS BIGINT) AS t0,
       |               CAST(sum(c1) AS BIGINT) AS t1 FROM cnt),
       |model AS MATERIALIZED (
       |  SELECT g.b,
       |         CAST((CAST(coalesce(c.c1, 0) + 1 AS HUGEINT)
       |                * (t.t0 + $qcBuckets) * $qcScale)
       |           // (CAST(coalesce(c.c0, 0) + 1 AS HUGEINT)
       |                * (t.t1 + $qcBuckets)) AS BIGINT) AS lam
       |  FROM range(0, $qcBuckets) g(b)
       |  CROSS JOIN tot t
       |  LEFT JOIN cnt c ON c.b = g.b),
       |sc AS (
       |  SELECT db.doc_id,
       |         CAST(sum(m.lam) AS BIGINT) AS s,
       |         count(*) AS n
       |  FROM db JOIN model m ON m.b = db.b
       |  GROUP BY 1)""".stripMargin
  }

  val qualityClassifierOracle: String =
    s"""WITH ${TextOps.qualityCte},
       |yl AS (
       |  SELECT doc_id,
       |         CASE WHEN quality_score >= ${TextOps.curateQualityMin}
       |              THEN 1 ELSE 0 END AS y
       |  FROM qs),
       |$qcCoreCtes
       |SELECT sc.doc_id, CAST(y AS BIGINT) AS label,
       |       CAST(n AS BIGINT) AS n_grams,
       |       CAST(s AS DOUBLE) / CAST(n * $qcScale AS DOUBLE)
       |         AS mean_ratio,
       |       s >= n * $qcScale AS pred
       |FROM sc JOIN yl ON sc.doc_id = yl.doc_id""".stripMargin

  val classifierCalibrationOracle: String =
    s"""WITH ${TextOps.qualityCte},
       |yl AS (
       |  SELECT doc_id,
       |         CASE WHEN quality_score >= ${TextOps.curateQualityMin}
       |              THEN 1 ELSE 0 END AS y
       |  FROM qs),
       |$qcCoreCtes,
       |cal AS (
       |  SELECT yl.y,
       |         CAST(CAST(s AS HUGEINT) * $calibScale
       |           // (CAST(s AS HUGEINT) + CAST(n AS HUGEINT) * $qcScale)
       |           AS BIGINT) AS p_fp
       |  FROM sc JOIN yl ON sc.doc_id = yl.doc_id),
       |cb AS (
       |  SELECT p_fp * $calibBuckets // $calibScale AS bucket,
       |         count(*) AS n_docs,
       |         CAST(sum(p_fp) AS BIGINT) AS conf_fp,
       |         CAST(sum(y) AS BIGINT) AS n_pos
       |  FROM cal GROUP BY 1)
       |SELECT CAST(bucket AS BIGINT) AS bucket,
       |       CAST(n_docs AS BIGINT) AS n_docs,
       |       CAST(conf_fp AS DOUBLE) / CAST(n_docs * $calibScale AS DOUBLE)
       |         AS avg_conf,
       |       CAST(n_pos AS DOUBLE) / CAST(n_docs AS DOUBLE) AS pos_rate,
       |       abs(CAST(conf_fp AS DOUBLE)
       |             / CAST(n_docs * $calibScale AS DOUBLE)
       |           - CAST(n_pos AS DOUBLE) / CAST(n_docs AS DOUBLE))
       |         AS abs_gap
       |FROM cb""".stripMargin

  val classifierPrOracle: String =
    s"""WITH ${TextOps.qualityCte},
       |yl AS (
       |  SELECT doc_id,
       |         CASE WHEN quality_score >= ${TextOps.curateQualityMin}
       |              THEN 1 ELSE 0 END AS y
       |  FROM qs),
       |$qcCoreCtes,
       |cal AS (
       |  SELECT yl.y,
       |         CAST(CAST(s AS HUGEINT) * $calibScale
       |           // (CAST(s AS HUGEINT) + CAST(n AS HUGEINT) * $qcScale)
       |           AS BIGINT) AS p_fp
       |  FROM sc JOIN yl ON sc.doc_id = yl.doc_id),
       |cb AS (
       |  SELECT p_fp * $calibBuckets // $calibScale AS bucket,
       |         count(*) AS n_docs,
       |         CAST(sum(y) AS BIGINT) AS n_pos
       |  FROM cal GROUP BY 1),
       |ptot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS td,
       |                CAST(sum(n_pos) AS BIGINT) AS tpa FROM cb),
       |sweep AS (
       |  SELECT g.k,
       |         CAST(coalesce(sum(cb.n_pos), 0) AS BIGINT) AS tp,
       |         CAST(coalesce(sum(cb.n_docs), 0) AS BIGINT) AS n_above
       |  FROM range(0, $calibBuckets) g(k)
       |  LEFT JOIN cb ON cb.bucket >= g.k
       |  GROUP BY 1),
       |pr AS (
       |  SELECT s.k, s.tp, s.n_above, t.td, t.tpa,
       |         CASE WHEN s.n_above = 0 THEN 0.0
       |              ELSE CAST(s.tp AS DOUBLE) / CAST(s.n_above AS DOUBLE)
       |         END AS precision,
       |         CASE WHEN t.tpa = 0 THEN 0.0
       |              ELSE CAST(s.tp AS DOUBLE) / CAST(t.tpa AS DOUBLE)
       |         END AS recall
       |  FROM sweep s CROSS JOIN ptot t)
       |SELECT k, k * ${calibScale / calibBuckets} AS thr_fp, tp,
       |       n_above - tp AS fp, tpa - tp AS fn, td - n_above AS tn,
       |       precision, recall,
       |       CASE WHEN precision + recall = 0 THEN 0.0
       |            ELSE 2.0 * precision * recall / (precision + recall)
       |       END AS f1
       |FROM pr""".stripMargin

  /** Reference-slice labels + slice tag on every scored doc; training
    * restricted to the two labeled slices by the `cnt` join, inference
    * over the whole corpus.
    */
  val qualityClassifierRefOracle: String = {
    val m = LmOps.lmRefMod
    s"""WITH yl AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % $m = 0 THEN 1 ELSE 0 END AS y
       |  FROM documents WHERE doc_id % $m <= 1),
       |$qcCoreCtes
       |SELECT sc.doc_id,
       |       CASE WHEN sc.doc_id % $m = 0 THEN 'ref'
       |            WHEN sc.doc_id % $m = 1 THEN 'neg'
       |            ELSE 'rest' END AS slice,
       |       CAST(n AS BIGINT) AS n_grams,
       |       CAST(s AS DOUBLE) / CAST(n * $qcScale AS DOUBLE)
       |         AS mean_ratio,
       |       s >= n * $qcScale AS pred
       |FROM sc""".stripMargin
  }
}
