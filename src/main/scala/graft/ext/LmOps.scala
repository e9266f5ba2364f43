package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Canon

/** N-gram language-model training and LM-based fluency filtering — the
  * CCNet recipe (Wenzek et al. 2020): train a small LM on a clean
  * reference slice of each language, score every document by how
  * predictable its text is under that LM, and bucket the corpus into
  * head/middle/tail fluency terciles (training keeps head+middle, tail
  * is the noise bin). The production original uses a KenLM 5-gram; this
  * is the same pipeline shape with an add-one-smoothed BIGRAM model.
  *
  * EXACT-ARITHMETIC DISCIPLINE (the BM25/tf-idf trade, see
  * TextOps.bm25): real perplexity is exp of a mean log-probability, and
  * ln() is not bit-reproducible across engines, so the score here is the
  * mean INVERSE conditional probability — each token contributes the
  * exact rational (c(a)+V)/(c(a,b)+1), the reciprocal of its smoothed
  * bigram probability, accumulated in integer fixed point
  * ([[lmScale]]-scaled, integer-divided — no doubles until ONE final
  * division of exact integers). Monotone in per-token surprisal, so the
  * head/middle/tail ORDERING — the only thing the filter consumes — is
  * faithful to the perplexity recipe while staying bit-deterministic on
  * any engine and under any partitioning.
  *
  * Scale shape at 100 TB:
  *  - the reference slice is hash-membership (doc_id mod [[lmRefMod]] —
  *    the SampleOps discipline), so "train" touches a fixed fraction;
  *  - LM counts are two keyed aggs (map-side combined); the model is a
  *    TABLE, not a driver artifact — scoring joins on (lang, a, b),
  *    AQE picks broadcast when a language's model is small;
  *  - scoring is one narrow bigram explode + the model join + one
  *    per-doc agg; tercile bounds are a per-lang rollup broadcast back
  *    (the curriculum pattern — swap in the GK sketch when exact
  *    percentiles over 10¹⁰ docs are not worth a global sort).
  */
object LmOps {

  /** Reference-slice modulus: doc_id ≡ 0 (mod 5) is the per-language
    * "clean reference corpus" the LM trains on (20%; deterministic,
    * partitioning-independent — the SampleOps hash-membership rule).
    */
  val lmRefMod = 5

  /** Sentence-start token prepended to every document. */
  val lmBos = "<s>"

  /** Fixed-point scale for per-token inverse probabilities. */
  val lmScale = 1000000L

  /** Rows per language in the trained-model report query. */
  val lmTopK = 10

  /** (doc_id, lang, text) → (doc_id, lang, toks), empty docs dropped —
    * the operator's single tokenization rule, shared with the streaming
    * gate so batch and stream can never tokenize differently.
    */
  private[graft] def withToks(df: DataFrame): DataFrame =
    df.select(col("doc_id"), col("lang"), CurationOps.toksCol.as("toks"))
      .filter(size(col("toks")) > 0)

  /** (doc_id, lang, toks) for non-empty documents. */
  private def docToks(spark: SparkSession, sfDir: String): DataFrame =
    withToks(TextOps.documents(spark, sfDir)
      .repartition(col("doc_id"))) // single-split fixture; explode is narrow

  /** One row per bigram occurrence, [[lmBos]] prepended: a document of
    * n tokens yields exactly n (a, b) pairs.
    */
  private def bigrams(d: DataFrame): DataFrame = {
    val withArr = d.withColumn("arr",
      concat(array(lit(lmBos)), col("toks")))
    withArr.select(col("doc_id"), col("lang"),
        explode(transform(sequence(lit(1), size(col("arr")) - 1),
          i => struct(element_at(col("arr"), i).as("a"),
            element_at(col("arr"), i + 1).as("b")))).as("p"))
      .select(col("doc_id"), col("lang"),
        col("p.a").as("a"), col("p.b").as("b"))
  }

  /** The trained model's three tables: bigram counts c(a,b), context
    * counts c(a) (derived, never a second corpus pass), and per-lang
    * reference vocabulary size V (the add-one denominator).
    */
  private[graft] def trainTables(spark: SparkSession, sfDir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val ref = docToks(spark, sfDir)
      .filter(col("doc_id") % lmRefMod === 0)
    val cAb = bigrams(ref).groupBy("lang", "a", "b")
      .agg(count(lit(1)).as("c_ab"))
    val cA = cAb.groupBy("lang", "a").agg(sum("c_ab").as("c_a"))
    val voc = ref.select(col("lang"), explode(col("toks")).as("t"))
      .groupBy("lang").agg(countDistinct("t").as("v"))
    (cAb, cA, voc)
  }

  private def lmTrainDir(sfDir: String): String = {
    val fp = graft.io.Fingerprint.ofPath(s"$sfDir/documents.parquet")
    val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_").replaceAll("^_+", "")
    s"${graft.io.Artifacts.root}/lm_train/${tag}_m${lmRefMod}_$fp"
  }

  /** [[trainTables]] through the shared artifact tier: the reference
    * LM's bigram counts and per-lang vocab sizes are pure functions of
    * the corpus, re-derived today by every consumer (the funnel, the
    * DoReMi weighter, the tercile bucketer) — persisted once
    * (SUCCESS-gated, fingerprint-stamped) they become a read. `cA`
    * derives from the persisted `cab` by one keyed rollup.
    * q_ngram_lm stays on the build path (the family's designated
    * builder, the q_bm25 rule); tier off ⇒ plain delegate.
    */
  private[graft] def trainTablesShared(spark: SparkSession, sfDir: String)
      : (DataFrame, DataFrame, DataFrame) =
    if (!graft.io.Artifacts.sharedTier) trainTables(spark, sfDir)
    else synchronized {
      val dir = lmTrainDir(sfDir)
      val done = Seq("cab", "voc").forall(t =>
        new java.io.File(s"$dir/$t/_SUCCESS").exists())
      if (!done) {
        val (cAb, _, voc) = trainTables(spark, sfDir)
        cAb.write.mode("overwrite").parquet(s"$dir/cab")
        voc.write.mode("overwrite").parquet(s"$dir/voc")
      }
      val cAb = spark.read.parquet(s"$dir/cab")
        .select("lang", "a", "b", "c_ab")
      val cA = cAb.groupBy("lang", "a").agg(sum("c_ab").as("c_a"))
      val voc = spark.read.parquet(s"$dir/voc").select("lang", "v")
      (cAb, cA, voc)
    }

  /** TRAINED-MODEL REPORT: the [[lmTopK]] highest-count bigrams per
    * language (count desc, lexicographic tiebreak) — the artifact a
    * model registry would store, exercised through the in-repo TopK
    * heap operator (no window sort).
    */
  def ngramLm(spark: SparkSession, sfDir: String): DataFrame = {
    val (cAb, _, _) = trainTables(spark, sfDir)
    val top = graft.plans.TopK.perKey(cAb, Seq("lang"),
      Seq("c_ab" -> graft.plans.TopK.Desc, "a" -> graft.plans.TopK.Asc,
        "b" -> graft.plans.TopK.Asc),
      lmTopK, rankCol = Some("rank"))
    Canon.canonicalize(top.select(
      col("lang"), col("rank").cast("long").as("rank"),
      col("a"), col("b"), col("c_ab")))
  }

  val ngramLmOracle: String =
    s"""WITH $lmCteBody,
       |ranked AS (
       |  SELECT lang, a, b, c_ab,
       |         row_number() OVER (PARTITION BY lang
       |           ORDER BY c_ab DESC, a ASC, b ASC) AS rank
       |  FROM cab)
       |SELECT lang, CAST(rank AS BIGINT) AS rank, a, b,
       |       CAST(c_ab AS BIGINT) AS c_ab
       |FROM ranked WHERE rank <= $lmTopK""".stripMargin

  /** LM FLUENCY SCORE + tercile bucket per document — the CCNet
    * head/middle/tail split. `mean_inv` is the fixed-point mean inverse
    * smoothed bigram probability (low = fluent under the reference LM);
    * bucket 1/2/3 = head/middle/tail by per-language terciles.
    */
  /** Score an arbitrary (doc_id, lang, toks) frame against a trained
    * model's three tables — the reusable seam the tercile query AND the
    * streaming gate ([[graft.streaming.EventStream.fluencyGate]])
    * compose. Stateless per document, so it is micro-batch-safe: the
    * union of per-batch scorings equals the one-shot batch scoring.
    *
    * A document whose `lang` has NO reference model (no reference-slice
    * docs trained a vocabulary for it — a brand-new language arriving
    * in a feed) is NOT silently dropped: the vocabulary join is a LEFT
    * join and the row comes back with `scored = false` and NULL
    * `mean_inv`, so downstream gates can count and report
    * no-reference-model rejections separately from genuine fluency
    * failures (the ingest funnel's `n_unscored` stat).
    */
  private[graft] def scoreDocs(d: DataFrame, cAb: DataFrame,
                               cA: DataFrame, voc: DataFrame): DataFrame = {
    val bg = bigrams(d)
    val inv = expr(
      s"(coalesce(c_a, 0L) + v) * ${lmScale}L div (coalesce(c_ab, 0L) + 1L)")
    bg.join(cAb, Seq("lang", "a", "b"), "left")
      .join(cA, Seq("lang", "a"), "left")
      .join(broadcast(voc), Seq("lang"), "left")
      .groupBy("doc_id", "lang")
      // v is constant per lang; max() just carries it through the agg
      .agg(sum(inv).as("sum_fp"), count(lit(1)).as("n_bigrams"),
        max(col("v")).isNotNull.as("scored"))
      .withColumn("mean_inv",
        when(col("scored"),
          col("sum_fp").cast("double") /
            (col("n_bigrams") * lmScale).cast("double")))
  }

  /** `approxBounds` swaps the per-lang tercile cut points from exact
    * `percentile` (the oracle/default path; buffers a value→count map
    * per lang group) to Greenwald-Khanna `percentile_approx` (bounded
    * memory; cut points move only within GK's rank contract,
    * spec-pinned like winsorize's) — the hatch for petabyte-sized
    * language groups.
    */
  def perplexityBuckets(spark: SparkSession, sfDir: String,
                        approxBounds: Boolean = false): DataFrame = {
    val (cAb, cA, voc) = trainTablesShared(spark, sfDir)
    // every lang trains a model here (voc comes from the same corpus),
    // so the scored filter is an identity on this query's input — it
    // exists to keep the tercile math well-defined for callers scoring
    // feeds with unknown languages.
    val perDoc = scoreDocs(docToks(spark, sfDir), cAb, cA, voc)
      .filter(col("scored"))
    val acc = lit(graft.ext.SketchOps.percentileAccuracy)
    val bounds =
      if (approxBounds) perDoc.groupBy("lang").agg(
        percentile_approx(col("mean_inv"), lit(1.0 / 3), acc).as("t1"),
        percentile_approx(col("mean_inv"), lit(2.0 / 3), acc).as("t2"))
      else perDoc.groupBy("lang").agg(
        percentile(col("mean_inv"), lit(1.0 / 3)).as("t1"),
        percentile(col("mean_inv"), lit(2.0 / 3)).as("t2"))
    Canon.canonicalize(perDoc.join(broadcast(bounds), Seq("lang"))
      .select(col("doc_id"), col("lang"),
        col("n_bigrams"), col("mean_inv"),
        when(col("mean_inv") <= col("t1"), 1L)
          .when(col("mean_inv") <= col("t2"), 2L)
          .otherwise(3L).as("bucket")))
  }

  /** The full scoring chain as a composable CTE body ending in `scd`
    * (doc_id, lang, n, mean_inv) — the tercile oracle and the ingest
    * funnel oracle both build on it.
    */
  private[graft] def lmScoreCtes: String =
    s"""$lmCteBody,
       |ca AS (
       |  SELECT lang, a, CAST(sum(c_ab) AS BIGINT) AS c_a
       |  FROM cab GROUP BY 1, 2),
       |voc AS (
       |  SELECT lang, count(DISTINCT u.t) AS v
       |  FROM dt, unnest(toks) AS u(t)
       |  WHERE doc_id % $lmRefMod = 0 GROUP BY 1),
       |sc AS (
       |  SELECT g.doc_id, g.lang,
       |         ((coalesce(c.c_a, 0) + v.v) * $lmScale)
       |           // (coalesce(m.c_ab, 0) + 1) AS inv
       |  FROM bg g
       |  LEFT JOIN cab m ON g.lang = m.lang AND g.a = m.a AND g.b = m.b
       |  LEFT JOIN ca c ON g.lang = c.lang AND g.a = c.a
       |  JOIN voc v ON g.lang = v.lang),
       |pd AS (
       |  SELECT doc_id, lang, CAST(sum(inv) AS BIGINT) AS sum_fp,
       |         count(*) AS n
       |  FROM sc GROUP BY 1, 2),
       |scd AS MATERIALIZED (
       |  SELECT doc_id, lang, n,
       |         CAST(sum_fp AS DOUBLE) / CAST(n * $lmScale AS DOUBLE)
       |           AS mean_inv
       |  FROM pd)""".stripMargin

  val perplexityBucketsOracle: String =
    s"""WITH $lmScoreCtes,
       |bnd AS (
       |  SELECT lang,
       |         quantile_cont(mean_inv, CAST(1.0/3 AS DOUBLE)) AS t1,
       |         quantile_cont(mean_inv, CAST(2.0/3 AS DOUBLE)) AS t2
       |  FROM scd GROUP BY 1)
       |SELECT doc_id, s.lang, CAST(n AS BIGINT) AS n_bigrams, mean_inv,
       |       CAST(CASE WHEN mean_inv <= t1 THEN 1
       |                 WHEN mean_inv <= t2 THEN 2
       |                 ELSE 3 END AS BIGINT) AS bucket
       |FROM scd s JOIN bnd ON s.lang = bnd.lang""".stripMargin

  /** Share of each document's most-surprising bigrams the min-K
    * statistic averages over (the published recipe's K = 20%).
    */
  val minKPct = 20L

  /** Per-lang quantile below which a doc's min-K statistic flags it as
    * a suspected member of the reference corpus.
    */
  val minKFlagQuantile = 0.25

  /** MIN-K% PROB membership inference (Shi et al., "Detecting
    * Pretraining Data from Large Language Models") — the
    * contamination/memorization detector that needs NO n-gram overlap:
    * a document the model trained on is well-predicted even at its
    * LEAST-probable positions, so the average probability of its K%
    * worst tokens is anomalously high. Re-expressed on the reference
    * bigram LM's fixed-point surprisals: per document take the
    * m = ⌈n·K/100⌉ LARGEST `inv` values (inv = scaled inverse smoothed
    * probability — large inv ⇔ surprising) and average them; a LOW
    * tail mean says even this doc's hardest bigrams are easy for the
    * model — membership evidence. The fixture carries ground truth by
    * construction (the LM trains on doc_id ≡ 0 mod [[lmRefMod]]), so
    * `in_ref` rides along and the spec measures real separation.
    *
    * Numeric discipline: the tail SUM is exact integer arithmetic and
    * — because it sums the m largest VALUES — tie-invariant, so the
    * window's arbitrary tie order cannot leak into the output; the
    * mean and the per-lang flag quantile are the only doubles (the
    * perplexityBuckets percentile twin). The per-doc window sorts
    * partitions bounded by document length, never corpus-scaled.
    */
  def minKProb(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (cAb, cA, voc) = trainTablesShared(spark, sfDir)
    val inv = expr(
      s"(coalesce(c_a, 0L) + v) * ${lmScale}L div (coalesce(c_ab, 0L) + 1L)")
    val bg = bigrams(docToks(spark, sfDir))
      .join(cAb, Seq("lang", "a", "b"), "left")
      .join(cA, Seq("lang", "a"), "left")
      .join(broadcast(voc), Seq("lang")) // inner: unscorable langs drop
      .select(col("doc_id"), col("lang"), inv.as("inv"))
      .persist() // rank pass + per-doc count pass
    bg.count() // EAGER (r14): the rank window and the per-doc count
    // agg are independent stages — unmaterialized they race on the
    // cache and re-run the bigram scoring chain ×2
    val ranked = bg.withColumn("r", row_number().over(
      Window.partitionBy("doc_id").orderBy(col("inv").desc)))
    val perDoc = bg.groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n"))
      .withColumn("m", expr(s"(n * $minKPct + 99L) div 100L"))
    val stat = perDoc.join(ranked.select("doc_id", "inv", "r"), "doc_id")
      .filter(col("r") <= col("m"))
      .groupBy("doc_id", "lang", "n", "m")
      .agg(sum("inv").as("tail_fp"))
      .withColumn("mink_inv", col("tail_fp").cast("double") /
        (col("m") * lmScale).cast("double"))
    val q = stat.groupBy("lang")
      .agg(percentile(col("mink_inv"), lit(minKFlagQuantile)).as("q25"))
    Canon.materialized(
      Canon.canonicalize(stat.join(broadcast(q), Seq("lang"))
        .select(col("doc_id"), col("lang"), col("n").as("n_bigrams"),
          col("m").as("m_tail"), col("mink_inv"),
          (col("doc_id") % lmRefMod === 0).as("in_ref"),
          (col("mink_inv") <= col("q25")).as("suspect"))),
      bg)
  }

  val minKProbOracle: String =
    s"""WITH $lmScoreCtes,
       |mrk AS (
       |  SELECT doc_id, lang, inv,
       |         row_number() OVER (PARTITION BY doc_id
       |           ORDER BY inv DESC) AS r
       |  FROM sc),
       |mtail AS (
       |  SELECT p.doc_id, p.lang, p.n,
       |         (p.n * $minKPct + 99) // 100 AS m,
       |         CAST(sum(k.inv) AS BIGINT) AS tail_fp
       |  FROM pd p JOIN mrk k ON k.doc_id = p.doc_id
       |    AND k.r <= (p.n * $minKPct + 99) // 100
       |  GROUP BY 1, 2, 3),
       |mstat AS (
       |  SELECT doc_id, lang, n, m,
       |         CAST(tail_fp AS DOUBLE) / CAST(m * $lmScale AS DOUBLE)
       |           AS mink_inv
       |  FROM mtail),
       |mq AS (
       |  SELECT lang, quantile_cont(mink_inv,
       |           CAST($minKFlagQuantile AS DOUBLE)) AS q25
       |  FROM mstat GROUP BY 1)
       |SELECT s.doc_id, s.lang, CAST(n AS BIGINT) AS n_bigrams,
       |       CAST(m AS BIGINT) AS m_tail, mink_inv,
       |       s.doc_id % $lmRefMod = 0 AS in_ref,
       |       mink_inv <= mq.q25 AS suspect
       |FROM mstat s JOIN mq ON s.lang = mq.lang""".stripMargin

  // ---- persisted LM index + count-merge lifecycle ---------------------

  /** Persisted-index layout dir — fingerprinted like the LSH index so a
    * fixture or parameter change MISSES the old artifact.
    */
  private[ext] def lmIndexDir(sfDir: String): String = {
    val fp = graft.io.Fingerprint.ofPath(s"$sfDir/documents.parquet")
    val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_").replaceAll("^_+", "")
    s"${graft.io.Artifacts.root}/lm_index/${tag}_m${lmRefMod}_$fp"
  }

  private def lmIndexDone(dir: String): Boolean =
    Seq("cab", "vocab").forall(t =>
      new java.io.File(s"$dir/$t/_SUCCESS").exists())

  /** The BASE half of the reference slice: doc_id ≡ 0 (mod 10) — the
    * corpus the persisted index is built from. The other reference half
    * (≡ 5 mod 10) arrives later as the merge batch.
    */
  private def baseRefDocs(spark: SparkSession, sfDir: String): DataFrame =
    inBaseSlice(TextOps.documents(spark, sfDir))

  /** Membership predicate of the PERSISTED index's ingest population —
    * the slice [[lmIndex]] builds from. Owned here (beside the
    * builder) so the takedown coordinator's clip
    * ([[GovernanceOps.takedownSweep]]) can never drift from the build:
    * subtractive forgets are only exact for documents the ledger
    * actually counted.
    */
  private[ext] def inBaseSlice(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 10 === 0)

  /** SQL twin of [[inBaseSlice]] for never-existed oracles. */
  private[ext] val baseSliceSql: String = "doc_id % 10 = 0"

  private def mergeBatchDocs(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.documents(spark, sfDir).filter(col("doc_id") % 10 === 5)

  /** Count tables for an arbitrary (doc_id, lang, text) frame: bigram
    * counts (lang, a, b, c_ab) and COUNTED vocabulary (lang, t, c_tok).
    * Vocab carries occurrence counts, not a distinct set, because the
    * merge algebra must also run BACKWARDS ([[lmIndexForget]]): a set
    * union cannot tell whether a token survives a deletion, a count can
    * — subtract and drop the zeros.
    */
  private[ext] def countTables(docs: DataFrame): (DataFrame, DataFrame) = {
    val d = withToks(docs.repartition(col("doc_id"))) // single-split fixture
    val cAb = bigrams(d).groupBy("lang", "a", "b")
      .agg(count(lit(1)).as("c_ab"))
    val vocab = d.select(col("lang"), explode(col("toks")).as("t"))
      .groupBy("lang", "t").agg(count(lit(1)).as("c_tok"))
    (cAb, vocab)
  }

  /** Build (first call) or reuse (SUCCESS-gated) the persisted LM count
    * index over the BASE reference half: `cab` (lang, a, b, c_ab) and
    * `vocab` (lang, t). The build-once/probe-many contract of the LSH
    * and IVF indexes, for the LM family.
    */
  def lmIndex(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) =
    synchronized {
      val dir = lmIndexDir(sfDir)
      if (!lmIndexDone(dir)) {
        val (cAb, vocab) = countTables(baseRefDocs(spark, sfDir))
        cAb.write.mode("overwrite").parquet(s"$dir/cab")
        vocab.write.mode("overwrite").parquet(s"$dir/vocab")
      }
      (spark.read.parquet(s"$dir/cab"),
        spark.read.parquet(s"$dir/vocab"))
    }

  /** MERGE a document batch into the persisted LM index — the
    * daily-crawl maintenance path. Counts are ADDITIVE (the merge
    * algebra here is sum, where the LSH index's is slot-wise min) and
    * vocabularies union, so the merged index is EXACTLY the index a
    * from-scratch build over base ∪ batch would produce — spec-pinned,
    * and the reason [[ngramLmMerged]] can share [[ngramLmOracle]].
    * Writes a NEW stamped `…_m_<tag>` dir (SUCCESS-gated); a crash
    * mid-merge can never corrupt the base index.
    */
  def lmIndexMerge(spark: SparkSession, sfDir: String,
                   batchDocs: DataFrame, batchTag: String): String =
    synchronized {
      require(batchTag.matches("[A-Za-z0-9_-]+"),
        s"batchTag must be path-safe, got '$batchTag'")
      val dir = s"${lmIndexDir(sfDir)}_m_$batchTag"
      if (!lmIndexDone(dir)) {
        lmIndex(spark, sfDir) // ensure the base exists
        val baseDir = lmIndexDir(sfDir)
        val baseCab = spark.read.parquet(s"$baseDir/cab")
        val baseVocab = spark.read.parquet(s"$baseDir/vocab")
        val (bCab, bVocab) = countTables(batchDocs)
        baseCab.union(bCab).groupBy("lang", "a", "b")
          .agg(sum("c_ab").as("c_ab"))
          .write.mode("overwrite").parquet(s"$dir/cab")
        baseVocab.union(bVocab).groupBy("lang", "t")
          .agg(sum("c_tok").as("c_tok"))
          .write.mode("overwrite").parquet(s"$dir/vocab")
      }
      dir
    }

  /** FORGET a document batch from an LM index — delete propagation into
    * the persisted model (the right-to-be-forgotten path a 100 TB
    * platform must have for every derived artifact, not just the raw
    * corpus). The count algebra runs BACKWARDS: the forgotten docs'
    * bigram and token counts are SUBTRACTED and zero rows dropped, so
    * the result is EXACTLY the index a from-scratch build without those
    * documents would produce — spec-pinned, which is why
    * [[ngramLmForgotten]] can share a rebuilt-form oracle. Requires the
    * forgotten docs' original text (the counts to remove are re-derived
    * from it, the base corpus is never re-read); writes a NEW stamped
    * `…_f_<tag>` dir, SUCCESS-gated, base untouched.
    */
  def lmIndexForget(spark: SparkSession, baseDir: String,
                    forgetDocs: DataFrame, tag: String): String =
    synchronized {
      require(tag.matches("[A-Za-z0-9_-]+"),
        s"tag must be path-safe, got '$tag'")
      val dir = s"${baseDir}_f_$tag"
      if (!lmIndexDone(dir)) {
        val baseCab = spark.read.parquet(s"$baseDir/cab")
        val baseVocab = spark.read.parquet(s"$baseDir/vocab")
        val (fCab, fVocab) = countTables(forgetDocs)
        baseCab
          .union(fCab.select(col("lang"), col("a"), col("b"),
            (-col("c_ab")).as("c_ab")))
          .groupBy("lang", "a", "b").agg(sum("c_ab").as("c_ab"))
          .filter(col("c_ab") > 0)
          .write.mode("overwrite").parquet(s"$dir/cab")
        baseVocab
          .union(fVocab.select(col("lang"), col("t"),
            (-col("c_tok")).as("c_tok")))
          .groupBy("lang", "t").agg(sum("c_tok").as("c_tok"))
          .filter(col("c_tok") > 0)
          .write.mode("overwrite").parquet(s"$dir/vocab")
      }
      dir
    }

  /** The full FORGET round trip as one query: build the base-half
    * index, MERGE the other reference half in, then FORGET that half
    * again — the report must equal one trained on the base half alone
    * (subtractive algebra is exact), which is what the oracle states.
    */
  def ngramLmForgotten(spark: SparkSession, sfDir: String): DataFrame = {
    val merged = lmIndexMerge(spark, sfDir,
      mergeBatchDocs(spark, sfDir), "refhalf")
    val dir = lmIndexForget(spark, merged,
      mergeBatchDocs(spark, sfDir), "refhalf")
    val cAb = spark.read.parquet(s"$dir/cab")
    val top = graft.plans.TopK.perKey(cAb, Seq("lang"),
      Seq("c_ab" -> graft.plans.TopK.Desc, "a" -> graft.plans.TopK.Asc,
        "b" -> graft.plans.TopK.Asc),
      lmTopK, rankCol = Some("rank"))
    Canon.canonicalize(top.select(
      col("lang"), col("rank").cast("long").as("rank"),
      col("a"), col("b"), col("c_ab")))
  }

  /** [[ngramLmOracle]] with the reference slice narrowed to the base
    * half — the from-scratch statement of what forget must produce.
    */
  val ngramLmForgottenOracle: String =
    s"""WITH ${lmCteBodyFor("doc_id % 10 = 0")},
       |ranked AS (
       |  SELECT lang, a, b, c_ab,
       |         row_number() OVER (PARTITION BY lang
       |           ORDER BY c_ab DESC, a ASC, b ASC) AS rank
       |  FROM cab)
       |SELECT lang, CAST(rank AS BIGINT) AS rank, a, b,
       |       CAST(c_ab AS BIGINT) AS c_ab
       |FROM ranked WHERE rank <= $lmTopK""".stripMargin

  /** The full LM index lifecycle as one query: build the base index on
    * half the reference slice, MERGE the other half in (counts sum,
    * vocab unions; the base corpus is never re-tokenized), and emit the
    * trained-model report from the merged index. Because merged ≡
    * rebuilt exactly (additive counts — LmIndexMergeSpec pins table
    * equality), the report equals [[ngramLm]]'s and shares
    * [[ngramLmOracle]].
    */
  def ngramLmMerged(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = lmIndexMerge(spark, sfDir,
      mergeBatchDocs(spark, sfDir), "refhalf")
    val cAb = spark.read.parquet(s"$dir/cab")
    val top = graft.plans.TopK.perKey(cAb, Seq("lang"),
      Seq("c_ab" -> graft.plans.TopK.Desc, "a" -> graft.plans.TopK.Asc,
        "b" -> graft.plans.TopK.Asc),
      lmTopK, rankCol = Some("rank"))
    Canon.canonicalize(top.select(
      col("lang"), col("rank").cast("long").as("rank"),
      col("a"), col("b"), col("c_ab")))
  }

  /** The shared training CTE chain: tokenized docs (dt) → bigrams with
    * BOS (bg) → reference bigram counts (cab). A def for the TextOps
    * init-cycle reason.
    */
  private def lmCteBody: String = lmCteBodyFor(s"doc_id % $lmRefMod = 0")

  /** Same chain with an arbitrary reference-slice predicate — the
    * forget oracle narrows it to the base half.
    */
  private[ext] def lmCteBodyFor(refCond: String): String = {
    import CurationOps.toksSql
    s"""dt AS (
       |  SELECT doc_id, lang, toks, ['$lmBos'] || toks AS arr
       |  FROM (SELECT doc_id, lang, $toksSql AS toks FROM documents)
       |  WHERE len(toks) > 0),
       |bg AS MATERIALIZED (
       |  SELECT doc_id, lang, arr[i] AS a, arr[i + 1] AS b
       |  FROM dt, unnest(range(1, len(arr))) AS r(i)),
       |cab AS MATERIALIZED (
       |  SELECT lang, a, b, count(*) AS c_ab
       |  FROM bg WHERE $refCond GROUP BY 1, 2, 3)""".stripMargin
  }
}
