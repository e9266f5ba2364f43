package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ext.{CurationOps, DedupOps, EventOps, GraphOps, MultimodalOps,
  SampleOps, ScoringOps, TextOps, VectorOps}
import graft.pipelines.{CustomerSalesReport, Ingestion, JdbcRoundTrip,
  JsonlRoundTrip, MicroQueries, ObjectStoreRoundTrip, ProductPerformance,
  SupplierPerformance}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator family from SURVEY.md §2 is a named query
  * with a DuckDB-equivalent oracle SQL over the same fixture parquet.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    SupplierPerformance(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // analytic marts (reference report tasks)
    "q_supplier_performance" -> ((s, dir) => SupplierPerformance(s, dir)),
    "q_customer_sales_report" -> ((s, dir) => CustomerSalesReport(s, dir)),
    "q_product_performance" -> ((s, dir) => ProductPerformance(s, dir)),
    // ingestion pipelines (REST/OAuth/CSV sources + gate + double-write)
    "q_ingest_suppliers" -> ((s, dir) => Ingestion.suppliers(s, dir)),
    "q_ingest_products" -> ((s, dir) => Ingestion.products(s, dir)),
    "q_ingest_customers" -> ((s, dir) => Ingestion.customers(s, dir)),
    "q_ingest_sales" -> ((s, dir) => Ingestion.sales(s, dir)),
    // io micro-queries
    "q_jdbc_roundtrip" -> ((s, dir) => JdbcRoundTrip(s, dir)),
    "q_objstore_roundtrip" ->
      ((s, dir) => ObjectStoreRoundTrip(s, dir)),
    "q_jdbc_pg_roundtrip" -> ((s, dir) => JdbcRoundTrip.pg(s, dir)),
    "q_jsonl_roundtrip" -> ((s, dir) => JsonlRoundTrip(s, dir)),
    // partitioned-layout join with runtime (dynamic) partition pruning
    "q_dpp_join" -> ((s, dir) => io.Partitioned.dppJoin(s, dir)),
    "q_dpp_bucketed_join" ->
      ((s, dir) => io.Partitioned.dppBucketedJoin(s, dir)),
    // LLM-pipeline text operators over `documents`
    "q_dedup_exact" -> ((s, dir) => TextOps.dedupExact(s, dir)),
    "q_text_stats" -> ((s, dir) => TextOps.textStats(s, dir)),
    "q_dataset_card" -> ((s, dir) => TextOps.datasetCard(s, dir)),
    "q_token_count" -> ((s, dir) => TextOps.tokenCount(s, dir)),
    "q_readability" -> ((s, dir) => TextOps.readability(s, dir)),
    "q_unicode_norm" -> ((s, dir) => TextOps.unicodeNormalize(s, dir)),
    // markup front-end: tag strip + entity decode ahead of normText
    "q_html_extract" -> ((s, dir) => TextOps.htmlExtract(s, dir)),
    "q_model_score" -> ((s, dir) => ScoringOps.modelScore(s, dir)),
    "q_rerank" -> ((s, dir) => ScoringOps.rerank(s, dir)),
    // nDCG@k / MRR over the three text rankings — the annRecall
    // analogue for the retrieval stack
    "q_retrieval_eval" -> ((s, dir) => ScoringOps.retrievalEval(s, dir)),
    // lexical + dense arms fused by RRF; dense query = top BM25 doc's
    // embedding (pseudo-relevance feedback, deterministic)
    "q_hybrid_search" -> ((s, dir) => ScoringOps.hybridSearch(s, dir)),
    // MMR diversification of the hybrid pool (greedy, oracle-unrolled)
    "q_mmr_rerank" -> ((s, dir) => ScoringOps.mmrRerank(s, dir)),
    "q_quality_classifier" ->
      ((s, dir) => ext.ClassifierOps.qualityClassifier(s, dir)),
    "q_quality_classifier_ref" ->
      ((s, dir) => ext.ClassifierOps.qualityClassifierRef(s, dir)),
    // reliability diagram: does the filter's threshold mean what it says
    "q_classifier_calibration" ->
      ((s, dir) => ext.ClassifierOps.classifierCalibration(s, dir)),
    "q_source_cap" -> ((s, dir) => TextOps.sourceCap(s, dir)),
    "q_domain_rollup" -> ((s, dir) => ext.DomainOps.domainRollup(s, dir)),
    "q_domain_len_drift" ->
      ((s, dir) => ext.DomainOps.domainLenDrift(s, dir)),
    "q_domain_cap" -> ((s, dir) => ext.DomainOps.domainCap(s, dir)),
    "q_domain_mix" -> ((s, dir) => ext.DomainOps.domainMix(s, dir)),
    // crawl front door: URL heuristics that run before any text exists
    "q_url_filter" -> ((s, dir) => ext.DomainOps.urlFilter(s, dir)),
    "q_mixture_plan" -> ((s, dir) => SampleOps.mixturePlan(s, dir)),
    "q_source_diversity" -> ((s, dir) => SampleOps.sourceDiversity(s, dir)),
    "q_temperature_mix" -> ((s, dir) => SampleOps.temperatureMix(s, dir)),
    "q_pref_pairs" -> ((s, dir) => ext.PrefOps.prefPairs(s, dir)),
    "q_pref_length_bias" -> ((s, dir) => ext.PrefOps.prefLengthBias(s, dir)),
    "q_source_winrate" -> ((s, dir) => ext.PrefOps.sourceWinRate(s, dir)),
    "q_source_bt" -> ((s, dir) => ext.PrefOps.sourceBt(s, dir)),
    "q_pref_export" -> ((s, dir) => ext.PrefOps.prefExport(s, dir)),
    "q_source_mix_shares" -> ((s, dir) => ext.PrefOps.sourceMixShares(s, dir)),
    "q_fingerprint" -> ((s, dir) => TextOps.fingerprint(s, dir)),
    "q_quality_score" -> ((s, dir) => TextOps.qualityScore(s, dir)),
    "q_lang_id" -> ((s, dir) => TextOps.langId(s, dir)),
    "q_lang_id_nb" -> ((s, dir) => ext.ClassifierOps.langIdNb(s, dir)),
    "q_pii_scrub" -> ((s, dir) => TextOps.piiScrub(s, dir)),
    "q_corpus_curate" -> ((s, dir) => TextOps.corpusCurate(s, dir)),
    // token-budgeted overlapping chunks (embedding/training-window prep)
    "q_doc_chunks" -> ((s, dir) => TextOps.docChunks(s, dir)),
    "q_repetition" -> ((s, dir) => CurationOps.repetition(s, dir)),
    "q_boilerplate" -> ((s, dir) => CurationOps.boilerplate(s, dir)),
    "q_boilerplate_apply" -> ((s, dir) => CurationOps.boilerplateApply(s, dir)),
    // position-free LINE-granular variant (mid-page banners, footers)
    "q_line_boilerplate" -> ((s, dir) => CurationOps.lineBoilerplate(s, dir)),
    "q_line_boilerplate_apply" ->
      ((s, dir) => CurationOps.lineBoilerplateApply(s, dir)),
    // global keep-first paragraph dedup (FineWeb recipe; threshold-free)
    "q_paragraph_dedup" -> ((s, dir) => ext.ParaOps.paragraphDedup(s, dir)),
    "q_paragraph_dedup_apply" ->
      ((s, dir) => ext.ParaOps.paragraphDedupApply(s, dir)),
    // the published Gopher heuristic filter battery, one scan
    "q_gopher_rules" -> ((s, dir) => CurationOps.gopherRules(s, dir)),
    // code-vs-prose routing signals (StarCoder-style), seeded shapes
    "q_code_detect" -> ((s, dir) => ext.CodeOps.codeDetect(s, dir)),
    // similar-length batches: padding-minimizing inference batching
    "q_length_batches" -> ((s, dir) => CurationOps.lengthBatches(s, dir)),
    "q_decontaminate" -> ((s, dir) => CurationOps.decontaminate(s, dir)),
    // per-doc first-seen gram share: prices redundancy in corpus order
    "q_doc_novelty" -> ((s, dir) => CurationOps.docNovelty(s, dir)),
    "q_contamination" -> ((s, dir) => CurationOps.contaminationScore(s, dir)),
    // Bloom pre-filtered twin: identical rows, broadcast-scale-safe path
    "q_decontaminate_bloom" ->
      ((s, dir) => CurationOps.decontaminateBloom(s, dir)),
    "q_pack_sequences" -> ((s, dir) => CurationOps.packSequences(s, dir)),
    // deterministic hash sampling: reproducible under any partitioning
    "q_train_split" -> ((s, dir) => SampleOps.trainValTestSplit(s, dir)),
    "q_stratified_sample" -> ((s, dir) => SampleOps.stratifiedSample(s, dir)),
    "q_weighted_sample" -> ((s, dir) => SampleOps.weightedSample(s, dir)),
    "q_curriculum" -> ((s, dir) => SampleOps.curriculum(s, dir)),
    // greedy best-quality-first selection under a corpus token budget
    "q_budget_select" -> ((s, dir) => SampleOps.budgetSelect(s, dir)),
    "q_sample_k_per_lang" -> ((s, dir) => SampleOps.sampleKPerStratum(s, dir)),
    // deterministic per-source epoch weighting (data-mixing upsampler)
    "q_mixture_repeat" -> ((s, dir) => SampleOps.mixtureRepeat(s, dir)),
    "q_shard_assign" -> ((s, dir) => SampleOps.shardAssign(s, dir)),
    // DSIR: hashed-n-gram importance weights vs the clean target slice
    "q_dsir_weights" -> ((s, dir) => SampleOps.dsirWeights(s, dir)),
    // the weights acted on: hash-deterministic proportional resample
    "q_dsir_sample" -> ((s, dir) => SampleOps.dsirSample(s, dir)),
    // similarity / near-dup operators over `documents` + `embeddings`
    "q_top_tokens" -> ((s, dir) => TextOps.topTokens(s, dir)),
    // Zipf/hapax spectrum: per-band type and occurrence mass
    "q_freq_spectrum" -> ((s, dir) => TextOps.freqSpectrum(s, dir)),
    // MG-candidate + exact-verify heavy hitters ≡ topTokens when the
    // MG bound clears (it does at every fixture scale)
    "q_heavy_hitters" -> ((s, dir) => ext.SketchOps.heavyHitters(s, dir)),
    "q_tfidf" -> ((s, dir) => TextOps.tfIdf(s, dir)),
    "q_dedup_clusters" -> ((s, dir) => DedupOps.dedupClusters(s, dir)),
    // the 100 TB dedup DAG: shingle → LSH band → verify → cluster
    "q_dedup_clusters_lsh" -> ((s, dir) => DedupOps.dedupClustersLsh(s, dir)),
    "q_cluster_sizes" -> ((s, dir) => DedupOps.clusterSizes(s, dir)),
    "q_pagerank" -> ((s, dir) => GraphOps.pageRank(s, dir)),
    "q_triangles" -> ((s, dir) => GraphOps.triangles(s, dir)),
    "q_ngram_jaccard" -> ((s, dir) => DedupOps.jaccardBlocked(s, dir)),
    "q_minhash_lsh" -> ((s, dir) => DedupOps.minhashLsh(s, dir)),
    "q_split_leakage" -> ((s, dir) => DedupOps.splitLeakage(s, dir)),
    "q_edit_distance" -> ((s, dir) => DedupOps.editDistanceNearDup(s, dir)),
    // ingest-time flow: new batch probes the corpus LSH index
    "q_minhash_lsh_incr" -> ((s, dir) => DedupOps.minhashLshIncremental(s, dir)),
    "q_dedup_clusters_incr" ->
      ((s, dir) => DedupOps.dedupClustersIncremental(s, dir)),
    // cluster lifecycle closed: merge the batch in, FORGET it again —
    // must equal the never-merged base clustering
    "q_dedup_clusters_forgotten" ->
      ((s, dir) => DedupOps.dedupClustersForgotten(s, dir)),
    // persisted EXACT-dedup hash ledger: probe a re-crawl batch, and
    // the merge→forget round trip back to the never-merged base
    "q_sha_ledger_probe" ->
      ((s, dir) => ext.LedgerOps.shaLedgerProbeQuery(s, dir)),
    "q_sha_ledger_forgotten" ->
      ((s, dir) => ext.LedgerOps.shaLedgerForgottenQuery(s, dir)),
    // same flow against the PERSISTED corpus LSH index (offline build)
    "q_minhash_lsh_indexed" -> ((s, dir) => DedupOps.minhashLshIndexed(s, dir)),
    "q_minhash_lsh_merged" -> ((s, dir) => DedupOps.minhashLshMerged(s, dir)),
    // lifecycle round trip: merge a slice in, FORGET it, probe
    "q_minhash_lsh_forgotten" ->
      ((s, dir) => DedupOps.minhashLshForgotten(s, dir)),
    "q_lsh_recall" -> ((s, dir) => DedupOps.lshRecall(s, dir)),
    "q_ann_recall" -> ((s, dir) => VectorOps.annRecall(s, dir)),
    "q_ann_ivf_spill" -> ((s, dir) => VectorOps.annIvfSpill(s, dir)),
    "q_ann_recall_mp" -> ((s, dir) => VectorOps.annRecallMp(s, dir)),
    "q_ann_ivf_white" -> ((s, dir) => VectorOps.annIvfWhite(s, dir)),
    "q_ann_recall_white" -> ((s, dir) => VectorOps.annRecallWhite(s, dir)),
    "q_ivf_fold_gate" -> ((s, dir) => VectorOps.ivfFoldGate(s, dir)),
    // gram-granular exact-substring duplication (cross-doc span overlap)
    "q_dup_spans" -> ((s, dir) => DedupOps.dupSpans(s, dir)),
    "q_dup_spans_apply" -> ((s, dir) => DedupOps.dupSpansApply(s, dir)),
    "q_dup_spans_50" -> ((s, dir) => DedupOps.dupSpanRuns(s, dir)),
    "q_dup_spans_50_apply" ->
      ((s, dir) => DedupOps.dupSpansApplyLong(s, dir)),
    "q_decontaminate_spans" ->
      ((s, dir) => CurationOps.decontaminateSpans(s, dir)),
    // detect -> REMOVE: the cleaned corpus after LSH clustering
    "q_dedup_apply" -> ((s, dir) => DedupOps.dedupApply(s, dir)),
    "q_dedup_apply_best" -> ((s, dir) => DedupOps.dedupApplyBest(s, dir)),
    // tokenizer vocabulary: counts, cutoff, dense ids
    "q_vocab_build" -> ((s, dir) => TextOps.vocabBuild(s, dir)),
    "q_oov_rate" -> ((s, dir) => TextOps.oovRate(s, dir)),
    // CCNet-style reference LM: train report + fluency terciles
    "q_ngram_lm" -> ((s, dir) => ext.LmOps.ngramLm(s, dir)),
    "q_perplexity_buckets" ->
      ((s, dir) => ext.LmOps.perplexityBuckets(s, dir)),
    // persisted LM index: build half, MERGE half, report ≡ rebuilt
    "q_ngram_lm_merged" -> ((s, dir) => ext.LmOps.ngramLmMerged(s, dir)),
    // merge a half in, FORGET it again: subtractive count algebra
    "q_ngram_lm_forgotten" ->
      ((s, dir) => ext.LmOps.ngramLmForgotten(s, dir)),
    "q_inverted_index" -> ((s, dir) => TextOps.invertedIndex(s, dir)),
    "q_bm25" -> ((s, dir) => TextOps.bm25(s, dir)),
    "q_rrf_fusion" -> ((s, dir) => TextOps.rrfFusion(s, dir)),
    "q_ngram_diversity" -> ((s, dir) => TextOps.ngramDiversity(s, dir)),
    "q_collocations" -> ((s, dir) => TextOps.collocations(s, dir)),
    // distributed BPE merge training (k-means-style driver-synced rounds)
    "q_bpe_train" -> ((s, dir) => ext.BpeOps.bpeTrain(s, dir)),
    "q_bpe_train_merged" -> ((s, dir) => ext.BpeOps.bpeTrainMerged(s, dir)),
    "q_bpe_train_forgotten" ->
      ((s, dir) => ext.BpeOps.bpeTrainForgotten(s, dir)),
    // apply the trained merges: real per-doc BPE token counts
    "q_bpe_encode" -> ((s, dir) => ext.BpeOps.bpeEncode(s, dir)),
    "q_bpe_bytes_train" -> ((s, dir) => ext.BpeOps.bpeBytesTrain(s, dir)),
    "q_bpe_bytes_encode" -> ((s, dir) => ext.BpeOps.bpeBytesEncode(s, dir)),
    // DoReMi-lite: excess reference-LM loss -> multiplicative mix
    // reweighting in mixturePlan's contract
    "q_doremi_mix" -> ((s, dir) => ext.SampleOps.doremiMix(s, dir)),
    // UniMax epoch-capped waterfill (uniform-with-caps mixture)
    "q_unimax_mix" -> ((s, dir) => ext.SampleOps.unimaxMix(s, dir)),
    "q_wordpiece_encode" -> ((s, dir) => ext.BpeOps.wordpieceEncode(s, dir)),
    // byte-fallback encode against the digit-holed vocabulary: zero
    // UNK by construction, fallback exercised on real fixture words
    "q_wordpiece_bytefallback" ->
      ((s, dir) => ext.BpeOps.wordpieceEncodeByteFallback(s, dir)),
    "q_compression_ratio" -> ((s, dir) => ext.BpeOps.compressionRatio(s, dir)),
    // unigram-LM (SentencePiece-style) tokenizer: hard-EM trained
    // piece table + globally-optimal Viterbi encode — the third
    // tokenizer family beside BPE replay and WordPiece greedy
    "q_unigram_train" -> ((s, dir) => ext.UnigramOps.unigramTrain(s, dir)),
    "q_unigram_encode" -> ((s, dir) => ext.UnigramOps.unigramEncode(s, dir)),
    // word-ledger lifecycle: merge odd half in (≡ full train), then
    // the forget round trip back to the even-half-only build
    "q_unigram_merged" -> ((s, dir) => ext.UnigramOps.unigramMerged(s, dir)),
    "q_unigram_forgotten" ->
      ((s, dir) => ext.UnigramOps.unigramForgotten(s, dir)),
    // tokenizer-coverage drift: single-char-emission share under the
    // frozen model, baseline vs a reversed-token drift proxy
    "q_unigram_drift" -> ((s, dir) => ext.UnigramOps.unigramDrift(s, dir)),
    // per-lang fertility under the trained unigram model — the
    // side-by-side read against q_compression_ratio (BPE)
    "q_unigram_fertility" ->
      ((s, dir) => ext.UnigramOps.unigramFertility(s, dir)),
    // packing budgeted in trained BPE tokens, not whitespace words
    "q_pack_tokens" -> ((s, dir) => ext.BpeOps.packTokens(s, dir)),
    "q_simhash_neardup" -> ((s, dir) => DedupOps.simhashNearDup(s, dir)),
    "q_simhash_recall" -> ((s, dir) => DedupOps.simhashRecall(s, dir)),
    "q_cosine_topk" -> ((s, dir) => VectorOps.cosineTopK(s, dir)),
    "q_hard_negatives" -> ((s, dir) => VectorOps.hardNegatives(s, dir)),
    "q_embed_neardup" -> ((s, dir) => VectorOps.embedNearDup(s, dir)),
    "q_embed_lsh" -> ((s, dir) => VectorOps.embedLsh(s, dir)),
    // semantic benchmark decontamination: sign-LSH candidates, exact
    // cosine verify, per-doc strongest offending benchmark example
    "q_embed_decontaminate" ->
      ((s, dir) => VectorOps.embedDecontaminate(s, dir)),
    // margin-based bitext mining (ratio margin over sign-LSH candidates)
    "q_bitext_mine" -> ((s, dir) => ext.BitextOps.bitextMine(s, dir)),
    "q_bitext_recall" -> ((s, dir) => ext.BitextOps.bitextRecall(s, dir)),
    "q_bitext_recall_mp" ->
      ((s, dir) => ext.BitextOps.bitextRecallMultiProbe(s, dir)),
    // register-explicit HLL over the gram key space, fully oracle-gated
    "q_hll_distinct" -> ((s, dir) => ext.SketchOps.hllDistinct(s, dir)),
    // four doc-shard sketches merged by pointwise max ≡ whole-corpus
    "q_hll_merged" -> ((s, dir) => ext.SketchOps.hllMerged(s, dir)),
    // HDR-histogram mergeable quantile sketch + its merge-law proof
    "q_hdr_quantiles" ->
      ((s, dir) => ext.SketchOps.hdrQuantiles(s, dir)),
    "q_hdr_merged" ->
      ((s, dir) => ext.SketchOps.hdrQuantilesMerged(s, dir)),
    "q_hdr_drift" -> ((s, dir) => ext.SketchOps.hdrDrift(s, dir)),
    "q_hdr_fold_gate" ->
      ((s, dir) => ext.SketchOps.hdrFoldGate(s, dir)),
    // precision/recall/F1 operating curve over the classifier deciles
    "q_classifier_pr" -> ((s, dir) => ext.ClassifierOps.classifierPr(s, dir)),
    // min-K% prob membership inference against the reference bigram LM
    "q_min_k_prob" -> ((s, dir) => ext.LmOps.minKProb(s, dir)),
    // pre-flight LSH pair-cost census (per-band bucket histogram fold)
    "q_lsh_cost" -> ((s, dir) => ext.DedupOps.lshCostCensus(s, dir)),
    // k-anonymity release: under-k source cells fold into __other__
    "q_kanon_release" -> ((s, dir) => ext.GovernanceOps.kanonRelease(s, dir)),
    // ε-DP release: discrete-Laplace noise via an all-integer md5
    // threshold ladder, noisy sub-τ cells fold into __suppressed__
    "q_dp_release" -> ((s, dir) => ext.GovernanceOps.dpRelease(s, dir)),
    // the curator-side cost-of-privacy row: per-lang suppression split
    // + total absolute injected noise for both released statistics
    "q_dp_utility" -> ((s, dir) => ext.GovernanceOps.dpUtility(s, dir)),
    // the streaming cardinality fold itself, oracle-gated via a
    // deterministic two-batch feed
    "q_hll_fold_gate" -> ((s, dir) => ext.SketchOps.hllFoldGate(s, dir)),
    // dominant principal component by exact-integer matrix squaring
    "q_pca_power" -> ((s, dir) => ext.VectorOps.pcaPower(s, dir)),
    // per-doc projection onto the dominant component (outlier axis)
    "q_pca_project" -> ((s, dir) => ext.VectorOps.pcaProject(s, dir)),
    // top-2 components via integer deflation of the Gram
    "q_pca_top2" -> ((s, dir) => ext.VectorOps.pcaTop2(s, dir)),
    "q_pca_topk" -> ((s, dir) => ext.VectorOps.pcaTopk(s, dir)),
    // PCA lifecycle: shard-Gram merge law + exact algebraic unlearning
    "q_pca_merged" -> ((s, dir) => ext.VectorOps.pcaMerged(s, dir)),
    "q_pca_forgotten" ->
      ((s, dir) => ext.VectorOps.pcaForgotten(s, dir)),
    // streaming Gram fold, gated per generation vs from-scratch retrain
    "q_pca_fold_gate" ->
      ((s, dir) => ext.VectorOps.pcaFoldGate(s, dir)),
    // template-doc detector: top-k by common-direction energy capture
    "q_pca_outliers" ->
      ((s, dir) => ext.VectorOps.pcaOutliers(s, dir)),
    "q_semantic_dedup_abtt" ->
      ((s, dir) => ext.VectorOps.semanticDedupAbtt(s, dir)),
    "q_embed_anisotropy" ->
      ((s, dir) => ext.VectorOps.embedAnisotropy(s, dir)),
    // sign-LSH recall vs exact cosine on a bounded hash sample
    "q_embed_recall" -> ((s, dir) => ext.VectorOps.embedRecall(s, dir)),
    // Hamming-1 multi-probe variant: ~9x candidates, measured lift
    "q_embed_lsh_mp" ->
      ((s, dir) => ext.VectorOps.embedLshMultiProbe(s, dir)),
    "q_embed_recall_mp" ->
      ((s, dir) => ext.VectorOps.embedRecallMultiProbe(s, dir)),
    // decontamination with bench-side multi-probe (broadcast side ×9)
    "q_embed_decontaminate_mp" ->
      ((s, dir) => ext.VectorOps.embedDecontaminateMultiProbe(s, dir)),
    "q_ann_ivf" -> ((s, dir) => VectorOps.annIvf(s, dir)),
    // IVF-SQ8: int8-coded index, asymmetric coarse scan, exact rescore
    "q_ann_ivf_sq8" -> ((s, dir) => VectorOps.annIvfSq8(s, dir)),
    // IVF-PQ: product-quantized codes, table-lookup coarse scan
    "q_ann_ivf_pq" -> ((s, dir) => VectorOps.annIvfPq(s, dir)),
    "q_ann_ivf_pq_spill" -> ((s, dir) => VectorOps.annIvfPqSpill(s, dir)),
    "q_ann_pq_rerank_sweep" ->
      ((s, dir) => VectorOps.annPqRerankSweep(s, dir)),
    // IVF-PQ residual encoding (IVF-ADC proper) + its width curve
    "q_ann_ivf_pqr" -> ((s, dir) => VectorOps.annIvfPqr(s, dir)),
    "q_ann_pqr_rerank_sweep" ->
      ((s, dir) => VectorOps.annPqrRerankSweep(s, dir)),
    // filtered ANN: metadata predicate served off the shared index,
    // candidate-count-targeted adaptive probing + 3-arm decision row
    "q_ann_filtered" -> ((s, dir) => VectorOps.annIvfFiltered(s, dir)),
    "q_ann_filtered_recall" ->
      ((s, dir) => VectorOps.annFilteredRecall(s, dir)),
    // discovered-domain clusters + balanced-mixture repeat factors
    "q_domain_mixture" -> ((s, dir) => VectorOps.domainMixture(s, dir)),
    // embeddings data contract (dim, zero vectors, bidirectional FK)
    "q_embed_expectations" ->
      ((s, dir) => VectorOps.embedExpectations(s, dir)),
    "q_embed_quantize" -> ((s, dir) => VectorOps.quantizeInt8(s, dir)),
    "q_embed_project" -> ((s, dir) => VectorOps.embedProject(s, dir)),
    "q_embed_moments" -> ((s, dir) => VectorOps.embedMoments(s, dir)),
    "q_semantic_dedup" -> ((s, dir) => VectorOps.semanticDedup(s, dir)),
    // full-probe twin: provably ≡ brute force → shares the exact oracle
    "q_ann_ivf_merged" -> ((s, dir) => VectorOps.annIvfMerged(s, dir)),
    "q_ann_ivf_forgotten" ->
      ((s, dir) => VectorOps.annIvfForgotten(s, dir)),
    "q_ann_ivf_fullprobe" ->
      ((s, dir) => VectorOps.annIvf(s, dir, nprobe = VectorOps.ivfCentroids)),
    // event-stream aggregation (batch forms of the streaming transforms)
    "q_events_daily" -> ((s, dir) => EventOps.eventsDaily(s, dir)),
    "q_events_sessions" -> ((s, dir) => EventOps.eventsSessions(s, dir)),
    "q_funnel" -> ((s, dir) => EventOps.funnel(s, dir)),
    "q_retention" -> ((s, dir) => EventOps.retention(s, dir)),
    "q_histogram" -> ((s, dir) => EventOps.histogram(s, dir)),
    "q_user_value_deltas" -> ((s, dir) => EventOps.userValueDeltas(s, dir)),
    "q_moving_agg" -> ((s, dir) => EventOps.movingAgg(s, dir)),
    // backward as-of join via union + carry-forward window (one shuffle)
    "q_asof_join" -> ((s, dir) => EventOps.asofJoin(s, dir)),
    // the forward mirror: earliest view at-or-after each purchase
    "q_asof_forward" -> ((s, dir) => EventOps.asofJoinForward(s, dir)),
    // percentile winsorization (tail clipping per group)
    "q_winsorize" -> ((s, dir) => EventOps.winsorize(s, dir)),
    "q_mad_outliers" -> ((s, dir) => EventOps.madOutliers(s, dir)),
    "q_daily_anomalies" -> ((s, dir) => EventOps.dailyAnomalies(s, dir)),
    // banded range join: time-theta-join made equi-join-shaped
    "q_band_join" -> ((s, dir) => EventOps.bandJoin(s, dir)),
    // typed from_json struct extraction over the props payload
    "q_json_extract" -> ((s, dir) => EventOps.jsonExtract(s, dir)),
    // multimodal binary-column metadata
    "q_multimodal_meta" -> ((s, dir) => MultimodalOps.binaryMeta(s, dir)),
    "q_multimodal_frames" -> ((s, dir) => MultimodalOps.frameSamples(s, dir)),
    "q_image_neardup" -> ((s, dir) => MultimodalOps.imageNearDup(s, dir)),
    "q_video_neardup" -> ((s, dir) => MultimodalOps.videoNearDup(s, dir)),
    "q_audio_neardup" -> ((s, dir) => MultimodalOps.audioNearDup(s, dir)),
    "q_audio_recall" -> ((s, dir) => MultimodalOps.audioRecall(s, dir)),
    "q_image_recall" -> ((s, dir) => MultimodalOps.imageRecall(s, dir)),
    "q_video_recall" -> ((s, dir) => MultimodalOps.videoRecall(s, dir)),
    // operator-family micro-queries (SURVEY §7.2.6)
    "q_scan_project" -> ((s, dir) => MicroQueries.scanProject(s, dir)),
    "q_normalize_rename" -> ((s, dir) => MicroQueries.normalizeRename(s, dir)),
    "q_dup_detect" -> ((s, dir) => MicroQueries.dupDetect(s, dir)),
    "q_compound_filter" -> ((s, dir) => MicroQueries.compoundFilter(s, dir)),
    "q_inmemory_dim_join" -> ((s, dir) => MicroQueries.inMemoryDimJoin(s, dir)),
    "q_null_repair" -> ((s, dir) => MicroQueries.nullRepair(s, dir)),
    "q_date_and_round" -> ((s, dir) => MicroQueries.dateAndRound(s, dir)),
    "q_topk_native" -> ((s, dir) => MicroQueries.topkNative(s, dir)),
    "q_topk_rewrite" -> ((s, dir) => MicroQueries.topkRewrite(s, dir)),
    "q_topk_global" -> ((s, dir) => MicroQueries.topkGlobal(s, dir)),
    "q_pivot_status" -> ((s, dir) => MicroQueries.pivotStatus(s, dir)),
    "q_set_ops" -> ((s, dir) => MicroQueries.setOps(s, dir)),
    "q_semi_anti" -> ((s, dir) => MicroQueries.semiAnti(s, dir)),
    "q_rollup_docs" -> ((s, dir) => MicroQueries.rollupDocs(s, dir)),
    "q_cube_docs" -> ((s, dir) => MicroQueries.cubeDocs(s, dir)),
    // Z-order clustering key (two-dimensional scan-pruning layout)
    "q_zorder_key" -> ((s, dir) => MicroQueries.zorderKey(s, dir)),
    "q_scd2_merge" -> ((s, dir) => MicroQueries.scd2Merge(s, dir)),
    // the whole online acceptance pipeline, hash-gated end to end
    "q_ingest_funnel" ->
      ((s, dir) => graft.streaming.EventStream.ingestFunnelStats(s, dir)),
    "q_snapshot_diff" -> ((s, dir) => MicroQueries.snapshotDiff(s, dir)),
    "q_incremental_score" -> ((s, dir) => MicroQueries.incrementalScore(s, dir)),
    // per-feature TV distance vs yesterday's snapshot (drift dashboard)
    "q_corpus_drift" -> ((s, dir) => MicroQueries.corpusDrift(s, dir)),
    "q_skew_report" -> ((s, dir) => MicroQueries.skewReport(s, dir)),
    "q_profile_orders" -> ((s, dir) => MicroQueries.profileOrders(s, dir)),
    "q_percentiles" -> ((s, dir) => EventOps.groupPercentiles(s, dir)),
    "q_expectations" -> ((s, dir) => MicroQueries.expectations(s, dir)),
    "q_pseudonymize" -> ((s, dir) => EventOps.pseudonymize(s, dir)),
    // one-call right-to-be-forgotten sweep across all six persisted
    // artifact tiers, audited against never-ingested state per tier
    "q_takedown_sweep" ->
      ((s, dir) => ext.GovernanceOps.takedownSweepQuery(s, dir)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_supplier_performance" -> SupplierPerformance.oracle,
    "q_customer_sales_report" -> CustomerSalesReport.oracle,
    "q_product_performance" -> ProductPerformance.oracle,
    "q_ingest_suppliers" -> Ingestion.suppliersOracle,
    "q_ingest_products" -> Ingestion.productsOracle,
    "q_ingest_customers" -> Ingestion.customersOracle,
    "q_ingest_sales" -> Ingestion.salesOracle,
    "q_jdbc_roundtrip" -> JdbcRoundTrip.oracle,
    "q_objstore_roundtrip" -> ObjectStoreRoundTrip.oracle,
    "q_jdbc_pg_roundtrip" -> JdbcRoundTrip.oracle,
    "q_dpp_join" -> io.Partitioned.dppJoinOracle,
    "q_dpp_bucketed_join" -> io.Partitioned.dppBucketedJoinOracle,
    "q_jsonl_roundtrip" -> JsonlRoundTrip.oracle,
    "q_dedup_exact" -> TextOps.dedupExactOracle,
    "q_text_stats" -> TextOps.textStatsOracle,
    "q_dataset_card" -> TextOps.datasetCardOracle,
    "q_token_count" -> TextOps.tokenCountOracle,
    "q_readability" -> TextOps.readabilityOracle,
    "q_unicode_norm" -> TextOps.unicodeNormalizeOracle,
    "q_html_extract" -> TextOps.htmlExtractOracle,
    "q_model_score" -> ScoringOps.modelScoreOracle,
    "q_rerank" -> ScoringOps.rerankOracle,
    "q_retrieval_eval" -> ScoringOps.retrievalEvalOracle,
    "q_hybrid_search" -> ScoringOps.hybridSearchOracle,
    "q_mmr_rerank" -> ScoringOps.mmrRerankOracle,
    "q_quality_classifier" -> ext.ClassifierOps.qualityClassifierOracle,
    "q_classifier_calibration" ->
      ext.ClassifierOps.classifierCalibrationOracle,
    "q_quality_classifier_ref" ->
      ext.ClassifierOps.qualityClassifierRefOracle,
    "q_source_cap" -> TextOps.sourceCapOracle,
    "q_domain_rollup" -> ext.DomainOps.domainRollupOracle,
    "q_domain_len_drift" -> ext.DomainOps.domainLenDriftOracle,
    "q_domain_cap" -> ext.DomainOps.domainCapOracle,
    "q_domain_mix" -> ext.DomainOps.domainMixOracle,
    "q_url_filter" -> ext.DomainOps.urlFilterOracle,
    "q_mixture_plan" -> SampleOps.mixturePlanOracle,
    "q_source_diversity" -> SampleOps.sourceDiversityOracle,
    "q_temperature_mix" -> SampleOps.temperatureMixOracle,
    "q_pref_pairs" -> ext.PrefOps.prefPairsOracle,
    "q_pref_length_bias" -> ext.PrefOps.prefLengthBiasOracle,
    "q_source_winrate" -> ext.PrefOps.sourceWinRateOracle,
    "q_source_bt" -> ext.PrefOps.sourceBtOracle,
    "q_pref_export" -> ext.PrefOps.prefExportOracle,
    "q_source_mix_shares" -> ext.PrefOps.sourceMixSharesOracle,
    "q_fingerprint" -> TextOps.fingerprintOracle,
    "q_quality_score" -> TextOps.qualityScoreOracle,
    "q_lang_id" -> TextOps.langIdOracle,
    "q_lang_id_nb" -> ext.ClassifierOps.langIdNbOracle,
    "q_pii_scrub" -> TextOps.piiScrubOracle,
    "q_corpus_curate" -> TextOps.corpusCurateOracle,
    "q_doc_chunks" -> TextOps.docChunksOracle,
    "q_repetition" -> CurationOps.repetitionOracle,
    "q_boilerplate" -> CurationOps.boilerplateOracle,
    "q_boilerplate_apply" -> CurationOps.boilerplateApplyOracle,
    "q_line_boilerplate" -> CurationOps.lineBoilerplateOracle,
    "q_line_boilerplate_apply" -> CurationOps.lineBoilerplateApplyOracle,
    "q_paragraph_dedup" -> ext.ParaOps.paragraphDedupOracle,
    "q_paragraph_dedup_apply" -> ext.ParaOps.paragraphDedupApplyOracle,
    "q_gopher_rules" -> CurationOps.gopherRulesOracle,
    "q_code_detect" -> ext.CodeOps.codeDetectOracle,
    "q_length_batches" -> CurationOps.lengthBatchesOracle,
    "q_decontaminate" -> CurationOps.decontaminateOracle,
    "q_doc_novelty" -> CurationOps.docNoveltyOracle,
    "q_contamination" -> CurationOps.contaminationScoreOracle,
    // exact-verified Bloom variant is row-identical → shares the oracle
    "q_decontaminate_bloom" -> CurationOps.decontaminateOracle,
    "q_pack_sequences" -> CurationOps.packSequencesOracle,
    "q_embed_quantize" -> VectorOps.quantizeInt8Oracle,
    "q_embed_project" -> VectorOps.embedProjectOracle,
    "q_embed_moments" -> VectorOps.embedMomentsOracle,
    "q_train_split" -> SampleOps.trainValTestSplitOracle,
    "q_stratified_sample" -> SampleOps.stratifiedSampleOracle,
    "q_weighted_sample" -> SampleOps.weightedSampleOracle,
    "q_curriculum" -> SampleOps.curriculumOracle,
    "q_budget_select" -> SampleOps.budgetSelectOracle,
    "q_sample_k_per_lang" -> SampleOps.sampleKPerStratumOracle,
    "q_mixture_repeat" -> SampleOps.mixtureRepeatOracle,
    "q_shard_assign" -> SampleOps.shardAssignOracle,
    "q_dsir_weights" -> SampleOps.dsirWeightsOracle,
    "q_dsir_sample" -> SampleOps.dsirSampleOracle,
    "q_ngram_jaccard" -> DedupOps.jaccardBlockedOracle,
    "q_minhash_lsh" -> DedupOps.minhashLshOracle,
    "q_split_leakage" -> DedupOps.splitLeakageOracle,
    "q_edit_distance" -> DedupOps.editDistanceOracle,
    "q_minhash_lsh_incr" -> DedupOps.minhashLshIncrementalOracle,
    "q_dedup_clusters_incr" -> DedupOps.dedupClustersLshOracle,
    "q_dedup_clusters_forgotten" -> DedupOps.dedupClustersForgottenOracle,
    "q_sha_ledger_probe" -> ext.LedgerOps.shaLedgerProbeOracle,
    "q_sha_ledger_forgotten" -> ext.LedgerOps.shaLedgerForgottenOracle,
    // indexed probe is semantics-identical → shares the incremental oracle
    "q_minhash_lsh_indexed" -> DedupOps.minhashLshIncrementalOracle,
    "q_minhash_lsh_merged" -> DedupOps.minhashLshMergedOracle,
    "q_minhash_lsh_forgotten" -> DedupOps.minhashLshForgottenOracle,
    "q_lsh_recall" -> DedupOps.lshRecallOracle,
    "q_ann_recall" -> VectorOps.annRecallOracle,
    "q_ann_ivf_spill" -> VectorOps.annIvfSpillOracle,
    "q_ann_recall_mp" -> VectorOps.annRecallMpOracle,
    "q_ann_ivf_white" -> VectorOps.annIvfWhiteOracle,
    "q_ann_recall_white" -> VectorOps.annRecallWhiteOracle,
    "q_ivf_fold_gate" -> VectorOps.ivfFoldGateOracle,
    "q_dup_spans" -> DedupOps.dupSpansOracle,
    "q_dup_spans_apply" -> DedupOps.dupSpansApplyOracle,
    "q_dup_spans_50" -> DedupOps.dupSpanRunsOracle,
    "q_dup_spans_50_apply" -> DedupOps.dupSpansApplyLongOracle,
    "q_decontaminate_spans" -> CurationOps.decontaminateSpansOracle,
    "q_dedup_apply" -> DedupOps.dedupApplyOracle,
    "q_dedup_apply_best" -> DedupOps.dedupApplyBestOracle,
    "q_vocab_build" -> TextOps.vocabBuildOracle,
    "q_oov_rate" -> TextOps.oovRateOracle,
    "q_ngram_lm" -> ext.LmOps.ngramLmOracle,
    "q_perplexity_buckets" -> ext.LmOps.perplexityBucketsOracle,
    // merged ≡ rebuilt (additive count algebra) → shares the oracle
    "q_ngram_lm_merged" -> ext.LmOps.ngramLmOracle,
    "q_ngram_lm_forgotten" -> ext.LmOps.ngramLmForgottenOracle,
    "q_inverted_index" -> TextOps.invertedIndexOracle,
    "q_bm25" -> TextOps.bm25Oracle,
    "q_rrf_fusion" -> TextOps.rrfFusionOracle,
    "q_ngram_diversity" -> TextOps.ngramDiversityOracle,
    "q_collocations" -> TextOps.collocationsOracle,
    "q_bpe_train" -> ext.BpeOps.bpeTrainOracle,
    "q_bpe_train_merged" -> ext.BpeOps.bpeTrainOracle,
    "q_bpe_train_forgotten" -> ext.BpeOps.bpeTrainForgottenOracle,
    "q_bpe_encode" -> ext.BpeOps.bpeEncodeOracle,
    "q_bpe_bytes_train" -> ext.BpeOps.bpeBytesTrainOracle,
    "q_bpe_bytes_encode" -> ext.BpeOps.bpeBytesEncodeOracle,
    "q_doremi_mix" -> ext.SampleOps.doremiMixOracle,
    "q_unimax_mix" -> ext.SampleOps.unimaxMixOracle,
    "q_wordpiece_encode" -> ext.BpeOps.wordpieceEncodeOracle,
    "q_wordpiece_bytefallback" ->
      ext.BpeOps.wordpieceEncodeByteFallbackOracle,
    "q_compression_ratio" -> ext.BpeOps.compressionRatioOracle,
    "q_unigram_train" -> ext.UnigramOps.unigramTrainOracle,
    "q_unigram_encode" -> ext.UnigramOps.unigramEncodeOracle,
    "q_unigram_merged" -> ext.UnigramOps.unigramMergedOracle,
    "q_unigram_forgotten" -> ext.UnigramOps.unigramForgottenOracle,
    "q_unigram_drift" -> ext.UnigramOps.unigramDriftOracle,
    "q_unigram_fertility" -> ext.UnigramOps.unigramFertilityOracle,
    "q_pack_tokens" -> ext.BpeOps.packTokensOracle,
    "q_simhash_neardup" -> DedupOps.simhashNearDupOracle,
    "q_simhash_recall" -> DedupOps.simhashRecallOracle,
    "q_top_tokens" -> TextOps.topTokensOracle,
    "q_freq_spectrum" -> TextOps.freqSpectrumOracle,
    "q_heavy_hitters" -> TextOps.topTokensOracle,
    "q_tfidf" -> TextOps.tfIdfOracle,
    "q_dedup_clusters" -> DedupOps.dedupClustersOracle,
    "q_dedup_clusters_lsh" -> DedupOps.dedupClustersLshOracle,
    "q_cluster_sizes" -> DedupOps.clusterSizesOracle,
    "q_pagerank" -> GraphOps.pageRankOracle,
    "q_triangles" -> GraphOps.trianglesOracle,
    "q_cosine_topk" -> VectorOps.cosineTopKOracle,
    "q_hard_negatives" -> VectorOps.hardNegativesOracle,
    "q_ann_ivf" -> VectorOps.annIvfOracle(),
    "q_ann_ivf_sq8" -> VectorOps.annIvfSq8Oracle(),
    "q_ann_ivf_pq" -> VectorOps.annIvfPqOracle(),
    "q_ann_ivf_pq_spill" -> VectorOps.annIvfPqSpillOracle,
    "q_ann_pq_rerank_sweep" -> VectorOps.annPqRerankSweepOracle,
    "q_ann_ivf_pqr" -> VectorOps.annIvfPqrOracle(),
    "q_ann_pqr_rerank_sweep" -> VectorOps.annPqrRerankSweepOracle,
    "q_ann_filtered" -> VectorOps.annIvfFilteredOracle,
    "q_ann_filtered_recall" -> VectorOps.annFilteredRecallOracle,
    "q_domain_mixture" -> VectorOps.domainMixtureOracle,
    "q_embed_expectations" -> VectorOps.embedExpectationsOracle,
    "q_semantic_dedup" -> VectorOps.semanticDedupOracle,
    "q_ann_ivf_merged" -> VectorOps.annIvfMergedOracle,
    "q_ann_ivf_forgotten" -> VectorOps.annIvfForgottenOracle,
    "q_ann_ivf_fullprobe" -> VectorOps.cosineTopKOracle,
    "q_embed_neardup" -> VectorOps.embedNearDupOracle,
    "q_embed_lsh" -> VectorOps.embedLshOracle,
    "q_embed_decontaminate" -> VectorOps.embedDecontaminateOracle,
    "q_bitext_mine" -> ext.BitextOps.bitextMineOracle,
    "q_bitext_recall" -> ext.BitextOps.bitextRecallOracle,
    "q_bitext_recall_mp" -> ext.BitextOps.bitextRecallMultiProbeOracle,
    "q_hll_distinct" -> ext.SketchOps.hllDistinctOracle,
    // the merged sketch must equal the NEVER-sharded oracle
    "q_hll_merged" -> ext.SketchOps.hllDistinctOracle,
    "q_hdr_quantiles" -> ext.SketchOps.hdrQuantilesOracle,
    // the merged sketch must equal the NEVER-sharded oracle
    "q_hdr_merged" -> ext.SketchOps.hdrQuantilesOracle,
    "q_hdr_drift" -> ext.SketchOps.hdrDriftOracle,
    "q_hdr_fold_gate" -> ext.SketchOps.hdrFoldGateOracle,
    "q_classifier_pr" -> ext.ClassifierOps.classifierPrOracle,
    "q_min_k_prob" -> ext.LmOps.minKProbOracle,
    "q_lsh_cost" -> ext.DedupOps.lshCostCensusOracle,
    "q_kanon_release" -> ext.GovernanceOps.kanonReleaseOracle,
    "q_dp_release" -> ext.GovernanceOps.dpReleaseOracle,
    "q_dp_utility" -> ext.GovernanceOps.dpUtilityOracle,
    "q_hll_fold_gate" -> ext.SketchOps.hllFoldGateOracle,
    "q_pca_power" -> ext.VectorOps.pcaPowerOracle,
    "q_pca_project" -> ext.VectorOps.pcaProjectOracle,
    "q_pca_top2" -> ext.VectorOps.pcaTop2Oracle,
    "q_pca_topk" -> ext.VectorOps.pcaTopkOracle,
    // the merged Gram must equal the NEVER-sharded oracle
    "q_pca_merged" -> ext.VectorOps.pcaPowerOracle,
    // forget gates against a never-existed retrain
    "q_pca_forgotten" -> ext.VectorOps.pcaForgottenOracle,
    "q_pca_fold_gate" -> ext.VectorOps.pcaFoldGateOracle,
    "q_pca_outliers" -> ext.VectorOps.pcaOutliersOracle,
    "q_semantic_dedup_abtt" -> ext.VectorOps.semanticDedupAbttOracle,
    "q_embed_anisotropy" -> ext.VectorOps.embedAnisotropyOracle,
    "q_embed_recall" -> ext.VectorOps.embedRecallOracle,
    "q_embed_lsh_mp" -> ext.VectorOps.embedLshMultiProbeOracle,
    "q_embed_recall_mp" -> ext.VectorOps.embedRecallMultiProbeOracle,
    "q_embed_decontaminate_mp" ->
      ext.VectorOps.embedDecontaminateMultiProbeOracle,
    "q_events_daily" -> EventOps.eventsDailyOracle,
    "q_events_sessions" -> EventOps.eventsSessionsOracle,
    "q_funnel" -> EventOps.funnelOracle,
    "q_retention" -> EventOps.retentionOracle,
    "q_histogram" -> EventOps.histogramOracle,
    "q_user_value_deltas" -> EventOps.userValueDeltasOracle,
    "q_moving_agg" -> EventOps.movingAggOracle,
    "q_asof_join" -> EventOps.asofJoinOracle,
    "q_asof_forward" -> EventOps.asofJoinForwardOracle,
    "q_winsorize" -> EventOps.winsorizeOracle,
    "q_mad_outliers" -> EventOps.madOutliersOracle,
    "q_daily_anomalies" -> EventOps.dailyAnomaliesOracle,
    "q_band_join" -> EventOps.bandJoinOracle,
    "q_json_extract" -> EventOps.jsonExtractOracle,
    "q_multimodal_meta" -> MultimodalOps.binaryMetaOracle,
    "q_multimodal_frames" -> MultimodalOps.frameSamplesOracle,
    "q_image_neardup" -> MultimodalOps.imageNearDupOracle,
    "q_video_neardup" -> MultimodalOps.videoNearDupOracle,
    "q_audio_neardup" -> MultimodalOps.audioNearDupOracle,
    "q_audio_recall" -> MultimodalOps.audioRecallOracle,
    "q_image_recall" -> MultimodalOps.imageRecallOracle,
    "q_video_recall" -> MultimodalOps.videoRecallOracle,
    "q_scan_project" -> MicroQueries.scanProjectOracle,
    "q_normalize_rename" -> MicroQueries.normalizeRenameOracle,
    "q_dup_detect" -> MicroQueries.dupDetectOracle,
    "q_compound_filter" -> MicroQueries.compoundFilterOracle,
    "q_inmemory_dim_join" -> MicroQueries.inMemoryDimJoinOracle,
    "q_null_repair" -> MicroQueries.nullRepairOracle,
    "q_date_and_round" -> MicroQueries.dateAndRoundOracle,
    "q_topk_native" -> MicroQueries.topkNativeOracle,
    "q_topk_rewrite" -> MicroQueries.topkRewriteOracle,
    "q_topk_global" -> MicroQueries.topkGlobalOracle,
    "q_pivot_status" -> MicroQueries.pivotStatusOracle,
    "q_set_ops" -> MicroQueries.setOpsOracle,
    "q_semi_anti" -> MicroQueries.semiAntiOracle,
    "q_rollup_docs" -> MicroQueries.rollupDocsOracle,
    "q_cube_docs" -> MicroQueries.cubeDocsOracle,
    "q_zorder_key" -> MicroQueries.zorderKeyOracle,
    "q_scd2_merge" -> MicroQueries.scd2MergeOracle,
    "q_ingest_funnel" ->
      graft.streaming.EventStream.ingestFunnelStatsOracle,
    "q_snapshot_diff" -> MicroQueries.snapshotDiffOracle,
    "q_incremental_score" -> MicroQueries.incrementalScoreOracle,
    "q_corpus_drift" -> MicroQueries.corpusDriftOracle,
    "q_skew_report" -> MicroQueries.skewReportOracle,
    "q_profile_orders" -> MicroQueries.profileOrdersOracle,
    "q_percentiles" -> EventOps.groupPercentilesOracle,
    "q_expectations" -> MicroQueries.expectationsOracle,
    "q_pseudonymize" -> EventOps.pseudonymizeOracle,
    "q_takedown_sweep" -> ext.GovernanceOps.takedownSweepOracle,
    // Every query carries an oracle — including the approximate family
    // (deterministic twin-hash pipelines) and trained-IVF ANN (the Lloyd
    // rounds are unrolled into the oracle SQL itself).
  )
}
