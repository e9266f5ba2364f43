package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan dump for scan pruning / exchange audits (dev tool). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // thunks, not frames: several builders MATERIALIZE work (dedupApply
    // runs the clustering, bpeEncode trains) — lazy entries stream each
    // plan as it is built and keep one entry's failure from blanking
    // the whole dump
    val entries: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "dpp_bucketed_join" ->
        (() => io.Partitioned.dppBucketedJoin(spark, sf)),
      "ann_ivf_spill" -> (() => ext.VectorOps.annIvfSpill(spark, sf)),
      "ann_ivf_white" -> (() => ext.VectorOps.annIvfWhite(spark, sf)),
      "ann_ivf_pq_spill" -> (() => ext.VectorOps.annIvfPqSpill(spark, sf)),
      "ann_pq_rerank_sweep" ->
        (() => ext.VectorOps.annPqRerankSweep(spark, sf)),
      "ann_ivf_pqr" -> (() => ext.VectorOps.annIvfPqr(spark, sf)),
      "ann_filtered" -> (() => ext.VectorOps.annIvfFiltered(spark, sf)),
      "ann_pqr_rerank_sweep" ->
        (() => ext.VectorOps.annPqrRerankSweep(spark, sf)),
      "ivf_fold_gate" -> (() => ext.VectorOps.ivfFoldGate(spark, sf)),
      "dp_release" -> (() => ext.GovernanceOps.dpRelease(spark, sf)),
      "train_split" -> (() => ext.SampleOps.trainValTestSplit(spark, sf)),
      "sample_k" -> (() => ext.SampleOps.sampleKPerStratum(spark, sf)),
      "chunks" -> (() => ext.TextOps.docChunks(spark, sf)),
      "lsh_incr" -> (() => ext.DedupOps.minhashLshIncremental(spark, sf)),
      "asof" -> (() => ext.EventOps.asofJoin(spark, sf)),
      "dup_spans" -> (() => ext.DedupOps.dupSpans(spark, sf)),
      "topk_rewrite" -> (() => pipelines.MicroQueries.topkRewrite(spark, sf)),
      "topk_global" -> (() => pipelines.MicroQueries.topkGlobal(spark, sf)),
      "paragraph_dedup_apply" ->
        (() => ext.ParaOps.paragraphDedupApply(spark, sf)),
      "url_filter" -> (() => ext.DomainOps.urlFilter(spark, sf)),
      "budget_select" -> (() => ext.SampleOps.budgetSelect(spark, sf)),
      "doc_novelty" -> (() => ext.CurationOps.docNovelty(spark, sf)),
      "freq_spectrum" -> (() => ext.TextOps.freqSpectrum(spark, sf)),
      "dsir_sample" -> (() => ext.SampleOps.dsirSample(spark, sf)),
      "temperature_mix" -> (() => ext.SampleOps.temperatureMix(spark, sf)),
      "wordpiece_encode" -> (() => ext.BpeOps.wordpieceEncode(spark, sf)),
      "unigram_encode" -> (() => ext.UnigramOps.unigramEncode(spark, sf)),
      "pref_pairs" -> (() => ext.PrefOps.prefPairs(spark, sf)),
      "source_winrate" -> (() => ext.PrefOps.sourceWinRate(spark, sf)),
      "source_bt" -> (() => ext.PrefOps.sourceBt(spark, sf)),
      "jsonl_roundtrip" -> (() => pipelines.JsonlRoundTrip(spark, sf)),
      "decon_bloom" -> (() => ext.CurationOps.decontaminateBloom(spark, sf)),
      "zorder_key" -> (() => pipelines.MicroQueries.zorderKey(spark, sf)),
      "band_join" -> (() => ext.EventOps.bandJoin(spark, sf)),
      "heavy_hitters" -> (() => ext.SketchOps.heavyHitters(spark, sf)),
      "ann_sq8" -> (() => ext.VectorOps.annIvfSq8(spark, sf)),
      "dedup_apply" -> (() => ext.DedupOps.dedupApply(spark, sf)),
      "vocab_build" -> (() => ext.TextOps.vocabBuild(spark, sf)),
      "bpe_encode" -> (() => ext.BpeOps.bpeEncode(spark, sf)),
      "mixture_repeat" -> (() => ext.SampleOps.mixtureRepeat(spark, sf)),
      "inverted_index" -> (() => ext.TextOps.invertedIndex(spark, sf)),
      "bm25" -> (() => ext.TextOps.bm25(spark, sf)),
      "contamination" -> (() => ext.CurationOps.contaminationScore(spark, sf)),
      "embed_project" -> (() => ext.VectorOps.embedProject(spark, sf)),
      "shard_assign" -> (() => ext.SampleOps.shardAssign(spark, sf)),
      "scd2_merge" -> (() => pipelines.MicroQueries.scd2Merge(spark, sf)),
      "collocations" -> (() => ext.TextOps.collocations(spark, sf)),
      "profile_orders" -> (() => pipelines.MicroQueries.profileOrders(spark, sf)),
      "video_neardup" -> (() => ext.MultimodalOps.videoNearDup(spark, sf)),
      "pagerank" -> (() => ext.GraphOps.pageRank(spark, sf)),
      "funnel" -> (() => ext.EventOps.funnel(spark, sf)),
      "retention" -> (() => ext.EventOps.retention(spark, sf)),
      "mad_outliers" -> (() => ext.EventOps.madOutliers(spark, sf)),
      "rrf_fusion" -> (() => ext.TextOps.rrfFusion(spark, sf)),
      "ngram_diversity" -> (() => ext.TextOps.ngramDiversity(spark, sf)),
      "edit_distance" -> (() => ext.DedupOps.editDistanceNearDup(spark, sf)),
      "expectations" -> (() => pipelines.MicroQueries.expectations(spark, sf)),
      "dedup_apply_best" -> (() => ext.DedupOps.dedupApplyBest(spark, sf)),
      "embed_moments" -> (() => ext.VectorOps.embedMoments(spark, sf)),
      "split_leakage" -> (() => ext.DedupOps.splitLeakage(spark, sf)),
      "oov_rate" -> (() => ext.TextOps.oovRate(spark, sf)),
      "source_diversity" -> (() => ext.SampleOps.sourceDiversity(spark, sf)),
      "daily_anomalies" -> (() => ext.EventOps.dailyAnomalies(spark, sf)),
      "weighted_sample" -> (() => ext.SampleOps.weightedSample(spark, sf)),
      "hard_negatives" -> (() => ext.VectorOps.hardNegatives(spark, sf)),
      "snapshot_diff" -> (() => pipelines.MicroQueries.snapshotDiff(spark, sf)),
      "pseudonymize" -> (() => ext.EventOps.pseudonymize(spark, sf)),
      "compression_ratio" -> (() => ext.BpeOps.compressionRatio(spark, sf)),
      "incremental_score" -> (() => pipelines.MicroQueries.incrementalScore(spark, sf)),
      "curriculum" -> (() => ext.SampleOps.curriculum(spark, sf)),
      "dataset_card" -> (() => ext.TextOps.datasetCard(spark, sf)),
      "rerank" -> (() => ext.ScoringOps.rerank(spark, sf)),
      "boilerplate" -> (() => ext.CurationOps.boilerplate(spark, sf)),
      "boilerplate_apply" -> (() => ext.CurationOps.boilerplateApply(spark, sf)),
      "line_boilerplate_apply" ->
        (() => ext.CurationOps.lineBoilerplateApply(spark, sf)),
      "gopher_rules" -> (() => ext.CurationOps.gopherRules(spark, sf)),
      "length_batches" -> (() => ext.CurationOps.lengthBatches(spark, sf)),
      "ngram_lm" -> (() => ext.LmOps.ngramLm(spark, sf)),
      "perplexity_buckets" -> (() => ext.LmOps.perplexityBuckets(spark, sf)),
      "dsir_weights" -> (() => ext.SampleOps.dsirWeights(spark, sf)),
      "domain_mixture" -> (() => ext.VectorOps.domainMixture(spark, sf)),
      "pack_tokens" -> (() => ext.BpeOps.packTokens(spark, sf)),
      "ann_ivf_pq" -> (() => ext.VectorOps.annIvfPq(spark, sf)),
      "corpus_drift" -> (() => pipelines.MicroQueries.corpusDrift(spark, sf)),
      "embed_expectations" ->
        (() => ext.VectorOps.embedExpectations(spark, sf)),
      "ingest_funnel" ->
        (() => streaming.EventStream.ingestFunnelStats(spark, sf)),
      "quality_classifier" ->
        (() => ext.ClassifierOps.qualityClassifier(spark, sf)),
      "quality_classifier_ref" ->
        (() => ext.ClassifierOps.qualityClassifierRef(spark, sf)),
      "lang_id_nb" -> (() => ext.ClassifierOps.langIdNb(spark, sf)),
      "bpe_train_merged" -> (() => ext.BpeOps.bpeTrainMerged(spark, sf)),
      "ann_ivf_merged" -> (() => ext.VectorOps.annIvfMerged(spark, sf)),
      "retrieval_eval" -> (() => ext.ScoringOps.retrievalEval(spark, sf)),
      "clusters_forgotten" ->
        (() => ext.DedupOps.dedupClustersForgotten(spark, sf)),
      "code_detect" -> (() => ext.CodeOps.codeDetect(spark, sf)),
      "embed_decontaminate" ->
        (() => ext.VectorOps.embedDecontaminate(spark, sf)),
      "bitext_mine" -> (() => ext.BitextOps.bitextMine(spark, sf)),
      "hll_distinct" -> (() => ext.SketchOps.hllDistinct(spark, sf)),
      "min_k_prob" -> (() => ext.LmOps.minKProb(spark, sf)),
      "classifier_pr" -> (() => ext.ClassifierOps.classifierPr(spark, sf)),
      "lsh_cost" -> (() => ext.DedupOps.lshCostCensus(spark, sf)),
      "kanon_release" -> (() => ext.GovernanceOps.kanonRelease(spark, sf)),
      "pca_project" -> (() => ext.VectorOps.pcaProject(spark, sf)),
      "embed_lsh_mp" -> (() => ext.VectorOps.embedLshMultiProbe(spark, sf)),
      "bitext_recall" -> (() => ext.BitextOps.bitextRecall(spark, sf)),
      "semantic_dedup_abtt" ->
        (() => ext.VectorOps.semanticDedupAbtt(spark, sf)),
      "hdr_quantiles" -> (() => ext.SketchOps.hdrQuantiles(spark, sf)),
      "embed_anisotropy" ->
        (() => ext.VectorOps.embedAnisotropy(spark, sf)))
    for ((n, mk) <- entries) {
      println(s"=== $n")
      val df =
        try mk()
        catch { case e: Throwable =>
          println(s"[plandump] $n failed: ${e.getMessage}"); null }
      if (df != null) println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("ReadSchema") || l.contains("Exchange") ||
          l.contains("Sort ["))
        .map(_.trim.take(200)).mkString("\n"))
    }
    spark.stop()
  }
}
