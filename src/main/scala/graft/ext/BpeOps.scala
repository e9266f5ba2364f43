package graft.ext

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.io.Fingerprint
import graft.ops.Canon

/** Distributed BPE merge training — the tokenizer-construction step of a
  * pre-training pipeline, as a Spark job with a full DuckDB oracle.
  *
  * Byte-pair encoding over the corpus WORD-FREQUENCY table (the standard
  * reduction: training never touches documents again once the word
  * multiset is counted): start from character symbols, then per round
  * count adjacent symbol pairs weighted by word frequency, merge the
  * most frequent pairs everywhere, repeat.
  *
  * BATCHED rounds — the axis that makes a real 32k-merge vocabulary
  * reachable: a classic one-merge-per-round loop needs `vocab` SEQUENTIAL
  * Spark jobs (32k rounds of scheduler latency — days, regardless of
  * data size). Instead each round ranks the top [[bpeCandidates]] pairs
  * by (freq DESC, a, b) and GREEDILY accepts every pair whose symbols
  * {a, b, ab} are disjoint from all higher-ranked accepted pairs'
  * symbols. Disjointness makes the batch NON-INTERACTING:
  *  - no two accepted pairs can match at overlapping positions (a match
  *    for (a,b) and one for (c,d) would have to share a symbol);
  *  - a merge never creates a new match for another accepted pair
  *    (merging replaces two symbols with one, so it never makes two
  *    surviving symbols newly adjacent, and the merged symbol `ab` is no
  *    accepted pair's operand — the conflict rule includes `ab`);
  * so applying the whole batch in ONE left-to-right pass equals applying
  * the pairs one-at-a-time in any order, and round count drops from
  * O(vocab) to O(vocab / accepts-per-round) — measured ~14 accepts per
  * round with C = 64 (1024 merges in 71 rounds on BpeScaleSpec's
  * large-vocabulary corpus).
  *
  * INCREMENTAL PAIR-COUNT MAINTENANCE — the second axis, which takes
  * per-round cost from O(corpus pairs) to O(affected pairs): the
  * (a, b) → count table is carried across rounds and only the delta
  * from words containing an accepted operand symbol is applied (old
  * adjacencies subtracted, post-merge adjacencies added — see
  * [[trainLoop]]). Measured wall for 64 / 256 / 1024 merges on the
  * same corpus: 7.2 / 7.2 / 18.3 s — 16× the merges for 2.5× the
  * wall, per-merge cost falling 113 → 18 ms as the affected-word set
  * shrinks with pair rarity.
  *
  * Scale shape, mirroring the trained-IVF k-means pattern:
  *  - the ONE corpus-sized pass is the word count (keyed agg, map-side
  *    combine); everything after runs on the word-frequency table —
  *    vocabulary-sized, not corpus-sized;
  *  - each round's driver sync is [[bpeCandidates]] rows (the ranked
  *    candidates) — the k-means C-centroids sync point, never the data;
  *  - merge application is a one-pass left-to-right scan per word (the
  *    compiled [[graft.functions.BpeMergeFold]] expression — two hash
  *    probes per position, batch-width-independent, whole-stage
  *    codegen'd). Greedy one-pass equals the oracle's per-pair
  *    replacement because of the non-interaction argument above;
  *    within one pair it equals FIRST-OCCURRENCE replacement semantics
  *    (identical-symbol runs: 'aaaaa' → [aa aa a]), argued in
  *    BpeOpsSpec;
  *  - trained merges are an INDEX (built once per dataset, memoized with
  *    a data fingerprint like the IVF centroids), so encoding never
  *    re-trains.
  *
  * The oracle regenerates the whole chain in SQL with [[bpeRounds]]
  * rounds unrolled. Words are DOUBLE-SPACE delimited symbol strings
  * (' a  b  c '): a pair pattern ' a  b ' then consumes exactly one
  * space from each boundary, so SQL `replace()` — left-to-right,
  * non-overlapping — reproduces the greedy fold EXACTLY, including
  * identical-symbol runs (' a  a  a  a  a ' → ' aa  aa  a '), and the
  * boundary invariant (two spaces between symbols, one at each end) is
  * preserved by the replacement ' ab '. This kills the recursive-CTE
  * fixpoint a single-space form would need (where consecutive matches
  * share one boundary space and global replace skips every second
  * overlapping occurrence).
  */
object BpeOps {

  /** Total merges trained (the vocabulary-growth budget). A corpus can
    * EXHAUST before the budget: once every remaining pair has been
    * merged (each word one symbol) the chain goes dry and both the
    * Spark loop and the oracle stop — the fixture's 31-word synthetic
    * vocabulary dries up at 89 merges, so the budget's full width is
    * exercised by BpeScaleSpec's large-vocabulary corpus instead.
    */
  val bpeMerges = 1024

  /** Max batch rounds (static — the oracle unrolls exactly this many;
    * the Spark loop stops early once [[bpeMerges]] merges are accepted
    * or the pair stream dries, which the oracle mirrors with its
    * cumulative-count cap / empty-candidate rounds). Sized to the
    * FIXTURE's exhaustion point (~12 rounds at 64-wide batches) plus
    * margin: rounds bound oracle size, not engine capability — both
    * sides stop at the same static cap, so a corpus needing more
    * rounds trains fewer merges but stays hash-equal, and the
    * unbounded path (trainLoop's maxRounds parameter) is exercised to
    * 1024+ merges by BpeScaleSpec's large-vocabulary corpus.
    */
  val bpeRounds = 16

  /** Candidate pairs ranked per round (the per-round driver-sync width). */
  val bpeCandidates = 64

  private def tokenWords(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.documents(spark, sfDir)
      .repartition(col("doc_id"))
      .select(explode(CurationOps.toksCol).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))

  /** Greedy rank-order batch selection: accept a candidate iff its
    * symbols {a, b, ab} are disjoint from every already-accepted pair's
    * symbols and the [[bpeMerges]] budget is not exhausted. Identical
    * logic to the oracle's sel-chain CTEs (which track the accepted
    * symbols as a space-delimited soup).
    */
  private[ext] def selectBatch(cands: Seq[(String, String, Long)],
                               remaining: Int)
      : Seq[(String, String, String, Long)] = {
    val out = Seq.newBuilder[(String, String, String, Long)]
    var used = Set.empty[String]
    var n = 0
    for ((a, b, pf) <- cands) {
      val ab = a + b
      if (n < remaining && !used(a) && !used(b) && !used(ab)) {
        out += ((a, b, ab, pf))
        used ++= Seq(a, b, ab)
        n += 1
      }
    }
    out.result()
  }

  /** One-pass greedy merge of a whole NON-INTERACTING batch over a
    * symbol array — left-to-right; at each position at most one accepted
    * pair can match (operand symbols are disjoint across the batch).
    *
    * RETIRED from the hot path in favor of the compiled
    * [[graft.functions.BpeMergeFold]] (this higher-order form runs
    * interpreted and its when-chain scales with batch width); kept as
    * the independently-derived twin the equivalence property in
    * BpeOpsSpec checks the native expression against.
    */
  private[ext] def mergeFoldBatch(sy: Column,
                                  pairs: Seq[(String, String, String)]): Column =
    aggregate(sy,
      array().cast("array<string>"),
      (acc, x) => {
        val matched = pairs.foldLeft(when(lit(false), acc)) {
          case (w, (a, b, ab)) =>
            w.when(size(acc) > 0 &&
                element_at(acc, -1) === a && x === b,
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(ab))))
        }
        matched.otherwise(concat(acc, array(x)))
      })

  /** Lineage truncation with DETERMINISTIC block release: materialize
    * the frame's row RDD via an EAGER `localCheckpoint` and rebuild a
    * LogicalRDD-backed frame over it. Each round's frame derives from
    * the last, so both the ANALYZED plan and the RDD DEPENDENCY CHAIN
    * grow per round — persist() alone truncates neither (a persisted
    * RDD still serializes its whole lineage into every task binary;
    * at the ~130 rounds a 1024-merge run takes, task deserialization
    * overflowed the stack), while localCheckpoint drops the
    * dependencies once materialized, keeping task size O(1) in rounds.
    * Its blocks bypass the CacheManager (`Dataset.unpersist` cannot
    * free them), which is why the RDD HANDLE is returned: the loop
    * releases each generation the moment the next one is materialized
    * — safe because a truncated generation is self-contained and never
    * re-read after its successor exists.
    *
    * CLUSTER CAVEAT: `localCheckpoint` trades fault tolerance for
    * speed — its blocks live only on the executors that computed them,
    * so losing an executor mid-training loses the generation with no
    * lineage to recompute it and the job fails (acceptable in
    * single-JVM local mode, where executor loss IS process death). On
    * a real cluster, set a checkpoint dir
    * (`sc.setCheckpointDir(...)`) and this method switches to a
    * RELIABLE checkpoint (HDFS/object-store backed): each generation
    * survives executor loss at the cost of one write per round —
    * O(merge-table) sized rows, not corpus-sized, so the premium is
    * small relative to the training scan. Spark never deletes reliable
    * checkpoint dirs on unpersist (only the opt-in
    * `spark.cleaner.referenceTracking.cleanCheckpoints` GC hook does,
    * non-deterministically), so [[release]] deletes the released
    * generation's dir explicitly — otherwise a long training loop
    * accumulates one directory per generation on the store.
    */
  private def truncated(df: DataFrame): (DataFrame, RDD[Row]) = {
    val sc = df.sparkSession.sparkContext
    val rdd = df.rdd
    rdd.persist(StorageLevel.MEMORY_AND_DISK)
    if (!sc.isLocal && sc.getCheckpointDir.isDefined) rdd.checkpoint()
    else rdd.localCheckpoint()
    rdd.count()
    (df.sparkSession.createDataFrame(rdd, df.schema), rdd)
  }

  /** Frees a retired generation: drop its cached blocks, and — on the
    * reliable-checkpoint path — delete its checkpoint directory (local
    * checkpoints report no file; the delete is a no-op there). Callers
    * only release a generation AFTER its successor has materialized,
    * so the deleted data is never re-read.
    */
  private def release(rdd: RDD[Row]): Unit = {
    rdd.unpersist(false)
    rdd.getCheckpointFile.foreach { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(rdd.sparkContext.hadoopConfiguration)
        .delete(p, true)
      ()
    }
  }

  /** Trained merges are a per-dataset artifact, like IVF centroids: the
    * cache key folds in a source fingerprint so regenerated data cannot
    * be served stale merges. The cached value is ≤ [[bpeMerges]] rows:
    * (merge_idx, batch_round, a, b, ab, pair_freq).
    */
  private val mergeCache = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[(Int, Int, String, String, String, Long)]]

  /** Memoized training. `words` lets a caller that ALREADY materialized
    * the word-frequency table (bpeEncode) share it on a cache miss —
    * training and encoding together still make one corpus-sized pass.
    * Duplicate concurrent training of the same key is tolerated (it is
    * deterministic; last write wins) rather than holding a map lock for
    * the whole multi-job loop the way computeIfAbsent would.
    */
  private[ext] def trainedMerges(spark: SparkSession, sfDir: String,
                                 words: Option[DataFrame] = None)
      : Seq[(Int, Int, String, String, String, Long)] = {
    import spark.implicits._
    val fp = Fingerprint.ofPath(s"$sfDir/documents.parquet")
    val key = s"$sfDir#$bpeMerges#$bpeRounds#$bpeCandidates#$fp"
    Option(mergeCache.get(key)).getOrElse {
      // disk tier beneath the JVM memo: the trained tokenizer is a
      // persisted, SUCCESS-gated, fingerprint-stamped artifact (the
      // LSH/IVF index contract) — a NEW JVM reloads instead of
      // retraining; BpePersistSpec pins reload ≡ retrain
      val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_").replaceAll("^_+", "")
      val dir = s"${graft.io.Artifacts.root}/bpe_index/" +
        s"${tag}_m${bpeMerges}_r${bpeRounds}_c${bpeCandidates}_$fp/merges"
      if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
        val trained = trainLoop(spark,
          words.getOrElse(tokenWords(spark, sfDir)))
        spark.createDataset(trained)
          .toDF("merge_idx", "batch_round", "a", "b", "ab", "pair_freq")
          .coalesce(1).write.mode("overwrite").parquet(dir)
      }
      val loaded = spark.read.parquet(dir)
        .as[(Int, Int, String, String, String, Long)]
        .collect().toSeq.sortBy(_._1)
      mergeCache.put(key, loaded)
      loaded
    }
  }

  /** TEST HOOK: drop the JVM memo (simulated restart for BpePersistSpec). */
  private[ext] def clearMemos(): Unit = mergeCache.clear()

  /** Adjacent-pair occurrences of a (w, sy, f) frame, one row per
    * occurrence weighted `sign`·f — the delta-stream form; the +1 case
    * grouped by (a, b) is the classic pair-count table.
    */
  private def adjacencies(df: DataFrame, sign: Int): DataFrame =
    df.select(posexplode(col("sy")).as(Seq("i", "a")), col("sy"), col("f"))
      .filter(col("i") < size(col("sy")) - 1)
      .select(col("a"), element_at(col("sy"), col("i") + 2).as("b"),
        (col("f") * sign).as("pf"))

  /** The per-round pair-count table, maintained INCREMENTALLY — the
    * change that takes round cost from O(corpus pairs) to O(affected
    * pairs) and makes a ≥1k-merge vocabulary trainable:
    *
    * instead of re-deriving pair counts from the whole word table every
    * round, the table carries over and only the DELTA from words that
    * actually contain an accepted pair's operand symbols is applied —
    * their old adjacencies subtracted, their post-merge adjacencies
    * added, zero rows dropped (the LmOps.lmIndexForget subtraction
    * algebra, applied per training round). Merging (a,b)→ab inside
    * `… x a b y …` only ever touches pairs adjacent to the merge site
    * ((a,b) itself, (x,a)→(x,ab), (b,y)→(ab,y)), so the delta stream is
    * merge-site-sized while the full recount is corpus-sized — and the
    * affected-word prefilter (`arrays_overlap` on the batch's operand
    * symbols) shrinks every round as pairs get rarer. Equality with the
    * from-scratch recount after every round is property-pinned in
    * BpeOpsSpec.
    */
  private[graft] def trainLoop(spark: SparkSession, words: DataFrame,
                             budget: Int = bpeMerges,
                             maxRounds: Int = bpeRounds,
                             candWidth: Int = bpeCandidates,
                             symbolize: Column => Column = split(_, ""))
      : Seq[(Int, Int, String, String, String, Long)] = {
    import spark.implicits._
    var (corpus, blocks) = truncated(
      words.select(col("w"), symbolize(col("w")).as("sy"), col("f")))
    var (pairs, pBlocks) = truncated(
      adjacencies(corpus, 1).groupBy("a", "b").agg(sum("pf").as("pf")))
    val merges = Seq.newBuilder[(Int, Int, String, String, String, Long)]
    var total = 0
    var round = 0
    var dry = false
    while (round < maxRounds && total < budget && !dry) {
      val cands = pairs
        .orderBy(col("pf").desc, col("a").asc, col("b").asc)
        .limit(candWidth) // C driver-sync rows per round, like k-means
        .as[(String, String, Long)].collect().toSeq
      if (cands.isEmpty) dry = true // pairs ran dry: chain stops
      else {
        val accepted = selectBatch(cands, budget - total)
        accepted.zipWithIndex.foreach { case ((a, b, ab, pf), slot) =>
          merges += ((total + slot, round, a, b, ab, pf))
        }
        val ops = accepted.flatMap(t => Seq(t._1, t._2)).distinct
        val hit = arrays_overlap(col("sy"), array(ops.map(lit): _*))
        val foldC = graft.functions.BpeMergeFold(col("sy"),
          accepted.map(t => (t._1, t._2, t._3)))
        val affected = corpus.filter(hit)
        val delta = adjacencies(affected, -1)
          .union(adjacencies(
            affected.select(col("w"), foldC.as("sy"), col("f")), 1))
        val (nextPairs, nextPBlocks) = truncated(
          pairs.union(delta).groupBy("a", "b").agg(sum("pf").as("pf"))
            .filter(col("pf") > 0))
        val (next, nextBlocks) = truncated(
          corpus.select(col("w"),
            when(hit, foldC).otherwise(col("sy")).as("sy"), col("f")))
        release(blocks); release(pBlocks)
        corpus = next; blocks = nextBlocks
        pairs = nextPairs; pBlocks = nextPBlocks
        total += accepted.size
        round += 1
      }
    }
    release(blocks); release(pBlocks)
    merges.result()
  }

  /** Trains up to [[bpeMerges]] merges in [[bpeRounds]] batched rounds;
    * one row per merge: (merge_idx — the global order a sequential
    * trainer would apply them in, batch_round, a, b, ab, pair_freq).
    */
  def bpeTrain(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Canon.canonicalize(
      trainedMerges(spark, sfDir)
        .toDF("merge_idx", "batch_round", "a", "b", "ab", "pair_freq"))
  }

  // ---- byte-level arm (the GPT-2 construction) ------------------------

  /** UTF-8 BYTE symbolization: each byte of the word as a
    * two-uppercase-hex-digit atom (the cross-engine-stable stand-in
    * for GPT-2's byte↔printable-unicode bijection — both `hex()`s emit
    * identical uppercase hex of the UTF-8 bytes, and hex atoms are
    * ASCII so the candidate tie-break collates identically). Starting
    * from bytes instead of characters makes EVERY string coverable
    * with zero UNK before any fallback: the 256 possible atoms are the
    * whole alphabet, merges only ever concatenate them, and
    * `unhex(concat(symbols))` losslessly reconstructs the word
    * (BpeBytesSpec round-trips Greek/CJK/astral fixtures).
    */
  private[ext] def byteSymbols(w: Column): Column =
    regexp_extract_all(hex(w), lit(".."), lit(0))

  /** [[trainedMerges]]' byte-arm twin: same memo + SUCCESS-gated disk
    * tier, own artifact dir (byte and char merges are different
    * vocabularies over the same corpus).
    */
  private[ext] def trainedByteMerges(spark: SparkSession, sfDir: String,
                                     words: Option[DataFrame] = None)
      : Seq[(Int, Int, String, String, String, Long)] = {
    import spark.implicits._
    val fp = Fingerprint.ofPath(s"$sfDir/documents.parquet")
    val key = s"bytes#$sfDir#$bpeMerges#$bpeRounds#$bpeCandidates#$fp"
    Option(mergeCache.get(key)).getOrElse {
      val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_").replaceAll("^_+", "")
      val dir = s"${graft.io.Artifacts.root}/bpe_index/" +
        s"${tag}_bytes_m${bpeMerges}_r${bpeRounds}_c${bpeCandidates}_$fp" +
        "/merges"
      if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
        val trained = trainLoop(spark,
          words.getOrElse(tokenWords(spark, sfDir)),
          symbolize = byteSymbols)
        spark.createDataset(trained)
          .toDF("merge_idx", "batch_round", "a", "b", "ab", "pair_freq")
          .coalesce(1).write.mode("overwrite").parquet(dir)
      }
      val loaded = spark.read.parquet(dir)
        .as[(Int, Int, String, String, String, Long)]
        .collect().toSeq.sortBy(_._1)
      mergeCache.put(key, loaded)
      loaded
    }
  }

  /** BYTE-LEVEL BPE training — the fourth tokenizer arm: the same
    * batched-greedy trainer ([[trainLoop]]) run over UTF-8 byte atoms
    * instead of characters, so the vocabulary it grows can cover any
    * script with zero UNK (what GPT-2-style tokenizers guarantee by
    * construction, vs the WordPiece byte-escape FALLBACK which punts
    * unmatched positions). Same output contract as [[bpeTrain]].
    */
  def bpeBytesTrain(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Canon.canonicalize(
      trainedByteMerges(spark, sfDir)
        .toDF("merge_idx", "batch_round", "a", "b", "ab", "pair_freq"))
  }

  /** Per-doc byte-BPE encode telemetry: word count, raw UTF-8 byte
    * count, and byte-BPE token count under the trained byte merges —
    * [[bpeEncode]]'s byte-arm twin (n_bytes is the zero-merge
    * baseline, so n_bytes − n_bpe_tokens is exactly the compression
    * the learned merges buy).
    */
  def bpeBytesEncode(spark: SparkSession, sfDir: String): DataFrame = {
    val words = tokenWords(spark, sfDir).persist()
    val merges = trainedByteMerges(spark, sfDir, Some(words))
    val rounds = merges.groupBy(_._2).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._1).map(m => (m._3, m._4, m._5)))
    val folded = rounds.foldLeft(byteSymbols(col("w"))) { (sy, pairs) =>
      graft.functions.BpeMergeFold(sy, pairs)
    }
    val wordLen = words.select(col("w"),
      octet_length(col("w")).cast("long").as("n_b"),
      size(folded).cast("long").as("n_sym"))
    val docTokens = TextOps.documents(spark, sfDir)
      .repartition(col("doc_id"))
      .select(col("doc_id"), explode(CurationOps.toksCol).as("w"))
    val out = TextOps.documents(spark, sfDir).select("doc_id")
      .join(docTokens
          .join(broadcast(wordLen), Seq("w"))
          .groupBy("doc_id").agg(
            count(lit(1)).as("n_words"),
            sum("n_b").as("n_bytes"),
            sum("n_sym").as("n_bpe_tokens")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_bytes"), lit(0L)).as("n_bytes"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
    Canon.materialized(Canon.canonicalize(out), words)
  }

  // ---- merge/forget lifecycle (word-count algebra + retrain) ----------

  /** Word-frequency counts of an EXPLICIT (doc_id, …, text) frame — the
    * lifecycle's unit of account. Word counts are ADDITIVE across
    * disjoint document sets (and subtractive for deletions), which is
    * what makes the BPE artifact lifecycle EXACT: the corpus-sized pass
    * runs only over the batch, and retraining from an identical word
    * table is deterministic, so merged/forgotten ≡ rebuilt holds
    * bit-for-bit (unlike centroid codebooks, where removing a vector's
    * influence has no closed form — see VectorOps' frozen-codebook
    * documentation).
    */
  private def wordCounts(docs: DataFrame): DataFrame =
    docs.repartition(col("doc_id"))
      .select(explode(CurationOps.toksCol).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))

  private def lifecycleDone(dir: String): Boolean =
    Seq("words", "merges").forall(t =>
      new java.io.File(s"$dir/$t/_SUCCESS").exists())

  /** The lifecycle's BASE corpus: even doc_ids. The odd half arrives
    * later as the merge batch, so base ∪ batch = the whole fixture —
    * which is why [[bpeTrainMerged]] can share [[bpeTrainOracle]].
    */
  private def baseHalf(spark: SparkSession, sfDir: String): DataFrame =
    inBaseSlice(TextOps.documents(spark, sfDir))

  /** Membership predicate of the persisted index's ingest population
    * (the [[bpeIndex]] build slice), owned beside the builder so the
    * takedown coordinator's clip ([[GovernanceOps.takedownSweep]])
    * can never drift from the build — subtractive word-ledger forgets
    * are only exact for documents the ledger actually counted.
    */
  private[ext] def inBaseSlice(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 2 === 0)

  /** SQL twin of [[inBaseSlice]] for never-existed oracles. */
  private[ext] val baseSliceSql: String = "doc_id % 2 = 0"

  private def oddHalf(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.documents(spark, sfDir).filter(col("doc_id") % 2 === 1)

  private def lifecycleDir(sfDir: String): String = {
    val fp = Fingerprint.ofPath(s"$sfDir/documents.parquet")
    val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_").replaceAll("^_+", "")
    s"${graft.io.Artifacts.root}/bpe_index/" +
      s"${tag}_base2_m${bpeMerges}_r${bpeRounds}_c${bpeCandidates}_$fp"
  }

  private def writeIndex(spark: SparkSession, dir: String,
                         words: DataFrame): Unit = {
    import spark.implicits._
    words.write.mode("overwrite").parquet(s"$dir/words")
    val persisted = spark.read.parquet(s"$dir/words")
    spark.createDataset(trainLoop(spark, persisted))
      .toDF("merge_idx", "batch_round", "a", "b", "ab", "pair_freq")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/merges")
  }

  /** Build (or SUCCESS-gated reuse) the base-half BPE index: the word
    * table AND the merges trained from it, both persisted — the word
    * table is the merge/forget ledger, the merges are the artifact
    * consumers read.
    */
  def bpeIndex(spark: SparkSession, sfDir: String): String = synchronized {
    val dir = lifecycleDir(sfDir)
    if (!lifecycleDone(dir))
      writeIndex(spark, dir, wordCounts(baseHalf(spark, sfDir)))
    dir
  }

  /** MERGE a document batch into a persisted BPE index: batch word
    * counts ADD to the stored word table (the base corpus is never
    * re-tokenized — the LmOps count algebra), and the merges RETRAIN
    * from the summed table (the verdict-sanctioned retrain-on-merge:
    * training is vocabulary-sized and, with incremental pair
    * maintenance, seconds — the corpus-sized pass is what the ledger
    * avoids). Writes a NEW stamped `…_m_<tag>` dir; merged ≡ a
    * from-scratch build over base ∪ batch EXACTLY (identical word
    * table, deterministic trainer — BpeLifecycleSpec pins it).
    */
  def bpeIndexMerge(spark: SparkSession, sfDir: String,
                    batchDocs: DataFrame, batchTag: String): String =
    synchronized {
      require(batchTag.matches("[A-Za-z0-9_-]+"),
        s"batchTag must be path-safe, got '$batchTag'")
      val base = bpeIndex(spark, sfDir)
      val dir = s"${base}_m_$batchTag"
      if (!lifecycleDone(dir)) {
        val merged = spark.read.parquet(s"$base/words")
          .union(wordCounts(batchDocs))
          .groupBy("w").agg(sum("f").as("f"))
        writeIndex(spark, dir, merged)
      }
      dir
    }

  /** FORGET a document batch from a persisted BPE index: the forgotten
    * docs' word counts SUBTRACT from the stored ledger (zero rows
    * dropped — re-derived from the forgotten text, the base corpus
    * never re-read) and the merges retrain. `…_f_<tag>` dir; forgotten
    * ≡ a build that never saw those documents, exactly.
    */
  def bpeIndexForget(spark: SparkSession, baseDir: String,
                     forgetDocs: DataFrame, tag: String): String =
    synchronized {
      require(tag.matches("[A-Za-z0-9_-]+"),
        s"tag must be path-safe, got '$tag'")
      val dir = s"${baseDir}_f_$tag"
      if (!lifecycleDone(dir)) {
        val remaining = spark.read.parquet(s"$baseDir/words")
          .union(wordCounts(forgetDocs)
            .select(col("w"), (-col("f")).as("f")))
          .groupBy("w").agg(sum("f").as("f"))
          .filter(col("f") > 0)
        writeIndex(spark, dir, remaining)
      }
      dir
    }

  /** The merge lifecycle as one query: base index on the even half,
    * MERGE the odd half in, report the retrained merges — which must
    * equal training on the whole fixture (summed ledger ≡ full count),
    * so it SHARES [[bpeTrainOracle]].
    */
  def bpeTrainMerged(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dir = bpeIndexMerge(spark, sfDir, oddHalf(spark, sfDir), "oddhalf")
    Canon.canonicalize(spark.read.parquet(s"$dir/merges")
      .as[(Int, Int, String, String, String, Long)].collect().toSeq
      .sortBy(_._1)
      .toDF("merge_idx", "batch_round", "a", "b", "ab", "pair_freq"))
  }

  /** The forget ROUND TRIP: merge the odd half in, then forget it —
    * the retrained merges must equal a build that only ever saw the
    * even half, which is what the slice-restricted oracle states.
    */
  def bpeTrainForgotten(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val merged = bpeIndexMerge(spark, sfDir, oddHalf(spark, sfDir), "oddhalf")
    val dir = bpeIndexForget(spark, merged, oddHalf(spark, sfDir), "oddhalf")
    Canon.canonicalize(spark.read.parquet(s"$dir/merges")
      .as[(Int, Int, String, String, String, Long)].collect().toSeq
      .sortBy(_._1)
      .toDF("merge_idx", "batch_round", "a", "b", "ab", "pair_freq"))
  }

  /** APPLIES the trained merges: per-document BPE token counts — the
    * real tokenizer-based counting beside TextOps' regex estimate, and
    * the train → encode loop closed. Encoding needs only the final
    * word → segment-count map (BPE segmentations are word-local): with
    * the merges known (memoized index), the segmentation re-applies the
    * per-round batch folds over the word table — vocabulary-sized work,
    * as ONE projection of nested compiled [[graft.functions
    * .BpeMergeFold]] passes (rounds must apply in order — a later
    * round's operands are earlier rounds' outputs — but each pass is a
    * cheap compiled scan, so even a ≥1k-merge table is a single
    * codegen'd stage, no per-chunk materializations) — and the corpus
    * side is one explode plus a broadcast join against the
    * vocabulary-sized length table.
    */
  def bpeEncode(spark: SparkSession, sfDir: String): DataFrame = {
    // the word table is shared with training on a cache miss, so the
    // corpus-sized explode+count runs ONCE either way
    val words = tokenWords(spark, sfDir).persist()
    val merges = trainedMerges(spark, sfDir, Some(words))
    val rounds = merges.groupBy(_._2).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._1).map(m => (m._3, m._4, m._5)))
    val folded = rounds.foldLeft(split(col("w"), "")) { (sy, pairs) =>
      graft.functions.BpeMergeFold(sy, pairs)
    }
    val wordLen = words.select(col("w"), size(folded).as("n_sym"))
    val docTokens = TextOps.documents(spark, sfDir)
      .repartition(col("doc_id"))
      .select(col("doc_id"), explode(CurationOps.toksCol).as("w"))
    val out = TextOps.documents(spark, sfDir).select("doc_id")
      .join(docTokens
          .join(broadcast(wordLen), Seq("w"))
          .groupBy("doc_id").agg(
            count(lit(1)).as("n_words"),
            sum("n_sym").as("n_bpe_tokens")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
    Canon.materialized(Canon.canonicalize(out), words)
  }

  // ---- oracle SQL ------------------------------------------------------

  /** Cumulative accepted-merge count before round `r` (a static sum of
    * the previous rounds' acc tables — all MATERIALIZED, so each count
    * is a scan of ≤ [[bpeCandidates]] rows).
    */
  private def cumExpr(r: Int): String =
    if (r == 0) "0"
    else (0 until r).map(j => s"(SELECT count(*) FROM acc$j)")
      .mkString(" + ")

  /** One round's CTE block:
    *  - p$r: adjacent-pair counts of corpus c$r (double-space form split
    *    back to a symbol list);
    *  - k$r: the top-[[bpeCandidates]] candidates, ranked;
    *  - sel$r: the greedy selection chain as ONE RECURSIVE CTE stepping
    *    rank k-1 → k, threading (accepted-symbol soup, accept count);
    *    condition mirrors [[selectBatch]] exactly. (A per-slot CTE chain
    *    here — the pre-1k-merge form — put C CTEs per round in the WITH
    *    list; at 48 rounds × 64 candidates DuckDB's binder choked on
    *    the 3300-CTE statement, and the recursion is the same left fold
    *    with one CTE per round);
    *  - acc$r: the accepted pairs with their within-round slot
    *    (recovered as the n-step between consecutive selection states);
    *  - c${r+1}: the corpus with every accepted pair applied — C slot
    *    `replace()`s nested in one expression, one materialized CTE per
    *    round (order-independent by the non-interaction argument;
    *    `replace` is left-to-right non-overlapping ≡ the Spark fold
    *    under the double-space delimiting).
    */
  private def roundCtes(r: Int): String = {
    val C = bpeCandidates
    def cond =
      s"""x.a IS NOT NULL AND s.n + t.tot < $bpeMerges
         |        AND strpos(s.syms, ' ' || x.a || ' ') = 0
         |        AND strpos(s.syms, ' ' || x.b || ' ') = 0
         |        AND strpos(s.syms, ' ' || x.ab || ' ') = 0""".stripMargin
    val sels =
      s"""sel$r AS (
         |  SELECT 0 AS k, ' ' AS syms, 0 AS n
         |  UNION ALL
         |  SELECT s.k + 1,
         |         CASE WHEN $cond
         |         THEN s.syms || x.a || ' ' || x.b || ' ' || x.ab || ' '
         |         ELSE s.syms END AS syms,
         |         s.n + CASE WHEN $cond
         |               THEN 1 ELSE 0 END AS n
         |  FROM sel$r s CROSS JOIN tot$r t
         |  LEFT JOIN k$r x ON x.rk = s.k + 1
         |  WHERE s.k < $C)""".stripMargin
    val accArms =
      s"""  SELECT x.a, x.b, x.ab, x.pf, s1.n AS slot
         |  FROM k$r x
         |  JOIN sel$r s0 ON s0.k = x.rk - 1
         |  JOIN sel$r s1 ON s1.k = x.rk
         |  WHERE s1.n > s0.n""".stripMargin
    // Batch application as a second recursive CTE stepping slot k-1 → k
    // over the whole corpus (an identity step when slot k accepted
    // nothing). Earlier forms — C materialized CTEs per round, then C
    // nested replace() calls with two scalar subqueries per level —
    // both made DuckDB's binder superlinear in rounds × C (the 48×64
    // variant could not even EXPLAIN in five minutes); the recursion
    // keeps one CTE and two expressions per round regardless of C.
    val applied =
      s"""ap$r AS (
         |  SELECT 0 AS k, w, s, f FROM c$r
         |  UNION ALL
         |  SELECT a.k + 1, a.w,
         |         CASE WHEN x.slot IS NULL THEN a.s
         |              ELSE replace(a.s, ' ' || x.a || '  ' || x.b || ' ',
         |                           ' ' || x.ab || ' ') END,
         |         a.f
         |  FROM ap$r a LEFT JOIN acc$r x ON x.slot = a.k + 1
         |  WHERE a.k < $C),
         |c${r + 1} AS MATERIALIZED (
         |  SELECT w, s, f FROM ap$r WHERE k = $C)""".stripMargin
    s"""p$r AS (
       |  SELECT sy[i] AS a, sy[i+1] AS b, sum(f) AS pf
       |  FROM (SELECT list_filter(string_split(s, ' '), x -> x <> '') AS sy,
       |               f FROM c$r),
       |       unnest(range(1, len(sy))) AS t(i)
       |  GROUP BY 1, 2),
       |k$r AS MATERIALIZED (
       |  SELECT a, b, a || b AS ab, pf,
       |         row_number() OVER (ORDER BY pf DESC, a ASC, b ASC) AS rk
       |  FROM (SELECT * FROM p$r ORDER BY pf DESC, a ASC, b ASC
       |        LIMIT $bpeCandidates)),
       |tot$r AS MATERIALIZED (SELECT ${cumExpr(r)} AS tot),
       |$sels,
       |acc$r AS MATERIALIZED (
       |$accArms),
       |$applied""".stripMargin
  }

  /** The shared oracle CTE chain (w0 … c[[bpeRounds]] plus each round's
    * acc$r), composed by the three oracles — never spliced textually.
    *
    * Multiply-referenced CTEs are AS MATERIALIZED: DuckDB otherwise
    * INLINES a CTE per reference, and with each round referencing the
    * previous corpus repeatedly the chain re-evaluates exponentially
    * (measured 12+ min vs sub-second at sf0.01 on the 8-round
    * predecessor of this oracle).
    */
  // a DEF (interpolated by vals declared at various points — the
  // TextOps.normSql init-order discipline); `docCond` narrows the
  // training corpus (the forget oracle's base-half restriction)
  // `symSql` is the initial symbolization (a SQL list expression over
  // `w`): characters for the classic arm, UTF-8 hex-byte pairs for the
  // byte arm — the ONLY thing the two chains differ in.
  private def oracleChainCtesFor(docCond: String,
                                 symSql: String = "string_split(w, '')")
      : String =
    s"""w0 AS MATERIALIZED (
       |  SELECT w, count(*) AS f FROM (
       |    SELECT unnest(${CurationOps.toksSql}) AS w FROM documents
       |    WHERE $docCond)
       |  GROUP BY 1),
       |c0 AS MATERIALIZED (
       |  SELECT w, ' ' || array_to_string($symSql, '  ') || ' '
       |           AS s, f
       |  FROM w0),
       |${(0 until bpeRounds).map(roundCtes).mkString(",\n")}""".stripMargin

  private val oracleChainCtes: String = oracleChainCtesFor("TRUE")

  /** The byte-arm chain: identical round machinery, hex-pair init
    * (both engines' hex() = uppercase hex of the UTF-8 bytes).
    */
  private def oracleChainCtesBytes: String =
    oracleChainCtesFor("TRUE", "regexp_extract_all(hex(w), '..')")

  /** The merge-report SELECT over the unrolled rounds' acc tables. */
  private def trainSelectTail: String =
    s"""SELECT * FROM (
       |  ${(0 until bpeRounds)
        .map(r => s"SELECT CAST(t.tot + x.slot - 1 AS BIGINT) AS merge_idx, " +
          s"CAST($r AS BIGINT) AS batch_round, x.a, x.b, x.ab, " +
          s"CAST(x.pf AS BIGINT) AS pair_freq FROM acc$r x CROSS JOIN tot$r t")
        .mkString("\n  UNION ALL ")})""".stripMargin

  /** The full training chain in SQL, batch rounds unrolled. */
  val bpeTrainOracle: String =
    s"""WITH RECURSIVE
       |$oracleChainCtes
       |$trainSelectTail""".stripMargin

  /** [[bpeTrainOracle]] narrowed to the even-doc base half — the
    * from-scratch statement of what the forget round trip must
    * produce (the [[graft.ext.LmOps.ngramLmForgottenOracle]] pattern).
    */
  val bpeTrainForgottenOracle: String =
    s"""WITH RECURSIVE
       |${oracleChainCtesFor("doc_id % 2 = 0")}
       |$trainSelectTail""".stripMargin

  /** The encode tail (word → symbol count, corpus probe, per-doc agg),
    * shared by the encode oracle and the compression-ratio rollup.
    */
  private val encodeCtes: String =
    s"""wl AS (
       |  SELECT w, len(list_filter(string_split(s, ' '), x -> x <> ''))
       |           AS n_sym
       |  FROM c$bpeRounds),
       |dt AS (
       |  SELECT doc_id, unnest(${CurationOps.toksSql}) AS w
       |  FROM documents),
       |agg AS (
       |  SELECT doc_id, count(*) AS n_words, sum(n_sym) AS n_bpe
       |  FROM dt JOIN wl USING (w) GROUP BY 1)""".stripMargin

  val bpeEncodeOracle: String =
    s"""WITH RECURSIVE
       |$oracleChainCtes,
       |$encodeCtes
       |SELECT documents.doc_id,
       |  CAST(coalesce(n_words, 0) AS BIGINT) AS n_words,
       |  CAST(coalesce(n_bpe, 0) AS BIGINT) AS n_bpe_tokens
       |FROM documents LEFT JOIN agg USING (doc_id)""".stripMargin

  /** The byte-arm training chain in SQL — [[bpeTrainOracle]] with the
    * hex-pair init.
    */
  def bpeBytesTrainOracle: String =
    s"""WITH RECURSIVE
       |$oracleChainCtesBytes
       |$trainSelectTail""".stripMargin

  /** Byte-arm encode oracle: adds the raw byte count (`strlen` = UTF-8
    * octets in DuckDB, `octet_length` on the Spark side).
    */
  def bpeBytesEncodeOracle: String =
    s"""WITH RECURSIVE
       |$oracleChainCtesBytes,
       |wl AS (
       |  SELECT w, CAST(strlen(w) AS BIGINT) AS n_b,
       |         len(list_filter(string_split(s, ' '), x -> x <> ''))
       |           AS n_sym
       |  FROM c$bpeRounds),
       |dt AS (
       |  SELECT doc_id, unnest(${CurationOps.toksSql}) AS w
       |  FROM documents),
       |agg AS (
       |  SELECT doc_id, count(*) AS n_words, sum(n_b) AS n_bytes,
       |         sum(n_sym) AS n_bpe
       |  FROM dt JOIN wl USING (w) GROUP BY 1)
       |SELECT documents.doc_id,
       |  CAST(coalesce(n_words, 0) AS BIGINT) AS n_words,
       |  CAST(coalesce(n_bytes, 0) AS BIGINT) AS n_bytes,
       |  CAST(coalesce(n_bpe, 0) AS BIGINT) AS n_bpe_tokens
       |FROM documents LEFT JOIN agg USING (doc_id)""".stripMargin

  /** Tokenizer-efficiency telemetry: per-language chars-per-BPE-token
    * under the trained merges — the fertility number read before
    * accepting a tokenizer (a language compressing at 1.8 chars/token
    * against English's 3.5 pays ~2× the sequence length for the same
    * text, and its context windows are half as big in practice).
    *
    * Scale shape: one rollup over [[bpeEncode]]'s per-doc output joined
    * to the doc dimension — the encode chain (already one corpus pass +
    * broadcast probe) dominates; this adds a doc-keyed join and a
    * lang-keyed agg of doc-count-sized data.
    */
  def compressionRatio(spark: SparkSession, sfDir: String): DataFrame = {
    val enc = bpeEncode(spark, sfDir)
    val docs = TextOps.documents(spark, sfDir)
      .select("doc_id", "lang", "n_chars")
    Canon.canonicalize(enc.join(docs, Seq("doc_id"))
      .groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"),
        sum("n_bpe_tokens").as("sum_bpe_tokens"))
      .select(col("lang"), col("n_docs"), col("sum_chars"),
        col("sum_bpe_tokens"),
        (col("sum_chars").cast("double") /
          greatest(col("sum_bpe_tokens").cast("double"), lit(1.0)))
          .as("chars_per_token")))
  }

  val compressionRatioOracle: String =
    s"""WITH RECURSIVE
       |$oracleChainCtes,
       |$encodeCtes
       |SELECT d.lang, count(*) AS n_docs,
       |  CAST(sum(d.n_chars) AS BIGINT) AS sum_chars,
       |  CAST(sum(coalesce(agg.n_bpe, 0)) AS BIGINT) AS sum_bpe_tokens,
       |  CAST(sum(d.n_chars) AS DOUBLE) /
       |    greatest(CAST(sum(coalesce(agg.n_bpe, 0)) AS DOUBLE), 1.0)
       |    AS chars_per_token
       |FROM documents d LEFT JOIN agg USING (doc_id)
       |GROUP BY d.lang""".stripMargin

  // ---- token-exact sequence packing ------------------------------------

  /** TOKEN-EXACT sequence packing: [[graft.ext.CurationOps
    * .packSequences]]'s greedy first-fit bins, but budgeted in TRAINED
    * BPE TOKENS instead of whitespace words — what the training loader
    * actually packs by. A language that compresses poorly (see
    * [[compressionRatio]]) fills its bins in fewer documents here,
    * which the word-budget version cannot see.
    *
    * Scale shape: the encode chain dominates (one corpus pass +
    * vocabulary-sized probe, amortized by the merge cache when train/
    * encode/pack run in one session); packing adds the same
    * (lang, shard)-keyed windows as packSequences — shard count bounds
    * every partition, raise [[CurationOps.packShards]] with corpus size
    * and the plan is unchanged.
    */
  def packTokens(spark: SparkSession, sfDir: String): DataFrame = {
    import CurationOps.{packBudgetTokens, packShards}
    val enc = bpeEncode(spark, sfDir)
      .select(col("doc_id"), col("n_bpe_tokens"))
    val d = TextOps.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"))
      .join(enc, Seq("doc_id"))
      .withColumn("shard", col("doc_id") % packShards)
    val byShard = Window.partitionBy("lang", "shard").orderBy("doc_id")
    val packed = d
      .withColumn("start_tok",
        coalesce(sum("n_bpe_tokens").over(
          byShard.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("bin", expr(s"start_tok div $packBudgetTokens"))
      .withColumn("pack_id",
        concat_ws("#", col("lang"), col("shard"), col("bin")))
    val byPack = Window.partitionBy("lang", "shard", "bin")
    Canon.canonicalize(packed
      .withColumn("pack_pos", row_number().over(byPack.orderBy("doc_id")))
      .withColumn("pack_tokens", sum("n_bpe_tokens").over(byPack))
      .select("doc_id", "lang", "n_bpe_tokens", "pack_id", "pack_pos",
        "pack_tokens"))
  }

  val packTokensOracle: String = {
    import CurationOps.{packBudgetTokens, packShards}
    s"""WITH RECURSIVE
       |$oracleChainCtes,
       |$encodeCtes,
       |pk AS (
       |  SELECT d.doc_id, d.lang,
       |         CAST(coalesce(agg.n_bpe, 0) AS BIGINT) AS n_bpe_tokens,
       |         d.doc_id % $packShards AS shard
       |  FROM documents d LEFT JOIN agg USING (doc_id)),
       |ps AS (
       |  SELECT *,
       |    coalesce(sum(n_bpe_tokens) OVER (
       |      PARTITION BY lang, shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS start_tok
       |  FROM pk),
       |pb AS (
       |  SELECT *, start_tok // $packBudgetTokens AS bin FROM ps)
       |SELECT doc_id, lang, n_bpe_tokens,
       |  lang || '#' || shard || '#' || bin AS pack_id,
       |  CAST(row_number() OVER (PARTITION BY lang, shard, bin
       |                          ORDER BY doc_id) AS BIGINT) AS pack_pos,
       |  CAST(sum(n_bpe_tokens) OVER (PARTITION BY lang, shard, bin)
       |    AS BIGINT) AS pack_tokens
       |FROM pb""".stripMargin
  }

  // ---- WordPiece greedy encoding over the trained vocabulary ----------

  /** Unroll depth of the greedy oracle — every greedy step consumes at
    * least one character, so this bounds the longest encodable word;
    * [[wordpieceEncode]] enforces it loudly against the corpus.
    */
  val wpGreedySteps = 16

  /** WordPiece-style GREEDY longest-match encoding over the SAME trained
    * vocabulary BPE encoding replays (base characters + every accepted
    * merge's output symbol): the BERT-family encode algorithm beside the
    * GPT-family merge-order one. The two disagree on words where an
    * early long match blocks the merge path's segmentation — having both
    * lets a pipeline measure that disagreement before committing a
    * loader to one. A word no vocabulary walk can cover becomes ONE
    * `[UNK]` token (whole-word failure, the published WordPiece
    * semantics); on the training corpus itself every character is in the
    * vocabulary so n_unk_words is structurally 0 — the UNK path is
    * exercised by spec on unseen alphabets.
    *
    * Scale shape = [[bpeEncode]]'s: the corpus pass is one explode +
    * keyed count (map-side combined); greedy matching runs on the
    * DISTINCT-WORD table only, inside whole-stage codegen
    * ([[graft.functions.WordPieceGreedy]], vocabulary shipped in the
    * expression like BpeMergeFold's pair table), and per-doc counts come
    * back via a broadcast probe. The alphabet and merge table are the
    * only driver-side syncs (both model-sized, the k-means-centroid
    * class of bounded collect).
    */
  def wordpieceEncode(spark: SparkSession, sfDir: String): DataFrame = {
    val words = tokenWords(spark, sfDir).persist()
    val merges = trainedMerges(spark, sfDir, Some(words))
    val baseChars = words
      .select(explode(split(col("w"), "")).as("c"))
      .filter(col("c") =!= "").distinct()
      .collect().map(_.getString(0)).toSeq // alphabet-sized
    val vocab = (baseChars ++ merges.map(_._5)).distinct
    val maxW = Option(words.agg(max(length(col("w")))).head.get(0))
      .fold(0)(_.asInstanceOf[Int])
    require(maxW <= wpGreedySteps,
      s"wordpieceEncode: corpus has a $maxW-char word but the greedy " +
        s"oracle unrolls $wpGreedySteps steps; raise wpGreedySteps")
    val pieces = graft.functions.WordPieceGreedy(col("w"), vocab)
    val unkLit = graft.functions.WordPieceGreedy.defaultUnk
    val wordLen = words.select(col("w"),
      size(pieces).as("n_wp"),
      array_contains(pieces, unkLit).as("unk"))
    val docTokens = TextOps.documents(spark, sfDir)
      .repartition(col("doc_id"))
      .select(col("doc_id"), explode(CurationOps.toksCol).as("w"))
    val out = TextOps.documents(spark, sfDir).select("doc_id")
      .join(docTokens
          .join(broadcast(wordLen), Seq("w"))
          .groupBy("doc_id").agg(
            count(lit(1)).as("n_words"),
            sum("n_wp").as("n_wp_tokens"),
            sum(when(col("unk"), 1L).otherwise(0L)).as("n_unk_words")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_wp_tokens"), lit(0L)).as("n_wp_tokens"),
        coalesce(col("n_unk_words"), lit(0L)).as("n_unk_words"))
    Canon.materialized(Canon.canonicalize(out), words)
  }

  /** The greedy walk in SQL: the vocabulary CTE is base characters ∪
    * accepted merge outputs (the same acc$r tables the training oracle
    * reports), and each of the [[wpGreedySteps]] unrolled steps finds
    * the longest vocabulary entry prefixing each word's remaining
    * suffix via a prefix join + max — no recursion-with-aggregates,
    * which recursive CTEs disallow. Whole-word UNK: a step with no
    * match collapses the word to one token and flags it.
    */
  val wordpieceEncodeOracle: String = {
    val steps = (0 until wpGreedySteps).map { i =>
      s"""wm$i AS (
         |  SELECT g.w, g.rem, g.n, g.unk,
         |         max(CASE WHEN g.rem <> ''
         |                   AND v.tok = substr(g.rem, 1, len(v.tok))
         |                  THEN len(v.tok) END) AS bl
         |  FROM wg$i g LEFT JOIN wvoc v
         |    ON g.rem <> '' AND v.tok = substr(g.rem, 1, len(v.tok))
         |  GROUP BY 1, 2, 3, 4),
         |wg${i + 1} AS (
         |  SELECT w,
         |         CASE WHEN rem = '' OR bl IS NULL THEN ''
         |              ELSE substr(rem, CAST(bl AS INT) + 1) END AS rem,
         |         CASE WHEN rem = '' THEN n
         |              WHEN bl IS NULL THEN 1
         |              ELSE n + 1 END AS n,
         |         CASE WHEN rem <> '' AND bl IS NULL THEN TRUE
         |              ELSE unk END AS unk
         |  FROM wm$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH RECURSIVE
       |$oracleChainCtes,
       |wvoc AS MATERIALIZED (
       |  SELECT DISTINCT unnest(string_split(w, '')) AS tok FROM w0
       |  UNION
       |  ${(0 until bpeRounds)
          .map(r => s"SELECT ab AS tok FROM acc$r").mkString("\n  UNION ")}),
       |wg0 AS (SELECT w, w AS rem, 0 AS n, FALSE AS unk FROM w0),
       |$steps,
       |wpl AS (SELECT w, n AS n_wp, unk FROM wg$wpGreedySteps),
       |wdt AS (
       |  SELECT doc_id, unnest(${CurationOps.toksSql}) AS w
       |  FROM documents),
       |wagg AS (
       |  SELECT doc_id, count(*) AS n_words, sum(n_wp) AS n_wp,
       |         sum(CASE WHEN unk THEN 1 ELSE 0 END) AS n_unk
       |  FROM wdt JOIN wpl USING (w) GROUP BY 1)
       |SELECT documents.doc_id,
       |  CAST(coalesce(n_words, 0) AS BIGINT) AS n_words,
       |  CAST(coalesce(n_wp, 0) AS BIGINT) AS n_wp_tokens,
       |  CAST(coalesce(n_unk, 0) AS BIGINT) AS n_unk_words
       |FROM documents LEFT JOIN wagg USING (doc_id)""".stripMargin
  }

  // ---- byte-fallback encoding ----------------------------------------

  /** BYTE-FALLBACK encoding — the guarantee shipped tokenizers
    * (SentencePiece / Llama-family) actually make: ANY UTF-8 input
    * encodes with ZERO unknown tokens, because a position no vocabulary
    * entry matches consumes one code point and emits its UTF-8 bytes as
    * `<0xNN>` tokens, then greedy matching RESUMES mid-word —
    * [[wordpieceEncode]]'s whole-word [UNK] collapse replaced by a
    * byte-exact escape hatch ([[graft.functions.WordPieceGreedy]] with
    * `byteFallback = true`; the spec round-trips arbitrary UTF-8 —
    * Greek, CJK, astral emoji — back to the original bytes).
    *
    * On the training corpus every character is in vocabulary, which
    * would leave the fallback path structurally unexercised — so THIS
    * query encodes against the vocabulary with every entry containing
    * a digit or the letter 'e' removed (a deterministic hole — 'e'
    * because the fixture corpus happens to be digit-free — putting
    * those characters out-of-alphabet exactly as a new script would
    * be), making real fixture words take the byte path mid-word and
    * resume. Per doc: word count, total byte-fallback token count,
    * words that needed ≥1 byte escape. Scale shape identical to
    * [[wordpieceEncode]] (distinct-word table encode inside codegen,
    * broadcast probe back).
    */
  def wordpieceEncodeByteFallback(spark: SparkSession,
                                  sfDir: String): DataFrame = {
    val words = tokenWords(spark, sfDir).persist()
    val merges = trainedMerges(spark, sfDir, Some(words))
    val baseChars = words
      .select(explode(split(col("w"), "")).as("c"))
      .filter(col("c") =!= "").distinct()
      .collect().map(_.getString(0)).toSeq // alphabet-sized
    // the deterministic fallback hole (ASCII-range check, the exact
    // twin of the oracle's [e0-9] regex)
    val vocab = (baseChars ++ merges.map(_._5)).distinct
      .filterNot(_.exists(c => c == 'e' || (c >= '0' && c <= '9')))
    val maxW = Option(words.agg(max(length(col("w")))).head.get(0))
      .fold(0)(_.asInstanceOf[Int])
    require(maxW <= wpGreedySteps,
      s"byte-fallback encode: corpus has a $maxW-char word but the " +
        s"greedy oracle unrolls $wpGreedySteps steps; raise wpGreedySteps")
    val pieces = graft.functions.WordPieceGreedy.byteFallback(col("w"),
      vocab)
    val wordLen = words.select(col("w"),
      size(pieces).as("n_bf"),
      exists(pieces, p => p.startsWith("<0x")).as("fb"))
    val docTokens = TextOps.documents(spark, sfDir)
      .repartition(col("doc_id"))
      .select(col("doc_id"), explode(CurationOps.toksCol).as("w"))
    val out = TextOps.documents(spark, sfDir).select("doc_id")
      .join(docTokens
          .join(broadcast(wordLen), Seq("w"))
          .groupBy("doc_id").agg(
            count(lit(1)).as("n_words"),
            sum("n_bf").as("n_bf_tokens"),
            sum(when(col("fb"), 1L).otherwise(0L)).as("n_fallback_words")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_bf_tokens"), lit(0L)).as("n_bf_tokens"),
        coalesce(col("n_fallback_words"), lit(0L)).as("n_fallback_words"))
    Canon.materialized(Canon.canonicalize(out), words)
  }

  /** The greedy walk with the byte escape: a step with no match
    * consumes one character and adds its UTF-8 byte count (DuckDB
    * `strlen` = byte length; the Spark twin is the expression's
    * per-byte emission), then continues — no whole-word collapse. The
    * vocabulary CTE is the shared one minus digit-bearing entries.
    */
  val wordpieceEncodeByteFallbackOracle: String = {
    val steps = (0 until wpGreedySteps).map { i =>
      s"""bm$i AS (
         |  SELECT g.w, g.rem, g.n, g.fb,
         |         max(CASE WHEN g.rem <> ''
         |                   AND v.tok = substr(g.rem, 1, len(v.tok))
         |                  THEN len(v.tok) END) AS bl
         |  FROM bg$i g LEFT JOIN bvoc v
         |    ON g.rem <> '' AND v.tok = substr(g.rem, 1, len(v.tok))
         |  GROUP BY 1, 2, 3, 4),
         |bg${i + 1} AS (
         |  SELECT w,
         |         CASE WHEN rem = '' THEN ''
         |              WHEN bl IS NULL THEN substr(rem, 2)
         |              ELSE substr(rem, CAST(bl AS INT) + 1) END AS rem,
         |         CASE WHEN rem = '' THEN n
         |              WHEN bl IS NULL THEN n + strlen(substr(rem, 1, 1))
         |              ELSE n + 1 END AS n,
         |         CASE WHEN rem <> '' AND bl IS NULL THEN TRUE
         |              ELSE fb END AS fb
         |  FROM bm$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH RECURSIVE
       |$oracleChainCtes,
       |bvoc AS MATERIALIZED (
       |  SELECT tok FROM (
       |    SELECT DISTINCT unnest(string_split(w, '')) AS tok FROM w0
       |    UNION
       |    ${(0 until bpeRounds)
          .map(r => s"SELECT ab AS tok FROM acc$r").mkString("\n    UNION ")})
       |  WHERE NOT regexp_matches(tok, '[e0-9]')),
       |bg0 AS (SELECT w, w AS rem, 0 AS n, FALSE AS fb FROM w0),
       |$steps,
       |bfl AS (SELECT w, n AS n_bf, fb FROM bg$wpGreedySteps),
       |bdt AS (
       |  SELECT doc_id, unnest(${CurationOps.toksSql}) AS w
       |  FROM documents),
       |bagg AS (
       |  SELECT doc_id, count(*) AS n_words, sum(n_bf) AS n_bf,
       |         sum(CASE WHEN fb THEN 1 ELSE 0 END) AS n_fb
       |  FROM bdt JOIN bfl USING (w) GROUP BY 1)
       |SELECT documents.doc_id,
       |  CAST(coalesce(n_words, 0) AS BIGINT) AS n_words,
       |  CAST(coalesce(n_bf, 0) AS BIGINT) AS n_bf_tokens,
       |  CAST(coalesce(n_fb, 0) AS BIGINT) AS n_fallback_words
       |FROM documents LEFT JOIN bagg USING (doc_id)""".stripMargin
  }
}
