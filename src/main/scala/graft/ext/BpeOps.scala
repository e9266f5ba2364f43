package graft.ext

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.io.Fingerprint
import graft.ops.Canon

/** Distributed BPE merge training — the tokenizer-construction step of a
  * pre-training pipeline, as a Spark job with a full DuckDB oracle.
  *
  * Classic byte-pair encoding over the corpus WORD-FREQUENCY table (the
  * standard reduction: training never touches documents again once the
  * word multiset is counted): start from character symbols, then per
  * round count adjacent symbol pairs weighted by word frequency, merge
  * the most frequent pair everywhere (ties broken lexicographically so
  * the chain is deterministic), repeat.
  *
  * Scale shape, mirroring the trained-IVF k-means pattern exactly:
  *  - the ONE corpus-sized pass is the word count (keyed agg, map-side
  *    combine); everything after runs on the word-frequency table, which
  *    is vocabulary-sized — bounded, not corpus-sized;
  *  - each round's driver sync is ONE row (the winning pair) — the same
  *    sync point as k-means' C centroids, never the data;
  *  - the merge application is a one-pass left-to-right fold per word
  *    (array aggregate). Greedy one-pass equals the FIRST-OCCURRENCE
  *    single-replacement fixpoint the oracle iterates: occurrences of
  *    ' a b ' can only overlap when a = b, leftmost-first then picks
  *    the same pairs as the fold, and a replacement never creates an
  *    occurrence before the match point (ab equals neither a nor b).
  *    A replace-ALL fixpoint is NOT equal — it skips the adjacent
  *    overlapping pair in identical-symbol runs ≥ 5 ('aaaaa' → [aa a
  *    aa] vs the fold's [aa aa a]) — argued in BpeOpsSpec including
  *    the run-length ≥ 5 cases;
  *  - trained merges are an INDEX (built once per dataset, memoized with
  *    a data fingerprint like the IVF centroids), so encoding never
  *    re-trains.
  *
  * The oracle regenerates the whole chain in SQL: per round, pair counts
  * from the current corpus, argmax with the same tie-break, and a
  * RECURSIVE-CTE fixpoint of boundary-padded FIRST-OCCURRENCE string
  * replacement for the merge application (space-joined symbols; symbols
  * never contain spaces). Like the IVF oracle, rounds are unrolled from the same
  * constants the Spark side uses.
  */
object BpeOps {

  /** Number of merge rounds trained (and oracle-unrolled). Eight rounds
    * reach merges whose operands are themselves merged symbols at every
    * fixture scale ('p'+'ar', 'm'+'er') — the iterative chain, not just
    * first-order pair counting.
    */
  val bpeMerges = 8

  private def tokenWords(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.documents(spark, sfDir)
      .repartition(col("doc_id"))
      .select(explode(CurationOps.toksCol).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))

  /** One-pass greedy merge of adjacent (a, b) into ab over a symbol
    * array — left-to-right, non-overlapping (a merged symbol never
    * re-merges within the round because symbols only grow).
    */
  private def mergeFold(sy: Column, a: String, b: String): Column =
    aggregate(sy,
      array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 &&
            element_at(acc, -1) === a && x === b,
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** Lineage truncation with DETERMINISTIC block release: materialize the
    * frame's row RDD and rebuild a LogicalRDD-backed frame over it. Each
    * round's frame derives from the last, and 8 stacked fold-lambdas
    * make re-ANALYSIS the dominant cost even when execution reads a
    * cache; `localCheckpoint` would also truncate, but its blocks bypass
    * the CacheManager, so `Dataset.unpersist` cannot free them and up to
    * 9 corpus generations would linger until RDD garbage collection.
    * Holding the RDD handle lets the loop release each generation the
    * moment the next one is materialized.
    */
  private def truncated(df: DataFrame): (DataFrame, RDD[Row]) = {
    val rdd = df.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    rdd.count()
    (df.sparkSession.createDataFrame(rdd, df.schema), rdd)
  }

  /** Trained merges are a per-dataset artifact, like IVF centroids: the
    * cache key folds in a source fingerprint so regenerated data cannot
    * be served stale merges. The cached value is [[bpeMerges]] rows.
    */
  private val mergeCache = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[(Int, String, String, String, Long)]]

  /** Memoized training. `words` lets a caller that ALREADY materialized
    * the word-frequency table (bpeEncode) share it on a cache miss —
    * training and encoding together still make one corpus-sized pass.
    * Duplicate concurrent training of the same key is tolerated (it is
    * deterministic; last write wins) rather than holding a map lock for
    * the whole multi-job loop the way computeIfAbsent would.
    */
  private[ext] def trainedMerges(spark: SparkSession, sfDir: String,
                                 words: Option[DataFrame] = None)
      : Seq[(Int, String, String, String, Long)] = {
    val key = s"$sfDir#$bpeMerges#" +
      Fingerprint.ofPath(s"$sfDir/documents.parquet")
    Option(mergeCache.get(key)).getOrElse {
      val trained = trainLoop(spark,
        words.getOrElse(tokenWords(spark, sfDir)))
      mergeCache.put(key, trained)
      trained
    }
  }

  private def trainLoop(spark: SparkSession, words: DataFrame)
      : Seq[(Int, String, String, String, Long)] = {
    import spark.implicits._
    var (corpus, blocks) = truncated(
      words.select(col("w"), split(col("w"), "").as("sy"), col("f")))
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var round = 0
    while (round < bpeMerges) {
      val best = corpus
        .select(posexplode(col("sy")).as(Seq("i", "a")), col("sy"), col("f"))
        .filter(col("i") < size(col("sy")) - 1)
        .select(col("a"), element_at(col("sy"), col("i") + 2).as("b"),
          col("f"))
        .groupBy("a", "b").agg(sum("f").as("pf"))
        .orderBy(col("pf").desc, col("a").asc, col("b").asc)
        .limit(1) // ONE driver-sync row per round, like k-means centroids
        .as[(String, String, Long)].collect()
      if (best.isEmpty) round = bpeMerges // pairs ran dry: chain stops
      else {
        val (a, b, pf) = best.head
        merges += ((round, a, b, a + b, pf))
        val (next, nextBlocks) = truncated(
          corpus.select(col("w"), mergeFold(col("sy"), a, b).as("sy"),
            col("f")))
        blocks.unpersist(false)
        corpus = next
        blocks = nextBlocks
        round += 1
      }
    }
    blocks.unpersist(false)
    merges.result()
  }

  /** Trains [[bpeMerges]] merges; returns one row per round:
    * (round, a, b, ab, pair_freq).
    */
  def bpeTrain(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Canon.canonicalize(
      trainedMerges(spark, sfDir).toDF("round", "a", "b", "ab", "pair_freq"))
  }

  /** APPLIES the trained merges: per-document BPE token counts — the
    * real tokenizer-based counting beside TextOps' regex estimate, and
    * the train → encode loop closed. Encoding needs only the final
    * word → segment-count map (BPE segmentations are word-local): with
    * the merges known (memoized index), the final segmentation is ONE
    * chained fold pass over the word table — no per-round jobs — and
    * the corpus side is one explode + a broadcast join against the
    * vocabulary-sized length table.
    */
  def bpeEncode(spark: SparkSession, sfDir: String): DataFrame = {
    // the word table is shared with training on a cache miss, so the
    // corpus-sized explode+count runs ONCE either way
    val words = tokenWords(spark, sfDir).persist()
    val merges = trainedMerges(spark, sfDir, Some(words))
    val folded = merges.foldLeft(split(col("w"), "")) {
      case (sy, (_, a, b, _, _)) => mergeFold(sy, a, b)
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

  /** The shared oracle CTE chain (w0 … c[[bpeMerges]] plus each round's
    * m$r), composed by BOTH oracles — never spliced textually.
    *
    * Every non-recursive CTE is AS MATERIALIZED: DuckDB otherwise
    * INLINES a CTE per reference, and with each round referencing the
    * previous 2-3 times the chain re-evaluates exponentially (~4^rounds
    * — measured 12+ min vs 0.15 s at sf0.01). fix$r is recursive and
    * materialized by nature.
    *
    * c${r+1} LEFT JOINs its merge row so a dry round (empty m$r — no
    * adjacent pairs left) carries the corpus forward unchanged instead
    * of cross-joining it away; this mirrors the Spark loop's early
    * exit, so both sides agree even when merges run dry before
    * [[bpeMerges]] rounds.
    */
  private val oracleChainCtes: String = {
    def roundCtes(r: Int): String =
      s"""p$r AS MATERIALIZED (
         |  SELECT sy[i] AS a, sy[i+1] AS b, sum(f) AS pf
         |  FROM (SELECT list_filter(string_split(s, ' '), x -> x <> '') AS sy,
         |               f FROM c$r),
         |       unnest(range(1, len(sy))) AS t(i)
         |  GROUP BY 1, 2),
         |m$r AS MATERIALIZED (
         |  SELECT a, b, a || b AS ab, pf FROM p$r
         |  ORDER BY pf DESC, a ASC, b ASC LIMIT 1),
         |fix$r(w, s, f) AS (
         |  SELECT w, s, f FROM c$r
         |  UNION ALL
         |  SELECT w,
         |    substr(s, 1, strpos(s, ' ' || m.a || ' ' || m.b || ' ') - 1) ||
         |      ' ' || m.ab || ' ' ||
         |      substr(s, strpos(s, ' ' || m.a || ' ' || m.b || ' ')
         |                   + len(' ' || m.a || ' ' || m.b || ' ')),
         |    f
         |  FROM fix$r, m$r m
         |  WHERE strpos(s, ' ' || m.a || ' ' || m.b || ' ') > 0),
         |c${r + 1} AS MATERIALIZED (
         |  SELECT f0.w, f0.s, f0.f FROM fix$r f0 LEFT JOIN m$r m ON true
         |  WHERE m.a IS NULL
         |     OR strpos(f0.s, ' ' || m.a || ' ' || m.b || ' ') = 0)""".stripMargin
    s"""w0 AS MATERIALIZED (
       |  SELECT w, count(*) AS f FROM (
       |    SELECT unnest(${CurationOps.toksSql}) AS w FROM documents)
       |  GROUP BY 1),
       |c0 AS MATERIALIZED (
       |  SELECT w, ' ' || array_to_string(string_split(w, ''), ' ') || ' '
       |           AS s, f
       |  FROM w0),
       |${(0 until bpeMerges).map(roundCtes).mkString(",\n")}""".stripMargin
  }

  /** The full training chain in SQL, rounds unrolled. Symbol strings are
    * boundary-padded and space-joined; the per-round merge is the
    * fixpoint of FIRST-OCCURRENCE single replacement (recursive CTE,
    * strpos + substr splice) — equal to the Spark side's one-pass greedy
    * fold, which a replace-all fixpoint is not (it skips the adjacent
    * overlapping pair in identical-symbol runs ≥ 5).
    */
  val bpeTrainOracle: String =
    s"""WITH RECURSIVE
       |$oracleChainCtes
       |SELECT * FROM (
       |  ${(0 until bpeMerges)
          .map(r => s"SELECT CAST($r AS BIGINT) AS round, a, b, ab, " +
            s"CAST(pf AS BIGINT) AS pair_freq FROM m$r")
          .mkString("\n  UNION ALL ")})""".stripMargin

  /** [[bpeEncode]]'s oracle: the same chain, consumed at its FINAL
    * corpus c[[bpeMerges]] — per-word segment counts joined back to each
    * document's token stream.
    */
  /** The encode tail (word → symbol count, corpus probe, per-doc agg),
    * shared by the encode oracle and the compression-ratio rollup.
    */
  private val encodeCtes: String =
    s"""wl AS (
       |  SELECT w, len(list_filter(string_split(s, ' '), x -> x <> ''))
       |           AS n_sym
       |  FROM c$bpeMerges),
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
}
