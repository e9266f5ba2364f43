package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Canon

/** Cross-tier GOVERNANCE compositions.
  *
  * [[takedownSweep]] is the right-to-be-forgotten path a deployment
  * actually executes: a takedown request names documents, and the
  * forget must propagate to EVERY persisted derived artifact — the
  * exact-dup ledger, the near-dup index, the reference LM, both
  * tokenizer word ledgers, and the ANN index — not just the corpus
  * table. Each family already owns an exact, SUCCESS-gated,
  * spec-pinned forget (delete-propagation semantics documented at the
  * family: anti-join for doc-keyed tiers, subtractive counts for the
  * ledgers, whole-document semantics for the lossy slot-min fold);
  * this coordinator guarantees none of them is skipped and stamps one
  * shared tag so the derived set is auditable as a unit.
  *
  * THE CLIP RULE — the coordinator's one piece of real logic. The
  * doc-keyed tiers (SHA rows/groups, LSH sigs/shingles/bands, IVF
  * postings) forget by anti-join, which is naturally idempotent: an
  * id the tier never ingested simply matches nothing. The
  * count-ledger tiers (reference LM, BPE and unigram word ledgers)
  * forget by SUBTRACTING the departed documents' own counts — which
  * is only exact for documents the ledger actually ingested.
  * Subtracting a never-ingested document's counts silently corrupts
  * shared words' mass (the `f > 0` clamp hides, not heals, it). So
  * the sweep clips the takedown set to each count tier's ingested
  * population before delegating ([[LmOps.inBaseSlice]],
  * [[BpeOps.inBaseSlice]], [[UnigramOps.inBaseSlice]] — each family
  * owns its own membership predicate so this coordinator can't
  * drift from the build). A deployment whose ledgers ingest
  * everything passes everything through; the clip is then a no-op.
  *
  * Scale shape: pure composition — each family's forget is one
  * anti-join or one subtractive count-merge over its own artifact,
  * all batch-sized in the forget set; nothing here adds corpus-scaled
  * work. Idempotent by construction: every family's `…_f_<tag>` dir
  * is SUCCESS-gated, so a replayed sweep (crash recovery, retried
  * orchestration) re-reads instead of re-applying.
  *
  * `forgetDocs` must carry (doc_id, text, lang): the count-ledger
  * tiers subtract the departed documents' OWN counts, which requires
  * their text — a deployment keeps the original bytes until the
  * sweep commits, then drops them. Embeddings are addressed by the
  * fixture's doc_id ≡ vec_id alignment; a deployment with a separate
  * mapping passes its own vec ids through the same seam.
  */
object GovernanceOps {

  /** Tier names in the order the sweep runs them (stable for specs
    * and audit logs).
    */
  val takedownTiers: Seq[String] = Seq(
    "sha_ledger", "lsh_index", "lm_index",
    "bpe_index", "unigram_index", "ivf_index")

  def takedownSweep(spark: SparkSession, sfDir: String,
                    forgetDocs: DataFrame, tag: String)
      : Map[String, String] = {
    require(tag.matches("[A-Za-z0-9_-]+"),
      s"tag must be path-safe, got '$tag'")
    val docs = forgetDocs.select("doc_id", "text", "lang").persist()
    docs.count()
    val ids = docs.select("doc_id")
    val vecIds = ids.withColumnRenamed("doc_id", "vec_id")
    // ensure every base artifact exists before deriving from it
    val shaBase = LedgerOps.shaLedger(spark, sfDir)
    DedupOps.lshIndex(spark, sfDir)
    LmOps.lmIndex(spark, sfDir)
    val bpeBase = BpeOps.bpeIndex(spark, sfDir)
    val uniBase = UnigramOps.unigramIndex(spark, sfDir)
    val ivfBase = VectorOps.ivfIndex(spark, sfDir)
    val out = Map(
      "sha_ledger" ->
        LedgerOps.shaLedgerForget(spark, shaBase, ids, tag),
      "lsh_index" ->
        DedupOps.lshIndexForget(spark, DedupOps.lshIndexDir(sfDir),
          ids, tag),
      "lm_index" ->
        LmOps.lmIndexForget(spark, LmOps.lmIndexDir(sfDir),
          LmOps.inBaseSlice(docs), tag),
      "bpe_index" ->
        BpeOps.bpeIndexForget(spark, bpeBase,
          BpeOps.inBaseSlice(docs), tag),
      "unigram_index" ->
        UnigramOps.unigramIndexForget(spark, uniBase,
          UnigramOps.inBaseSlice(docs), tag),
      "ivf_index" ->
        VectorOps.ivfIndexForget(spark, ivfBase, vecIds, tag))
    docs.unpersist(false)
    out
  }

  /** The takedown slice of the GATED query: every 20th document — a
    * slice that intersects every tier's ingest population
    * non-trivially (even → BPE/unigram halves; ≡0 mod 5 → LM
    * reference slice; ≡0 mod 10 → half the SHA base; ~80% land under
    * the LSH/IVF side-bucket boundary), so the audit below measures a
    * real forget at all six tiers, not a no-op at some.
    */
  private def takedownSlice(c: Column): Column = c % 20 === 0

  /** One-call sweep + cross-tier AUDIT, the gated query: run the
    * takedown for the `% 20 = 0` slice, then report one row per tier
    * with two deterministic post-forget measures — a row count and a
    * mass total over the tier's primary table. The DuckDB oracle
    * recomputes both from the BASE tables under never-existed
    * semantics (build predicate ∧ not-forgotten), so a skipped tier,
    * an unclipped subtraction, or an over-deletion all hash-mismatch.
    */
  def takedownSweepQuery(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val gone = TextOps.documents(spark, sfDir)
      .filter(takedownSlice(col("doc_id")))
    val dirs = takedownSweep(spark, sfDir, gone, "td20")
    def audit(tier: String, table: String, mass: Column): DataFrame =
      spark.read.parquet(s"${dirs(tier)}/$table")
        .agg(count(lit(1)).as("n_rows"), mass.as("mass"))
        .select(lit(tier).as("tier"), col("n_rows"),
          col("mass").cast("long").as("mass"))
    val lshAudit = spark.read.parquet(s"${dirs("lsh_index")}/sigs")
      .agg(count(lit(1)).as("n_rows"))
      .crossJoin(spark.read.parquet(s"${dirs("lsh_index")}/bands")
        .agg(count(lit(1)).cast("long").as("mass")))
      .select(lit("lsh_index").as("tier"), col("n_rows"), col("mass"))
    val rows = Seq(
      audit("sha_ledger", "groups", sum("n_copies")),
      lshAudit,
      audit("lm_index", "cab", sum("c_ab")),
      audit("bpe_index", "words", sum("f")),
      audit("unigram_index", "words", sum("f")),
      audit("ivf_index", "postings", sum("vec_id")))
    Canon.canonicalize(rows.reduce(_.unionByName(_)))
  }

  /** Never-existed oracle: six UNION ALL arms, each re-deriving the
    * tier's primary table from the raw `documents` / `embeddings`
    * fixtures with the tier's own build predicate AND the takedown
    * slice excluded. The LM arm reuses [[LmOps.lmCteBodyFor]] — the
    * same CTE body every LM lifecycle oracle is pinned to.
    */
  val takedownSweepOracle: String = {
    val norm = TextOps.normSql
    val toks = CurationOps.toksSql
    val keep = "doc_id % 20 <> 0"
    val wordsArm =
      s"""SELECT CAST(count(*) AS BIGINT) AS n_rows,
         |       CAST(sum(f) AS BIGINT) AS mass
         |FROM (SELECT w, count(*) AS f FROM (
         |        SELECT unnest($toks) AS w FROM documents
         |        WHERE ${BpeOps.baseSliceSql} AND $keep)
         |      GROUP BY 1)""".stripMargin
    s"""WITH ${LmOps.lmCteBodyFor(s"${LmOps.baseSliceSql} AND $keep")}
       |SELECT 'sha_ledger' AS tier,
       |       CAST(count(DISTINCT sha) AS BIGINT) AS n_rows,
       |       CAST(count(*) AS BIGINT) AS mass
       |FROM (SELECT sha256($norm) AS sha FROM documents
       |      WHERE doc_id % 10 = 0 AND $keep)
       |UNION ALL
       |SELECT 'lsh_index',
       |       CAST(count(*) AS BIGINT),
       |       CAST(${DedupOps.numBands} * count(*) AS BIGINT)
       |FROM documents
       |WHERE ${DedupOps.sideBucketSql("doc_id")}
       |        < ${DedupOps.incrementalCorpusPermille}
       |  AND $keep AND length($norm) >= ${DedupOps.shingleLen}
       |UNION ALL
       |SELECT 'lm_index', CAST(count(*) AS BIGINT),
       |       CAST(sum(c_ab) AS BIGINT)
       |FROM cab
       |UNION ALL
       |SELECT 'bpe_index', n_rows, mass FROM ($wordsArm)
       |UNION ALL
       |SELECT 'unigram_index', n_rows, mass FROM ($wordsArm)
       |UNION ALL
       |SELECT 'ivf_index',
       |       CAST(count(*) AS BIGINT),
       |       CAST(sum(vec_id) AS BIGINT)
       |FROM embeddings
       |WHERE ${DedupOps.sideBucketSql("vec_id")}
       |        < ${DedupOps.incrementalCorpusPermille}
       |  AND vec_id % 20 <> 0""".stripMargin
  }

  // ---- k-anonymity release suppression ---------------------------------

  /** Minimum documents a (lang, source) cell needs before its source
    * is NAMED in a released rollup.
    */
  val kAnonMinDocs = 10L

  /** Label of the suppression bucket every under-k cell folds into. */
  val kAnonOther = "__other__"

  /** K-ANONYMITY RELEASE — the dataset-card discipline for publishing
    * per-source statistics: a rollup cell naming a source with very
    * few documents can identify a contributor (small crawl feeds,
    * single-site sources), so cells with fewer than [[kAnonMinDocs]]
    * docs are suppressed and folded, mass-conserving, into one
    * [[kAnonOther]] row per lang. The fold row is released regardless
    * of its own size: it aggregates ≥1 suppressed sources and names
    * none of them, which is the property k-anonymity wants (n_cells
    * says how many sources it hides — the auditor's number). Totals
    * are conserved by construction: suppression REASSIGNS mass, never
    * deletes it, so the released table still sums to the corpus.
    *
    * Scale shape: two keyed aggregations, the second over the
    * cell table (≤ |langs|·|sources| rows — metadata-sized); the
    * corpus is scanned once. All counts exact integers.
    */
  def kanonRelease(spark: SparkSession, sfDir: String): DataFrame = {
    val cells = TextOps.documents(spark, sfDir)
      .repartition(col("doc_id"))
      .select(col("lang"), col("source"),
        size(CurationOps.toksCol).cast("long").as("n_toks"))
      .groupBy("lang", "source").agg(
        count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"))
    val released = cells
      .withColumn("rel_source",
        when(col("n_docs") >= kAnonMinDocs, col("source"))
          .otherwise(lit(kAnonOther)))
      .groupBy(col("lang"), col("rel_source").as("source"))
      .agg(sum("n_docs").as("n_docs"), sum("n_tokens").as("n_tokens"),
        count(lit(1)).as("n_cells"))
    Canon.canonicalize(released)
  }

  val kanonReleaseOracle: String =
    s"""WITH kc AS (
       |  SELECT lang, source, count(*) AS n_docs,
       |         CAST(sum(len(${CurationOps.toksSql})) AS BIGINT)
       |           AS n_tokens
       |  FROM documents GROUP BY 1, 2)
       |SELECT lang,
       |       CASE WHEN n_docs >= $kAnonMinDocs THEN source
       |            ELSE '$kAnonOther' END AS source,
       |       CAST(sum(n_docs) AS BIGINT) AS n_docs,
       |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |       CAST(count(*) AS BIGINT) AS n_cells
       |FROM kc GROUP BY 1, 2""".stripMargin
}
