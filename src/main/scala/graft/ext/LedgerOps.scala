package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Canon

/** Persisted EXACT-dedup hash ledger with the full artifact lifecycle
  * (build / probe / merge / forget) — the content-hash "seen set" a
  * daily-crawl pipeline consults before admitting documents, kept as a
  * maintained artifact so the corpus is hashed ONCE, not per batch.
  *
  * The reference's dedup step recomputes content groups per run
  * (reference `sql/dedup.sql`-style GROUP BY over the whole corpus);
  * at 100 TB the corpus side must instead be a persisted index, like
  * this repo's LSH ([[DedupOps.lshIndex]]), LM ([[LmOps.lmIndex]]),
  * IVF and BPE-ledger artifacts. This file gives EXACT dedup the same
  * symmetry.
  *
  * Two SUCCESS-gated parquet tables under a fingerprint-stamped dir:
  *
  *  - `rows`   — (text_sha, doc_id), one row per corpus document; the
  *    exact-algebra half. Merge is set union, forget is anti join —
  *    both EXACT, so merged/forgotten ledgers are identical to
  *    from-scratch builds (spec-pinned, which is why the lifecycle
  *    query can use a never-existed from-scratch oracle).
  *  - `groups` — (text_sha, keep_doc_id, n_copies), one row per
  *    distinct content; the probe-serving half (keeper = min doc_id,
  *    the [[TextOps.dedupExact]] rule).
  *
  * Scale discipline: every maintenance op touches the corpus only as
  * a SCAN + broadcast-hash join against the (small) batch — zero
  * corpus-sided shuffles. Merge derives the new `groups` incrementally
  * (untouched groups pass through byte-identical; only shas present in
  * the batch recombine), and forget re-elects keepers only for the
  * shas the forgotten docs actually held — the
  * [[DedupOps.clustersForget]] only-affected-components discipline.
  * At deployment the two tables would be bucketed by text_sha so a
  * merge rewrites only touched buckets; here each lifecycle step
  * writes a new stamped dir (`…_m_<tag>` / `…_f_<tag>`), so a crash
  * mid-maintenance can never corrupt the base ledger.
  */
object LedgerOps {

  private def ledgerRootDir = s"${graft.io.Artifacts.root}/sha_ledger"

  /** Stamped base-ledger dir: fixture fingerprint + slice params, so a
    * data or parameter change misses the old artifact.
    */
  private[graft] def ledgerDir(sfDir: String): String = {
    val fp = graft.io.Fingerprint.ofPath(s"$sfDir/documents.parquet")
    val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_").replaceAll("^_+", "")
    s"$ledgerRootDir/${tag}_$fp"
  }

  private def done(dir: String): Boolean =
    Seq("rows", "groups").forall(t =>
      new java.io.File(s"$dir/$t/_SUCCESS").exists())

  /** Content hash at the ledger boundary: sha-256 of the normalized
    * text — the [[TextOps.dedupExact]] definition, shared verbatim.
    */
  private def withSha(docs: DataFrame): DataFrame =
    docs.select(
      sha2(TextOps.normText(col("text")), 256).as("text_sha"),
      col("doc_id").cast("long").as("doc_id"))

  /** Per-doc ledger rows for an arbitrary (doc_id, text) frame.
    * Distinct on (text_sha, doc_id): a re-submitted (id, text) pair —
    * the at-least-once crawl delivery — collapses instead of double
    * counting.
    */
  private[ext] def rowsOf(docs: DataFrame): DataFrame =
    withSha(docs).distinct()

  /** The groups a rows table implies — the invariant every lifecycle
    * step must preserve (`groups ≡ groupsOf(rows)`, spec-pinned).
    */
  private[ext] def groupsOf(rows: DataFrame): DataFrame =
    rows.groupBy("text_sha").agg(
      min("doc_id").as("keep_doc_id"),
      count(lit(1)).as("n_copies"))

  /** The corpus slice the shipped base ledger covers (the incremental
    * fixtures' convention: half the mod-10 ring is "corpus", the other
    * half arrives later as batches).
    */
  private[ext] def baseDocs(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.documents(spark, sfDir)
      .filter(col("doc_id") % 10 === 0)
      .select("doc_id", "text")

  /** Build (first call) or reuse (SUCCESS-gated) the base ledger. */
  def shaLedger(spark: SparkSession, sfDir: String): String =
    synchronized {
      val dir = ledgerDir(sfDir)
      if (!done(dir)) buildInto(spark, dir, baseDocs(spark, sfDir))
      dir
    }

  /** From-scratch build over an explicit doc frame — the definition
    * merge and forget are proven against.
    */
  private[ext] def buildInto(spark: SparkSession, dir: String,
                             docs: DataFrame): String = {
    val rows = rowsOf(docs.repartition(col("doc_id"))).persist()
    rows.count() // multi-referenced persisted frame: eager materialize
    rows.write.mode("overwrite").parquet(s"$dir/rows")
    groupsOf(rows).write.mode("overwrite").parquet(s"$dir/groups")
    rows.unpersist(false)
    dir
  }

  private def readRows(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/rows")

  private def readGroups(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/groups")

  /** MERGE a document batch into a ledger — the daily-admission path.
    * Exactness: `rows` gains exactly the batch rows not already
    * present (set-union algebra), and `groups` is recombined ONLY for
    * shas the fresh rows touch, so both tables equal a from-scratch
    * build over corpus ∪ batch (LedgerOpsSpec). Corpus-side cost is
    * two scans with broadcast probes — no corpus shuffle, no corpus
    * text re-hash.
    */
  def shaLedgerMerge(spark: SparkSession, baseDir: String,
                     batchDocs: DataFrame, batchTag: String): String =
    synchronized {
      require(batchTag.matches("[A-Za-z0-9_-]+"),
        s"batchTag must be path-safe, got '$batchTag'")
      mergeInto(spark, baseDir, s"${baseDir}_m_$batchTag", batchDocs)
    }

  /** Merge body with an explicit target dir (SUCCESS-gated) — the
    * admission chain names generations flatly, so it cannot reuse
    * [[shaLedgerMerge]]'s append-to-the-name convention.
    */
  private def mergeInto(spark: SparkSession, baseDir: String,
                        dir: String, batchDocs: DataFrame): String = {
      if (!done(dir)) {
        val baseRows = readRows(spark, baseDir)
        val baseGroups = readGroups(spark, baseDir)
        val bRows = rowsOf(batchDocs).persist()
        bRows.count()
        // rows already in the base (re-crawled identical versions):
        // corpus SCAN + broadcast semi probe -> tiny frame
        val overlap = baseRows.join(broadcast(bRows),
          Seq("text_sha", "doc_id"), "leftsemi").persist()
        overlap.count()
        val fresh = bRows.join(broadcast(overlap),
          Seq("text_sha", "doc_id"), "leftanti").persist()
        fresh.count()
        baseRows.union(fresh)
          .write.mode("overwrite").parquet(s"$dir/rows")
        // groups: pass untouched shas through; recombine touched ones
        val touched = groupsOf(fresh)
          .withColumnRenamed("keep_doc_id", "b_keep")
          .withColumnRenamed("n_copies", "b_n")
        val inBoth = baseGroups.join(broadcast(touched), Seq("text_sha"))
          .select(col("text_sha"),
            least(col("keep_doc_id"), col("b_keep")).as("keep_doc_id"),
            (col("n_copies") + col("b_n")).as("n_copies"))
          .persist()
        inBoth.count()
        val newShas = touched
          .join(broadcast(inBoth.select("text_sha")), Seq("text_sha"),
            "leftanti")
          .select(col("text_sha"), col("b_keep").as("keep_doc_id"),
            col("b_n").as("n_copies"))
        val pass = baseGroups.join(broadcast(touched.select("text_sha")),
          Seq("text_sha"), "leftanti")
        pass.union(inBoth).union(newShas)
          .write.mode("overwrite").parquet(s"$dir/groups")
        Seq(bRows, overlap, fresh, inBoth).foreach(_.unpersist(false))
      }
      dir
    }

  /** FORGET documents from a ledger by doc_id — delete propagation
    * into the derived artifact (the right-to-be-forgotten path every
    * trained/persisted artifact in this repo carries). Needs only the
    * ids: the shas to fix up come from the ledger's own rows, so the
    * forgotten documents' text is never required (unlike
    * [[LmOps.lmIndexForget]], whose counts must be re-derived from
    * text). Keepers are re-elected only for the shas the forgotten
    * docs actually held; every other group row passes through
    * byte-identical. Result ≡ from-scratch build without those docs.
    */
  def shaLedgerForget(spark: SparkSession, baseDir: String,
                      goneIds: DataFrame, tag: String): String =
    synchronized {
      require(tag.matches("[A-Za-z0-9_-]+"),
        s"tag must be path-safe, got '$tag'")
      val dir = s"${baseDir}_f_$tag"
      if (!done(dir)) {
        val baseRows = readRows(spark, baseDir)
        val baseGroups = readGroups(spark, baseDir)
        val gone = goneIds.select(col("doc_id").cast("long").as("doc_id"))
          .distinct()
        // shas the deletion touches: scan + broadcast semi -> tiny
        val touchedShas = baseRows.join(broadcast(gone), Seq("doc_id"),
            "leftsemi")
          .select("text_sha").distinct().persist()
        touchedShas.count()
        // re-project: a usingColumns join moves the join key to the
        // FRONT of the output, and rows must stay (text_sha, doc_id)
        val survRows = baseRows.join(broadcast(gone), Seq("doc_id"),
          "leftanti").select("text_sha", "doc_id").persist()
        survRows.count()
        survRows.write.mode("overwrite").parquet(s"$dir/rows")
        // only touched groups re-elect; survivors of those shas are a
        // batch-sized frame (scan + broadcast semi)
        val recombined = groupsOf(
          survRows.join(broadcast(touchedShas), Seq("text_sha"),
            "leftsemi"))
        val pass = baseGroups.join(broadcast(touchedShas), Seq("text_sha"),
          "leftanti")
        pass.union(recombined)
          .write.mode("overwrite").parquet(s"$dir/groups")
        touchedShas.unpersist(false); survRows.unpersist(false)
      }
      dir
    }

  /** PROBE a batch against a ledger: for each batch document, the
    * verdict a from-scratch [[TextOps.dedupExact]] over corpus ∪ batch
    * would hand down — keeper is the min doc_id across BOTH sides
    * (within-batch duplicates count), `dup_of` is that keeper (or -1
    * for group winners). The ledger side is restricted to the batch's
    * shas before joining (scan + broadcast semi), so the probe plan
    * never shuffles the corpus.
    */
  def shaLedgerProbe(spark: SparkSession, ledgerDir: String,
                     batchDocs: DataFrame): DataFrame = {
    val bRows = rowsOf(batchDocs).persist()
    bRows.count()
    val lg = readGroups(spark, ledgerDir)
      .join(broadcast(bRows.select("text_sha").distinct()),
        Seq("text_sha"), "leftsemi")
      .select(col("text_sha"), col("keep_doc_id").as("corpus_keep"))
    val bMin = bRows.groupBy("text_sha")
      .agg(min("doc_id").as("batch_min"))
    val out = bRows
      .join(broadcast(bMin), Seq("text_sha"))
      .join(broadcast(lg), Seq("text_sha"), "left")
      .withColumn("keeper",
        least(coalesce(col("corpus_keep"), col("batch_min")),
          col("batch_min")))
      .select(col("doc_id"), col("text_sha"),
        when(col("doc_id") =!= col("keeper"), col("keeper"))
          .otherwise(lit(-1L)).as("dup_of"),
        when(col("doc_id") =!= col("keeper"), lit(1L)).otherwise(lit(0L))
          .as("is_dup"))
    bRows.unpersist(false)
    out
  }

  /** Streaming ADMISSION step: probe micro-batch `batchId` against the
    * ledger chain left by batches 0..batchId-1, hand back the verdicts,
    * and MERGE the batch in so the next micro-batch sees it — the
    * daily-crawl admission loop as an exactly-once streaming fold.
    *
    * Replay-safe by construction: batch ids are stable across restarts
    * (checkpointed), each generation lives in a FLAT dir that is a
    * pure function of (feedTag, batchId) (`<base>__feed_<tag>/g<id>` —
    * flat, not appended to the previous name, so the path stays
    * constant-length over an unbounded feed) — `feedTag` must be 1:1
    * with the stream's CHECKPOINT, because batch ids only mean
    * anything relative to one checkpoint — the merge is SUCCESS-gated
    * (a replayed merge is skipped, not re-applied), and the probe
    * reads immutable prior dirs — so a crash anywhere between probe,
    * merge, and sink write replays to byte-identical verdicts. Because
    * merge algebra is exact, every generation ≡ one merge of the feed
    * so far, and for id-ordered feeds the verdict union ≡ the one-shot
    * whole-feed probe (LedgerOpsSpec pins both across a restart).
    */
  def shaLedgerAdmit(spark: SparkSession, sfDir: String, feedTag: String,
                     batch: DataFrame, batchId: Long): DataFrame = {
    require(feedTag.matches("[A-Za-z0-9_-]+"),
      s"feedTag must be path-safe, got '$feedTag'")
    val base = shaLedger(spark, sfDir)
    val gen = feedGenDir(base, feedTag) _
    val prev = if (batchId == 0L) base else gen(batchId - 1)
    require(done(prev),
      s"ledger chain broken before batch $batchId: $prev incomplete")
    val verdicts = shaLedgerProbe(spark, prev, batch)
    synchronized { mergeInto(spark, prev, gen(batchId), batch) }
    verdicts
  }

  /** Flat per-generation dir of an admission feed (spec seam). */
  private[ext] def feedGenDir(baseDir: String, feedTag: String)
                             (batchId: Long): String =
    s"${baseDir}__feed_$feedTag/g$batchId"

  /** Retire old SHA-ledger admission generations
    * ([[graft.io.Generations]] retention contract; completeness = the
    * ledger's own rows/groups SUCCESS gate).
    */
  def feedGc(sfDir: String, feedTag: String, keepLast: Int): Seq[Long] =
    graft.io.Generations.gc(ledgerDir(sfDir), feedTag, keepLast, done)

  // ---- gated lifecycle queries ---------------------------------------

  /** The probe batch both gated queries use: the mod-10=5 slice, with
    * every third member's text deterministically REPLACED by a base-
    * slice document's text (`(doc_id-5) div 60 * 60` — always ≡0 mod
    * 10, always ≤ the batch id, so it exists in the contiguous-id
    * fixtures). That is the re-crawl-under-new-id scenario exact dedup
    * exists for, and it makes the fixture non-vacuous: the raw corpus
    * has zero exact duplicates at the gate SF, so without recycling
    * the probe would never fire. Pairs of batch docs share one source
    * (5 and 35 both copy doc 0), so WITHIN-batch duplicate groups are
    * exercised too.
    */
  private[ext] def recycledBatch(spark: SparkSession,
                                 sfDir: String): DataFrame = {
    val d = TextOps.documents(spark, sfDir)
    val src = d.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id").as("src_id"), col("text").as("src_text"))
    d.filter(col("doc_id") % 10 === 5)
      .select(col("doc_id"), col("text"))
      .withColumn("src_id",
        when(col("doc_id") % 30 === 5,
          expr("(doc_id - 5) DIV 60 * 60")).otherwise(lit(null)))
      .join(broadcast(src), Seq("src_id"), "left")
      .select(col("doc_id"),
        coalesce(col("src_text"), col("text")).as("text"))
  }

  /** Gated query: build the base ledger, probe the recycled batch.
    * Verdicts must equal from-scratch exact dedup over base ∪ batch —
    * which is exactly what the oracle states, never having seen the
    * ledger.
    */
  def shaLedgerProbeQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = shaLedger(spark, sfDir)
    Canon.canonicalize(
      shaLedgerProbe(spark, dir, recycledBatch(spark, sfDir)))
  }

  /** SQL twin of the recycled batch + probe verdicts. DuckDB `//`
    * floors and Spark `DIV` truncates — equal here because every
    * operand is non-negative (memory: guard signed divisions).
    */
  val shaLedgerProbeOracle: String = {
    val norm = TextOps.normSql
    s"""WITH base AS (
       |  SELECT doc_id, sha256($norm) AS s
       |  FROM documents WHERE doc_id % 10 = 0),
       |batch AS (
       |  SELECT b.doc_id,
       |         coalesce(s.text, b.text) AS text
       |  FROM documents b LEFT JOIN documents s
       |    ON b.doc_id % 30 = 5
       |   AND s.doc_id = (b.doc_id - 5) // 60 * 60
       |   AND s.doc_id % 10 = 0
       |  WHERE b.doc_id % 10 = 5),
       |brows AS (SELECT doc_id, sha256($norm) AS s FROM batch),
       |bmin AS (SELECT s, min(doc_id) AS bm FROM brows GROUP BY 1),
       |cmin AS (SELECT s, min(doc_id) AS cm FROM base GROUP BY 1),
       |v AS (
       |  SELECT r.doc_id, r.s,
       |         least(coalesce(c.cm, m.bm), m.bm) AS keeper
       |  FROM brows r
       |  JOIN bmin m ON r.s = m.s
       |  LEFT JOIN cmin c ON r.s = c.s)
       |SELECT CAST(doc_id AS BIGINT) AS doc_id, s AS text_sha,
       |       CAST(CASE WHEN doc_id <> keeper THEN keeper
       |                 ELSE -1 END AS BIGINT) AS dup_of,
       |       CAST(CASE WHEN doc_id <> keeper THEN 1
       |                 ELSE 0 END AS BIGINT) AS is_dup
       |FROM v""".stripMargin
  }

  /** Gated lifecycle query: MERGE the recycled batch into the base
    * ledger, then FORGET it again; report the resulting groups table.
    * Because both halves of the algebra are exact, the result must
    * equal a ledger that never saw the batch — the oracle is the
    * from-scratch groups statement over the base slice alone.
    */
  def shaLedgerForgottenQuery(spark: SparkSession,
                              sfDir: String): DataFrame = {
    val batch = recycledBatch(spark, sfDir)
    val merged = shaLedgerMerge(spark, shaLedger(spark, sfDir),
      batch, "recrawl")
    val dir = shaLedgerForget(spark, merged,
      batch.select("doc_id"), "recrawl")
    Canon.canonicalize(readGroups(spark, dir))
  }

  val shaLedgerForgottenOracle: String = {
    val norm = TextOps.normSql
    s"""SELECT sha256($norm) AS text_sha,
       |       CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
       |       CAST(count(*) AS BIGINT) AS n_copies
       |FROM documents WHERE doc_id % 10 = 0
       |GROUP BY 1""".stripMargin
  }
}
