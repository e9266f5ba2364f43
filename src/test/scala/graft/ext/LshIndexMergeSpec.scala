package graft.ext

import java.io.File

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the lshIndexMerge contract:
  *  1. merged tables ≡ a from-scratch build over corpus ∪ batch
  *     (including a RE-CRAWLED doc_id present on both sides, whose
  *     signature must equal the signature of its combined shingle set —
  *     the SignatureMin algebra end-to-end);
  *  2. probing the merged index ≡ probing the rebuilt index;
  *  3. the base index is only READ: its files' mtimes do not move, and
  *     the merge plan never touches the corpus text.
  */
class LshIndexMergeSpec extends SparkSpec {
  import spark.implicits._

  /** From-scratch index tables over explicit (doc_id, text) docs, with
    * multi-version doc_ids combined at the SHINGLE-SET level (the
    * semantic a re-crawl merge promises): sh = union of versions' sets,
    * sig = MinHashSignature of that union.
    */
  private def rebuildTables(docs: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val sets = DedupOps.shingleSets(
        docs.repartition(col("doc_id"))
          .withColumn("norm", TextOps.normText(col("text"))))
      .groupBy("doc_id")
      .agg(array_sort(array_distinct(flatten(collect_list(col("sh")))))
        .as("sh"))
    val sigs = sets.select(col("doc_id"),
      graft.functions.MinHashSignature(col("sh")).as("sig"))
    val bands = DedupOps.bandsOfSigs(sigs)
    (sets, sigs, bands)
  }

  /** Symmetric set-difference emptiness — table equality without
    * committing to the exact column types.
    */
  private def sameRows(a: DataFrame, b: DataFrame): Boolean =
    a.except(b).isEmpty && b.except(a).isEmpty

  test("merged index ≡ rebuilt index (tables, probe, re-crawl algebra, mtimes)") {
    // corpus = the slice the shipped base index covers
    val corpusDocs = TextOps.documents(spark, sfDir)
      .filter(DedupOps.sideBucket(col("doc_id"))
        < DedupOps.incrementalCorpusPermille)
      .select("doc_id", "text")
    // batch = remaining docs PLUS a re-crawled version of one corpus doc
    // (same doc_id, extended text → its shingle set strictly grows)
    val recrawlId = corpusDocs.select(min("doc_id")).as[Long].head()
    val recrawl = corpusDocs.filter(col("doc_id") === recrawlId)
      .select(col("doc_id"),
        concat(col("text"), lit(" freshly recrawled trailing paragraph " +
          "with enough words to shingle")).as("text"))
    val batchDocs = DedupOps.incrementalBatchDocs(spark, sfDir).union(recrawl)

    // base index on disk, then record its file mtimes
    DedupOps.lshIndex(spark, sfDir)
    val baseDir = DedupOps.lshIndexDir(sfDir)
    def mtimes(d: String): Map[String, Long] = {
      def walk(f: File): Seq[File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new File(d)).map(f => f.getPath -> f.lastModified()).toMap
    }
    val before = mtimes(baseDir)

    val mergedDir =
      DedupOps.lshIndexMerge(spark, sfDir, batchDocs, "spec-merge")
    assert(mtimes(baseDir) == before,
      "merge must only READ the base index, never rewrite it")

    val (mBands, mSh, mSigs) = DedupOps.readLshIndex(spark, mergedDir)
    val (rSets, rSigs, rBands) = rebuildTables(corpusDocs.union(batchDocs))

    // 1. table equality, as sets of rows
    assert(sameRows(mSh, rSets), "merged shingle payloads ≠ rebuilt")
    assert(sameRows(mSigs, rSigs), "merged signatures ≠ rebuilt")
    assert(sameRows(mBands, rBands), "merged band table ≠ rebuilt")

    // the re-crawled doc really exercised the min algebra: its merged
    // shingle set strictly contains the base version's
    val baseSh = spark.read.parquet(s"$baseDir/shingles")
      .filter(col("doc_id") === recrawlId).as[(Long, Seq[Long])]
      .head()._2.toSet
    val mergedRecrawlSh = mSh.filter(col("doc_id") === recrawlId)
      .as[(Long, Seq[Long])].head()._2.toSet
    assert(baseSh.subsetOf(mergedRecrawlSh) && mergedRecrawlSh != baseSh)

    // 2. probe equivalence on a fresh probe set (unseen doc_ids whose
    // text near-duplicates merged-index content)
    val probeDocs = TextOps.documents(spark, sfDir)
      .orderBy("doc_id").limit(20)
      .select((col("doc_id") + 5000000L).as("doc_id"),
        concat(col("text"), lit(" tail")).as("text"))
    val viaMerged = DedupOps
      .probeLshIndexTables(spark, mBands, mSh, probeDocs)
      .as[(Long, Long, Double)].collect().toSet
    val viaRebuilt = DedupOps
      .probeLshIndexTables(spark, rBands,
        rSets.select(col("doc_id"), col("sh")), probeDocs)
      .as[(Long, Long, Double)].collect().toSet
    assert(viaMerged == viaRebuilt, "probe results diverge")
    assert(viaMerged.nonEmpty, "probe fixture found no near-dups — vacuous")
  }

  test("forget: merge a slice in, forget it — tables return to base exactly") {
    DedupOps.lshIndex(spark, sfDir) // base on disk
    val baseDir = DedupOps.lshIndexDir(sfDir)
    val mid = TextOps.documents(spark, sfDir)
      .filter(DedupOps.sideBucket(col("doc_id"))
          >= DedupOps.incrementalCorpusPermille &&
        DedupOps.sideBucket(col("doc_id"))
          < DedupOps.mergeProbePermille)
      .select("doc_id", "text")
    val mergedDir =
      DedupOps.lshIndexMerge(spark, sfDir, mid, "spec-forget-merge")
    val fDir = DedupOps.lshIndexForget(spark, mergedDir,
      mid.select("doc_id"), "spec-forget")
    // per-doc state only: filtering the merged tables IS the rebuild
    // without those docs, i.e. the base tables bit-for-bit
    for (t <- Seq("sigs", "shingles", "bands")) {
      assert(sameRows(
        spark.read.parquet(s"$fDir/$t"),
        spark.read.parquet(s"$baseDir/$t")), s"table $t diverges")
    }
    // and the forgotten ids are really gone
    val gone = spark.read.parquet(s"$fDir/sigs")
      .join(mid.select("doc_id"), Seq("doc_id"), "left_semi").count()
    assert(gone == 0L)
  }

  test("forget semantics on a re-crawled doc: whole-document removal; " +
      "retract-one-version = forget then re-merge the survivor") {
    DedupOps.lshIndex(spark, sfDir) // base on disk
    val baseDir = DedupOps.lshIndexDir(sfDir)
    val corpusDocs = TextOps.documents(spark, sfDir)
      .filter(DedupOps.sideBucket(col("doc_id"))
        < DedupOps.incrementalCorpusPermille)
      .select("doc_id", "text")
    // a corpus doc re-crawled with extra text, merged in — its merged
    // row is now the FOLD of both versions
    val recrawlId = corpusDocs.select(min("doc_id")).as[Long].head()
    val baseVersion = corpusDocs.filter(col("doc_id") === recrawlId)
    val recrawl = baseVersion.select(col("doc_id"),
      concat(col("text"), lit(" recrawled trailing words that shingle "
        + "differently enough to grow the set")).as("text"))
    val mergedDir =
      DedupOps.lshIndexMerge(spark, sfDir, recrawl, "spec-recrawl")

    // forget the doc_id: EVERY version goes — the folded row is gone
    // entirely, not restored to its base-only state
    val fDir = DedupOps.lshIndexForget(spark, mergedDir,
      Seq(recrawlId).toDF("doc_id"), "spec-recrawl-forget")
    for (t <- Seq("sigs", "shingles", "bands"))
      assert(spark.read.parquet(s"$fDir/$t")
        .filter(col("doc_id") === recrawlId).isEmpty,
        s"forget must remove the whole document from $t")

    // retracting only the re-crawl = forget + re-merge the surviving
    // base text (merge onto an absent doc_id is an insert): the result
    // tables must equal the base index's bit-for-bit
    val rDir = DedupOps.lshIndexMergeInto(spark, fDir, baseVersion,
      "spec-recrawl-restore")
    for (t <- Seq("sigs", "shingles", "bands"))
      assert(sameRows(
        spark.read.parquet(s"$rDir/$t"),
        spark.read.parquet(s"$baseDir/$t")),
        s"forget-then-remerge did not restore base state in $t")
  }
}
