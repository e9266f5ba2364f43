package graft.ext

import java.io.File

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Merge/forget algebra for the BPE and IVF artifacts — closing the
  * lifecycle asymmetry with the LSH and LM indexes (LshIndexMergeSpec /
  * LmOpsSpec are the pattern):
  *
  *  - BPE: the word-count LEDGER is exactly additive/subtractive and
  *    retraining from an identical ledger is deterministic, so
  *    merged ≡ rebuilt and merge-then-forget ≡ base hold bit-for-bit;
  *  - IVF: posting lists are per-vector state under a FROZEN codebook,
  *    so merge = encode-and-append ≡ re-encode of the union, forget =
  *    anti-join ≡ re-encode of the survivors, and the codebook itself
  *    never moves (rebuild-with-fingerprint is its refresh story —
  *    see the lifecycle scaladoc in VectorOps).
  */
class ArtifactLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def sameRows(a: DataFrame, b: DataFrame): Boolean =
    a.except(b).isEmpty && b.except(a).isEmpty

  private def mtimes(d: String): Map[String, Long] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new File(d)).map(f => f.getPath -> f.lastModified()).toMap
  }

  test("BPE lifecycle: merged ≡ trained-on-union; forget round trip ≡ " +
      "base; ledger algebra exact; base index only read") {
    val tmp = java.nio.file.Files.createTempDirectory("bpe-lc").toString
    System.setProperty("graft.artifact.root", tmp)
    try {
      val odd = TextOps.documents(spark, sfDir)
        .filter(col("doc_id") % 2 === 1)
      val baseDir = BpeOps.bpeIndex(spark, sfDir)
      val before = mtimes(baseDir)

      val mergedDir = BpeOps.bpeIndexMerge(spark, sfDir, odd, "spec-odd")
      assert(mtimes(baseDir) == before,
        "merge must only READ the base index")
      // merged ledger ≡ the full corpus word count
      val fullWords = TextOps.documents(spark, sfDir)
        .repartition(col("doc_id"))
        .select(explode(CurationOps.toksCol).as("w"))
        .groupBy("w").agg(count(lit(1)).as("f"))
      assert(sameRows(spark.read.parquet(s"$mergedDir/words"), fullWords),
        "merged word ledger ≠ full-corpus count")
      // merged merges ≡ training on the whole fixture (the oracle-gated
      // q_bpe_train path)
      val merged = spark.read.parquet(s"$mergedDir/merges")
        .as[(Int, Int, String, String, String, Long)].collect().sortBy(_._1)
      val full = BpeOps.bpeTrain(spark, sfDir)
        .as[(Long, Long, String, String, String, Long)].collect()
        .sortBy(_._1)
        .map(t => (t._1.toInt, t._2.toInt, t._3, t._4, t._5, t._6))
      assert(merged.toSeq == full.toSeq, "merged merges ≠ full-train")

      // forget the odd half again: ledger AND merges return to base
      val fDir = BpeOps.bpeIndexForget(spark, mergedDir, odd, "spec-odd")
      assert(sameRows(spark.read.parquet(s"$fDir/words"),
        spark.read.parquet(s"$baseDir/words")),
        "forget did not restore the base ledger")
      assert(sameRows(spark.read.parquet(s"$fDir/merges"),
        spark.read.parquet(s"$baseDir/merges")),
        "forget did not restore the base merges")
    } finally System.clearProperty("graft.artifact.root")
  }

  test("IVF lifecycle: merged postings ≡ re-encode of the union; forget " +
      "≡ base bit-for-bit; codebook frozen; base index only read") {
    val tmp = java.nio.file.Files.createTempDirectory("ivf-lc").toString
    System.setProperty("graft.artifact.root", tmp)
    try {
      val baseDir = VectorOps.ivfIndex(spark, sfDir)
      val before = mtimes(baseDir)
      val mid = VectorOps.embeddings(spark, sfDir)
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
        .filter(DedupOps.sideBucket(col("vec_id"))
            >= DedupOps.incrementalCorpusPermille &&
          DedupOps.sideBucket(col("vec_id"))
            < DedupOps.mergeProbePermille)
      assert(mid.count() > 0, "empty merge slice — vacuous")

      val mergedDir = VectorOps.ivfIndexMerge(spark, sfDir, mid, "spec-mid")
      assert(mtimes(baseDir) == before,
        "merge must only READ the base index")
      // codebook frozen across the merge
      assert(sameRows(spark.read.parquet(s"$mergedDir/centroids"),
        spark.read.parquet(s"$baseDir/centroids")), "codebook moved")
      // merged postings ≡ base postings + the batch encoded under the
      // SAME codebook (per-vector function — re-derive independently)
      val cents = spark.read.parquet(s"$baseDir/centroids")
        .as[(Long, Seq[Double])].collect().sortBy(_._1)
      def nearest(v: Seq[Double]): Long = {
        def cos(a: Seq[Double], b: Seq[Double]): Double = {
          var d = 0.0; var na = 0.0; var nb = 0.0
          var i = 0
          while (i < a.length) {
            d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
          }
          d / (math.sqrt(na) * math.sqrt(nb))
        }
        cents.map { case (id, cv) => (cos(cv, v), -id) }
          .zip(cents.map(_._1)).maxBy(_._1)._2
      }
      val batchExpected = mid.as[(Long, Seq[Double])].collect()
        .map { case (id, v) => id -> nearest(v) }.toMap
      val mergedPost = spark.read.parquet(s"$mergedDir/postings")
        .select("vec_id", "bucket").as[(Long, Long)].collect().toMap
      val basePost = spark.read.parquet(s"$baseDir/postings")
        .select("vec_id", "bucket").as[(Long, Long)].collect().toMap
      assert(mergedPost.size == basePost.size + batchExpected.size)
      basePost.foreach { case (id, b) =>
        assert(mergedPost(id) == b, s"base vec $id moved buckets")
      }
      batchExpected.foreach { case (id, b) =>
        assert(mergedPost(id) == b,
          s"batch vec $id: merged bucket ${mergedPost(id)} != recompute $b")
      }

      // forget the batch: postings return to base EXACTLY
      val fDir = VectorOps.ivfIndexForget(spark, mergedDir,
        mid.select("vec_id"), "spec-mid")
      assert(sameRows(spark.read.parquet(s"$fDir/postings"),
        spark.read.parquet(s"$baseDir/postings")),
        "forget did not restore base postings")
      assert(sameRows(spark.read.parquet(s"$fDir/centroids"),
        spark.read.parquet(s"$baseDir/centroids")))

      // and the probe path sees identical results through base vs the
      // merge-then-forget round trip
      val probes = VectorOps.embeddings(spark, sfDir)
        .select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
        .filter(DedupOps.sideBucket(col("vec_id"))
          >= DedupOps.mergeProbePermille)
        .orderBy("vec_id").limit(5)
        .select(col("vec_id").as("probe_id"), col("v").as("pv"))
      val viaBase = VectorOps.probeIvfIndexTables(
          spark.read.parquet(s"$baseDir/centroids"),
          spark.read.parquet(s"$baseDir/postings"), probes)
        .as[(Long, Long, Long, Double)].collect().toSet
      val viaRoundTrip = VectorOps.probeIvfIndexTables(
          spark.read.parquet(s"$fDir/centroids"),
          spark.read.parquet(s"$fDir/postings"), probes)
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(viaBase == viaRoundTrip)
      assert(viaBase.nonEmpty, "probe fixture vacuous")
    } finally System.clearProperty("graft.artifact.root")
  }
}
