package graft.ext

import java.io.File

import graft.SparkSpec

/** The shared-artifact-tier contract: tier reads are bit-identical to
  * standalone rebuilds (which is what keeps the consumers' standalone
  * DuckDB oracles valid), a second call READS the artifact rather than
  * rebuilding it, and the kill switch really forces standalone paths.
  */
class SharedTierSpec extends SparkSpec {
  import spark.implicits._

  private def mtimes(root: String): Map[String, Long] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    walk(new File(root)).map(f => f.getPath -> f.lastModified()).toMap
  }

  test("lshPairs tier == standalone minhashLsh; second call reads") {
    val tmp = java.nio.file.Files
      .createTempDirectory("lsh-pairs-tier").toString
    System.setProperty("graft.artifact.root", tmp)
    try {
      val standalone = DedupOps.minhashLsh(spark, sfDir)
        .as[(Long, Long, Double)].collect().toSet
      val first = DedupOps.lshPairs(spark, sfDir)
        .as[(Long, Long, Double)].collect().toSet
      assert(first == standalone,
        "tier pairs must equal the standalone build")
      val root = s"$tmp/lsh_pairs"
      assert(new File(root).isDirectory, "no persisted pair artifact")
      val before = mtimes(root)
      val second = DedupOps.lshPairs(spark, sfDir)
        .as[(Long, Long, Double)].collect().toSet
      assert(second == standalone)
      assert(mtimes(root) == before,
        "second call must READ the artifact, not rebuild/rewrite it")
    } finally System.clearProperty("graft.artifact.root")
  }

  test("tfPostings tier == standalone build; second call reads") {
    val tmp = java.nio.file.Files
      .createTempDirectory("bm25-tf-tier").toString
    System.setProperty("graft.artifact.root", tmp)
    try {
      val standalone = TextOps.tfPostings(spark, sfDir, useTier = false)
        .as[(String, Long, String, Long)].collect().toSet
      val first = TextOps.tfPostings(spark, sfDir, useTier = true)
        .as[(String, Long, String, Long)].collect().toSet
      assert(first == standalone,
        "tier postings must equal the standalone build")
      val root = s"$tmp/bm25_tf"
      assert(new File(root).isDirectory, "no persisted tf artifact")
      val before = mtimes(root)
      val second = TextOps.tfPostings(spark, sfDir, useTier = true)
        .as[(String, Long, String, Long)].collect().toSet
      assert(second == standalone)
      assert(mtimes(root) == before,
        "second call must READ the artifact, not rebuild/rewrite it")
    } finally System.clearProperty("graft.artifact.root")
  }

  test("trainTablesShared tier == standalone LM tables; second call reads") {
    val tmp = java.nio.file.Files
      .createTempDirectory("lm-train-tier").toString
    System.setProperty("graft.artifact.root", tmp)
    try {
      def sets(t: (org.apache.spark.sql.DataFrame,
                   org.apache.spark.sql.DataFrame,
                   org.apache.spark.sql.DataFrame)) = (
        t._1.as[(String, String, String, Long)].collect().toSet,
        t._2.as[(String, String, Long)].collect().toSet,
        t._3.as[(String, Long)].collect().toSet)
      val standalone = sets(LmOps.trainTables(spark, sfDir))
      val first = sets(LmOps.trainTablesShared(spark, sfDir))
      assert(first == standalone, "tier LM tables must equal standalone")
      val root = s"$tmp/lm_train"
      assert(new File(root).isDirectory, "no persisted LM artifact")
      val before = mtimes(root)
      val second = sets(LmOps.trainTablesShared(spark, sfDir))
      assert(second == standalone)
      assert(mtimes(root) == before,
        "second call must READ the artifact, not rebuild/rewrite it")
    } finally System.clearProperty("graft.artifact.root")
  }

  test("simhashPairs tier == standalone simhashNearDup; second call reads") {
    val tmp = java.nio.file.Files
      .createTempDirectory("simhash-pairs-tier").toString
    System.setProperty("graft.artifact.root", tmp)
    try {
      val standalone = DedupOps.simhashNearDup(spark, sfDir)
        .as[(String, Long, Long, Long)].collect().toSet
      val first = DedupOps.simhashPairs(spark, sfDir)
        .as[(String, Long, Long, Long)].collect().toSet
      assert(first == standalone,
        "tier pairs must equal the standalone build")
      val root = s"$tmp/simhash_pairs"
      assert(new File(root).isDirectory, "no persisted pair artifact")
      val before = mtimes(root)
      val second = DedupOps.simhashPairs(spark, sfDir)
        .as[(String, Long, Long, Long)].collect().toSet
      assert(second == standalone)
      assert(mtimes(root) == before,
        "second call must READ the artifact, not rebuild/rewrite it")
    } finally System.clearProperty("graft.artifact.root")
  }

  test("videoPairs tier == standalone videoNearDup; second call reads") {
    val tmp = java.nio.file.Files
      .createTempDirectory("video-pairs-tier").toString
    System.setProperty("graft.artifact.root", tmp)
    try {
      val standalone = MultimodalOps.videoNearDup(spark, sfDir)
        .as[(Long, Long, Long, Double)].collect().toSet
      val first = MultimodalOps.videoPairs(spark, sfDir)
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(first == standalone,
        "tier pairs must equal the standalone build")
      val root = s"$tmp/video_pairs"
      assert(new File(root).isDirectory, "no persisted pair artifact")
      val before = mtimes(root)
      val second = MultimodalOps.videoPairs(spark, sfDir)
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(second == standalone)
      assert(mtimes(root) == before,
        "second call must READ the artifact, not rebuild/rewrite it")
    } finally System.clearProperty("graft.artifact.root")
  }

  test("kill switch forces the standalone path (nothing written)") {
    val tmp = java.nio.file.Files
      .createTempDirectory("tier-off").toString
    System.setProperty("graft.artifact.root", tmp)
    System.setProperty("graft.shared.artifacts", "0")
    try {
      DedupOps.lshPairs(spark, sfDir).count()
      TextOps.tfPostings(spark, sfDir, useTier = true).count()
      LmOps.trainTablesShared(spark, sfDir)._1.count()
      DedupOps.simhashPairs(spark, sfDir).count()
      MultimodalOps.videoPairs(spark, sfDir).count()
      assert(!new File(s"$tmp/lsh_pairs").exists(),
        "tier off must not write pair artifacts")
      assert(!new File(s"$tmp/bm25_tf").exists(),
        "tier off must not write tf artifacts")
      assert(!new File(s"$tmp/lm_train").exists(),
        "tier off must not write LM artifacts")
      assert(!new File(s"$tmp/simhash_pairs").exists(),
        "tier off must not write simhash pair artifacts")
      assert(!new File(s"$tmp/video_pairs").exists(),
        "tier off must not write video pair artifacts")
    } finally {
      System.clearProperty("graft.artifact.root")
      System.clearProperty("graft.shared.artifacts")
    }
  }
}
