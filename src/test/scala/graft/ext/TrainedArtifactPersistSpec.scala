package graft.ext

import java.io.File

import graft.SparkSpec

/** The persisted-trained-artifact contract for the IVF centroid/PQ and
  * BPE merge caches: after a (simulated) JVM restart, results reload
  * from the SUCCESS-gated disk artifact instead of retraining — and are
  * bit-identical to the first run.
  */
class TrainedArtifactPersistSpec extends SparkSpec {
  import spark.implicits._

  private def mtimes(root: String): Map[String, Long] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    walk(new File(root)).map(f => f.getPath -> f.lastModified()).toMap
  }

  test("IVF centroids + PQ codebooks survive a simulated restart") {
    val tmp = java.nio.file.Files
      .createTempDirectory("ivf-persist").toString
    System.setProperty("graft.artifact.root", tmp)
    try {
      VectorOps.clearMemos()
      val first = VectorOps.annIvfPq(spark, sfDir)
        .as[(Long, Long, Long, Double)].collect().toSet
      val idxRoot = s"$tmp/ivf_index"
      assert(new File(idxRoot).isDirectory, "no persisted index artifact")
      val before = mtimes(idxRoot)
      assert(before.keys.exists(_.contains("/centroids/")) &&
        before.keys.exists(_.contains("/pq_")), before.keys.toString)
      // "restart": the JVM memo is gone, the disk artifact remains
      VectorOps.clearMemos()
      val second = VectorOps.annIvfPq(spark, sfDir)
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(second == first)
      assert(mtimes(idxRoot) == before,
        "reload must READ the artifact, not retrain/rewrite it")
    } finally System.clearProperty("graft.artifact.root")
  }

  test("BPE merge table survives a simulated restart") {
    val tmp = java.nio.file.Files
      .createTempDirectory("bpe-persist").toString
    System.setProperty("graft.artifact.root", tmp)
    try {
      BpeOps.clearMemos()
      val first = BpeOps.bpeTrain(spark, sfDir)
        .as[(Long, Long, String, String, String, Long)].collect().toSet
      val idxRoot = s"$tmp/bpe_index"
      assert(new File(idxRoot).isDirectory, "no persisted merges artifact")
      val before = mtimes(idxRoot)
      BpeOps.clearMemos()
      val second = BpeOps.bpeTrain(spark, sfDir)
        .as[(Long, Long, String, String, String, Long)].collect().toSet
      assert(second == first)
      assert(mtimes(idxRoot) == before,
        "reload must READ the artifact, not retrain/rewrite it")
    } finally System.clearProperty("graft.artifact.root")
  }

}
