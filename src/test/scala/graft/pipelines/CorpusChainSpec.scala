package graft.pipelines

import java.io.File
import java.nio.file.Files

import graft.SparkSpec
import graft.io.Manifest

/** The corpus chain's atomic-commit contract: kill the chain mid-way,
  * rerun, and consumers see only the OLD consistent set until the new
  * manifest lands; a tampered/mixed set fails loudly on read.
  */
class CorpusChainSpec extends SparkSpec {

  private def root = CorpusChain.chainRoot(sfDir)

  test("publish → crash → republish: LATEST always names a complete, " +
      "verified set; mid-chain death never disturbs it") {
    // a full run publishes every artifact and flips LATEST
    val m1 = CorpusChain.publish(spark, sfDir, "spec_m1")
    assert(Manifest.latestVersion(root).contains("spec_m1"))
    assert(m1.artifacts.map(_.name) == CorpusChain.artifactTasks.map(_._1))

    // consumers resolve through the manifest and get real data
    val curated = CorpusChain.readArtifact(spark, sfDir, "corpus_curate")
    assert(curated.count() ==
      graft.ext.TextOps.corpusCurate(spark, sfDir).count())

    // CRASH DRILL: the next run dies after one artifact — before any
    // manifest exists for it
    val boom = intercept[IllegalStateException] {
      CorpusChain.publish(spark, sfDir, "spec_m2", failAfter = 1)
    }
    assert(boom.getMessage.contains("simulated crash"))

    // the published set is untouched: LATEST still names spec_m1, every
    // fingerprint still verifies, and consumer paths resolve INTO m1 —
    // nothing of the dead run is visible
    assert(Manifest.latestVersion(root).contains("spec_m1"))
    val still = Manifest.loadLatest(root).get
    assert(still.version == "spec_m1")
    assert(still.artifactPath("corpus_curate").contains("/spec_m1/"))

    // rerun to completion: the new manifest lands and only then does
    // LATEST move
    val m3 = CorpusChain.publish(spark, sfDir, "spec_m3")
    assert(Manifest.latestVersion(root).contains("spec_m3"))
    assert(Manifest.loadLatest(root).get
      .artifactPath("corpus_curate").contains("/spec_m3/"))
    assert(m3.inputs.keySet == Set("documents", "embeddings"))
  }

  test("a tampered artifact fails verification loudly — the manifest " +
      "never vouches for a mixed set") {
    if (Manifest.latestVersion(root).isEmpty)
      CorpusChain.publish(spark, sfDir, "spec_m1")
    val m = Manifest.loadLatest(root).get
    val junk = new File(m.artifactPath("train_split"), "zzz_tamper.bin")
    Files.write(junk.toPath, Array[Byte](1, 2, 3))
    try {
      val ex = intercept[IllegalStateException] {
        Manifest.loadLatest(root)
      }
      assert(ex.getMessage.contains("train_split"))
      assert(ex.getMessage.contains("mixed or tampered"))
    } finally junk.delete()
    // with the foreign bytes gone the set verifies again
    assert(Manifest.loadLatest(root).get.version == m.version)
  }
}
