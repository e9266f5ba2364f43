package graft.ext

import graft.SparkSpec

class DedupClustersSpec extends SparkSpec {
  import spark.implicits._

  test("distributed label propagation equals driver union-find") {
    val viaDriver = DedupOps.dedupClusters(spark, sfDir)
      .as[(Long, Long)].collect().toSet
    val viaDistributed = DedupOps
      .dedupClusters(spark, sfDir, driverThreshold = 0L)
      .as[(Long, Long)].collect().toSet
    assert(viaDriver == viaDistributed)
  }

  test("cluster labels are the component minimum and include both endpoints") {
    val pairs = DedupOps.jaccardBlocked(spark, sfDir)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val clusters = DedupOps.dedupClusters(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    pairs.foreach { case (a, b) =>
      assert(clusters.contains(a) && clusters.contains(b))
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
      assert(clusters(a) <= math.min(a, b))
    }
  }
}
