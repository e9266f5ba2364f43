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

  test("LSH-fed clusters merge every verified LSH pair") {
    val pairs = DedupOps.minhashLsh(spark, sfDir)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val clusters = DedupOps.dedupClustersLsh(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    pairs.foreach { case (a, b) =>
      assert(clusters.contains(a) && clusters.contains(b))
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
      assert(clusters(a) <= math.min(a, b))
    }
  }

  test("label propagation converges on a path graph deeper than the " +
      "checkpoint interval") {
    // A 14-node path has diameter 13 — min-label propagation needs many
    // rounds, crossing the localCheckpoint boundary several times; the
    // whole path must still collapse to the minimum id.
    val n = 14
    val path = (1 until n).map(i => (i.toLong, (i + 1).toLong))
      .toDF("id_a", "id_b")
    val clusters = DedupOps.clustersFromPairs(spark, path,
        driverThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(clusters.size == n)
    assert(clusters.values.forall(_ == 1L), s"non-min labels: $clusters")
  }

  test("clusterSizes is an exact recount of the LSH cluster families") {
    val members = DedupOps.dedupClustersLsh(spark, sfDir)
      .as[(Long, Long)].collect()
    val expected = members.groupBy(_._2).values.map(_.size.toLong)
      .groupBy(identity).map { case (s, xs) =>
        s -> ((xs.size.toLong, s * xs.size, (s - 1) * xs.size))
      }
    val got = DedupOps.clusterSizes(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == expected)
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
