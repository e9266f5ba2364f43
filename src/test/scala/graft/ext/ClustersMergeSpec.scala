package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the incremental-clustering exactness claim: clustersMerge over
  * (old components, new pairs) equals clustersFromPairs over the pair
  * UNION — for ANY split of the pair set, not just the lifecycle
  * query's permille slices.
  */
class ClustersMergeSpec extends SparkSpec {
  import spark.implicits._

  private def asSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("doc_id").cast("long"), col("cluster_id").cast("long"))
      .as[(Long, Long)].collect().toSet

  test("merge ≡ from-scratch over the union, for three different pair " +
      "splits of the fixture's LSH pairs") {
    val pairs = DedupOps.minhashLsh(spark, sfDir)
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
      .persist()
    val full = asSet(DedupOps.clustersFromPairs(spark, pairs))
    assert(full.nonEmpty)
    val splits: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      // the lifecycle query's slice: both endpoints in the corpus side
      "corpus-slice" ->
        (DedupOps.sideBucket(col("id_a"))
            < DedupOps.incrementalCorpusPermille &&
          DedupOps.sideBucket(col("id_b"))
            < DedupOps.incrementalCorpusPermille),
      // parity of the endpoint sum: interleaves old/new heavily
      "parity" -> ((col("id_a") + col("id_b")) % 2 === 0),
      // degenerate: EVERYTHING is new (old components empty)
      "all-new" -> lit(false))
    for ((name, oldCond) <- splits) {
      val oldC = DedupOps.clustersFromPairs(spark, pairs.filter(oldCond))
      val merged = asSet(
        DedupOps.clustersMerge(spark, oldC, pairs.filter(!oldCond)))
      assert(merged == full,
        s"split '$name': merged ${merged.size} rows != full ${full.size}; " +
          s"missing=${(full -- merged).take(5)} extra=${(merged -- full).take(5)}")
    }
    pairs.unpersist(false)
  }

  test("merge chains two OLD components through a new bridge doc, " +
      "re-rooting everything to the global min") {
    // components {1,5} (rep 1) and {3,9} (rep 3); new doc 7 bridges them
    val oldC = Seq((1L, 1L), (5L, 1L), (3L, 3L), (9L, 3L))
      .toDF("doc_id", "cluster_id")
    val newPairs = Seq((5L, 7L), (7L, 9L)).toDF("id_a", "id_b")
    val got = asSet(DedupOps.clustersMerge(spark, oldC, newPairs))
    assert(got == Set((1L, 1L), (5L, 1L), (3L, 1L), (9L, 1L), (7L, 1L)),
      got.toString)
  }

  test("a re-crawled endpoint (already clustered) condenses to its " +
      "representative, never to itself") {
    // component {2,4} (rep 2); a new pair touches member 4 directly
    val oldC = Seq((2L, 2L), (4L, 2L)).toDF("doc_id", "cluster_id")
    val newPairs = Seq((4L, 8L)).toDF("id_a", "id_b")
    val got = asSet(DedupOps.clustersMerge(spark, oldC, newPairs))
    assert(got == Set((2L, 2L), (4L, 2L), (8L, 2L)), got.toString)
  }
}
