package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the batch-sized cluster-forget exactness claims:
  *
  *  - fundamental: clustersForget(clusters(P), G, P) equals
  *    clustersFromPairs over P restricted to non-G endpoints, for ANY
  *    pair set and ANY forgotten-doc set (the from-scratch definition
  *    the operator replaces with affected-component-only work);
  *  - lifecycle: forget(merge(base, X), X) ≡ base — adding a batch and
  *    forgetting it again leaves no residue;
  *  - the two hard shapes re-clustering must get right: DISCONNECTION
  *    (forgetting a cut vertex splits a component) and REPRESENTATIVE
  *    LOSS (forgetting the min-id member renames the cluster).
  */
class ClustersForgetSpec extends SparkSpec {
  import spark.implicits._

  private def asSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("doc_id").cast("long"), col("cluster_id").cast("long"))
      .as[(Long, Long)].collect().toSet

  test("forget ≡ from-scratch over the surviving pair graph, for " +
      "several forget sets over the fixture's LSH pairs") {
    val pairs = DedupOps.minhashLsh(spark, sfDir)
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
      .persist()
    val base = DedupOps.clustersFromPairs(spark, pairs)
    val members = pairs.select(col("id_a").as("doc_id"))
      .union(pairs.select(col("id_b").as("doc_id"))).distinct()
    assert(asSet(base).nonEmpty)
    val goneSets: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      // the lifecycle query's slice: every non-corpus doc
      "batch-slice" -> members.filter(
        DedupOps.sideBucket(col("doc_id"))
          >= DedupOps.incrementalCorpusPermille),
      // parity: scatters deletions through every component, hitting
      // min-id representatives and cut vertices alike
      "parity" -> members.filter(col("doc_id") % 2 === 0),
      // degenerate: forget nothing (must be the identity)
      "empty" -> members.filter(lit(false)),
      // degenerate: forget EVERY clustered doc (must be empty)
      "all" -> members)
    for ((name, gone) <- goneSets) {
      val g = gone.persist()
      val survPairs = pairs
        .join(g.withColumnRenamed("doc_id", "id_a"), Seq("id_a"),
          "left_anti")
        .join(g.withColumnRenamed("doc_id", "id_b"), Seq("id_b"),
          "left_anti")
      val expected = asSet(DedupOps.clustersFromPairs(spark, survPairs))
      val got = asSet(DedupOps.clustersForget(spark, base, g, pairs))
      assert(got == expected,
        s"forget set '$name': got ${got.size} rows, expected " +
          s"${expected.size}; missing=${(expected -- got).take(5)} " +
          s"extra=${(got -- expected).take(5)}")
      g.unpersist(false)
    }
    pairs.unpersist(false)
  }

  test("forget(merge(base, X), X) ≡ base: the add-then-forget round " +
      "trip leaves no residue") {
    val pairs = DedupOps.minhashLsh(spark, sfDir)
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
      .persist()
    def inCorpus(c: org.apache.spark.sql.Column) =
      DedupOps.sideBucket(c) < DedupOps.incrementalCorpusPermille
    val oldPairs = pairs.filter(inCorpus(col("id_a")) &&
      inCorpus(col("id_b")))
    val newPairs = pairs.filter(!(inCorpus(col("id_a")) &&
      inCorpus(col("id_b"))))
    val base = DedupOps.clustersFromPairs(spark, oldPairs)
    val merged = DedupOps.clustersMerge(spark, base, newPairs)
    val gone = pairs.select(col("id_a").as("doc_id"))
      .union(pairs.select(col("id_b").as("doc_id")))
      .filter(!inCorpus(col("doc_id"))).distinct()
    val got = asSet(DedupOps.clustersForget(spark, merged, gone, pairs))
    assert(got == asSet(base),
      s"round-trip residue: got ${got.size} vs base rows")
    pairs.unpersist(false)
  }

  test("forgetting a cut vertex DISCONNECTS: the path splits, stranded " +
      "singletons drop, and an untouched component passes through") {
    // path 1-2-3-4 (component rep 1) plus separate pair {10,11}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val base = DedupOps.clustersFromPairs(spark, pairs)
    assert(asSet(base) == Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (10L, 10L), (11L, 10L)))
    // forget the cut vertex 2: doc 1 loses its every pair (drops as a
    // singleton), {3,4} survive as a NEW component rooted at 3, and
    // {10,11} is untouched
    val got = asSet(DedupOps.clustersForget(spark, base,
      Seq(2L).toDF("doc_id"), pairs))
    assert(got == Set((3L, 3L), (4L, 3L), (10L, 10L), (11L, 10L)),
      got.toString)
  }

  test("forgetting the min-id member RENAMES the cluster to the " +
      "surviving min") {
    // triangle {1,2,3}: still connected without doc 1, new rep 2
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id_a", "id_b")
    val base = DedupOps.clustersFromPairs(spark, pairs)
    val got = asSet(DedupOps.clustersForget(spark, base,
      Seq(1L).toDF("doc_id"), pairs))
    assert(got == Set((2L, 2L), (3L, 2L)), got.toString)
  }

  test("a forgotten doc unknown to the component table is a no-op") {
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val base = DedupOps.clustersFromPairs(spark, pairs)
    val got = asSet(DedupOps.clustersForget(spark, base,
      Seq(99L).toDF("doc_id"), pairs))
    assert(got == Set((1L, 1L), (2L, 1L)), got.toString)
  }
}
