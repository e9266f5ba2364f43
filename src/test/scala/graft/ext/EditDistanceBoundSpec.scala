package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the bounded edit-distance verifier (length-ratio prefilter +
  * banded `levenshtein(l, r, bound)`) to the unbounded formulation on
  * pairs that cross the similarity threshold in both directions,
  * including the exact-boundary case edit_sim == editSimThreshold.
  */
class EditDistanceBoundSpec extends SparkSpec {
  import spark.implicits._

  test("bounded verify ≡ unbounded DP on threshold-crossing pairs") {
    // no 'x' in the base, so replacing the last k chars is exactly k edits
    val base = "the quick brown fox jumps over the happy dog again and again"
    def mutate(k: Int): String = base.dropRight(k) + ("x" * k)
    val pairs = (0 to 20).map(k => (k.toLong, base, mutate(k))) ++ Seq(
      (100L, base, base.take(10)), // length gap kills it in the prefilter
      (101L, "aaaaaaaaaa", "aaaaaaaabb"), // lev=2, mx=10: sim == 0.8 exactly
      (102L, "aaaaaaaaaa", "aaaaaaabbb"), // lev=3: inside the +1 bound, dropped
      (103L, "aaaaaaaaaa", "aaaabbbbbb")) // lev=6: past the bound (−1 path)
    val df = pairs.toDF("id", "norm_a", "norm_b")

    val bounded = DedupOps.editVerify(df)
      .select("id", "lev", "edit_sim")
      .as[(Long, Long, Double)].collect().toSet
    val unbounded = df
      .withColumn("lev",
        levenshtein(col("norm_a"), col("norm_b")).cast("long"))
      .withColumn("edit_sim",
        lit(1.0) - col("lev").cast("double") /
          greatest(length(col("norm_a")), length(col("norm_b")))
            .cast("double"))
      .filter(col("edit_sim") >= DedupOps.editSimThreshold)
      .select("id", "lev", "edit_sim")
      .as[(Long, Long, Double)].collect().toSet

    assert(bounded == unbounded)
    // the fixture really crosses the threshold in both directions
    assert(unbounded.nonEmpty && unbounded.size < pairs.size)
    // the exact-boundary pair (sim == threshold) is retained
    assert(bounded.exists(_._1 == 101L))
  }
}
