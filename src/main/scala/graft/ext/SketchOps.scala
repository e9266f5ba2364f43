package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Canon

/** Approximate-sketch twins of the exact aggregates — the forms a 100 TB
  * run reaches for when the exact operator's cost profile stops fitting:
  *
  *  - `approx_count_distinct` (HyperLogLog++) beside the exact
  *    `countDistinct` of the supplier mart (SURVEY §2.5 A3): the exact
  *    form shuffles every distinct (group, value) pair; the sketch
  *    carries a fixed-size register array per group through map-side
  *    combine — constant state per group regardless of cardinality.
  *  - `percentile_approx` (Greenwald-Khanna) beside the exact
  *    interpolated `percentile` of EventOps.groupPercentiles: the exact
  *    form materializes and sorts each group's full value list; the
  *    sketch is a bounded quantile summary mergeable across partitions.
  *
  * These are LIBRARY operators with property specs, not driver queries:
  * no cross-engine oracle exists by nature (HLL++ register layouts and
  * GK summaries are engine-specific), so correctness is stated as error
  * bounds against the exact twins plus determinism — exactly the
  * contract a user of the sketch gets (see SketchOpsSpec).
  *
  * The one exception is [[heavyHitters]]: its sketch (Misra-Gries) only
  * GENERATES candidates and an exact pass verifies them, so its output
  * is exact whenever the MG bound clears — it ships as a driver query
  * sharing the exact topTokens oracle.
  */
object SketchOps {

  /** Relative standard deviation for the HLL++ sketch. Spark's default;
    * kept explicit so the spec's error-bound claim names its parameter.
    */
  val hllRsd = 0.05

  /** Per-supplier product-cardinality twin of the mart's exact
    * countDistinct: same grouping, sketched distinct count. At scale the
    * winner whenever the distinct-value set per group is large (the
    * shuffle carries HLL registers, not values).
    */
  def supplierDistinctProductsApprox(spark: SparkSession, sfDir: String,
                                     rsd: Double = hllRsd): DataFrame = {
    val sales = graft.retail.Retail.sales(spark, sfDir)
    Canon.canonicalize(sales
      .groupBy(col("SUPPLIER_ID").as("supplier_id"))
      .agg(approx_count_distinct(col("PRODUCT_ID"), rsd)
        .as("approx_distinct_products")))
  }

  /** Exact twin used by the error-bound spec (same input, same grain). */
  def supplierDistinctProductsExact(spark: SparkSession,
                                    sfDir: String): DataFrame = {
    val sales = graft.retail.Retail.sales(spark, sfDir)
    Canon.canonicalize(sales
      .groupBy(col("SUPPLIER_ID").as("supplier_id"))
      .agg(countDistinct(col("PRODUCT_ID")).as("distinct_products")))
  }

  /** Accuracy knob for the GK sketch: maximum rank error is
    * 1/accuracy of the group size. 10000 → 0.01% rank error.
    */
  val percentileAccuracy = 10000

  /** Approximate twin of EventOps.groupPercentiles: same groups, same
    * probe points, Greenwald-Khanna summaries instead of full per-group
    * sorts. Rank-error contract: the returned value's rank is within
    * n/accuracy of the requested quantile's rank.
    */
  def groupPercentilesApprox(spark: SparkSession, sfDir: String,
                             accuracy: Int = percentileAccuracy)
      : DataFrame = {
    val e = EventOps.events(spark, sfDir)
    Canon.canonicalize(e.groupBy("event_type").agg(
      percentile_approx(col("value"), lit(0.5), lit(accuracy)).as("p50"),
      percentile_approx(col("value"), lit(0.9), lit(accuracy)).as("p90"),
      percentile_approx(col("value"), lit(0.99), lit(accuracy)).as("p99")))
  }

  /** Count-Min parameters: estimate ≤ true + eps·N with probability
    * ≥ confidence, and NEVER below true (one-sided error) — the frequency
    * member of the sketch family beside HLL (cardinality) and GK
    * (quantiles). eps 0.0001 → width 2⁷-ish·e buckets; tiny vs a token
    * dictionary.
    */
  val cmsEps = 0.0001
  val cmsConfidence = 0.99
  val cmsSeed = 42

  /** Per-lang token document-frequency sketch: the same distinct
    * (doc, token) stream the exact topTokens aggregates, folded into one
    * fixed-size Count-Min sketch per lang via Spark's codegen'd
    * `count_min_sketch` aggregate. The shuffle carries sketch bytes, not
    * (token, count) pairs — constant per-group state regardless of
    * vocabulary size, the same scale trade as the HLL twin.
    */
  def tokenFrequencySketch(spark: SparkSession, sfDir: String): DataFrame = {
    val tok = TextOps.documents(spark, sfDir)
      .repartition(col("doc_id"))
      .select(col("lang"), col("doc_id"),
        explode(array_distinct(
          split(TextOps.normText(col("text")), " "))).as("token"))
      .filter(col("token") =!= "")
    tok.groupBy("lang").agg(
      count_min_sketch(col("token"), lit(cmsEps), lit(cmsConfidence),
        lit(cmsSeed)).as("cms"),
      count(lit(1)).as("n_stream"))
  }

  /** Driver-side point queries against a collected sketch — the read API
    * a candidate-driven heavy-hitter pass uses (CMS answers "how often
    * did X occur", not "what occurred"; candidates come from elsewhere,
    * e.g. a per-partition pre-pass or a dictionary).
    */
  def estimateCounts(sketchBytes: Array[Byte],
                     tokens: Seq[String]): Map[String, Long] = {
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketchBytes))
    tokens.map(t => t -> cms.estimateCount(t)).toMap
  }

  /** Misra-Gries summary size for [[heavyHitters]]. Per partition of
    * n_p stream items the summary's undercount is ≤ n_p/m, so any key
    * whose TRUE global frequency exceeds Σ_p n_p/m = n/m survives into
    * the candidate set (the classic MG guarantee, summed over
    * partitions). 4096 counters ≈ 64 KB per task — fixed, regardless of
    * vocabulary size.
    */
  val mgSummarySize = 4096

  /** Bounded-memory MG pass over one partition's iterator: the ONLY
    * imperative per-partition logic in the repo's approx family —
    * exactly the case the architecture reserves `mapPartitions` for
    * (per-partition state with a decrement step no builtin aggregate
    * expresses). Emits the surviving keys; counts are NOT emitted
    * because MG counts are lower bounds and the exact pass below
    * re-counts candidates anyway.
    */
  private[ext] def mgKeys[T](it: Iterator[T], m: Int): Iterator[T] = {
    val counts = scala.collection.mutable.HashMap.empty[T, Long]
    it.foreach { k =>
      if (counts.contains(k)) counts(k) += 1L
      else if (counts.size < m) counts(k) = 1L
      else {
        // decrement-all; amortized O(1)/item (each decrement cancels
        // one prior increment, so total decrements ≤ total items).
        // Iterate a key snapshot — mutating a mutable.HashMap while
        // iterating it is undefined, even for value updates.
        counts.keys.toList.foreach { key =>
          val c = counts(key)
          if (c == 1L) counts.remove(key) else counts(key) = c - 1L
        }
      }
    }
    counts.keysIterator
  }

  /** Exact top-k heavy hitters by document frequency, per lang — the
    * same contract as TextOps.topTokens, computed the way a 100 TB
    * corpus has to when even `groupBy(token)` is too hot to run over the
    * full stream: (1) each partition reduces its stream to ≤ m
    * Misra-Gries survivors (constant memory, one pass); (2) the union of
    * survivors — ≤ m·partitions keys, independent of vocabulary — is
    * broadcast back as a semi-join filter; (3) ONLY candidate keys are
    * exactly counted and ranked (TopKPerKey heap, no vocabulary sort).
    *
    * Exactness: a true top-k key with frequency > n/m is guaranteed into
    * step 2 (see [[mgSummarySize]]), so for any stream where the k-th
    * heavy hitter clears that bound the output EQUALS the all-keys
    * aggregation — on the fixture (and any Zipf-ish corpus with sane m)
    * it is bit-identical to topTokens, which is what the oracle asserts;
    * the saturation path (tiny m) is property-tested in SketchOpsSpec.
    */
  def heavyHitters(spark: SparkSession, sfDir: String,
                   m: Int = mgSummarySize): DataFrame = {
    import spark.implicits._
    val stream = TextOps.documents(spark, sfDir)
      .repartition(col("doc_id"))
      .select(col("lang"), col("doc_id"),
        explode(array_distinct(
          split(TextOps.normText(col("text")), " "))).as("token"))
      .filter(col("token") =!= "")
      .select("lang", "token")
    val candidates = stream.as[(String, String)]
      .mapPartitions(it => mgKeys(it, m))
      .toDF("lang", "token").distinct()
    val exact = stream
      .join(broadcast(candidates), Seq("lang", "token"), "left_semi")
      .groupBy("lang", "token").agg(count(lit(1)).as("doc_freq"))
    val top = graft.plans.TopK.perKey(exact, Seq("lang"),
      Seq("doc_freq" -> graft.plans.TopK.Desc,
        "token" -> graft.plans.TopK.Asc),
      TextOps.topTokensK, rankCol = Some("rank"))
    graft.ops.Canon.canonicalize(
      top.select("lang", "rank", "token", "doc_freq"))
  }
}
