package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Canon

/** Deterministic sampling and dataset splitting over `documents` — the
  * reproducibility-first forms a training-data pipeline needs:
  *
  * Engine-native random samplers (`df.sample`, `stat.sampleBy`) draw from
  * per-partition RNG streams, so membership depends on partitioning and
  * engine internals — re-running on a repartitioned copy of the same data
  * selects DIFFERENT rows, which poisons experiment reproducibility and
  * makes cross-engine verification impossible. Hash-based selection fixes
  * both: membership is a pure function of the ROW KEY, stable under any
  * partitioning, identical on any engine — and therefore fully
  * oracle-checkable with the same twin arithmetic family as the dedup
  * stack (affine map mod P = 2³¹−1 on the key, bucket by mod 1000).
  *
  * This is also the 100 TB shape: no shuffle, no RNG state, a codegen'd
  * projection/filter that pipelines inside the scan.
  */
object SampleOps {

  /** Twin-family affine hash of a BIGINT key → [0, 1000) bucket. The
    * affine constants are the MinHash family's row-0/row-1 coefficients —
    * single-sourced so the oracle SQL regenerates from the same values.
    */
  private[ext] val A = graft.functions.MinHashSignature.aCoef(0)
  private[ext] val B = graft.functions.MinHashSignature.bCoef(0)
  private[ext] val P = graft.functions.MinHashSignature.P

  val buckets = 1000

  private[ext] def bucket(key: Column): Column =
    ((key % P) * A + B) % P % buckets

  private[ext] def bucketSql(key: String): String =
    s"(((($key % $P) * $A + $B) % $P) % $buckets)"

  /** Train/val/test split boundaries in thousandths: [0,800) → train,
    * [800,900) → val, [900,1000) → test.
    */
  val trainPermille = 800
  val valPermille = 900

  /** Assign every document a stable split label from its doc_id hash —
    * rerunning on any re-partitioning, subset ordering, or engine yields
    * the identical assignment.
    */
  /** The split label as a pure function of ANY BIGINT key column —
    * single-sourced so the standalone split query and every composer
    * (e.g. [[DedupOps.splitLeakage]]) assign identically.
    */
  private[ext] def splitLabel(key: Column): Column =
    when(bucket(key) < trainPermille, "train")
      .when(bucket(key) < valPermille, "val")
      .otherwise("test")

  /** The DuckDB twin of [[splitLabel]]. */
  private[ext] def splitLabelSql(key: String): String =
    s"""CASE WHEN ${bucketSql(key)} < $trainPermille THEN 'train'
       |     WHEN ${bucketSql(key)} < $valPermille THEN 'val'
       |     ELSE 'test' END""".stripMargin

  def trainValTestSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val d = TextOps.documents(spark, sfDir)
    Canon.canonicalize(d.select(
      col("doc_id"), splitLabel(col("doc_id")).as("split")))
  }

  val trainValTestSplitOracle: String =
    s"""SELECT doc_id,
       |       ${splitLabelSql("doc_id")} AS split
       |FROM documents""".stripMargin

  /** Per-stratum sampling rates in thousandths, keyed on `lang` — the
    * stratified form (downsample the dominant language, keep the rare
    * ones whole) every corpus-balancing pass uses.
    */
  val strataPermille: Seq[(String, Int)] =
    Seq("en" -> 300, "de" -> 600, "fr" -> 600, "es" -> 600)
  val defaultPermille = 1000

  /** Deterministic stratified sample: a document survives iff its hash
    * bucket falls under its stratum's rate. Expected stratum sizes are
    * rate-proportional (spec-checked with a binomial bound); membership
    * is exactly reproducible.
    */
  def stratifiedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val d = TextOps.documents(spark, sfDir)
    val rate = strataPermille.foldLeft(lit(defaultPermille)) {
      case (acc, (lang, r)) => when(col("lang") === lang, r).otherwise(acc)
    }
    Canon.canonicalize(d
      .filter(bucket(col("doc_id")) < rate)
      .select(col("doc_id"), col("lang")))
  }

  val stratifiedSampleOracle: String = {
    val rateCase = strataPermille
      .map { case (l, r) => s"WHEN lang = '$l' THEN $r" }
      .mkString(" ")
    s"""SELECT doc_id, lang FROM documents
       |WHERE ${bucketSql("doc_id")} <
       |      (CASE $rateCase ELSE $defaultPermille END)""".stripMargin
  }

  /** QUALITY-WEIGHTED deterministic sample: a document survives with
    * probability equal to its [[TextOps.withQualityScore quality_score]]
    * (∈ [0,1]) — the soft curation policy between hard filtering (drop
    * below a cutoff, losing all marginal mass) and keep-everything
    * (paying for noise): high-quality docs are almost always kept,
    * mid-quality kept proportionally, junk almost always dropped.
    * Membership is `bucket(doc_id) < floor(score·1000)` — a pure
    * function of the ROW, so the draw is reproducible under any
    * partitioning and exactly oracle-checkable (both engines build the
    * score by the same IEEE expression and the bucket by the same
    * integer affine map; floor of their product is bit-identical).
    *
    * Scale shape: one codegen'd projection + filter pipelined inside
    * the scan — no shuffle, no RNG state, nothing driver-side.
    */
  def weightedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = TextOps.withQualityScore(
      TextOps.documents(spark, sfDir)
        .withColumn("norm", TextOps.normText(col("text"))))
    Canon.canonicalize(scored
      .filter(bucket(col("doc_id")) <
        floor(col("quality_score") * lit(buckets)).cast("long"))
      .select(col("doc_id"), col("lang"), col("quality_score")))
  }

  val weightedSampleOracle: String =
    s"""WITH ${TextOps.qualityCte}
       |SELECT doc_id, lang, quality_score FROM qs
       |WHERE ${bucketSql("doc_id")} <
       |      CAST(floor(quality_score * $buckets) AS BIGINT)""".stripMargin

  /** CURRICULUM difficulty buckets: each document assigned a per-lang
    * quality QUARTILE (1 = hardest/noisiest … 4 = cleanest) — the
    * ordering key for curriculum schedules (train easy→hard or
    * hard→easy) and for per-bucket mixing ratios. Per-lang (not
    * global) quartiles deliberately: a language whose scores sit low
    * overall still spreads across all four buckets instead of landing
    * wholesale in bucket 1.
    *
    * Scale shape: the winsorize pattern on the document stream — one
    * bounded per-lang percentile agg broadcast back over the scored
    * stream, which itself never shuffles. Exact `percentile` (the
    * oracle/default path) buffers a value→count map per lang group; at
    * petabyte group sizes pass `approxBounds = true` for
    * Greenwald-Khanna `percentile_approx` bounds (bounded memory, rank
    * error ≤ n/accuracy — the winsorize contract, spec-pinned): only
    * the quartile CUT POINTS move within that rank tolerance, the
    * bucketing rule is shared.
    */
  def curriculum(spark: SparkSession, sfDir: String,
                 approxBounds: Boolean = false): DataFrame = {
    val scored = TextOps.withQualityScore(
      TextOps.documents(spark, sfDir)
        .withColumn("norm", TextOps.normText(col("text"))))
      .select(col("doc_id"), col("lang"), col("quality_score"))
    val acc = lit(SketchOps.percentileAccuracy)
    val bounds =
      if (approxBounds) scored.groupBy("lang").agg(
        percentile_approx(col("quality_score"), lit(0.25), acc).as("q1"),
        percentile_approx(col("quality_score"), lit(0.5), acc).as("q2"),
        percentile_approx(col("quality_score"), lit(0.75), acc).as("q3"))
      else scored.groupBy("lang").agg(
        percentile(col("quality_score"), lit(0.25)).as("q1"),
        percentile(col("quality_score"), lit(0.5)).as("q2"),
        percentile(col("quality_score"), lit(0.75)).as("q3"))
    Canon.canonicalize(scored.join(broadcast(bounds), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("quality_score"),
        when(col("quality_score") <= col("q1"), 1L)
          .when(col("quality_score") <= col("q2"), 2L)
          .when(col("quality_score") <= col("q3"), 3L)
          .otherwise(4L).as("bucket")))
  }

  val curriculumOracle: String =
    s"""WITH ${TextOps.qualityCte},
       |b AS (
       |  SELECT lang,
       |         quantile_cont(quality_score, 0.25) AS q1,
       |         quantile_cont(quality_score, 0.5) AS q2,
       |         quantile_cont(quality_score, 0.75) AS q3
       |  FROM qs GROUP BY 1)
       |SELECT doc_id, qs.lang, quality_score,
       |       CAST(CASE WHEN quality_score <= q1 THEN 1
       |                 WHEN quality_score <= q2 THEN 2
       |                 WHEN quality_score <= q3 THEN 3
       |                 ELSE 4 END AS BIGINT) AS bucket
       |FROM qs JOIN b ON qs.lang = b.lang""".stripMargin

  val samplePerStratum = 20

  /** Fixed-SIZE deterministic sample: exactly k documents per lang (or
    * the whole stratum when smaller), chosen as the k smallest key
    * hashes — a uniform-without-replacement draw that is still a pure
    * function of the data. Runs on the in-repo TopKPerKey heap (no
    * per-stratum sort, O(n log k)); rate-based sampling above gives
    * proportional sizes, this gives exact ones — the "k examples per
    * language for the eval set" shape.
    */
  def sampleKPerStratum(spark: SparkSession, sfDir: String,
                        k: Int = samplePerStratum): DataFrame = {
    val d = TextOps.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        (((col("doc_id") % P) * A + B) % P).as("h"))
    val top = graft.plans.TopK.perKey(d, Seq("lang"),
      Seq("h" -> graft.plans.TopK.Asc, "doc_id" -> graft.plans.TopK.Asc),
      k, rankCol = Some("rank"))
    Canon.canonicalize(
      top.select(col("lang"), col("rank"), col("doc_id")))
  }

  val sampleKPerStratumOracle: String =
    s"""WITH h AS (
       |  SELECT doc_id, lang,
       |         ((doc_id % $P) * $A + $B) % $P AS h
       |  FROM documents),
       |ranked AS (
       |  SELECT lang, doc_id,
       |         row_number() OVER (PARTITION BY lang
       |           ORDER BY h ASC, doc_id ASC) AS rank
       |  FROM h)
       |SELECT lang, rank, doc_id FROM ranked
       |WHERE rank <= $samplePerStratum""".stripMargin

  /** Per-source repeat weights in thousandths for [[mixtureRepeat]] —
    * the UP-sampling half of data mixing: epoch counts per domain
    * (2.3× a high-quality source, 0.4× a noisy one), the published
    * "data mixture" recipe every pre-training run tunes.
    */
  val mixtureWeightsPermille: Seq[(String, Int)] =
    Seq("src0" -> 2300, "src1" -> 1000, "src2" -> 400)
  val mixtureDefaultPermille = 700

  /** Deterministic MIXTURE up/down-sampling: each document is emitted
    * `floor(w)` times, plus once more iff its key hash falls under the
    * fractional remainder — so a 2.3× source repeats every doc twice and
    * a hash-chosen 30% a third time, and expected multiplicity is
    * exactly the weight. `epoch` disambiguates the copies (a training
    * loader shuffles on it downstream). Pure function of (doc_id,
    * source): reproducible under any partitioning, no RNG, full oracle.
    *
    * Scale shape: one codegen'd projection + a bounded explode
    * (≤ ⌈max weight⌉ per row) — no shuffle at all; the multiplicity
    * decision never needs global state.
    */
  /** Target SHARE of the final mixture per source, in permille —
    * [[mixturePlan]]'s input. Distinct from [[mixtureWeightsPermille]]
    * (which are per-doc repeat MULTIPLIERS): shares say what fraction
    * of the training mix each source should occupy; every unlisted
    * source gets the default share.
    */
  val targetMixPermille: Seq[(String, Int)] =
    Seq("src0" -> 220, "src1" -> 150, "src2" -> 30)
  val targetMixDefaultPermille = 35

  /** MIXTURE PLANNING: per-source actual counts vs the target mix —
    * the report a pre-training run reads to decide repeat factors
    * before [[mixtureRepeat]] applies them. target_docs =
    * ⌊share · N / 1000⌋ in exact integer arithmetic; repeat_factor is
    * the single exact double division target/actual.
    *
    * Scale shape: one keyed count per source (map-side combined; fine
    * even when "source" is a web domain with millions of values) plus
    * a broadcast of the ONE-row corpus total — the skewReport shape.
    * No windows, no driver loops.
    */
  def mixturePlan(spark: SparkSession, sfDir: String): DataFrame = {
    val d = TextOps.documents(spark, sfDir)
    val counts = d.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val total = d.agg(count(lit(1)).as("n_total"))
    val share = targetMixPermille.foldLeft(
      lit(targetMixDefaultPermille)) {
      case (acc, (s, r)) => when(col("source") === s, r).otherwise(acc)
    }
    Canon.canonicalize(counts.crossJoin(broadcast(total))
      .withColumn("target_permille", share.cast("long"))
      .withColumn("target_docs",
        expr("target_permille * n_total div 1000"))
      .select(col("source"), col("n_docs"), col("target_permille"),
        col("target_docs"),
        (col("target_docs").cast("double") / col("n_docs").cast("double"))
          .as("repeat_factor")))
  }

  val mixturePlanOracle: String = {
    val cases = targetMixPermille
      .map { case (s, r) => s"WHEN '$s' THEN $r" }.mkString(" ")
    val share = s"CASE source $cases ELSE $targetMixDefaultPermille END"
    s"""WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
       |t AS (SELECT count(*) AS n_total FROM documents)
       |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       |       CAST($share AS BIGINT) AS target_permille,
       |       CAST(($share) * n_total // 1000 AS BIGINT) AS target_docs,
       |       CAST(($share) * n_total // 1000 AS DOUBLE)
       |         / CAST(n_docs AS DOUBLE) AS repeat_factor
       |FROM c, t""".stripMargin
  }

  /** Fixed-point scale for [[temperatureMix]]'s n^α numerators. BIGINT
    * headroom: n_total·q ≈ n^1.5·scale must stay under 2⁶³, which holds
    * to ~4×10⁸ docs at this scale (NOT 10⁹ — q itself grows with √n); a
    * 100 TB run drops scale a digit or lifts the multiply to DECIMAL(38)
    * (the dsirScale note), shape unchanged. Overflow behavior differs
    * loudly-vs-silently across engines (DuckDB errors, non-ANSI Spark
    * wraps), so respect the bound rather than relying on the gate.
    */
  val tempMixScale = 1000000L

  /** TEMPERATURE-SCALED language sampling — the multilingual-pretraining
    * standard (cf. mBERT/XLM-R exponent-smoothed sampling): p_l ∝ n_l^α,
    * α ∈ (0,1), flattening the language distribution toward uniform as
    * α → 0 so head languages stop drowning the tail. Emitted per
    * α ∈ {1/2, 1/4} as iterated square roots — the repo's no-transcendental
    * discipline: `sqrt` is IEEE-correctly-rounded in BOTH engines (unlike
    * ln/pow, whose last bit is libm-specific), the numerators are
    * fixed-point BIGINTs ⌊√n·scale⌋ summed exactly, `target_docs` is pure
    * integer arithmetic (non-negative, so Spark `div` ≡ DuckDB `//`), and
    * the only float ops in compared values are one division each for
    * `weight` and `sample_rate`.
    *
    * Scale shape: one keyed count per lang (map-side combined), a
    * per-alpha sum over the BOUNDED lang table, broadcast one-row total —
    * the mixturePlan shape; nothing corpus-sized moves.
    */
  def temperatureMixOf(counts: DataFrame, total: DataFrame): DataFrame = {
    val qOf: Column => Column = nd =>
      floor(nd * lit(tempMixScale.toDouble)).cast("long")
    val q = counts.select(col("lang"), col("n_docs"), lit("0.5").as("alpha"),
        qOf(sqrt(col("n_docs").cast("double"))).as("q"))
      .union(counts.select(col("lang"), col("n_docs"),
        lit("0.25").as("alpha"),
        qOf(sqrt(sqrt(col("n_docs").cast("double")))).as("q")))
    val sums = q.groupBy("alpha").agg(sum("q").as("q_tot"))
    Canon.canonicalize(q
      .join(broadcast(sums), Seq("alpha"))
      .crossJoin(broadcast(total))
      .withColumn("target_docs", expr("n_total * q div q_tot"))
      .select(col("lang"), col("alpha"), col("n_docs"),
        (col("q").cast("double") / col("q_tot").cast("double"))
          .as("weight"),
        col("target_docs"),
        (col("target_docs").cast("double") / col("n_docs").cast("double"))
          .as("sample_rate")))
  }

  def temperatureMix(spark: SparkSession, sfDir: String): DataFrame = {
    val d = TextOps.documents(spark, sfDir)
    temperatureMixOf(
      d.groupBy("lang").agg(count(lit(1)).as("n_docs")),
      d.agg(count(lit(1)).as("n_total")))
  }

  val temperatureMixOracle: String =
    s"""WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
       |t AS (SELECT count(*) AS n_total FROM documents),
       |q AS (
       |  SELECT lang, n_docs, '0.5' AS alpha,
       |         CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * $tempMixScale.0)
       |           AS BIGINT) AS q
       |  FROM c
       |  UNION ALL
       |  SELECT lang, n_docs, '0.25' AS alpha,
       |         CAST(floor(sqrt(sqrt(CAST(n_docs AS DOUBLE)))
       |           * $tempMixScale.0) AS BIGINT) AS q
       |  FROM c),
       |s AS (SELECT alpha, sum(q) AS q_tot FROM q GROUP BY 1)
       |SELECT q.lang, q.alpha, CAST(q.n_docs AS BIGINT) AS n_docs,
       |       CAST(q.q AS DOUBLE) / CAST(s.q_tot AS DOUBLE) AS weight,
       |       CAST(t.n_total * q.q // s.q_tot AS BIGINT) AS target_docs,
       |       CAST(t.n_total * q.q // s.q_tot AS DOUBLE)
       |         / CAST(q.n_docs AS DOUBLE) AS sample_rate
       |FROM q JOIN s USING (alpha), t""".stripMargin

  /** Per-language SOURCE-DIVERSITY report: Simpson concentration
    * C = Σ n_s² / N² and its reciprocal, the effective source count —
    * the mixing-health number beside [[mixturePlan]]: a lang with 12
    * nominal sources but effective 1.4 is a monoculture whatever the
    * source column says, and upsampling it replays one domain. Simpson (not
    * Shannon) deliberately: entropy needs a transcendental log whose
    * last-bit rounding differs across engines, while C is exact integer
    * sums finished by IEEE divisions both engines compute identically.
    *
    * Two bounded keyed aggs ((lang, source) then lang), map-side
    * combined; nothing corpus-sized crosses the wire.
    */
  def sourceDiversity(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = TextOps.documents(spark, sfDir)
      .groupBy("lang", "source").agg(count(lit(1)).as("n_s"))
    Canon.canonicalize(counts.groupBy("lang").agg(
      count(lit(1)).as("n_sources"),
      sum("n_s").as("n_docs"),
      sum(col("n_s") * col("n_s")).as("sumsq"))
      .select(col("lang"), col("n_sources"), col("n_docs"),
        (col("sumsq").cast("double") /
          (col("n_docs").cast("double") * col("n_docs").cast("double")))
          .as("simpson"),
        ((col("n_docs").cast("double") * col("n_docs").cast("double")) /
          col("sumsq").cast("double")).as("effective_sources")))
  }

  val sourceDiversityOracle: String =
    """WITH c AS (
      |  SELECT lang, source, count(*) AS n_s
      |  FROM documents GROUP BY 1, 2),
      |a AS (
      |  SELECT lang, count(*) AS n_sources,
      |         CAST(sum(n_s) AS BIGINT) AS n_docs,
      |         CAST(sum(n_s * n_s) AS BIGINT) AS sumsq
      |  FROM c GROUP BY 1)
      |SELECT lang, n_sources, n_docs,
      |  CAST(sumsq AS DOUBLE)
      |    / (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE)) AS simpson,
      |  (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE))
      |    / CAST(sumsq AS DOUBLE) AS effective_sources
      |FROM a""".stripMargin

  def mixtureRepeat(spark: SparkSession, sfDir: String): DataFrame = {
    val d = TextOps.documents(spark, sfDir)
    val w = mixtureWeightsPermille.foldLeft(lit(mixtureDefaultPermille)) {
      case (acc, (s, r)) => when(col("source") === s, r).otherwise(acc)
    }
    val copies = (w / 1000).cast("long") +
      when(bucket(col("doc_id")) < w % 1000, 1L).otherwise(0L)
    Canon.canonicalize(d
      .select(col("doc_id"), col("source"), copies.as("n_copies"))
      .filter(col("n_copies") > 0)
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(1L), col("n_copies"))).as("epoch")))
  }

  val mixtureRepeatOracle: String = {
    val wCase = mixtureWeightsPermille
      .map { case (s, r) => s"WHEN source = '$s' THEN $r" }
      .mkString(" ")
    s"""WITH w AS (
       |  SELECT doc_id, source,
       |         (CASE $wCase ELSE $mixtureDefaultPermille END) AS wt
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, source,
       |         wt // 1000 +
       |         (CASE WHEN ${bucketSql("doc_id")} < wt % 1000
       |               THEN 1 ELSE 0 END) AS n_copies
       |  FROM w)
       |SELECT doc_id, source, CAST(e.epoch AS BIGINT) AS epoch
       |FROM c, unnest(range(1, n_copies + 1)) AS e(epoch)
       |WHERE n_copies > 0""".stripMargin
  }

  // ---- deterministic global shuffle → training shards ----------------

  /** Shard count for the training-order writer. THE scale lever: pick
    * `corpus_bytes / target_shard_bytes` shards (millions at 100 TB),
    * and every per-shard structure below stays bounded by the target
    * shard size — same argument as `CurationOps.packShards`. 8 on the
    * fixture.
    */
  val shardCount = 8

  /** Epoch multiplier folding the epoch into the permutation key — a
    * prime far from P's factors so consecutive epochs decorrelate.
    */
  val shardEpochMul = 1000003L

  /** Permutation key: two affine rounds over (doc_id, epoch). All
    * intermediates fit in a signed 64-bit integer (doc_id·mul reduced
    * mod P BEFORE the A· multiply), so DuckDB's BIGINT arithmetic
    * reproduces it bit-exactly.
    */
  private def permKey(epoch: Int): Column =
    (lit(A) * ((col("doc_id") * shardEpochMul + epoch + 1) % P)
      + lit(B)) % P

  private def permKeySql(epoch: Int): String =
    s"(($A * ((doc_id * $shardEpochMul + ${epoch + 1}) % $P) + $B) % $P)"

  /** Deterministic global shuffle into training shards: every document
    * gets a pseudo-random permutation key (a pure function of
    * (doc_id, epoch) — reproducible under any partitioning, new
    * permutation each epoch), a shard = key mod [[shardCount]], and its
    * POSITION within the shard in key order — exactly the (shard, pos)
    * a training run consumes, without an RNG anywhere.
    *
    * Scale shape: one hash exchange on shard_id plus a per-shard
    * window — and the window partition is bounded by the target shard
    * size because [[shardCount]] scales with the corpus (the writer
    * form is `repartition(shard)` + `sortWithinPartitions(key)`, the
    * same plan). Ties cannot exist within a shard (affine map mod P is
    * injective on doc_id·mul+e+1 below P; doc_id breaks the residue),
    * but doc_id stays in the order as belt and braces.
    */
  def shardAssign(spark: SparkSession, sfDir: String,
                  epoch: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = TextOps.documents(spark, sfDir)
      .select(col("doc_id"), permKey(epoch).as("k"))
      .withColumn("shard_id", col("k") % shardCount)
    Canon.canonicalize(d
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard_id").orderBy("k", "doc_id")))
      .select("doc_id", "shard_id", "pos"))
  }

  val shardAssignOracle: String =
    s"""WITH k AS (
       |  SELECT doc_id, ${permKeySql(0)} AS k,
       |         ${permKeySql(0)} % $shardCount AS shard_id
       |  FROM documents)
       |SELECT doc_id, shard_id,
       |       CAST(row_number() OVER (PARTITION BY shard_id
       |            ORDER BY k, doc_id) AS BIGINT) AS pos
       |FROM k""".stripMargin

  // ---- DSIR importance resampling -------------------------------------

  /** Hashed-n-gram feature buckets for DSIR (16⁴ md5 digits folded,
    * then mod [[dsirBuckets]] — md5 is the repo's one cross-engine
    * string hash, and the digit fold keeps the bucket a pure integer
    * function of the hex both engines compute identically).
    */
  val dsirBuckets = 64

  /** Fixed-point scale for per-bucket probability ratios. Chosen so the
    * integer numerator (c_t+1)·(T_raw+B)·scale stays inside BIGINT up to
    * ~10⁹-gram corpora; a 100 TB run lifts the arithmetic to DECIMAL(38)
    * (or true log-space once a shared ln is available) — the SHAPE
    * (bounded bucket table, broadcast, one keyed agg) is unchanged.
    */
  val dsirScale = 10000L

  /** Share of the corpus DSIR keeps: top quartile by importance. */
  val dsirKeepQuantile = 0.75

  /** The shared bucket formula — SQL text interpreted by BOTH engines
    * (Spark via expr), so twin-ness is by construction: fold the first
    * four md5 hex digits to an int in [0, 16⁴), mod [[dsirBuckets]].
    */
  private[graft] def dsirBucketSql(g: String): String = {
    def d(i: Int) =
      s"(instr('0123456789abcdef', substr(md5($g), $i, 1)) - 1)"
    s"((${d(1)} * 4096 + ${d(2)} * 256 + ${d(3)} * 16 + ${d(4)})" +
      s" % $dsirBuckets)"
  }

  /** DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
    * represent documents as hashed n-gram (uni+bi) bucket counts, fit
    * smoothed bucket distributions on a clean TARGET slice and on the
    * RAW corpus, weight every document by how target-like its features
    * are, and keep the top [[dsirKeepQuantile]] quartile.
    *
    * Exact-arithmetic adaptation (the LmOps trade, documented there):
    * the paper's per-bucket log-likelihood-ratio λ[b] is replaced by the
    * fixed-point probability RATIO
    * `((c_t[b]+1)·(T_r+B)·scale) div ((c_r[b]+1)·(T_t+B))` and the
    * document weight is the MEAN ratio over its gram occurrences —
    * order-independent integer sums end-to-end, one final double
    * division, so the score is bit-deterministic under any partitioning
    * and the DuckDB twin is exact. Target slice = doc_id ≡ 0 mod
    * [[LmOps.lmRefMod]] (the same hash-membership reference the LM
    * trains on).
    *
    * Scale shape: two keyed aggs over the gram stream (map-side
    * combined) fold to a [[dsirBuckets]]-row λ table that BROADCASTS;
    * scoring is one narrow explode + broadcast join + per-doc agg; the
    * keep threshold is one global quantile broadcast back (GK sketch
    * hatch at 10¹⁰ docs, as curriculum documents).
    */
  def dsirWeights(spark: SparkSession, sfDir: String,
                  approxBounds: Boolean = false): DataFrame =
    dsirWeightsFrom(TextOps.documents(spark, sfDir), approxBounds)

  /** The DSIR chain over an EXPLICIT (doc_id, …, text) frame — the
    * seam the empty-target-slice spec drives (a corpus where NO doc is
    * in the reference slice must still yield finite λ and boolean
    * `selected`, not NULLs — the coalesce below).
    *
    * `approxBounds` swaps the keep threshold's exact global
    * `percentile` — a SINGLE-GROUP aggregation that funnels every
    * per-doc score into one reducer's value map, the one
    * executor-memory hazard in this chain at 10¹⁰ docs — for the
    * Greenwald-Khanna `percentile_approx` sketch (bounded memory; the
    * selected threshold moves only within GK's rank contract,
    * spec-pinned like winsorize's).
    */
  private[graft] def dsirWeightsFrom(documents: DataFrame,
                                     approxBounds: Boolean = false)
      : DataFrame = {
    val (pd, inter) = dsirDocWeights(documents)
    val thr =
      if (approxBounds) pd.agg(percentile_approx(col("mean_ratio"),
        lit(dsirKeepQuantile), lit(SketchOps.percentileAccuracy)).as("t"))
      else pd.agg(
        percentile(col("mean_ratio"), lit(dsirKeepQuantile)).as("t"))
    val out = Canon.canonicalize(pd.crossJoin(broadcast(thr))
      .select(col("doc_id"), col("n_grams"), col("mean_ratio"),
        (col("mean_ratio") >= col("t")).as("selected")))
    Canon.materialized(out, inter: _*)
  }

  /** The shared DSIR per-doc weight frame (doc_id, w, n_grams,
    * mean_ratio) plus the persisted intermediates the caller must
    * release ([[graft.ops.Canon.materialized]]) — the seam
    * [[dsirWeightsFrom]] (quantile cut) and [[dsirSample]]
    * (proportional resample) both read, so the λ arithmetic exists
    * exactly once.
    */
  private[graft] def dsirDocWeights(documents: DataFrame)
      : (DataFrame, Seq[DataFrame]) = {
    val dt = documents
      .repartition(col("doc_id"))
      .select(col("doc_id"), CurationOps.toksCol.as("toks"))
      .filter(size(col("toks")) > 0)
    val dg = dt.select(col("doc_id"),
      explode(concat(CurationOps.grams(col("toks"), 1),
        CurationOps.grams(col("toks"), 2))).as("g"))
    // per-doc bucket HISTOGRAM first: the gram stream folds map-side to
    // ≤ dsirBuckets rows per document, and every later step (both count
    // tables AND the scoring join) reads the histogram — the λ join
    // touches ≤ 64·n_docs rows instead of one row per gram occurrence
    // (bench: 5.1 s → histogram shape at sf0.1)
    // the native digest-read form of dsirBucketSql — equivalence with
    // the oracle's builtin formula is property-pinned (Md5BucketSpec)
    val hist = dg.select(col("doc_id"),
        graft.functions.Md5Bucket(col("g"), dsirBuckets).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("n")).persist()
    hist.count() // EAGER: the downstream subtrees read this frame; an
    // unmaterialized cache lets them race and recompute the gram scan
    // r14 (guide §2.3/§2.4): raw + target bucket counts were two
    // separate aggregations over hist, and their totals re-ran each
    // subtree again — four histogram passes inside one job. One fused
    // conditional aggregation (c_t = Σ n over the target slice; the
    // empty-slice sum is 0 where the old left join gave NULL, which
    // the λ expression already coalesced to 0 — same integers out)
    // plus totals over the persisted [[dsirBuckets]]-row table.
    val byB = hist.groupBy("b").agg(
        sum("n").as("c_r"),
        sum(when(col("doc_id") % LmOps.lmRefMod === 0, col("n"))
          .otherwise(0L)).as("c_t"))
      .persist() // ≤ dsirBuckets rows; totals + the λ select read it
    val tots = byB.agg(sum("c_r").as("t_r"), sum("c_t").as("t_t"))
    val lam = byB.crossJoin(tots)
      .select(col("b"), expr(
        s"""(coalesce(c_t, 0L) + 1L) * (coalesce(t_r, 0L) + $dsirBuckets)
           | * $dsirScale
           | div ((c_r + 1L) * (coalesce(t_t, 0L) + $dsirBuckets))"""
          .stripMargin.replace("\n", "")).as("lam"))
    val pd = hist.join(broadcast(lam), Seq("b"))
      .groupBy("doc_id")
      .agg(sum(col("n") * col("lam")).as("w"), sum("n").as("n_grams"))
      .withColumn("mean_ratio",
        col("w").cast("double") /
          (col("n_grams") * dsirScale).cast("double"))
    (pd, Seq(hist, byB))
  }

  /** DSIR importance RESAMPLING — the weights ACTED on, proportionally:
    * where [[dsirWeights]]' `selected` is a top-quantile cut (keep the
    * best 25%), this accepts each doc with probability proportional to
    * its importance ratio, normalized so the best doc is accepted with
    * probability 1 — the paper's sampling step, made deterministic and
    * partition-independent by drawing the "uniform" from the affine
    * hash [[bucket]] of doc_id (the [[trainValTestSplit]] discipline:
    * no RNG state, reproducible on any engine).
    *
    * Exactness: acceptance is the INTEGER cross-multiplication
    * `bucket(doc_id) · n_i · w_max < 1000 · w_i · n_max` — equivalent
    * to bucket/1000 < mean_i/mean_max with zero floating-point in the
    * decision (the ratio doubles appear only in the REPORT column).
    * The (w_max, n_max) pair is the argmax doc's (ties → min doc_id).
    * Products stay ≤ ~10¹⁴ on fixture cardinalities; a 100 TB corpus
    * widens the comparison to DECIMAL(38,0) the way the classifier's λ
    * did (ClassifierOps, round-10 overflow fix).
    */
  def dsirSample(spark: SparkSession, sfDir: String): DataFrame = {
    val (pd, inter) = dsirDocWeights(TextOps.documents(spark, sfDir))
    val best = pd
      .orderBy(col("mean_ratio").desc, col("doc_id").asc).limit(1)
      .select(col("w").as("w_max"), col("n_grams").as("n_max"))
    val out = Canon.canonicalize(pd.crossJoin(broadcast(best))
      .select(col("doc_id"), col("n_grams"), col("mean_ratio"),
        (bucket(col("doc_id")) * col("n_grams") * col("w_max") <
          lit(buckets.toLong) * col("w") * col("n_max")).as("accepted")))
    Canon.materialized(out, inter: _*)
  }

  /** The shared DSIR CTE chain (dt → … → pd → sc) — the SQL twin of
    * [[dsirDocWeights]], composed by both DSIR oracles.
    */
  private def dsirCtes: String = {
    import TextOps.normSql
    s"""dt AS (
       |  SELECT doc_id, toks FROM (
       |    SELECT doc_id,
       |           list_filter(string_split($normSql, ' '), t -> t <> '')
       |             AS toks
       |    FROM documents)
       |  WHERE len(toks) > 0),
       |dg AS (
       |  SELECT doc_id, u.g FROM dt, unnest(toks) AS u(g)
       |  UNION ALL
       |  SELECT doc_id, toks[i] || ' ' || toks[i + 1]
       |  FROM dt, unnest(range(1, len(toks))) AS r(i)),
       |db AS MATERIALIZED (
       |  SELECT doc_id, ${dsirBucketSql("g")} AS b FROM dg),
       |raw AS (SELECT b, count(*) AS c_r FROM db GROUP BY 1),
       |tgt AS (SELECT b, count(*) AS c_t FROM db
       |        WHERE doc_id % ${LmOps.lmRefMod} = 0 GROUP BY 1),
       |tot AS (SELECT count(*) AS t_r FROM db),
       |ttot AS (SELECT count(*) AS t_t FROM db
       |         WHERE doc_id % ${LmOps.lmRefMod} = 0),
       |lam AS (
       |  SELECT b,
       |         ((coalesce(c_t, 0) + 1) * (t_r + $dsirBuckets)
       |          * $dsirScale) // ((c_r + 1) * (t_t + $dsirBuckets))
       |           AS lam
       |  FROM raw LEFT JOIN tgt USING (b), tot, ttot),
       |pd AS (
       |  SELECT doc_id, CAST(sum(lam) AS BIGINT) AS w,
       |         count(*) AS n_grams
       |  FROM db JOIN lam USING (b) GROUP BY 1),
       |sc AS MATERIALIZED (
       |  SELECT doc_id, n_grams,
       |         CAST(w AS DOUBLE) /
       |           CAST(n_grams * $dsirScale AS DOUBLE) AS mean_ratio
       |  FROM pd)""".stripMargin
  }

  val dsirWeightsOracle: String =
    s"""WITH $dsirCtes,
       |thr AS (
       |  SELECT quantile_cont(mean_ratio, CAST($dsirKeepQuantile AS DOUBLE))
       |    AS t FROM sc)
       |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams, mean_ratio,
       |       mean_ratio >= t AS selected
       |FROM sc, thr""".stripMargin

  val dsirSampleOracle: String =
    s"""WITH $dsirCtes,
       |mx AS (
       |  SELECT w AS w_max, n_grams AS n_max FROM pd
       |  ORDER BY CAST(w AS DOUBLE) /
       |             CAST(n_grams * $dsirScale AS DOUBLE) DESC,
       |           doc_id ASC
       |  LIMIT 1)
       |SELECT sc.doc_id, CAST(sc.n_grams AS BIGINT) AS n_grams,
       |       sc.mean_ratio,
       |       (${bucketSql("sc.doc_id")}) * sc.n_grams * w_max
       |         < $buckets * pd.w * n_max AS accepted
       |FROM sc JOIN pd USING (doc_id), mx""".stripMargin

  // ---- DoReMi-lite mixture reweighting --------------------------------

  /** Fixed-point unit of the DoReMi factor arithmetic; steps are
    * clamped to ±[[doremiScale]]/2 so one round's multiplier stays in
    * [0.5, 1.5].
    */
  val doremiScale = 1000000L

  /** Multiplicative-update rounds — unrolled in the oracle (the
    * pageRank/BT discipline).
    */
  val doremiRounds = 8

  /** DOREMI-LITE mixture reweighting (cf. DoReMi, Xie et al. 2023):
    * reweight the per-source training mix by EXCESS FLUENCY LOSS under
    * the reference n-gram LM — the published algorithm's shape with the
    * reference-LM surprise standing in for the proxy/reference loss
    * gap, composing [[graft.ext.LmOps]] scoring with [[mixturePlan]]'s
    * share contract:
    *
    *  - per source: token-weighted mean surprise `F_s = Σ sum_fp / Σ n`
    *    over the doc scores (exact integer division of the fixed-point
    *    LM internals — never the per-doc double), and the corpus-wide
    *    `F`; `excess_s = F_s − F` (positive = this source is HARDER
    *    than average under the reference model, so DoReMi upweights
    *    it — those are the domains with the most left to learn);
    *  - multiplicative update: [[doremiRounds]] rounds of
    *    `w ← w · (scale + step_s) / scale` from `w₀ = n_docs`, where
    *    `step_s` is the relative excess `excess·scale / 2F` clamped to
    *    ±scale/2 — sign-and-magnitude so every division is
    *    non-negative (Spark `div` ≡ DuckDB `//`);
    *  - normalize to permille → target_docs / repeat_factor, exactly
    *    [[mixturePlan]]'s output contract, so the reweighted mix plugs
    *    in wherever the static plan does.
    *
    * Scale shape: the corpus contributes the LM scoring pass; sources
    * fold to a |sources|-row stats table and the whole update chain
    * runs on that bounded frame (no driver sync at all — the rounds
    * are eight chained projections). BIGINT headroom: w ≤ n_docs·1.5⁸
    * ≈ 26·n_docs, times the 1.5·10⁶ factor pre-division — safe to
    * ~2·10¹¹ docs per source.
    */
  def doremiMix(spark: SparkSession, sfDir: String): DataFrame = {
    val (cAb, cA, voc) = LmOps.trainTablesShared(spark, sfDir)
    val docs = TextOps.documents(spark, sfDir)
    val perDoc = LmOps.scoreDocs(LmOps.withToks(docs), cAb, cA, voc)
      .filter(col("scored"))
      .join(docs.select("doc_id", "source"), Seq("doc_id"))
    val bySrc = perDoc.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum("sum_fp").as("s_fp"),
      sum("n_bigrams").as("n_bg"))
    Canon.canonicalize(doremiFromStats(bySrc))
  }

  /** The update chain over a (source, n_docs, s_fp, n_bg) stats frame —
    * the seam the spec drives with constructed fixtures whose integer
    * chain it recomputes by hand.
    */
  private[ext] def doremiFromStats(bySrc: DataFrame): DataFrame = {
    val half = doremiScale / 2
    val totals = bySrc.agg(sum("s_fp").as("st_fp"),
      sum("n_bg").as("nt_bg"))
    var w = bySrc.crossJoin(broadcast(totals))
      .withColumn("f_s", expr("s_fp div n_bg"))
      .withColumn("f_c", expr("st_fp div nt_bg"))
      .withColumn("excess_fp", col("f_s") - col("f_c"))
      .withColumn("step", expr(
        s"CASE WHEN excess_fp < 0 THEN -1L ELSE 1L END" +
          s" * (abs(excess_fp) * ${doremiScale}L div (2L * f_c))"))
      .withColumn("factor", expr(
        s"${doremiScale}L + greatest(-${half}L, least(${half}L, step))"))
      .withColumn("w", col("n_docs"))
    for (_ <- 1 to doremiRounds)
      w = w.withColumn("w", expr(s"w * factor div ${doremiScale}L"))
    val tot = w.agg(sum("w").as("w_tot"), sum("n_docs").as("n_total"))
    w.crossJoin(broadcast(tot))
      .withColumn("share_permille", expr("1000L * w div w_tot"))
      .withColumn("target_docs",
        expr("share_permille * n_total div 1000L"))
      .select(col("source"), col("n_docs"),
        (col("excess_fp").cast("double") /
          lit(LmOps.lmScale.toDouble)).as("excess"),
        col("share_permille"), col("target_docs"),
        (col("target_docs").cast("double") / col("n_docs").cast("double"))
          .as("repeat_factor"))
  }

  /** Composes the LM scoring CTE chain (integer `pd` internals, not the
    * per-doc double) with the unrolled update — same integer literals,
    * every division non-negative.
    */
  def doremiMixOracle: String = {
    val half = doremiScale / 2
    val rounds = (1 to doremiRounds).map { r =>
      s"""dw$r AS (
         |  SELECT source, n_docs, excess_fp, factor,
         |         w * factor // $doremiScale AS w
         |  FROM dw${r - 1})""".stripMargin
    }.mkString(",\n")
    s"""WITH ${LmOps.lmScoreCtes},
       |sdoc AS (
       |  SELECT d.source, p.sum_fp, p.n
       |  FROM pd p JOIN documents d USING (doc_id)),
       |bysrc AS (
       |  SELECT source, count(*) AS n_docs,
       |         CAST(sum(sum_fp) AS BIGINT) AS s_fp,
       |         CAST(sum(n) AS BIGINT) AS n_bg
       |  FROM sdoc GROUP BY 1),
       |dtot AS (
       |  SELECT CAST(sum(s_fp) AS BIGINT) AS st_fp,
       |         CAST(sum(n_bg) AS BIGINT) AS nt_bg
       |  FROM bysrc),
       |dfx AS (
       |  SELECT source, n_docs,
       |         (s_fp // n_bg) - (st_fp // nt_bg) AS excess_fp,
       |         st_fp // nt_bg AS f_c
       |  FROM bysrc, dtot),
       |dfac AS (
       |  SELECT source, n_docs, excess_fp,
       |         $doremiScale + greatest(-$half, least($half,
       |           (CASE WHEN excess_fp < 0 THEN -1 ELSE 1 END)
       |             * (abs(excess_fp) * $doremiScale // (2 * f_c))))
       |           AS factor
       |  FROM dfx),
       |dw0 AS (
       |  SELECT source, n_docs, excess_fp, factor,
       |         CAST(n_docs AS BIGINT) AS w
       |  FROM dfac),
       |$rounds,
       |dwt AS (
       |  SELECT CAST(sum(w) AS BIGINT) AS w_tot,
       |         CAST(sum(n_docs) AS BIGINT) AS n_total
       |  FROM dw$doremiRounds)
       |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       |       CAST(excess_fp AS DOUBLE) / ${LmOps.lmScale}.0 AS excess,
       |       CAST(1000 * w // w_tot AS BIGINT) AS share_permille,
       |       CAST((1000 * w // w_tot) * n_total // 1000 AS BIGINT)
       |         AS target_docs,
       |       CAST((1000 * w // w_tot) * n_total // 1000 AS DOUBLE)
       |         / CAST(n_docs AS DOUBLE) AS repeat_factor
       |FROM dw$doremiRounds, dwt""".stripMargin
  }

  // ---- token-budget greedy selection ----------------------------------

  /** Budget as a permille of total corpus tokens (truncating integer
    * arithmetic in both engines).
    */
  val budgetPermille = 400L

  /** Quality buckets for the selection histogram: floor(score * 1000).
    * The bucket index is monotone in the score, so bucket-major order
    * composed with within-bucket (score desc, doc_id) order IS the
    * global greedy order — which is what lets the plan skip the global
    * sort (see [[budgetSelect]]).
    */
  private[ext] def qBucket(score: Column): Column =
    floor(score * 1000.0).cast("long")

  /** Token-budget greedy selection — "spend [[budgetPermille]]‰ of the
    * corpus's token mass on the highest-quality documents": docs are
    * taken in (quality_score desc, doc_id asc) order while the running
    * token total stays within budget (a doc is kept iff the total
    * INCLUDING it fits).
    *
    * Scale shape (the [[graft.ops.LoyaltyTiers]] adaptive-histogram
    * discipline — the semantics are a global prefix, the PLAN is not a
    * global sort): bucket every doc by floor(score·1000); ONE keyed
    * aggregation builds the ≤1001-row bucket histogram, whose windowed
    * cumulative is driver-scale regardless of corpus size; every bucket
    * strictly above the threshold is kept with a broadcast-join filter
    * (no sort anywhere), and only the SINGLE straddling bucket — ~1/1000
    * of the corpus — pays a within-bucket running-sum window. At 100 TB
    * that is a scan + one map-side-combined agg + one window over 0.1%
    * of the data, vs. the naive plan's full-corpus total-order sort.
    */
  def budgetSelect(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = TextOps.withQualityScore(
        TextOps.documents(spark, sfDir)
          .repartition(col("doc_id"))
          .withColumn("norm", TextOps.normText(col("text"))))
      .select(col("doc_id"), col("n_tokens").cast("long").as("n_toks"),
        col("quality_score"))
      .withColumn("bucket", qBucket(col("quality_score")))
      .persist() // fan-out: totals + histogram + both keep branches
    val tot = scored.agg(
      expr(s"sum(n_toks) * $budgetPermille div 1000").as("budget"))
    val hist = scored.groupBy("bucket").agg(sum("n_toks").as("btoks"))
    // tokens in strictly-higher buckets; the window runs over ≤1001 rows
    val wAbove = Window.orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist.withColumn("above",
      coalesce(sum("btoks").over(wAbove), lit(0L)))
    val annotated = scored
      .join(broadcast(cum), Seq("bucket"))
      .crossJoin(broadcast(tot))
    val fullKeep = annotated
      .filter(col("above") + col("btoks") <= col("budget"))
    val straddle = annotated.filter(
      col("above") <= col("budget") &&
        col("above") + col("btoks") > col("budget"))
    val wRun = Window.partitionBy("bucket")
      .orderBy(col("quality_score").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val boundKeep = straddle
      .withColumn("run", sum("n_toks").over(wRun))
      .filter(col("above") + col("run") <= col("budget"))
      .drop("run")
    Canon.materialized(
      Canon.canonicalize(fullKeep.union(boundKeep)
        .select("doc_id", "n_toks", "quality_score")),
      scored)
  }

  /** The oracle states the SEMANTICS directly — the global greedy
    * prefix via one corpus-order window — which is exactly the plan
    * [[budgetSelect]] refuses to run at scale.
    */
  val budgetSelectOracle: String =
    s"""WITH ${TextOps.qualityCte},
       |bd AS (
       |  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_toks, quality_score
       |  FROM qs),
       |bt AS (
       |  SELECT CAST(sum(n_toks) * $budgetPermille // 1000 AS BIGINT)
       |    AS budget FROM bd),
       |bw AS (
       |  SELECT doc_id, n_toks, quality_score,
       |         sum(n_toks) OVER (
       |           ORDER BY quality_score DESC, doc_id ASC
       |           ROWS UNBOUNDED PRECEDING) AS ctoks
       |  FROM bd)
       |SELECT doc_id, n_toks, quality_score
       |FROM bw, bt WHERE ctoks <= budget""".stripMargin

  // ---- UniMax epoch-capped waterfill mixture ---------------------------

  /** Per-language epoch cap — a language contributes at most this many
    * passes over its own tokens (the UniMax knob; 1 = never repeat).
    */
  val unimaxEpochs = 1L

  /** Training budget as a permille of the corpus token total — 800‰
    * makes the uniform share exceed the small languages' caps on this
    * fixture, so both waterfill branches (capped, surplus-fed) are
    * exercised at every SF.
    */
  val unimaxBudgetPermille = 800L

  /** UNIMAX MIXTURE — the epoch-capped waterfill allocator (Chung et
    * al. 2023): split a token budget as uniformly as possible across
    * languages, except no language may exceed [[unimaxEpochs]] passes
    * over its own data; surplus from capped (low-resource) languages
    * flows to the rest. Completes the mixture-family spectrum:
    * [[mixturePlan]] (fixed shares) / [[temperatureMixOf]] (n^α
    * smoothing) / [[doremiMix]] (reference-LM reweighting) /
    * UniMax (uniform-with-caps).
    *
    * EXACT integer waterfill, closed form (no iteration): order
    * languages by (cap asc, lang asc); language k is capped iff
    * cap_k·(L−k+1) ≤ B − Σ_{j<k} cap_j (caps ascending ⇒ the capped
    * set is a prefix, so one window pass finds K = max capped rank);
    * the L−K uncapped languages each get
    * q = (B − Σ_{j≤K} cap_j) div (L−K), the division remainder going
    * +1 apiece to the first r of them in the same order — every token
    * of the budget is placed deterministically (Σ alloc = B whenever
    * B ≤ Σ cap). All BIGINT; the one double is the realized-epochs
    * ratio. Token counts follow the [[TextOps.tokenCount]] convention
    * (normText + wordPat), so the budget is denominated in the same
    * unit the rest of the pipeline reports.
    *
    * Scale shape: one groupBy(lang) over the corpus; the waterfill
    * itself runs on L rows (window over an ungrouped frame of
    * language aggregates — driver-scale, like the mixture twins).
    */
  def unimaxMix(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = TextOps.documents(spark, sfDir)
      .withColumn("norm", TextOps.normText(col("text")))
      .groupBy("lang")
      .agg(sum(regexp_count(col("norm"), lit(TextOps.wordPat)))
        .as("n_tok"))
      // a language whose documents contain no word tokens has no
      // epochs to report (0/0 would be NaN in Spark and a
      // divide-by-zero in the twin) — dropped in BOTH twins; its
      // n_tok=0 contributes nothing to the budget sum either way
      .filter(col("n_tok") > 0)
      .withColumn("cap", col("n_tok") * unimaxEpochs)
    val t = c.agg((sum(col("n_tok")) * unimaxBudgetPermille)
      .as("bx"))
      .select(expr("bx div 1000").as("b"))
    val wOrd = Window.orderBy(col("cap").asc, col("lang").asc)
    val r = c.crossJoin(t)
      .withColumn("k", row_number().over(wOrd))
      .withColumn("pre",
        coalesce(sum("cap").over(
          wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("l", count(lit(1)).over(
        Window.partitionBy().rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("capped",
        col("cap") * (col("l") - col("k") + 1) <= col("b") - col("pre"))
    val kRow = r.agg(
      coalesce(max(when(col("capped"), col("k"))), lit(0L)).as("kk"),
      coalesce(max(when(col("capped"), col("pre") + col("cap"))),
        lit(0L)).as("prek"))
    val out = r.crossJoin(broadcast(kRow))
      .withColumn("q", expr(
        "(b - prek) div greatest(l - kk, 1)"))
      .withColumn("rem", expr(
        "(b - prek) % greatest(l - kk, 1)"))
      .withColumn("alloc", when(col("k") <= col("kk"), col("cap"))
        .otherwise(col("q") +
          when(col("k") - col("kk") <= col("rem"), lit(1L))
            .otherwise(lit(0L))))
      .select(col("lang"), col("n_tok"), col("cap"), col("alloc"),
        (col("alloc").cast("double") / col("n_tok").cast("double"))
          .as("epochs"))
    Canon.canonicalize(out)
  }

  val unimaxMixOracle: String =
    s"""WITH c AS (
       |  SELECT lang,
       |         CAST(sum(len(regexp_extract_all(${TextOps.normSql},
       |           '${TextOps.wordPat}'))) AS BIGINT) AS n_tok
       |  FROM documents GROUP BY 1),
       |cc AS (SELECT lang, n_tok, n_tok * $unimaxEpochs AS cap
       |       FROM c WHERE n_tok > 0),
       |t AS (SELECT CAST(sum(n_tok) * $unimaxBudgetPermille // 1000
       |               AS BIGINT) AS b FROM c),
       |r AS (
       |  SELECT lang, n_tok, cap, b,
       |         row_number() OVER w AS k,
       |         CAST(coalesce(sum(cap) OVER (w ROWS BETWEEN UNBOUNDED
       |           PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS pre,
       |         CAST(count(*) OVER () AS BIGINT) AS l
       |  FROM cc, t
       |  WINDOW w AS (ORDER BY cap ASC, lang ASC)),
       |rc AS (
       |  SELECT *, cap * (l - k + 1) <= b - pre AS capped FROM r),
       |kk AS (
       |  SELECT CAST(coalesce(max(CASE WHEN capped THEN k END), 0)
       |           AS BIGINT) AS kk,
       |         CAST(coalesce(max(CASE WHEN capped THEN pre + cap END),
       |           0) AS BIGINT) AS prek
       |  FROM rc)
       |SELECT lang, n_tok, cap,
       |       CASE WHEN k <= kk THEN cap
       |            ELSE (b - prek) // greatest(l - kk, 1)
       |                 + CASE WHEN k - kk <=
       |                     (b - prek) % greatest(l - kk, 1)
       |                   THEN 1 ELSE 0 END
       |       END AS alloc,
       |       CAST(CASE WHEN k <= kk THEN cap
       |            ELSE (b - prek) // greatest(l - kk, 1)
       |                 + CASE WHEN k - kk <=
       |                     (b - prek) % greatest(l - kk, 1)
       |                   THEN 1 ELSE 0 END
       |       END AS DOUBLE) / CAST(n_tok AS DOUBLE) AS epochs
       |FROM rc, kk""".stripMargin
}
