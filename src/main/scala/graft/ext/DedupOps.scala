package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.ops.Canon

/** Near-duplicate detection over `documents` — the web-corpus dedup
  * toolbox: exact-Jaccard over character shingles (blocked), MinHash+LSH
  * banding (the unblocked scale path), and SimHash bit-signatures.
  *
  * Scale posture:
  *  - `jaccardBlocked` is exact within (lang, source) blocks: all-pairs is
  *    quadratic, so the block is the unit of work — the standard sharding
  *    when a natural partition key exists. Shingle sets ride along as
  *    array columns; intersection cardinality is computed per pair
  *    (no shingle-explode join, whose hot shingles would skew the shuffle
  *    on a small-vocabulary corpus).
  *  - `minhashLsh` needs no blocking: signatures are banded and candidate
  *    pairs arise only inside equal band-buckets (shuffle keyed on
  *    (band, bucket)), then exact Jaccard verifies the candidates. With
  *    64 hashes in 16 bands of 4 rows the s-curve crosses ~50% candidate
  *    probability near J ≈ 0.5. Approximate recall → no SQL oracle
  *    (rows-only check); DedupOpsSpec pins candidate/verify behavior.
  *  - `simhashNearDup` reduces every doc to a 64-bit signature; near-dups
  *    are pairs at small Hamming distance (bit_count(xor)). Blocked by
  *    lang here; at corpus scale the standard trick is sorting by rotated
  *    signatures. xxhash64 has no DuckDB twin → rows-only + spec.
  */
object DedupOps {

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "documents")

  val shingleLen = 5

  /** Distinct character-k-gram set over an ALREADY-MATERIALIZED normalized
    * text column. The input must be an attribute, not an expression: the
    * per-position lambda references it once per shingle, and an inlined
    * normalization expression (a regex) would re-execute per position —
    * O(len²) regex work per document (measured 17s of a 20s pipeline).
    */
  def shinglesOfNorm(norm: Column): Column =
    when(length(norm) >= shingleLen,
      array_distinct(transform(
        sequence(lit(1), length(norm) - (shingleLen - 1)),
        i => norm.substr(i, lit(shingleLen)))))
      .otherwise(array().cast("array<string>"))

  /** Convenience form over raw text — fine for specs/small frames; the
    * pipelines materialize `norm` first (see shinglesOfNorm).
    */
  def shingles(c: Column): Column = shinglesOfNorm(TextOps.normText(c))

  private val shinglesSql =
    s"""list_distinct(list_transform(
       |  range(1, length(norm) - ${shingleLen - 2}),
       |  i -> substr(norm, CAST(i AS INT), $shingleLen)))""".stripMargin

  val jaccardThreshold = 0.3

  /** Shingle set hashed to 64-bit longs: set-intersection CARDINALITY is
    * preserved (injective up to 64-bit collisions, ~1e-14 per pair) while
    * the per-pair intersect runs over longs instead of short strings —
    * roughly an order of magnitude cheaper in the quadratic hot loop.
    */
  def hashedShingles(c: Column): Column =
    transform(shingles(c), s => xxhash64(s))

  def hashedShinglesOfNorm(norm: Column): Column =
    transform(shinglesOfNorm(norm), s => xxhash64(s))

  /** The codegen'd shingle pipeline: one row per DISTINCT (doc, 64-bit
    * shingle hash), via explode(sequence) + substr + xxhash64 — every
    * operator native, no higher-order lambdas. The array-returning forms
    * above evaluate interpreted (lambda functions have no codegen) and
    * measured ~17s of an ~20s pipeline at sf0.1; this table is the same
    * information at full codegen speed, and it is already the shape the
    * MinHash signature aggregation needs.
    *
    * Input: (doc_id, norm [, passthrough meta columns]).
    */
  def shingleTable(docs: DataFrame): DataFrame =
    docs.filter(length(col("norm")) >= shingleLen)
      .select(col("doc_id"),
        explode(sequence(lit(1),
          length(col("norm")) - (shingleLen - 1))).as("i"),
        col("norm"))
      .select(col("doc_id"),
        xxhash64(col("norm").substr(col("i"), lit(shingleLen))).as("s"))
      .distinct()

  /** Per-doc hashed-shingle arrays from the exploded table (collect_list
    * over the already-distinct table ≡ the hashedShingles set).
    */
  def shingleArrays(st: DataFrame): DataFrame =
    st.groupBy("doc_id").agg(collect_list("s").as("sh"))

  private def pairJaccard(shA: Column, shB: Column): Column = {
    val common = size(array_intersect(shA, shB)).cast("double")
    common / (size(shA) + size(shB) - common)
  }

  /** Provable Jaccard upper bound from set sizes alone:
    * J(A,B) ≤ min(|A|,|B|) / max(|A|,|B|). Pairs failing the threshold on
    * the bound are skipped before the expensive intersection — EXACT (no
    * false negatives), so the oracle needs no mirror of this filter.
    */
  private def sizeRatioAtLeast(shA: Column, shB: Column,
                               t: Double): Column =
    least(size(shA), size(shB)).cast("double") /
      greatest(size(shA), size(shB)).cast("double") >= t

  /** Exact shingle-Jaccard ≥ threshold within (lang, source) blocks. */
  def jaccardBlocked(spark: SparkSession, sfDir: String): DataFrame = {
    // repartition first (the fixture file arrives as one split), then the
    // codegen'd shingle table → per-doc arrays + block metadata.
    val docs = documents(spark, sfDir)
      .repartition(col("doc_id"))
      .withColumn("norm", TextOps.normText(col("text")))
    val d = shingleArrays(shingleTable(docs))
      .join(docs.select("doc_id", "lang", "source"), Seq("doc_id"))
      .persist() // consumed by both join sides — shingle once, not twice
    val a = d.select(col("lang"), col("source"), col("doc_id").as("id_a"),
      col("sh").as("sh_a"))
    val b = d.select(col("lang"), col("source"), col("doc_id").as("id_b"),
      col("sh").as("sh_b"))
    val pairs = a.join(b, Seq("lang", "source"))
      .filter(col("id_a") < col("id_b"))
      .filter(sizeRatioAtLeast(col("sh_a"), col("sh_b"), jaccardThreshold))
      .withColumn("jaccard", pairJaccard(col("sh_a"), col("sh_b")))
    Canon.canonicalize(pairs
      .filter(col("jaccard") >= jaccardThreshold)
      .select("lang", "source", "id_a", "id_b", "jaccard"))
  }

  /** Shared CTE chain ending in `jpairs` — used by the jaccard oracle and
    * the clustering oracle.
    */
  private val jaccardBlockedCte: String =
    s"""d AS (
       |  SELECT doc_id, lang, source, $shinglesSql AS sh
       |  FROM (SELECT doc_id, lang, source,
       |          lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm
       |        FROM documents)),
       |p AS (
       |  SELECT a.lang, a.source, a.doc_id AS id_a, b.doc_id AS id_b,
       |         CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) AS n_common,
       |         len(a.sh) AS na, len(b.sh) AS nb
       |  FROM d a JOIN d b
       |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id),
       |jpairs AS (
       |  SELECT lang, source, id_a, id_b,
       |         n_common / (na + nb - n_common) AS jaccard
       |  FROM p
       |  WHERE n_common / (na + nb - n_common) >= $jaccardThreshold)""".stripMargin

  val jaccardBlockedOracle: String =
    s"""WITH $jaccardBlockedCte
       |SELECT lang, source, id_a, id_b, jaccard FROM jpairs""".stripMargin

  // ---- duplicate clustering -------------------------------------------

  /** Connected components over the near-duplicate pair graph: every doc in
    * a component labels itself with the component's min doc_id — the
    * "keep one per duplicate cluster" step that follows pair detection in
    * a corpus dedup pipeline.
    *
    * Adaptive: near-dup edge lists are orders of magnitude smaller than
    * the corpus (pairs already passed a high similarity bar), so below
    * `driverThreshold` edges the component solve runs as union-find on the
    * driver — one collect of the pair list, no iterative jobs. Above it,
    * iterative distributed min-label propagation to a fixpoint: one keyed
    * join + aggregate per round, rounds = graph diameter (near-dup
    * components are tiny cliques, diameter ≤ 2–3; the alternating-star
    * variant would bound pathological diameters at O(log n)).
    * Oracle: recursive-CTE transitive closure.
    */
  def dedupClusters(spark: SparkSession, sfDir: String,
                    driverThreshold: Long = 1000000L): DataFrame = {
    val pairs = jaccardBlocked(spark, sfDir)
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
      .persist()
    val result =
      if (pairs.count() <= driverThreshold) unionFindLocal(spark, pairs)
      else labelPropagation(pairs)
    Canon.canonicalize(result)
  }

  private def unionFindLocal(spark: SparkSession,
                             pairs: DataFrame): DataFrame = {
    import spark.implicits._
    val edges = pairs.as[(Long, Long)].collect()
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) // min wins
    }
    val ids = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
    ids.map(id => (id, find(id))).toSeq.toDF("doc_id", "cluster_id")
  }

  private def labelPropagation(pairs: DataFrame): DataFrame = {
    // undirected edge list, both directions
    val edges = pairs.union(
      pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b"))).persist()
    var labels = edges.select(col("id_a").as("id"))
      .distinct().withColumn("label", col("id")).persist()
    var changed = 1L
    while (changed > 0) {
      val neighborMin = edges
        .join(labels, edges("id_b") === labels("id"))
        .groupBy(edges("id_a").as("id"))
        .agg(min("label").as("nmin"))
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nmin"), col("label")))
            .as("label"))
        .persist()
      changed = next.join(labels.withColumnRenamed("label", "old"), Seq("id"))
        .filter(col("label") =!= col("old")).count()
      labels.unpersist()
      labels = next
    }
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  val dedupClustersOracle: String =
    s"""WITH RECURSIVE $jaccardBlockedCte,
       |edges AS (
       |  SELECT id_a, id_b FROM jpairs
       |  UNION ALL SELECT id_b, id_a FROM jpairs),
       |reach(id, root) AS (
       |  SELECT DISTINCT id_a, id_a FROM edges
       |  UNION
       |  SELECT e.id_a, r.root FROM edges e JOIN reach r ON e.id_b = r.id)
       |SELECT id AS doc_id, min(root) AS cluster_id
       |FROM reach GROUP BY id""".stripMargin

  // ---- MinHash + LSH --------------------------------------------------

  val numHashes = 64
  val numBands = 16
  val rowsPerBand: Int = numHashes / numBands
  val maxBucketSize = 64

  /** 64-hash MinHash signature as a column expression: h_i(s) =
    * xxhash64(i, s); sig_i = min over the shingle set. Reference semantics
    * for specs; the pipeline uses `signatures` below — higher-order
    * lambdas run interpreted, and 64 × |shingles| interpreted evals per
    * doc dominated the first benchmark of this op.
    */
  def signature(sh: Column): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(sh, s => xxhash64(i, s))))

  /** The same signatures via 64 codegen'd MIN aggregates over the exploded
    * (doc_id, s) shingle table: the shuffle carries only the 64 partial
    * minima per doc (map-side combine), and the hash/min loop stays inside
    * whole-stage codegen. Value-identical to `signature` (asserted in
    * DedupOpsSpec).
    */
  def signaturesFromTable(st: DataFrame): DataFrame = {
    val aggs = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("s"))).as(s"h$i"))
    st.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** Array-input convenience form (specs). */
  def signatures(shingled: DataFrame): DataFrame =
    signaturesFromTable(
      shingled.select(col("doc_id"), explode(col("sh")).as("s")))

  /** LSH candidates (band-bucket collisions) verified by exact Jaccard.
    *
    * The band join carries ONLY (band, bucket, doc_id) — candidate pairs
    * are deduplicated as bare id pairs first, and the shingle sets are
    * attached afterwards by two hash joins. Shuffling the shingle arrays
    * through the 16-way banding (the naive layout) multiplies exchange
    * volume by bands × docs and dominated the first benchmark of this op.
    */
  def minhashLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = documents(spark, sfDir)
      .repartition(col("doc_id"))
      .withColumn("norm", TextOps.normText(col("text")))
    val st = shingleTable(docs).persist() // feeds signatures AND arrays
    val d = shingleArrays(st)
      .persist() // both candidate-attach joins
    val sigs = signaturesFromTable(st)
    // one row per (doc, band): bucket key hashes the band's signature slice
    val banded = sigs.select(
      col("doc_id"),
      explode(sequence(lit(0), lit(numBands - 1))).as("band"),
      col("sig"))
      .select(col("doc_id"), col("band"),
        xxhash64(col("band"),
          slice(col("sig"), col("band") * lit(rowsPerBand) + lit(1),
            lit(rowsPerBand))).as("bucket"))
      .persist() // fan-out: bucket-size filter + both self-join sides
      // (without these persists the 64-hash signature lambda — the
      // dominant cost — re-evaluates once per consuming subtree)
    // Mega-buckets are dropped before pairing: a bucket shared by hundreds
    // of documents signals a low-information signature slice (common on
    // low-entropy corpora) and its candidate pairs grow quadratically —
    // the classic LSH straggler. Standard practice at corpus scale; pairs
    // that are genuinely similar still collide in their other 15 bands.
    val keptBuckets = banded.groupBy("band", "bucket")
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBucketSize)
      .select("band", "bucket")
    val kept = banded.join(keptBuckets, Seq("band", "bucket"))
    val candidates = kept.as("x").join(kept.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct() // same pair may collide in many bands
    val withSets = candidates
      .join(d.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(d.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
    Canon.canonicalize(withSets
      .filter(sizeRatioAtLeast(col("sh_a"), col("sh_b"), jaccardThreshold))
      .withColumn("jaccard", pairJaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= jaccardThreshold)
      .select("id_a", "id_b", "jaccard"))
  }

  // ---- SimHash --------------------------------------------------------

  /** Per-bit (+1 / −1) vote totals over token hashes: one fold over the
    * token array with a 64-counter array accumulator (bit masks are Scala
    * literals — `shiftright` takes only literal shift amounts).
    */
  def simhashVotes(tokens: Column): Column =
    aggregate(
      tokens,
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t)
        val bits = array((0 until 64).map(i =>
          when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, lit(1L))
            .otherwise(lit(-1L))): _*)
        zip_with(acc, bits, (a, v) => a + v)
      })

  /** Assemble the 64-bit signature from a materialized vote-array column
    * (materialized so the fold is evaluated once, not per bit).
    */
  def simhashFromVotes(votes: Column): Column =
    (0 until 64).map(i =>
      when(element_at(votes, i + 1) > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))

  val simhashMaxHamming = 8

  /** Salt factor for skewed block self-joins. A block key with few
    * distinct values (5 langs, 10 labels) caps join parallelism at that
    * count and the largest block's quadratic work lands on ONE task. The
    * standard fix: the left side gets a deterministic salt from its id,
    * the right side is replicated across all salts, and the join keys on
    * (block, salt) — each pair still matches exactly once (on the left
    * row's salt), parallelism multiplies by `saltFactor`, and the
    * replication cost is saltFactor × the narrow right side.
    */
  val saltFactor = 8

  private[ext] def saltedBlockSelfJoin(left: DataFrame, right: DataFrame,
                                       blockCol: String,
                                       leftId: String): DataFrame = {
    val salted = left.withColumn("salt",
      pmod(xxhash64(col(leftId)), lit(saltFactor.toLong)))
    val replicated = right.withColumn("salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    salted.join(replicated, Seq(blockCol, "salt")).drop("salt")
  }

  /** Lang-blocked near-dup pairs at Hamming distance ≤ 8 of 64 bits. */
  def simhashNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    val d = documents(spark, sfDir)
      .repartition(col("doc_id")) // one-split source; vote fold is the cost
      .withColumn("norm", TextOps.normText(col("text")))
      .withColumn("votes", simhashVotes(split(col("norm"), " ")))
      .select(col("doc_id"), col("lang"),
        simhashFromVotes(col("votes")).as("sig"))
      .persist() // both self-join sides
    val a = d.select(col("lang"), col("doc_id").as("id_a"),
      col("sig").as("sig_a"))
    val b = d.select(col("lang"), col("doc_id").as("id_b"),
      col("sig").as("sig_b"))
    Canon.canonicalize(
      saltedBlockSelfJoin(a, b, "lang", "id_a")
        .filter(col("id_a") < col("id_b"))
        .withColumn("hamming",
          bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
        .filter(col("hamming") <= simhashMaxHamming)
        .select("lang", "id_a", "id_b", "hamming"))
  }
}
