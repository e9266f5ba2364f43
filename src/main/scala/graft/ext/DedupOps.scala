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
  *    probability near J ≈ 0.5. The whole pipeline is built on the
  *    arithmetic hash family below — deterministic integer arithmetic that
  *    DuckDB reproduces exactly — so the LSH output, though approximate as
  *    a RECALL statement, is a deterministic function of the input with a
  *    full SQL oracle (`minhashLshOracle`).
  *  - `simhashNearDup` reduces every doc to a 64-bit signature; near-dups
  *    are pairs at small Hamming distance (bit_count(xor)). Candidates
  *    come from Hamming-LSH chunk banding — the signature is split into
  *    maxHamming+1 exact chunks and pairs are generated only inside equal
  *    (lang, chunk, value) buckets; by pigeonhole every pair within the
  *    Hamming budget collides in ≥ 1 chunk, so the banding loses nothing
  *    (100% recall) while the join stays linear in bucket sizes.
  *
  * Hash family: every hash is integer arithmetic mod P = 2³¹−1 (prime).
  *  - shingle/token hash: polynomial fold  h = Σ c_j·31^j mod P  over
  *    codepoints (unrolled per-char substr/ascii — fully codegen'd);
  *  - MinHash family:     h_i(x) = (a_i·x + b_i) mod P  (universal affine
  *    family; a_i, b_i derived from fixed public mixing constants);
  *  - band buckets:       polynomial combine of the band's signature
  *    slice, seeded with the band index.
  * All intermediates stay below 2⁶² so 64-bit arithmetic is exact and
  * IDENTICAL in Spark and DuckDB — that twin-executability is why this
  * family replaces xxhash64 (same collision quality class for dedup
  * purposes, but DuckDB has no xxhash64).
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

  // ---- the DuckDB-twin arithmetic hash family -------------------------

  /** 2³¹−1, prime. All hashes in this file are mod P. */
  val P = 2147483647L

  /** Affine MinHash family constants — single-sourced from the native
    * expression so the Spark plan, the reference aggregate form, and the
    * generated oracle SQL can never drift.
    */
  private[ext] def aCoef(i: Int): Long =
    graft.functions.MinHashSignature.aCoef(i)
  private[ext] def bCoef(i: Int): Long =
    graft.functions.MinHashSignature.bCoef(i)

  /** Variable-length polynomial string hash (interpreted lambda fold —
    * spec/reference use only; hot paths use the unrolled forms below).
    */
  private[ext] def polyHash(s: Column, base: Int): Column =
    aggregate(filter(split(s, ""), ch => ch =!= ""), lit(0L),
      (acc, ch) => (acc * base + ascii(ch)) % P)

  /** 62-bit string hash: two independent polynomial folds (base 31 / 37)
    * packed as h31·2³¹ + h37. 31 bits alone would collide at ~|set|²/P per
    * pair — visible against the STRING-set jaccard oracle; 62 bits puts
    * collisions back at the xxhash64-negligible level while staying exact
    * 64-bit arithmetic in both engines.
    */
  private[ext] def polyHash62(s: Column): Column =
    polyHash(s, 31) * lit(1L << 31) + polyHash(s, 37)

  /** The identical computation in DuckDB SQL (generated from the same
    * constants as [[graft.functions.ShingleHashes]] — the twin-ness is by
    * construction, not by transcription).
    */
  private def shingleHashSql(norm: String, pos: String): String = {
    def fold(base: Int): String =
      (0 until shingleLen).foldLeft("CAST(0 AS BIGINT)") { (acc, j) =>
        s"(($acc * $base + ord(substr($norm, $pos + $j, 1))) % $P)"
      }
    s"(${fold(31)} * ${1L << 31} + ${fold(37)})"
  }

  /** Shingle set hashed to 62-bit longs: set-intersection CARDINALITY is
    * preserved (collisions ~1e-12 per pair) while the per-pair intersect
    * runs over longs instead of short strings — roughly an order of
    * magnitude cheaper in the quadratic hot loop.
    */
  def hashedShingles(c: Column): Column =
    transform(shingles(c), s => polyHash62(s))

  def hashedShinglesOfNorm(norm: Column): Column =
    transform(shinglesOfNorm(norm), s => polyHash62(s))

  /** Per-doc DISTINCT hashed-shingle set as an array column, one
    * projection with ZERO shuffles: the native single-pass
    * [[graft.functions.ShingleHashes]] expression hashes every window and
    * dedups in place. Two prior formulations were each substantially
    * slower and are kept only as documented history: interpreted array
    * lambdas (~17 s of a ~20 s pipeline at sf0.1), then per-position
    * substr/ascii arithmetic whose substring walks are O(len²) per doc
    * and whose explode → distinct → collect_list round-trip cost two
    * full exchanges of the window table.
    *
    * Input: (doc_id, norm, meta...); output keeps the named meta columns.
    */
  def shingleSets(docs: DataFrame, meta: Seq[String] = Nil): DataFrame =
    docs.filter(length(col("norm")) >= shingleLen)
      .select(col("doc_id") +: meta.map(col) :+
        graft.functions.ShingleHashes(col("norm"), shingleLen,
          distinct = true).as("sh"): _*)

  /** The exploded (doc_id, s) form — the shape the MinHash signature
    * aggregation consumes. Derive it from a persisted `shingleSets` frame
    * so the hashing runs once.
    */
  def shingleTable(sets: DataFrame): DataFrame =
    sets.select(col("doc_id"), explode(col("sh")).as("s"))

  /** Pair Jaccard over SORTED hashed-shingle sets: the intersection count
    * runs as the native allocation-free merge (the per-pair hash set of
    * `array_intersect` was the dominant cost of the verify stages).
    */
  private def pairJaccard(shA: Column, shB: Column): Column = {
    val common = graft.functions.SortedIntersectCount(shA, shB)
      .cast("double")
    common / (size(shA) + size(shB) - common)
  }

  /** Provable Jaccard upper bound from set sizes alone:
    * J(A,B) ≤ min(|A|,|B|) / max(|A|,|B|). Pairs failing the threshold on
    * the bound are skipped before the expensive intersection — EXACT (no
    * false negatives), so the oracle needs no mirror of this filter.
    */
  private def sizeRatioAtLeast(nA: Column, nB: Column,
                               t: Double): Column =
    least(nA, nB).cast("double") / greatest(nA, nB).cast("double") >= t

  /** Exact shingle-Jaccard ≥ threshold within (lang, source) blocks.
    *
    * Scale shape: the quadratic pair join runs over NARROW rows
    * (block key, id, shingle-count) through `saltedBlockSelfJoin` — few
    * distinct (lang, source) blocks would otherwise cap parallelism at
    * the block count with the largest block's pair work on one task. The
    * size-ratio bound prunes on the narrow rows; only surviving pairs get
    * their shingle arrays attached (two hash joins keyed on id — the same
    * attach-late trick as minhashLsh) for the exact intersection.
    */
  def jaccardBlocked(spark: SparkSession, sfDir: String): DataFrame = {
    // repartition first (the fixture file arrives as one split), then one
    // shuffle-free projection to per-doc shingle sets + block metadata.
    val docs = documents(spark, sfDir)
      .repartition(col("doc_id"))
      .withColumn("norm", TextOps.normText(col("text")))
    val d = shingleSets(docs, Seq("lang", "source"))
      .withColumn("nsh", size(col("sh")))
      .persist() // narrow pair sides + both array attaches — shingle once
    d.count() // EAGER (r14): the two salted pair sides and the two
    // array attaches are FOUR independent stages — unmaterialized they
    // race on the cache and re-run the shingle pass (bytes telemetry:
    // 59 MB scanned ≈ 4× the corpus)
    val a = d.select(col("lang"), col("source"), col("doc_id").as("id_a"),
      col("nsh").as("n_a"))
    val b = d.select(col("lang"), col("source"), col("doc_id").as("id_b"),
      col("nsh").as("n_b"))
    val idPairs = saltedBlockSelfJoin(a, b, Seq("lang", "source"), "id_a")
      .filter(col("id_a") < col("id_b"))
      .filter(sizeRatioAtLeast(col("n_a"), col("n_b"), jaccardThreshold))
      .select("lang", "source", "id_a", "id_b")
    val withSets = idPairs
      .join(d.select(col("doc_id").as("id_a"), col("sh").as("sh_a")),
        Seq("id_a"))
      .join(d.select(col("doc_id").as("id_b"), col("sh").as("sh_b")),
        Seq("id_b"))
    Canon.materialized(
      Canon.canonicalize(withSets
        .withColumn("jaccard", pairJaccard(col("sh_a"), col("sh_b")))
        .filter(col("jaccard") >= jaccardThreshold)
        .select("lang", "source", "id_a", "id_b", "jaccard")),
      d)
  }

  /** Shared CTE chain ending in `jpairs` — used by the jaccard oracle and
    * the clustering oracle. n_common is computed by the LINEAR exploded
    * shingle join (group common shingles per pair), not a per-pair
    * `list_intersect`: the two are equivalent BECAUSE shingles are
    * list_distinct per doc, and the per-pair intersect is
    * O(|sh|²·pairs) — at ×10 fixture scale (replica-densified blocks:
    * 16.2M candidate pairs vs sf0.1's 159k) it ground the full-gate
    * DuckDB run past an hour on this one chain; the exploded form
    * passes. Division operand shapes kept bit-identical to the engine.
    */
  private val jaccardBlockedCte: String =
    s"""d AS MATERIALIZED (
       |  SELECT doc_id, lang, source, $shinglesSql AS sh
       |  FROM (SELECT doc_id, lang, source,
       |          lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm
       |        FROM documents)),
       |dn AS MATERIALIZED (SELECT doc_id, len(sh) AS n FROM d),
       |ds AS MATERIALIZED (
       |  SELECT doc_id, lang, source, s FROM d, UNNEST(sh) t(s)),
       |p AS (
       |  SELECT a.lang, a.source, a.doc_id AS id_a, b.doc_id AS id_b,
       |         CAST(count(*) AS DOUBLE) AS n_common
       |  FROM ds a JOIN ds b
       |    ON a.lang = b.lang AND a.source = b.source AND a.s = b.s
       |   AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3, 4),
       |jpairs AS (
       |  SELECT p.lang, p.source, id_a, id_b,
       |         n_common / (na.n + nb.n - n_common) AS jaccard
       |  FROM p JOIN dn na ON p.id_a = na.doc_id
       |         JOIN dn nb ON p.id_b = nb.doc_id
       |  WHERE n_common / (na.n + nb.n - n_common) >= $jaccardThreshold)""".stripMargin

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
                    driverThreshold: Long = 1000000L): DataFrame =
    clustersFromPairs(spark, jaccardBlocked(spark, sfDir), driverThreshold)

  /** Clusters over MinHash-LSH pairs — the 100 TB dedup pipeline's shape:
    * shingle → LSH banding → exact verify → connected components. The
    * exact blocked-jaccard variant above stays as the precise tool where
    * a natural block key bounds the quadratic work; THIS is the chain the
    * `corpus` Runner schedules.
    */
  def dedupClustersLsh(spark: SparkSession, sfDir: String,
                       driverThreshold: Long = 1000000L): DataFrame =
    clustersFromPairs(spark, lshPairs(spark, sfDir), driverThreshold)

  /** Duplicate-cluster SIZE distribution — the corpus-health summary a
    * dedup report leads with: how many families of each size exist,
    * what fraction of the corpus sits in duplicate families, and how
    * many documents deduplication would remove at each size. A corpus
    * dominated by size-2 families needs different handling (pair-wise
    * noise, maybe threshold tuning) than one with thousand-member
    * template families (boilerplate mining).
    *
    * One keyed rollup over the clustering output (cluster → size),
    * then a size-keyed rollup — both bounded; removal per family of
    * size s is exactly s−1 (the representative survives).
    */
  def clusterSizes(spark: SparkSession, sfDir: String): DataFrame = {
    val clusters = dedupClustersLsh(spark, sfDir)
    val bySize = clusters.groupBy("cluster_id")
      .agg(count(lit(1)).as("size"))
      .groupBy("size").agg(
        count(lit(1)).as("n_clusters"),
        sum("size").as("n_docs"),
        sum(col("size") - 1L).as("n_removable"))
    Canon.materialized(
      Canon.canonicalize(bySize), clusters)
  }

  lazy val clusterSizesOracle: String =
    s"""WITH RECURSIVE $minhashLshCte,
       |${clusterCte("lpairs")},
       |fam AS (
       |  SELECT cluster_id, count(*) AS size
       |  FROM clusters GROUP BY 1)
       |SELECT size, count(*) AS n_clusters,
       |       CAST(sum(size) AS BIGINT) AS n_docs,
       |       CAST(sum(size - 1) AS BIGINT) AS n_removable
       |FROM fam GROUP BY 1""".stripMargin

  /** Connected components over ANY near-dup pair frame (id_a, id_b) —
    * the pair source is a parameter so every pair generator in this file
    * (blocked jaccard, MinHash-LSH, simhash chunk-LSH, the embedding
    * variants in VectorOps) composes with the same clustering step.
    */
  def clustersFromPairs(spark: SparkSession, pairSource: DataFrame,
                        driverThreshold: Long = 1000000L): DataFrame = {
    val pairs = pairSource
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
      .persist()
    val result =
      if (pairs.count() <= driverThreshold) unionFindLocal(spark, pairs)
      else labelPropagation(pairs)
    Canon.materialized(Canon.canonicalize(result), pairs, pairSource)
  }

  /** INCREMENTAL connected components — the dedup-CLUSTER lifecycle's
    * merge half, closing the last lifecycle asymmetry (LSH/LM/BPE/IVF
    * indexes all merge; clusters were rebuild-only): extend an existing
    * components table with a batch of new near-dup pairs WITHOUT
    * re-clustering the corpus.
    *
    * Quotient-graph argument for exactness: every existing component
    * collapses to its representative (cluster_id = the component MIN),
    * the new pairs' endpoints are remapped to representatives, CC runs
    * on that CONDENSED graph only (batch-sized, not corpus-sized), and
    * the two mappings compose. Because both levels pick the component
    * minimum and min is associative, the composition equals
    * [[clustersFromPairs]] over the UNION of old and new pairs,
    * bit-for-bit — which is why [[dedupClustersIncremental]] can share
    * `dedupClustersLshOracle`, and what ClustersMergeSpec pins across
    * arbitrary pair splits.
    *
    * FORGET is the other half: removing a document can DISCONNECT a
    * component (the opposite of min-compose), so exact delete
    * propagation must re-cluster — but [[clustersForget]] re-clusters
    * ONLY the components that contain a forgotten doc (batch-sized),
    * not the corpus.
    *
    * Scale shape: two broadcast-or-shuffled hash joins to condense
    * (components keyed by doc_id), CC over batch-condensed edges (the
    * adaptive union-find/label-propagation core), one join to re-root
    * old members. The corpus-sized components table is never iterated —
    * only re-pointed where its representative actually moved.
    */
  def clustersMerge(spark: SparkSession, components: DataFrame,
                    newPairs: DataFrame,
                    driverThreshold: Long = 1000000L): DataFrame = {
    val comp = components.select(col("doc_id").cast("long"),
      col("cluster_id").cast("long")).persist()
    comp.count() // EAGER: three consumers below
    val condensed = newPairs
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
      .join(comp.select(col("doc_id").as("id_a"),
        col("cluster_id").as("rep_a")), Seq("id_a"), "left")
      .join(comp.select(col("doc_id").as("id_b"),
        col("cluster_id").as("rep_b")), Seq("id_b"), "left")
      .select(coalesce(col("rep_a"), col("id_a")).as("id_a"),
        coalesce(col("rep_b"), col("id_b")).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
    // CC over condensed nodes: old representatives and brand-new docs
    val repMap = clustersFromPairs(spark, condensed, driverThreshold)
      .select(col("doc_id").as("rep"), col("cluster_id").as("new_id"))
    // old members re-root where their representative moved …
    val rePointed = comp
      .join(repMap, comp("cluster_id") === repMap("rep"), "left")
      .select(comp("doc_id"),
        coalesce(col("new_id"), comp("cluster_id")).as("cluster_id"))
    // … and batch docs unseen by the old clustering join fresh (an old
    // representative is always a member of its own component, so the
    // anti join keeps exactly the genuinely-new doc_ids)
    val newDocs = repMap
      .join(comp.select(col("doc_id").as("rep")), Seq("rep"), "left_anti")
      .select(col("rep").as("doc_id"), col("new_id").as("cluster_id"))
    Canon.materialized(
      Canon.canonicalize(rePointed.unionByName(newDocs)), comp)
  }

  /** BATCH-SIZED cluster FORGET — the delete half of the cluster
    * lifecycle, closing the one asymmetry left after [[clustersMerge]]
    * (LSH/LM/BPE/IVF artifacts all both merge AND forget; clusters
    * merged but forgot only by corpus re-cluster). Removing a document
    * can DISCONNECT its component, and removing the min-id member
    * renames it, so affected components must genuinely re-cluster —
    * but ONLY those components:
    *
    *  1. `affected`  = distinct cluster_ids containing a forgotten doc
    *     (≤ |gone| rows);
    *  2. components NOT in `affected` pass through UNTOUCHED — no
    *     member was removed, and a near-dup pair never spans two
    *     components, so their pair graph is exactly what it was;
    *  3. affected components re-cluster from `pairSource` restricted
    *     to their SURVIVING members (endpoint restriction IS component
    *     restriction, same argument), via the adaptive
    *     [[clustersFromPairs]] core. A survivor whose every pair died
    *     with the forgotten docs becomes a singleton and DROPS out —
    *     exactly what a from-scratch clustering of the surviving pair
    *     graph produces.
    *
    * Exactness: the union of (2) and (3) is bit-for-bit
    * [[clustersFromPairs]] over the surviving pair graph
    * (ClustersForgetSpec pins forget(merge(base, X), X) ≡ base across
    * arbitrary splits, disconnection and representative-loss included).
    * Pair-LEVEL forget semantics (e.g. LSH bucket-cap census shifts
    * under deletion) are the INDEX's own forget story
    * ([[lshIndexForget]]); this operator forgets at the component level
    * of a realized pair graph — at 100 TB, the persisted LSH index's
    * pair list.
    *
    * Scale shape: the corpus-sized components table is touched by two
    * keyed semi/anti joins and never iterated; re-cluster work is
    * bounded by the affected MEMBER count (|gone| × max family size —
    * batch-sized for batch-sized deletes, families being tiny cliques),
    * and the pair restriction is two semi joins AQE broadcasts when the
    * survivor set is measured small.
    */
  def clustersForget(spark: SparkSession, components: DataFrame,
                     gone: DataFrame, pairSource: DataFrame,
                     driverThreshold: Long = 1000000L): DataFrame = {
    val comp = components.select(col("doc_id").cast("long"),
      col("cluster_id").cast("long")).persist()
    comp.count() // EAGER: three consumers below
    val goneIds = gone.select(col("doc_id").cast("long"))
      .distinct().persist()
    goneIds.count() // EAGER: membership probe + survivor anti join
    val affected = comp.join(goneIds, Seq("doc_id"), "left_semi")
      .select("cluster_id").distinct().persist()
    affected.count() // EAGER: untouched anti + member semi consumers
    val untouched = comp.join(affected, Seq("cluster_id"), "left_anti")
      .select("doc_id", "cluster_id")
    val survivors = comp.join(affected, Seq("cluster_id"), "left_semi")
      .join(goneIds, Seq("doc_id"), "left_anti")
      .select("doc_id").persist()
    survivors.count() // EAGER: both endpoint restrictions
    val survivorPairs = pairSource
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
      .join(survivors.withColumnRenamed("doc_id", "id_a"),
        Seq("id_a"), "left_semi")
      .join(survivors.withColumnRenamed("doc_id", "id_b"),
        Seq("id_b"), "left_semi")
    val reclustered = clustersFromPairs(spark, survivorPairs,
      driverThreshold)
    Canon.materialized(
      Canon.canonicalize(untouched.unionByName(reclustered)),
      comp, goneIds, affected, survivors, reclustered)
  }

  /** The cluster lifecycle as one hash-gated query: cluster YESTERDAY's
    * corpus-internal pairs (both endpoints in the corpus slice), then
    * MERGE today's remaining pairs in incrementally — the result must
    * equal re-clustering the whole pair set from scratch, so it shares
    * the from-scratch oracle.
    */
  def dedupClustersIncremental(spark: SparkSession,
                               sfDir: String): DataFrame = {
    val pairs = lshPairs(spark, sfDir)
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
      .persist()
    pairs.count() // EAGER: two slice consumers
    def inCorpus(c: Column) =
      sideBucket(c) < incrementalCorpusPermille
    val oldPairs = pairs
      .filter(inCorpus(col("id_a")) && inCorpus(col("id_b")))
    val newPairs = pairs
      .filter(!(inCorpus(col("id_a")) && inCorpus(col("id_b"))))
    val out = clustersMerge(spark,
      clustersFromPairs(spark, oldPairs), newPairs)
    Canon.materialized(out, pairs)
  }

  /** The cluster lifecycle CLOSED as one hash-gated query: cluster
    * yesterday's corpus-internal pairs, MERGE today's pairs in
    * ([[clustersMerge]]), then FORGET today's docs again
    * ([[clustersForget]]) — the result must equal the base clustering,
    * as if the batch had never touched the component table. The oracle
    * states exactly that from scratch: the full LSH pair graph
    * restricted to corpus-side endpoints, clustered by transitive
    * closure — it never sees the merge OR the forget, so round-trip
    * residue of any kind (a stale re-pointed member, a surviving
    * batch-only pair, a lost disconnection) breaks the hash.
    */
  def dedupClustersForgotten(spark: SparkSession,
                             sfDir: String): DataFrame = {
    val pairs = lshPairs(spark, sfDir)
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
      .persist()
    pairs.count() // EAGER: slice consumers + the forget restriction
    def inCorpus(c: Column) =
      sideBucket(c) < incrementalCorpusPermille
    val oldPairs = pairs
      .filter(inCorpus(col("id_a")) && inCorpus(col("id_b")))
    val newPairs = pairs
      .filter(!(inCorpus(col("id_a")) && inCorpus(col("id_b"))))
    val merged = clustersMerge(spark,
      clustersFromPairs(spark, oldPairs), newPairs)
    val gone = documents(spark, sfDir)
      .filter(!inCorpus(col("doc_id")))
      .select("doc_id")
    val out = clustersForget(spark, merged, gone, pairs)
    Canon.materialized(out, pairs, merged)
  }

  /** Never-existed statement: corpus-internal pairs only, clustered
    * from scratch.
    */
  lazy val dedupClustersForgottenOracle: String =
    s"""WITH RECURSIVE $minhashLshCte,
       |spairs AS (
       |  SELECT id_a, id_b FROM lpairs
       |  WHERE ${sideBucketSql("id_a")} < $incrementalCorpusPermille
       |    AND ${sideBucketSql("id_b")} < $incrementalCorpusPermille),
       |${clusterCte("spairs")}
       |SELECT doc_id, cluster_id FROM clusters""".stripMargin

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

  /** Truncate label-frame lineage every N propagation rounds. Near-dup
    * components are tiny cliques (diameter 2–3), but a pathological
    * high-diameter graph would otherwise stack one join+agg per round
    * into an unboundedly deep plan — `localCheckpoint` materializes the
    * current labels and cuts the lineage, keeping every round's plan
    * depth bounded by the checkpoint interval.
    */
  private val checkpointEveryRounds = 4

  private def labelPropagation(pairs: DataFrame): DataFrame = {
    // undirected edge list, both directions
    val edges = pairs.union(
      pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b"))).persist()
    var labels = edges.select(col("id_a").as("id"))
      .distinct().withColumn("label", col("id")).persist()
    var changed = 1L
    var round = 0
    while (changed > 0) {
      round += 1
      val neighborMin = edges
        .join(labels, edges("id_b") === labels("id"))
        .groupBy(edges("id_a").as("id"))
        .agg(min("label").as("nmin"))
      val stepped = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nmin"), col("label")))
            .as("label"))
      // localCheckpoint persists AND truncates lineage; plain persist
      // caches but keeps the whole round-stack as the recompute path
      val next =
        if (round % checkpointEveryRounds == 0) stepped.localCheckpoint()
        else stepped.persist()
      changed = next.join(labels.withColumnRenamed("label", "old"), Seq("id"))
        .filter(col("label") =!= col("old")).count()
      labels.unpersist()
      labels = next
    }
    Canon.materialized(
      labels.select(col("id").as("doc_id"), col("label").as("cluster_id")),
      edges, labels)
  }

  /** Connected-components CTE chain over a pair relation — the single
    * source for every clustering-family oracle (detect and apply both
    * compose it, so the clusterings they verify can never diverge).
    */
  private[ext] def clusterCte(pairsRel: String): String =
    s"""edges AS (
       |  SELECT id_a, id_b FROM $pairsRel
       |  UNION ALL SELECT id_b, id_a FROM $pairsRel),
       |reach(id, root) AS (
       |  SELECT DISTINCT id_a, id_a FROM edges
       |  UNION
       |  SELECT e.id_a, r.root FROM edges e JOIN reach r ON e.id_b = r.id),
       |clusters AS (
       |  SELECT id AS doc_id, min(root) AS cluster_id
       |  FROM reach GROUP BY id)""".stripMargin

  val dedupClustersOracle: String =
    s"""WITH RECURSIVE $jaccardBlockedCte,
       |${clusterCte("jpairs")}
       |SELECT doc_id, cluster_id FROM clusters""".stripMargin

  /** Oracle for [[dedupClustersLsh]]: the recursive-CTE transitive
    * closure composed over the FULL MinHash-LSH pipeline's CTE chain —
    * the whole 100 TB dedup DAG (shingle → band → verify → cluster) is
    * one hash-checkable SQL statement. (Defined with the LSH oracle
    * below; forward-referenced lazily so source order stays topical.)
    */
  lazy val dedupClustersLshOracle: String =
    s"""WITH RECURSIVE $minhashLshCte,
       |${clusterCte("lpairs")}
       |SELECT doc_id, cluster_id FROM clusters""".stripMargin

  /** APPLIES the dedup decision: the cleaned corpus after LSH
    * clustering — every document survives except non-representative
    * cluster members (the representative is the cluster's min doc_id,
    * which IS the cluster_id the clustering emits). This closes the
    * detect → remove loop: the other dedup queries report duplication,
    * this one materializes the corpus a training run would read.
    *
    * Scale shape: the loser set scales with the DUPLICATE count, and the
    * motivating workload (web-crawl corpora) runs 30–80% near-duplicates
    * — so losers can be corpus-sized and must NOT be force-broadcast (a
    * forced hint bypasses Spark's size checks straight into an executor
    * OOM / broadcast-limit failure exactly when dedup matters most). The
    * join carries no hint: AQE broadcasts the loser side at runtime when
    * its measured size is small, and falls back to the scale-safe
    * shuffled anti join when it isn't.
    */
  def dedupApply(spark: SparkSession, sfDir: String): DataFrame = {
    val clusters = dedupClustersLsh(spark, sfDir)
    val losers = clusters.filter(col("doc_id") =!= col("cluster_id"))
      .select("doc_id")
    // materialized so the clusters frame (cached by its own contract)
    // is released here instead of lingering in the session cache
    Canon.materialized(
      Canon.canonicalize(
        documents(spark, sfDir).select("doc_id", "lang", "source")
          .join(losers, Seq("doc_id"), "left_anti")),
      clusters)
  }

  /** The clustering oracle's CTE chain with the anti join appended. */
  lazy val dedupApplyOracle: String =
    s"""WITH RECURSIVE $minhashLshCte,
       |${clusterCte("lpairs")},
       |losers AS (
       |  SELECT doc_id FROM clusters WHERE doc_id <> cluster_id)
       |SELECT d.doc_id, d.lang, d.source
       |FROM documents d ANTI JOIN losers l ON d.doc_id = l.doc_id""".stripMargin

  /** Dedup apply under a QUALITY keep-policy: within every duplicate
    * family keep the highest-[[TextOps.qualityScore]] member (ties →
    * min doc_id) instead of [[dedupApply]]'s min-id representative. At
    * corpus scale this is the policy that matters — near-dup families
    * mix a clean original with truncated or boilerplate-wrapped
    * recrawls, and min-id keeps whichever was crawled first, not
    * whichever is best.
    *
    * Scale shape: the scored join and the per-family window both touch
    * only CLUSTER MEMBERS (the bounded duplicate set, not the corpus);
    * families are tiny cliques so the window partitions are bounded;
    * the final anti join is hint-free like dedupApply (AQE picks
    * broadcast only when the measured loser set is small).
    */
  def dedupApplyBest(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clusters = dedupClustersLsh(spark, sfDir)
    val scores = TextOps.qualityScore(spark, sfDir)
      .select(col("doc_id"), col("quality_score"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("quality_score").desc, col("doc_id").asc)
    val losers = clusters.join(scores, Seq("doc_id"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") > 1)
      .select("doc_id")
    Canon.materialized(
      Canon.canonicalize(
        documents(spark, sfDir).select("doc_id", "lang", "source")
          .join(losers, Seq("doc_id"), "left_anti")),
      clusters)
  }

  /** The clustering chain joined to the shared quality CTE, best-kept
    * per family via row_number, anti join appended.
    */
  lazy val dedupApplyBestOracle: String =
    s"""WITH RECURSIVE $minhashLshCte,
       |${clusterCte("lpairs")},
       |${TextOps.qualityCte},
       |ranked AS (
       |  SELECT c.doc_id,
       |         row_number() OVER (PARTITION BY c.cluster_id
       |           ORDER BY q.quality_score DESC, c.doc_id ASC) AS rk
       |  FROM clusters c JOIN qs q ON c.doc_id = q.doc_id),
       |blosers AS (SELECT doc_id FROM ranked WHERE rk > 1)
       |SELECT d.doc_id, d.lang, d.source
       |FROM documents d ANTI JOIN blosers l ON d.doc_id = l.doc_id"""
      .stripMargin

  // ---- MinHash + LSH --------------------------------------------------

  val numHashes = 64
  val numBands = 16
  val rowsPerBand: Int = numHashes / numBands
  val maxBucketSize = 64

  /** The affine row hash h_i(x) = (a_i·(s mod P) + b_i) mod P. `s` is the
    * 62-bit shingle hash; the mod-P reduction keeps a_i·x below 2⁶²
    * (and since 2³¹ ≡ 1 mod P, it folds the two polynomial halves as
    * h31 + h37 — still a well-mixed 31-bit value).
    */
  private def rowHash(i: Int, s: Column): Column =
    ((s % P) * aCoef(i) + bCoef(i)) % P

  private def rowHashSql(i: Int, s: String): String =
    s"((($s % $P) * ${aCoef(i)} + ${bCoef(i)}) % $P)"

  /** 64-hash MinHash signature as a column expression: sig_i = min of
    * h_i over the shingle set. Reference semantics for specs; the
    * pipeline uses `signaturesFromTable` below — higher-order lambdas run
    * interpreted, and 64 × |shingles| interpreted evals per doc dominated
    * the first benchmark of this op.
    */
  def signature(sh: Column): Column =
    array((0 until numHashes).map(i =>
      array_min(transform(sh, s => rowHash(i, s)))): _*)

  /** The same signatures via 64 codegen'd MIN aggregates over the exploded
    * (doc_id, s) shingle table: the shuffle carries only the 64 partial
    * minima per doc (map-side combine), and the hash/min loop stays inside
    * whole-stage codegen. Value-identical to `signature` (asserted in
    * DedupOpsSpec).
    */
  def signaturesFromTable(st: DataFrame): DataFrame = {
    val aggs = (0 until numHashes).map(i =>
      min(rowHash(i, col("s"))).as(s"h$i"))
    st.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** Array-input convenience form (specs). */
  def signatures(shingled: DataFrame): DataFrame =
    signaturesFromTable(
      shingled.select(col("doc_id"), explode(col("sh")).as("s")))

  /** Polynomial combine of a band's signature slice into one bucket key,
    * seeded with the band index. Bucket collisions across distinct slices
    * are possible (~2⁻³¹) but harmless: they only ADD candidate pairs,
    * every candidate is exact-verified, and the oracle reproduces the
    * identical collisions.
    */
  private val bandMix = 1000003L

  private def bucketExpr(sig: Column, band: Column): Column =
    (0 until rowsPerBand).foldLeft(band.cast("long")) { (acc, j) =>
      (acc * bandMix +
        element_at(sig, band * lit(rowsPerBand) + lit(j + 1))) % P
    }

  private def bucketSql(band: Int): String =
    (0 until rowsPerBand).foldLeft(s"CAST($band AS BIGINT)") { (acc, j) =>
      s"(($acc * $bandMix + h${band * rowsPerBand + j}) % $P)"
    }

  /** LSH candidates (band-bucket collisions) verified by exact Jaccard.
    *
    * The band join carries ONLY (band, bucket, doc_id) — candidate pairs
    * are deduplicated as bare id pairs first, and the shingle sets are
    * attached afterwards by two hash joins. Shuffling the shingle arrays
    * through the 16-way banding (the naive layout) multiplies exchange
    * volume by bands × docs and dominated the first benchmark of this op.
    */
  def minhashLsh(spark: SparkSession, sfDir: String): DataFrame =
    minhashLshBanded(spark, sfDir, numBands)

  /** Dir of the persisted verified-pair table. Every parameter the
    * pairs depend on goes into the path (the [[lshIndexDir]] rule): a
    * constant bump must MISS the old table, never read it.
    */
  private def lshPairsDir(sfDir: String): String = {
    val fp = graft.io.Fingerprint.ofPath(s"$sfDir/documents.parquet")
    val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_").replaceAll("^_+", "")
    val params = s"h$numHashes-b$numBands-s$shingleLen-" +
      s"j${(jaccardThreshold * 100).round}-c$maxBucketSize-v1"
    s"${graft.io.Artifacts.root}/lsh_pairs/${tag}_${params}_$fp"
  }

  /** The corpus's VERIFIED near-dup pair table as a persisted,
    * fingerprint-stamped artifact — the shared-tier form of
    * [[minhashLsh]]. Every downstream consumer of the pair graph
    * (clustering, PageRank, triangles, recall telemetry, leakage)
    * reads this table instead of re-running the shingle → signature →
    * band → verify chain per query: at 100 TB the chain is a
    * corpus-sized job you run once per corpus version, while the pair
    * table it emits is orders smaller (bounded by the band-bucket
    * caps), so probe-side consumers should never pay the build again.
    * First call builds via [[minhashLsh]] and writes (SUCCESS-gated,
    * deterministic — cached ≡ rebuilt bit-for-bit, which is why the
    * consumers' standalone DuckDB oracles stay valid unchanged);
    * subsequent calls read. [[graft.io.Artifacts.sharedTier]] off ⇒
    * plain delegate to [[minhashLsh]] (every query standalone).
    */
  def lshPairs(spark: SparkSession, sfDir: String): DataFrame =
    if (!graft.io.Artifacts.sharedTier) minhashLsh(spark, sfDir)
    else synchronized {
      val dir = lshPairsDir(sfDir)
      if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
        val built = minhashLsh(spark, sfDir) // materialized (cached)
        built.write.mode("overwrite").parquet(dir)
        built.unpersist(false)
      }
      Canon.materialized(
        spark.read.parquet(dir).select("id_a", "id_b", "jaccard"))
    }

  /** [[minhashLsh]] under explicit banding knobs — the parameter axes
    * the recall gate's failure drill deliberately sinks: fewer bands ⇒
    * collision probability 1−(1−j^r)^b falls; an over-aggressive
    * `bucketCap` (the mega-bucket knob) drops the very buckets that
    * hold the dup pairs. Production always calls with
    * (`numBands`, `maxBucketSize`).
    */
  private[ext] def minhashLshBanded(spark: SparkSession, sfDir: String,
                                    bandsUsed: Int,
                                    bucketCap: Int = maxBucketSize)
      : DataFrame = {
    val (_, d, banded, candidates) =
      lshCandidates(spark, sfDir, bandsUsed, bucketCap)
    val withSets = candidates
      .join(d.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(d.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
    Canon.materialized(
      Canon.canonicalize(withSets
        .filter(sizeRatioAtLeast(size(col("sh_a")), size(col("sh_b")),
          jaccardThreshold))
        .withColumn("jaccard", pairJaccard(col("sh_a"), col("sh_b")))
        .filter(col("jaccard") >= jaccardThreshold)
        .select("id_a", "id_b", "jaccard")),
      d, banded)
  }

  /** PRE-FLIGHT LSH COST CENSUS — the planner row a 100 TB dedup run
    * computes BEFORE committing to the candidate self-join: per band,
    * the bucket-size histogram folded to the numbers that size the
    * pair stage — Σ C(bsz,2) uncapped (`pairs_raw`: what the join
    * would generate with no mega-bucket cap), the same sum restricted
    * to buckets within [[maxBucketSize]] (`pairs_capped`: what the
    * operator will actually pay), the docs and bucket count the cap
    * excludes (`dropped_docs`/`n_mega` — the recall price, the number
    * q_lsh_recall then measures), and `max_bsz` (the straggler bound:
    * the largest single task the pair join would schedule). Cost is
    * ONE keyed aggregation over the banded table — the quadratic
    * stage is never touched, which is the entire point: the census is
    * how the cap gets TUNED instead of guessed when the corpus is too
    * big to re-run. All counts exact BIGINT (n·(n−1) div 2).
    */
  def lshCostCensus(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = documents(spark, sfDir)
      .repartition(col("doc_id"))
      .withColumn("norm", TextOps.normText(col("text")))
    val d = shingleSets(docs).persist() // sig projection is the cost
    val sigs = d.select(col("doc_id"),
      graft.functions.MinHashSignature(col("sh")).as("sig"))
    val bsz = bandsOfSigs(sigs).groupBy("band", "bucket")
      .agg(count(lit(1)).as("n"))
    val pairsOf = expr("n * (n - 1) div 2")
    val out = bsz.groupBy("band").agg(
      count(lit(1)).as("n_buckets"),
      max("n").as("max_bsz"),
      sum(pairsOf).as("pairs_raw"),
      sum(when(col("n") <= maxBucketSize, pairsOf).otherwise(0L))
        .as("pairs_capped"),
      sum(when(col("n") > maxBucketSize, col("n")).otherwise(0L))
        .as("dropped_docs"),
      sum(when(col("n") > maxBucketSize, 1L).otherwise(0L)).as("n_mega"))
    Canon.materialized(
      Canon.canonicalize(out.select("band", "n_buckets", "max_bsz",
        "pairs_raw", "pairs_capped", "dropped_docs", "n_mega")),
      d)
  }

  val lshCostCensusOracle: String =
    s"""WITH $minhashLshCte,
       |cbsz AS (
       |  SELECT band, bucket, count(*) AS n
       |  FROM banded GROUP BY 1, 2)
       |SELECT CAST(band AS BIGINT) AS band,
       |       CAST(count(*) AS BIGINT) AS n_buckets,
       |       CAST(max(n) AS BIGINT) AS max_bsz,
       |       CAST(sum(n * (n - 1) // 2) AS BIGINT) AS pairs_raw,
       |       CAST(sum(CASE WHEN n <= $maxBucketSize
       |                     THEN n * (n - 1) // 2 ELSE 0 END) AS BIGINT)
       |         AS pairs_capped,
       |       CAST(sum(CASE WHEN n > $maxBucketSize THEN n ELSE 0 END)
       |            AS BIGINT) AS dropped_docs,
       |       CAST(sum(CASE WHEN n > $maxBucketSize THEN 1 ELSE 0 END)
       |            AS BIGINT) AS n_mega
       |FROM cbsz GROUP BY 1""".stripMargin

  /** The LSH candidate machinery shared by [[minhashLsh]] and
    * [[editDistanceNearDup]]: normalized docs, the persisted shingle
    * table, the persisted banded rows, and the deduplicated candidate
    * id pairs. Callers release `d`/`banded` via [[Canon.materialized]].
    */
  private def lshCandidates(spark: SparkSession, sfDir: String,
                            bandsUsed: Int = numBands,
                            bucketCap: Int = maxBucketSize)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    require(bandsUsed >= 1 && bandsUsed <= numBands,
      s"bandsUsed must be in [1, $numBands], got $bandsUsed")
    require(bucketCap >= 1, s"bucketCap must be >= 1, got $bucketCap")
    val docs = documents(spark, sfDir)
      .repartition(col("doc_id"))
      .withColumn("norm", TextOps.normText(col("text")))
    val d = shingleSets(docs)
      .persist() // signature projection + both candidate-attach joins
    // signatures are a MAP-SIDE projection (native fused expression) —
    // no exploded window table, no aggregate exchange
    val sigs = d.select(col("doc_id"),
      graft.functions.MinHashSignature(col("sh")).as("sig"))
    // one row per (doc, band): bucket key hashes the band's signature slice
    val banded = sigs.select(
      col("doc_id"),
      explode(sequence(lit(0), lit(numBands - 1))).as("band"),
      col("sig"))
      .select(col("doc_id"), col("band"),
        bucketExpr(col("sig"), col("band")).as("bucket"))
      .persist() // fan-out: bucket-size filter + both self-join sides
      // (without these persists the 64-hash signature lambda — the
      // dominant cost — re-evaluates once per consuming subtree)
    // Mega-buckets are dropped before pairing: a bucket shared by hundreds
    // of documents signals a low-information signature slice (common on
    // low-entropy corpora) and its candidate pairs grow quadratically —
    // the classic LSH straggler. Standard practice at corpus scale; pairs
    // that are genuinely similar still collide in their other 15 bands.
    // the gate's sink axis: production passes numBands (no-op filter
    // elided); the recall drill passes 1 and pairs only via band 0
    val inPlay =
      if (bandsUsed == numBands) banded
      else banded.filter(col("band") < bandsUsed)
    val keptBuckets = inPlay.groupBy("band", "bucket")
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= bucketCap)
      .select("band", "bucket")
    val kept = inPlay.join(keptBuckets, Seq("band", "bucket"))
    val candidates = kept.as("x").join(kept.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct() // same pair may collide in many bands
    (docs, d, banded, candidates)
  }

  // ---- edit-distance-verified near-dup -------------------------------

  /** Keep a candidate pair when its normalized edit similarity
    * 1 − lev/max(len) reaches this — the standard fuzzy-match bar.
    */
  val editSimThreshold = 0.8

  /** Near-dup detection with LEVENSHTEIN as the verifier: the same
    * banded LSH candidate generation as [[minhashLsh]], but each
    * candidate is scored by normalized edit similarity over the
    * normalized text instead of shingle Jaccard. Edit distance is the
    * right verifier when ORDER matters — two documents with the same
    * shingle multiset but reshuffled paragraphs score 1.0 on Jaccard
    * and are caught here.
    *
    * Scale shape: identical to minhashLsh up to the candidate set
    * (banded (band, bucket, id) shuffle, mega-bucket cap, bare-id pair
    * dedup); the texts attach late by two hash joins and the verifier
    * is BOUNDED, never the full O(n·m) DP:
    *  - a length-ratio prefilter drops any pair whose length gap alone
    *    exceeds the edit budget (lev ≥ |len_a − len_b| always) for the
    *    price of two `length()` calls — no DP runs at all;
    *  - survivors run Spark's banded `levenshtein(l, r, threshold)`,
    *    O(threshold·n) with early exit, returning −1 past the bound.
    * The bound is floor((1−editSimThreshold)·maxlen)+1 — one above the
    * largest distance that can still pass, so the banded value is exact
    * for every pair the edit_sim filter could retain and the output is
    * bit-identical to the unbounded form (EditDistanceBoundSpec pins
    * this on threshold-crossing pairs). Cost is now linear in document
    * length for non-duplicates instead of quadratic.
    */
  def editDistanceNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    val (docs, d, banded, candidates) = lshCandidates(spark, sfDir)
    val norms = docs.select(col("doc_id"), col("norm"))
    val withTexts = candidates
      .join(norms.select(col("doc_id").as("id_a"), col("norm").as("norm_a")),
        Seq("id_a"))
      .join(norms.select(col("doc_id").as("id_b"), col("norm").as("norm_b")),
        Seq("id_b"))
    Canon.materialized(
      Canon.canonicalize(editVerify(withTexts)
        .select("id_a", "id_b", "lev", "edit_sim")),
      d, banded)
  }

  /** The bounded edit-similarity verifier over pair rows carrying
    * `norm_a`/`norm_b`: length-ratio prefilter → banded
    * `levenshtein(l, r, bound)` → exact `edit_sim` filter. Retains
    * exactly the rows the unbounded DP would (the +1 bound margin makes
    * the banded value exact for every retainable pair; pairs past the
    * bound can only have edit_sim < the threshold). Shared with
    * EditDistanceBoundSpec, which pins the equivalence on
    * threshold-crossing fixtures.
    */
  private[ext] def editVerify(pairs: DataFrame): DataFrame =
    pairs
      .withColumn("mx",
        greatest(length(col("norm_a")), length(col("norm_b"))))
      .withColumn("lev_bound",
        (floor(lit(1.0 - editSimThreshold) * col("mx")) + 1).cast("int"))
      .filter(abs(length(col("norm_a")) - length(col("norm_b")))
        <= col("lev_bound"))
      .withColumn("lev",
        expr("levenshtein(norm_a, norm_b, lev_bound)").cast("long"))
      .filter(col("lev") >= 0) // −1 = banded DP exceeded the bound
      .withColumn("edit_sim",
        lit(1.0) - col("lev").cast("double") / col("mx").cast("double"))
      .filter(col("edit_sim") >= editSimThreshold)

  val editDistanceOracle: String =
    s"""WITH $minhashLshCte,
       |ed AS (
       |  SELECT c.id_a, c.id_b,
       |         levenshtein(na.norm, nb.norm) AS lev,
       |         greatest(length(na.norm), length(nb.norm)) AS mx
       |  FROM cand c JOIN nd na ON c.id_a = na.doc_id
       |              JOIN nd nb ON c.id_b = nb.doc_id)
       |SELECT id_a, id_b, CAST(lev AS BIGINT) AS lev,
       |       1.0 - CAST(lev AS DOUBLE) / CAST(mx AS DOUBLE) AS edit_sim
       |FROM ed
       |WHERE 1.0 - CAST(lev AS DOUBLE) / CAST(mx AS DOUBLE)
       |      >= $editSimThreshold""".stripMargin

  /** Full DuckDB oracle for `minhashLsh`: the ENTIRE pipeline — shingle
    * hashing, 64 affine minima, banding, the mega-bucket cap, candidate
    * self-join, and exact-Jaccard verification — re-expressed in SQL,
    * generated from the same constants as the Spark plan. The operator is
    * approximate only as a recall statement; as a function of the input it
    * is deterministic, so the driver can hash-compare it like any exact
    * query.
    */
  /** Shared CTE chain ending in `lpairs` (id_a, id_b, jaccard) — used by
    * the LSH oracle and the LSH-fed clustering oracle.
    */
  // a DEF: vals declared earlier in this object interpolate this chain
  // into their oracle strings, and a val here would still be null when
  // they initialize (same init-order trap as TextOps.normSql).
  private[ext] def minhashLshCte: String = {
    val minAggs = (0 until numHashes)
      .map(i => s"min(${rowHashSql(i, "s")}) AS h$i").mkString(",\n    ")
    val bandedUnion = (0 until numBands)
      .map(b => s"SELECT doc_id, $b AS band, ${bucketSql(b)} AS bucket FROM sigs")
      .mkString("\n  UNION ALL ")
    s"""nd AS (
       |  SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm
       |  FROM documents),
       |d AS (SELECT doc_id, norm FROM nd WHERE length(norm) >= $shingleLen),
       |st AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, ${shingleHashSql("norm", "i")} AS s
       |  FROM d, UNNEST(range(1, length(norm) - ${shingleLen - 2})) AS t(i)),
       |sh AS MATERIALIZED (SELECT doc_id, list(s) AS sh FROM st GROUP BY doc_id),
       |sigs AS MATERIALIZED (
       |  SELECT doc_id, $minAggs
       |  FROM st GROUP BY doc_id),
       |banded AS MATERIALIZED (
       |  $bandedUnion),
       |kept AS MATERIALIZED (
       |  SELECT band, bucket FROM banded GROUP BY band, bucket
       |  HAVING count(*) <= $maxBucketSize),
       |kb AS MATERIALIZED (SELECT b.doc_id, b.band, b.bucket
       |       FROM banded b JOIN kept k
       |         ON b.band = k.band AND b.bucket = k.bucket),
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM kb x JOIN kb y
       |    ON x.band = y.band AND x.bucket = y.bucket
       |       AND x.doc_id < y.doc_id),
       |ws AS (
       |  SELECT c.id_a, c.id_b,
       |         CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) AS n_common,
       |         len(sa.sh) AS na, len(sb.sh) AS nb
       |  FROM cand c JOIN sh sa ON c.id_a = sa.doc_id
       |              JOIN sh sb ON c.id_b = sb.doc_id),
       |lpairs AS MATERIALIZED (
       |  SELECT id_a, id_b, n_common / (na + nb - n_common) AS jaccard
       |  FROM ws WHERE n_common / (na + nb - n_common) >= $jaccardThreshold)""".stripMargin
  }

  val minhashLshOracle: String =
    s"""WITH $minhashLshCte
       |SELECT id_a, id_b, jaccard FROM lpairs""".stripMargin

  /** Train/val/test LEAKAGE report: every verified near-dup pair whose
    * members land in DIFFERENT splits of [[SampleOps.trainValTestSplit]]
    * — the eval-contamination check a training run makes before trusting
    * held-out numbers (a test doc with a train-side near-duplicate is
    * not held out, whatever the split says).
    *
    * Scale shape: the split label is a PURE HASH of doc_id
    * ([[SampleOps.splitLabel]]), so this is two case expressions and a
    * filter over the already-bounded LSH pair list — no join, no
    * shuffle, no touch of the corpus beyond the pair detection it
    * composes.
    */
  def splitLeakage(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = lshPairs(spark, sfDir)
    Canon.materialized(
      Canon.canonicalize(pairs
        .withColumn("split_a", SampleOps.splitLabel(col("id_a")))
        .withColumn("split_b", SampleOps.splitLabel(col("id_b")))
        .filter(col("split_a") =!= col("split_b"))
        .select("id_a", "id_b", "split_a", "split_b", "jaccard")),
      pairs)
  }

  /** The LSH chain with the split-label case expressions appended. */
  val splitLeakageOracle: String =
    s"""WITH $minhashLshCte
       |SELECT id_a, id_b,
       |       ${SampleOps.splitLabelSql("id_a")} AS split_a,
       |       ${SampleOps.splitLabelSql("id_b")} AS split_b,
       |       jaccard
       |FROM lpairs
       |WHERE ${SampleOps.splitLabelSql("id_a")} <>
       |      ${SampleOps.splitLabelSql("id_b")}""".stripMargin

  /** Permille boundary splitting `documents` into an existing CORPUS
    * (hash bucket < 800, the same deterministic family as
    * [[SampleOps]]) and an incoming BATCH — the fixture stand-in for
    * "today's crawl against the index".
    */
  val incrementalCorpusPermille = 800

  /** Permille boundary of the MERGE lifecycle query: docs in
    * [incrementalCorpusPermille, mergeProbePermille) are "today's
    * crawl" folded into the index; docs ≥ mergeProbePermille are
    * "tomorrow's crawl" probing the MERGED index. Declared HERE, above
    * every oracle val that interpolates it (object init order).
    */
  val mergeProbePermille = 900

  private[ext] def sideBucket(key: Column): Column = {
    import graft.functions.{MinHashSignature => MH}
    ((key % MH.P) * MH.aCoef(0) + MH.bCoef(0)) % MH.P % 1000
  }

  private[ext] def sideBucketSql(key: String): String = {
    import graft.functions.{MinHashSignature => MH}
    s"(((($key % ${MH.P}) * ${MH.aCoef(0)} + ${MH.bCoef(0)}) % ${MH.P}) % 1000)"
  }

  /** INCREMENTAL near-dup: each batch document is checked against the
    * corpus only — the ingest-time flow at scale (a new crawl lands
    * against an existing index; re-pairing the whole corpus with itself
    * every day is the thing this avoids). Same banding machinery as
    * [[minhashLsh]], but the candidate join is ASYMMETRIC: batch band
    * rows probe corpus band rows, so candidate work is
    * O(|batch| · bucket-hit-rate), independent of corpus-corpus pair
    * counts. At 100 TB the corpus side's (band, bucket, id) table is the
    * persisted LSH INDEX; here it is derived in-query from the fixture.
    * The mega-bucket cap is censused over the CORPUS SIDE ALONE (unlike
    * the self-join variant's full-population census): the kept-bucket
    * set is then a function of static index state, so a batch doc's
    * verdict does not depend on how the feed was micro-batched — the
    * property the streaming funnel's per-batch ≡ whole-feed invariant
    * rests on. The oracle censuses identically.
    */
  def minhashLshIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = documents(spark, sfDir)
      .repartition(col("doc_id"))
      .withColumn("norm", TextOps.normText(col("text")))
    val d = shingleSets(docs)
      .withColumn("is_corpus",
        sideBucket(col("doc_id")) < incrementalCorpusPermille)
      .persist() // signatures + both candidate attaches
    val banded = d.select(col("doc_id"), col("is_corpus"),
        explode(sequence(lit(0), lit(numBands - 1))).as("band"),
        graft.functions.MinHashSignature(col("sh")).as("sig"))
      .select(col("doc_id"), col("is_corpus"), col("band"),
        bucketExpr(col("sig"), col("band")).as("bucket"))
      .persist() // size filter + both asymmetric join sides
    val keptBuckets = banded.filter(col("is_corpus"))
      .groupBy("band", "bucket")
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBucketSize)
      .select("band", "bucket")
    val kept = banded.join(keptBuckets, Seq("band", "bucket"))
    val candidates = kept.filter(!col("is_corpus")).as("b")
      .join(kept.filter(col("is_corpus")).as("c"),
        col("b.band") === col("c.band") &&
          col("b.bucket") === col("c.bucket"))
      .select(col("b.doc_id").as("batch_id"),
        col("c.doc_id").as("corpus_id"))
      .distinct()
    val withSets = candidates
      .join(d.select(col("doc_id").as("batch_id"), col("sh").as("sh_a")),
        Seq("batch_id"))
      .join(d.select(col("doc_id").as("corpus_id"), col("sh").as("sh_b")),
        Seq("corpus_id"))
    Canon.materialized(
      Canon.canonicalize(withSets
        .filter(sizeRatioAtLeast(size(col("sh_a")), size(col("sh_b")),
          jaccardThreshold))
        .withColumn("jaccard", pairJaccard(col("sh_a"), col("sh_b")))
        .filter(col("jaccard") >= jaccardThreshold)
        .select("batch_id", "corpus_id", "jaccard")),
      d, banded)
  }

  /** Oracle for the incremental variant: the shared LSH CTE chain with
    * the side split and the asymmetric candidate join, generated from
    * the same constants.
    */
  val minhashLshIncrementalOracle: String =
    incrementalOracleFor(incrementalCorpusPermille)

  /** The merged-index lifecycle query shares the incremental oracle
    * shape — only the corpus boundary moves (merge proved table-exact
    * by LshIndexMergeSpec, so corpus = everything below the probe
    * slice).
    */
  val minhashLshMergedOracle: String =
    incrementalOracleFor(mergeProbePermille)

  // a DEF for the same init-order reason as minhashLshCte
  /** @param probePermille batch side starts here; docs in
    *   [corpusPermille, probePermille) are on NEITHER side — the slice
    *   the forget lifecycle removes. Equal bounds = the classic
    *   two-way split.
    */
  private def incrementalOracleFor(corpusPermille: Int,
                                   probePermille: Int = -1): String =
    s"""WITH ${incrementalOracleBody(corpusPermille, probePermille)}
       |SELECT batch_id, corpus_id, jaccard FROM ipairs""".stripMargin

  /** The incremental probe chain as a composable CTE BODY ending in
    * `ipairs` (batch_id, corpus_id, jaccard) — the funnel oracle
    * composes it with its own stage CTEs. `batchCond` further restricts
    * which batch-side docs participate at all (the funnel's
    * quality-passed subset; the bucket cap is censused over the corpus
    * side only, so `batchCond` cannot change which buckets are kept —
    * exactly as the Spark probe behaves).
    */
  private[graft] def incrementalOracleBody(corpusPermille: Int,
                                           probePermille: Int = -1,
                                           batchCond: String = "TRUE")
      : String = {
    val pp = if (probePermille < 0) corpusPermille else probePermille
    val minAggs = (0 until numHashes)
      .map(i => s"min(${rowHashSql(i, "s")}) AS h$i").mkString(",\n    ")
    val bandedUnion = (0 until numBands)
      .map(b => s"SELECT doc_id, is_corpus, $b AS band, ${bucketSql(b)} AS bucket FROM sigs")
      .mkString("\n  UNION ALL ")
    s"""nd AS (
       |  SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm
       |  FROM documents),
       |d AS (SELECT doc_id, norm,
       |        ${sideBucketSql("doc_id")} < $corpusPermille
       |          AS is_corpus
       |      FROM nd WHERE length(norm) >= $shingleLen
       |        AND (${sideBucketSql("doc_id")} < $corpusPermille
       |             OR (${sideBucketSql("doc_id")} >= $pp
       |                 AND ($batchCond)))),
       |st AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, ${shingleHashSql("norm", "i")} AS s
       |  FROM d, UNNEST(range(1, length(norm) - ${shingleLen - 2})) AS t(i)),
       |sh AS MATERIALIZED (SELECT doc_id, list(s) AS sh FROM st GROUP BY doc_id),
       |sigs AS MATERIALIZED (
       |  SELECT st.doc_id, any_value(d.is_corpus) AS is_corpus, $minAggs
       |  FROM st JOIN d ON st.doc_id = d.doc_id GROUP BY st.doc_id),
       |banded AS MATERIALIZED (
       |  $bandedUnion),
       |kept AS MATERIALIZED (
       |  SELECT band, bucket FROM banded WHERE is_corpus
       |  GROUP BY band, bucket
       |  HAVING count(*) <= $maxBucketSize),
       |kb AS (SELECT b.doc_id, b.is_corpus, b.band, b.bucket
       |       FROM banded b JOIN kept k
       |         ON b.band = k.band AND b.bucket = k.bucket),
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT b.doc_id AS batch_id, c.doc_id AS corpus_id
       |  FROM kb b JOIN kb c
       |    ON b.band = c.band AND b.bucket = c.bucket
       |       AND NOT b.is_corpus AND c.is_corpus),
       |ws AS (
       |  SELECT cd.batch_id, cd.corpus_id,
       |         CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) AS n_common,
       |         len(sa.sh) AS na, len(sb.sh) AS nb
       |  FROM cand cd JOIN sh sa ON cd.batch_id = sa.doc_id
       |               JOIN sh sb ON cd.corpus_id = sb.doc_id),
       |ipairs AS MATERIALIZED (
       |  SELECT batch_id, corpus_id,
       |         n_common / (na + nb - n_common) AS jaccard
       |  FROM ws
       |  WHERE n_common / (na + nb - n_common) >= $jaccardThreshold)"""
      .stripMargin
  }

  /** Root for persisted LSH indexes (under [[graft.io.Artifacts.root]]
    * — `target/` in the harness, env/sysprop-overridable for
    * deployment). The tag folds in a file-listing fingerprint of the
    * source so regenerated data can never be served a stale index
    * (the same staleness contract as the IVF centroid cache).
    */
  private def lshIndexRoot = s"${graft.io.Artifacts.root}/lsh_index"

  private[graft] def lshIndexDir(sfDir: String): String = {
    val fp = graft.io.Fingerprint.ofPath(s"$sfDir/documents.parquet")
    val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_").replaceAll("^_+", "")
    // every parameter the stored bands/shingles depend on goes into the
    // path: a constant bump must MISS the old index, never probe it
    // (v2 = the layout that added the sigs table for mergeability)
    val params =
      s"h$numHashes-b$numBands-s$shingleLen-p$incrementalCorpusPermille-v2"
    s"$lshIndexRoot/${tag}_${params}_$fp"
  }

  /** (doc_id, band, bucket) rows derived from a signature table — the
    * probe side of the index, shared by build and merge so bucket
    * arithmetic can never diverge between them.
    */
  private[ext] def bandsOfSigs(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"),
        explode(sequence(lit(0), lit(numBands - 1))).as("band"), col("sig"))
      .select(col("doc_id"), col("band"),
        bucketExpr(col("sig"), col("band")).as("bucket"))

  private def indexDone(dir: String): Boolean =
    Seq("bands", "shingles", "sigs").forall(t =>
      new java.io.File(s"$dir/$t/_SUCCESS").exists())

  /** Read a stored index layout (bands, shingles, sigs) from `dir`. */
  def readLshIndex(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) =
    (spark.read.parquet(s"$dir/bands"),
      spark.read.parquet(s"$dir/shingles"),
      spark.read.parquet(s"$dir/sigs"))

  /** Builds (first call) or reuses (SUCCESS-gated) the PERSISTED corpus
    * LSH index: `bands` (doc_id, band, bucket) and `shingles`
    * (doc_id, sh — the exact-verify payload). This is the offline half
    * of the ingest-time dedup lifecycle: the corpus's shingle → signature
    * → band work is paid once at index build, and every subsequent batch
    * probe reads these tables instead of re-deriving the corpus — the
    * same build-once/probe-many contract as the IVF centroid index.
    */
  def lshIndex(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) =
    synchronized {
      val dir = lshIndexDir(sfDir)
      if (!indexDone(dir)) {
        val corpus = documents(spark, sfDir)
          .repartition(col("doc_id"))
          .withColumn("norm", TextOps.normText(col("text")))
          .filter(sideBucket(col("doc_id")) < incrementalCorpusPermille)
        val sets = shingleSets(corpus).persist()
        sets.select(col("doc_id"), col("sh"))
          .write.mode("overwrite").parquet(s"$dir/shingles")
        // sigs persist beside the bands: MinHash signatures are the
        // MERGE algebra of the index (signature of a union = slot-wise
        // min), so keeping them lets a later batch fold in without the
        // corpus ever being re-shingled (lshIndexMerge)
        sets.select(col("doc_id"),
            graft.functions.MinHashSignature(col("sh")).as("sig"))
          .write.mode("overwrite").parquet(s"$dir/sigs")
        sets.unpersist(false)
        bandsOfSigs(spark.read.parquet(s"$dir/sigs"))
          .write.mode("overwrite").parquet(s"$dir/bands")
      }
      (spark.read.parquet(s"$dir/bands"),
        spark.read.parquet(s"$dir/shingles"))
    }

  /** MERGE a batch into the persisted corpus index — the daily-crawl
    * maintenance path the rebuild-per-day cost model can't afford. The
    * corpus side is never re-shingled (its text is never even read):
    *
    *  - signatures merge by [[graft.functions.SignatureMin]] — MinHash's
    *    defining algebra, sig(A ∪ B) = slot-wise min(sig(A), sig(B)) —
    *    so a RE-CRAWLED doc_id appearing in both corpus and batch gets
    *    exactly the signature a from-scratch build of its combined
    *    shingle set would produce (spec-pinned);
    *  - shingle verify payloads merge by set union, re-sorted to keep
    *    the SortedIntersectCount contract;
    *  - the band table is re-derived from the merged signatures by the
    *    same bucket arithmetic as the build (shared bandsOfSigs), which
    *    leaves corpus-only rows bit-identical.
    *
    * The result is written to a NEW stamped dir (`…_m_<batchTag>`,
    * SUCCESS-gated like the build) so a crash mid-merge can never
    * corrupt the base index, and returns that dir for [[readLshIndex]] /
    * [[probeLshIndexTables]]. LshIndexMergeSpec proves merged ≡ rebuilt
    * tables and probe-result equality, plus mtime evidence the base
    * index was only read.
    */
  def lshIndexMerge(spark: SparkSession, sfDir: String,
                    batchDocs: DataFrame, batchTag: String): String =
    synchronized {
      lshIndex(spark, sfDir) // ensure the base index exists
      lshIndexMergeInto(spark, lshIndexDir(sfDir), batchDocs, batchTag)
    }

  /** The merge core against an EXPLICIT base-index dir — what
    * [[lshIndexMerge]] runs against the fixture's base, exposed so
    * lifecycle compositions (notably forget-then-remerge, the retract-
    * one-version recipe [[lshIndexForget]] documents) can merge onto a
    * derived `…_f_` / `…_m_` index too. Same stamped-output and
    * SUCCESS-gating contract.
    */
  def lshIndexMergeInto(spark: SparkSession, baseDir: String,
                        batchDocs: DataFrame, batchTag: String): String =
    synchronized {
      require(batchTag.matches("[A-Za-z0-9_-]+"),
        s"batchTag must be path-safe, got '$batchTag'")
      val dir = s"${baseDir}_m_$batchTag"
      lshIndexMergeCore(spark, baseDir, dir, batchDocs)
      dir
    }

  /** The merge body against an EXPLICIT output dir — shared by the
    * stamped-name merge above and the admission fold's flat
    * per-generation dirs ([[lshAdmit]]), SUCCESS-gated either way so a
    * replay is skipped, never re-applied.
    */
  private def lshIndexMergeCore(spark: SparkSession, baseDir: String,
                                outDir: String,
                                batchDocs: DataFrame): Unit =
    synchronized {
      if (!indexDone(outDir)) {
        val (_, baseSh, baseSigs) = readLshIndex(spark, baseDir)
        val withNorm = batchDocs.select(col("doc_id"), col("text"))
          .repartition(col("doc_id"))
          .withColumn("norm", TextOps.normText(col("text")))
        val bSets = shingleSets(withNorm).persist()
        val bSigs = bSets.select(col("doc_id"),
          graft.functions.MinHashSignature(col("sh")).as("sig"))
        baseSigs.union(bSigs).groupBy("doc_id")
          .agg(graft.functions.SignatureMin.column(col("sig")).as("sig"))
          .write.mode("overwrite").parquet(s"$outDir/sigs")
        baseSh.union(bSets.select(col("doc_id"), col("sh")))
          .groupBy("doc_id")
          .agg(array_sort(array_distinct(flatten(collect_list(col("sh")))))
            .as("sh"))
          .write.mode("overwrite").parquet(s"$outDir/shingles")
        bSets.unpersist(false)
        bandsOfSigs(spark.read.parquet(s"$outDir/sigs"))
          .write.mode("overwrite").parquet(s"$outDir/bands")
      }
    }

  /** FORGET a set of doc_ids from a persisted index — delete
    * propagation into the derived artifact (the right-to-be-forgotten
    * path; the LM-index twin is [[graft.ext.LmOps.lmIndexForget]]).
    * Every index table is keyed per document with NO cross-document
    * state (signatures, shingle payloads, band rows are all functions
    * of one doc), so an anti-join filter IS a from-scratch rebuild
    * without those docs — which is why [[minhashLshForgotten]] can
    * share the incremental oracle family. Writes a NEW stamped
    * `…_f_<tag>` dir, SUCCESS-gated; the base index is only read.
    *
    * SEMANTICS / PRECONDITION: forget removes a DOCUMENT — every
    * version of it. If a doc_id was re-crawled and [[lshIndexMerge]]d,
    * its index row is the FOLD of both versions (slot-min signature,
    * unioned shingles), and the anti-join deletes that whole row; it
    * cannot un-merge just the batch version and restore the base-only
    * state (the fold is lossy in that direction — slot-min has no
    * inverse, unlike the LM index's subtractive counts). To retract
    * one VERSION of a still-retained document, rebuild its row from
    * the surviving text instead: `lshIndexForget(dir, ids)` then
    * [[lshIndexMerge]] the surviving version back in — the
    * forget-then-remerge composition is exact because merge onto an
    * absent doc_id is just an insert. LshIndexMergeSpec pins both the
    * whole-document semantics and the re-crawl retract round trip.
    */
  def lshIndexForget(spark: SparkSession, baseDir: String,
                     forgetIds: DataFrame, tag: String): String =
    synchronized {
      require(tag.matches("[A-Za-z0-9_-]+"),
        s"tag must be path-safe, got '$tag'")
      val dir = s"${baseDir}_f_$tag"
      if (!indexDone(dir)) {
        val ids = forgetIds.select("doc_id")
        Seq("sigs", "shingles", "bands").foreach { t =>
          spark.read.parquet(s"$baseDir/$t")
            .join(broadcast(ids), Seq("doc_id"), "left_anti")
            .write.mode("overwrite").parquet(s"$dir/$t")
        }
      }
      dir
    }

  /** The full index lifecycle ROUND TRIP as one query: build the base
    * index, MERGE the middle slice in, then FORGET that same slice —
    * probing with the top slice must behave exactly as if the middle
    * docs had never existed (corpus boundary back at 800‰, probes at
    * ≥900‰, the forgotten slice on NEITHER side), which is what the
    * three-way oracle states.
    */
  def minhashLshForgotten(spark: SparkSession, sfDir: String): DataFrame = {
    val mergeBatch = documents(spark, sfDir)
      .filter(sideBucket(col("doc_id")) >= incrementalCorpusPermille &&
        sideBucket(col("doc_id")) < mergeProbePermille)
      .select("doc_id", "text")
    val mergedDir =
      lshIndexMerge(spark, sfDir, mergeBatch, s"p$mergeProbePermille")
    val fDir = lshIndexForget(spark, mergedDir,
      mergeBatch.select("doc_id"), "mid")
    val (fBands, fSh, _) = readLshIndex(spark, fDir)
    val probeDocs = documents(spark, sfDir)
      .filter(sideBucket(col("doc_id")) >= mergeProbePermille)
      .select("doc_id", "text")
    probeLshIndexTables(spark, fBands, fSh, probeDocs)
  }

  /** Corpus back at < 800‰, probes ≥ 900‰, the forgotten middle on
    * neither side.
    */
  val minhashLshForgottenOracle: String =
    incrementalOracleFor(incrementalCorpusPermille, mergeProbePermille)

  /** SQL twin of [[incrementalBatchDocs]]'s membership, as a `feed`
    * CTE (unshingleable docs INCLUDED — the funnel oracle's n_in must
    * count every fed document, not just the LSH-eligible ones).
    */
  private[graft] def incrementalFeedCte: String =
    s"""feed AS (
       |  SELECT doc_id FROM documents
       |  WHERE ${sideBucketSql("doc_id")} >= $incrementalCorpusPermille)"""
      .stripMargin

  /** The batch-side slice of the fixture (the documents NOT in the
    * persisted corpus index) — what [[minhashLshIndexed]] probes with,
    * and what the streaming spec feeds through a MemoryStream to prove
    * stream ≡ batch.
    */
  def incrementalBatchDocs(spark: SparkSession, sfDir: String): DataFrame =
    documents(spark, sfDir)
      .filter(sideBucket(col("doc_id")) >= incrementalCorpusPermille)
      .select("doc_id", "text")

  /** [[minhashLshIncremental]] against the PERSISTED index: the batch
    * slice is banded in-query, candidates come from probing the stored
    * band table, and the corpus side of the verify reads the stored
    * shingle payloads. Semantics are identical to the in-query
    * incremental form — including the mega-bucket cap censused over the
    * corpus side alone — so it shares its oracle;
    * bit-equality with the recomputed path is additionally spec-pinned.
    */
  def minhashLshIndexed(spark: SparkSession, sfDir: String): DataFrame =
    probeLshIndex(spark, sfDir, incrementalBatchDocs(spark, sfDir))

  /** The full index-maintenance lifecycle as one query: build the base
    * corpus index (< 800‰), MERGE the middle slice in ([800, 900)‰,
    * [[lshIndexMerge]] — signatures fold by slot-wise min, the corpus is
    * never re-shingled), then probe with the top slice (≥ 900‰).
    * Because the merged tables are exactly what a from-scratch build
    * over the first 900‰ would produce (LshIndexMergeSpec), the oracle
    * is the incremental oracle with the corpus boundary at 900‰.
    */
  def minhashLshMerged(spark: SparkSession, sfDir: String): DataFrame = {
    val mergeBatch = documents(spark, sfDir)
      .filter(sideBucket(col("doc_id")) >= incrementalCorpusPermille &&
        sideBucket(col("doc_id")) < mergeProbePermille)
      .select("doc_id", "text")
    val dir = lshIndexMerge(spark, sfDir, mergeBatch, s"p$mergeProbePermille")
    val (mBands, mSh, _) = readLshIndex(spark, dir)
    val probeDocs = documents(spark, sfDir)
      .filter(sideBucket(col("doc_id")) >= mergeProbePermille)
      .select("doc_id", "text")
    probeLshIndexTables(spark, mBands, mSh, probeDocs)
  }

  /** Probe the persisted index with an ARBITRARY batch of documents
    * (doc_id, text) — the online half of ingest-time NEAR-dup, factored
    * out of [[minhashLshIndexed]] so a stream's foreachBatch can call it
    * per micro-batch ([[graft.streaming.EventStream.lshProbeToParquet]]).
    * Per-probe cost is batch banding + two joins against the stored
    * band/shingle tables; the corpus is never re-derived.
    */
  def probeLshIndex(spark: SparkSession, sfDir: String,
                    batchDocs: DataFrame): DataFrame = {
    val (idxBands, idxSh) = lshIndex(spark, sfDir)
    probeLshIndexTables(spark, idxBands, idxSh, batchDocs)
  }

  /** Probe an EXPLICIT pair of index tables — the core of
    * [[probeLshIndex]], factored so merged indexes
    * ([[lshIndexMerge]] → [[readLshIndex]]) and spec-built table sets
    * probe through the identical plan.
    */
  def probeLshIndexTables(spark: SparkSession, idxBands: DataFrame,
                          idxSh: DataFrame, batchDocs: DataFrame): DataFrame = {
    val withNorm = batchDocs.select(col("doc_id"), col("text"))
      .repartition(col("doc_id"))
      .withColumn("norm", TextOps.normText(col("text")))
    val batch = shingleSets(withNorm).persist()
    val batchBands = batch.select(col("doc_id"),
        explode(sequence(lit(0), lit(numBands - 1))).as("band"),
        graft.functions.MinHashSignature(col("sh")).as("sig"))
      .select(col("doc_id"), col("band"),
        bucketExpr(col("sig"), col("band")).as("bucket"))
      .persist() // probe side of the candidate join
    // The mega-bucket cap is censused over the CORPUS INDEX ALONE, so
    // which buckets are kept is a function of static index state only:
    // a probe doc's verdict cannot depend on what else happens to share
    // its micro-batch, which is what makes the streaming funnel's
    // per-batch ≡ whole-feed invariant hold unconditionally (and keeps
    // per-probe join work bounded by cap · bands regardless of batch
    // size). The in-query incremental form censuses the same way.
    val keptBuckets = idxBands.select("band", "bucket")
      .groupBy("band", "bucket")
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBucketSize)
      .select("band", "bucket")
    val candidates = batchBands.join(keptBuckets, Seq("band", "bucket"))
      .select(col("doc_id").as("batch_id"), col("band"), col("bucket"))
      .join(idxBands.join(keptBuckets, Seq("band", "bucket"))
          .select(col("doc_id").as("corpus_id"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .select("batch_id", "corpus_id")
      .distinct()
    val withSets = candidates
      .join(batch.select(col("doc_id").as("batch_id"), col("sh").as("sh_a")),
        Seq("batch_id"))
      .join(idxSh.select(col("doc_id").as("corpus_id"), col("sh").as("sh_b")),
        Seq("corpus_id"))
    Canon.materialized(
      Canon.canonicalize(withSets
        .filter(sizeRatioAtLeast(size(col("sh_a")), size(col("sh_b")),
          jaccardThreshold))
        .withColumn("jaccard", pairJaccard(col("sh_a"), col("sh_b")))
        .filter(col("jaccard") >= jaccardThreshold)
        .select("batch_id", "corpus_id", "jaccard")),
      batch, batchBands)
  }

  // ---- streaming near-dup ADMISSION fold ------------------------------

  /** Verified LSH self-pairs over an ARBITRARY (doc_id, text) frame —
    * the WITHIN-batch half of [[lshAdmit]]: the [[minhashLsh]] chain
    * (shingle → signature → band → bucket-cap → exact verify) with the
    * frame itself as the census corpus. A micro-batch is small, so
    * every stage here is batch-sized.
    */
  private[ext] def selfPairsOf(batchDocs: DataFrame): DataFrame = {
    val withNorm = batchDocs.select(col("doc_id"), col("text"))
      .repartition(col("doc_id"))
      .withColumn("norm", TextOps.normText(col("text")))
    val d = shingleSets(withNorm).persist()
    val banded = d.select(col("doc_id"),
        explode(sequence(lit(0), lit(numBands - 1))).as("band"),
        graft.functions.MinHashSignature(col("sh")).as("sig"))
      .select(col("doc_id"), col("band"),
        bucketExpr(col("sig"), col("band")).as("bucket"))
      .persist()
    val keptBuckets = banded.groupBy("band", "bucket")
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBucketSize)
      .select("band", "bucket")
    val kept = banded.join(keptBuckets, Seq("band", "bucket"))
    val candidates = kept.as("x").join(kept.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    val withSets = candidates
      .join(d.select(col("doc_id").as("id_a"), col("sh").as("sh_a")),
        Seq("id_a"))
      .join(d.select(col("doc_id").as("id_b"), col("sh").as("sh_b")),
        Seq("id_b"))
    Canon.materialized(
      Canon.canonicalize(withSets
        .filter(sizeRatioAtLeast(size(col("sh_a")), size(col("sh_b")),
          jaccardThreshold))
        .withColumn("jaccard", pairJaccard(col("sh_a"), col("sh_b")))
        .filter(col("jaccard") >= jaccardThreshold)
        .select("id_a", "id_b", "jaccard")),
      d, banded)
  }

  /** Flat per-generation dir of an admission feed (the
    * [[graft.ext.LedgerOps]] feedGenDir discipline: a pure function of
    * (feedTag, batchId), constant path length over an unbounded feed).
    */
  private[ext] def lshFeedGenDir(baseDir: String, feedTag: String)
                                (batchId: Long): String =
    s"${baseDir}__feed_$feedTag/g$batchId"

  /** Retire old LSH admission generations ([[graft.io.Generations]]
    * retention contract; completeness = the index's own three-table
    * SUCCESS gate).
    */
  def lshFeedGc(sfDir: String, feedTag: String, keepLast: Int): Seq[Long] =
    graft.io.Generations.gc(lshIndexDir(sfDir), feedTag, keepLast,
      indexDone)

  /** Ingest-time NEAR-dup ADMISSION step — the LSH analogue of
    * [[graft.ext.LedgerOps.shaLedgerAdmit]], completing the admission
    * pair (exact + near) the way the batch ledger completes it beside
    * the batch index: probe micro-batch `batchId` against the index
    * chain left by batches 0..batchId−1, decide admission, and MERGE
    * the ADMITTED documents in so the next micro-batch sees them.
    *
    * Admission policy (deterministic, order-independent within a
    * batch): a document is REJECTED `reason='corpus'` when it has a
    * verified near-dup in the prior index chain, REJECTED
    * `reason='batch'` when it is a non-minimum member of a
    * within-batch near-dup cluster ([[clustersFromPairs]] over
    * [[selfPairsOf]] — cluster-min canonicalization, NOT sequential
    * greedy: the verdict is a function of the batch set, not of row
    * order), and ADMITTED otherwise. A family whose cluster minimum is
    * itself corpus-rejected admits nobody — its content is already
    * represented. `dup_of` points at the corpus keeper (min corpus id
    * over its verified pairs), else the cluster minimum, else −1.
    *
    * Replay-safe exactly as the SHA fold: batch ids are checkpointed,
    * each generation is a flat SUCCESS-gated dir keyed by (feedTag,
    * batchId), probes read immutable prior dirs, and only ADMITTED
    * docs merge forward — so a crash between probe, merge and sink
    * replays to byte-identical verdicts. The bucket-cap census stays
    * on the index side ([[probeLshIndexTables]]), so per-batch ≡
    * whole-feed censusing holds unconditionally.
    */
  def lshAdmit(spark: SparkSession, sfDir: String, feedTag: String,
               batch: DataFrame, batchId: Long): DataFrame = {
    require(feedTag.matches("[A-Za-z0-9_-]+"),
      s"feedTag must be path-safe, got '$feedTag'")
    lshIndex(spark, sfDir) // ensure the base index exists
    val base = lshIndexDir(sfDir)
    val gen = lshFeedGenDir(base, feedTag) _
    val prev = if (batchId == 0L) base else gen(batchId - 1)
    require(indexDone(prev),
      s"index chain broken before batch $batchId: $prev incomplete")
    val b = batch.select(col("doc_id"), col("text")).persist()
    b.count()
    val (pBands, pSh, _) = readLshIndex(spark, prev)
    val idxPairs = probeLshIndexTables(spark, pBands, pSh, b)
    val idxHit = idxPairs.groupBy("batch_id")
      .agg(min("corpus_id").as("corpus_keep"))
      .withColumnRenamed("batch_id", "doc_id")
    val clusters = clustersFromPairs(spark, selfPairsOf(b))
      .select(col("doc_id"), col("cluster_id"))
    val verdicts = b.select("doc_id")
      .join(idxHit, Seq("doc_id"), "left")
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("batch_rep", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("admitted",
        col("corpus_keep").isNull && col("doc_id") === col("batch_rep"))
      .withColumn("reason",
        when(col("corpus_keep").isNotNull, lit("corpus"))
          .when(col("doc_id") =!= col("batch_rep"), lit("batch"))
          .otherwise(lit("admitted")))
      .withColumn("dup_of",
        coalesce(col("corpus_keep"),
          when(col("doc_id") =!= col("batch_rep"), col("batch_rep")),
          lit(-1L)))
      .select("doc_id", "admitted", "reason", "dup_of")
    val out = Canon.materialized(Canon.canonicalize(verdicts), idxPairs)
    val admittedDocs = b.join(
      out.filter(col("admitted")).select("doc_id"), Seq("doc_id"))
    lshIndexMergeCore(spark, prev, gen(batchId), admittedDocs)
    b.unpersist(false)
    out
  }

  // ---- LSH recall telemetry -------------------------------------------

  /** Sample width per lang stratum for [[lshRecall]]. */
  val lshRecallPerLang = 40

  /** LSH QUALITY TELEMETRY: end-to-end recall of [[minhashLsh]] against
    * exact pairwise Jaccard over a BOUNDED deterministic sample — the
    * number that tells an operator whether the banding parameters
    * (numBands × rows-per-band) still clear the similarity threshold on
    * today's corpus. Ground truth on the full corpus is all-pairs
    * (impossible); the standard practice is a fixed-size sample, drawn
    * here by the sampleKPerStratum machinery (per-lang hash-order heads
    * through the TopKPerKey heap — bounded state, no sort, same draw at
    * any corpus size). Exact side = all pairs WITHIN the sample
    * (≤ C(strata·k, 2), constant); LSH side = the operator's own pairs
    * restricted to the sample by two semi joins. One output row:
    * n_exact / n_lsh / n_common / recall (1.0 when the sample holds no
    * qualifying pair — nothing was there to find).
    */
  def lshRecall(spark: SparkSession, sfDir: String): DataFrame =
    lshRecallFrom(spark, sfDir, lshPairs(spark, sfDir))

  /** [[lshRecall]] against a CALLER-SUPPLIED LSH pair list — the seam
    * the gate's failure drill uses to measure a deliberately
    * mis-parameterized banding ([[minhashLshBanded]] with 1 band).
    * `exactJaccard` sets the exact side's qualifying bar: the telemetry
    * query keeps the operator threshold; the GATE raises it to the
    * banding's guarantee zone (see [[lshGateJaccard]]).
    */
  private[ext] def lshRecallFrom(spark: SparkSession, sfDir: String,
                                 pairs: DataFrame,
                                 exactJaccard: Double = jaccardThreshold)
      : DataFrame = {
    val keyed = documents(spark, sfDir)
      .repartition(col("doc_id"))
      .withColumn("norm", TextOps.normText(col("text")))
      .select(col("doc_id"), col("lang"), col("norm"),
        (((col("doc_id") % SampleOps.P) * SampleOps.A + SampleOps.B)
          % SampleOps.P).as("h"))
    val samp = graft.plans.TopK.perKey(keyed, Seq("lang"),
        Seq("h" -> graft.plans.TopK.Asc, "doc_id" -> graft.plans.TopK.Asc),
        k = lshRecallPerLang)
      .select(col("doc_id"), col("norm")).persist()
    val sSets = shingleSets(samp).persist()
    val exact = sSets.as("x").join(sSets.as("y"),
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        pairJaccard(col("x.sh"), col("y.sh")).as("jaccard"))
      .filter(col("jaccard") >= exactJaccard)
      .select("id_a", "id_b").persist()
    val ids = samp.select("doc_id")
    val lshPairs = pairs
      .join(ids.withColumnRenamed("doc_id", "id_a"), Seq("id_a"),
        "left_semi")
      .join(ids.withColumnRenamed("doc_id", "id_b"), Seq("id_b"),
        "left_semi")
      .select("id_a", "id_b").persist()
    val ne = exact.agg(count(lit(1)).as("n_exact"))
    val nl = lshPairs.agg(count(lit(1)).as("n_lsh"))
    val nc = exact.join(lshPairs, Seq("id_a", "id_b"))
      .agg(count(lit(1)).as("n_common"))
    val out = ne.crossJoin(nl).crossJoin(nc).select(
      col("n_exact"), col("n_lsh"), col("n_common"),
      when(col("n_exact") > 0,
        col("n_common").cast("double") / col("n_exact").cast("double"))
        .otherwise(lit(1.0)).as("recall"))
    Canon.materialized(Canon.canonicalize(out), samp, sSets, exact,
      lshPairs)
  }

  /** Exact-side qualifying bar for the recall GATE (not the telemetry
    * query, which stays at the operator threshold). The gate must be
    * statistically meaningful on a 40-per-lang sample: at b=16/r=4 the
    * banding's S-curve midpoint is (1/16)^(1/4) ≈ 0.45, so a pair at
    * the verify threshold 0.3 is caught only ~12% of the time BY
    * DESIGN — raw at-threshold recall is a coin flip on a tiny sample
    * (measured: 0/1 on the sf0.1 fixture with perfectly healthy
    * parameters). At j ≥ 0.6 per-pair catch probability is
    * 1−(1−0.6⁴)¹⁶ ≈ 0.89 — the zone the banding GUARANTEES — so a
    * sub-floor measurement there is signal, not noise.
    */
  val lshGateJaccard = 0.6

  /** Minimum acceptable guarantee-zone recall for the corpus chain to
    * proceed. Healthy banding measures ≈0.9+ in expectation at
    * [[lshGateJaccard]]; a 1-band mis-parameterization measures
    * 1−(1−0.6⁴)¹ ≈ 0.13 in expectation — an order of magnitude below.
    */
  val lshRecallFloor = 0.5

  /** ACT on the recall telemetry: the corpus chain's quality gate.
    * Measures recall of the banded LSH against exact Jaccard over the
    * deterministic sample, with the exact side restricted to the
    * banding's guarantee zone (see [[lshGateJaccard]]), and THROWS when
    * recall on today's corpus falls below `floor` — aborting the chain
    * before any dedup decision is made with a banding that no longer
    * catches what it promises. `bandsUsed` / `bucketCap` are the
    * parameter axes the failure-drill spec sinks: 1 band drops a
    * j=0.6 pair's expected catch to ≈0.13, and a bucketCap of 1 drops
    * EVERY bucket holding a dup pair (a pair needs bucket size ≥ 2) —
    * recall 0 by construction, the loud failure the drill asserts.
    * The collect is one row — the telemetry aggregate itself.
    */
  def lshRecallGate(spark: SparkSession, sfDir: String,
                    floor: Double = lshRecallFloor,
                    bandsUsed: Int = numBands,
                    bucketCap: Int = maxBucketSize): Double = {
    val row = lshRecallFrom(spark, sfDir,
      minhashLshBanded(spark, sfDir, bandsUsed, bucketCap),
      exactJaccard = lshGateJaccard).collect().head
    val recall = row.getAs[Double]("recall")
    if (recall < floor)
      throw new IllegalStateException(
        f"[lsh-recall-gate] guarantee-zone recall=$recall%.3f below " +
          f"floor=$floor%.3f " +
          s"(n_exact=${row.getAs[Long]("n_exact")}, " +
          s"n_lsh=${row.getAs[Long]("n_lsh")}, " +
          s"bands=$bandsUsed/$numBands, exact side jaccard>=" +
          s"$lshGateJaccard) — the banding no longer catches the pairs " +
          "it is parameterized to guarantee; retune numBands/rowsPerBand " +
          "before any dedup apply runs")
    recall
  }

  val lshRecallOracle: String = {
    val hashSql =
      s"(((doc_id % ${SampleOps.P}) * ${SampleOps.A} + ${SampleOps.B})" +
        s" % ${SampleOps.P})"
    s"""WITH $minhashLshCte,
       |samp AS MATERIALIZED (
       |  SELECT doc_id FROM (
       |    SELECT doc_id, row_number() OVER (PARTITION BY lang
       |      ORDER BY $hashSql ASC, doc_id ASC) AS rn
       |    FROM documents) WHERE rn <= $lshRecallPerLang),
       |ex AS MATERIALIZED (
       |  SELECT id_a, id_b FROM (
       |    SELECT x.doc_id AS id_a, y.doc_id AS id_b,
       |           CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) AS nco,
       |           len(x.sh) AS na, len(y.sh) AS nb
       |    FROM sh x JOIN samp sx ON x.doc_id = sx.doc_id
       |         JOIN sh y ON x.doc_id < y.doc_id
       |         JOIN samp sy ON y.doc_id = sy.doc_id)
       |  WHERE nco / (na + nb - nco) >= $jaccardThreshold),
       |lshs AS MATERIALIZED (
       |  SELECT p.id_a, p.id_b
       |  FROM lpairs p JOIN samp s1 ON p.id_a = s1.doc_id
       |       JOIN samp s2 ON p.id_b = s2.doc_id),
       |ne AS (SELECT count(*) AS n_exact FROM ex),
       |nl AS (SELECT count(*) AS n_lsh FROM lshs),
       |nco2 AS (
       |  SELECT count(*) AS n_common
       |  FROM ex JOIN lshs ON ex.id_a = lshs.id_a AND ex.id_b = lshs.id_b)
       |SELECT CAST(n_exact AS BIGINT) AS n_exact,
       |       CAST(n_lsh AS BIGINT) AS n_lsh,
       |       CAST(n_common AS BIGINT) AS n_common,
       |       CASE WHEN n_exact > 0
       |         THEN CAST(n_common AS DOUBLE) / CAST(n_exact AS DOUBLE)
       |         ELSE 1.0 END AS recall
       |FROM ne, nl, nco2""".stripMargin
  }

  // ---- SimHash --------------------------------------------------------

  /** The 62-bit token hash of the twin family as a composed-builtins
    * column (interpreted — reference/spec use only; the pipeline uses the
    * native [[graft.functions.SimHash64]] expression, asserted
    * bit-identical in DedupOpsSpec).
    */
  private[ext] def tokenHash62(t: Column): Column = {
    import graft.functions.{SimHash64 => SH}
    ((polyHash(t, 31) * SH.A31 + SH.B31) % P) * lit(1L << 31) +
      ((polyHash(t, 37) * SH.A37 + SH.B37) % P)
  }

  private def tokenHash62Sql(tok: String): String = {
    import graft.functions.{SimHash64 => SH}
    def fold(base: Int) =
      s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(list_filter(string_split($tok, ''), c -> c <> ''),
         |                     c -> CAST(ord(c) AS BIGINT))),
         |    (acc, c) -> (acc * $base + c) % $P)""".stripMargin
    s"""((${SH.A31} * ${fold(31)} + ${SH.B31}) % $P) * ${1L << 31}
       | + ((${SH.A37} * ${fold(37)} + ${SH.B37}) % $P)""".stripMargin
  }

  /** Per-bit (+1 / −1) vote totals over token hashes: one fold over the
    * token array with a 64-counter array accumulator (bit masks are Scala
    * literals — `shiftright` takes only literal shift amounts).
    */
  def simhashVotes(tokens: Column): Column =
    aggregate(
      tokens,
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = tokenHash62(t)
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

  /** Hamming-LSH banding of the 64-bit signature: `maxHamming + 1 = 9`
    * chunks (8 chunks of 7 bits + one of 8). Pigeonhole recall argument:
    * a pair at Hamming distance ≤ 8 differs in at most 8 bit positions,
    * which can touch at most 8 of the 9 chunks — so the pair agrees
    * EXACTLY on at least one chunk and is emitted by the
    * (chunk, value)-equality candidate join. With no bucket cap the
    * candidate set therefore has 100% recall and the operator is exact;
    * the mega-bucket cap below (the same low-information-slice guard as
    * minhashLsh's) is the one deliberate recall trade, mirrored in the
    * oracle.
    */
  val simhashChunks: Int = simhashMaxHamming + 1
  private[ext] val chunkBits = 7
  private[ext] def chunkWidth(i: Int): Int =
    if (i == simhashChunks - 1) 64 - chunkBits * (simhashChunks - 1)
    else chunkBits

  /** Chunk buckets shared by more docs than this are dropped from
    * candidate generation (quadratic-pair guard; e.g. the all-zero chunk
    * of near-empty docs). Same rationale and spirit as `maxBucketSize`.
    */
  val simhashMaxChunkBucket = 64

  /** The 9 chunk values of a signature (literal shifts/masks — fully
    * codegen'd; bit 63 is structurally zero so `>>` needs no sign care).
    */
  private[ext] def chunkValExprs(sig: Column): Seq[Column] =
    (0 until simhashChunks).map { i =>
      shiftrightunsigned(sig, chunkBits * i)
        .bitwiseAND(lit((1L << chunkWidth(i)) - 1L))
    }

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
                                       blockCols: Seq[String],
                                       leftId: String): DataFrame = {
    val salted = left.withColumn("salt",
      pmod(xxhash64(col(leftId)), lit(saltFactor.toLong)))
    val replicated = right.withColumn("salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    salted.join(replicated, blockCols :+ "salt").drop("salt")
  }

  /** Lang-blocked near-dup pairs at Hamming distance ≤ 8 of 64 bits,
    * with Hamming-LSH (chunk-banded) candidate generation — the same
    * band/bucket/verify shape as [[minhashLsh]], replacing the former
    * salted all-pairs-within-lang join whose work grew quadratically in
    * block size. Signatures come from the native fused-loop
    * [[graft.functions.SimHash64]] expression.
    *
    * Shape at scale: one narrow (lang, chunk, value, doc_id) table — 9
    * rows per doc — is self-joined on (lang, chunk, value); by the
    * pigeonhole argument at [[simhashChunks]] every qualifying pair
    * collides in ≥ 1 chunk, so recall is 100% before the mega-bucket cap
    * and the exact Hamming verify keeps precision exact. Signatures are
    * attached late (two hash joins on bare ids) so the banding shuffle
    * carries no payload.
    *
    * @param maxChunkBucket drop (lang, chunk, value) buckets larger than
    *   this before pairing (default [[simhashMaxChunkBucket]]; specs pass
    *   Int.MaxValue to assert exactness vs the all-pairs formulation).
    */
  def simhashNearDup(spark: SparkSession, sfDir: String,
                     maxChunkBucket: Int = simhashMaxChunkBucket)
      : DataFrame = {
    val d = documents(spark, sfDir)
      .repartition(col("doc_id")) // one-split source; signature is the cost
      .withColumn("norm", TextOps.normText(col("text")))
      .select(col("doc_id"), col("lang"),
        graft.functions.SimHash64(split(col("norm"), " ")).as("sig"))
      .persist() // chunk fan-out + both signature attaches
    val chunked = d.select(col("doc_id"), col("lang"),
        posexplode(array(chunkValExprs(col("sig")): _*)))
      .withColumnRenamed("pos", "chunk")
      .withColumnRenamed("col", "cval")
      .persist() // bucket-size filter + both self-join sides
    val keptBuckets = chunked.groupBy("lang", "chunk", "cval")
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxChunkBucket)
      .select("lang", "chunk", "cval")
    val kept = chunked.join(keptBuckets, Seq("lang", "chunk", "cval"))
    val candidates = kept.as("x").join(kept.as("y"),
        col("x.lang") === col("y.lang") && col("x.chunk") === col("y.chunk")
          && col("x.cval") === col("y.cval")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.lang").as("lang"), col("x.doc_id").as("id_a"),
        col("y.doc_id").as("id_b"))
      .distinct() // same pair may collide in several chunks
    val withSigs = candidates
      .join(d.select(col("doc_id").as("id_a"), col("sig").as("sig_a")),
        Seq("id_a"))
      .join(d.select(col("doc_id").as("id_b"), col("sig").as("sig_b")),
        Seq("id_b"))
    Canon.materialized(
      Canon.canonicalize(withSigs
        .withColumn("hamming",
          bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
        .filter(col("hamming") <= simhashMaxHamming)
        .select("lang", "id_a", "id_b", "hamming")),
      d, chunked)
  }

  private def simhashPairsDir(sfDir: String): String = {
    val fp = graft.io.Fingerprint.ofPath(s"$sfDir/documents.parquet")
    val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_").replaceAll("^_+", "")
    val params = s"hm$simhashMaxHamming-c$simhashMaxChunkBucket-v1"
    s"${graft.io.Artifacts.root}/simhash_pairs/${tag}_${params}_$fp"
  }

  /** The corpus's verified SIMHASH pair table as a persisted,
    * fingerprint-stamped artifact — [[lshPairs]]' contract applied to
    * the Hamming family (same SUCCESS gate, same kill switch, same
    * cached ≡ rebuilt bit-determinism, so consumers' standalone
    * oracles stay valid unchanged). [[simhashNearDup]] stays the
    * designated builder query; the recall telemetry reads this tier
    * instead of re-deriving the signature → chunk-band → verify chain
    * it measures the banding of.
    */
  def simhashPairs(spark: SparkSession, sfDir: String): DataFrame =
    if (!graft.io.Artifacts.sharedTier) simhashNearDup(spark, sfDir)
    else synchronized {
      val dir = simhashPairsDir(sfDir)
      if (!new java.io.File(s"$dir/_SUCCESS").exists()) {
        val built = simhashNearDup(spark, sfDir) // materialized (cached)
        built.write.mode("overwrite").parquet(dir)
        built.unpersist(false)
      }
      Canon.materialized(
        spark.read.parquet(dir).select("lang", "id_a", "id_b", "hamming"))
    }

  /** The pre-LSH all-pairs formulation (salted within lang blocks) —
    * retained as the reference for the chunking exactness spec: with the
    * bucket cap disabled the LSH result must EQUAL this, by pigeonhole.
    */
  private[ext] def simhashNearDupAllPairs(spark: SparkSession,
                                          sfDir: String): DataFrame = {
    val d = documents(spark, sfDir)
      .repartition(col("doc_id"))
      .withColumn("norm", TextOps.normText(col("text")))
      .select(col("doc_id"), col("lang"),
        graft.functions.SimHash64(split(col("norm"), " ")).as("sig"))
      .persist()
    val a = d.select(col("lang"), col("doc_id").as("id_a"),
      col("sig").as("sig_a"))
    val b = d.select(col("lang"), col("doc_id").as("id_b"),
      col("sig").as("sig_b"))
    Canon.materialized(
      Canon.canonicalize(
        saltedBlockSelfJoin(a, b, Seq("lang"), "id_a")
          .filter(col("id_a") < col("id_b"))
          .withColumn("hamming",
            bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
          .filter(col("hamming") <= simhashMaxHamming)
          .select("lang", "id_a", "id_b", "hamming")),
      d)
  }

  /** Full DuckDB oracle for `simhashNearDup`: token hashing, the 64-bit
    * vote/signature construction, the 9-chunk Hamming-LSH banding with
    * its mega-bucket cap, and the exact Hamming verify — all re-expressed
    * in SQL over the same twin hash family. Like the LSH oracle, generated
    * from the same constants as the Spark plan (chunk widths/masks
    * included), so the cap's recall trade reproduces identically.
    */
  /** The simhash signature → lang-blocked band → verify chain as CTEs
    * ending in `spairs` (lang, id_a, id_b, hamming) — shared by the
    * near-dup and recall oracles.
    */
  private def simhashChainCtes: String = {
    val maskCases = (0 until simhashChunks)
      .map(i => s"WHEN $i THEN ${(1L << chunkWidth(i)) - 1L}")
      .mkString(" ")
    s"""nd AS (
       |  SELECT doc_id, lang,
       |         lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm
       |  FROM documents),
       |toks AS (
       |  SELECT doc_id, lang, unnest(string_split(norm, ' ')) AS tok
       |  FROM nd),
       |th AS (
       |  SELECT doc_id, lang, ${tokenHash62Sql("tok")} AS h
       |  FROM toks),
       |votes AS (
       |  SELECT doc_id, lang, i,
       |         sum(CASE WHEN (h >> CAST(i AS INT)) & 1 = 1
       |                  THEN 1 ELSE -1 END) AS v
       |  FROM th, UNNEST(range(0, 64)) AS t(i)
       |  GROUP BY doc_id, lang, i),
       |sigs AS (
       |  SELECT doc_id, lang,
       |         sum(CASE WHEN v > 0
       |                  THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
       |                  ELSE 0 END) AS sig
       |  FROM votes GROUP BY doc_id, lang),
       |chunked AS (
       |  SELECT doc_id, lang, i AS chunk,
       |         (sig >> CAST($chunkBits * i AS INT))
       |           & (CASE i $maskCases END) AS cval
       |  FROM sigs, UNNEST(range(0, $simhashChunks)) AS t(i)),
       |kept AS MATERIALIZED (
       |  SELECT lang, chunk, cval FROM chunked
       |  GROUP BY lang, chunk, cval
       |  HAVING count(*) <= $simhashMaxChunkBucket),
       |kc AS (
       |  SELECT c.doc_id, c.lang, c.chunk, c.cval
       |  FROM chunked c JOIN kept k
       |    ON c.lang = k.lang AND c.chunk = k.chunk AND c.cval = k.cval),
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT x.lang, x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM kc x JOIN kc y
       |    ON x.lang = y.lang AND x.chunk = y.chunk AND x.cval = y.cval
       |       AND x.doc_id < y.doc_id),
       |spairs AS MATERIALIZED (
       |  SELECT c.lang, c.id_a, c.id_b,
       |         CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
       |  FROM cand c JOIN sigs a ON c.id_a = a.doc_id
       |              JOIN sigs b ON c.id_b = b.doc_id
       |  WHERE bit_count(xor(a.sig, b.sig)) <= $simhashMaxHamming)"""
      .stripMargin
  }

  val simhashNearDupOracle: String =
    s"""WITH $simhashChainCtes
       |SELECT lang, id_a, id_b, hamming FROM spairs""".stripMargin

  /** Recall telemetry for the simhash banding — the text member of the
    * Hamming-LSH family's recall row (cf. [[lshRecall]] for MinHash and
    * [[graft.ext.MultimodalOps.audioRecall]]/imageRecall): exact
    * Hamming-≤-threshold SAME-LANG pairs on a deterministic sample (the
    * operator's contract never proposes cross-lang pairs) vs the banded
    * operator's pairs restricted to the sample. Measures precisely the
    * mega-bucket cap's cost. Sample via TakeOrderedAndProject; exact
    * pairing bounded by the sample constant.
    */
  def simhashRecall(spark: SparkSession, sfDir: String,
                    bucketCap: Int = simhashMaxChunkBucket): DataFrame = {
    val sampleN = graft.ext.MultimodalOps.audioRecallSample
    val sigs = documents(spark, sfDir)
      .repartition(col("doc_id"))
      .withColumn("norm", TextOps.normText(col("text")))
      .select(col("doc_id"), col("lang"),
        graft.functions.SimHash64(split(col("norm"), " ")).as("sig"))
    val keyed = sigs.withColumn("h",
      ((col("doc_id") % SampleOps.P) * SampleOps.A + SampleOps.B)
        % SampleOps.P)
    val samp = keyed.orderBy(col("h").asc, col("doc_id").asc)
      .limit(sampleN)
      .select("doc_id", "lang", "sig").persist()
    val exact = samp.as("x").join(samp.as("y"),
        col("x.doc_id") < col("y.doc_id")
          && col("x.lang") === col("y.lang"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).as("hamming"))
      .filter(col("hamming") <= simhashMaxHamming)
      .select("id_a", "id_b").persist()
    val ids = samp.select("doc_id")
    // production cap ⇒ the shared pair tier; the failure drill's custom
    // caps still exercise the live chain (tier ≡ rebuilt is the tier's
    // own contract, so the telemetry measures the same banding)
    val bandedSrc =
      if (bucketCap == simhashMaxChunkBucket) simhashPairs(spark, sfDir)
      else simhashNearDup(spark, sfDir, bucketCap)
    val banded = bandedSrc
      .join(ids.withColumnRenamed("doc_id", "id_a"), Seq("id_a"),
        "left_semi")
      .join(ids.withColumnRenamed("doc_id", "id_b"), Seq("id_b"),
        "left_semi")
      .select("id_a", "id_b").persist()
    val ne = exact.agg(count(lit(1)).as("n_exact"))
    val nb = banded.agg(count(lit(1)).as("n_banded"))
    val nc = exact.join(banded, Seq("id_a", "id_b"))
      .agg(count(lit(1)).as("n_common"))
    val out = ne.crossJoin(nb).crossJoin(nc).select(
      col("n_exact"), col("n_banded"), col("n_common"),
      when(col("n_exact") > 0,
        col("n_common").cast("double") / col("n_exact").cast("double"))
        .otherwise(lit(1.0)).as("recall"))
    Canon.materialized(Canon.canonicalize(out), samp, exact, banded)
  }

  // lazy: references other objects' constants — a strict val here
  // evaluates during THIS object's init, where a circular init order
  // can read defaults (the r14 LIMIT-0 finding; belt to the
  // final-val-inlining braces on audioRecallSample)
  lazy val simhashRecallOracle: String = {
    val (sA, sB, sP) = (SampleOps.A, SampleOps.B, SampleOps.P)
    val sampleN = graft.ext.MultimodalOps.audioRecallSample
    s"""WITH $simhashChainCtes,
       |keyed AS (
       |  SELECT doc_id, lang, sig, ((doc_id % $sP) * $sA + $sB) % $sP AS h
       |  FROM sigs),
       |samp AS MATERIALIZED (
       |  SELECT doc_id, lang, sig FROM keyed
       |  ORDER BY h ASC, doc_id ASC LIMIT $sampleN),
       |exact AS MATERIALIZED (
       |  SELECT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM samp x JOIN samp y
       |    ON x.doc_id < y.doc_id AND x.lang = y.lang
       |  WHERE bit_count(xor(x.sig, y.sig)) <= $simhashMaxHamming),
       |bp AS MATERIALIZED (
       |  SELECT v.id_a, v.id_b FROM spairs v
       |  JOIN samp sa ON v.id_a = sa.doc_id
       |  JOIN samp sb ON v.id_b = sb.doc_id)
       |SELECT
       |  (SELECT count(*) FROM exact) AS n_exact,
       |  (SELECT count(*) FROM bp) AS n_banded,
       |  (SELECT count(*) FROM exact JOIN bp USING (id_a, id_b))
       |    AS n_common,
       |  CASE WHEN (SELECT count(*) FROM exact) > 0
       |    THEN CAST((SELECT count(*) FROM exact JOIN bp
       |               USING (id_a, id_b)) AS DOUBLE)
       |           / CAST((SELECT count(*) FROM exact) AS DOUBLE)
       |    ELSE 1.0 END AS recall""".stripMargin
  }

  // ---- cross-document duplicated spans --------------------------------

  /** Span width (in tokens) and the flag threshold for [[dupSpans]]. The
    * published exact-substring dedup passes match 50-token spans over BPE
    * streams; the fixture's documents are ~30–40 tokens, so the same
    * *shape* runs at 8 tokens (the repo's decontamination gram size).
    */
  val spanTokens = 8
  val dupSpanFracMax = 0.5

  /** Exact duplicated-SPAN detection — the gram-granular form of
    * exact-substring dedup (cf. reference `tasks/` dedup passes, which
    * stop at whole-document hashes): for every document, the fraction of
    * its `spanTokens`-token spans whose content also appears in ANOTHER
    * document. Near-duplicates surface here even when no whole document
    * matches, and the per-doc fraction is the removal signal a curation
    * pass thresholds on (`flagged` at `dupSpanFracMax`).
    *
    * Scale shape (the part that must survive 100 TB): span identity
    * travels as md5(span) — fixed-width, never the text. One explicit
    * repartition on the hash feeds the (gh, doc) aggregation AND the
    * per-gh document count — the latter as a WINDOW over the same
    * partitioning, not a self-join: a join against the duplicated-hash
    * set would either re-run the whole gram scan for the second input or
    * broadcast a set that grows with corpus duplication (unbounded), the
    * trap the first cut of this operator fell into (caught by plan
    * audit). The window adds only a partition-local, spillable sort. So:
    * one wide exchange linear in corpus tokens, one local sort, and the
    * final doc_id rollup. No all-pairs anything, nothing broadcast.
    */
  def dupSpans(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import CurationOps.{grams, toksCol}
    val d = documents(spark, sfDir)
      .repartition(col("doc_id")) // single-split fixture; gram explode is narrow
      .select(col("doc_id"), toksCol.as("toks"))
    val gramRows = d
      .select(col("doc_id"), explode(grams(col("toks"), spanTokens)).as("gram"))
      .select(col("doc_id"), md5(col("gram")).as("gh"))
      .repartition(col("gh"))
    // one row per (gh, doc): occ = starts of this span in this doc;
    // partitioning on gh survives the aggregation, so the window below
    // needs no second exchange
    val byDocGh = gramRows.groupBy("gh", "doc_id")
      .agg(count(lit(1)).as("occ"))
    // byDocGh is unique on (gh, doc_id), so rows per gh = distinct docs
    val perDoc = byDocGh
      .withColumn("n_docs", count(lit(1)).over(Window.partitionBy("gh")))
      .filter(col("n_docs") > 1)
      .groupBy("doc_id").agg(sum("occ").as("n_dup"))
    val out = documents(spark, sfDir)
      .select(col("doc_id"),
        greatest(size(toksCol) - (spanTokens - 1), lit(0))
          .cast("long").as("n_spans"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_spans"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup_spans"),
        when(col("n_spans") > 0,
          coalesce(col("n_dup"), lit(0L)).cast("double") /
            col("n_spans").cast("double"))
          .otherwise(lit(0.0)).as("dup_span_frac"))
      .withColumn("flagged", col("dup_span_frac") > dupSpanFracMax)
    Canon.canonicalize(out)
  }

  /** Span-level dedup APPLY — the text SURGERY that closes the
    * detect→remove loop [[dupSpans]] only measures: every
    * `spanTokens`-token span whose content appears in more than one
    * document is removed from every document EXCEPT the corpus-wide
    * first occurrence (min doc_id — the keep-first policy dedupApply
    * uses for whole documents), and the surviving tokens are stitched
    * back together. This is the gram-granular remedy for the
    * 40%-boilerplate document whose only alternative is drop-or-keep.
    *
    * Exact token-level semantics (the spec recomputes them brute-force):
    * a token is removed iff it lies inside at least one LOSING span —
    * a span whose gram-hash is shared cross-doc and whose document is
    * not that gram's keeper. The keeper keeps every occurrence,
    * including its own internal repeats; overlapping losing spans union
    * their token ranges.
    *
    * Scale shape: the span scan and (gh, doc) rollup are exactly
    * [[dupSpans]]'s one wide exchange + window (nothing broadcast, no
    * self-join re-scan); the apply side adds a bounded ×spanTokens
    * explode of LOSING spans only, one (doc_id, pos) dedup, one
    * left_anti against the token stream, and the per-doc regroup —
    * every step keyed and linear in corpus tokens. The rebuilt text
    * aggregates as (pos, tok) structs sorted per doc, so reassembly is
    * deterministic under any partitioning.
    */
  def dupSpansApply(spark: SparkSession, sfDir: String): DataFrame =
    dupSpansApplyDocs(documents(spark, sfDir))

  private[ext] def dupSpansApplyDocs(docs: DataFrame,
                                     w: Int = spanTokens): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import CurationOps.{grams, toksCol}
    val d = docs.repartition(col("doc_id"))
      .select(col("doc_id"), toksCol.as("toks"))
      .persist() // span scan + token stream + n_tokens base
    val spanRows = d.select(col("doc_id"),
        posexplode(grams(col("toks"), w)).as(Seq("i0", "gram")))
      .select(col("doc_id"), col("i0"), md5(col("gram")).as("gh"))
      .repartition(col("gh"))
      .persist() // gh stats + losing-span attach share one exchange
    val byGh = Window.partitionBy("gh")
    val losing = spanRows.groupBy("gh", "doc_id").agg(count(lit(1)).as("occ"))
      .withColumn("n_docs", count(lit(1)).over(byGh))
      .withColumn("min_doc", min("doc_id").over(byGh))
      .filter(col("n_docs") > 1 && col("doc_id") =!= col("min_doc"))
      .select("gh", "doc_id")
    val removedPos = spanRows.join(losing, Seq("gh", "doc_id"))
      .select(col("doc_id"),
        explode(sequence(col("i0"), col("i0") + lit(w - 1)))
          .as("pos"))
      .distinct()
    Canon.materialized(
      Canon.canonicalize(spanSurgery(d, removedPos)), d, spanRows)
  }

  /** The token-level surgery shared by [[dupSpansApplyDocs]] and
    * [[CurationOps.decontaminateSpans]]: given the (doc_id, toks) base
    * and the (doc_id, pos) removal set, anti-join the exploded token
    * stream, rebuild cleaned text from (pos, tok) structs sorted per
    * doc, and emit removal stats. Deterministic under any partitioning.
    */
  private[ext] def spanSurgery(d: DataFrame,
                               removedPos: DataFrame): DataFrame = {
    val tokRows = d.select(col("doc_id"),
      posexplode(col("toks")).as(Seq("pos", "tok")))
    val kept = tokRows.join(removedPos, Seq("doc_id", "pos"), "left_anti")
    val rebuilt = kept.groupBy("doc_id").agg(
      count(lit(1)).as("n_kept"),
      concat_ws(" ",
        transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok"))).as("cleaned"))
    d.select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L)))
          .as("n_removed"),
        when(col("n_tokens") > 0,
          (col("n_tokens") - coalesce(col("n_kept"), lit(0L)))
            .cast("double") / col("n_tokens").cast("double"))
          .otherwise(lit(0.0)).as("removed_frac"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }

  val dupSpansApplyOracle: String = dupSpansApplyOracleFor(spanTokens)

  private[ext] def dupSpansApplyOracleFor(w: Int): String = {
    s"""WITH d AS (
       |  SELECT doc_id, ${CurationOps.toksSql} AS toks FROM documents),
       |g AS (
       |  SELECT doc_id, i,
       |    md5(array_to_string(list_slice(toks, i, i + ${w - 1}), ' ')) AS gh
       |  FROM d, unnest(range(1, len(toks) - ${w - 2})) AS r(i)),
       |st AS (SELECT gh, doc_id FROM g GROUP BY 1, 2),
       |stats AS (
       |  SELECT gh, count(*) AS n_docs, min(doc_id) AS min_doc
       |  FROM st GROUP BY 1),
       |losing AS (
       |  SELECT st.gh, st.doc_id
       |  FROM st JOIN stats USING (gh)
       |  WHERE n_docs > 1 AND st.doc_id <> min_doc),
       |lsp AS (
       |  SELECT g.doc_id, g.i
       |  FROM g JOIN losing ON g.gh = losing.gh AND g.doc_id = losing.doc_id),
       |rp AS (
       |  SELECT DISTINCT doc_id, i + o AS pos
       |  FROM lsp, unnest(range(0, $w)) AS t(o)),
       |tok AS (
       |  SELECT doc_id, i AS pos, toks[i] AS tok
       |  FROM d, unnest(range(1, len(toks) + 1)) AS t(i)),
       |kept AS MATERIALIZED (
       |  SELECT t.doc_id, t.pos, t.tok
       |  FROM tok t LEFT JOIN rp ON t.doc_id = rp.doc_id AND t.pos = rp.pos
       |  WHERE rp.doc_id IS NULL),
       |cl AS (
       |  SELECT doc_id, count(*) AS n_kept,
       |         string_agg(tok, ' ' ORDER BY pos) AS cleaned
       |  FROM kept GROUP BY 1),
       |base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM d)
       |SELECT base.doc_id, n_tokens,
       |       CAST(n_tokens - coalesce(n_kept, 0) AS BIGINT) AS n_removed,
       |       CASE WHEN n_tokens > 0
       |         THEN CAST(n_tokens - coalesce(n_kept, 0) AS DOUBLE)
       |                / CAST(n_tokens AS DOUBLE)
       |         ELSE 0.0 END AS removed_frac,
       |       coalesce(cleaned, '') AS cleaned
       |FROM base LEFT JOIN cl USING (doc_id)""".stripMargin
  }

  val dupSpansOracle: String = {
    val w = spanTokens
    s"""WITH d AS (
       |  SELECT doc_id, ${CurationOps.toksSql} AS toks FROM documents),
       |g AS (
       |  SELECT doc_id,
       |    md5(array_to_string(list_slice(toks, i, i + ${w - 1}), ' ')) AS gh
       |  FROM d, unnest(range(1, len(toks) - ${w - 2})) AS r(i)),
       |bdg AS (
       |  SELECT gh, doc_id, count(*) AS occ FROM g GROUP BY 1, 2),
       |dup AS (
       |  SELECT gh FROM bdg GROUP BY gh HAVING count(*) > 1),
       |per AS (
       |  SELECT doc_id, sum(occ) AS n_dup
       |  FROM bdg JOIN dup USING (gh) GROUP BY 1),
       |base AS (
       |  SELECT doc_id,
       |    CAST(greatest(len(toks) - ${w - 1}, 0) AS BIGINT) AS n_spans
       |  FROM d),
       |f AS (
       |  SELECT base.doc_id, n_spans,
       |    CAST(coalesce(n_dup, 0) AS BIGINT) AS n_dup_spans,
       |    CASE WHEN n_spans > 0
       |      THEN CAST(coalesce(n_dup, 0) AS DOUBLE) / CAST(n_spans AS DOUBLE)
       |      ELSE 0.0 END AS dup_span_frac
       |  FROM base LEFT JOIN per USING (doc_id))
       |SELECT *, dup_span_frac > $dupSpanFracMax AS flagged FROM f""".stripMargin
  }

  // ---- long-span exact-substring dedup (maximal-match extension) ------

  /** Seed length of the LONG-span pass — the ~50-token spans the
    * exact-substring dedup literature targets (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better"):
    * spans this long are near-certainly true copies, not phrase-level
    * coincidence, so surgery at this granularity is safe by default
    * where [[spanTokens]]-gram surgery needs the fraction gate.
    */
  val longSpanTokens = 50

  /** MAXIMAL duplicated-region telemetry — [[dupSpans]] upgraded from
    * fixed-gram counting to the Lee-et-al maximal-match semantics: a
    * `w`-token seed gram that appears in more than one document marks
    * its token interval as duplicated, and overlapping or adjacent
    * marked intervals within a document MERGE into maximal runs (the
    * greedy extension: consecutive duplicated seeds at start positions
    * ≤ `w` apart chain into one region, so a 120-token verbatim copy
    * reports as ONE run of length 120, not 71 overlapping grams).
    * Per doc: run count, tokens covered by any run, the longest run,
    * and the covered fraction.
    *
    * Scale shape: one wide exchange on the gram hash (the [[dupSpans]]
    * plan) to find cross-doc seeds, then the run merge is a per-doc
    * window over the doc's OWN duplicated seed positions — keyed by
    * doc, bounded by doc length, no corpus-sized sort. The lag/
    * running-sum interval merge is the standard distributed
    * interval-union shape.
    */
  def dupSpanRuns(spark: SparkSession, sfDir: String,
                  w: Int = longSpanTokens): DataFrame =
    dupSpanRunsDocs(documents(spark, sfDir), w)

  private[ext] def dupSpanRunsDocs(docs: DataFrame, w: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import CurationOps.{grams, toksCol}
    val d = docs
      .repartition(col("doc_id"))
      .select(col("doc_id"), toksCol.as("toks"))
      .persist() // seed scan + n_tokens base
    val spanRows = d.select(col("doc_id"),
        posexplode(grams(col("toks"), w)).as(Seq("i0", "gram")))
      .select(col("doc_id"), col("i0"), md5(col("gram")).as("gh"))
      .repartition(col("gh"))
      .persist() // cross-doc stats + covered-position attach
    val dupGh = spanRows.groupBy("gh")
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") > 1).select("gh")
    val covered = spanRows.join(dupGh, Seq("gh"))
      .select("doc_id", "i0")
    val byDoc = Window.partitionBy("doc_id").orderBy("i0")
    // intervals [i0, i0+w-1]; a gap of more than w start positions
    // means the previous interval ends before this one starts
    val runs = covered
      .withColumn("brk",
        when(col("i0") - lag("i0", 1).over(byDoc) > w, 1).otherwise(0))
      .withColumn("run_id", sum("brk").over(byDoc))
      .groupBy("doc_id", "run_id")
      .agg(min("i0").as("s"), max("i0").as("e"))
      .select(col("doc_id"), (col("e") - col("s") + w).cast("long").as("len"))
    val perDoc = runs.groupBy("doc_id").agg(
      count(lit(1)).as("n_runs"),
      sum("len").as("n_dup_tokens"),
      max("len").as("max_run_len"))
    val out = d
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_runs"), lit(0L)).as("n_runs"),
        coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"),
        coalesce(col("max_run_len"), lit(0L)).as("max_run_len"),
        when(col("n_tokens") > 0,
          coalesce(col("n_dup_tokens"), lit(0L)).cast("double") /
            col("n_tokens").cast("double"))
          .otherwise(lit(0.0)).as("dup_token_frac"))
    Canon.materialized(Canon.canonicalize(out), d, spanRows)
  }

  /** Long-span surgery: [[dupSpansApplyDocs]] at [[longSpanTokens]] —
    * remove every token inside a losing ≥50-token duplicated span
    * (keep-first by min doc_id), stitch survivors back.
    */
  def dupSpansApplyLong(spark: SparkSession, sfDir: String): DataFrame =
    dupSpansApplyDocs(documents(spark, sfDir), longSpanTokens)

  private[ext] def dupSpanRunsOracleFor(w: Int): String =
    s"""WITH d AS (
       |  SELECT doc_id, ${CurationOps.toksSql} AS toks FROM documents),
       |g AS (
       |  SELECT doc_id, i - 1 AS i0,
       |    md5(array_to_string(list_slice(toks, i, i + ${w - 1}), ' ')) AS gh
       |  FROM d, unnest(range(1, len(toks) - ${w - 2})) AS r(i)),
       |dup AS (
       |  SELECT gh FROM (SELECT gh, doc_id FROM g GROUP BY 1, 2)
       |  GROUP BY gh HAVING count(*) > 1),
       |cov AS (SELECT doc_id, i0 FROM g JOIN dup USING (gh)),
       |l AS (
       |  SELECT doc_id, i0,
       |    CASE WHEN i0 - lag(i0) OVER (PARTITION BY doc_id ORDER BY i0)
       |           > $w THEN 1 ELSE 0 END AS brk
       |  FROM cov),
       |rr AS (
       |  SELECT doc_id, i0,
       |    sum(brk) OVER (PARTITION BY doc_id ORDER BY i0) AS run_id
       |  FROM l),
       |runs AS (
       |  SELECT doc_id, run_id, min(i0) AS s, max(i0) AS e
       |  FROM rr GROUP BY 1, 2),
       |per AS (
       |  SELECT doc_id, count(*) AS n_runs,
       |         sum(e - s + $w) AS n_dup_tokens,
       |         max(e - s + $w) AS max_run_len
       |  FROM runs GROUP BY 1),
       |base AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM d)
       |SELECT base.doc_id, n_tokens,
       |  CAST(coalesce(n_runs, 0) AS BIGINT) AS n_runs,
       |  CAST(coalesce(n_dup_tokens, 0) AS BIGINT) AS n_dup_tokens,
       |  CAST(coalesce(max_run_len, 0) AS BIGINT) AS max_run_len,
       |  CASE WHEN n_tokens > 0
       |    THEN CAST(coalesce(n_dup_tokens, 0) AS DOUBLE)
       |           / CAST(n_tokens AS DOUBLE)
       |    ELSE 0.0 END AS dup_token_frac
       |FROM base LEFT JOIN per USING (doc_id)""".stripMargin

  val dupSpanRunsOracle: String = dupSpanRunsOracleFor(longSpanTokens)

  val dupSpansApplyLongOracle: String =
    dupSpansApplyOracleFor(longSpanTokens)
}
