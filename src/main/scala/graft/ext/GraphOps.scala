package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Canon

/** Graph analytics over the duplicate-similarity graph (nodes = docs,
  * edges = LSH near-dup pairs) — the connectivity view a curation
  * pipeline uses beyond flat clustering: PageRank centrality marks the
  * "hub" documents of a template family (the representative-selection
  * signal richer than min-id), and complements clustersFromPairs'
  * connected components.
  *
  * Numeric contract — FIXED-POINT PageRank: ranks live in integer
  * units of 1/[[pageRankScale]], every division is integral, every
  * per-node sum is a sum of BIGINTs. Floating-point PageRank cannot be
  * hash-verified across engines (per-node contribution sums are
  * order-dependent in IEEE addition, and partial-aggregation order is
  * nondeterministic); fixed-point makes each iteration EXACTLY
  * reproducible on any engine — same trade the BBP-style arithmetic
  * twins make everywhere else in this repo. Truncation loses ≤ 1 unit
  * (10⁻¹²) per term per round: irrelevant to ranking, decisive for
  * verifiability.
  */
object GraphOps {

  /** Fixed-point unit (10¹² units = rank mass 1.0), damping 0.85 as the
    * exact rational 85/100, and the standard 3-iteration budget for a
    * near-dup graph whose components are tiny.
    */
  val pageRankScale = 1000000000000L
  val pageRankIters = 3
  val dampNum = 85L
  val dampDen = 100L

  /** PageRank over the symmetrized [[DedupOps.minhashLsh]] pair graph.
    *
    * Per iteration: each node sends r/deg (integral division) along
    * every edge; a node's next rank is
    * `base + (sum_of_contributions · 85) div 100` with
    * `base = ((SCALE div N) · 15) div 100`. No dangling mass —
    * symmetrization gives every node out-edges.
    *
    * Scale shape: edges and degrees persist once and drive
    * [[pageRankIters]] keyed shuffles (join on sender, aggregate on
    * receiver) — the canonical distributed PageRank plan; the one
    * driver action is the node COUNT (a scalar, the k-means sync
    * pattern). At 100 TB the LSH pair list is the already-bounded
    * candidate output, orders smaller than the corpus.
    */
  def pageRank(spark: SparkSession, sfDir: String): DataFrame = {
    val lsh = DedupOps.lshPairs(spark, sfDir) // materialized (cached)
    val pairs = lsh.select("id_a", "id_b")
    val edges = pairs.unionByName(pairs.select(
        col("id_b").as("id_a"), col("id_a").as("id_b")))
    val deg = edges.groupBy("id_a").agg(count(lit(1)).as("deg"))
      .withColumnRenamed("id_a", "id").persist()
    // sender degree folded into the edge list ONCE — each iteration
    // then needs a single join (edges⋈ranks), not two
    val edgesWithDeg = edges
      .join(deg.withColumnRenamed("id", "id_a"), "id_a").persist()
    val n = deg.count() // ONE driver scalar: the node count
    if (n == 0L) {
      // empty pair graph (clean corpus): empty frame, correct schema,
      // no division by zero — and nothing left pinned in the cache
      val empty = Canon.canonicalize(deg.select(col("id"),
        lit(0L).as("r"), lit(0.0).as("r_norm")))
      return Canon.materialized(empty, lsh, edgesWithDeg, deg)
    }
    val r0 = pageRankScale / n
    val base = r0 * 15L / 100L
    var ranks = deg.select(col("id"), lit(r0).as("r"))
    for (_ <- 1 to pageRankIters) {
      val contribs = edgesWithDeg
        .join(ranks.withColumnRenamed("id", "id_a"), "id_a")
        .select(col("id_b").as("id"), expr("r div deg").as("c"))
      val sums = contribs.groupBy("id").agg(sum("c").as("s"))
      ranks = deg.select(col("id")).join(sums, Seq("id"), "left")
        .select(col("id"), (lit(base) +
          expr(s"coalesce(s, 0L) * $dampNum div $dampDen")).as("r"))
    }
    // `lsh` is included: minhashLsh returns a MATERIALIZED (cached)
    // frame, and without releasing it here every pageRank call would
    // pin the full LSH pair result in executor memory (the Scd2 /
    // clustersFromPairs cache discipline)
    Canon.materialized(
      Canon.canonicalize(ranks.select(col("id"), col("r"),
        (col("r").cast("double") / lit(pageRankScale.toDouble))
          .as("r_norm"))),
      lsh, edgesWithDeg, deg)
  }

  /** Triangle counts + local clustering coefficient per node of the
    * LSH pair graph — the cohesion signal that separates a tight
    * template family (every member near-dups every other: coefficient
    * → 1) from a hub-and-spokes pattern (one canonical doc with many
    * independent variants: coefficient → 0), which changes what a
    * representative-selection policy should do.
    *
    * Triangles are enumerated once in (a < b < c) order via the
    * standard wedge join — e(a,b) ⋈ e(b,c) closed by e(a,c); the
    * ordering means no triangle is counted twice and the join carries
    * only forward edges. Per-node counts explode the three corners.
    * The coefficient is the exact rational 2·tri / (deg·(deg−1)) — two
    * integer products, one division, bit-deterministic.
    *
    * Scale shape: the wedge join is keyed on the middle vertex; its
    * fan-out is bounded upstream by the LSH mega-bucket caps (a
    * pathological hub would have been capped out of the pair list).
    * One persisted edge list drives both the wedge join and degrees.
    */
  def triangles(spark: SparkSession, sfDir: String): DataFrame = {
    val lsh = DedupOps.lshPairs(spark, sfDir) // materialized (cached)
    val e = lsh.select(col("id_a").as("a"), col("id_b").as("b"))
      .persist() // wedge join (3 sides) + degrees
    val tri = e.as("x").join(e.as("y"), col("x.b") === col("y.a"))
      .select(col("x.a").as("a"), col("x.b").as("b"), col("y.b").as("c"))
      .join(e.select(col("a"), col("b").as("c")), Seq("a", "c"))
    val nTri = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
    val deg = e.select(col("a").as("id"))
      .unionByName(e.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val out = deg.join(nTri, Seq("id"), "left")
      .select(col("id"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(col("deg") >= 2,
          (coalesce(col("n_tri"), lit(0L)) * 2L).cast("double") /
            (col("deg") * (col("deg") - 1L)).cast("double"))
          .otherwise(lit(0.0)).as("clustering"))
    Canon.materialized(Canon.canonicalize(out), lsh, e)
  }

  val trianglesOracle: String =
    s"""WITH ${DedupOps.minhashLshCte},
       |tri AS MATERIALIZED (
       |  SELECT x.id_a AS a, x.id_b AS b, y.id_b AS c
       |  FROM lpairs x
       |  JOIN lpairs y ON x.id_b = y.id_a
       |  JOIN lpairs z ON z.id_a = x.id_a AND z.id_b = y.id_b),
       |corners AS (
       |  SELECT a AS id FROM tri
       |  UNION ALL SELECT b FROM tri
       |  UNION ALL SELECT c FROM tri),
       |ntri AS (SELECT id, count(*) AS n_tri FROM corners GROUP BY 1),
       |deg AS (
       |  SELECT id, count(*) AS deg FROM (
       |    SELECT id_a AS id FROM lpairs
       |    UNION ALL SELECT id_b FROM lpairs) GROUP BY 1)
       |SELECT deg.id, deg.deg,
       |       CAST(coalesce(n_tri, 0) AS BIGINT) AS n_tri,
       |       CASE WHEN deg >= 2
       |            THEN CAST(coalesce(n_tri, 0) * 2 AS DOUBLE)
       |                 / CAST(deg * (deg - 1) AS DOUBLE)
       |            ELSE 0.0 END AS clustering
       |FROM deg LEFT JOIN ntri USING (id)""".stripMargin

  /** Oracle: the LSH CTE prefix + the three iterations unrolled.
    * Iteration CTEs are AS MATERIALIZED — DuckDB inlines non-recursive
    * CTEs per reference, and each iteration references its predecessor
    * inside a join (exponential re-evaluation otherwise). BIGINT sums
    * widen to HUGEINT, so the final rank is cast back.
    */
  val pageRankOracle: String = {
    val iters = (1 to pageRankIters).map { k =>
      val prev = if (k == 1) "r0" else s"it${k - 1}"
      s"""it$k AS MATERIALIZED (
         |  SELECT d.id, (SELECT b FROM base) +
         |         (coalesce(c.s, 0) * $dampNum) // $dampDen AS r
         |  FROM deg d LEFT JOIN (
         |    SELECT e.id_b AS id, sum(r.r // dg.deg) AS s
         |    FROM edges e JOIN $prev r ON e.id_a = r.id
         |                 JOIN deg dg ON e.id_a = dg.id
         |    GROUP BY 1) c ON d.id = c.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${DedupOps.minhashLshCte},
       |edges AS MATERIALIZED (
       |  SELECT id_a, id_b FROM lpairs
       |  UNION ALL
       |  SELECT id_b AS id_a, id_a AS id_b FROM lpairs),
       |deg AS MATERIALIZED (
       |  SELECT id_a AS id, count(*) AS deg FROM edges GROUP BY 1),
       |nn AS (SELECT count(*) AS n FROM deg),
       |base AS (
       |  SELECT ($pageRankScale // n * 15) // 100 AS b FROM nn),
       |r0 AS MATERIALIZED (
       |  SELECT id, $pageRankScale // n AS r FROM deg, nn),
       |$iters
       |SELECT id, CAST(r AS BIGINT) AS r,
       |       CAST(CAST(r AS BIGINT) AS DOUBLE) / $pageRankScale.0
       |         AS r_norm
       |FROM it$pageRankIters""".stripMargin
  }
}
