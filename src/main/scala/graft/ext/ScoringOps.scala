package graft.ext

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Canon

/** Batched model-inference seam: the step every modern curation pipeline
  * runs between heuristic filters and dedup — classifier quality scores,
  * learned embeddings, reward models — generalized from the
  * MultimodalOps codec seam (MultimodalOps.scala decodeStub) into a
  * reusable operator with an explicit contract:
  *
  *  - **typed mapPartitions**: the model call is per-partition
  *    imperative code by nature (a native library / inference session),
  *    the one place the RDD-ish escape hatch is the right tool. The
  *    surrounding pipeline stays declarative — inputs arrive as a typed
  *    `Dataset[I]`, outputs leave as a typed `Dataset[O]`.
  *  - **init once per NON-EMPTY partition**: `BatchModel.open()` is
  *    where weights load / a session handle opens. It runs lazily on
  *    first input, never for empty partitions, and `close()` runs
  *    exactly once per open (task-completion listener, so an error in a
  *    downstream operator still releases the handle).
  *  - **bounded batch buffer**: inputs stream through `grouped(batchSize)`
  *    — at most one batch of rows is materialized per partition at any
  *    moment, regardless of partition size. Executor memory is bounded
  *    by batchSize × row size, which is what makes the seam safe at
  *    100 TB where a partition can hold millions of documents.
  *  - **order + arity preserved**: one output per input, in input order
  *    (required loudly — a model that drops or reorders rows corrupts
  *    any downstream zip with the inputs).
  *
  * The shipped [[ScoringOps.QualityStub]] stands in for a real model the
  * way ImageHash64's byte-percentile grid stands in for a real decoder:
  * the container has no inference runtime, so the "model" is a
  * deterministic closed-form scorer whose arithmetic a DuckDB oracle
  * reproduces exactly — integer feature extraction + ONE double
  * division (IEEE-exact in both engines), no transcendentals. Swapping
  * in a real model touches only the `BatchModel` implementation; the
  * Spark-side plumbing (schema, partitioning, batch shape) is the part
  * under test and it is real.
  */
object ScoringOps {

  /** A batched scoring model. `open()` is the expensive per-partition
    * initialization (load weights, start a session); the returned
    * handle scores fixed-size batches. Implementations must be
    * Serializable — the model OBJECT ships to executors, the HANDLE
    * never leaves the partition that opened it.
    */
  trait BatchModel[I, O] extends Serializable {
    def name: String
    def open(): BatchHandle[I, O]
  }

  trait BatchHandle[I, O] {
    /** Must return exactly one output per input, in input order. */
    def scoreBatch(batch: Seq[I]): Seq[O]
    def close(): Unit
  }

  val defaultBatchSize = 64

  /** Run `model` over `ds` in bounded batches. See the object scaladoc
    * for the contract; ScoringOpsSpec pins every clause.
    */
  def batchScore[I, O: Encoder](ds: Dataset[I], model: BatchModel[I, O],
                                batchSize: Int = defaultBatchSize): Dataset[O] = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    ds.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val handle = model.open()
        var closed = false
        def closeOnce(): Unit = if (!closed) { closed = true; handle.close() }
        // a failing downstream operator must still release the handle
        Option(TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
        val batched = it.grouped(batchSize)
        new Iterator[O] {
          private var cur: Iterator[O] = Iterator.empty
          def hasNext: Boolean = {
            while (!cur.hasNext && batched.hasNext) {
              val batch = batched.next()
              val out = handle.scoreBatch(batch)
              require(out.length == batch.length,
                s"model ${model.name}: ${out.length} outputs for a batch " +
                  s"of ${batch.length} — the contract is one per input")
              cur = out.iterator
            }
            val more = cur.hasNext
            if (!more) closeOnce()
            more
          }
          def next(): O = {
            if (!hasNext) throw new NoSuchElementException
            cur.next()
          }
        }
      }
    }
  }

  // ---- deterministic stub model --------------------------------------

  /** Integer feature caps / weights of the stub scorer — arbitrary
    * fixed "learned" constants; what matters is exact reproducibility.
    */
  val stubLenCap = 2000L
  val stubTokCap = 400L

  /** The deterministic stand-in classifier: integer features over the
    * shared normalized text (length, word-token count, a length-mod-7
    * pseudo-signal), linearly combined, squashed by the rational map
    * raw/(raw+1000) — monotone into [0,1) with ONE exact double
    * division. Bit-identical to the DuckDB oracle by construction.
    * (Lengths are UTF-16 units JVM-side vs codepoints in DuckDB — equal
    * on the ASCII fixture; a real model replaces this stub wholesale.)
    */
  object QualityStub extends BatchModel[(Long, String), (Long, Long, Double)] {
    val name = "quality-stub-v1"
    def open(): BatchHandle[(Long, String), (Long, Long, Double)] =
      new BatchHandle[(Long, String), (Long, Long, Double)] {
        // per-partition "weights": the compiled regex is the stand-in
        private val wordRe = java.util.regex.Pattern.compile("[a-z0-9]+")
        def scoreBatch(batch: Seq[(Long, String)]): Seq[(Long, Long, Double)] =
          batch.map { case (id, text) =>
            val norm = text.replaceAll("\\s+", " ").trim
              .toLowerCase(java.util.Locale.ROOT)
            val len = norm.length.toLong
            val m = wordRe.matcher(norm)
            var nTok = 0L
            while (m.find()) nTok += 1
            val raw = 3L * math.min(len, stubLenCap) +
              5L * math.min(nTok, stubTokCap) + 2L * (len % 7L)
            (id, raw, raw.toDouble / (raw + 1000L).toDouble)
          }
        def close(): Unit = ()
      }
  }

  /** q_model_score: the stub classifier over every document — the
    * operator a real pipeline points at a quality model. Documents are
    * a single parquet split at fixture scale, so repartition first: the
    * per-row work is the whole cost and must spread across cores (the
    * same reasoning as the shingle pipeline).
    */
  def modelScore(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val in = TextOps.documents(spark, sfDir)
      .repartition(spark.sessionState.conf.numShufflePartitions)
      .select(col("doc_id"), col("text")).as[(Long, String)]
    Canon.canonicalize(
      batchScore(in, QualityStub)
        .toDF("doc_id", "raw_score", "model_score"))
  }

  /** RETRIEVE → RERANK: BM25's per-lang top-k shortlist re-ordered by
    * the (stub) model — the two-stage ranking every production search
    * and RAG pipeline runs, with the expensive model touching ONLY the
    * shortlist (langs × k rows), never the corpus. Emits both ranks so
    * the rank-shift is inspectable.
    *
    * Scale shape: the first stage is [[graft.ext.TextOps.bm25]]'s
    * broadcast+heap plan; the second stage joins text onto the
    * k-per-lang shortlist (AQE broadcasts it) and runs the batched
    * seam over rows numbering in the dozens — no repartition needed,
    * the model cost is bounded by k whatever the corpus size. Final
    * order via the TopKPerKey heap, consistent with every other
    * rank in the repo.
    */
  def rerank(spark: SparkSession, sfDir: String): DataFrame = {
    val (bmTop0, _, tf, dl) = TextOps.bm25Top(spark, sfDir)
    val bmTop = bmTop0.persist() // rerankTopFrom consumes it twice
    Canon.materialized(
      Canon.canonicalize(
        rerankTopFrom(spark, sfDir, bmTop)
          .select("lang", "rerank", "doc_id", "bm25_rank", "model_score")),
      tf, dl, bmTop)
  }

  /** The rerank stage over an already-built BM25 top list (any frame
    * with lang, doc_id, rank) — ONE definition serves [[rerank]] and
    * [[retrievalEval]] so the two queries rank identically.
    */
  private[ext] def rerankTopFrom(spark: SparkSession, sfDir: String,
                                 bmTop: DataFrame): DataFrame = {
    import spark.implicits._
    val top = bmTop
      .select(col("lang"), col("doc_id"), col("rank").as("bm25_rank"))
    val withText = top.join(
      TextOps.documents(spark, sfDir).select("doc_id", "text"),
      Seq("doc_id"))
    val scored = batchScore(
      withText.select(col("doc_id"), col("text")).as[(Long, String)],
      QualityStub).toDF("doc_id", "raw_score", "model_score")
    val joined = withText.select("lang", "doc_id", "bm25_rank")
      .join(scored.select("doc_id", "model_score"), Seq("doc_id"))
    graft.plans.TopK.perKey(joined,
      Seq("lang"),
      Seq("model_score" -> graft.plans.TopK.Desc,
        "doc_id" -> graft.plans.TopK.Asc),
      TextOps.bm25TopK, rankCol = Some("rerank"))
  }

  /** The rerank chain as composable CTEs (assumes `bmtop` exists; ends
    * in `reranked`) — shared by [[rerankOracle]] and
    * [[retrievalEvalOracle]].
    */
  private def rerankCtes: String =
    s"""bmt AS MATERIALIZED (SELECT * FROM bmtop),
       |sn AS (
       |  SELECT d.doc_id, ${TextOps.normSql} AS norm
       |  FROM documents d JOIN bmt b ON d.doc_id = b.doc_id),
       |sf AS (
       |  SELECT doc_id,
       |         3 * least(length(norm), $stubLenCap)
       |           + 5 * least(len(regexp_extract_all(norm, '[a-z0-9]+')),
       |                       $stubTokCap)
       |           + 2 * (length(norm) % 7) AS raw
       |  FROM sn),
       |rr AS (
       |  SELECT b.lang, b.doc_id, b.rank AS bm25_rank,
       |         CAST(raw AS DOUBLE) / CAST(raw + 1000 AS DOUBLE)
       |           AS model_score
       |  FROM bmt b JOIN sf ON b.doc_id = sf.doc_id),
       |reranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY lang
       |            ORDER BY model_score DESC, doc_id ASC) AS rerank
       |  FROM rr)""".stripMargin

  /** Composes the SHARED bm25 chain with the stub-model arithmetic
    * restricted to the shortlist — neither side duplicated.
    */
  def rerankOracle: String =
    s"""WITH ${TextOps.bm25Cte},
       |$rerankCtes
       |SELECT lang, rerank, doc_id, bm25_rank, model_score
       |FROM reranked WHERE rerank <= ${TextOps.bm25TopK}""".stripMargin

  val modelScoreOracle: String =
    s"""WITH n AS (SELECT doc_id, ${TextOps.normSql} AS norm FROM documents),
       |f AS (
       |  SELECT doc_id,
       |         3 * least(length(norm), $stubLenCap)
       |           + 5 * least(len(regexp_extract_all(norm, '[a-z0-9]+')),
       |                       $stubTokCap)
       |           + 2 * (length(norm) % 7) AS raw
       |  FROM n)
       |SELECT doc_id, CAST(raw AS BIGINT) AS raw_score,
       |       CAST(raw AS DOUBLE) / CAST(raw + 1000 AS DOUBLE)
       |         AS model_score
       |FROM f""".stripMargin

  // ---- retrieval-quality telemetry (nDCG@k / MRR) ---------------------

  /** Fixed-point unit of the nDCG discounts and reciprocal ranks — the
    * repo's integer-sum discipline: per-rank quantities become exact
    * Longs, group sums are order-free, ONE double division at the end.
    */
  val ndcgScale = 1000000000L

  /** The rank-discount table 1/log2(r+1) for r = 1..k, in [[ndcgScale]]
    * units. Computed ONCE here and inlined as the SAME integer literals
    * into the Spark plan and the oracle SQL (the ShingleHashes
    * coefficient discipline), so no engine ever evaluates a logarithm
    * inside a compared value.
    */
  private[ext] val ndcgDiscFp: Seq[(Int, Long)] =
    (1 to TextOps.bm25TopK).map { r =>
      r -> (ndcgScale.toDouble * math.log(2.0) / math.log(r + 1.0)).toLong
    }

  /** RETRIEVAL-QUALITY TELEMETRY: nDCG@k and MRR for each of the three
    * text-retrieval rankings (bm25, rerank, rrf) — the text stack's
    * analogue of [[graft.ext.VectorOps.annRecall]]: rankers produce
    * lists, THIS measures them, per (system, lang).
    *
    * Relevance labels are deterministic and ranker-independent: a doc's
    * grade is the number of the lang's query terms it contains (the
    * bm25 query being the lang's two top-df tokens, grades are 0/1/2),
    * derived from the SAME tf/terms frames the bm25 chain builds — no
    * second tokenization to drift. Gains are the standard 2^rel − 1
    * (0/1/3), discounts the shared fixed-point table, the ideal list
    * (for the nDCG denominator) is the corpus-wide relevance ranking
    * truncated at k. MRR's reciprocal rank is an exact integer division
    * in [[ndcgScale]] units. All sums are Long sums; each output metric
    * is one final double division, bit-equal across engines.
    *
    * Scale shape: the three list frames are k-per-lang (bounded); the
    * only corpus-sized work is the shared bm25 chain itself and the
    * relevance agg (one keyed count off the already-built tf frame,
    * semi-joined to the broadcast 2-term query table). The ideal
    * ranking runs on the |relevant docs per lang| ≤ df(top terms)
    * subset via the TopKPerKey heap, never a global sort.
    */
  def retrievalEval(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val (bmTop0, terms, tf, dl) = TextOps.bm25Top(spark, sfDir)
    // three list builders consume the bm25 top (bm25 / rerank / rrf);
    // unpersisted, each would re-execute the whole ranking chain
    val bmTop = bmTop0.persist()
    bmTop.count() // EAGER: three consumers below
    val rel = tf
      .join(broadcast(terms.select("lang", "token")), Seq("lang", "token"))
      .groupBy("lang", "doc_id").agg(count(lit(1)).as("rel"))
      .persist()
    rel.count() // EAGER: list grading + ideal ranking
    val lists = bmTop
      .select(lit("bm25").as("system"), col("lang"),
        col("rank").cast("long").as("rank"), col("doc_id"))
      .unionByName(rerankTopFrom(spark, sfDir, bmTop)
        .select(lit("rerank").as("system"), col("lang"),
          col("rerank").cast("long").as("rank"), col("doc_id")))
      .unionByName(TextOps.rrfTopFrom(spark, sfDir, bmTop)
        .select(lit("rrf").as("system"), col("lang"),
          col("rank").cast("long").as("rank"), col("doc_id")))
    val disc = ndcgDiscFp.map { case (r, d) => (r.toLong, d) }
      .toDF("rank", "dfp")
    val gainFp = when(col("rel") === 2, 3L).when(col("rel") === 1, 1L)
      .otherwise(0L) * col("dfp")
    val agg = lists
      .join(rel, Seq("lang", "doc_id"), "left")
      .na.fill(0L, Seq("rel"))
      .join(broadcast(disc), Seq("rank"))
      .groupBy("system", "lang").agg(
        sum(gainFp).as("dcg_fp"),
        sum(when(col("rel") > 0, 1L).otherwise(0L)).as("n_graded"),
        min(when(col("rel") > 0, col("rank"))).as("fr"))
    val ideal = graft.plans.TopK.perKey(rel, Seq("lang"),
        Seq("rel" -> graft.plans.TopK.Desc,
          "doc_id" -> graft.plans.TopK.Asc),
        TextOps.bm25TopK, rankCol = Some("irank"))
      .join(broadcast(disc.withColumnRenamed("rank", "irank")),
        Seq("irank"))
      .groupBy("lang").agg(sum(gainFp).as("idcg_fp"))
    val out = agg.join(broadcast(ideal), Seq("lang"))
      .select(col("system"), col("lang"), col("n_graded"),
        coalesce(col("fr"), lit(0L)).as("first_rank"),
        (col("dcg_fp").cast("double") / col("idcg_fp").cast("double"))
          .as("ndcg"),
        (expr(s"CASE WHEN fr IS NULL THEN 0L ELSE $ndcgScale div fr END")
          .cast("double") / lit(ndcgScale.toDouble)).as("mrr"))
    Canon.materialized(Canon.canonicalize(out), rel, tf, dl, bmTop)
  }

  /** Composes the shared bm25/rerank/rrf CTE chains with the grading
    * arithmetic — integer gains × the inlined discount table, exact
    * BIGINT sums, one double division per metric.
    */
  def retrievalEvalOracle: String = {
    val discVals = ndcgDiscFp
      .map { case (r, d) => s"($r, CAST($d AS BIGINT))" }.mkString(", ")
    s"""WITH ${TextOps.bm25Cte},
       |$rerankCtes,
       |${TextOps.rrfCtes},
       |disc(rank, dfp) AS (VALUES $discVals),
       |rel AS MATERIALIZED (
       |  SELECT tf.lang, tf.doc_id, count(*) AS rel
       |  FROM tf JOIN terms
       |    ON tf.lang = terms.lang AND tf.token = terms.token
       |  GROUP BY 1, 2),
       |lists AS (
       |  SELECT 'bm25' AS system, lang, rank, doc_id FROM bmt
       |  UNION ALL
       |  SELECT 'rerank', lang, rerank, doc_id FROM reranked
       |  WHERE rerank <= ${TextOps.bm25TopK}
       |  UNION ALL
       |  SELECT 'rrf', lang, rank, doc_id FROM rranked
       |  WHERE rank <= ${TextOps.rrfTopK}),
       |wd AS (
       |  SELECT l.system, l.lang, l.rank,
       |         coalesce(r.rel, 0) AS rel, d.dfp
       |  FROM lists l
       |  LEFT JOIN rel r ON l.lang = r.lang AND l.doc_id = r.doc_id
       |  JOIN disc d ON l.rank = d.rank),
       |agg AS (
       |  SELECT system, lang,
       |         CAST(sum(CASE WHEN rel = 2 THEN 3 * dfp
       |                       WHEN rel = 1 THEN dfp ELSE 0 END)
       |           AS BIGINT) AS dcg_fp,
       |         CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END)
       |           AS BIGINT) AS n_graded,
       |         min(CASE WHEN rel > 0 THEN rank END) AS fr
       |  FROM wd GROUP BY 1, 2),
       |ideal AS (
       |  SELECT lang, rel,
       |         row_number() OVER (PARTITION BY lang
       |           ORDER BY rel DESC, doc_id ASC) AS irank
       |  FROM rel),
       |idcg AS (
       |  SELECT i.lang,
       |         CAST(sum(CASE WHEN rel = 2 THEN 3 * dfp ELSE dfp END)
       |           AS BIGINT) AS idcg_fp
       |  FROM ideal i JOIN disc d ON i.irank = d.rank
       |  GROUP BY 1)
       |SELECT a.system, a.lang, a.n_graded,
       |       CAST(coalesce(a.fr, 0) AS BIGINT) AS first_rank,
       |       CAST(a.dcg_fp AS DOUBLE) / CAST(c.idcg_fp AS DOUBLE)
       |         AS ndcg,
       |       CAST(CASE WHEN a.fr IS NULL THEN 0
       |                 ELSE $ndcgScale // a.fr END AS DOUBLE)
       |         / CAST($ndcgScale AS DOUBLE) AS mrr
       |FROM agg a JOIN idcg c ON a.lang = c.lang""".stripMargin
  }
  // ---- hybrid text + vector retrieval ---------------------------------

  /** HYBRID SEARCH — the modern RAG retrieval shape: a lexical arm
    * (the shared BM25 chain, [[graft.ext.TextOps.bm25Top]]) and a
    * dense arm fused by reciprocal-rank fusion. The dense arm's query
    * vector is the embedding of the lang's TOP BM25 document —
    * pseudo-relevance feedback ("more like the best lexical match"),
    * which keeps the query deterministic and engine-checkable while
    * exercising exactly the production join: doc_id-aligned embeddings
    * attached to the text corpus, cosine against a broadcast query,
    * per-lang top-k through the sort-free heap, RRF with the lexical
    * list. The query document itself is excluded from the dense arm
    * (cos(q,q)=1 tells nobody anything; the lexical arm still carries
    * it).
    *
    * Scale shape: the BM25 arm is the shared-tier postings chain; the
    * dense arm is ONE doc_id-keyed join (lang attach), a broadcast of
    * ≤ n_langs query vectors, a codegen'd cosine projection and a
    * bounded heap — the corpus embedding table is scanned once and
    * never shuffled. Fusion touches only the two top-k lists.
    */
  def hybridSearch(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ext.{TextOps, VectorOps}
    val (bmTop, _, tf, dl) = TextOps.bm25Top(spark, sfDir)
    val ev = VectorOps.embeddings(spark, sfDir)
      .select(col("vec_id").as("doc_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .join(TextOps.documents(spark, sfDir).select("doc_id", "lang"),
        Seq("doc_id"))
    val q1 = bmTop.filter(col("rank") === 1)
      .select(col("lang"), col("doc_id").as("q_doc"))
    val qv = ev.join(q1,
        ev("doc_id") === q1("q_doc") && ev("lang") === q1("lang"))
      .select(ev("lang"), col("v").as("qv"), col("q_doc"))
    val scored = ev.join(broadcast(qv), Seq("lang"))
      .filter(col("doc_id") =!= col("q_doc"))
      .withColumn("cos", VectorOps.cosine(col("qv"), col("v")))
    val vTop = graft.plans.TopK.perKey(
      scored.select("lang", "doc_id", "cos"), Seq("lang"),
      Seq("cos" -> graft.plans.TopK.Desc,
        "doc_id" -> graft.plans.TopK.Asc),
      TextOps.bm25TopK, rankCol = Some("vrank"))
    def rr(rank: Column): Column =
      coalesce(lit(1.0) /
        (lit(TextOps.rrfK).cast("double") + rank.cast("double")), lit(0.0))
    val fused = bmTop.select(col("lang"), col("doc_id"),
        col("rank").as("r_bm"))
      .join(vTop.select(col("lang"), col("doc_id"),
          col("vrank").as("r_v")),
        Seq("lang", "doc_id"), "full_outer")
      .withColumn("rrf", rr(col("r_bm")) + rr(col("r_v")))
    val top = graft.plans.TopK.perKey(
      fused.select("lang", "doc_id", "rrf"), Seq("lang"),
      Seq("rrf" -> graft.plans.TopK.Desc,
        "doc_id" -> graft.plans.TopK.Asc),
      TextOps.rrfTopK, rankCol = Some("rank"))
    Canon.materialized(
      Canon.canonicalize(top.select("lang", "rank", "doc_id", "rrf")),
      tf, dl)
  }

  /** The hybrid CTE chain (assumes bm25Cte ran; ends in `hr`) — shared
    * by [[hybridSearchOracle]] and the MMR oracle.
    */
  private def hybridCtes: String = {
    import graft.ext.{TextOps, VectorOps}
    s"""       |hev AS MATERIALIZED (
       |  SELECT d.lang, e.vec_id AS doc_id,
       |         list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
       |hq1 AS (SELECT lang, doc_id AS q_doc FROM bmtop WHERE rank = 1),
       |hqv AS (
       |  SELECT hev.lang, hev.v AS qv, hq1.q_doc
       |  FROM hev JOIN hq1 ON hev.lang = hq1.lang
       |                   AND hev.doc_id = hq1.q_doc),
       |hvs AS (
       |  SELECT hev.lang, hev.doc_id,
       |         ${VectorOps.cosSql("hqv.qv", "hev.v")} AS cos
       |  FROM hev JOIN hqv ON hev.lang = hqv.lang
       |  WHERE hev.doc_id <> hqv.q_doc),
       |hvr AS (
       |  SELECT *, row_number() OVER (PARTITION BY lang
       |            ORDER BY cos DESC, doc_id ASC) AS vrank
       |  FROM hvs),
       |hvt AS (SELECT lang, doc_id, vrank FROM hvr
       |        WHERE vrank <= ${TextOps.bm25TopK}),
       |hf AS (
       |  SELECT coalesce(b.lang, t.lang) AS lang,
       |         coalesce(b.doc_id, t.doc_id) AS doc_id,
       |         coalesce(1.0 / (CAST(${TextOps.rrfK} AS DOUBLE)
       |                         + CAST(b.rank AS DOUBLE)), 0.0)
       |           + coalesce(1.0 / (CAST(${TextOps.rrfK} AS DOUBLE)
       |                             + CAST(t.vrank AS DOUBLE)), 0.0) AS rrf
       |  FROM bmtop b FULL OUTER JOIN hvt t
       |    ON b.lang = t.lang AND b.doc_id = t.doc_id),
       |hr AS (
       |  SELECT *, row_number() OVER (PARTITION BY lang
       |            ORDER BY rrf DESC, doc_id ASC) AS rank
       |  FROM hf)""".stripMargin
  }

  val hybridSearchOracle: String =
    s"""WITH ${graft.ext.TextOps.bm25Cte},
       |$hybridCtes
       |SELECT lang, rank, doc_id, rrf FROM hr
       |WHERE rank <= ${graft.ext.TextOps.rrfTopK}""".stripMargin
  // ---- MMR diversification over the hybrid pool -----------------------

  /** MMR RERANK — maximal marginal relevance over the hybrid top-k
    * pool (Carbonell & Goldstein's greedy): pick
    * argmax 0.7·rel − 0.3·max_sim_to_selected each round, where rel is
    * the dense-arm cosine to the lang's query vector and the pairwise
    * similarities live inside the pool. Retrieval returns near-dups
    * together by construction; diversification is the standard last
    * step before a RAG context window, and it completes the stack
    * (bm25 → rerank → rrf → hybrid → MMR).
    *
    * Scale shape: relevances and the pairwise cosine table are ENGINE
    * work over the pool only (≤ k rows per lang; the corpus is never
    * touched beyond the hybrid chain that built the pool). The greedy
    * selection itself runs on the driver over that model-bounded table
    * (k·langs rows — the bounded-driver-sync discipline): MMR is
    * inherently sequential in k, and k is a UI-sized constant, so
    * distributing the loop would ship k rounds of barriers to save
    * kilobytes. The oracle unrolls the same k−1 rounds as CTEs (the
    * pageRank/BT discipline); driver and oracle share the identical
    * double expression 0.7·rel − 0.3·msim.
    */
  def mmrRerank(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import graft.ext.{TextOps, VectorOps}
    val pool = hybridSearch(spark, sfDir).select(col("lang"), col("doc_id"))
    val ev = VectorOps.embeddings(spark, sfDir)
      .select(col("vec_id").as("doc_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .join(TextOps.documents(spark, sfDir).select("doc_id", "lang"),
        Seq("doc_id"))
    val (bmTop, _, tf, dl) = TextOps.bm25Top(spark, sfDir)
    val q1 = bmTop.filter(col("rank") === 1)
      .select(col("lang"), col("doc_id").as("q_doc"))
    val qv = ev.join(q1,
        ev("doc_id") === q1("q_doc") && ev("lang") === q1("lang"))
      .select(ev("lang"), col("v").as("qv"))
    val prel = pool.join(ev, Seq("lang", "doc_id"))
      .join(broadcast(qv), Seq("lang"))
      .withColumn("rel", VectorOps.cosine(col("qv"), col("v")))
      .select("lang", "doc_id", "rel", "v").persist()
    val rels = prel.select("lang", "doc_id", "rel")
      .as[(String, Long, Double)].collect()
    val pairRows = prel.as("a").join(prel.as("b"),
        col("a.lang") === col("b.lang") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.lang"), col("a.doc_id").as("da"),
        col("b.doc_id").as("db"),
        VectorOps.cosine(col("a.v"), col("b.v")).as("cos"))
      .as[(String, Long, Long, Double)].collect()
    tf.unpersist(false); dl.unpersist(false); prel.unpersist(false)
    val sim = pairRows.flatMap(p =>
      Seq(((p._1, p._2, p._3), p._4), ((p._1, p._3, p._2), p._4))).toMap
    val out = rels.groupBy(_._1).toSeq.flatMap { case (lang, rs) =>
      val rel = rs.map(r => r._2 -> r._3).toMap
      var remaining = rs.map(_._2).toSet
      var selected = Vector.empty[Long]
      val picks =
        scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Double)]
      while (remaining.nonEmpty && selected.size < TextOps.rrfTopK) {
        val scoredC = remaining.toSeq.map { c =>
          val msim = if (selected.isEmpty) 0.0
            else selected.map(sid => sim((lang, c, sid))).max
          (c, 0.7 * rel(c) - 0.3 * msim)
        }
        val (pick, score) = scoredC.minBy { case (c, m) => (-m, c) }
        selected :+= pick
        remaining -= pick
        picks += ((lang, selected.size.toLong, pick, score))
      }
      picks
    }
    Canon.canonicalize(
      spark.createDataFrame(out).toDF("lang", "rank", "doc_id", "mmr"))
  }

  val mmrRerankOracle: String = {
    import graft.ext.{TextOps, VectorOps}
    val rounds = (1 until TextOps.rrfTopK).map { r =>
      s"""mcand$r AS (
         |  SELECT p.lang, p.doc_id, p.rel
         |  FROM mprel p LEFT JOIN msel${r - 1} s
         |    ON p.lang = s.lang AND p.doc_id = s.doc_id
         |  WHERE s.doc_id IS NULL),
         |mms$r AS (
         |  SELECT c.lang, c.doc_id, c.rel, max(pp.cos) AS msim
         |  FROM mcand$r c
         |  JOIN msel${r - 1} s ON s.lang = c.lang
         |  JOIN mpair pp ON pp.lang = c.lang
         |   AND ((pp.da = c.doc_id AND pp.db = s.doc_id)
         |     OR (pp.da = s.doc_id AND pp.db = c.doc_id))
         |  GROUP BY 1, 2, 3),
         |mpick$r AS (
         |  SELECT lang, doc_id, ${r + 1} AS rank,
         |         0.7 * rel - 0.3 * msim AS mmr
         |  FROM (SELECT *, row_number() OVER (PARTITION BY lang
         |          ORDER BY 0.7 * rel - 0.3 * msim DESC, doc_id ASC) AS rn
         |        FROM mms$r) WHERE rn = 1),
         |msel$r AS MATERIALIZED (
         |  SELECT lang, doc_id, rank, mmr FROM msel${r - 1}
         |  UNION ALL SELECT lang, doc_id, rank, mmr FROM mpick$r)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH ${TextOps.bm25Cte},
       |$hybridCtes,
       |mpool AS (
       |  SELECT lang, doc_id FROM hr WHERE rank <= ${TextOps.rrfTopK}),
       |mprel AS MATERIALIZED (
       |  SELECT p.lang, p.doc_id,
       |         ${VectorOps.cosSql("hqv.qv", "hev.v")} AS rel, hev.v
       |  FROM mpool p
       |  JOIN hev ON hev.lang = p.lang AND hev.doc_id = p.doc_id
       |  JOIN hqv ON hqv.lang = p.lang),
       |mpair AS MATERIALIZED (
       |  SELECT a.lang, a.doc_id AS da, b.doc_id AS db,
       |         ${VectorOps.cosSql("a.v", "b.v")} AS cos
       |  FROM mprel a JOIN mprel b
       |    ON a.lang = b.lang AND a.doc_id < b.doc_id),
       |msel0 AS MATERIALIZED (
       |  SELECT lang, doc_id, 1 AS rank, 0.7 * rel - 0.3 * 0.0 AS mmr
       |  FROM (SELECT *, row_number() OVER (PARTITION BY lang
       |          ORDER BY 0.7 * rel - 0.3 * 0.0 DESC, doc_id ASC) AS rn
       |        FROM mprel) WHERE rn = 1),
       |$rounds
       |SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id, mmr
       |FROM msel${TextOps.rrfTopK - 1}""".stripMargin
  }
}
