package graft.ext

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
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
    import spark.implicits._
    val top = TextOps.bm25(spark, sfDir)
      .select(col("lang"), col("doc_id"), col("rank").as("bm25_rank"))
    val withText = top.join(
      TextOps.documents(spark, sfDir).select("doc_id", "text"),
      Seq("doc_id"))
    val scored = batchScore(
      withText.select(col("doc_id"), col("text")).as[(Long, String)],
      QualityStub).toDF("doc_id", "raw_score", "model_score")
    val joined = withText.select("lang", "doc_id", "bm25_rank")
      .join(scored.select("doc_id", "model_score"), Seq("doc_id"))
    Canon.canonicalize(graft.plans.TopK.perKey(joined,
      Seq("lang"),
      Seq("model_score" -> graft.plans.TopK.Desc,
        "doc_id" -> graft.plans.TopK.Asc),
      TextOps.bm25TopK, rankCol = Some("rerank"))
      .select("lang", "rerank", "doc_id", "bm25_rank", "model_score"))
  }

  /** Composes the SHARED bm25 chain with the stub-model arithmetic
    * restricted to the shortlist — neither side duplicated.
    */
  def rerankOracle: String =
    s"""WITH ${TextOps.bm25Cte},
       |bmt AS MATERIALIZED (SELECT * FROM bmtop),
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
       |  FROM rr)
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
}
