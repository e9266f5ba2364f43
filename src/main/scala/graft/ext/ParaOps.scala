package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Canon

/** Paragraph-granular exact dedup with GLOBAL KEEP-FIRST semantics —
  * the FineWeb/MassiveText paragraph-dedup recipe: every distinct
  * paragraph keeps exactly its first occurrence in corpus order
  * (doc_id, then position inside the doc) and loses every later copy,
  * no matter how few copies exist.
  *
  * This is deliberately NOT [[CurationOps.lineBoilerplate]]: the
  * boilerplate detector is a frequency-threshold filter (a line must
  * repeat in more than half a source's docs, and then ALL its copies
  * are removed); keep-first is global, threshold-free, and keeps one
  * canonical copy — a paragraph quoted twice anywhere in the corpus
  * already loses its second occurrence, while the canonical first stays.
  * The two passes answer different curation questions (site chrome vs
  * corpus-wide redundancy) and published pipelines run both.
  *
  * The fixture corpus is single-line prose, so the query SEEDS the
  * paragraph structure deterministically (the [[CurationOps]] seeding
  * pattern): each doc splits into two halves, and every doc with
  * doc_id % 4 == 1 carries [[paraQuote]] BETWEEN them — a corpus-wide
  * repeated paragraph whose keeper must be the lowest (doc_id, pos)
  * occurrence. The fixture's own shared half-paragraphs (its seeded
  * near-dup families) exercise the 2-copy case the boilerplate
  * threshold is blind to.
  *
  * Scale shape: one posexplode to (doc, pos, paragraph) — linear in
  * corpus paragraphs — keyed by the paragraph's SHA-256 so the
  * exchange key is fixed-width regardless of paragraph length; ONE
  * sha-keyed aggregation (map-side combine) finds each group's
  * min-ordinal keeper and copy count; apply is a sha-keyed hash join
  * back plus one doc_id-keyed reassembly. Three bounded-width hash
  * exchanges total, no all-pairs work, no global sort: the keeper
  * choice is an ORDINAL MIN (doc_id * [[paraOrdBase]] + pos), an
  * order-independent aggregate, not a window over corpus order.
  */
object ParaOps {

  import TextOps.documents

  /** Seeded corpus-wide repeated paragraph (docs with doc_id % 4 == 1). */
  val paraQuote =
    "if you are reading this the page was copied from somewhere else"

  /** Ordinal base: strictly more than the max paragraphs a doc can have
    * by construction (halves + quote = 3), so doc_id * base + pos is a
    * collision-free total order over (doc_id, pos) in one BIGINT.
    */
  val paraOrdBase = 4L

  /** The seeded (doc_id, paras) frame shared by detect and apply —
    * documents as PARAGRAPH ARRAYS: [half1, quote?, half2] with
    * empties dropped (a 0/1-token doc contributes no empty paragraph).
    */
  private[ext] def seededParagraphs(spark: SparkSession, sfDir: String)
      : DataFrame =
    documents(spark, sfDir)
      .select(col("doc_id"), CurationOps.toksCol.as("toks"))
      .withColumn("half", floor(size(col("toks")) / 2).cast("int"))
      .withColumn("p1",
        array_join(slice(col("toks"), lit(1), col("half")), " "))
      .withColumn("p2",
        array_join(slice(col("toks"), col("half") + 1,
          size(col("toks")) - col("half")), " "))
      .withColumn("paras0",
        when(col("doc_id") % 4 === 1,
          array(col("p1"), lit(paraQuote), col("p2")))
          .otherwise(array(col("p1"), col("p2"))))
      .select(col("doc_id"),
        filter(col("paras0"), p => p =!= "").as("paras"))

  /** Exploded (doc_id, pos, para, sha, ord) stream — the working set of
    * both queries. `ord` is the corpus total order in one BIGINT.
    */
  private def paraStream(spark: SparkSession, sfDir: String): DataFrame =
    seededParagraphs(spark, sfDir)
      .select(col("doc_id"), posexplode(col("paras")).as(Seq("pos", "para")))
      .withColumn("sha", sha2(col("para"), 256))
      .withColumn("ord",
        col("doc_id").cast("long") * paraOrdBase + col("pos"))

  /** Per-sha keeper table: min ordinal, copy count, and the paragraph
    * text (constant within a sha group; min() is a deterministic pick).
    */
  private def keepers(spark: SparkSession, sfDir: String): DataFrame =
    paraStream(spark, sfDir).groupBy("sha").agg(
      min("ord").as("keep_ord"),
      count(lit(1)).as("n_copies"),
      min("para").as("para"))

  /** Detection report: every paragraph with more than one occurrence,
    * its keeper (first occurrence in corpus order) and its copy count —
    * the keep-first ledger the apply pass executes.
    */
  def paragraphDedup(spark: SparkSession, sfDir: String): DataFrame =
    Canon.canonicalize(keepers(spark, sfDir)
      .filter(col("n_copies") > 1)
      .select(col("para"), col("n_copies"),
        expr(s"keep_ord div $paraOrdBase").as("keep_doc_id"),
        expr(s"keep_ord % $paraOrdBase").as("keep_pos")))

  /** The seeding + explode + keeper CTE chain (pex → pkeep), the SQL
    * twin of [[paraStream]] + [[keepers]].
    */
  private def paraCtes: String =
    s"""pt AS (
       |  SELECT doc_id, ${CurationOps.toksSql} AS t FROM documents),
       |pp AS (
       |  SELECT doc_id,
       |         array_to_string(t[1:(len(t) // 2)], ' ') AS p1,
       |         array_to_string(t[(len(t) // 2) + 1:len(t)], ' ') AS p2
       |  FROM pt),
       |plist AS (
       |  SELECT doc_id,
       |         list_filter(
       |           CASE WHEN doc_id % 4 = 1
       |                THEN [p1, '$paraQuote', p2]
       |                ELSE [p1, p2] END,
       |           p -> p <> '') AS paras
       |  FROM pp),
       |pex AS MATERIALIZED (
       |  SELECT doc_id, i - 1 AS pos, paras[i] AS para,
       |         sha256(paras[i]) AS sha,
       |         doc_id * $paraOrdBase + (i - 1) AS ord
       |  FROM plist, unnest(range(1, len(paras) + 1)) AS r(i)),
       |pkeep AS MATERIALIZED (
       |  SELECT sha, min(ord) AS keep_ord, count(*) AS n_copies,
       |         min(para) AS para
       |  FROM pex GROUP BY 1)""".stripMargin

  val paragraphDedupOracle: String =
    s"""WITH $paraCtes
       |SELECT para, CAST(n_copies AS BIGINT) AS n_copies,
       |       CAST(keep_ord // $paraOrdBase AS BIGINT) AS keep_doc_id,
       |       CAST(keep_ord % $paraOrdBase AS BIGINT) AS keep_pos
       |FROM pkeep WHERE n_copies > 1""".stripMargin

  /** Apply pass — detect → REWRITE closed: each doc keeps exactly the
    * paragraphs whose ordinal is its group's keeper, reassembled in
    * original position order; later copies vanish, the first copy and
    * every unique paragraph pass through byte-stable.
    */
  def paragraphDedupApply(spark: SparkSession, sfDir: String): DataFrame = {
    val flagged = paraStream(spark, sfDir)
      .join(keepers(spark, sfDir).select("sha", "keep_ord"), Seq("sha"))
      .withColumn("kept", col("ord") === col("keep_ord"))
    Canon.canonicalize(flagged.groupBy("doc_id").agg(
      array_join(
        transform(
          filter(
            sort_array(collect_list(
              struct(col("pos"), col("para"), col("kept")))),
            s => s.getField("kept")),
          s => s.getField("para")),
        "\n").as("cleaned"),
      count(lit(1)).as("n_paras"),
      sum(when(col("kept"), 0L).otherwise(1L)).as("n_removed")))
  }

  val paragraphDedupApplyOracle: String =
    s"""WITH $paraCtes,
       |sel AS (
       |  SELECT p.doc_id, p.pos, p.para,
       |         (p.ord = k.keep_ord) AS kept
       |  FROM pex p JOIN pkeep k USING (sha))
       |SELECT doc_id,
       |       -- coalesce at STRING level: DuckDB's array_to_string is
       |       -- NULL for an empty list where Spark's array_join is ''
       |       coalesce(array_to_string(
       |         list(para ORDER BY pos) FILTER (WHERE kept),
       |         chr(10)), '') AS cleaned,
       |       CAST(count(*) AS BIGINT) AS n_paras,
       |       CAST(count(*) FILTER (WHERE NOT kept) AS BIGINT)
       |         AS n_removed
       |FROM sel GROUP BY 1""".stripMargin
}
