package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Canon
import graft.plans.TopK

/** Margin-based bitext mining — the published parallel-corpus recipe
  * (Artetxe & Schwenk's ratio margin; the CCMatrix/LASER construction):
  * a translation pair is not "a high cosine" but "a cosine that stands
  * OUT from both endpoints' neighborhoods" — absolute thresholds fail
  * because cosine scales drift per language and per register, while the
  * ratio margin self-normalizes.
  *
  *   margin(x, y) = cos(x, y) / (½·meanₖNN(x) + ½·meanₖNN(y))
  *
  * Engine shape at 100 TB: both sides are corpus-sized (every non-en doc
  * is a source, every en doc a target), so nothing broadcasts — the
  * corpus is sketched ONCE with the codegen'd sign-LSH
  * ([[graft.functions.HyperplaneBuckets]]) and candidates come from a
  * (band, bucket)-keyed shuffle join, the [[VectorOps.embedLsh]] shape.
  * The kNN neighborhoods are computed over the RETRIEVED candidates
  * (bounded heaps, no sort), exactly as production miners take
  * neighborhoods from their ANN index's result lists rather than from an
  * exact scan. Work is candidate-bounded end to end; the |src|×|tgt|
  * cross product never materializes.
  *
  * Numeric contract (the gopherRules fixed-point discipline): cosines
  * quantize to `floor(cos·10¹²)` BIGINT immediately, neighborhood sums
  * and the margin test are EXACT integer arithmetic (sums of ≤k
  * quantized cosines are order-independent where double sums are not),
  * and IEEE doubles appear only in the two output ratios. The threshold
  * margin ≥ 21/20 is the integer predicate 20·num ≥ 21·den. Only
  * positive-cosine candidates participate: a negative-similarity
  * neighbor carries no mining signal, and admitting one would let a
  * negative denominator flip the ratio's sense.
  */
object BitextOps {

  /** Neighborhood size k of the margin denominator. */
  val bitextNNk = 4

  /** Margin acceptance threshold as an exact rational: 21/20 = 1.05. */
  val bitextMarginNum = 21L
  val bitextMarginDen = 20L

  /** Fixed-point scale for quantized cosines. */
  val bitextCosScale = 1000000000000L // 1e12

  /** The mining target language; every other lang is a source. */
  val bitextTgtLang = "en"

  /** For each non-`en` source document, the single best `en` target by
    * ratio margin (margin DESC, tgt ASC), kept only when
    * margin ≥ 21/20. Columns: src_id, tgt_id, lang (source language),
    * cos (raw double cosine), margin (the num/den ratio as one final
    * double division).
    */
  def bitextMine(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = TextOps.documents(spark, sfDir)
      .select(col("doc_id").as("vec_id"), col("lang"))
    val e = VectorOps.embeddings(spark, sfDir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .join(docs, Seq("vec_id"))
      .persist() // sketch pass + two vector attaches
    val banded = VectorOps.capSignBuckets(
      e.select(col("vec_id"), col("lang"),
        posexplode(graft.functions.HyperplaneBuckets(col("v")))
          .as(Seq("band", "bucket"))))
      .persist() // source and target candidate sides
    val cand = banded.filter(col("lang") =!= bitextTgtLang).as("s")
      .join(banded.filter(col("lang") === bitextTgtLang).as("t"),
        col("s.band") === col("t.band") &&
          col("s.bucket") === col("t.bucket"))
      .select(col("s.vec_id").as("src_id"), col("s.lang").as("lang"),
        col("t.vec_id").as("tgt_id"))
      .distinct() // a pair may collide in several bands
    val scored = cand
      .join(e.select(col("vec_id").as("src_id"), col("v").as("sv")),
        Seq("src_id"))
      .join(e.select(col("vec_id").as("tgt_id"), col("v").as("tv")),
        Seq("tgt_id"))
      .withColumn("cos", VectorOps.cosine(col("sv"), col("tv")))
      .withColumn("cq", floor(col("cos") * bitextCosScale))
      .filter(col("cq") > 0L)
      .select("src_id", "tgt_id", "lang", "cos", "cq")
      .persist() // fwd kNN, rev kNN, and the pair test itself
    def knnStats(key: String, other: String): DataFrame =
      TopK.perKey(scored.select(key, other, "cq"), Seq(key),
          Seq("cq" -> TopK.Desc, other -> TopK.Asc), bitextNNk)
        .groupBy(key)
        .agg(sum("cq").as(s"${key}_sum"),
          count(lit(1)).as(s"${key}_n"))
    val pairs = scored
      .join(knnStats("src_id", "tgt_id"), Seq("src_id"))
      .join(knnStats("tgt_id", "src_id"), Seq("tgt_id"))
      .withColumn("num",
        lit(2L) * col("cq") * col("src_id_n") * col("tgt_id_n"))
      .withColumn("den",
        col("src_id_sum") * col("tgt_id_n") +
          col("tgt_id_sum") * col("src_id_n"))
      .filter(col("num") * bitextMarginDen >= col("den") * bitextMarginNum)
      .withColumn("margin",
        col("num").cast("double") / col("den").cast("double"))
    val best = TopK.perKey(
      pairs.select("src_id", "tgt_id", "lang", "cos", "margin"),
      Seq("src_id"), Seq("margin" -> TopK.Desc, "tgt_id" -> TopK.Asc), 1)
    Canon.materialized(
      Canon.canonicalize(
        best.select("src_id", "tgt_id", "lang", "cos", "margin")),
      e, banded, scored)
  }

  /** Twin-arithmetic oracle: identical hyperplane bits, banding,
    * cross-lingual candidate join, fixed-point quantization,
    * rank-bounded integer neighborhood sums, integer margin test, and
    * rank-1 selection.
    */
  val bitextMineOracle: String = {
    import graft.functions.{HyperplaneBuckets => HB}
    s"""WITH e AS (
       |  SELECT d.doc_id AS vec_id, d.lang,
       |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings em JOIN documents d ON em.vec_id = d.doc_id),
       |bits AS (
       |  SELECT vec_id, lang, j,
       |         CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |           list_transform(range(0, len(v)), i ->
       |             v[CAST(i AS INT) + 1] *
       |             (CAST((${HB.A} * (j * len(v) + i + 1) + ${HB.B})
       |                   % ${HB.P} AS DOUBLE) / ${HB.P} - 0.5))),
       |           (acc, x) -> acc + x) >= 0 THEN 1 ELSE 0 END AS bit
       |  FROM e, UNNEST(range(0, ${HB.numBits})) AS t(j)),
       |bk AS (
       |  SELECT vec_id, lang, j // ${HB.bitsPerBand} AS band,
       |         sum(bit << CAST(j % ${HB.bitsPerBand} AS INT)) AS bucket
       |  FROM bits GROUP BY 1, 2, 3),
       |keptb AS (
       |  SELECT bk.* FROM bk JOIN ${VectorOps.capSignSql("bk")} kc
       |    ON bk.band = kc.band AND bk.bucket = kc.bucket),
       |cand AS (
       |  SELECT DISTINCT s.vec_id AS src_id, s.lang, t.vec_id AS tgt_id
       |  FROM keptb s JOIN keptb t
       |    ON s.band = t.band AND s.bucket = t.bucket
       |  WHERE s.lang <> '$bitextTgtLang' AND t.lang = '$bitextTgtLang'),
       |scored AS (
       |  SELECT src_id, tgt_id, lang, cos,
       |         CAST(floor(cos * $bitextCosScale) AS BIGINT) AS cq
       |  FROM (
       |    SELECT c.src_id, c.tgt_id, c.lang,
       |           ${VectorOps.cosSql("es.v", "et.v")} AS cos
       |    FROM cand c JOIN e es ON c.src_id = es.vec_id
       |                JOIN e et ON c.tgt_id = et.vec_id)
       |  WHERE CAST(floor(cos * $bitextCosScale) AS BIGINT) > 0),
       |fwd AS (
       |  SELECT src_id, sum(cq) AS src_sum, count(*) AS src_n FROM (
       |    SELECT src_id, cq, row_number() OVER (PARTITION BY src_id
       |           ORDER BY cq DESC, tgt_id ASC) AS r FROM scored)
       |  WHERE r <= $bitextNNk GROUP BY src_id),
       |rev AS (
       |  SELECT tgt_id, sum(cq) AS tgt_sum, count(*) AS tgt_n FROM (
       |    SELECT tgt_id, cq, row_number() OVER (PARTITION BY tgt_id
       |           ORDER BY cq DESC, src_id ASC) AS r FROM scored)
       |  WHERE r <= $bitextNNk GROUP BY tgt_id),
       |m AS (
       |  SELECT s.src_id, s.tgt_id, s.lang, s.cos,
       |         2 * s.cq * f.src_n * v.tgt_n AS num,
       |         f.src_sum * v.tgt_n + v.tgt_sum * f.src_n AS den
       |  FROM scored s JOIN fwd f ON s.src_id = f.src_id
       |                JOIN rev v ON s.tgt_id = v.tgt_id
       |  WHERE 2 * s.cq * f.src_n * v.tgt_n * $bitextMarginDen >=
       |        (f.src_sum * v.tgt_n + v.tgt_sum * f.src_n) *
       |          $bitextMarginNum),
       |ranked AS (
       |  SELECT src_id, tgt_id, lang, cos,
       |         CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS margin,
       |         row_number() OVER (PARTITION BY src_id
       |           ORDER BY CAST(num AS DOUBLE) / CAST(den AS DOUBLE) DESC,
       |                    tgt_id ASC) AS rank
       |  FROM m)
       |SELECT src_id, tgt_id, lang, cos, margin
       |FROM ranked WHERE rank = 1""".stripMargin
  }
}
