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
    val (best, scored) = mineFrom(cand, e.select("vec_id", "v"))
    Canon.materialized(Canon.canonicalize(best), e, banded, scored)
  }

  /** The margin pipeline downstream of candidate generation — the seam
    * [[bitextRecall]] reuses so the exact and LSH arms share IDENTICAL
    * scoring/kNN/margin/rank-1 machinery: `cand` is (src_id, tgt_id,
    * lang), `e` is (vec_id, v). Returns (mined pairs, the persisted
    * scored frame for the caller to hand to Canon.materialized).
    * Neighborhoods are computed over the SUPPLIED candidates — give it
    * a cross product and the margins are exact; give it retrieved
    * candidates and they are the production approximation.
    */
  private[ext] def mineFrom(cand: DataFrame, e: DataFrame)
      : (DataFrame, DataFrame) = {
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
    (best.select("src_id", "tgt_id", "lang", "cos", "margin"), scored)
  }

  /** CTE chain for the margin pipeline over candidates `$candCte`
    * (src_id, lang, tgt_id) and vectors `$eCte` (vec_id, v), every CTE
    * prefixed `$p` — instantiated once by [[bitextMineOracle]] and
    * twice (exact / LSH arm) by [[bitextRecallOracle]]. Ends at
    * `${p}mined` (src_id, tgt_id, lang, cos, margin).
    */
  private def marginSql(p: String, candCte: String, eCte: String): String =
    s"""${p}scored AS MATERIALIZED (
       |  SELECT src_id, tgt_id, lang, cos,
       |         CAST(floor(cos * $bitextCosScale) AS BIGINT) AS cq
       |  FROM (
       |    SELECT c.src_id, c.tgt_id, c.lang,
       |           ${VectorOps.cosSql("es.v", "et.v")} AS cos
       |    FROM $candCte c JOIN $eCte es ON c.src_id = es.vec_id
       |                JOIN $eCte et ON c.tgt_id = et.vec_id)
       |  WHERE CAST(floor(cos * $bitextCosScale) AS BIGINT) > 0),
       |${p}fwd AS (
       |  SELECT src_id, sum(cq) AS src_sum, count(*) AS src_n FROM (
       |    SELECT src_id, cq, row_number() OVER (PARTITION BY src_id
       |           ORDER BY cq DESC, tgt_id ASC) AS r FROM ${p}scored)
       |  WHERE r <= $bitextNNk GROUP BY src_id),
       |${p}rev AS (
       |  SELECT tgt_id, sum(cq) AS tgt_sum, count(*) AS tgt_n FROM (
       |    SELECT tgt_id, cq, row_number() OVER (PARTITION BY tgt_id
       |           ORDER BY cq DESC, src_id ASC) AS r FROM ${p}scored)
       |  WHERE r <= $bitextNNk GROUP BY tgt_id),
       |${p}m AS (
       |  SELECT s.src_id, s.tgt_id, s.lang, s.cos,
       |         2 * s.cq * f.src_n * v.tgt_n AS num,
       |         f.src_sum * v.tgt_n + v.tgt_sum * f.src_n AS den
       |  FROM ${p}scored s JOIN ${p}fwd f ON s.src_id = f.src_id
       |                JOIN ${p}rev v ON s.tgt_id = v.tgt_id
       |  WHERE 2 * s.cq * f.src_n * v.tgt_n * $bitextMarginDen >=
       |        (f.src_sum * v.tgt_n + v.tgt_sum * f.src_n) *
       |          $bitextMarginNum),
       |${p}mined AS MATERIALIZED (
       |  SELECT src_id, tgt_id, lang, cos, margin FROM (
       |    SELECT src_id, tgt_id, lang, cos,
       |           CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS margin,
       |           row_number() OVER (PARTITION BY src_id
       |             ORDER BY CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
       |                        DESC,
       |                      tgt_id ASC) AS rank
       |    FROM ${p}m)
       |  WHERE rank = 1)""".stripMargin

  /** Hyperplane-bit + banding CTEs over `$eCte` (vec_id, lang, v),
    * prefixed `$p`, ending at `${p}bk` (vec_id, lang, band, bucket). */
  private def bandSql(p: String, eCte: String): String = {
    import graft.functions.{HyperplaneBuckets => HB}
    s"""${p}bits AS (
       |  SELECT vec_id, lang, j,
       |         CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |           list_transform(range(0, len(v)), i ->
       |             v[CAST(i AS INT) + 1] *
       |             (CAST((${HB.A} * (j * len(v) + i + 1) + ${HB.B})
       |                   % ${HB.P} AS DOUBLE) / ${HB.P} - 0.5))),
       |           (acc, x) -> acc + x) >= 0 THEN 1 ELSE 0 END AS bit
       |  FROM $eCte, UNNEST(range(0, ${HB.numBits})) AS t(j)),
       |${p}bk AS (
       |  SELECT vec_id, lang, j // ${HB.bitsPerBand} AS band,
       |         sum(bit << CAST(j % ${HB.bitsPerBand} AS INT)) AS bucket
       |  FROM ${p}bits GROUP BY 1, 2, 3)""".stripMargin
  }

  /** Twin-arithmetic oracle: identical hyperplane bits, banding,
    * cross-lingual candidate join, fixed-point quantization,
    * rank-bounded integer neighborhood sums, integer margin test, and
    * rank-1 selection.
    */
  val bitextMineOracle: String =
    s"""WITH e AS (
       |  SELECT d.doc_id AS vec_id, d.lang,
       |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings em JOIN documents d ON em.vec_id = d.doc_id),
       |${bandSql("", "e")},
       |keptb AS (
       |  SELECT bk.* FROM bk JOIN ${VectorOps.capSignSql("bk")} kc
       |    ON bk.band = kc.band AND bk.bucket = kc.bucket),
       |cand AS (
       |  SELECT DISTINCT s.vec_id AS src_id, s.lang, t.vec_id AS tgt_id
       |  FROM keptb s JOIN keptb t
       |    ON s.band = t.band AND s.bucket = t.bucket
       |  WHERE s.lang <> '$bitextTgtLang' AND t.lang = '$bitextTgtLang'),
       |${marginSql("", "cand", "e")}
       |SELECT src_id, tgt_id, lang, cos, margin FROM mined""".stripMargin

  /** Sample width PER SIDE for [[bitextRecall]] — 150 sources × 150
    * targets keeps the exact arm at 22.5k cosines (constant at any
    * corpus size) while both sides stay fully populated at all 3 SFs
    * (≥193 `en` and ≥282 non-`en` embedded docs everywhere).
    */
  val bitextRecallSample = 150

  /** MINING QUALITY TELEMETRY — the recall row [[bitextMine]] was
    * missing (every LSH family carries one; §8.51 backlog item 1):
    * over a bounded deterministic hash-order sample of
    * [[bitextRecallSample]] sources × [[bitextRecallSample]] targets,
    * mine twice through the IDENTICAL margin machinery
    * ([[mineFrom]]) — once with the exact cross product as the
    * candidate set (true margins within the sampled universe), once
    * with sign-LSH-retrieved candidates (the production
    * approximation, where BOTH the candidate set and the kNN
    * denominators are retrieval-truncated). One output row:
    * n_exact / n_lsh / n_common / recall (1.0 when the exact arm
    * mines nothing).
    *
    * Engine shape: both arms are sample-bounded — the exact arm is
    * O(sample²) cosines, constant in corpus size; the corpus is
    * touched only by the two hash-order `orderBy…limit` sample scans.
    * The LSH arm deliberately omits the mega-bucket cap: a bucket
    * cell over a ≤150-row side can never reach
    * [[VectorOps.signBucketCap]] = 512, so the cap is structurally
    * inert here and including it would only widen the oracle.
    */
  def bitextRecall(spark: SparkSession, sfDir: String): DataFrame =
    bitextRecallFrom(spark, sfDir, multiProbe = false)

  /** The multi-probe recall row — same sample, same exact arm: the
    * realized mining-agreement lift when each SOURCE (vec, band)
    * probes its 8 Hamming-1 neighbor buckets beside the exact one
    * (the [[VectorOps.embedLshMultiProbe]] lever pointed at mining —
    * richer retrieved neighborhoods mean both more candidates AND
    * less margin-denominator truncation).
    */
  def bitextRecallMultiProbe(spark: SparkSession, sfDir: String)
      : DataFrame =
    bitextRecallFrom(spark, sfDir, multiProbe = true)

  private def bitextRecallFrom(spark: SparkSession, sfDir: String,
                               multiProbe: Boolean): DataFrame = {
    import graft.ext.SampleOps.{A, B, P}
    val docs = TextOps.documents(spark, sfDir)
      .select(col("doc_id").as("vec_id"), col("lang"))
    val keyed = VectorOps.embeddings(spark, sfDir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .join(docs, Seq("vec_id"))
      .withColumn("h", ((col("vec_id") % P) * A + B) % P)
    def side(pred: Column): DataFrame =
      keyed.filter(pred).orderBy(col("h").asc, col("vec_id").asc)
        .limit(bitextRecallSample).select("vec_id", "lang", "v")
    val src = side(col("lang") =!= bitextTgtLang).persist()
    val tgt = side(col("lang") === bitextTgtLang).persist()
    val su = src.unionByName(tgt).persist() // LSH sketch + vector attach
    val e = su.select("vec_id", "v")
    val exactCand = src.select(col("vec_id").as("src_id"), col("lang"))
      .crossJoin(tgt.select(col("vec_id").as("tgt_id")))
    val banded = su.select(col("vec_id"), col("lang"),
      posexplode(graft.functions.HyperplaneBuckets(col("v")))
        .as(Seq("band", "bucket")))
    val srcBanded = {
      val exactSide = banded.filter(col("lang") =!= bitextTgtLang)
      if (!multiProbe) exactSide
      else {
        import graft.functions.{HyperplaneBuckets => HB}
        val probeKeys = col("bucket") +: (0 until HB.bitsPerBand)
          .map(b => col("bucket").bitwiseXOR(lit(1 << b)))
        exactSide.select(col("vec_id"), col("lang"), col("band"),
          explode(array(probeKeys: _*)).as("bucket"))
      }
    }
    val lshCand = srcBanded.as("s")
      .join(banded.filter(col("lang") === bitextTgtLang).as("t"),
        col("s.band") === col("t.band") &&
          col("s.bucket") === col("t.bucket"))
      .select(col("s.vec_id").as("src_id"), col("s.lang").as("lang"),
        col("t.vec_id").as("tgt_id"))
      .distinct()
    val (exBest, exScored) = mineFrom(exactCand, e)
    val (lsBest, lsScored) = mineFrom(lshCand, e)
    val ex = exBest.select("src_id", "tgt_id").persist()
    val ls = lsBest.select("src_id", "tgt_id").persist()
    val out = ex.agg(count(lit(1)).as("n_exact"))
      .crossJoin(ls.agg(count(lit(1)).as("n_lsh")))
      .crossJoin(ex.join(ls, Seq("src_id", "tgt_id"))
        .agg(count(lit(1)).as("n_common")))
      .select(col("n_exact"), col("n_lsh"), col("n_common"),
        when(col("n_exact") > 0,
          col("n_common").cast("double") / col("n_exact").cast("double"))
          .otherwise(lit(1.0)).as("recall"))
    Canon.materialized(Canon.canonicalize(out),
      src, tgt, su, exScored, lsScored, ex, ls)
  }

  val bitextRecallOracle: String = recallOracleSql(multiProbe = false)
  val bitextRecallMultiProbeOracle: String =
    recallOracleSql(multiProbe = true)

  private def recallOracleSql(multiProbe: Boolean): String = {
    import graft.ext.SampleOps.{A, B, P}
    import graft.functions.{HyperplaneBuckets => HB}
    val srcCte =
      if (!multiProbe) s"SELECT * FROM sbk WHERE lang <> '$bitextTgtLang'"
      else
        s"""SELECT vec_id, lang, band,
           |         CASE WHEN k = 0 THEN bucket
           |              ELSE xor(bucket, 1 << CAST(k - 1 AS INT)) END
           |           AS bucket
           |  FROM sbk, range(0, ${HB.bitsPerBand + 1}) t(k)
           |  WHERE lang <> '$bitextTgtLang'""".stripMargin
    s"""WITH de AS (
       |  SELECT d.doc_id AS vec_id, d.lang,
       |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
       |         ((d.doc_id % $P) * $A + $B) % $P AS h
       |  FROM embeddings em JOIN documents d ON em.vec_id = d.doc_id),
       |bsrc AS MATERIALIZED (
       |  SELECT vec_id, lang, v FROM de WHERE lang <> '$bitextTgtLang'
       |  ORDER BY h ASC, vec_id ASC LIMIT $bitextRecallSample),
       |btgt AS MATERIALIZED (
       |  SELECT vec_id, lang, v FROM de WHERE lang = '$bitextTgtLang'
       |  ORDER BY h ASC, vec_id ASC LIMIT $bitextRecallSample),
       |su AS MATERIALIZED (
       |  SELECT vec_id, lang, v FROM bsrc
       |  UNION ALL SELECT vec_id, lang, v FROM btgt),
       |xcand AS (
       |  SELECT s.vec_id AS src_id, s.lang, t.vec_id AS tgt_id
       |  FROM bsrc s, btgt t),
       |${bandSql("s", "su")},
       |sprobe AS ($srcCte),
       |lcand AS (
       |  SELECT DISTINCT s.vec_id AS src_id, s.lang, t.vec_id AS tgt_id
       |  FROM sprobe s JOIN sbk t
       |    ON s.band = t.band AND s.bucket = t.bucket
       |  WHERE t.lang = '$bitextTgtLang'),
       |${marginSql("x", "xcand", "su")},
       |${marginSql("l", "lcand", "su")}
       |SELECT
       |  (SELECT count(*) FROM xmined) AS n_exact,
       |  (SELECT count(*) FROM lmined) AS n_lsh,
       |  (SELECT count(*) FROM xmined JOIN lmined
       |     USING (src_id, tgt_id)) AS n_common,
       |  CASE WHEN (SELECT count(*) FROM xmined) > 0
       |    THEN CAST((SELECT count(*) FROM xmined JOIN lmined
       |               USING (src_id, tgt_id)) AS DOUBLE)
       |           / CAST((SELECT count(*) FROM xmined) AS DOUBLE)
       |    ELSE 1.0 END AS recall""".stripMargin
  }
}
