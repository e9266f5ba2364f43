package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Canon

/** PREFERENCE-DATA curation — the reward-model side of a training-data
  * pipeline. RLHF/DPO corpora are (chosen, rejected) document pairs, and
  * before any reward model trains on them the standard cleaning passes
  * are: (1) multi-annotator AGREEMENT — drop pairs the annotators
  * disagree on; (2) the LENGTH-BIAS audit — if "chosen" is longer than
  * "rejected" in most pairs, the reward model will learn length, not
  * quality (the classic verbosity failure of RLHF reward models).
  *
  * The engine's two in-built scorers stand in for annotators — quality
  * (TextOps.qualityScore: stopword/length/punctuation evidence, higher
  * better) and repetition (CurationOps.repetition: duplicated token +
  * trigram mass, LOWER better) — so agreement here is a real
  * cross-signal consistency measure, not a fixture toy. Candidate pairs
  * are derived deterministically: within each (lang, source) stratum,
  * documents in doc_id order pair consecutively and non-overlapping
  * (positions 1–2, 3–4, …) — corpus-wide pairing with ONE window and no
  * all-pairs join, the shape that survives a 100 TB corpus (each pair's
  * scores then arrive via doc_id-keyed joins against the doc-sized
  * annotator tables).
  *
  * Determinism of compared values: both scorers are exact-rational
  * constructions finished by single IEEE divisions (their own oracles
  * hash-gate them), verdict comparisons and `margin` are single float
  * ops on identical doubles, and ties fall to the lower doc_id.
  */
object PrefOps {

  /** Per-doc annotator table: quality (higher wins) and repetition
    * (lower wins) beside each other.
    */
  private def annotators(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.qualityScore(spark, sfDir)
      .select(col("doc_id"), col("quality_score"))
      .join(CurationOps.repetition(spark, sfDir)
          .select(col("doc_id"),
            (col("dup_token_frac") + col("dup_trigram_frac"))
              .as("rep_score")),
        Seq("doc_id"))

  /** Candidate pairs with both annotators' verdicts. Columns:
    * pair_id, lang, chosen_id, rejected_id (the QUALITY annotator's
    * verdict — the pair as a reward corpus would ship it), margin
    * (|Δ quality|, the confidence a margin filter thresholds on), and
    * agree (did the repetition annotator pick the same winner).
    */
  def prefPairs(spark: SparkSession, sfDir: String): DataFrame = {
    val base = TextOps.documents(spark, sfDir)
      .select("doc_id", "lang", "source")
    val w = Window.partitionBy("lang", "source").orderBy("doc_id")
    val rnF = base.withColumn("rn", row_number().over(w))
    val aSide = rnF.filter(col("rn") % 2 === 1).select(
      col("lang"), col("source"), col("doc_id").as("a_id"),
      col("rn").as("arn"), expr("(rn + 1) div 2").as("pair_idx"))
    val bSide = rnF.filter(col("rn") % 2 === 0).select(
      col("lang").as("bl"), col("source").as("bs"),
      col("doc_id").as("b_id"), col("rn").as("brn"))
    val pp = aSide.join(bSide,
      col("lang") === col("bl") && col("source") === col("bs") &&
        col("brn") === col("arn") + 1)
    val ann = annotators(spark, sfDir)
    def side(tag: String): DataFrame = ann.select(
      col("doc_id").as(s"${tag}_id"),
      col("quality_score").as(s"q_$tag"),
      col("rep_score").as(s"r_$tag"))
    val v = pp
      .join(side("a"), Seq("a_id")).join(side("b"), Seq("b_id"))
      .withColumn("chosen_q",
        when(col("q_a") > col("q_b"), col("a_id"))
          .when(col("q_b") > col("q_a"), col("b_id"))
          .otherwise(least(col("a_id"), col("b_id"))))
      .withColumn("chosen_r",
        when(col("r_a") < col("r_b"), col("a_id"))
          .when(col("r_b") < col("r_a"), col("b_id"))
          .otherwise(least(col("a_id"), col("b_id"))))
    Canon.canonicalize(v.select(
      concat_ws("#", col("lang"), col("source"), col("pair_idx"))
        .as("pair_id"),
      col("lang"),
      col("chosen_q").as("chosen_id"),
      when(col("chosen_q") === col("a_id"), col("b_id"))
        .otherwise(col("a_id")).as("rejected_id"),
      abs(col("q_a") - col("q_b")).as("margin"),
      (col("chosen_q") === col("chosen_r")).as("agree")))
  }

  /** The length-bias audit over the AGREED pairs: per lang, how often
    * the chosen document is simply the longer one. frac_chosen_longer
    * near 1.0 means a reward model trained on these pairs learns
    * verbosity; agree_rate is the annotator-consistency health number
    * beside it. One rollup over the pair table joined to the doc
    * dimension for lengths — bounded output (one row per lang).
    */
  def prefLengthBias(spark: SparkSession, sfDir: String): DataFrame = {
    val nc = TextOps.documents(spark, sfDir).select("doc_id", "n_chars")
    val p = prefPairs(spark, sfDir)
      .join(nc.select(col("doc_id").as("chosen_id"),
        col("n_chars").as("c_len")), Seq("chosen_id"))
      .join(nc.select(col("doc_id").as("rejected_id"),
        col("n_chars").as("r_len")), Seq("rejected_id"))
    val agg = p.groupBy("lang").agg(
      count(lit(1)).as("n_pairs"),
      sum(when(col("agree"), 1L).otherwise(0L)).as("n_agree"),
      sum(when(col("agree") && col("c_len") > col("r_len"), 1L)
        .otherwise(0L)).as("n_chosen_longer"))
    Canon.canonicalize(agg.select(
      col("lang"), col("n_pairs"), col("n_agree"),
      (col("n_agree").cast("double") / col("n_pairs").cast("double"))
        .as("agree_rate"),
      col("n_chosen_longer"),
      when(col("n_agree") > 0,
        col("n_chosen_longer").cast("double") /
          col("n_agree").cast("double"))
        .otherwise(lit(0.0)).as("frac_chosen_longer")))
  }

  /** Shared oracle chain: annotator CTEs (quality `qs`, repetition `f`),
    * the window pairing, and the verdict projection `pv`.
    */
  private val prefCtes: String =
    s"""${TextOps.qualityCte},
       |${CurationOps.repCtes},
       |prn AS (
       |  SELECT doc_id, lang, source,
       |         row_number() OVER (PARTITION BY lang, source
       |                            ORDER BY doc_id) AS rn
       |  FROM documents),
       |ppair AS (
       |  SELECT a.lang, a.source, (a.rn + 1) // 2 AS pair_idx,
       |         a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM prn a JOIN prn b
       |    ON a.lang = b.lang AND a.source = b.source
       |       AND b.rn = a.rn + 1
       |  WHERE a.rn % 2 = 1),
       |pann AS (
       |  SELECT qs.doc_id, qs.quality_score,
       |         f.dup_token_frac + f.dup_trigram_frac AS rep_score
       |  FROM qs JOIN f ON qs.doc_id = f.doc_id),
       |pv AS (
       |  SELECT p.lang, p.source, p.pair_idx, p.a_id, p.b_id,
       |         aa.quality_score AS q_a, bb.quality_score AS q_b,
       |         CASE WHEN aa.quality_score > bb.quality_score THEN p.a_id
       |              WHEN bb.quality_score > aa.quality_score THEN p.b_id
       |              ELSE least(p.a_id, p.b_id) END AS chosen_q,
       |         CASE WHEN aa.rep_score < bb.rep_score THEN p.a_id
       |              WHEN bb.rep_score < aa.rep_score THEN p.b_id
       |              ELSE least(p.a_id, p.b_id) END AS chosen_r
       |  FROM ppair p JOIN pann aa ON p.a_id = aa.doc_id
       |               JOIN pann bb ON p.b_id = bb.doc_id),
       |pvo AS (
       |  SELECT lang || '#' || source || '#' || CAST(pair_idx AS VARCHAR)
       |           AS pair_id,
       |         lang,
       |         CAST(chosen_q AS BIGINT) AS chosen_id,
       |         CAST(CASE WHEN chosen_q = a_id THEN b_id ELSE a_id END
       |           AS BIGINT) AS rejected_id,
       |         abs(q_a - q_b) AS margin,
       |         chosen_q = chosen_r AS agree
       |  FROM pv)""".stripMargin

  val prefPairsOracle: String =
    s"""WITH $prefCtes
       |SELECT pair_id, lang, chosen_id, rejected_id, margin, agree
       |FROM pvo""".stripMargin

  val prefLengthBiasOracle: String =
    s"""WITH $prefCtes,
       |pb AS (
       |  SELECT o.lang, o.agree,
       |         dc.n_chars AS c_len, dr.n_chars AS r_len
       |  FROM pvo o JOIN documents dc ON o.chosen_id = dc.doc_id
       |             JOIN documents dr ON o.rejected_id = dr.doc_id),
       |pagg AS (
       |  SELECT lang, count(*) AS n_pairs,
       |         sum(CASE WHEN agree THEN 1 ELSE 0 END) AS n_agree,
       |         sum(CASE WHEN agree AND c_len > r_len THEN 1 ELSE 0 END)
       |           AS n_chosen_longer
       |  FROM pb GROUP BY 1)
       |SELECT lang, CAST(n_pairs AS BIGINT) AS n_pairs,
       |       CAST(n_agree AS BIGINT) AS n_agree,
       |       CAST(n_agree AS DOUBLE) / CAST(n_pairs AS DOUBLE)
       |         AS agree_rate,
       |       CAST(n_chosen_longer AS BIGINT) AS n_chosen_longer,
       |       CASE WHEN n_agree > 0
       |         THEN CAST(n_chosen_longer AS DOUBLE)
       |                / CAST(n_agree AS DOUBLE)
       |         ELSE 0.0 END AS frac_chosen_longer
       |FROM pagg""".stripMargin
}
