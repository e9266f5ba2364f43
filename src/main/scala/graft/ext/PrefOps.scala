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
      // concat, not concat_ws: NULL-propagating like the oracle's `||`,
      // so a NULL lang/source would fail the hash gate loudly on both
      // sides instead of diverging
      concat(col("lang"), lit("#"), col("source"), lit("#"),
        col("pair_idx").cast("string")).as("pair_id"),
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

  /** Margin floor for [[prefExport]]: agreed pairs below it are too
    * close to teach a reward model anything (fixture margins run
    * ~0.02–0.26 with median ~0.10, so 0.05 genuinely splits).
    */
  val prefMarginMin = 0.05

  /** The APPLY step that closes the detect→ship loop ([[prefPairs]]
    * measures, this exports): the cleaned preference corpus a DPO/RLHF
    * trainer consumes — only pairs BOTH annotators agree on, with a
    * quality margin above [[prefMarginMin]], joined back to the two
    * document texts. Two doc_id-keyed joins against the dimension;
    * the pair table is already corpus-bounded.
    */
  def prefExport(spark: SparkSession, sfDir: String): DataFrame = {
    val txt = TextOps.documents(spark, sfDir).select("doc_id", "text")
    val kept = prefPairs(spark, sfDir)
      .filter(col("agree") && col("margin") >= prefMarginMin)
    Canon.canonicalize(kept
      .join(txt.select(col("doc_id").as("chosen_id"),
        col("text").as("chosen_text")), Seq("chosen_id"))
      .join(txt.select(col("doc_id").as("rejected_id"),
        col("text").as("rejected_text")), Seq("rejected_id"))
      .select("pair_id", "lang", "chosen_id", "rejected_id", "margin",
        "chosen_text", "rejected_text"))
  }

  // lazy: prefCtes is declared later in the object (the TextOps.normSql
  // init-order discipline — a plain val would interpolate null)
  lazy val prefExportOracle: String =
    s"""WITH $prefCtes
       |SELECT o.pair_id, o.lang, o.chosen_id, o.rejected_id, o.margin,
       |       dc.text AS chosen_text, dr.text AS rejected_text
       |FROM pvo o JOIN documents dc ON o.chosen_id = dc.doc_id
       |           JOIN documents dr ON o.rejected_id = dr.doc_id
       |WHERE o.agree AND o.margin >= $prefMarginMin""".stripMargin

  /** Matches per source pair in the [[sourceWinRate]] tournament. */
  val tournamentK = 20

  /** SOURCE-QUALITY LEADERBOARD via a round-robin tournament: within
    * each language, every pair of sources plays up to [[tournamentK]]
    * matches — the i-th document (doc_id order) of one source against
    * the i-th of the other, judged by the quality annotator (ties to
    * the lower doc_id). Per (lang, source): matches, wins, the
    * Laplace-smoothed win rate (wins+1)/(matches+2) — exact integer
    * counts, ONE division — and the rank within the language. This is
    * the "which sources actually produce better documents" artifact a
    * curation pass reads before setting [[SampleOps.targetMixPermille]]
    * shares or sourceCap limits: head-to-head document quality, not raw
    * volume.
    *
    * Scale shape: the per-source head is `row_number ≤ K` — which the
    * session's TopKRewriteRule compiles to the sort-free TopKPerKey
    * heap — so the corpus contributes one keyed exchange and the
    * tournament itself runs on |sources|·K rows per lang; the match
    * join is rank-keyed (never all-docs × all-docs), and a source with
    * no opponents (sole source in its lang) keeps its row with the
    * 1/2 prior rate.
    */
  /** The tournament's match list — (lang, s1, s2, winner) with
    * s1 < s2 — shared by the raw-win-rate leaderboard and the
    * Bradley-Terry fit.
    */
  private def tournamentMatches(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val d = TextOps.documents(spark, sfDir)
      .select("doc_id", "lang", "source")
      .join(TextOps.qualityScore(spark, sfDir)
        .select("doc_id", "quality_score"), Seq("doc_id"))
    val w = Window.partitionBy("lang", "source").orderBy("doc_id")
    val top = d.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= tournamentK)
    val a = top.select(col("lang"), col("source").as("s1"), col("rn"),
      col("doc_id").as("id1"), col("quality_score").as("q1"))
    val b = top.select(col("lang").as("l2"), col("source").as("s2"),
      col("rn").as("rn2"), col("doc_id").as("id2"),
      col("quality_score").as("q2"))
    a.join(b, col("lang") === col("l2") &&
        col("rn") === col("rn2") && col("s1") < col("s2"))
      .withColumn("winner",
        when(col("q1") > col("q2"), col("s1"))
          .when(col("q2") > col("q1"), col("s2"))
          .otherwise(when(col("id1") < col("id2"), col("s1"))
            .otherwise(col("s2"))))
      .select("lang", "s1", "s2", "winner")
  }

  /** Per-(lang, source) match/win totals over the full source
    * universe (unplayed sources kept at 0/0).
    */
  private def matchStats(matches: DataFrame, universe: DataFrame)
      : DataFrame = {
    val sides = matches.select(col("lang"), col("s1").as("source"),
        (col("winner") === col("s1")).as("won"))
      .union(matches.select(col("lang"), col("s2").as("source"),
        (col("winner") === col("s2")).as("won")))
    val stats = sides.groupBy("lang", "source").agg(
      count(lit(1)).as("n_matches"),
      sum(when(col("won"), 1L).otherwise(0L)).as("n_wins"))
    universe
      .join(stats, Seq("lang", "source"), "left")
      .select(col("lang"), col("source"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        coalesce(col("n_wins"), lit(0L)).as("n_wins"))
  }

  def sourceWinRate(spark: SparkSession, sfDir: String): DataFrame = {
    val all = matchStats(tournamentMatches(spark, sfDir),
        TextOps.documents(spark, sfDir)
          .select("lang", "source").distinct())
      .withColumn("win_rate",
        (col("n_wins") + lit(1L)).cast("double") /
          (col("n_matches") + lit(2L)).cast("double"))
    Canon.canonicalize(all.withColumn("rank",
      row_number().over(Window.partitionBy("lang")
        .orderBy(col("win_rate").desc, col("source").asc))))
  }

  /** Fixed-point scale of the Bradley-Terry strengths (π = [[btScale]]
    * is the prior "average source").
    */
  val btScale = 1000000L

  /** Hard cap on distinct sources per lang in the BT tournament — the
    * all-pairs match join and the driver-side pair fold are
    * |sources|² per lang, which is the operator's INTENT (curated
    * source tags, dozens) and a trap at web-domain cardinality.
    * [[btStrengthsFrom]] fails loudly over this bound before running
    * any quadratic work (spec: PrefOpsSpec's over-cap universe).
    */
  val btMaxSourcesPerLang = 64L

  /** Minorize-maximize iterations of the BT fit — fixed and unrolled
    * in the oracle (the pageRank discipline). Convergence is geometric
    * on tournaments this shape; the spec pins that the ranking is
    * already stable at this depth.
    */
  val btIters = 12

  /** BRADLEY-TERRY strengths from a match list — the rating-model
    * correction to raw win share. Raw (wins+1)/(matches+2) is biased
    * under unbalanced schedules: a source that only played strong
    * opponents is underrated, one that farmed the weakest is overrated
    * (spec: a fixture where raw win-rate misranks and BT corrects).
    * BT models P(s beats t) = π_s/(π_s+π_t) and the standard
    * Zermelo/Hunter MM update
    * `π_s ← W_s / Σ_t n_st/(π_s+π_t)` rates sources by WHO they beat,
    * not how often.
    *
    * Arithmetic is the repo's fixed-point discipline — integer units
    * of [[btScale]], every division non-negative (`div` ≡ DuckDB `//`),
    * iterations a fixed [[btIters]] unrolled in the oracle. Smoothing
    * is two VIRTUAL matches against a prior-strength opponent (one won:
    * W̃ = wins+1, denominator gains `2·S²/(π_s+S)`) — the Bayesian BT
    * prior that keeps every π positive and bounded and pins a sole
    * unplayed source at EXACTLY the prior π = S at every iteration.
    *
    * Scale shape: Spark folds the corpus-sized match stream into the
    * |langs|·|sources| win table and the per-lang ≤|sources|² pair-count
    * table (both bounded corpus summaries — map-side combined keyed
    * aggs); the [[btIters]]-round fixed point then runs on the DRIVER
    * over the collected summaries — the k-means centroid-sync pattern.
    * Iterating in DataFrame space would reference π three times per
    * round (two den joins + the update), tripling the logical plan per
    * iteration — exponential analysis cost by round 12; a driver loop
    * over a bounded rating table is what a production system runs, and
    * the arithmetic stays a Long-for-Long twin of the unrolled oracle
    * CTEs (all operands non-negative, so `/` ≡ DuckDB `//`).
    */
  private[ext] def btStrengthsFrom(matches: DataFrame,
                                   universe: DataFrame): DataFrame = {
    val spark = matches.sparkSession
    import spark.implicits._
    // Loud cardinality gate BEFORE any tournament work runs: the match
    // join is all-pairs over sources within a lang and the driver fold
    // holds the |langs|·|sources|² pair table, so both are only sane at
    // curated source-TAG cardinality. Pointing this at web-domain-sized
    // sources must fail with instructions, not quadratic silently — the
    // TopKPerKey key-cap discipline. The check itself is one keyed agg
    // over the bounded (lang, source) universe.
    val maxSrc = universe.groupBy("lang").count().as[(String, Long)]
      .collect().map(_._2).foldLeft(0L)(math.max)
    require(maxSrc <= btMaxSourcesPerLang,
      s"bradley-terry tournament: a lang has $maxSrc distinct sources, " +
        s"over the $btMaxSourcesPerLang cap — the all-pairs match join " +
        "and the driver-side pair fold are |sources|^2 per lang. Rate " +
        "curated source TAGS, or pre-bucket sources (e.g. by registered " +
        "domain -> tag) before fitting.")
    val s2 = btScale * btScale
    // the corpus-sized tournament is computed ONCE; win table and
    // pair counts both fold it down to bounded summaries
    val m = matches.persist()
    val wins = matchStats(m, universe)
    // symmetric per-pair match counts: (lang, source, opp, n)
    val pc = m.groupBy("lang", "s1", "s2")
      .agg(count(lit(1)).as("n"))
    val pairs = pc.select(col("lang"), col("s1").as("source"),
        col("s2").as("opp"), col("n"))
      .union(pc.select(col("lang"), col("s2").as("source"),
        col("s1").as("opp"), col("n")))
      .as[(String, String, String, Long)].collect()
    val stats = wins.select("lang", "source", "n_matches", "n_wins")
      .as[(String, String, Long, Long)].collect()
    val opps = pairs.groupBy(p => (p._1, p._2))
      .view.mapValues(_.map(p => ((p._1, p._3), p._4))).toMap
    var pi: Map[(String, String), Long] =
      stats.map(r => (r._1, r._2) -> btScale).toMap
    for (_ <- 1 to btIters) {
      val prev = pi
      pi = stats.map { case (lang, src, _, w) =>
        val k = (lang, src)
        val den = opps.getOrElse(k, Array.empty[((String, String), Long)])
          .map { case (ok, n) => n * s2 / (prev(k) + prev(ok)) }.sum
        // clamped to one fixed-point unit: an extreme schedule (many
        // matches against near-zero-π opponents) could floor a π to 0,
        // and two zero-π sources sharing a pair would then divide by
        // zero next round; GREATEST(1, ...) mirrors this in the oracle
        k -> math.max(1L,
          (w + 1L) * s2 / (den + 2L * s2 / (prev(k) + btScale)))
      }.toMap
    }
    val out = stats.toSeq
      .map(r => (r._1, r._2, r._3, r._4, pi((r._1, r._2))))
      .toDF("lang", "source", "n_matches", "n_wins", "pi")
    m.unpersist(false)
    out
  }

  /** q_source_bt: the tournament leaderboard under the BT rating —
    * rank by the exact integer strength (π desc, source asc), expose
    * the strength as a double beside the raw counts.
    */
  def sourceBt(spark: SparkSession, sfDir: String): DataFrame = {
    val bt = btStrengthsFrom(tournamentMatches(spark, sfDir),
      TextOps.documents(spark, sfDir).select("lang", "source").distinct())
    Canon.materialized(Canon.canonicalize(bt
      .withColumn("rank", row_number().over(Window.partitionBy("lang")
        .orderBy(col("pi").desc, col("source").asc)))
      .select(col("lang"), col("source"), col("n_matches"),
        col("n_wins"),
        (col("pi").cast("double") / lit(btScale.toDouble)).as("bt"),
        col("rank"))), bt)
  }

  /** The tournament chain as a composable CTE block (ends in `wr`) —
    * shared by [[sourceWinRateOracle]] and [[sourceMixSharesOracle]].
    */
  private val winRateCtes: String =
    s"""${TextOps.qualityCte},
       |st AS (
       |  SELECT d.doc_id, d.lang, d.source, qs.quality_score,
       |         row_number() OVER (PARTITION BY d.lang, d.source
       |                            ORDER BY d.doc_id) AS rn
       |  FROM documents d JOIN qs ON d.doc_id = qs.doc_id),
       |tp AS (SELECT * FROM st WHERE rn <= $tournamentK),
       |mt AS (
       |  SELECT a.lang, a.source AS s1, b.source AS s2,
       |         CASE WHEN a.quality_score > b.quality_score THEN a.source
       |              WHEN b.quality_score > a.quality_score THEN b.source
       |              WHEN a.doc_id < b.doc_id THEN a.source
       |              ELSE b.source END AS winner
       |  FROM tp a JOIN tp b
       |    ON a.lang = b.lang AND a.rn = b.rn AND a.source < b.source),
       |sd AS (
       |  SELECT lang, s1 AS source, winner = s1 AS won FROM mt
       |  UNION ALL
       |  SELECT lang, s2 AS source, winner = s2 AS won FROM mt),
       |stat AS (
       |  SELECT lang, source, count(*) AS n_matches,
       |         sum(CASE WHEN won THEN 1 ELSE 0 END) AS n_wins
       |  FROM sd GROUP BY 1, 2),
       |base AS (SELECT DISTINCT lang, source FROM documents),
       |wr AS (
       |  SELECT base.lang, base.source,
       |         CAST(coalesce(n_matches, 0) AS BIGINT) AS n_matches,
       |         CAST(coalesce(n_wins, 0) AS BIGINT) AS n_wins,
       |         CAST(coalesce(n_wins, 0) + 1 AS DOUBLE)
       |           / CAST(coalesce(n_matches, 0) + 2 AS DOUBLE) AS win_rate
       |  FROM base LEFT JOIN stat
       |    ON base.lang = stat.lang AND base.source = stat.source)""".stripMargin

  val sourceWinRateOracle: String =
    s"""WITH $winRateCtes
       |SELECT lang, source, n_matches, n_wins, win_rate,
       |       CAST(row_number() OVER (PARTITION BY lang
       |         ORDER BY win_rate DESC, source ASC) AS BIGINT) AS rank
       |FROM wr""".stripMargin

  /** The BT iteration chain on top of `wr`/`mt` — ends in
    * `bt[[btIters]]` with (lang, source, pi). Every arithmetic step
    * mirrors [[btStrengthsFrom]] exactly: same integer literals, same
    * floor/truncate-safe non-negative divisions.
    */
  private val btCtes: String = {
    val s2 = btScale * btScale
    val iters = (1 to btIters).map { k =>
      val prev = s"bt${k - 1}"
      s"""bt$k AS MATERIALIZED (
         |  SELECT w.lang, w.source,
         |         CAST(GREATEST(1, (w.n_wins + 1) * $s2
         |           // (coalesce(d.den, 0) + 2 * $s2 // (p.pi + $btScale)))
         |           AS BIGINT) AS pi
         |  FROM wr w
         |  JOIN $prev p ON p.lang = w.lang AND p.source = w.source
         |  LEFT JOIN (
         |    SELECT pc.lang, pc.source,
         |           sum(pc.n * $s2 // (a.pi + b.pi)) AS den
         |    FROM pc JOIN $prev a ON a.lang = pc.lang
         |                        AND a.source = pc.source
         |            JOIN $prev b ON b.lang = pc.lang
         |                        AND b.source = pc.opp
         |    GROUP BY 1, 2) d
         |    ON d.lang = w.lang AND d.source = w.source)""".stripMargin
    }.mkString(",\n")
    s"""pcd AS (
       |  SELECT lang, s1, s2, count(*) AS n FROM mt GROUP BY 1, 2, 3),
       |pc AS (
       |  SELECT lang, s1 AS source, s2 AS opp, n FROM pcd
       |  UNION ALL
       |  SELECT lang, s2 AS source, s1 AS opp, n FROM pcd),
       |bt0 AS MATERIALIZED (
       |  SELECT lang, source, CAST($btScale AS BIGINT) AS pi FROM wr),
       |$iters""".stripMargin
  }

  val sourceBtOracle: String =
    s"""WITH $winRateCtes,
       |$btCtes
       |SELECT wr.lang, wr.source, wr.n_matches, wr.n_wins,
       |       CAST(pi AS DOUBLE) / $btScale.0 AS bt,
       |       CAST(row_number() OVER (PARTITION BY wr.lang
       |         ORDER BY pi DESC, wr.source ASC) AS BIGINT) AS rank
       |FROM wr JOIN bt$btIters b
       |  ON wr.lang = b.lang AND wr.source = b.source""".stripMargin

  /** Tournament → MIXTURE SHARES: the composition that makes the
    * leaderboard actionable — per language, each source's share of
    * the training mix in permille, proportional to its
    * BRADLEY-TERRY strength (π from [[btStrengthsFrom]] — the
    * schedule-corrected rating, not raw win mass, so a source that
    * only ever faced strong opponents is no longer under-allocated;
    * the BT prior keeps unplayed/sole sources at the uniform-prior
    * strength instead of zero). Pure integer arithmetic:
    * ⌊1000·π / Σπ⌋ per lang (non-negative, so Spark `div` ≡ DuckDB
    * `//`), directly pluggable where
    * [[SampleOps.targetMixPermille]]-style shares are consumed
    * (mixturePlan's contract). Bounded frames end to end — the
    * tournament output is |langs|·|sources| rows.
    */
  def sourceMixShares(spark: SparkSession, sfDir: String): DataFrame = {
    val bt = btStrengthsFrom(tournamentMatches(spark, sfDir),
      TextOps.documents(spark, sfDir).select("lang", "source").distinct())
    val s = bt.select(col("lang"), col("source"), col("n_wins"),
      col("pi"))
    val tot = s.groupBy("lang").agg(sum("pi").as("pi_tot"))
    Canon.materialized(Canon.canonicalize(
      s.join(broadcast(tot), Seq("lang"))
        .withColumn("share_permille", expr("1000 * pi div pi_tot"))
        .select("lang", "source", "n_wins", "share_permille")), bt)
  }

  val sourceMixSharesOracle: String =
    s"""WITH $winRateCtes,
       |$btCtes,
       |sm AS (
       |  SELECT wr.lang, wr.source, wr.n_wins, b.pi
       |  FROM wr JOIN bt$btIters b
       |    ON wr.lang = b.lang AND wr.source = b.source),
       |smt AS (SELECT lang, sum(pi) AS pi_tot FROM sm GROUP BY 1)
       |SELECT sm.lang, sm.source, CAST(sm.n_wins AS BIGINT) AS n_wins,
       |       CAST(1000 * sm.pi // smt.pi_tot AS BIGINT)
       |         AS share_permille
       |FROM sm JOIN smt ON sm.lang = smt.lang""".stripMargin

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
