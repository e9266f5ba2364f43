package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Canon

/** Corpus-curation operators beyond the per-document quality score:
  * repetition signals, benchmark decontamination, and sequence packing —
  * the remaining standard passes of a pre-training data pipeline
  * (cf. the "Gopher rules" repetition filters and the n-gram-overlap
  * decontamination used by every published LLM corpus).
  *
  * Scale posture (the common theme: everything is keyed on doc_id or an
  * n-gram hash, so every shuffle is a plain hash exchange with map-side
  * combine — no all-pairs joins, no per-partition state beyond a counter):
  *
  *  - `repetition`: explode token n-grams (n = 1,2,3) → count per
  *    (doc, n, gram) → per-doc conditional rollup. Two keyed shuffles
  *    whose width is the gram stream — linear in corpus tokens.
  *  - `decontaminate`: the benchmark side's distinct 8-gram hashes are
  *    tiny by construction (benchmarks are, at most, millions of grams
  *    against a corpus of trillions), so the overlap join BROADCASTS the
  *    benchmark and the corpus side never shuffles at all.
  *  - `packSequences`: packing is shard-local (doc_id hash shards) so the
  *    running-sum window partitions stay bounded regardless of corpus
  *    size; no global sort, no single-reducer partition.
  */
object CurationOps {

  import TextOps.{documents, normText, normSql}

  /** Whitespace tokens of the normalized text, empties dropped — the
    * shared tokenization of every operator in this file (and its DuckDB
    * twin, [[toksSql]]).
    */
  private[graft] def toksCol: Column =
    filter(split(normText(col("text")), " "), t => t =!= "")

  // def for the same init-cycle reason as TextOps.normSql (see there)
  private[ext] def toksSql: String =
    s"list_filter(string_split($normSql, ' '), t -> t <> '')"

  // ---- per-source boilerplate (shared document prefixes) --------------

  /** Prefix length (tokens) and the share of a source's docs that must
    * open with the same prefix before it counts as boilerplate.
    */
  val boilerplatePrefixLen = 8
  val boilerplateShareMin = 0.5

  /** Per-SOURCE boilerplate detection: the [[boilerplatePrefixLen]]-token
    * opening prefix shared by more than [[boilerplateShareMin]] of a
    * source's documents — the injected header/banner signature of a
    * scraped site (every page of a domain opening with the same cookie
    * banner), which per-document repetition scores cannot see because
    * the repetition is ACROSS documents, not within one. The report
    * feeds the same surgery path as dupSpans (cut the prefix, keep the
    * page).
    *
    * Scale shape: one codegen'd prefix projection (array_join of a
    * SLICED token array — no explode, the corpus stream carries one
    * short string per doc), one (source, prefix) keyed count with
    * map-side combine, a source-keyed total broadcast back over the
    * bounded count table. Docs shorter than the prefix are excluded
    * (their opening is the whole doc, not a banner).
    *
    * The fixture corpus has no injected banners, so the query SEEDS one
    * deterministically (two of every three docs get the cookie banner —
    * the nullRepair/scd2Merge seeding pattern): the detector then has a
    * real >50% signature to find and a real unseeded third to NOT flag.
    */
  /** Exactly [[boilerplatePrefixLen]] tokens by construction (asserted),
    * so the prefix surgery removes the WHOLE banner — a longer banner
    * would leave its tail behind in every "cleaned" document.
    */
  val boilerplateBanner =
    "cookie notice please accept our full cookie policy "
  require(boilerplateBanner.trim.split(" ").length == boilerplatePrefixLen,
    "boilerplateBanner must be exactly boilerplatePrefixLen tokens")

  def boilerplate(spark: SparkSession, sfDir: String): DataFrame = {
    val d = documents(spark, sfDir)
      .withColumn("text",
        when(col("doc_id") % 3 =!= 0,
          concat(lit(boilerplateBanner), col("text")))
          .otherwise(col("text")))
      .select(col("doc_id"), col("source"), toksCol.as("toks"))
      .filter(size(col("toks")) >= boilerplatePrefixLen)
      .withColumn("prefix",
        array_join(slice(col("toks"), 1, boilerplatePrefixLen), " "))
    val counts = d.groupBy("source", "prefix")
      .agg(count(lit(1)).as("n_docs"))
    val totals = d.groupBy("source")
      .agg(count(lit(1)).as("n_source_docs"))
    Canon.canonicalize(counts
      .join(broadcast(totals), Seq("source"))
      .withColumn("share",
        col("n_docs").cast("double") / col("n_source_docs").cast("double"))
      .filter(col("share") > boilerplateShareMin)
      .select("source", "prefix", "n_docs", "n_source_docs", "share"))
  }

  val boilerplateOracle: String =
    s"""WITH seeded AS (
       |  SELECT doc_id, source,
       |         CASE WHEN doc_id % 3 <> 0
       |              THEN '$boilerplateBanner' || text ELSE text END AS text
       |  FROM documents),
       |toks AS (
       |  SELECT doc_id, source, $toksSql AS t FROM seeded),
       |pfx AS (
       |  SELECT doc_id, source,
       |         array_to_string(t[1:$boilerplatePrefixLen], ' ') AS prefix
       |  FROM toks WHERE len(t) >= $boilerplatePrefixLen),
       |counts AS (
       |  SELECT source, prefix, count(*) AS n_docs
       |  FROM pfx GROUP BY 1, 2),
       |totals AS (
       |  SELECT source, count(*) AS n_source_docs FROM pfx GROUP BY 1)
       |SELECT c.source, c.prefix, c.n_docs, t.n_source_docs,
       |       CAST(c.n_docs AS DOUBLE) / CAST(t.n_source_docs AS DOUBLE)
       |         AS share
       |FROM counts c JOIN totals t ON c.source = t.source
       |WHERE CAST(c.n_docs AS DOUBLE) / CAST(t.n_source_docs AS DOUBLE)
       |      > $boilerplateShareMin""".stripMargin

  /** Boilerplate APPLY — detect → REMOVE closed, like dedupApply and
    * dupSpansApply: every document whose opening matches its source's
    * detected banner prefix loses exactly that prefix; everything else
    * (the unseeded third, short docs, sources with no flagged prefix)
    * passes through. Output text is rebuilt from normalized tokens,
    * the same text-surgery contract as dupSpansApply.
    *
    * Scale shape: the detection report is ≤ one row per source
    * (bounded) and BROADCASTS; the corpus side is one codegen'd
    * projection — no extra shuffle beyond the detection's own bounded
    * aggs.
    */
  def boilerplateApply(spark: SparkSession, sfDir: String): DataFrame = {
    val flagged = boilerplate(spark, sfDir)
      .select(col("source"), col("prefix").as("flagged_prefix"))
    val d = documents(spark, sfDir)
      .withColumn("text",
        when(col("doc_id") % 3 =!= 0,
          concat(lit(boilerplateBanner), col("text")))
          .otherwise(col("text")))
      .select(col("doc_id"), col("source"), toksCol.as("toks"))
      .withColumn("prefix",
        array_join(slice(col("toks"), 1, boilerplatePrefixLen), " "))
    val cut = d.join(broadcast(flagged), Seq("source"), "left")
      .withColumn("hit",
        col("flagged_prefix").isNotNull &&
          size(col("toks")) >= boilerplatePrefixLen &&
          col("prefix") === col("flagged_prefix"))
    Canon.canonicalize(cut.select(
      col("doc_id"),
      when(col("hit"),
        array_join(slice(col("toks"), lit(boilerplatePrefixLen + 1),
          greatest(size(col("toks")) - boilerplatePrefixLen, lit(0))),
          " "))
        .otherwise(array_join(col("toks"), " ")).as("cleaned"),
      col("hit").as("removed"),
      when(col("hit"), lit(boilerplatePrefixLen.toLong)).otherwise(lit(0L))
        .as("n_removed_tokens")))
  }

  /** Composes the detection CTE chain (shared text, not a copy) with
    * the strip projection.
    */
  def boilerplateApplyOracle: String = {
    val detectBody = boilerplateOracle.stripPrefix("WITH ")
      .split("\nSELECT ", 2)(0)
    s"""WITH $detectBody,
       |flagged AS (
       |  SELECT c.source, c.prefix AS flagged_prefix
       |  FROM counts c JOIN totals t ON c.source = t.source
       |  WHERE CAST(c.n_docs AS DOUBLE) / CAST(t.n_source_docs AS DOUBLE)
       |        > $boilerplateShareMin),
       |alltoks AS (
       |  SELECT doc_id, source, $toksSql AS t FROM seeded),
       |hitj AS (
       |  SELECT a.doc_id, a.t,
       |         (f.flagged_prefix IS NOT NULL
       |          AND len(a.t) >= $boilerplatePrefixLen
       |          AND array_to_string(a.t[1:$boilerplatePrefixLen], ' ')
       |              = f.flagged_prefix) AS hit
       |  FROM alltoks a LEFT JOIN flagged f ON a.source = f.source)
       |SELECT doc_id,
       |       CASE WHEN hit
       |            THEN array_to_string(t[${boilerplatePrefixLen + 1}:len(t)], ' ')
       |            ELSE array_to_string(t, ' ') END AS cleaned,
       |       hit AS removed,
       |       CAST(CASE WHEN hit THEN $boilerplatePrefixLen ELSE 0 END
       |         AS BIGINT) AS n_removed_tokens
       |FROM hitj""".stripMargin
  }

  // ---- line-level cross-document boilerplate --------------------------

  /** Line-level detection thresholds: a LINE is boilerplate for a source
    * when it appears in more than [[lineShareMin]] of the source's
    * documents; lines shorter than [[lineMinTokens]] tokens are never
    * candidates (short natural lines collide by chance — the published
    * line-dedup recipes carry the same guard).
    */
  val lineShareMin = 0.5
  val lineMinTokens = 4

  /** Seeded mid-document banner and end-of-document footer lines. The
    * fixture corpus is single-line prose, so the query SEEDS the line
    * structure deterministically (the [[boilerplate]] seeding pattern,
    * moved mid-document): each doc is split into two halves, two of
    * every three docs get [[lineBannerMid]] BETWEEN the halves, and six
    * of every seven get [[lineFooter]] appended — so the detector must
    * find position-free repeats, which the opening-prefix detector
    * ([[boilerplate]]) is blind to by construction. (Moduli 3 and 7 are
    * both coprime to the fixture's source assignment — doc_id % 10 — so
    * per-source shares stay at the global 2/3 and 6/7; a modulus sharing
    * a factor with 10 aliases per source, e.g. %4 gives docs ≡ 8
    * (mod 10) a footer share of exactly 0.5 and the detector misses it.)
    */
  val lineBannerMid = "this site uses tracking cookies accept to continue"
  val lineFooter = "copyright example site all rights reserved"

  /** The seeded (doc_id, source, lines) frame shared by detection and
    * apply — documents as LINE ARRAYS: [half1, banner?, half2, footer?]
    * with empties dropped (a 0/1-token doc contributes no empty line).
    */
  private def seededLines(spark: SparkSession, sfDir: String): DataFrame =
    documents(spark, sfDir)
      .select(col("doc_id"), col("source"), toksCol.as("toks"))
      .withColumn("half", floor(size(col("toks")) / 2).cast("int"))
      .withColumn("l1",
        array_join(slice(col("toks"), lit(1), col("half")), " "))
      .withColumn("l2",
        array_join(slice(col("toks"), col("half") + 1,
          size(col("toks")) - col("half")), " "))
      .withColumn("lines0",
        when(col("doc_id") % 3 =!= 0,
          array(col("l1"), lit(lineBannerMid), col("l2")))
          .otherwise(array(col("l1"), col("l2"))))
      .withColumn("lines1",
        when(col("doc_id") % 7 =!= 0,
          concat(col("lines0"), array(lit(lineFooter))))
          .otherwise(col("lines0")))
      .select(col("doc_id"), col("source"),
        filter(col("lines1"), l => l =!= "").as("lines"))

  /** The line-SEEDING CTE chain alone (lt → lparts → llines) — the SQL
    * twin of [[seededLines]], shared by the boilerplate oracles and the
    * Gopher rule oracle (which seeds further structure on top).
    */
  private def lineSeedCtes: String =
    s"""lt AS (
       |  SELECT doc_id, source, $toksSql AS t FROM documents),
       |lparts AS (
       |  SELECT doc_id, source,
       |         array_to_string(t[1:(len(t) // 2)], ' ') AS l1,
       |         array_to_string(t[(len(t) // 2) + 1:len(t)], ' ') AS l2
       |  FROM lt),
       |llines AS MATERIALIZED (
       |  SELECT doc_id, source,
       |         list_filter(
       |           CASE WHEN doc_id % 7 <> 0
       |                THEN base || ['$lineFooter'] ELSE base END,
       |           l -> l <> '') AS lines
       |  FROM (
       |    SELECT doc_id, source,
       |           CASE WHEN doc_id % 3 <> 0
       |                THEN [l1, '$lineBannerMid', l2]
       |                ELSE [l1, l2] END AS base
       |    FROM lparts))""".stripMargin

  /** The shared seeding + line-explosion CTE chain (llines → lcnt/ltot),
    * composed by both line-boilerplate oracles.
    */
  private def lineCtes: String =
    s"""$lineSeedCtes,
       |lcand AS (
       |  SELECT DISTINCT doc_id, source, line FROM (
       |    SELECT doc_id, source, unnest(lines) AS line FROM llines)
       |  WHERE len(string_split(line, ' ')) >= $lineMinTokens),
       |lcnt AS (
       |  SELECT source, line, count(*) AS n_docs
       |  FROM lcand GROUP BY 1, 2),
       |ltot AS (
       |  SELECT source, count(*) AS n_source_docs
       |  FROM documents GROUP BY 1),
       |lflag AS MATERIALIZED (
       |  SELECT c.source, c.line, c.n_docs, t.n_source_docs,
       |         CAST(c.n_docs AS DOUBLE) / CAST(t.n_source_docs AS DOUBLE)
       |           AS share
       |  FROM lcnt c JOIN ltot t USING (source)
       |  WHERE CAST(c.n_docs AS DOUBLE) / CAST(t.n_source_docs AS DOUBLE)
       |        > $lineShareMin)""".stripMargin

  /** LINE-granular cross-document boilerplate detection — the
    * CCNet/RefinedWeb recipe: hash every line, flag lines whose
    * per-source document-frequency share exceeds [[lineShareMin]].
    * Position-free, unlike the opening-prefix detector [[boilerplate]]:
    * a cookie banner in the middle of the page or a footer at the end
    * repeats across a site's documents just as reliably as a header,
    * and this catches all three.
    *
    * Scale shape (same bounded-count discipline as [[boilerplate]]):
    * one explode to (doc, line) — linear in corpus lines — then ONE
    * (source, line)-keyed count with map-side combine; the per-source
    * totals are a broadcast back over the count table, and the report
    * is at most a handful of rows per source. No all-pairs anything.
    */
  def lineBoilerplate(spark: SparkSession, sfDir: String): DataFrame = {
    val exploded = seededLines(spark, sfDir)
      .select(col("doc_id"), col("source"), explode(col("lines")).as("line"))
      .filter(size(split(col("line"), " ")) >= lineMinTokens)
    val counts = exploded.groupBy("source", "line")
      .agg(countDistinct("doc_id").as("n_docs"))
    val totals = documents(spark, sfDir).groupBy("source")
      .agg(count(lit(1)).as("n_source_docs"))
    Canon.canonicalize(counts
      .join(broadcast(totals), Seq("source"))
      .withColumn("share",
        col("n_docs").cast("double") / col("n_source_docs").cast("double"))
      .filter(col("share") > lineShareMin)
      .select("source", "line", "n_docs", "n_source_docs", "share"))
  }

  val lineBoilerplateOracle: String =
    s"""WITH
       |$lineCtes
       |SELECT source, line, n_docs, n_source_docs, share FROM lflag""".stripMargin

  /** Line boilerplate APPLY — detect → REMOVE closed: every document
    * loses exactly its source's flagged lines (wherever they sit — mid
    * document included), everything else passes through byte-stable.
    *
    * Scale shape: the flagged report is a few lines per source and
    * BROADCASTS as a per-source array; the corpus side is one
    * membership-filter projection over the line arrays — no extra
    * shuffle beyond detection's own bounded aggs.
    */
  def lineBoilerplateApply(spark: SparkSession, sfDir: String): DataFrame = {
    val flagged = lineBoilerplate(spark, sfDir)
      .groupBy("source").agg(collect_set(col("line")).as("fl"))
    val cut = seededLines(spark, sfDir)
      .join(broadcast(flagged), Seq("source"), "left")
      .withColumn("kept",
        filter(col("lines"),
          l => !coalesce(array_contains(col("fl"), l), lit(false))))
    Canon.canonicalize(cut.select(
      col("doc_id"),
      concat_ws("\n", col("kept")).as("cleaned"),
      size(col("lines")).as("n_lines"),
      (size(col("lines")) - size(col("kept"))).as("n_removed_lines")))
  }

  val lineBoilerplateApplyOracle: String =
    s"""WITH
       |$lineCtes,
       |lfl AS (
       |  SELECT source, list(line) AS fl FROM lflag GROUP BY 1)
       |SELECT d.doc_id,
       |       array_to_string(
       |         list_filter(d.lines,
       |           l -> NOT coalesce(list_contains(f.fl, l), false)),
       |         chr(10)) AS cleaned,
       |       CAST(len(d.lines) AS BIGINT) AS n_lines,
       |       CAST(len(d.lines) -
       |            len(list_filter(d.lines,
       |              l -> NOT coalesce(list_contains(f.fl, l), false)))
       |         AS BIGINT) AS n_removed_lines
       |FROM llines d LEFT JOIN lfl f USING (source)""".stripMargin

  // ---- repetition signals ---------------------------------------------

  /** Gopher-style repetition thresholds: a document is flagged when its
    * single most frequent bigram occupies more than `topBigramFracMax` of
    * all bigram slots, or more than `dupTrigramFracMax` of its trigram
    * occurrences are repeats. (The published rules use 0.18 / 0.30 over
    * natural text; the synthetic fixture's vocabulary is ~20 words, so the
    * same *shape* of rule is exercised at thresholds matched to its
    * baseline repetition rates.)
    */
  val topBigramFracMax = 0.075
  val dupTrigramFracMax = 0.05

  /** n-gram slots of size `k`: positions k..n of the token array, each
    * joined with single spaces. Empty when the document has fewer than
    * `k` tokens (`sequence` would count DOWN for stop < start — the
    * guard is load-bearing, not defensive).
    */
  private[ext] def grams(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(k), size(toks)),
        i => concat_ws(" ", slice(toks, i - (k - 1), lit(k)))))
      .otherwise(array().cast("array<string>"))

  /** Per-document repetition signals over token n-grams:
    *
    *  - `dup_token_frac`: fraction of token occurrences whose token
    *    appears more than once in the document,
    *  - `top_bigram_frac`: the most frequent bigram's share of all bigram
    *    occurrences,
    *  - `dup_trigram_frac`: fraction of trigram occurrences that are
    *    repeats,
    *  - `flagged`: the filter decision at the thresholds above.
    *
    * One tagged gram stream feeds a single (doc, k, gram) count, then one
    * per-doc rollup — the three signals share both shuffles.
    */
  def repetition(spark: SparkSession, sfDir: String): DataFrame = {
    val d = documents(spark, sfDir)
      .repartition(col("doc_id")) // single-split fixture; the explode below is narrow
      .select(col("doc_id"), toksCol.as("toks"))
    val tagged = d.select(col("doc_id"), explode(flatten(array(
        Seq(1, 2, 3).map(k =>
          transform(grams(col("toks"), k),
            g => struct(lit(k).as("k"), g.as("gram")))): _*)))
        .as("kg"))
      .select(col("doc_id"), col("kg.k").as("k"), col("kg.gram").as("gram"))
    val counts = tagged
      .groupBy("doc_id", "k", "gram").agg(count(lit(1)).as("cnt"))
    def tot(k: Int) = sum(when(col("k") === k, col("cnt")))
    def dup(k: Int) = sum(when(col("k") === k && col("cnt") > 1, col("cnt")))
    val sig = counts.groupBy("doc_id").agg(
      tot(1).as("n1"), dup(1).as("dup1"),
      tot(2).as("n2"), max(when(col("k") === 2, col("cnt"))).as("top2"),
      tot(3).as("n3"), dup(3).as("dup3"))
    def frac(num: Column, den: Column): Column =
      when(coalesce(den, lit(0L)) > 0,
        coalesce(num, lit(0L)).cast("double") / den.cast("double"))
        .otherwise(lit(0.0))
    // total over the base table so token-less documents keep a row
    val out = documents(spark, sfDir).select("doc_id")
      .join(sig, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n1"), lit(0L)).as("n_tokens"),
        frac(col("dup1"), col("n1")).as("dup_token_frac"),
        frac(col("top2"), col("n2")).as("top_bigram_frac"),
        frac(col("dup3"), col("n3")).as("dup_trigram_frac"))
      .withColumn("flagged",
        col("top_bigram_frac") > topBigramFracMax ||
          col("dup_trigram_frac") > dupTrigramFracMax)
    Canon.canonicalize(out)
  }

  /** The repetition chain as a composable CTE block (ends in `f`, the
    * per-doc fraction table) — shared by [[repetitionOracle]] and the
    * preference-pair oracles ([[PrefOps]]), which use the fractions as
    * one of two annotators.
    */
  private[graft] val repCtes: String =
    s"""d AS (
       |  SELECT doc_id, $toksSql AS toks FROM documents),
       |g AS (
       |  SELECT doc_id, 1 AS k, u.gram FROM d, unnest(toks) AS u(gram)
       |  UNION ALL
       |  SELECT doc_id, 2, toks[i] || ' ' || toks[i+1]
       |  FROM d, unnest(range(1, len(toks))) AS r(i)
       |  UNION ALL
       |  SELECT doc_id, 3, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
       |  FROM d, unnest(range(1, len(toks) - 1)) AS r(i)),
       |c AS (
       |  SELECT doc_id, k, gram, count(*) AS cnt FROM g GROUP BY 1, 2, 3),
       |s AS (
       |  SELECT doc_id,
       |    sum(CASE WHEN k = 1 THEN cnt END) AS n1,
       |    sum(CASE WHEN k = 1 AND cnt > 1 THEN cnt END) AS dup1,
       |    sum(CASE WHEN k = 2 THEN cnt END) AS n2,
       |    max(CASE WHEN k = 2 THEN cnt END) AS top2,
       |    sum(CASE WHEN k = 3 THEN cnt END) AS n3,
       |    sum(CASE WHEN k = 3 AND cnt > 1 THEN cnt END) AS dup3
       |  FROM c GROUP BY 1),
       |f AS (
       |  SELECT documents.doc_id,
       |    CAST(coalesce(n1, 0) AS BIGINT) AS n_tokens,
       |    CASE WHEN coalesce(n1, 0) > 0
       |      THEN CAST(coalesce(dup1, 0) AS DOUBLE) / CAST(n1 AS DOUBLE)
       |      ELSE 0.0 END AS dup_token_frac,
       |    CASE WHEN coalesce(n2, 0) > 0
       |      THEN CAST(coalesce(top2, 0) AS DOUBLE) / CAST(n2 AS DOUBLE)
       |      ELSE 0.0 END AS top_bigram_frac,
       |    CASE WHEN coalesce(n3, 0) > 0
       |      THEN CAST(coalesce(dup3, 0) AS DOUBLE) / CAST(n3 AS DOUBLE)
       |      ELSE 0.0 END AS dup_trigram_frac
       |  FROM documents LEFT JOIN s USING (doc_id))""".stripMargin

  val repetitionOracle: String =
    s"""WITH $repCtes
       |SELECT *,
       |  top_bigram_frac > $topBigramFracMax
       |    OR dup_trigram_frac > $dupTrigramFracMax AS flagged
       |FROM f""".stripMargin

  // ---- benchmark decontamination --------------------------------------

  /** Token-gram size for contamination matching (the published
    * decontamination passes use 8–13-token grams) and the deterministic
    * "benchmark" membership rule for the fixture: every 10th document
    * plays the benchmark, the rest are the training corpus.
    */
  val decontGramTokens = 8
  val decontBenchMod = 10

  /** Flags training documents sharing any `decontGramTokens`-token gram
    * with the benchmark slice. Gram identity travels as md5(gram) — a
    * fixed-width 16-byte key instead of a variable-length string, which
    * is what the join should carry at corpus scale.
    *
    * The benchmark's distinct gram set is BROADCAST: benchmarks are
    * bounded (test sets, not corpora), so the training side — the 100 TB
    * side — is never shuffled; contamination counting is a map-side
    * broadcast probe plus one doc_id-keyed rollup.
    */
  /** Shared decontamination plumbing: one row per distinct (doc, gram)
    * with the gram as its md5 — BOTH variants build on this and on
    * [[assembleDecontOutput]], so tokenization/gram-size/bench-rule
    * tweaks cannot make the pair (which shares one oracle) diverge.
    */
  private def docGramRows(spark: SparkSession, sfDir: String): DataFrame =
    documents(spark, sfDir)
      .repartition(col("doc_id")) // single-split fixture; gram explode is narrow
      .select(col("doc_id"), toksCol.as("toks"))
      .select(col("doc_id"),
        explode(array_distinct(grams(col("toks"), decontGramTokens)))
          .as("gram"))
      .select(col("doc_id"), md5(col("gram")).as("gh"))

  private def isBench = col("doc_id") % decontBenchMod === 0

  private def assembleDecontOutput(spark: SparkSession, sfDir: String,
                                   hits: DataFrame): DataFrame =
    documents(spark, sfDir).select("doc_id").filter(!isBench)
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared_grams"),
        (coalesce(col("n_shared"), lit(0L)) > 0).as("contaminated"))

  def decontaminate(spark: SparkSession, sfDir: String): DataFrame = {
    val gramRows = docGramRows(spark, sfDir)
    val bench = gramRows.filter(isBench).select("gh").distinct()
      .withColumn("hit", lit(1L))
    val hits = gramRows.filter(!isBench)
      .join(broadcast(bench), Seq("gh"), "left")
      .groupBy("doc_id").agg(sum("hit").as("n_shared"))
    Canon.canonicalize(assembleDecontOutput(spark, sfDir, hits))
  }

  val decontaminateOracle: String = {
    val g = decontGramTokens
    s"""WITH d AS (
       |  SELECT doc_id, $toksSql AS toks FROM documents),
       |g AS (
       |  SELECT DISTINCT doc_id,
       |    md5(array_to_string(list_slice(toks, i, i + ${g - 1}), ' ')) AS gh
       |  FROM d, unnest(range(1, len(toks) - ${g - 2})) AS r(i)),
       |bench AS (
       |  SELECT DISTINCT gh FROM g WHERE doc_id % $decontBenchMod = 0),
       |h AS (
       |  SELECT t.doc_id, count(bench.gh) AS n_shared
       |  FROM (SELECT * FROM g WHERE doc_id % $decontBenchMod <> 0) t
       |  LEFT JOIN bench ON t.gh = bench.gh
       |  GROUP BY 1)
       |SELECT documents.doc_id,
       |  CAST(coalesce(n_shared, 0) AS BIGINT) AS n_shared_grams,
       |  coalesce(n_shared, 0) > 0 AS contaminated
       |FROM documents LEFT JOIN h USING (doc_id)
       |WHERE doc_id % $decontBenchMod <> 0""".stripMargin
  }

  /** Per-document n-gram NOVELTY — the corpus-order memorization
    * telemetry: for each doc, the share of its distinct
    * [[decontGramTokens]]-token grams whose FIRST corpus occurrence
    * (min doc_id over owners) is this doc. Low novelty means the doc
    * restates earlier content — the per-doc rollup of the signal
    * [[graft.ext.DedupOps.dupSpans]] reports span-by-span, and the
    * doc-granular complement of keep-first paragraph dedup
    * ([[graft.ext.ParaOps]]): those REMOVE redundancy, this PRICES it
    * for selection/weighting (e.g. as a [[SampleOps.budgetSelect]]
    * quality ingredient).
    *
    * Scale shape: explode distinct grams per doc (md5-keyed so the
    * exchange is fixed-width), ONE gram-keyed min-aggregation with
    * map-side combine for the first-owner table, one gram-keyed join
    * back, one doc-keyed rollup — all hash exchanges linear in corpus
    * grams; no all-pairs, no sort.
    */
  def docNovelty(spark: SparkSession, sfDir: String): DataFrame = {
    val d = documents(spark, sfDir)
      .repartition(col("doc_id")) // single-split fixture; explode is narrow
      .select(col("doc_id"), toksCol.as("toks"))
    val ex = d.select(col("doc_id"),
      explode(array_distinct(grams(col("toks"), decontGramTokens)))
        .as("gram"))
      .select(col("doc_id"), md5(col("gram")).as("gh"))
      .persist() // fan-out: first-owner agg + the attribution join
    val firstOwner = ex.groupBy("gh").agg(min("doc_id").as("first_doc"))
    val out = ex.join(firstOwner, Seq("gh"))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty_rate",
        col("n_novel").cast("double") / col("n_grams").cast("double"))
    Canon.materialized(Canon.canonicalize(out), ex)
  }

  val docNoveltyOracle: String = {
    val g = decontGramTokens
    s"""WITH nd AS (
       |  SELECT doc_id, $toksSql AS toks FROM documents),
       |ng AS (
       |  SELECT DISTINCT doc_id,
       |    md5(array_to_string(list_slice(toks, i, i + ${g - 1}), ' ')) AS gh
       |  FROM nd, unnest(range(1, len(toks) - ${g - 2})) AS r(i)),
       |nf AS (
       |  SELECT gh, min(doc_id) AS first_doc FROM ng GROUP BY 1)
       |SELECT ng.doc_id,
       |       CAST(count(*) AS BIGINT) AS n_grams,
       |       CAST(count(*) FILTER (WHERE nf.first_doc = ng.doc_id)
       |         AS BIGINT) AS n_novel,
       |       CAST(count(*) FILTER (WHERE nf.first_doc = ng.doc_id)
       |         AS DOUBLE) / CAST(count(*) AS DOUBLE) AS novelty_rate
       |FROM ng JOIN nf USING (gh)
       |GROUP BY 1""".stripMargin
  }

  /** SPAN-LEVEL decontamination APPLY: instead of dropping a
    * contaminated training document wholesale ([[decontaminate]] flags,
    * a curation pass drops), CUT the contaminated spans out — every
    * `decontGramTokens`-token span whose gram appears anywhere in the
    * benchmark slice is removed (overlapping spans union their token
    * ranges) and the surviving tokens are stitched back together. This
    * is the published exact-substring decontamination remedy: the
    * 2%-contaminated document keeps its 98%.
    *
    * Scale shape: the benchmark gram set is BROADCAST (bounded — test
    * sets, not corpora) exactly as in [[decontaminate]]; the surgery is
    * [[DedupOps.spanSurgery]]'s keyed anti-join + per-doc rebuild.
    * Benchmark documents are excluded from the output (they are not
    * training data).
    */
  def decontaminateSpans(spark: SparkSession, sfDir: String): DataFrame =
    decontaminateSpansDocs(documents(spark, sfDir))

  private[ext] def decontaminateSpansDocs(docs: DataFrame): DataFrame = {
    val d = docs.repartition(col("doc_id"))
      .select(col("doc_id"), toksCol.as("toks"))
      .persist() // span scan + token stream + stats base
    val spans = d.select(col("doc_id"),
        posexplode(grams(col("toks"), decontGramTokens))
          .as(Seq("i0", "gram")))
      .select(col("doc_id"), col("i0"), md5(col("gram")).as("gh"))
    val bench = spans.filter(isBench).select("gh").distinct()
    val removedPos = spans.filter(!isBench)
      .join(broadcast(bench), Seq("gh"))
      .select(col("doc_id"),
        explode(sequence(col("i0"), col("i0") + lit(decontGramTokens - 1)))
          .as("pos"))
      .distinct()
    val out = DedupOps.spanSurgery(d.filter(!isBench), removedPos)
    Canon.materialized(Canon.canonicalize(out), d)
  }

  val decontaminateSpansOracle: String = {
    val g = decontGramTokens
    s"""WITH d AS (
       |  SELECT doc_id, $toksSql AS toks FROM documents),
       |gr AS MATERIALIZED (
       |  SELECT doc_id, i,
       |    md5(array_to_string(list_slice(toks, i, i + ${g - 1}), ' ')) AS gh
       |  FROM d, unnest(range(1, len(toks) - ${g - 2})) AS r(i)),
       |bench AS MATERIALIZED (
       |  SELECT DISTINCT gh FROM gr WHERE doc_id % $decontBenchMod = 0),
       |lsp AS (
       |  SELECT gr.doc_id, gr.i FROM gr JOIN bench USING (gh)
       |  WHERE gr.doc_id % $decontBenchMod <> 0),
       |rp AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, i + o AS pos
       |  FROM lsp, unnest(range(0, $g)) AS t(o)),
       |tok AS (
       |  SELECT doc_id, i AS pos, toks[i] AS tok
       |  FROM d, unnest(range(1, len(toks) + 1)) AS t(i)
       |  WHERE doc_id % $decontBenchMod <> 0),
       |kept AS (
       |  SELECT t.doc_id, t.pos, t.tok
       |  FROM tok t LEFT JOIN rp ON t.doc_id = rp.doc_id AND t.pos = rp.pos
       |  WHERE rp.doc_id IS NULL),
       |cl AS (
       |  SELECT doc_id, count(*) AS n_kept,
       |         string_agg(tok, ' ' ORDER BY pos) AS cleaned
       |  FROM kept GROUP BY 1),
       |base AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM d
       |  WHERE doc_id % $decontBenchMod <> 0)
       |SELECT base.doc_id, n_tokens,
       |       CAST(n_tokens - coalesce(n_kept, 0) AS BIGINT) AS n_removed,
       |       CASE WHEN n_tokens > 0
       |         THEN CAST(n_tokens - coalesce(n_kept, 0) AS DOUBLE)
       |                / CAST(n_tokens AS DOUBLE)
       |         ELSE 0.0 END AS removed_frac,
       |       coalesce(cleaned, '') AS cleaned
       |FROM base LEFT JOIN cl USING (doc_id)""".stripMargin
  }

  /** Contamination-ratio flag threshold: a training document whose
    * benchmark-gram overlap exceeds this fraction of its own distinct
    * grams is flagged. The binary [[decontaminate]] flag is the
    * conservative gate (any shared gram); the RATIO is what published
    * decontamination passes threshold on when exact-match removal is
    * too aggressive (boilerplate grams shared with benchmark prompts).
    */
  val contamRatioMax = 0.1

  /** Graduated contamination score per training document: the fraction
    * of its distinct `decontGramTokens`-token grams that appear
    * anywhere in the benchmark slice, plus the threshold flag.
    *
    * Same scale shape as [[decontaminate]] — benchmark gram set
    * broadcast, training side map-side probed, one doc_id-keyed
    * rollup; the ratio adds only per-row arithmetic (two exact
    * integer counts divided once, bit-deterministic).
    */
  def contaminationScore(spark: SparkSession, sfDir: String): DataFrame = {
    val gramRows = docGramRows(spark, sfDir)
    val bench = gramRows.filter(isBench).select("gh").distinct()
      .withColumn("hit", lit(1L))
    val scored = gramRows.filter(!isBench)
      .join(broadcast(bench), Seq("gh"), "left")
      .groupBy("doc_id").agg(
        count(lit(1)).as("g"),
        sum(coalesce(col("hit"), lit(0L))).as("sh"))
    val out = documents(spark, sfDir).select("doc_id").filter(!isBench)
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("g"), lit(0L)).as("n_grams"),
        coalesce(col("sh"), lit(0L)).as("n_shared_grams"),
        when(coalesce(col("g"), lit(0L)) > 0,
          coalesce(col("sh"), lit(0L)).cast("double") /
            coalesce(col("g"), lit(0L)).cast("double"))
          .otherwise(lit(0.0)).as("contamination"))
      .withColumn("flagged", col("contamination") > contamRatioMax)
    Canon.canonicalize(out)
  }

  val contaminationScoreOracle: String = {
    val g = decontGramTokens
    s"""WITH d AS (
       |  SELECT doc_id, $toksSql AS toks FROM documents),
       |g AS (
       |  SELECT DISTINCT doc_id,
       |    md5(array_to_string(list_slice(toks, i, i + ${g - 1}), ' ')) AS gh
       |  FROM d, unnest(range(1, len(toks) - ${g - 2})) AS r(i)),
       |bench AS (
       |  SELECT DISTINCT gh FROM g WHERE doc_id % $decontBenchMod = 0),
       |h AS (
       |  SELECT t.doc_id, count(*) AS g,
       |         count(bench.gh) AS sh
       |  FROM (SELECT * FROM g WHERE doc_id % $decontBenchMod <> 0) t
       |  LEFT JOIN bench ON t.gh = bench.gh
       |  GROUP BY 1)
       |SELECT documents.doc_id,
       |  CAST(coalesce(g, 0) AS BIGINT) AS n_grams,
       |  CAST(coalesce(sh, 0) AS BIGINT) AS n_shared_grams,
       |  CASE WHEN coalesce(g, 0) > 0
       |       THEN CAST(coalesce(sh, 0) AS DOUBLE)
       |            / CAST(coalesce(g, 0) AS DOUBLE)
       |       ELSE 0.0 END AS contamination,
       |  (CASE WHEN coalesce(g, 0) > 0
       |        THEN CAST(coalesce(sh, 0) AS DOUBLE)
       |             / CAST(coalesce(g, 0) AS DOUBLE)
       |        ELSE 0.0 END) > $contamRatioMax AS flagged
       |FROM documents LEFT JOIN h USING (doc_id)
       |WHERE doc_id % $decontBenchMod <> 0""".stripMargin
  }

  /** False-positive probability of the decontamination Bloom pre-filter:
    * ~10.5 bits/element at 1%, vs the 128-bit md5 keys the exact
    * broadcast set carries — a 12× smaller executor-resident structure.
    */
  val decontBloomFpp = 0.01

  /** [[decontaminate]] with a Bloom-filter pre-filter — the shape that
    * survives when the benchmark side outgrows an exact broadcast set.
    *
    * The benchmark's distinct gram hashes are folded into a Bloom filter
    * (distributed `stat.bloomFilter` tree-aggregation; the driver holds
    * only the final bit array) and broadcast. The corpus side — the
    * 100 TB side — drops every gram the filter rejects BEFORE any join:
    * no false negatives (Bloom guarantee), so all true hits survive, and
    * the ≤ `decontBloomFpp` false-positive survivors are eliminated by
    * the exact join that follows. At fixture scale that join is the same
    * broadcast probe as [[decontaminate]]; past broadcast reach it
    * becomes a shuffle join whose corpus side is already filtered to
    * ~(true hits + 1% of grams) — the Bloom is what keeps that shuffle
    * tiny. Output is row-identical to [[decontaminate]] (same oracle).
    *
    * The membership probe is a Scala UDF: Spark exposes no public
    * bloom-membership function (`might_contain` backs internal runtime
    * filtering only), and the probe is a handful of bit tests per row —
    * not worth a custom expression; the join it guards dominates.
    */
  def decontaminateBloom(spark: SparkSession, sfDir: String): DataFrame = {
    val gramRows = docGramRows(spark, sfDir)
    val bench = gramRows.filter(isBench).select("gh").distinct().persist()
    val bloom = bench.stat.bloomFilter(
      "gh", math.max(bench.count(), 1L), decontBloomFpp)
    val bloomBc = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((gh: String) => bloomBc.value.mightContainString(gh))
    val hits = gramRows.filter(!isBench)
      .filter(mightContain(col("gh")))
      .join(broadcast(bench), Seq("gh")) // exact verify kills Bloom FPs
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    val result = Canon.materialized(
      Canon.canonicalize(assembleDecontOutput(spark, sfDir, hits)), bench)
    // the result is materialized, so the executor copies of the Bloom are
    // dead weight — without this, repeated invocations (bench passes, the
    // corpus chain) accumulate benchmark-sized broadcasts on executors.
    // unpersist, NOT destroy: the returned frame's lineage still references
    // the broadcast and may legitimately re-execute (cache eviction); a
    // destroyed broadcast would fail that re-run, an unpersisted one
    // re-ships on demand.
    bloomBc.unpersist(false)
    result
  }

  // ---- sequence packing ------------------------------------------------

  /** Token budget per training pack, and the number of doc_id hash shards
    * packing runs over. Packing is CONTIGUOUS-FILL: within each
    * (lang, shard), documents in doc_id order are laid end to end and a
    * document belongs to the pack where its cumulative start offset
    * falls — so every pack holds ≥ budget tokens' worth of starts and a
    * document may overflow its pack by up to its own length (the standard
    * streaming trade; exact first-fit is inherently sequential).
    *
    * Sharding is the 100 TB lever: the running-sum window partitions on
    * (lang, shard), so no partition exceeds 1/`packShards` of a
    * language — raise `packShards` with corpus size and the plan is
    * unchanged. Determinism: shard membership is a pure function of
    * doc_id, so results are reproducible under any input partitioning.
    */
  val packBudgetTokens = 256
  val packShards = 8

  def packSequences(spark: SparkSession, sfDir: String): DataFrame = {
    val d = documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), size(toksCol).as("n_tokens"))
      .withColumn("shard", col("doc_id") % packShards)
    val byShard = Window.partitionBy("lang", "shard").orderBy("doc_id")
    val packed = d
      .withColumn("start_tok",
        coalesce(sum("n_tokens").over(
          byShard.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("bin", expr(s"start_tok div $packBudgetTokens"))
      .withColumn("pack_id",
        concat_ws("#", col("lang"), col("shard"), col("bin")))
    val byPack = Window.partitionBy("lang", "shard", "bin")
    val out = packed
      .withColumn("pack_pos",
        row_number().over(byPack.orderBy("doc_id")))
      .withColumn("pack_tokens", sum("n_tokens").over(byPack))
      .select("doc_id", "lang", "n_tokens", "pack_id", "pack_pos",
        "pack_tokens")
    Canon.canonicalize(out)
  }

  val packSequencesOracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, lang, len($toksSql) AS n_tokens,
       |         doc_id % $packShards AS shard
       |  FROM documents),
       |s AS (
       |  SELECT *,
       |    coalesce(sum(n_tokens) OVER (
       |      PARTITION BY lang, shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS start_tok
       |  FROM d),
       |b AS (
       |  SELECT *, start_tok // $packBudgetTokens AS bin FROM s)
       |SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  lang || '#' || shard || '#' || bin AS pack_id,
       |  CAST(row_number() OVER (PARTITION BY lang, shard, bin
       |                          ORDER BY doc_id) AS BIGINT) AS pack_pos,
       |  CAST(sum(n_tokens) OVER (PARTITION BY lang, shard, bin) AS BIGINT)
       |    AS pack_tokens
       |FROM b""".stripMargin

  // ---- length-bucketed batching ---------------------------------------

  /** Batch size for [[lengthBatches]]. */
  val lenBatchSize = 8

  /** Power-of-two length-bucket boundaries (tokens): a doc with
    * n ∈ (2^k−1, 2^k] lands in bucket k, capped at the last bound.
    * A CASE chain over fixed integers — no log2(), which is not
    * cross-engine-exact.
    */
  val lenBucketBounds: Seq[Int] = Seq(8, 16, 32, 64, 128, 256, 512, 1024)

  /** LENGTH-BUCKETED BATCHING — the inference-side twin of sequence
    * packing: group documents of similar token length into fixed-size
    * batches so per-batch padding (every sequence padded to the batch
    * max) stays small. Emits each doc's bucket, batch, the batch's max
    * length, and its own padding cost — the number a serving/eval
    * harness sums to size the win vs naive-order batching.
    *
    * Scale shape: one token-count projection, then the packSequences
    * window discipline — batches are assigned within (lang, shard,
    * bucket) with shard = doc_id mod [[packShards]], so no partition
    * exceeds 1/packShards of a language-bucket; raise packShards with
    * corpus size, plan unchanged.
    */
  def lengthBatches(spark: SparkSession, sfDir: String): DataFrame = {
    val bucket = lenBucketBounds.zipWithIndex.foldRight(
      lit(lenBucketBounds.length - 1)) { case ((bound, i), acc) =>
      when(col("n_tokens") <= bound, i).otherwise(acc)
    }
    val d = documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), size(toksCol).as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("shard", col("doc_id") % packShards)
      .withColumn("len_bucket", bucket.cast("long"))
    val batched = d
      .withColumn("batch_no",
        expr(s"(row_number() OVER (PARTITION BY lang, shard, len_bucket" +
          s" ORDER BY doc_id) - 1) div $lenBatchSize"))
      .withColumn("batch_id",
        concat_ws("#", col("lang"), col("shard"), col("len_bucket"),
          col("batch_no")))
    val byBatch = Window.partitionBy("lang", "shard", "len_bucket",
      "batch_no")
    Canon.canonicalize(batched
      .withColumn("batch_max", max("n_tokens").over(byBatch))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("len_bucket"), col("batch_id"), col("batch_max"),
        (col("batch_max") - col("n_tokens")).as("pad_tokens")))
  }

  val lengthBatchesOracle: String = {
    val bucketCase = lenBucketBounds.zipWithIndex
      .map { case (bound, i) => s"WHEN n_tokens <= $bound THEN $i" }
      .mkString(" ")
    s"""WITH d AS (
       |  SELECT doc_id, lang, len($toksSql) AS n_tokens,
       |         doc_id % $packShards AS shard
       |  FROM documents),
       |b AS (
       |  SELECT *, CAST(CASE $bucketCase
       |    ELSE ${lenBucketBounds.length - 1} END AS BIGINT) AS len_bucket
       |  FROM d WHERE n_tokens > 0),
       |n AS (
       |  SELECT *,
       |    (row_number() OVER (PARTITION BY lang, shard, len_bucket
       |       ORDER BY doc_id) - 1) // $lenBatchSize AS batch_no
       |  FROM b)
       |SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  len_bucket,
       |  lang || '#' || shard || '#' || len_bucket || '#' || batch_no
       |    AS batch_id,
       |  CAST(max(n_tokens) OVER (PARTITION BY lang, shard, len_bucket,
       |    batch_no) AS BIGINT) AS batch_max,
       |  CAST(max(n_tokens) OVER (PARTITION BY lang, shard, len_bucket,
       |    batch_no) - n_tokens AS BIGINT) AS pad_tokens
       |FROM n""".stripMargin
  }

  // ---- Gopher quality rule suite --------------------------------------

  /** The published Gopher pre-training quality rules (Rae et al. 2021,
    * "Scaling Language Models: Methods, Analysis & Insights from
    * Training Gopher", Appendix A) — the de-facto standard heuristic
    * filter battery every large crawl pipeline runs before training.
    * Thresholds are the paper's.
    */
  val gopherMinWords = 50
  val gopherMaxWords = 100000
  val gopherMinMeanLen = 3.0
  val gopherMaxMeanLen = 10.0
  val gopherMaxSymbolRatio = 0.1
  val gopherMaxBulletShare = 0.9
  val gopherMaxEllipsisShare = 0.3
  val gopherMinAlphaShare = 0.8
  val gopherMinStopHits = 2

  /** The paper's 8-word stopword probe list (rule: a doc must contain at
    * least [[gopherMinStopHits]] distinct of these).
    */
  val gopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Seeded line structure for the two LINE-level Gopher rules: the
    * fixture has no bullet lists or ellipsis-truncated lines, so on top
    * of [[seededLines]] every line of doc_id ≡ 3 (mod 11) gets a "- "
    * bullet prefix (bullet share 1.0 > 0.9 → rule fails) and every line
    * of doc_id ≡ 4 (mod 13) gets a trailing " ..." (ellipsis share 1.0
    * > 0.3 → fails; the '...' tokens also push symbol-to-word ratio over
    * 0.1 for short docs, exercising that rule's failure path too).
    * Moduli 11/13 are coprime to the seeding moduli 3/7 and the source
    * modulus 10, so the new seeds hit every source and both
    * banner/footer states.
    */
  private def gopherSeeded(spark: SparkSession, sfDir: String): DataFrame =
    seededLines(spark, sfDir)
      .withColumn("lines",
        when(col("doc_id") % 11 === 3,
          transform(col("lines"), l => concat(lit("- "), l)))
          .otherwise(col("lines")))
      .withColumn("lines",
        when(col("doc_id") % 13 === 4,
          transform(col("lines"), l => concat(l, lit(" ..."))))
          .otherwise(col("lines")))

  /** GOPHER RULE SUITE over the seeded corpus: every rule's measurement
    * as a column, failures as a bitmask (bit order = paper order), and
    * the overall keep/drop verdict.
    *
    * Determinism: every ratio is ONE division of two exact integers —
    * IEEE nearest is bit-identical in Spark and DuckDB (the datasetCard
    * discipline); no data-ordered double accumulation anywhere.
    *
    * Scale shape: zero exchanges — the whole suite (seeding included) is
    * one codegen'd projection per document; at 100 TB this is a pure
    * map-side scan that rides along with any other per-doc work.
    */
  def gopherRules(spark: SparkSession, sfDir: String): DataFrame = {
    val ws = split(array_join(col("lines"), " "), " ")
    val m = gopherSeeded(spark, sfDir)
      .withColumn("ws", ws)
      .withColumn("n_lines", size(col("lines")).cast("long"))
      .withColumn("n_words", size(col("ws")).cast("long"))
      .withColumn("sum_len",
        aggregate(col("ws"), lit(0L), (a, w) => a + length(w).cast("long")))
      .withColumn("n_sym",
        size(filter(col("ws"), w => w === "..." || w === "#")).cast("long"))
      .withColumn("n_bullet",
        size(filter(col("lines"), l => l.startsWith("- "))).cast("long"))
      .withColumn("n_ell",
        size(filter(col("lines"), l => l.endsWith("..."))).cast("long"))
      .withColumn("n_alpha",
        size(filter(col("ws"), w => w.rlike("[a-z]"))).cast("long"))
      .withColumn("n_stop_hits",
        size(filter(array(gopherStops.map(lit): _*),
          s => array_contains(col("ws"), s))).cast("long"))
      .withColumn("wd", greatest(col("n_words"), lit(1L)).cast("double"))
      .withColumn("ld", greatest(col("n_lines"), lit(1L)).cast("double"))
      .withColumn("mean_word_len", col("sum_len").cast("double") / col("wd"))
      .withColumn("symbol_ratio", col("n_sym").cast("double") / col("wd"))
      .withColumn("bullet_share", col("n_bullet").cast("double") / col("ld"))
      .withColumn("ellipsis_share", col("n_ell").cast("double") / col("ld"))
      .withColumn("alpha_share", col("n_alpha").cast("double") / col("wd"))
      .withColumn("fail_mask",
        when(col("n_words") < gopherMinWords ||
          col("n_words") > gopherMaxWords, 1L).otherwise(0L) +
        when(col("mean_word_len") < gopherMinMeanLen ||
          col("mean_word_len") > gopherMaxMeanLen, 2L).otherwise(0L) +
        when(col("symbol_ratio") > gopherMaxSymbolRatio, 4L).otherwise(0L) +
        when(col("bullet_share") > gopherMaxBulletShare, 8L).otherwise(0L) +
        when(col("ellipsis_share") > gopherMaxEllipsisShare, 16L)
          .otherwise(0L) +
        when(col("alpha_share") < gopherMinAlphaShare, 32L).otherwise(0L) +
        when(col("n_stop_hits") < gopherMinStopHits, 64L).otherwise(0L))
    Canon.canonicalize(m.select(
      col("doc_id"), col("n_lines"), col("n_words"),
      col("mean_word_len"), col("symbol_ratio"), col("bullet_share"),
      col("ellipsis_share"), col("alpha_share"), col("n_stop_hits"),
      col("fail_mask"), (col("fail_mask") === 0L).as("pass")))
  }

  val gopherRulesOracle: String = {
    val stopsSql = gopherStops.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""WITH
       |$lineSeedCtes,
       |gb AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 11 = 3
       |              THEN list_transform(lines, l -> '- ' || l)
       |              ELSE lines END AS lines
       |  FROM llines),
       |ge AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 13 = 4
       |              THEN list_transform(lines, l -> l || ' ...')
       |              ELSE lines END AS lines
       |  FROM gb),
       |gw AS (
       |  SELECT doc_id, lines,
       |         string_split(array_to_string(lines, ' '), ' ') AS ws
       |  FROM ge),
       |gm AS (
       |  SELECT doc_id,
       |    CAST(len(lines) AS BIGINT) AS n_lines,
       |    CAST(len(ws) AS BIGINT) AS n_words,
       |    CAST(list_sum(list_transform(ws, w -> len(w))) AS BIGINT)
       |      AS sum_len,
       |    CAST(len(list_filter(ws, w -> w = '...' OR w = '#')) AS BIGINT)
       |      AS n_sym,
       |    CAST(len(list_filter(lines, l -> l LIKE '- %')) AS BIGINT)
       |      AS n_bullet,
       |    CAST(len(list_filter(lines, l -> l LIKE '%...')) AS BIGINT)
       |      AS n_ell,
       |    CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-z]')))
       |      AS BIGINT) AS n_alpha,
       |    CAST(len(list_filter($stopsSql,
       |      s -> list_contains(ws, s))) AS BIGINT) AS n_stop_hits
       |  FROM gw),
       |gr AS (
       |  SELECT *,
       |    CAST(sum_len AS DOUBLE) /
       |      CAST(greatest(n_words, 1) AS DOUBLE) AS mean_word_len,
       |    CAST(n_sym AS DOUBLE) /
       |      CAST(greatest(n_words, 1) AS DOUBLE) AS symbol_ratio,
       |    CAST(n_bullet AS DOUBLE) /
       |      CAST(greatest(n_lines, 1) AS DOUBLE) AS bullet_share,
       |    CAST(n_ell AS DOUBLE) /
       |      CAST(greatest(n_lines, 1) AS DOUBLE) AS ellipsis_share,
       |    CAST(n_alpha AS DOUBLE) /
       |      CAST(greatest(n_words, 1) AS DOUBLE) AS alpha_share
       |  FROM gm),
       |gf AS (
       |  SELECT *,
       |    CAST(CASE WHEN n_words < $gopherMinWords
       |              OR n_words > $gopherMaxWords THEN 1 ELSE 0 END
       |       + CASE WHEN mean_word_len < $gopherMinMeanLen
       |              OR mean_word_len > $gopherMaxMeanLen THEN 2 ELSE 0 END
       |       + CASE WHEN symbol_ratio > $gopherMaxSymbolRatio
       |              THEN 4 ELSE 0 END
       |       + CASE WHEN bullet_share > $gopherMaxBulletShare
       |              THEN 8 ELSE 0 END
       |       + CASE WHEN ellipsis_share > $gopherMaxEllipsisShare
       |              THEN 16 ELSE 0 END
       |       + CASE WHEN alpha_share < $gopherMinAlphaShare
       |              THEN 32 ELSE 0 END
       |       + CASE WHEN n_stop_hits < $gopherMinStopHits
       |              THEN 64 ELSE 0 END AS BIGINT) AS fail_mask
       |  FROM gr)
       |SELECT doc_id, n_lines, n_words, mean_word_len, symbol_ratio,
       |       bullet_share, ellipsis_share, alpha_share, n_stop_hits,
       |       fail_mask, fail_mask = 0 AS pass
       |FROM gf""".stripMargin
  }
}
