package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Canon

/** URL → registered-domain canonicalization and per-domain governance
  * rollups — the crawl-side budgeting axis `source` cannot provide: a
  * crawl's provenance is a URL, and per-DOMAIN doc/token counts and
  * duplicate rates are what source caps and mixture weights key on in
  * a web-scale corpus (cf. the per-source machinery at
  * [[TextOps.sourceCap]] / [[SampleOps.mixturePlan]]).
  *
  * The fixture corpus carries no URL column, so the query SEEDS one
  * deterministically per document (five shapes exercising scheme case,
  * `www.` prefixes, ports, paths/queries/fragments and two-level
  * TLDs), built by identical string arithmetic in both engines — the
  * ShingleHashes inline-constant discipline applied to strings. A
  * deployment replaces [[urlOf]] with its real URL column; everything
  * downstream is column-generic.
  *
  * REGISTERED-DOMAIN APPROXIMATION (documented, no public-suffix-list
  * dependency): lowercase; strip scheme, one leading `www.`, port and
  * path/query/fragment; then keep the last TWO host labels, or the
  * last THREE when the last two form one of [[twoLevelSuffixes]] — a
  * small inlined subset of the PSL's two-level suffixes. Divergences
  * from the full PSL (e.g. `blogspot.com.au` is itself a public
  * suffix there) are accepted and documented here: the approximation
  * is stable, dependency-free, and identical in both engines.
  *
  * Scale shape: canonicalization is a per-row codegen'd string
  * projection (no shuffle); the rollup is one keyed aggregation on
  * the registered domain with map-side combine, joined to the
  * exact-duplicate SHA table ([[TextOps.dedupExact]] semantics) that
  * is itself one keyed aggregation — two shuffles total at any scale,
  * both on bounded-cardinality keys (domains, SHAs).
  */
object DomainOps {

  /** Two-level suffixes recognized by the approximation (see object
    * scaladoc for the contract and its documented PSL divergences).
    */
  val twoLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "gov.uk", "ac.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "co.in", "co.nz", "com.br", "com.mx")

  /** Deterministic seeded URL: five shapes keyed on doc_id % 5. */
  private[ext] def urlOf: Column = {
    val id = col("doc_id").cast("string")
    val m = (col("doc_id") % 5).cast("int")
    when(m === 0, concat(lit("https://www."), col("source"),
        lit(".example.com/p/"), id))
      .when(m === 1, concat(lit("http://news."), col("source"),
        lit(".co.uk/a?id="), id))
      .when(m === 2, concat(lit("HTTPS://CDN-"),
        (col("doc_id") % 7).cast("string"), lit("."), col("source"),
        lit(".ORG:8443/x/y")))
      .when(m === 3, concat(lit("https://"), col("source"),
        (col("doc_id") % 3).cast("string"), lit(".blogspot.com.au/p#f")))
      .otherwise(concat(lit("http://www.m."), col("source"), lit(".io/")))
  }

  /** The seeded URL in DuckDB SQL — the string twin of [[urlOf]].
    * NOTE: this string is interpolated into templates that call
    * `stripMargin` themselves, so no line may START with `|` (a
    * leading `||` concat would be eaten by the outer strip) — the
    * concat operators sit at line ENDS.
    */
  private[ext] val urlSql: String =
    """CASE doc_id % 5
      |  WHEN 0 THEN 'https://www.' || source || '.example.com/p/' || doc_id
      |  WHEN 1 THEN 'http://news.' || source || '.co.uk/a?id=' || doc_id
      |  WHEN 2 THEN 'HTTPS://CDN-' || (doc_id % 7) || '.' || source ||
      |              '.ORG:8443/x/y'
      |  WHEN 3 THEN 'https://' || source || (doc_id % 3) ||
      |              '.blogspot.com.au/p#f'
      |  ELSE 'http://www.m.' || source || '.io/'
      |END""".stripMargin

  /** Canonical host: lowercase, scheme stripped, cut at the first of
    * `/ ? # :` (path/query/fragment/port), one leading `www.` removed.
    */
  private[ext] def canonicalHost(url: Column): Column =
    regexp_replace(
      regexp_extract(
        regexp_replace(lower(url), "^[a-z][a-z0-9+.-]*://", ""),
        "^[^/?#:]*", 0),
      "^www\\.", "")

  private[ext] def canonicalHostSql(url: String): String =
    s"""regexp_replace(
       |  regexp_extract(
       |    regexp_replace(lower($url), '^[a-z][a-z0-9+.-]*://', ''),
       |    '^[^/?#:]*'),
       |  '^www\\.', '')""".stripMargin

  /** Registered domain under the two-level-suffix approximation. */
  private[ext] def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", slice(labels, -2, 2))
    val last3 = concat_ws(".", slice(labels, -3, 3))
    when(n >= 3 && last2.isin(twoLevelSuffixes: _*), last3)
      .when(n >= 2, last2)
      .otherwise(host)
  }

  private[ext] def registeredDomainSql(host: String): String = {
    val suffixes = twoLevelSuffixes.map(s => s"'$s'").mkString(", ")
    s"""CASE
       |  WHEN len(string_split($host, '.')) >= 3
       |       AND array_to_string(string_split($host, '.')[-2:], '.')
       |           IN ($suffixes)
       |  THEN array_to_string(string_split($host, '.')[-3:], '.')
       |  WHEN len(string_split($host, '.')) >= 2
       |  THEN array_to_string(string_split($host, '.')[-2:], '.')
       |  ELSE $host
       |END""".stripMargin
  }

  /** Per-registered-domain governance rollup: document count, token
    * count, exact-duplicate document count (docs whose normalized-text
    * SHA occurs more than once IN THE CORPUS — the
    * [[TextOps.dedupExact]] notion, attributed back to domains), and
    * the duplicate rate — the table a crawl budget reads before
    * assigning per-domain caps or mixture weights.
    */
  /** Per-domain (n_docs, n_tokens, n_dup_docs) counts — the shared
    * core of [[domainRollup]] and [[domainMix]]. Returned MATERIALIZED;
    * callers release via [[Canon.materialized]].
    */
  private def domainCounts(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val d = TextOps.documents(spark, sfDir)
      .repartition(col("doc_id"))
      .withColumn("norm", TextOps.normText(col("text")))
      .select(col("doc_id"),
        registeredDomain(canonicalHost(urlOf)).as("domain"),
        size(filter(split(col("norm"), " "), t => t =!= ""))
          .cast("long").as("n_toks"),
        sha2(col("norm"), 256).as("text_sha"))
      .persist()
    val dupSha = d.groupBy("text_sha")
      .agg(count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .select("text_sha")
    // NO broadcast hint: the duplicated-SHA set is corpus-bounded, not
    // model-bounded — a plain shuffled hash join on the SHA key scales
    Canon.materialized(
      d.join(dupSha.withColumn("is_dup", lit(1L)),
          Seq("text_sha"), "left")
        .groupBy("domain").agg(
          count(lit(1)).as("n_docs"),
          sum("n_toks").as("n_tokens"),
          sum(coalesce(col("is_dup"), lit(0L))).as("n_dup_docs")),
      d)
  }

  def domainRollup(spark: SparkSession, sfDir: String): DataFrame = {
    val c = domainCounts(spark, sfDir)
    val out = c.select(col("domain"), col("n_docs"), col("n_tokens"),
      col("n_dup_docs"),
      (col("n_dup_docs").cast("double") / col("n_docs").cast("double"))
        .as("dup_rate"))
    Canon.materialized(Canon.canonicalize(out), c)
  }

  /** The shared base→dup→per-domain-counts CTE chain (ends in `per`:
    * domain, n_docs, n_tokens, n_dup_docs).
    */
  private def domainCountCtes: String =
    s"""base AS MATERIALIZED (
       |  SELECT doc_id,
       |         ${registeredDomainSql(canonicalHostSql(urlSql))} AS domain,
       |         CAST(len(list_filter(
       |           string_split(${TextOps.normSql}, ' '), t -> t <> ''))
       |           AS BIGINT) AS n_toks,
       |         sha256(${TextOps.normSql}) AS text_sha
       |  FROM documents),
       |dup AS (
       |  SELECT text_sha FROM base GROUP BY 1 HAVING count(*) > 1),
       |per AS MATERIALIZED (
       |  SELECT domain,
       |         count(*) AS n_docs,
       |         CAST(sum(n_toks) AS BIGINT) AS n_tokens,
       |         CAST(sum(CASE WHEN dup.text_sha IS NULL THEN 0 ELSE 1 END)
       |           AS BIGINT) AS n_dup_docs
       |  FROM base LEFT JOIN dup ON base.text_sha = dup.text_sha
       |  GROUP BY 1)""".stripMargin

  val domainRollupOracle: String =
    s"""WITH $domainCountCtes
       |SELECT domain, n_docs, n_tokens, n_dup_docs,
       |       CAST(n_dup_docs AS DOUBLE) / CAST(n_docs AS DOUBLE)
       |         AS dup_rate
       |FROM per""".stripMargin

  /** DUP-RATE-AWARE per-domain mixture plan — the crawl-budget logic
    * [[graft.ext.SampleOps.mixturePlan]] applies per `source`, keyed
    * on the registered domain and weighted by UNIQUE document mass:
    * a domain's target share ∝ (n_docs − n_dup_docs), so heavily
    * duplicated domains are demoted in exact proportion to their
    * duplicate load — the signal [[domainRollup]] measures, ACTED on.
    * Integer permille arithmetic (truncating div, both engines), one
    * final double division for repeat_factor.
    */
  def domainMix(spark: SparkSession, sfDir: String): DataFrame = {
    val c = domainCounts(spark, sfDir)
      .withColumn("eff_docs", col("n_docs") - col("n_dup_docs"))
    val tot = c.agg(sum("eff_docs").as("t_eff"),
      sum("n_docs").as("n_total"))
    val out = c.crossJoin(broadcast(tot))
      .withColumn("target_permille",
        expr("eff_docs * 1000 div greatest(t_eff, 1L)"))
      .withColumn("target_docs",
        expr("target_permille * n_total div 1000"))
      .select(col("domain"), col("n_docs"), col("n_dup_docs"),
        col("eff_docs"), col("target_permille"), col("target_docs"),
        (col("target_docs").cast("double") / col("n_docs").cast("double"))
          .as("repeat_factor"))
    Canon.materialized(Canon.canonicalize(out), c)
  }

  val domainMixOracle: String =
    s"""WITH $domainCountCtes,
       |e AS (SELECT *, n_docs - n_dup_docs AS eff_docs FROM per),
       |t AS (
       |  SELECT CAST(sum(eff_docs) AS BIGINT) AS t_eff,
       |         CAST(sum(n_docs) AS BIGINT) AS n_total
       |  FROM e)
       |SELECT domain, n_docs, n_dup_docs,
       |       CAST(eff_docs AS BIGINT) AS eff_docs,
       |       CAST(eff_docs * 1000 // greatest(t_eff, 1) AS BIGINT)
       |         AS target_permille,
       |       CAST((eff_docs * 1000 // greatest(t_eff, 1)) * n_total // 1000
       |         AS BIGINT) AS target_docs,
       |       CAST((eff_docs * 1000 // greatest(t_eff, 1)) * n_total // 1000
       |         AS DOUBLE) / CAST(n_docs AS DOUBLE) AS repeat_factor
       |FROM e, t""".stripMargin

  /** Per-DOMAIN quality cap — [[TextOps.sourceCap]] keyed on the
    * registered domain instead of `source`: keep each domain's
    * [[TextOps.sourceCapK]] highest-quality documents. The heap-based
    * TopKPerKey plan makes the cap one exchange on the domain key
    * whatever the corpus size.
    */
  def domainCap(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = TextOps.withQualityScore(
        TextOps.documents(spark, sfDir)
          .withColumn("norm", TextOps.normText(col("text"))))
      .select(col("doc_id"),
        registeredDomain(canonicalHost(urlOf)).as("domain"),
        col("quality_score"))
    Canon.canonicalize(graft.plans.TopK.perKey(scored, Seq("domain"),
      Seq("quality_score" -> graft.plans.TopK.Desc,
        "doc_id" -> graft.plans.TopK.Asc), k = TextOps.sourceCapK))
  }

  // ---- URL quality filter (crawl front-door heuristics) ---------------

  /** Blocklist terms: a URL containing any of them is dropped outright
    * (the C4/RefinedWeb URL-blocklist pass, reduced to an inlined list —
    * a deployment swaps in its curated list; the match is a plain
    * substring scan either way).
    */
  val urlBlocklist: Seq[String] = Seq("casino", "lottery", "free-download")

  /** Heuristic thresholds: hosts with ≥ [[urlMaxHostDigits]] digits are
    * machine-generated spam mirrors; paths with ≥ [[urlMaxPathDepth]]
    * segments are crawler traps; query strings longer than
    * [[urlMaxQueryLen]] chars are affiliate/tracking links.
    */
  val urlMaxHostDigits = 4
  val urlMaxPathDepth = 5
  val urlMaxQueryLen = 20

  /** Seeded URL for the FILTER query: the five [[urlOf]] shapes plus
    * three adversarial ones (blocklisted host, trap-depth path,
    * tracking query), keyed on doc_id % 8 so every shape appears at
    * every fixture scale.
    */
  private[ext] def urlFullOf: Column = {
    val id = col("doc_id").cast("string")
    val m = (col("doc_id") % 8).cast("int")
    when(m === 0, concat(lit("https://www."), col("source"),
        lit(".example.com/p/"), id))
      .when(m === 1, concat(lit("http://news."), col("source"),
        lit(".co.uk/a?id="), id))
      .when(m === 2, concat(lit("HTTPS://CDN-"),
        (col("doc_id") % 7).cast("string"), lit("."), col("source"),
        lit(".ORG:8443/x/y")))
      .when(m === 3, concat(lit("https://"), col("source"),
        (col("doc_id") % 3).cast("string"), lit(".blogspot.com.au/p#f")))
      .when(m === 4, concat(lit("http://win-casino-"), id, lit(".bet"),
        (col("doc_id") % 10).cast("string"), lit(".com/claim/"), id))
      .when(m === 5, concat(lit("https://"), col("source"),
        lit(".net/a/b/c/d/e/f/"), id))
      .when(m === 6, concat(lit("http://tracker."), col("source"),
        lit(".io/r?utm_source=aff&utm_campaign="), id, lit("&click="), id))
      .otherwise(concat(lit("http://www.m."), col("source"), lit(".io/")))
  }

  /** The seeded filter URL in DuckDB SQL — string twin of [[urlFullOf]]
    * (same leading-`|` caution as [[urlSql]]).
    */
  private[ext] val urlFullSql: String =
    """CASE doc_id % 8
      |  WHEN 0 THEN 'https://www.' || source || '.example.com/p/' || doc_id
      |  WHEN 1 THEN 'http://news.' || source || '.co.uk/a?id=' || doc_id
      |  WHEN 2 THEN 'HTTPS://CDN-' || (doc_id % 7) || '.' || source ||
      |              '.ORG:8443/x/y'
      |  WHEN 3 THEN 'https://' || source || (doc_id % 3) ||
      |              '.blogspot.com.au/p#f'
      |  WHEN 4 THEN 'http://win-casino-' || doc_id || '.bet' ||
      |              (doc_id % 10) || '.com/claim/' || doc_id
      |  WHEN 5 THEN 'https://' || source || '.net/a/b/c/d/e/f/' || doc_id
      |  WHEN 6 THEN 'http://tracker.' || source ||
      |              '.io/r?utm_source=aff&utm_campaign=' || doc_id ||
      |              '&click=' || doc_id
      |  ELSE 'http://www.m.' || source || '.io/'
      |END""".stripMargin

  /** The path portion (first `/` after the host up to `?`/`#`), empty
    * when the URL has no path.
    */
  private[ext] def urlPath(url: Column): Column =
    regexp_extract(
      regexp_replace(lower(url), "^[a-z][a-z0-9+.-]*://", ""),
      "/[^?#]*", 0)

  /** The query string including its `?`, empty when absent. */
  private[ext] def urlQuery(url: Column): Column =
    regexp_extract(url, "\\?[^#]*", 0)

  /** URL quality filter — the crawl front door: per-document URL
    * heuristics that run BEFORE any text is fetched or scored, which
    * is what makes them the cheapest filter in the pipeline (pure
    * string projections; at 100 TB this pass is shuffle-free and
    * reads only the URL column). Four published heuristics: substring
    * blocklist, digit-heavy host, crawler-trap path depth, and
    * tracking-length query strings; `keep` is their conjunction.
    */
  def urlFilter(spark: SparkSession, sfDir: String): DataFrame = {
    val base = TextOps.documents(spark, sfDir)
      .select(col("doc_id"), urlFullOf.as("url"))
      .withColumn("host", canonicalHost(col("url")))
      .withColumn("path", urlPath(col("url")))
    val blockHit = urlBlocklist
      .map(t => lower(col("url")).contains(t))
      .reduce(_ || _)
    val out = base
      .withColumn("domain", registeredDomain(col("host")))
      .withColumn("flag_blocklist", blockHit)
      .withColumn("flag_digit_host",
        (length(col("host")) -
          length(regexp_replace(col("host"), "[0-9]", "")))
          >= urlMaxHostDigits)
      .withColumn("flag_deep_path",
        (length(col("path")) -
          length(regexp_replace(col("path"), "/", "")))
          >= urlMaxPathDepth)
      .withColumn("flag_long_query",
        length(urlQuery(col("url"))) > urlMaxQueryLen)
      .withColumn("keep",
        !col("flag_blocklist") && !col("flag_digit_host") &&
          !col("flag_deep_path") && !col("flag_long_query"))
      .select("doc_id", "url", "domain", "flag_blocklist",
        "flag_digit_host", "flag_deep_path", "flag_long_query", "keep")
    Canon.canonicalize(out)
  }

  val urlFilterOracle: String = {
    val blockSql = urlBlocklist
      .map(t => s"contains(lower(url), '$t')").mkString(" OR ")
    s"""WITH u AS (
       |  SELECT doc_id, $urlFullSql AS url FROM documents),
       |h AS (
       |  SELECT doc_id, url,
       |         ${canonicalHostSql("url")} AS host,
       |         regexp_extract(
       |           regexp_replace(lower(url), '^[a-z][a-z0-9+.-]*://', ''),
       |           '/[^?#]*') AS path
       |  FROM u),
       |f AS (
       |  SELECT doc_id, url,
       |         ${registeredDomainSql("host")} AS domain,
       |         ($blockSql) AS flag_blocklist,
       |         (length(host) - length(regexp_replace(host, '[0-9]', '', 'g')))
       |           >= $urlMaxHostDigits AS flag_digit_host,
       |         (length(path) - length(replace(path, '/', '')))
       |           >= $urlMaxPathDepth AS flag_deep_path,
       |         length(regexp_extract(url, '\\?[^#]*')) > $urlMaxQueryLen
       |           AS flag_long_query
       |  FROM h)
       |SELECT doc_id, url, domain, flag_blocklist, flag_digit_host,
       |       flag_deep_path, flag_long_query,
       |       (NOT flag_blocklist AND NOT flag_digit_host AND
       |        NOT flag_deep_path AND NOT flag_long_query) AS keep
       |FROM f""".stripMargin
  }

  val domainCapOracle: String =
    s"""WITH ${TextOps.qualityCte},
       |qd AS (
       |  SELECT doc_id,
       |         ${registeredDomainSql(canonicalHostSql(urlSql))} AS domain,
       |         quality_score
       |  FROM qs),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY domain
       |    ORDER BY quality_score DESC, doc_id ASC) AS rn
       |  FROM qd)
       |SELECT doc_id, domain, quality_score
       |FROM r WHERE rn <= ${TextOps.sourceCapK}""".stripMargin
  /** PER-DOMAIN LENGTH-DISTRIBUTION DRIFT — the [[SketchOps.tvdOf]]
    * machinery pointed at crawl governance: for each registered
    * domain, the total variation distance between its document-LENGTH
    * distribution (char lengths on the HDR log-linear bucket space —
    * integer bit-length truncation, no float log) and the corpus-wide
    * one. A domain whose length profile stands far off the corpus is
    * a template farm (all pages near-identical length), a listing
    * site, or a truncation bug — the review queue beside the dup-rate
    * rollup. Work: one corpus pass to (domain, bucket), then a
    * (domains x buckets) grid; exact integer cross-products, one
    * double division per domain.
    */
  def domainLenDrift(spark: SparkSession, sfDir: String): DataFrame = {
    val m = SketchOps.hdrMantissaBits
    val qb = TextOps.documents(spark, sfDir)
      .select(registeredDomain(canonicalHost(urlOf)).as("domain"),
        length(col("text")).cast("long").as("q"))
      .withColumn("sh",
        expr(s"greatest(length(bin(q)) - 1 - $m, 0)"))
      .withColumn("lb", expr("shiftleft(shiftright(q, sh), sh)"))
      .persist() // slice-bucket and corpus-bucket passes
    graft.ops.Canon.materialized(
      graft.ops.Canon.canonicalize(
        SketchOps.tvdOf(qb, "domain", "n_docs")), qb)
  }

  val domainLenDriftOracle: String = {
    val m = SketchOps.hdrMantissaBits
    s"""WITH qb AS (
       |  SELECT domain, (q >> sh) << sh AS lb FROM (
       |    SELECT domain, q, greatest(length(bin(q)) - 1 - $m, 0) AS sh
       |    FROM (SELECT
       |            ${registeredDomainSql(canonicalHostSql(urlSql))}
       |              AS domain,
       |            CAST(length(text) AS BIGINT) AS q
       |          FROM documents))),
       |${SketchOps.tvdSql("domain", "n_docs")}""".stripMargin
  }
}
