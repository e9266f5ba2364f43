package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Canon

/** Code-vs-prose detection — the StarCoder/Pile-style routing stage: a
  * web crawl carries embedded source files, config blobs and terminal
  * dumps, and a training mix wants them ROUTED (to a code pipeline
  * with its own dedup/quality rules), not quality-filtered away as
  * "bad prose". Pure per-document string projections — like
  * [[DomainOps]]' URL filter this is a shuffle-free front-door pass at
  * 100 TB: one FileScan, codegen'd regex/split work, no exchange.
  *
  * Signals (exact integers first, IEEE doubles only as final ratios —
  * the gopherRules discipline, CurationOps.scala):
  *  - `sym_cnt`: occurrences of the code-symbol class `{}();=[]<>`;
  *  - `kw_cnt`: whole-word hits of seven language keywords
  *    (`def class return import function const var` — none occur in
  *    the fixture's prose vocabulary, so prose scores exactly 0);
  *  - `indent_lines`: lines opening with two spaces or a tab;
  *  - `semi_lines`: lines ending in `;`.
  * Verdict: `is_code` ⇔ kw_cnt ≥ 2 (keyworded source) OR
  * symbol_ratio ≥ 0.02 ∧ indent_share ≥ 0.2 (symbol-dense indented
  * block without recognizable keywords). The two-arm OR is exercised
  * from both sides by the seeding below.
  *
  * SEEDING (the DomainOps urlOf pattern): the synthetic fixture is
  * pure prose, so the operator's positive paths would be vacuous on
  * it. Documents gain a deterministic tail keyed on doc_id % 8 —
  * m = 5 appends a two-keyword-plus code block (fires the keyword
  * arm), m = 2 appends an indented keyword-free data block (high
  * indent share but zero symbols/keywords: provably NOT code — pins
  * the conjunction in the second arm). Both twins build the same
  * string, so the oracle sees the identical corpus.
  */
object CodeOps {

  val codeKeywords: Seq[String] =
    Seq("def", "class", "return", "import", "function", "const", "var")

  val symbolClass = "[{}();=\\[\\]<>]"

  val minKwHits = 2
  val minSymbolRatio = 0.02
  val minIndentShare = 0.2

  /** Deterministic seeded tail keyed on doc_id % 8. */
  private[ext] def seededText: Column = {
    val id = col("doc_id")
    val m = (id % 8).cast("int")
    when(m === 5, concat(col("text"),
        lit("\ndef fn_"), id.cast("string"), lit("(x):\n    return x + "),
        (id % 7).cast("string"), lit(";\nclass C_"),
        (id % 3).cast("string"), lit(":\n    y = (x);")))
      .when(m === 2, concat(col("text"),
        lit("\n    alpha "), (id % 5).cast("string"),
        lit("\n    beta "), (id % 9).cast("string"),
        lit("\n\tgamma 7")))
      .otherwise(col("text"))
  }

  /** The seeded text in DuckDB SQL — string twin of [[seededText]].
    * Concat operators sit at line ENDS (the DomainOps urlSql note:
    * this is interpolated into stripMargin templates).
    */
  private[ext] val seededTextSql: String =
    """CASE doc_id % 8
      |  WHEN 5 THEN text || chr(10) || 'def fn_' || doc_id ||
      |    '(x):' || chr(10) || '    return x + ' || (doc_id % 7) ||
      |    ';' || chr(10) || 'class C_' || (doc_id % 3) || ':' ||
      |    chr(10) || '    y = (x);'
      |  WHEN 2 THEN text || chr(10) || '    alpha ' || (doc_id % 5) ||
      |    chr(10) || '    beta ' || (doc_id % 9) ||
      |    chr(10) || chr(9) || 'gamma 7'
      |  ELSE text
      |END""".stripMargin

  def codeDetect(spark: SparkSession, sfDir: String): DataFrame = {
    val kwPattern = s"\\b(${codeKeywords.mkString("|")})\\b"
    val d = TextOps.documents(spark, sfDir)
      .withColumn("t", seededText)
      .withColumn("lines", split(col("t"), "\n"))
      .withColumn("n_lines", size(col("lines")).cast("long"))
      .withColumn("sym_cnt", regexp_count(col("t"), lit(symbolClass)))
      .withColumn("kw_cnt", regexp_count(col("t"), lit(kwPattern)))
      .withColumn("indent_lines",
        size(filter(col("lines"),
          l => l.rlike("^(  |\t)"))).cast("long"))
      .withColumn("semi_lines",
        size(filter(col("lines"), l => l.endsWith(";"))).cast("long"))
      .withColumn("symbol_ratio",
        col("sym_cnt").cast("double") /
          greatest(length(col("t")), lit(1)).cast("double"))
      .withColumn("indent_share",
        col("indent_lines").cast("double") / col("n_lines").cast("double"))
      .withColumn("is_code",
        col("kw_cnt") >= minKwHits ||
          (col("symbol_ratio") >= minSymbolRatio &&
            col("indent_share") >= minIndentShare))
    Canon.canonicalize(d.select(
      col("doc_id"), col("lang"), col("n_lines"), col("sym_cnt"),
      col("kw_cnt"), col("indent_lines"), col("semi_lines"),
      col("symbol_ratio"), col("indent_share"), col("is_code")))
  }

  val codeDetectOracle: String = {
    val kwPattern = s"\\b(${codeKeywords.mkString("|")})\\b"
    s"""WITH d AS (
       |  SELECT doc_id, lang, $seededTextSql AS t
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, lang, t,
       |         string_split(t, chr(10)) AS lines,
       |         CAST(len(regexp_extract_all(t, '$symbolClass'))
       |              AS BIGINT) AS sym_cnt,
       |         CAST(len(regexp_extract_all(t, '$kwPattern'))
       |              AS BIGINT) AS kw_cnt
       |  FROM d),
       |m AS (
       |  SELECT doc_id, lang, sym_cnt, kw_cnt,
       |         CAST(len(lines) AS BIGINT) AS n_lines,
       |         CAST(len(list_filter(lines, l ->
       |           regexp_matches(l, '^(  |\t)'))) AS BIGINT)
       |           AS indent_lines,
       |         CAST(len(list_filter(lines, l ->
       |           l LIKE '%;')) AS BIGINT) AS semi_lines,
       |         CAST(sym_cnt AS DOUBLE) /
       |           CAST(greatest(length(t), 1) AS DOUBLE) AS symbol_ratio
       |  FROM s)
       |SELECT doc_id, lang, n_lines, sym_cnt, kw_cnt, indent_lines,
       |       semi_lines, symbol_ratio,
       |       CAST(indent_lines AS DOUBLE) / CAST(n_lines AS DOUBLE)
       |         AS indent_share,
       |       (kw_cnt >= $minKwHits OR
       |        (symbol_ratio >= $minSymbolRatio AND
       |         CAST(indent_lines AS DOUBLE) / CAST(n_lines AS DOUBLE)
       |           >= $minIndentShare)) AS is_code
       |FROM m""".stripMargin
  }
}
