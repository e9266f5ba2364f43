package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Raised by the PK-uniqueness gate (reference DuplicateException,
  * transform_utils.py:79–81).
  */
final class DuplicateKeyException(msg: String) extends RuntimeException(msg)

/** Data-quality gates (reference transform_utils.py:83–92) and null-repair
  * (reference supplier_performance_task.py:138–152).
  */
object Quality {

  /** Key groups that occur more than once, with their multiplicity
    * (reference A1/F3 — groupBy keys → count → filter cnt > 1).
    * Map-side partial aggregation keeps the shuffle proportional to the
    * number of *distinct* keys, not rows, so this scales to 100 TB.
    */
  def duplicates(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)

  /** Fail-fast PK gate. Uses `isEmpty` (first-row short-circuit), NOT the
    * reference's full `count()` action (transform_utils.py:90) — at scale a
    * full count over a duplicate-free table is a wasted pass.
    */
  def requireUnique(df: DataFrame, keys: Seq[String]): Unit = {
    if (!duplicates(df, keys).isEmpty)
      throw new DuplicateKeyException(
        s"duplicate primary key values for (${keys.mkString(", ")})")
  }

  /** Per-column data profile: row count, null count, exact distinct
    * count, and native-typed min/max — the pre-flight a pipeline runs
    * before trusting a new feed.
    *
    * Scale shape: each column is ONE pruned scan (ReadSchema = that
    * column alone) + a two-phase aggregate; in columnar storage the k
    * per-column passes together read ≈ one full table, and each exact
    * countDistinct plans as its own two-stage keyed aggregation —
    * deliberately NOT one agg with k distinct columns, which Expand-s
    * the scan k-fold. min/max stay native-typed here; oracle-facing
    * callers project them away (cross-engine numeric→string literal
    * formatting is not stable — the Canon boundary argument).
    */
  def profile(df: DataFrame): DataFrame =
    df.columns.toIndexedSeq.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        coalesce(sum(col(c).isNull.cast("long")), lit(0L)).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_str"),
        max(col(c)).cast("string").as("max_str"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_str"), col("max_str"))
    }.reduce(_ unionByName _)

  /** Heavy-key skew report: the top-k heaviest join/shuffle keys with
    * their share of all rows and their ratio to the mean key weight —
    * the diagnostic read BEFORE choosing a salting factor or an AQE
    * skew threshold (a ratio_to_mean of 50 on the top key says "salt
    * this join 64-way"; a flat report says don't bother).
    *
    * One keyed count with map-side combine; the global top-k plans as
    * TakeOrderedAndProject (bounded per-partition heaps, no full
    * sort); totals are a two-row broadcast.
    */
  def skewReport(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val counts = df.groupBy(keyCol).agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(sum("cnt").as("total"),
      count(lit(1)).as("n_keys"))
    counts.orderBy(col("cnt").desc, col(keyCol).asc).limit(k)
      .crossJoin(broadcast(stats))
      .select(col(keyCol).cast("string").as("key"), col("cnt"),
        (col("cnt").cast("double") / col("total").cast("double"))
          .as("share"),
        (col("cnt").cast("double") * col("n_keys").cast("double") /
          col("total").cast("double")).as("ratio_to_mean"))
  }

  /** Declarative data-quality expectation — the rule vocabulary of a
    * Deequ-style constraint suite. Value rules (everything but
    * [[Rule.Unique]]) define a per-row `satisfied` predicate; a NULL
    * value fails every value rule except its own NotNull check is
    * irrelevant — i.e. NULL never *satisfies*, so it counts as a
    * violation (the conservative reading a data contract wants).
    */
  sealed trait Rule { def name: String }
  object Rule {
    final case class NotNull(column: String) extends Rule {
      def name = s"not_null($column)"
    }
    final case class InRange(column: String, lo: Double, hi: Double)
        extends Rule {
      def name = s"in_range($column)"
    }
    final case class InSet(column: String, values: Seq[String])
        extends Rule {
      def name = s"in_set($column)"
    }
    final case class MatchesRegex(column: String, pattern: String)
        extends Rule {
      def name = s"matches_regex($column)"
    }
    final case class Unique(columns: Seq[String]) extends Rule {
      def name = s"unique(${columns.mkString(",")})"
    }
    /** Referential integrity: every row whose key columns are ALL
      * non-null must match a row in the named reference table on
      * `refColumns` (NULL keys are exempt, standard FK semantics —
      * compose with [[NotNull]] to forbid them). The reference is
      * named, not embedded: the evaluator resolves it from a
      * `refs` map and the oracle generator from the DuckDB catalog,
      * so the same rule object drives both.
      */
    final case class RefIntegrity(columns: Seq[String], refName: String,
                                  refColumns: Seq[String]) extends Rule {
      require(columns.length == refColumns.length,
        s"RefIntegrity: ${columns.length} key cols vs " +
          s"${refColumns.length} ref cols")
      def name = s"ref(${columns.mkString(",")}->$refName)"
    }
  }

  /** The per-row satisfied predicate of a value rule (NULL input → NULL →
    * counted as a violation by the `otherwise` branch downstream).
    */
  private def satisfied(r: Rule): Column = r match {
    case Rule.NotNull(c)          => col(c).isNotNull
    case Rule.InRange(c, lo, hi)  => col(c) >= lit(lo) && col(c) <= lit(hi)
    case Rule.InSet(c, vs)        => col(c).isin(vs: _*)
    case Rule.MatchesRegex(c, p)  => col(c).rlike(p)
    case r =>
      throw new IllegalArgumentException(s"${r.name} has no row predicate")
  }

  /** The DuckDB twin of [[satisfied]], generated from the SAME rule
    * object so the oracle cannot drift from the evaluator.
    */
  def satisfiedSql(r: Rule): String = r match {
    case Rule.NotNull(c)         => s"$c IS NOT NULL"
    case Rule.InRange(c, lo, hi) => s"($c >= $lo AND $c <= $hi)"
    case Rule.InSet(c, vs) =>
      s"$c IN (${vs.map(v => s"'$v'").mkString(", ")})"
    case Rule.MatchesRegex(c, p) => s"regexp_matches($c, '$p')"
    case r =>
      throw new IllegalArgumentException(s"${r.name} has no row predicate")
  }

  /** Evaluate a declarative expectation suite in the minimum number of
    * passes: ALL value rules fold into ONE aggregation over one scan
    * (per-rule conditional sums, map-side combined to a single row, then
    * exploded to report rows — no driver round-trip), and each Unique
    * rule is one keyed aggregation whose violation count is the number
    * of rows living in a multiply-occupied key group. Report: one row
    * per rule — (rule_name, n_rows, n_violations, passed).
    *
    * Scale shape: k value rules cost one table scan regardless of k;
    * Unique shuffles once on its key columns with partial aggregation,
    * so the exchange carries distinct keys, not rows.
    */
  def expectations(df: DataFrame, rules: Seq[Rule],
                   refs: Map[String, DataFrame] = Map.empty): DataFrame = {
    require(rules.nonEmpty, "expectations: empty rule suite")
    val valueRules = rules.filter(r => !r.isInstanceOf[Rule.Unique] &&
      !r.isInstanceOf[Rule.RefIntegrity])
    val uniqueRules = rules.collect { case u: Rule.Unique => u }
    val refRules = rules.collect { case f: Rule.RefIntegrity => f }
    refRules.foreach { f =>
      require(refs.contains(f.refName),
        s"expectations: rule ${f.name} needs refs(\"${f.refName}\")") }
    val parts = scala.collection.immutable.List.newBuilder[DataFrame]
    if (valueRules.nonEmpty) {
      val aggs = count(lit(1)).as("n_rows") +:
        valueRules.zipWithIndex.map { case (r, i) =>
          coalesce(sum(when(satisfied(r), lit(0L)).otherwise(lit(1L))),
            lit(0L)).as(s"v_$i")
        }
      val one = df.agg(aggs.head, aggs.tail: _*)
      val reportRows = array(valueRules.zipWithIndex.map { case (r, i) =>
        struct(lit(r.name).as("rule_name"), col("n_rows"),
          col(s"v_$i").as("n_violations"))
      }: _*)
      parts += one.select(explode(reportRows).as("r"))
        .select(col("r.rule_name"), col("r.n_rows"), col("r.n_violations"))
    }
    uniqueRules.foreach { u =>
      val counts = df.groupBy(u.columns.map(col).toIndexedSeq: _*)
        .agg(count(lit(1)).as("cnt"))
      parts += counts.agg(
        coalesce(sum(col("cnt")), lit(0L)).cast("long").as("n_rows"),
        coalesce(sum(when(col("cnt") > 1, col("cnt"))), lit(0L))
          .cast("long").as("n_violations"))
        .select(lit(u.name).as("rule_name"), col("n_rows"),
          col("n_violations"))
    }
    refRules.foreach { f =>
      // one anti join per FK rule: candidate side keeps only fully
      // non-null keys (NULL-key rows are exempt); the exchange carries
      // the key columns, and a dimension-sized ref side broadcasts
      // under AQE. n_rows comes from a 1-row agg cross-joined on (the
      // skewReport shape) — no driver action.
      val keysNonNull = f.columns.map(col(_).isNotNull).reduce(_ && _)
      val ref = refs(f.refName).select(
        f.refColumns.zip(f.columns)
          .map { case (rc, c) => col(rc).as(s"__ref_$c") }: _*)
      val cond = f.columns.map(c => col(c) === col(s"__ref_$c"))
        .reduce(_ && _)
      val nViol = df.filter(keysNonNull)
        .join(ref, cond, "left_anti")
        .agg(count(lit(1)).cast("long").as("n_violations"))
      val nRows = df.agg(count(lit(1)).cast("long").as("n_rows"))
      parts += nRows.crossJoin(nViol)
        .select(lit(f.name).as("rule_name"), col("n_rows"),
          col("n_violations"))
    }
    parts.result().reduce(_ unionByName _)
      .withColumn("passed", col("n_violations") === lit(0L))
  }

  /** Null-repair after an outer join: string columns get a marker value
    * (reference `when isNull → 'No sales'`, supplier_performance_task.py:
    * 139–143), numeric columns get zero-fill (reference fillna :148–152).
    * Implemented with coalesce so it works for DECIMAL columns too
    * (DataFrameNaFunctions.fill skips decimals).
    */
  def nullRepair(df: DataFrame,
                 stringFills: Map[String, String],
                 zeroFills: Seq[String]): DataFrame = {
    val repaired: Seq[Column] = df.columns.toIndexedSeq.map { c =>
      if (stringFills.contains(c)) coalesce(col(c), lit(stringFills(c))).as(c)
      else if (zeroFills.contains(c))
        coalesce(col(c), lit(0).cast(df.schema(c).dataType)).as(c)
      else col(c)
    }
    df.select(repaired: _*)
  }
}
