package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 merge: fold a full daily snapshot
  * into a versioned dimension (valid_from / valid_to / is_current), the
  * other half of the reference's S7 daily-append pattern — instead of
  * appending a full copy per DAY_DT, only CHANGED rows spawn a new
  * version and history stays queryable as-of any date.
  *
  * Semantics per key:
  *  - tracked attributes unchanged → current row passes through;
  *  - any tracked attribute differs → the current row CLOSES
  *    (valid_to = effectiveDate, is_current = false) and the snapshot
  *    row opens as the new current version (valid_from = effectiveDate);
  *  - key only in the snapshot → inserted as a new current row;
  *  - key absent from the snapshot → current row passes through
  *    (deletions keep their last version current; close-on-delete is a
  *    policy choice this op deliberately does not take);
  *  - already-closed history rows pass through untouched.
  *
  * Attribute comparison is null-safe (`<=>`), so a NULL→value change
  * versions correctly.
  *
  * Scale shape: ONE key-partitioned join between the current slice and
  * the snapshot; history rows never join anything. The three output
  * branches are projections of that single join (Spark unions are plan
  * concatenation, not work), so the whole merge costs one shuffle of
  * each input — the plan a MERGE INTO would produce, without needing a
  * table format.
  */
object Scd2 {

  /** @param dim      versioned dimension: key ++ tracked ++
    *                 (valid_from, valid_to, is_current)
    * @param snapshot today's full extract: key ++ tracked
    * @param keyCols  business key
    * @param tracked  attributes whose change spawns a version
    * @param effectiveDate the snapshot's date (closes/opens versions)
    */
  def merge(dim: DataFrame, snapshot: DataFrame, keyCols: Seq[String],
            tracked: Seq[String], effectiveDate: String): DataFrame = {
    val history = dim.filter(!col("is_current"))
    val current = dim.filter(col("is_current"))
    val snap = snapshot.select(
      keyCols.map(k => col(k).as(s"${k}_new")) ++
        tracked.map(t => col(t).as(s"${t}_new")): _*)
    // NOT persisted: the three output branches are projections of an
    // IDENTICAL join subplan, so exchange reuse dedupes the shuffles
    // within one execution, and a library op must not leak cache blocks
    // into the caller's session (Canon.materialized discipline)
    val joined = current.join(snap,
      keyCols.map(k => col(k) === col(s"${k}_new")).reduce(_ && _),
      "full_outer")
    val inBoth = col(keyCols.head).isNotNull &&
      col(s"${keyCols.head}_new").isNotNull
    val unchanged = tracked
      .map(t => col(t) <=> col(s"${t}_new")).reduce(_ && _)

    val dimCols = dim.columns.toSeq
    // current rows that survive as-is: unchanged, or absent from snapshot
    val kept = joined
      .filter(col(keyCols.head).isNotNull && (!inBoth || unchanged))
      .select(dimCols.map(col): _*)
    // changed rows: the old version closes at the effective date
    val closed = joined.filter(inBoth && !unchanged)
      .select(dimCols.map {
        case "valid_to" => lit(effectiveDate).as("valid_to")
        case "is_current" => lit(false).as("is_current")
        case c => col(c)
      }: _*)
    // changed + brand-new keys: the snapshot row opens as current
    val opened = joined
      .filter(col(s"${keyCols.head}_new").isNotNull &&
        (!inBoth || !unchanged))
      .select(dimCols.map {
        case "valid_from" => lit(effectiveDate).as("valid_from")
        case "valid_to" =>
          lit(null).cast("string").as("valid_to")
        case "is_current" => lit(true).as("is_current")
        case c if keyCols.contains(c) || tracked.contains(c) =>
          col(s"${c}_new").as(c)
        case c => col(c) // untracked carried attrs keep the old value
      }: _*)
    history.unionByName(kept).unionByName(closed).unionByName(opened)
  }
}
