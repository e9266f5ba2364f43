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
  * versions correctly. A NULL business KEY never joins (SQL
  * semantics): a dim row with a NULL key passes through and a
  * snapshot row with one inserts — malformed keys surface in the
  * output instead of silently vanishing (join-side presence markers,
  * not key-null checks, drive the branch filters).
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
    // presence markers, NOT key-null checks: a malformed row whose
    // business key is NULL would otherwise fail every branch filter and
    // silently vanish from the merged dimension — with markers it takes
    // the pass-through / insert path like any unmatched row (NULL keys
    // never join, by SQL semantics, so it cannot spuriously "change")
    val current = dim.filter(col("is_current"))
      .withColumn("_in_dim", lit(true))
    val snap = snapshot.select(
      keyCols.map(k => col(k).as(s"${k}_new")) ++
        tracked.map(t => col(t).as(s"${t}_new")): _*)
      .withColumn("_in_snap", lit(true))
    // NOT persisted: the three output branches are projections of an
    // IDENTICAL join subplan, so exchange reuse dedupes the shuffles
    // within one execution, and a library op must not leak cache blocks
    // into the caller's session (Canon.materialized discipline)
    val joined = current.join(snap,
      keyCols.map(k => col(k) === col(s"${k}_new")).reduce(_ && _),
      "full_outer")
    val inDim = col("_in_dim") <=> lit(true)
    val inSnap = col("_in_snap") <=> lit(true)
    val inBoth = inDim && inSnap
    val unchanged = tracked
      .map(t => col(t) <=> col(s"${t}_new")).reduce(_ && _)

    val dimCols = dim.columns.toSeq
    // current rows that survive as-is: unchanged, or absent from snapshot
    val kept = joined
      .filter(inDim && (!inBoth || unchanged))
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
      .filter(inSnap && (!inBoth || !unchanged))
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
