package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed snapshot DIFF: classify every business key across two full
  * table snapshots as `added` / `removed` / `changed` — the change-data
  * report a daily pipeline derives when the upstream can't emit a
  * changelog (the detection half of [[Scd2]], which then folds the
  * changes in; this op reports them instead, for audit, alerting, and
  * incremental-downstream triggers).
  *
  * Semantics per key: present only in `cur` → added; present only in
  * `prev` → removed; present in both with any compared attribute
  * differing → changed; identical rows produce NO output (the report is
  * the delta, not the corpus). Attribute comparison is null-safe
  * (`<=>`), so NULL→value transitions count as changes. Presence is
  * detected by join-side markers, not key-null tests, for the same
  * reason as [[Scd2.merge]]: a malformed NULL-key row surfaces (as
  * added + removed) instead of silently vanishing.
  *
  * Scale shape: ONE key-partitioned full-outer join; the classification
  * is a codegen'd projection of that join, and unchanged rows are
  * filtered before anything leaves the stage — the exchange carries
  * both snapshots once, and the output is delta-sized, not
  * corpus-sized. At 100 TB with partitioned/bucketed snapshots the
  * join co-locates and the diff is embarrassingly parallel.
  */
object Snapshot {

  /** @param cur     today's snapshot: key ++ compared (++ anything)
    * @param prev    the prior snapshot, same schema
    * @param keyCols business key
    * @param compared attributes whose difference makes a key `changed`
    * @return (keyCols*, change) — one row per non-identical key
    */
  def diff(cur: DataFrame, prev: DataFrame, keyCols: Seq[String],
           compared: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty,
      "Snapshot.diff: keyCols must be non-empty (the business key)")
    require(compared.nonEmpty,
      "Snapshot.diff: compared must be non-empty — with no compared " +
        "attributes every matched key would be vacuously unchanged; " +
        "pass the attributes whose difference should count as a change")
    val c = cur.select((keyCols ++ compared).map(col): _*)
      .withColumn("_in_cur", lit(true))
    val p = prev.select(
      keyCols.map(k => col(k).as(s"${k}_p")) ++
        compared.map(a => col(a).as(s"${a}_p")): _*)
      .withColumn("_in_prev", lit(true))
    // PLAIN equality on the key, not `<=>`: NULL keys must never join
    // (matching the oracle's `ON c.k = p.k` and [[Scd2.merge]]), so a
    // malformed row surfaces on both report sides below
    val joined = c.join(p,
      keyCols.map(k => col(k) === col(s"${k}_p")).reduce(_ && _),
      "full_outer")
    val anyChanged = compared
      .map(a => !(col(a) <=> col(s"${a}_p")))
      .reduce(_ || _)
    val change = when(col("_in_prev").isNull, "added")
      .when(col("_in_cur").isNull, "removed")
      .when(anyChanged, "changed")
    val keyOut = keyCols.map(k => coalesce(col(k), col(s"${k}_p")).as(k))
    joined
      .withColumn("change", change)
      .filter(col("change").isNotNull)
      .select(keyOut :+ col("change"): _*)
  }
}
