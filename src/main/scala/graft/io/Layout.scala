package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering for
  * min/max-pruned scans (SURVEY §4's partition-pruning theme, extended
  * to TWO filter dimensions).
  *
  * A 100 TB fact laid out by one sort key prunes scans that filter on
  * THAT key and nothing else: every file's min/max range for a second
  * column spans the whole domain. Interleaving the bits of two keys into
  * one Z-value and range-partitioning + sorting by it gives every file a
  * compact rectangle in BOTH dimensions — parquet row-group min/max
  * statistics then prune selective filters on either key (the layout
  * Delta/Iceberg expose as `OPTIMIZE ZORDER BY`; here it is a plain
  * Spark repartitionByRange, no table format required).
  *
  * The Z-value is pure builtin arithmetic — `zBits` shift/mask/add terms
  * per dimension, fully whole-stage-codegen'd, and exactly reproducible
  * in DuckDB for the oracle (`zValueSql`). Inputs must already lie in
  * [0, 2^zBits); callers scale/clamp first ([[zValue16]] does the
  * canonical mod-2¹⁶ clamp).
  */
object Layout {

  /** Bits kept per dimension; 2·zBits ≤ 62 keeps the interleave exact in
    * a BIGINT for both engines.
    */
  val zBits = 16

  /** Morton interleave of two columns already in [0, 2^zBits): bit i of
    * `x` lands at position 2i, bit i of `y` at 2i+1.
    */
  def zValue(x: Column, y: Column): Column =
    (0 until zBits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** [[zValue]] with the canonical clamp for unbounded non-negative keys:
    * both inputs taken mod 2^zBits (hash-like fold into the grid).
    */
  def zValue16(x: Column, y: Column): Column = {
    val m = lit(1L << zBits)
    zValue(pmod(x.cast("long"), m), pmod(y.cast("long"), m))
  }

  /** The same interleave in DuckDB SQL, generated from the same
    * constants — `x`/`y` are SQL expressions already in [0, 2^zBits).
    */
  def zValueSql(x: String, y: String): String =
    (0 until zBits).map { i =>
      s"(((($x) >> $i) & 1) << ${2 * i}) + (((($y) >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  /** Re-lays `df` out as `numPartitions` Z-ordered output partitions:
    * range-partitioned by the interleaved key, sorted within each, the
    * helper column dropped. Row content is untouched — this is purely a
    * physical re-clustering; write the result with any sink and each
    * file covers a compact (x, y) rectangle.
    *
    * Scale: one range shuffle (sampled boundaries, so skewed Z-values
    * still split evenly) + a partition-local sort — the same cost as any
    * single-key re-sort of the table; no extra passes.
    */
  def zorderBy(df: DataFrame, x: Column, y: Column,
               numPartitions: Int): DataFrame = {
    val zCol = "_graft_zvalue"
    df.withColumn(zCol, zValue16(x, y))
      .repartitionByRange(numPartitions, col(zCol))
      .sortWithinPartitions(zCol)
      .drop(zCol)
  }
}
