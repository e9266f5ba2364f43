package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** One partition's before/after accounting from [[compactTo]]. */
  case class CompactReport(partition: String, files_before: Long,
                           files_after: Long, bytes_total: Long)

  /** Small-file COMPACTION — the other half of layout maintenance
    * beside [[zorderBy]]: a daily-append table (the S7 legacy pattern —
    * every micro-batch lands a few files per DAY_DT) degrades at 100 TB
    * into millions of KB-sized files whose open/seek overhead dominates
    * scans and whose per-file metadata floods the driver. This op
    * bin-packs each leaf partition's files to ⌈bytes/targetBytes⌉
    * outputs (never more than it has — pure parquet repacking,
    * row-multiset preserving, no ordering contract).
    *
    * Shape: partition DIRECTORIES are metadata (one listing, driver
    * side — the same altitude at which Delta/Iceberg `OPTIMIZE` plans
    * its rewrite groups); each partition needing work is rewritten by
    * one narrow Spark job reading EXACTLY the files listed for it
    * (`repartition(bins)`: a bounded shuffle of just that partition —
    * `coalesce` cannot EXCEED the scan's input-split count, so when the
    * reader packs many small files into few splits it silently emits
    * fewer, larger files than the requested bins). A partition already
    * at its bin count is untouched, so re-running is a no-op and the op
    * composes with a scheduler loop.
    *
    * Durability — crash-safe three-phase swap:
    *  1. the rewrite lands in a `_graft_compact_tmp` sibling,
    *     SUCCESS-gated (the lshIndex pattern);
    *  2. originals move into `_graft_compact_trash` (rename results
    *     CHECKED — object-store renames report failure by returning
    *     false, not throwing);
    *  3. tmp files move in under a `compact-` name prefix, then trash
    *     and tmp are dropped.
    * The trash dir existing marks "swap in progress": a re-run that
    * finds SUCCESS-gated tmp + trash RESUMES the swap (the prefix makes
    * moved-in outputs distinguishable from surviving originals), and a
    * tmp without both markers is an incomplete write, safely discarded
    * with all originals intact. At every crash point the row multiset
    * exists fully in partition ∪ trash ∪ tmp, and re-running converges.
    * The swap is still not atomic to CONCURRENT readers; atomic
    * visibility is a table-format commit's job (Delta/Iceberg), out of
    * scope for a directory layout.
    */
  def compactTo(spark: SparkSession, tableDir: String,
                targetBytes: Long): DataFrame = {
    import spark.implicits._
    require(targetBytes > 0, "targetBytes must be positive")
    val fs = FileSystem.get(new java.net.URI(tableDir),
      spark.sparkContext.hadoopConfiguration)

    def dataFiles(dir: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(dir).toSeq.filter(s => s.isFile &&
        !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))

    def mv(src: Path, dst: Path): Unit =
      require(fs.rename(src, dst), s"rename $src -> $dst failed")

    // leaf partition dirs: directories that directly hold data files;
    // an unpartitioned table is its own single leaf
    def leaves(dir: Path): Seq[Path] = {
      val entries = fs.listStatus(dir).toSeq
      val subdirs = entries.filter(_.isDirectory)
        .filterNot(_.getPath.getName.startsWith("_graft_compact"))
      val here = if (dataFiles(dir).nonEmpty) Seq(dir) else Seq.empty
      here ++ subdirs.flatMap(s => leaves(s.getPath))
    }

    // phases 2+3: originals → trash, tmp files in (prefixed), cleanup.
    // Idempotent: resumable from any crash point by the recovery below.
    def swapIn(part: Path, tmp: Path, trash: Path): Long = {
      if (!fs.exists(trash)) fs.mkdirs(trash)
      dataFiles(part).filterNot(_.getPath.getName.startsWith("compact-"))
        .foreach(f => mv(f.getPath, new Path(trash, f.getPath.getName)))
      val toMove = dataFiles(tmp)
      toMove.foreach(f =>
        mv(f.getPath, new Path(part, s"compact-${f.getPath.getName}")))
      fs.delete(trash, true)
      fs.delete(tmp, true)
      dataFiles(part).size.toLong
    }

    val root = new Path(tableDir)
    val report = leaves(root).map { part =>
      val tmp = new Path(part, "_graft_compact_tmp")
      val trash = new Path(part, "_graft_compact_trash")
      val interrupted = // SUCCESS-gated tmp + trash == swap in progress
        fs.exists(new Path(tmp, "_SUCCESS")) && fs.exists(trash)
      if (interrupted) {
        val before = dataFiles(part).size.toLong
        val after = swapIn(part, tmp, trash)
        CompactReport(part.toString, before, after,
          dataFiles(part).map(_.getLen).sum)
      } else {
        // no swap was in progress: any tmp is an incomplete write and
        // every original is still in place — discard and start fresh
        fs.delete(tmp, true)
        val files = dataFiles(part)
        val total = files.map(_.getLen).sum
        val bins = math.max(1L,
          (total + targetBytes - 1) / targetBytes).toInt
        if (files.size <= bins)
          CompactReport(part.toString, files.size.toLong,
            files.size.toLong, total)
        else {
          spark.read.parquet(files.map(_.getPath.toString): _*)
            .repartition(bins)
            .write.mode("overwrite").parquet(tmp.toString)
          // SUCCESS gate: only swap after a complete write
          require(fs.exists(new Path(tmp, "_SUCCESS")),
            s"compaction write of $part did not complete")
          val after = swapIn(part, tmp, trash)
          CompactReport(part.toString, files.size.toLong, after, total)
        }
      }
    }
    report.toDF()
  }
}
