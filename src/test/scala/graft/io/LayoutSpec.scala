package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave, written independently of the Column
    * formulation.
    */
  private def mortonRef(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < Layout.zBits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zValue matches the reference interleave on deterministic pairs") {
    val m = (1L << Layout.zBits) - 1L
    val pairs = (0 until 500).map { i =>
      // LCG spread over the full 16-bit range, plus the corners
      ((i * 48271L) & m, (i * 69621L + 12345L) & m)
    } ++ Seq((0L, 0L), (m, 0L), (0L, m), (m, m))
    val got = pairs.toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y")).as("z"))
      .as[Long].collect()
    pairs.zip(got).foreach { case ((x, y), z) =>
      assert(z == mortonRef(x, y), s"interleave($x, $y)")
    }
  }

  test("zorderBy preserves the exact row multiset") {
    val df = (0 until 4096)
      .map(i => (i.toLong, (i % 64).toLong, (i / 64).toLong))
      .toDF("id", "x", "y")
    val out = Layout.zorderBy(df, col("x"), col("y"), 16)
    assert(out.columns.toSeq == Seq("id", "x", "y")) // helper col dropped
    assert(out.as[(Long, Long, Long)].collect().sorted.toSeq ==
      df.as[(Long, Long, Long)].collect().sorted.toSeq)
  }

  test("Z-order partitions are compact rectangles in BOTH dimensions") {
    // a 64×64 grid: the layout quality question is the per-PARTITION
    // min/max width of each dimension — exactly what parquet row-group
    // pruning sees after a write
    val grid = (0 until 4096)
      .map(i => ((i % 64).toLong, (i / 64).toLong))
      .toDF("x", "y")
    def ranges(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.withColumn("p", spark_partition_id())
        .groupBy("p")
        .agg((max("x") - min("x")).as("rx"), (max("y") - min("y")).as("ry"))
        .select("rx", "ry").as[(Long, Long)].collect().toSeq
    val z = ranges(Layout.zorderBy(grid, col("x"), col("y"), 16))
    val linear = ranges(
      grid.repartitionByRange(16, col("x")).sortWithinPartitions("x"))
    def avg(v: Seq[Long]): Double = v.sum.toDouble / v.length
    val (zx, zy) = (avg(z.map(_._1)), avg(z.map(_._2)))
    val ly = avg(linear.map(_._2))
    // ideal Z-order on this grid: 16 16×16 quadrants (range 15 each);
    // allow slack for sampled range boundaries
    assert(zx <= 24.0, s"zorder avg x-range $zx")
    assert(zy <= 24.0, s"zorder avg y-range $zy")
    // the single-key layout leaves the second dimension unclustered:
    // nearly the full 0..63 domain inside every partition
    assert(ly >= 48.0, s"x-sorted layout should not cluster y (got $ly)")
  }

  test("compactTo bin-packs small files per partition, preserving rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toFile
    dir.deleteOnExit()
    val base = s"$dir/t"
    // the S7 daily-append degradation: two appends of 10 files into each
    // of 3 DAY_DT partitions -> 20 small files per partition
    for (_ <- 0 until 2)
      (0 until 3000).map(i => (i.toLong, s"payload_$i", (i % 3).toLong))
        .toDF("id", "payload", "day_dt")
        .repartition(10)
        .write.mode("append").partitionBy("day_dt").parquet(base)
    def partFiles(day: Long): Seq[java.io.File] =
      new java.io.File(s"$base/day_dt=$day").listFiles.toSeq
        .filter(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith("."))
    assert(partFiles(0).size == 20)
    val before = spark.read.parquet(base)
      .as[(Long, String, Long)].collect().sorted.toSeq

    // target larger than any partition's bytes -> one file per partition
    val report = Layout.compactTo(spark, base, 1L << 30)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    for (day <- 0L until 3L) {
      assert(partFiles(day).size == 1, s"day $day not packed to one file")
      val (fb, fa, bytes) = report(s"file:$base/day_dt=$day")
      assert(fb == 20L && fa == 1L && bytes > 0L)
    }
    val after = spark.read.parquet(base)
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(after == before, "compaction changed the row multiset")

    // idempotence: a second run rewrites nothing
    val again = Layout.compactTo(spark, base, 1L << 30)
      .as[(String, Long, Long, Long)].collect()
    assert(again.forall(r => r._2 == r._3),
      s"second compaction was not a no-op: ${again.toSeq}")

    // a small target splits into multiple bins: ceil(bytes/target) files
    // rebuild the small-file state for one partition, then size the
    // target off the rebuilt dir's ACTUAL bytes -> exactly 2 bins
    spark.read.parquet(s"$base/day_dt=0").repartition(12)
      .write.mode("overwrite").parquet(s"$dir/p0")
    val p0Bytes = new java.io.File(s"$dir/p0").listFiles.toSeq
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
      .map(_.length).sum
    val r0 = Layout.compactTo(spark, s"$dir/p0", p0Bytes / 2 + 1)
      .as[(String, Long, Long, Long)].collect().head
    assert(r0._2 == 12L && r0._3 == 2L,
      s"expected 12 -> 2 bins, got ${r0._2} -> ${r0._3}")
  }

  test("compactTo recovers a crash mid-swap without losing a row") {
    val dir = java.nio.file.Files.createTempDirectory("graft-crash").toFile
    dir.deleteOnExit()
    val base = s"$dir/t"
    (0 until 600).map(i => (i.toLong, s"p_$i")).toDF("id", "payload")
      .repartition(6).write.parquet(base)
    val before = spark.read.parquet(base)
      .as[(Long, String)].collect().sorted.toSeq
    // manufacture the exact interrupted state the three-phase swap can
    // crash into: tmp fully written + SUCCESS-gated, trash created, and
    // only SOME originals moved to trash (phase 2 died midway)
    val part = new java.io.File(base)
    def files(d: java.io.File) = d.listFiles.toSeq.filter(f =>
      f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    spark.read.parquet(base).repartition(1)
      .write.parquet(s"$base/_graft_compact_tmp")
    assert(new java.io.File(s"$base/_graft_compact_tmp/_SUCCESS").exists)
    val trash = new java.io.File(s"$base/_graft_compact_trash")
    trash.mkdirs()
    files(part).take(3).foreach { f =>
      assert(f.renameTo(new java.io.File(trash, f.getName)))
    }
    // a re-run must RESUME the swap (not discard tmp, not double-count)
    val report = Layout.compactTo(spark, base, 1L << 30)
      .as[(String, Long, Long, Long)].collect()
    assert(report.length == 1 && report.head._3 == 1L,
      s"recovery did not converge to one file: ${report.toSeq}")
    val after = spark.read.parquet(base)
      .as[(Long, String)].collect().sorted.toSeq
    assert(after == before, "crash recovery changed the row multiset")
    assert(!new java.io.File(s"$base/_graft_compact_tmp").exists)
    assert(!trash.exists)
  }

  test("Z-ordered parquet prunes row groups for filters on EITHER key") {
    // end-to-end: write both layouts, run the same selective filter, and
    // read the scan's actual output-row metric — the number of rows that
    // survived parquet row-group min/max pruning + page filtering. This
    // is the 100 TB claim stated as a measurement, not an argument.
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toFile
    dir.deleteOnExit()
    val grid = (0 until 4096)
      .map(i => ((i % 64).toLong, (i / 64).toLong))
      .toDF("x", "y")
    Layout.zorderBy(grid, col("x"), col("y"), 16)
      .write.mode("overwrite").parquet(s"$dir/z")
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$dir/linear")
    def scannedRows(path: String): Long = {
      val df = spark.read.parquet(path).filter(col("y") < 8)
      df.collect() // run to populate metrics
      val scan = df.queryExecution.executedPlan.collectLeaves().head
      scan.metrics("numOutputRows").value
    }
    val zScanned = scannedRows(s"$dir/z")
    val linScanned = scannedRows(s"$dir/linear")
    // y < 8 selects 512 of 4096 rows. Under Z-order only the files whose
    // y-rectangle intersects [0, 8) are materialized; under the x-sorted
    // layout every file's y-range spans the domain, so nothing prunes.
    assert(linScanned == 4096L,
      s"x-sorted layout unexpectedly pruned ($linScanned)")
    assert(zScanned <= 1024L,
      s"Z-order layout should prune most row groups, scanned $zScanned")
  }
}
