package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timing: `runMain graft.Time <sfDir> <query> [query...]`.
  * Dev tool for isolating bench regressions; BENCH numbers come from Bench.
  */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // bucketed fact scans emit per-bucket sort order (Bucketing writes
      // exactly one file per bucket, which makes this safe) so fact-fact
      // merge joins run sort-free as well as shuffle-free
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      // the events fixture is TIMESTAMP(NANOS) parquet; its reader
      // requires this mapping and fails loudly if unset (EventOps.events)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.tail.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"TIMED $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
