package graft
import org.apache.spark.sql.SparkSession

/** Benchmark harness: one JSON line `{"metric":"total",...}` per run.
  *
  * Methodology (round-1 defects fixed):
  *  - A warmup pass over every query first (JVM/codegen/parquet-footer
  *    warmup was previously charged entirely to whichever query ran first —
  *    it dominated the round-1 numbers).
  *  - Failures are recorded per-query in "errors" and force a nonzero
  *    value (3600s sentinel) instead of silently *improving* the total.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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

    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
    // Warmup: run everything once, ignore timing (and errors — they are
    // caught again, visibly, in the measured pass).
    queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }

    var errors = List.empty[(String, String)]
    val results = queries.map { case (name, fn) =>
      // queries persist intermediate frames; drop them between runs so a
      // query's timing never pays for (or benefits from) a sibling's cache
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        name -> (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          errors ::= (name -> e.toString.take(200))
          name -> 3600.0 // failure sentinel: a broken query must not help
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val qs = results.map { case (k, v) => s"${q(k)}:$v" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"${q(k)}:${q(v)}" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
