package graft
import org.apache.spark.sql.SparkSession

/** Benchmark harness: one JSON line `{"metric":"total",...}` per run.
  *
  * Methodology (round-1 defects fixed; round-3 variance fixed):
  *  - A warmup pass over every query first (JVM/codegen/parquet-footer
  *    warmup was previously charged entirely to whichever query ran first —
  *    it dominated the round-1 numbers).
  *  - Failures are recorded per-query in "errors" and force a nonzero
  *    value (3600s sentinel) instead of silently *improving* the total.
  *  - Each query is measured over SPARK_GRAFT_BENCH_RUNS passes (default
  *    3) and reported as the per-query MEDIAN; the total is the sum of
  *    medians. Single-run totals on this class of shared VM swing ±40%
  *    (round 3's recorded 59 s was a ~40 s build measured once under
  *    load) — the median absorbs the machine-noise outliers.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_MASTER: run the same bench against a real cluster
    // manager (the Runner override; default stays local mode)
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(master)
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

    val runsN = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    var errors = List.empty[(String, String)]
    val perRun: Seq[Map[String, Double]] = (1 to runsN).map { _ =>
      queries.map { case (name, fn) =>
        // queries persist intermediate frames; drop them between runs so a
        // query's timing never pays for (or benefits from) a sibling's cache
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          name -> (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            if (!errors.exists(_._1 == name))
              errors ::= (name -> e.toString.take(200))
            name -> 3600.0 // failure sentinel: a broken query must not help
        }
      }.toMap
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
    }
    val results = queries.map { case (name, _) =>
      name -> median(perRun.map(_(name)))
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val qs = results.map { case (k, v) => s"${q(k)}:$v" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"${q(k)}:${q(v)}" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // artifact_tier: whether telemetry/lifecycle queries read the
    // persisted shared artifacts (LSH pairs, bm25 tf) instead of
    // rebuilding their chains — the build cost stays measured in the
    // designated builder queries (q_minhash_lsh, q_bm25).
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"runs":$runsN,"artifact_tier":${graft.io.Artifacts.sharedTier},"sf":"$sfDir"}"""
    println(line)
    // The driver captures only a stdout tail, which truncates the
    // per-query map once enough queries exist; persist the full record
    // so every round's complete bench artifact survives.
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json"))
    if (out.getParent != null) java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
