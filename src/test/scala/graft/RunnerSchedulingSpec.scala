package graft

import java.io.File

import org.apache.spark.sql.functions.col

import graft.pipelines.Ingestion

/** The scheduler-semantics layer the reference delegates to Airflow:
  * bounded per-task retry (attempt counting, fail-fast on exhaustion,
  * later tasks never run after an abort) and the multi-date backfill's
  * partition arithmetic (per-day DAY_DT partitions accumulate; a
  * re-run of one day is idempotent and leaves neighbors untouched).
  */
class RunnerSchedulingSpec extends SparkSpec {
  import spark.implicits._

  test("retry: flaky task succeeds within budget, attempts are logged") {
    var calls = 0
    val logs = Seq.newBuilder[String]
    Runner.runChain(Seq(
      "flaky" -> (() => {
        calls += 1
        if (calls < 3) sys.error(s"boom $calls")
        7L
      }),
      "after" -> (() => 1L)),
      maxRetries = 3, log = logs += _)
    assert(calls == 3, "two failures then success")
    val out = logs.result()
    assert(out.exists(_.contains("flaky ok rows=7")), out.toString)
    assert(out.count(_.contains("retrying")) == 2, out.toString)
    assert(out.exists(l => l.contains("flaky ok") &&
      l.contains("attempts=3")), out.toString)
    assert(out.exists(_.contains("after ok")), "chain continues")
  }

  test("retry exhaustion aborts fail-fast; later tasks never run") {
    var ran = false
    val e = intercept[RuntimeException] {
      Runner.runChain(Seq(
        "doomed" -> (() => sys.error("always")),
        "never" -> (() => { ran = true; 1L })),
        maxRetries = 2)
    }
    assert(e.getMessage == "always")
    assert(!ran, "tasks after an exhausted retry must not run")
  }

  test("zero retries (the default) == the original fail-fast loop") {
    var calls = 0
    intercept[RuntimeException] {
      Runner.runChain(Seq("t" -> (() => { calls += 1; sys.error("x") })))
    }
    assert(calls == 1, "no retry unless opted in")
  }

  test("backfill: per-day partitions accumulate; day re-run idempotent") {
    val legacy = s"target/ingest/${new File(sfDir).getName}/suppliers/legacy"
    def dayRows(d: String): Seq[(Long, String)] =
      spark.read.parquet(legacy)
        .filter(col("DAY_DT") === d)
        .select(col("SUPPLIER_ID"), col("SUPPLIER_NAME"))
        .as[(Long, String)].collect().toSeq.sortBy(_._1)
    val (d1, d2) = ("2024-06-01", "2024-06-02")
    val n1 = Ingestion.suppliers(spark, sfDir, d1).count()
    val n2 = Ingestion.suppliers(spark, sfDir, d2).count()
    assert(n1 == n2 && n1 > 0, "same feed lands for both logical days")
    val r1 = dayRows(d1)
    val r2 = dayRows(d2)
    assert(r1.nonEmpty && r1 == r2.sortBy(_._1),
      "both partitions hold the feed")
    // re-running day 2 must leave day 1's partition untouched and
    // reproduce day 2's rows exactly (dynamic-partition overwrite)
    Ingestion.suppliers(spark, sfDir, d2).count()
    assert(dayRows(d1) == r1, "neighbor partition modified by re-run")
    assert(dayRows(d2) == r2, "day re-run is not idempotent")
  }
}
