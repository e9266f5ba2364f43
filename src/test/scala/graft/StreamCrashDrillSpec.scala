package graft

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Guards the crash-drill main's three phases end-to-end (no kill — the
  * SIGKILL rolls live in tools/stream_crash_drill.sh, which a spec
  * cannot do to its own JVM): init chunks the fixture with corrupt
  * lines, serve drip-feeds and drains the three checkpointed queries,
  * check must find all three sinks exactly-once vs the batch re-parse.
  * A SECOND serve over the same work dir must be a no-op (idempotent
  * resume path: nothing new to feed, checkpoints already drained) and
  * keep check green — the same code path a post-crash resume takes.
  */
class StreamCrashDrillSpec extends SparkSpec {

  test("drill phases: init -> serve -> check green; re-serve idempotent") {
    val work = Files.createTempDirectory("crash_drill_spec").toString
    val sf = "/root/testdata/sf0.001"
    StreamCrashDrill.init(spark, sf, work, 6)
    val chunks = Files.list(Paths.get(work, "chunks")).count()
    assert(chunks == 7, s"6 chunks + MAXTS expected, got $chunks")
    StreamCrashDrill.serve(spark, work, feedIntervalMs = 30)
    assert(Files.exists(Paths.get(work, "SERVED")))
    assert(StreamCrashDrill.check(spark, work) == 0)
    // resume path: a second serve finds everything fed and committed
    StreamCrashDrill.serve(spark, work, feedIntervalMs = 30)
    assert(StreamCrashDrill.check(spark, work) == 0)
  }
}
