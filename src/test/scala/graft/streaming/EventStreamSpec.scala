package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class EventStreamSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("watermarked daily window aggregates a real stream incrementally") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = input.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStream.dailyCounts(events).writeStream
      .format("memory").queryName("daily_out")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.5),
        (2L, ts("2024-01-01 11:00:00"), 2L, "click", 2.5),
        (3L, ts("2024-01-02 09:00:00"), 1L, "view", 4.0))
      q.processAllAvailable()
      val out = spark.table("daily_out")
        .select("day_start", "event_type", "n_events")
        .as[(Timestamp, String, Long)].collect().toSet
      assert(out.contains((ts("2024-01-01 00:00:00"), "click", 2L)))
      assert(out.contains((ts("2024-01-02 00:00:00"), "view", 1L)))
    } finally q.stop()
  }

  test("mapGroupsWithState sessionizer accumulates per-user state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    val q = EventStream.sessionize(input.toDS()).writeStream
      .format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        EventStream.Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
        EventStream.Event(2, ts("2024-01-01 10:05:00"), 7, "click", 2.0),
        EventStream.Event(3, ts("2024-01-01 10:06:00"), 9, "view", 5.0))
      q.processAllAvailable()
      val out = spark.table("sessions_out")
        .select("user_id", "n_events", "total_value")
        .as[(Long, Long, Double)].collect().toMap2
      assert(out(7L) == ((2L, 3.0)))
      assert(out(9L) == ((1L, 5.0)))
      // a later event far past the gap restarts the in-batch session
      input.addData(
        EventStream.Event(4, ts("2024-01-01 12:00:00"), 7, "click", 9.0))
      q.processAllAvailable()
      val out2 = spark.table("sessions_out")
        .select("user_id", "n_events", "total_value")
        .as[(Long, Long, Double)].collect()
      assert(out2.contains((7L, 1L, 9.0)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits each closed session exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStream.Event]
    val q = EventStream.sessionizeClosed(input.toDS()).writeStream
      .format("memory").queryName("closed_out")
      .outputMode(OutputMode.Append()).start()
    def closed(): Seq[(Long, Long, Long, Long, Double)] =
      spark.table("closed_out")
        .as[EventStream.ClosedSession].collect()
        .map(s => (s.user_id, s.start_ts, s.end_ts, s.n_events,
          s.total_value)).toSeq.sorted
    try {
      // one batch spanning TWO gaps for user 7: two sessions close at
      // once (the multi-emit mapGroupsWithState cannot express), the
      // third stays open in state
      input.addData(
        EventStream.Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
        EventStream.Event(2, ts("2024-01-01 10:05:00"), 7, "click", 2.0),
        EventStream.Event(3, ts("2024-01-01 12:00:00"), 7, "view", 4.0),
        EventStream.Event(4, ts("2024-01-01 14:00:00"), 7, "click", 8.0))
      q.processAllAvailable()
      assert(closed() == Seq(
        (7L, ts("2024-01-01 10:00:00").getTime,
          ts("2024-01-01 10:05:00").getTime, 2L, 3.0),
        (7L, ts("2024-01-01 12:00:00").getTime,
          ts("2024-01-01 12:00:00").getTime, 1L, 4.0)))
      // next batch EXTENDS the open session across the batch boundary,
      // then a gap closes it: start_ts proves state carried over
      input.addData(
        EventStream.Event(5, ts("2024-01-01 14:10:00"), 7, "click", 16.0),
        EventStream.Event(6, ts("2024-01-01 16:00:00"), 7, "click", 32.0))
      q.processAllAvailable()
      assert(closed().last ==
        (7L, ts("2024-01-01 14:00:00").getTime,
          ts("2024-01-01 14:10:00").getTime, 2L, 24.0))
      assert(closed().size == 3) // the 16:00 session is still open
      // a LATE arrival (before the open session's end) must not rewind
      // end_ts: after it, an event 25min past the true newest event
      // still EXTENDS (the rewind bug would see a 35min gap and close)
      input.addData(
        EventStream.Event(7, ts("2024-01-01 15:50:00"), 7, "click", 64.0))
      q.processAllAvailable()
      input.addData(
        EventStream.Event(8, ts("2024-01-01 16:25:00"), 7, "click", 128.0))
      q.processAllAvailable()
      assert(closed().size == 3, "late arrival rewound the session end")
    } finally q.stop()
  }

  test("session_window streaming agg matches batch semantics on a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = input.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    // session windows only support Append: sessions emit once finalized by
    // the watermark, so a far-future event flushes them.
    val q = EventStream.sessionCounts(events).writeStream
      .format("memory").queryName("swin_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0),
        (2L, ts("2024-01-01 10:10:00"), 1L, "click", 1.0), // same session
        (3L, ts("2024-01-01 11:30:00"), 1L, "click", 1.0)) // new session
      q.processAllAvailable()
      input.addData(
        (4L, ts("2024-02-01 00:00:00"), 9L, "click", 1.0)) // watermark flush
      q.processAllAvailable()
      val out = spark.table("swin_out")
        .select("user_id", "n_events").as[(Long, Long)].collect().toSeq
      assert(out.sorted == Seq((1L, 1L), (1L, 2L)))
    } finally q.stop()
  }

  private implicit class MapOps[A, B, C](xs: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = xs.map(t => t._1 -> ((t._2, t._3))).toMap
  }

  test("streaming dedup: first copy wins; state expires with the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val q = EventStream.dedupDocs(docs).writeStream.format("memory")
      .queryName("dedup_out").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, ts("2024-01-01 10:00:00"), "alpha"),
        (2L, ts("2024-01-01 10:01:00"), "beta"),
        (3L, ts("2024-01-01 10:02:00"), "  Alpha ")) // normalized dup
      q.processAllAvailable()
      input.addData((4L, ts("2024-01-01 10:30:00"), "alpha")) // still dup
      q.processAllAvailable()
      val out1 = spark.table("dedup_out")
        .select("doc_id").as[Long].collect().toSet
      assert(out1 == Set(1L, 2L))
      // a next-day event pushes the watermark past eventTime+delay for the
      // alpha state; a fresh copy afterwards re-emits (bounded-state
      // contract: dedup is guaranteed only within the watermark delay)
      input.addData((5L, ts("2024-01-02 10:00:00"), "gamma"))
      q.processAllAvailable()
      input.addData((6L, ts("2024-01-02 10:01:00"), "alpha"))
      q.processAllAvailable()
      val out2 = spark.table("dedup_out")
        .select("doc_id").as[Long].collect().toSet
      assert(out2 == Set(1L, 2L, 5L, 6L), s"got $out2")
    } finally q.stop()
  }

  test("foreachBatch JDBC sink lands every micro-batch with its batch id") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files
      .createTempDirectory("graft_jdbc_stream").toString
    val url = graft.io.Jdbc.derbyUrl(s"$base/db")
    val input = MemoryStream[(Long, String)]
    val q = EventStream.toJdbc(
      input.toDF().toDF("event_id", "event_type"),
      url, "stream_events", s"$base/ck")
    try {
      input.addData((1L, "click"), (2L, "view"))
      q.processAllAvailable()
      input.addData((3L, "click"))
      q.processAllAvailable()
      val landed = graft.io.Jdbc.read(spark, url, "stream_events")
        .select("event_id", "batch_id")
        .as[(Long, Long)].collect().toSet
      assert(landed.map(_._1) == Set(1L, 2L, 3L))
      // the two adds arrived in distinct micro-batches with distinct ids
      assert(landed.collect { case (3L, b) => b } !=
        landed.collect { case (1L, b) => b })
      // foreachBatch is at-least-once: simulate a post-write/pre-commit
      // crash by re-landing batch 0 verbatim — the idempotent writer
      // must converge (no duplicate rows), not double-append
      // materialize first: a lazy self-read would execute AFTER the
      // writer's delete and re-land nothing
      val batch0Rows = graft.io.Jdbc.read(spark, url, "stream_events")
        .filter(col("batch_id") === 0L)
        .select("event_id", "event_type", "batch_id")
        .as[(Long, String, Long)].collect().toSeq
      val batch0 = batch0Rows.toDF("event_id", "event_type", "batch_id")
      graft.io.Jdbc.writeBatchIdempotent(
        batch0, url, "stream_events", "batch_id", 0L)
      val replayed = graft.io.Jdbc.read(spark, url, "stream_events")
        .select("event_id", "batch_id").as[(Long, Long)].collect()
      assert(replayed.length == landed.size, "replay duplicated rows")
      assert(replayed.toSet == landed)
      // only table-NOT-FOUND counts as "first batch": any other
      // SQLException during the existence probe (here a syntax error,
      // standing in for connection drops / lock timeouts) must
      // propagate — swallowing it would skip the DELETE and duplicate
      // the replayed batch
      val bad = intercept[java.sql.SQLException] {
        graft.io.Jdbc.writeBatchIdempotent(
          batch0, url, "stream_events..bad", "batch_id", 0L)
      }
      assert(bad.getSQLState != "42X05", s"probe error treated as missing")
    } finally q.stop()
  }

  test("streamed LSH-index probe equals the batch probe across a restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files
      .createTempDirectory("graft_lsh_stream").toString
    val (out, ck) = (s"$base/out", s"$base/ck")
    // the same docs minhashLshIndexed probes, split across two
    // micro-batches with a full stop/restart between them — the ingest
    // crash-recovery path
    val slice = graft.ext.DedupOps.incrementalBatchDocs(spark, sfDir)
      .as[(Long, String)].collect().sortBy(_._1)
    val (first, second) = slice.splitAt(slice.length / 2)

    val input1 = MemoryStream[(Long, String)]
    val q1 = EventStream.lshProbeToParquet(
      input1.toDF().toDF("doc_id", "text"), sfDir, out, ck)
    try {
      input1.addData(first.toSeq)
      q1.processAllAvailable()
    } finally q1.stop()

    val input2 = MemoryStream[(Long, String)]
    input2.addData(first.toSeq) // offsets before the checkpoint re-add
    val q2 = EventStream.lshProbeToParquet(
      input2.toDF().toDF("doc_id", "text"), sfDir, out, ck)
    try {
      input2.addData(second.toSeq)
      q2.processAllAvailable()
    } finally q2.stop()

    val streamed = spark.read.parquet(out)
      .select("batch_id", "corpus_id", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val batch = graft.ext.DedupOps.minhashLshIndexed(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSet
    assert(streamed.nonEmpty, "stream probed no pairs — vacuous fixture")
    assert(streamed == batch,
      s"missing=${(batch -- streamed).take(5)} extra=${(streamed -- batch).take(5)}")
  }

  test("file sink + checkpoint: restart resumes and output is exactly-once") {
    import spark.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft_stream_ck").toString
    val (in, out, ck) = (s"$base/in", s"$base/out", s"$base/ck")
    def addFile(day: Int, events: (Long, String, Double)*): Unit =
      events.map { case (id, typ, v) =>
        (id, ts(f"2024-01-0$day 10:00:00"), id, typ, v)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(in)

    addFile(1, (1L, "click", 1.0), (2L, "click", 2.0))
    val schema = spark.read.parquet(in).schema
    def readIn = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)

    // phase 1: two more days arrive; watermark finalizes day 1 into the sink
    val q1 = EventStream.dailyCountsToFiles(readIn, out, ck)
    try {
      q1.processAllAvailable()
      addFile(2, (3L, "view", 4.0))
      q1.processAllAvailable()
      addFile(3, (4L, "view", 8.0))
      q1.processAllAvailable()
    } finally q1.stop() // "kill": the checkpoint is the only survivor

    // phase 2: restart from the same checkpoint; day 4 finalizes day 2.
    // Offsets replay from the checkpoint — a re-emission of day 1 here
    // would be a duplicate in the sink and fail the exactly-once assert.
    val q2 = EventStream.dailyCountsToFiles(readIn, out, ck)
    try {
      addFile(4, (5L, "click", 16.0))
      q2.processAllAvailable()
    } finally q2.stop()

    // batch read goes through the sink's _spark_metadata manifest
    val rows = spark.read.parquet(out)
      .select("day_start", "event_type", "n_events")
      .as[(Timestamp, String, Long)].collect().toSeq
    assert(rows.size == rows.toSet.size, s"duplicate sink rows: $rows")
    // eviction runs with the POST-batch watermark: after the day-4 file,
    // wm = Jan 4 09:00, so days 1–3 are all finalized; day 4 stays open
    assert(rows.toSet == Set(
      (ts("2024-01-01 00:00:00"), "click", 2L),
      (ts("2024-01-02 00:00:00"), "view", 1L),
      (ts("2024-01-03 00:00:00"), "view", 1L)),
      s"finalized windows wrong: $rows")
  }

  test("file-source stream over the fixture equals the batch aggregation") {
    import spark.implicits._
    val q = EventStream
      .dailyCounts(EventStream.readEvents(spark, sfDir))
      .writeStream.format("memory").queryName("fixture_daily")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update()).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("fixture_daily")
        .groupBy("day_start", "event_type")
        .agg(org.apache.spark.sql.functions.max("n_events").as("n_events"))
        .select("event_type", "n_events")
        .as[(String, Long)].collect().groupMapReduce(_._1)(_._2)(_ + _)
      val batch = graft.ext.EventOps.eventsDaily(spark, sfDir)
        .select("event_type", "n_events")
        .as[(String, Long)].collect().groupMapReduce(_._1)(_._2)(_ + _)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("watermarked interval join equals the identical batch join") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val q = EventStream
      .viewsBeforePurchase(EventStream.readEvents(spark, sfDir))
      .writeStream.format("memory").queryName("interval_join")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("interval_join")
        .select("event_id", "view_event_id")
        .as[(Long, Long)].collect().toSet
      // the identical join, batch semantics, same fixture
      val e = graft.ext.EventOps.events(spark, sfDir)
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id").as("vu"), col("event_id").as("ve"),
          col("ts").as("vts"))
      val batch = e.filter(col("event_type") === "purchase")
        .join(views, col("user_id") === col("vu") &&
          col("vts") >= col("ts") - expr("INTERVAL 1 HOUR") &&
          col("vts") <= col("ts"))
        .select("event_id", "ve").as[(Long, Long)].collect().toSet
      assert(streamed == batch,
        s"missing=${batch.diff(streamed).take(5)} " +
          s"extra=${streamed.diff(batch).take(5)}")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("batched scoring seam composes with a document stream unchanged") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.ext.TextOps.documents(spark, sfDir)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val (first, second) = docs.splitAt(docs.length / 2)

    val input = MemoryStream[(Long, String)]
    val q = EventStream.scoreDocs(input.toDS(), batchSize = 16)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("scored_docs").start()
    try {
      input.addData(first)
      q.processAllAvailable()
      input.addData(second) // a second micro-batch re-opens handles
      q.processAllAvailable()
      val streamed = spark.table("scored_docs")
        .as[(Long, Long, Double)].collect().toSet
      val batch = graft.ext.ScoringOps.modelScore(spark, sfDir)
        .as[(Long, Long, Double)].collect().toSet
      assert(streamed == batch,
        s"missing=${batch.diff(streamed).take(5)} " +
          s"extra=${streamed.diff(batch).take(5)}")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming expectations gate reports per micro-batch, exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.Quality
    val rules = Seq(
      Quality.Rule.NotNull("v"),
      Quality.Rule.InRange("amt", 0.0, 100.0),
      Quality.Rule.Unique(Seq("id")))
    val b1 = Seq((1L, "a", 10.0), (2L, "b", 20.0), (2L, "c", 150.0))
    val b2 = Seq((4L, null.asInstanceOf[String], 30.0), (5L, "e", 40.0))
    val out = java.nio.file.Files
      .createTempDirectory("exp_gate").toString
    val input = MemoryStream[(Long, String, Double)]
    val q = EventStream.expectationsToParquet(
      input.toDS().toDF("id", "v", "amt"), rules,
      s"$out/reports", s"$out/ckpt")
    try {
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
      val got = spark.read.parquet(s"$out/reports")
        .select("report_batch", "rule_name", "n_rows", "n_violations",
          "passed")
        .as[(Long, String, Long, Long, Boolean)].collect().toSet
      def batchReport(id: Long, rows: Seq[(Long, String, Double)]) =
        Quality.expectations(rows.toDF("id", "v", "amt"), rules)
          .as[(String, Long, Long, Boolean)].collect()
          .map { case (r, n, v, p) => (id, r, n, v, p) }.toSet
      assert(got == batchReport(0L, b1) ++ batchReport(1L, b2))
      // both a failing and a passing batch-rule cell exist
      assert(got.exists(!_._5) && got.exists(_._5))
    } finally q.stop()
  }

  test("streaming CDC: per-batch diffs vs a static snapshot union to the batch diff") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("id", "v")
    val b1 = Seq((1L, "a"), (2L, "B"))          // unchanged + changed
    val b2 = Seq((4L, "d"), (3L, "c"))          // added + unchanged
    val out = java.nio.file.Files.createTempDirectory("cdc").toString
    val input = MemoryStream[(Long, String)]
    val q = EventStream.diffToParquet(input.toDS().toDF("id", "v"),
      prev, Seq("id"), Seq("v"), s"$out/diffs", s"$out/ckpt")
    try {
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
      val streamed = spark.read.parquet(s"$out/diffs")
        .select("id", "change").as[(Long, String)].collect().toSet
      val batch = graft.ops.Snapshot.diff(
        (b1 ++ b2).toDF("id", "v"), prev, Seq("id"), Seq("v"))
        .filter($"change" =!= "removed")
        .as[(Long, String)].collect().toSet
      assert(streamed == batch)
      assert(streamed == Set((2L, "changed"), (4L, "added")))
    } finally q.stop()
  }

  test("streaming fluency gate equals batch LM scoring across a restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // batch-train the reference LM once (the offline half)
    val (cAb, cA, voc) = graft.ext.LmOps.trainTables(spark, sfDir)
    val fixture = graft.ext.TextOps.documents(spark, sfDir)
      .select("doc_id", "lang", "text")
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    val (b1, rest) = fixture.splitAt(fixture.size / 3)
    val (b2, b3) = rest.splitAt(rest.size / 3)
    // the batch tercile run's tail boundary sits near 39 at this SF
    // (q_perplexity_buckets); anything in the distribution's interior
    // exercises both gate outcomes
    val threshold = 37.0
    val out = java.nio.file.Files.createTempDirectory("fluency").toString
    val input = MemoryStream[(Long, String, String)]
    def start() = EventStream.fluencyGate(
      input.toDS().toDF("doc_id", "lang", "text"),
      cAb, cA, voc, threshold, s"$out/scored", s"$out/ckpt")
    val q = start()
    try {
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
    } finally q.stop()
    // restart from the checkpoint; the remaining feed arrives after
    val q2 = start()
    try {
      input.addData(b3)
      q2.processAllAvailable()
    } finally q2.stop()
    val streamed = spark.read.parquet(s"$out/scored")
      .select("doc_id", "lang", "n_bigrams", "mean_inv", "pass")
      .as[(Long, String, Long, Double, Boolean)].collect().toSet
    val batch = graft.ext.LmOps.scoreDocs(
      graft.ext.LmOps.withToks(
        fixture.toDF("doc_id", "lang", "text")), cAb, cA, voc)
      .withColumn("pass", $"mean_inv" <= threshold)
      .select("doc_id", "lang", "n_bigrams", "mean_inv", "pass")
      .as[(Long, String, Long, Double, Boolean)].collect().toSet
    assert(streamed == batch)
    // the gate must separate the feed, not wave everything through
    assert(streamed.exists(_._5) && streamed.exists(!_._5))
  }

  test("ingest funnel stream == batch funnel across a restart; stats add up") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (cAb, cA, voc) = graft.ext.LmOps.trainTables(spark, sfDir)
    // the feed = docs NOT in the persisted corpus index (so the dup
    // gate has a real corpus to catch near-dups against)
    val feed = graft.ext.DedupOps.incrementalBatchDocs(spark, sfDir)
      .join(graft.ext.TextOps.documents(spark, sfDir)
        .select("doc_id", "lang"), Seq("doc_id"))
      .select("doc_id", "lang", "text")
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    val (qMin, fMax) = (0.5, 40.0)
    val out = java.nio.file.Files.createTempDirectory("funnel").toString
    val input = MemoryStream[(Long, String, String)]
    def start() = EventStream.ingestFunnel(
      input.toDS().toDF("doc_id", "lang", "text"), sfDir,
      cAb, cA, voc, qMin, fMax, s"$out/f", s"$out/ckpt")
    val (b1, rest) = feed.splitAt(feed.size / 3)
    val q = start()
    try { input.addData(b1); q.processAllAvailable() } finally q.stop()
    val q2 = start()
    try { input.addData(rest); q2.processAllAvailable() } finally q2.stop()

    val streamed = spark.read
      .parquet(s"$out/f/accepted_batch=*")
      .select("doc_id", "lang", "text")
      .as[(Long, String, String)].collect().toSet
    val (refAccepted, refStats) = EventStream.ingestFunnelBatch(
      feed.toDF("doc_id", "lang", "text"), sfDir, cAb, cA, voc, qMin, fMax)
    val expected =
      try refAccepted.select("doc_id", "lang", "text")
        .as[(Long, String, String)].collect().toSet
      finally { refAccepted.unpersist(false); () }
    assert(streamed == expected)
    assert(streamed.nonEmpty, "funnel accepted nothing — vacuous")

    // per-batch stats sum to the whole-feed stats, and conservation
    // holds: in = drops + accepted
    val statRows = spark.read.parquet(s"$out/f/stats_batch=*")
      .select("n_in", "n_quality_drop", "n_dup_drop", "n_fluency_drop",
        "n_unscored", "n_accepted")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val summed = statRows.reduce((a, b) =>
      (a._1 + b._1, a._2 + b._2, a._3 + b._3, a._4 + b._4, a._5 + b._5,
        a._6 + b._6))
    val whole = refStats
      .select("n_in", "n_quality_drop", "n_dup_drop", "n_fluency_drop",
        "n_unscored", "n_accepted")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(summed == whole, s"$summed != $whole")
    // conservation: in = drops + accepted (n_unscored is the
    // no-reference-model SUBSET of n_fluency_drop, not a new stage)
    assert(whole._1 == whole._2 + whole._3 + whole._4 + whole._6)
    assert(whole._5 <= whole._4)
    // the funnel actually filters: at least two stages drop something
    assert(Seq(whole._2, whole._3, whole._4).count(_ > 0L) >= 2,
      s"stats $whole — funnel too permissive for a meaningful test")

    // tokenizer-at-admission: per-batch token/word counts sum to the
    // whole-feed counts (the frozen model makes them doc-additive),
    // and every batch's fertility is exactly its tokens/words ratio
    val tokRows = spark.read.parquet(s"$out/f/stats_batch=*")
      .select("n_tok_words", "n_tokens", "fertility")
      .as[(Long, Long, Double)].collect()
    val (sw, st) = (tokRows.map(_._1).sum, tokRows.map(_._2).sum)
    val (ww, wt) = refStats.select("n_tok_words", "n_tokens")
      .as[(Long, Long)].head()
    assert((sw, st) == ((ww, wt)), s"token sums ($sw,$st) != ($ww,$wt)")
    assert(wt > 0L, "admitted docs must carry tokens — vacuous otherwise")
    assert(wt >= ww, "unigram fertility is >= 1 token per word")
    for ((w, t, f) <- tokRows)
      assert(f == t.toDouble / math.max(w, 1L).toDouble,
        s"fertility $f != $t/$w")
  }

}
