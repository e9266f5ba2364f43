package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
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
}
