package graft.ext

import graft.SparkSpec

class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join picks the latest view at or before each purchase") {
    // independent driver-side model over the raw fixture: for every
    // purchase, the winning view is the max (ts, event_id) among the
    // user's views with ts <= purchase ts
    val raw = EventOps.events(spark, sfDir)
      .select($"user_id", $"event_id", $"event_type",
        org.apache.spark.sql.functions.unix_micros($"ts").as("ts_us"))
      .as[(Long, Long, String, Long)].collect()
    val views = raw.filter(_._3 == "view")
      .groupBy(_._1).view.mapValues(_.map(r => (r._4, r._2)).sorted).toMap
    val expected = raw.filter(_._3 == "purchase").map { p =>
      val best = views.getOrElse(p._1, Array.empty[(Long, Long)])
        .filter(_._1 <= p._4).lastOption
      (p._1, p._2) -> best.map(_._2)
    }.toMap

    val got = EventOps.asofJoin(spark, sfDir)
      .select("user_id", "event_id", "view_event_id")
      .as[(Long, Long, Option[Long])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

    assert(got.keySet == expected.keySet)
    val bad = expected.collect {
      case (k, exp) if got(k) != exp => (k, exp, got(k))
    }
    assert(bad.isEmpty, s"as-of mismatches: ${bad.take(5)}")
  }

  test("as-of join runs as one keyed window pass, no range join") {
    val p = EventOps.asofJoin(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoopJoin") && !p.contains("CartesianProduct"),
      "as-of degenerated into a range/cross join:\n" + p.take(1500))
    assert(p.contains("Window"), "carry-forward window missing")
  }
}
