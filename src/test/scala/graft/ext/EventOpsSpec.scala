package graft.ext

import org.apache.spark.sql.functions._

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

  test("forward as-of picks the earliest view at or after each purchase") {
    val raw = EventOps.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("user_id"),
        unix_micros(col("ts")).as("t"), col("value"))
      .as[(Long, String, Long, Long, Double)].collect()
    val views = raw.filter(_._2 == "view")
    val expected = raw.filter(_._2 == "purchase").map {
      case (pid, _, uid, tp, _) =>
        val later = views.filter(v => v._3 == uid && v._4 >= tp)
        val win = if (later.isEmpty) None
          else Some(later.minBy(v => (v._4, v._1)))
        (pid, win.map(_._1), win.map(v => v._4 - tp))
    }.sortBy(_._1)
    val got = EventOps.asofJoinForward(spark, sfDir)
      .select("event_id", "view_event_id", "view_wait_us")
      .as[(Long, Option[Long], Option[Long])].collect().sortBy(_._1)
    assert(got.length == expected.length)
    assert(got.toSeq == expected.toSeq)
    assert(got.exists(_._2.isDefined) && got.exists(_._2.isEmpty),
      "fixture should exercise both matched and tail purchases")
  }

  test("winsorize clamps exactly to independently computed percentiles") {
    // independent bounds: linear-interpolated percentile recomputed
    // driver-side from the raw values (the definition Spark's
    // `percentile` implements) — NOT derived from the op's own output
    def pctl(sorted: Array[Double], p: Double): Double = {
      val pos = p * (sorted.length - 1)
      val lo = math.floor(pos).toInt
      val hi = math.ceil(pos).toInt
      sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
    }
    val raw = EventOps.events(spark, sfDir)
      .select(col("event_type"), col("value"))
      .as[(String, Double)].collect()
    val bounds = raw.groupBy(_._1).map { case (et, vs) =>
      val s = vs.map(_._2).sorted
      et -> (pctl(s, EventOps.winsorLo), pctl(s, EventOps.winsorHi))
    }
    val rows = EventOps.winsorize(spark, sfDir)
      .as[(Long, String, Double, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, et, v, w, c) =>
      val (lo, hi) = bounds(et)
      val expected = math.min(math.max(v, lo), hi)
      assert(w == expected, s"$et/$id: winsorized $w != clamp($v) $expected")
      assert(c == (v < lo || v > hi), s"$et/$id clip flag")
    }
    // both tails actually clip somewhere
    assert(rows.exists(_._5) && rows.exists(!_._5))
  }

  test("winsorize approx bounds stay within the GK rank-error of exact") {
    // the scale path (approxBounds = true) may move the clamp points, but
    // only within percentile_approx's rank contract: the approx bound's
    // rank inside the group's sorted values is within n/accuracy of the
    // exact target rank. Everything else (clip rule, schema) is shared.
    val approx = EventOps.winsorize(spark, sfDir, approxBounds = true)
    val exact = EventOps.winsorize(spark, sfDir)
    assert(approx.columns.toSeq == exact.columns.toSeq)
    assert(approx.count() == exact.count()) // clip never drops rows
    val values = EventOps.events(spark, sfDir)
      .select("event_type", "value").as[(String, Double)].collect()
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    // recover each group's approx clamp bounds from the output: a row's
    // value_w equals the bound whenever it clipped low/high
    val rows = approx.as[(Long, String, Double, Double, Boolean)].collect()
    val boundsOf = rows.groupBy(_._2).map { case (et, rs) =>
      val lo = rs.filter(r => r._5 && r._3 < r._4).map(_._4).distinct
      val hi = rs.filter(r => r._5 && r._3 > r._4).map(_._4).distinct
      assert(lo.size <= 1 && hi.size <= 1, s"$et: non-constant bounds")
      et -> (lo.headOption, hi.headOption)
    }
    for ((et, (lo, hi)) <- boundsOf) {
      val sorted = values(et)
      val n = sorted.length
      val slack = n.toDouble / SketchOps.percentileAccuracy + 1
      for ((bOpt, q) <- Seq(lo -> EventOps.winsorLo, hi -> EventOps.winsorHi);
           b <- bOpt) {
        val below = sorted.count(_ <= b)
        assert(math.abs(below - q * n) <= slack,
          s"$et q=$q bound=$b rank=$below target=${q * n} n=$n")
      }
    }
    assert(boundsOf.exists(_._2._1.isDefined) &&
      boundsOf.exists(_._2._2.isDefined), "no tail ever clipped")
  }

  test("band join matches a driver-side brute force and stays equi-shaped") {
    val w = EventOps.bandWidthUs
    val raw = EventOps.events(spark, sfDir)
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("t"), col("value"))
      .as[(Long, String, Long, Double)].collect()
    val purchases = raw.filter(_._2 == "purchase")
    val views = raw.filter(_._2 == "view")
    val expected = purchases.map { case (pid, _, tp, _) =>
      val near = views.filter(v => math.abs(v._3 - tp) <= w)
      val sv = near.map(v => BigDecimal(v._4).setScale(2, BigDecimal
        .RoundingMode.HALF_UP)).sum
      (pid, near.length.toLong, sv.toDouble,
        if (near.isEmpty) -1L else near.map(v => math.abs(v._3 - tp)).min)
    }.sortBy(_._1)
    val got = EventOps.bandJoin(spark, sfDir)
      .select("purchase_id", "n_views_band", "view_value_sum",
        "closest_view_us")
      .as[(Long, Long, Double, Long)].collect().sortBy(_._1)
    assert(got.length == purchases.length) // every purchase kept
    assert(got.toSeq == expected.toSeq)
    assert(got.exists(_._2 > 0L), "band never matched — widen the fixture band")
    val p = EventOps.bandJoin(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("NestedLoopJoin") && !p.contains("CartesianProduct"),
      "band join degenerated into a nested-loop join:\n" + p.take(1500))
  }

  test("histogram: buckets partition each group's rows exactly") {
    val evs = EventOps.events(spark, sfDir)
      .select("event_type", "value").as[(String, Double)].collect()
    val rows = EventOps.histogram(spark, sfDir)
      .as[(String, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    val byType = evs.groupBy(_._1).view.mapValues(_.map(_._2))
    rows.groupBy(_._1).foreach { case (t, cells) =>
      // bucket counts partition the group
      assert(cells.map(_._3).sum == byType(t).length.toLong)
      cells.foreach { case (_, b, n, lo, hi) =>
        assert(b >= 0 && b < EventOps.histBuckets && n > 0)
        assert(lo < hi)
        // every value the brute force puts in bucket b is counted there
        val mn = byType(t).min; val mx = byType(t).max
        val w = (mx - mn) / EventOps.histBuckets
        val exp = byType(t).count { v =>
          val i = if (mx == mn) 0L
            else math.min(EventOps.histBuckets - 1L,
              math.floor((v - mn) / w).toLong)
          i == b
        }
        assert(n == exp.toLong, s"count differs at ($t, $b)")
      }
    }
  }

  test("retention: week-0 is full for every cohort; cells are sane") {
    val rows = EventOps.retention(spark, sfDir)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (cw, wn, nActive, nCohort, r) =>
      assert(wn >= 0 && nActive <= nCohort && nCohort > 0,
        s"bad cell ($cw, $wn)")
      assert(r == nActive.toDouble / nCohort.toDouble)
    }
    // week 0 retention is 1.0 by construction: the signup event itself
    // is activity in the cohort week
    rows.filter(_._2 == 0L).foreach { case (cw, _, nActive, nCohort, r) =>
      assert(r == 1.0, s"cohort $cw week-0 retention $r != 1.0")
    }
    // the fixture spans several weeks, so later-week cells exist
    // (sf0.001's dense little users never churn, so no decay<1 here —
    // the oracle gate at larger SFs covers value correctness)
    assert(rows.exists(_._2 > 0))
  }

  test("madOutliers flags exactly |x − med| > k·MAD per type") {
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2)
      else {
        // linear interpolation at rank (n−1)/2 — quantile_cont /
        // Spark percentile semantics for p=0.5
        (s(n / 2 - 1) + s(n / 2)) / 2.0
      }
    }
    val evs = EventOps.events(spark, sfDir)
      .select("event_type", "value").as[(String, Double)].collect()
    val med = evs.groupBy(_._1).view.mapValues(v => medianOf(v.map(_._2)))
    val mad = evs.groupBy(_._1).view.mapValues { v =>
      val m = med(v.head._1)
      medianOf(v.map(x => math.abs(x._2 - m)))
    }.toMap
    val rows = EventOps.madOutliers(spark, sfDir)
      .as[(Long, String, Double, Double, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, t, v, m, d, flag) =>
      assert(m == med(t), s"median differs for $t")
      assert(d == mad(t), s"MAD differs for $t")
      assert(flag == (math.abs(v - m) > EventOps.madK * d),
        s"flag wrong at event $id")
    }
    // both branches exercised
    assert(rows.exists(_._6) && rows.exists(!_._6))
  }

  test("dailyAnomalies scores the daily counts, not raw events") {
    def medianOf(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val daily = EventOps.events(spark, sfDir)
      .select(date_trunc("day", col("ts")).cast("string").as("d"),
        col("event_type"))
      .as[(String, String)].collect()
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val byType = daily.toSeq.groupBy(_._1._2)
    val med = byType.view.mapValues(v =>
      medianOf(v.map(_._2.toDouble))).toMap
    val mad = byType.view.mapValues { v =>
      val m = med(v.head._1._2)
      medianOf(v.map(x => math.abs(x._2.toDouble - m)))
    }.toMap
    val rows = EventOps.dailyAnomalies(spark, sfDir)
      .as[(String, String, Long, Double, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    assert(rows.length == daily.size, "one row per (day, type)")
    rows.foreach { case (day, t, n, m, d, flag) =>
      assert(n == daily((day, t)), s"count differs at ($day, $t)")
      assert(m == med(t), s"median differs for $t")
      assert(d == mad(t), s"MAD differs for $t")
      assert(flag == (math.abs(n.toDouble - m) > EventOps.madK * d),
        s"flag wrong at ($day, $t)")
    }
  }

  test("funnel matches a driver-side stage-chase; one exchange only") {
    val evs = EventOps.events(spark, sfDir)
      .select("user_id", "event_type", "ts")
      .as[(Long, String, java.sql.Timestamp)].collect()
    val exp = evs.groupBy(_._1).map { case (uid, rows) =>
      val ts = EventOps.funnelStages.foldLeft(
        Seq.empty[Option[java.sql.Timestamp]]) { (acc, stage) =>
        val gate: java.sql.Timestamp => Boolean = acc.lastOption match {
          case None => _ => true
          case Some(Some(prev)) => t => !t.before(prev)
          case Some(None) => _ => false
        }
        val hit = rows.filter(r => r._2 == stage && gate(r._3))
          .map(_._3).sortBy(_.getTime).headOption
        acc :+ hit
      }
      uid -> (ts.lastIndexWhere(_.isDefined) + 1).toLong
    }
    val got = EventOps.funnel(spark, sfDir)
      .select("user_id", "n_stages").as[(Long, Long)].collect().toMap
    assert(got == exp, "funnel stage counts differ from brute force")
    // the whole funnel is one user_id exchange: 4 unordered window
    // minima share the partitioning with the final rollup
    val plan = EventOps.funnel(spark, sfDir)
      .queryExecution.executedPlan.toString
    val nEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nEx == 1, s"funnel shuffles $nEx times:\n" +
      plan.linesIterator.filter(_.contains("Exchange"))
        .mkString("\n"))
  }

  test("pseudonymize emits SHA-256(pepper||user_id) over exact per-user rollups") {
    val got = EventOps.pseudonymize(spark, sfDir)
      .as[(String, Long, Double)].collect()
      .map { case (p, n, v) => p -> ((n, v)) }.toMap
    val exp = EventOps.events(spark, sfDir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
      .as[(Long, Long, Double)].collect()
    assert(got.size == exp.length) // digests collide never on this domain
    val md = java.security.MessageDigest.getInstance("SHA-256")
    exp.foreach { case (uid, n, v) =>
      val digest = md.digest(
        (EventOps.pseudonymPepper + uid.toString).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(got(digest) == ((n, v)), s"user $uid")
    }
  }

}
