package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, StructField,
  StructType}

import graft.io.Tables
import graft.ops.Canon

/** Event-stream aggregation over the `events` fixture
  * (event_id, ts, user_id, event_type, value DOUBLE, props JSON-string).
  *
  * Batch forms here; the identical transforms run under Structured
  * Streaming in graft.streaming.EventStream (same `window`/session
  * semantics — that equivalence is the point of using the streaming-
  * compatible operators in batch).
  *
  * Numeric note: `value` is summed through DECIMAL(18,2) — a double sum is
  * accumulation-order-dependent, which breaks both the differential oracle
  * AND run-to-run determinism on a real cluster; the decimal sum is exact
  * and order-free, cast to DOUBLE only at the output boundary.
  */
object EventOps {

  /** The events fixture has shipped `ts` in two physical forms —
    * TIMESTAMP(NANOS) (reads as raw int64 under
    * legacy.parquet.nanosAsLong, which all entry-point mains set) and
    * TIMESTAMP(MICROS) with isAdjustedToUTC=false (reads as
    * TIMESTAMP_NTZ). Normalize both to session-local TimestampType on
    * the resolved SCHEMA, so every downstream operator and the streaming
    * twin see one shape regardless of which writer produced the file.
    * Sessions here run UTC, so the NTZ→LTZ cast re-labels the same
    * instant. Nanos path: `div`, not `/` — nanosecond epochs exceed 2^53
    * and a double round-trip would corrupt them.
    */
  private[graft] def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // the NTZ→LTZ cast re-labels wall-clock fields as an instant in
        // the SESSION timezone; anything but UTC would silently shift
        // every event relative to the DuckDB oracle (which reads the NTZ
        // values as UTC instants) — fail loudly instead
        val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"events.ts is TIMESTAMP_NTZ and the session timezone is '$tz': " +
            "the NTZ->timestamp cast is only oracle-equivalent under UTC. " +
            "Set spark.sql.session.timeZone=UTC (all graft entry points do).")
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType => df
      case other => throw new IllegalStateException(
        s"events.ts: unsupported physical type $other")
    }

  def events(spark: SparkSession, sfDir: String): DataFrame =
    try normalizeTs(Tables.load(spark, sfDir, "events"))
    catch {
      case e: org.apache.spark.SparkException
          if Option(e.getMessage).exists(_.contains("Illegal Parquet type")) =>
        throw new IllegalStateException(
          "events.parquet carries a TIMESTAMP(NANOS) column Spark cannot " +
            "read natively; set spark.sql.legacy.parquet.nanosAsLong=true " +
            "(all graft entry points do) so normalizeTs can rescale the " +
            "int64 nanos to a timestamp.", e)
    }

  /** Tumbling daily windows per event_type: volumes, exact uniques, and a
    * props-JSON field aggregation (get_json_object / ->> both engines).
    */
  def eventsDaily(spark: SparkSession, sfDir: String): DataFrame = {
    val e = events(spark, sfDir)
      .withColumn("w", window(col("ts"), "1 day"))
      .withColumn("v", col("value").cast(DecimalType(18, 2)))
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
    Canon.canonicalize(e
      .groupBy(col("w.start").as("day_start"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_users"),
        sum("v").as("total_value"),
        (sum("v").cast("double") / count(lit(1)).cast("double"))
          .as("avg_value"),
        sum("k").as("sum_k")))
  }

  val eventsDailyOracle: String =
    """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S')
      |         AS day_start,
      |       event_type,
      |       count(*) AS n_events,
      |       count(DISTINCT user_id) AS n_users,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
      |         / CAST(count(*) AS DOUBLE) AS avg_value,
      |       CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Per-user event deltas and activity quartiles: lag with default +
    * ntile — the remaining analytic-window family (frame-free navigation
    * functions), keyed per user so the window scales horizontally.
    */
  def userValueDeltas(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    Canon.canonicalize(events(spark, sfDir)
      .withColumn("prev_value", lag("value", 1, 0.0).over(w))
      .withColumn("value_delta", col("value") - col("prev_value"))
      .withColumn("quartile", ntile(4).over(w))
      .select("user_id", "event_id", "value", "prev_value", "value_delta",
        "quartile"))
  }

  val userValueDeltasOracle: String =
    """SELECT user_id, event_id, value,
      |       coalesce(lag(value) OVER w, 0.0) AS prev_value,
      |       value - coalesce(lag(value) OVER w, 0.0) AS value_delta,
      |       CAST(ntile(4) OVER w AS BIGINT) AS quartile
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)""".stripMargin

  /** Exact interpolated per-group percentiles (linear interpolation
    * between order statistics — the R-7 definition both engines
    * implement, so doubles compare bit-exact). This is the ORACLE form:
    * exact `percentile` buffers a value→count map per group, so with few
    * groups over continuous values one aggregation buffer holds ~every
    * distinct value in the corpus. The scale path is the GK twin
    * [[SketchOps.groupPercentilesApprox]] (bounded memory, rank error ≤
    * n/accuracy, spec-pinned against this exact form) — the same
    * exact/approx pairing as countDistinct vs HLL.
    */
  def groupPercentiles(spark: SparkSession, sfDir: String): DataFrame = {
    val e = events(spark, sfDir)
    Canon.canonicalize(e.groupBy("event_type").agg(
      percentile(col("value"), lit(0.5)).as("p50"),
      percentile(col("value"), lit(0.9)).as("p90"),
      percentile(col("value"), lit(0.99)).as("p99")))
  }

  /** DuckDB CTEs for exact per-event_type percentiles stating SPARK'S
    * interpolation arithmetic — `Percentile.getPercentile` computes
    * `(higher − pos)·lo + (pos − lower)·hi` with `pos = p·(n−1)`,
    * while DuckDB's `quantile_cont` uses a different expression shape;
    * the two agree at sf0.1 but diverge in the LAST FLOAT BIT at ×10
    * group sizes (caught by the round-14 full ×10 gate: p99 read
    * 230.53 vs 230.53000000000003, and a winsorize `clipped` flag
    * flipped on the boundary row). Stating the order statistics and
    * Spark's exact formula makes the oracle n-independent. Both CASE
    * weights multiply data values by doubles built from the same
    * floor/ceil arithmetic Spark uses; the two-term sum is IEEE-
    * commutative, so accumulation order is immaterial.
    */
  private def sparkPctCtes(name: String,
                           ps: Seq[(String, Double)]): String = {
    def pos(p: Double) = s"CAST($p AS DOUBLE) * nm1"
    // order statistics at the bracketing ranks, one pair per p
    val os = ps.map { case (a, p) =>
      s"""max(CASE WHEN rn = floor(${pos(p)}) THEN value END) AS lo_$a,
         |    max(CASE WHEN rn = ceil(${pos(p)}) THEN value END) AS hi_$a"""
        .stripMargin
    }.mkString(",\n    ")
    // Spark's getPercentile INCLUDING its equal-keys guard: when the
    // two order stats are equal (ties, or an integral position), it
    // returns the value DIRECTLY — the weighted sum of two equal
    // doubles is NOT a no-op ((w1+w2=1)·x round-trips differently;
    // the ×10 finding was exactly this: 230.53 → 230.53000000000003)
    val outs = ps.map { case (a, p) =>
      s"""CASE WHEN lo_$a = hi_$a THEN lo_$a
         |       ELSE (ceil(${pos(p)}) - ${pos(p)}) * lo_$a
         |            + (${pos(p)} - floor(${pos(p)})) * hi_$a END AS $a"""
        .stripMargin
    }.mkString(",\n  ")
    s"""${name}_src AS (
       |  SELECT event_type, value,
       |         CAST(row_number() OVER (PARTITION BY event_type
       |           ORDER BY value) - 1 AS DOUBLE) AS rn,
       |         CAST(count(*) OVER (PARTITION BY event_type) - 1
       |           AS DOUBLE) AS nm1
       |  FROM events),
       |${name}_os AS (
       |  SELECT event_type, nm1,
       |    $os
       |  FROM ${name}_src GROUP BY 1, 2),
       |$name AS (
       |  SELECT event_type,
       |  $outs
       |  FROM ${name}_os)""".stripMargin
  }

  val groupPercentilesOracle: String =
    s"""WITH ${sparkPctCtes("pct",
         Seq(("p50", 0.5), ("p90", 0.9), ("p99", 0.99)))}
       |SELECT event_type, p50, p90, p99 FROM pct""".stripMargin

  /** Bounded-frame windows: per-user 3-event moving sum/average and a
    * running (unbounded-preceding) total — the sliding-frame family the
    * other windows (rank / navigation / unbounded) don't exercise.
    * Decimal accumulation keeps the moving sums order-exact; the moving
    * average divides ONCE at the boundary in DOUBLE (n is the in-frame
    * row count, min(row_number, 3) at the partition head).
    */
  def movingAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val w3 = w.rowsBetween(-2, 0)
    val e = events(spark, sfDir)
      .withColumn("v", col("value").cast(DecimalType(18, 2)))
    Canon.canonicalize(e.select(
      col("user_id"), col("event_id"),
      sum("v").over(w3).as("moving_sum_3"),
      (sum("v").over(w3).cast("double") /
        least(row_number().over(w), lit(3)).cast("double"))
        .as("moving_avg_3"),
      sum("v").over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
        .as("running_total")))
  }

  val movingAggOracle: String =
    """SELECT user_id, event_id,
      |  CAST(sum(CAST(value AS DECIMAL(18,2)))
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS moving_sum_3,
      |  CAST(sum(CAST(value AS DECIMAL(18,2)))
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |  / CAST(least(row_number()
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id), 3) AS DOUBLE)
      |    AS moving_avg_3,
      |  CAST(sum(CAST(value AS DECIMAL(18,2)))
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total
      |FROM events""".stripMargin

  val sessionGap = "30 minutes"

  /** Per-user sessionization with a 30-minute inactivity gap, via Spark's
    * streaming-compatible `session_window`. Two events merge when
    * separated by strictly less than the gap — mirrored in the oracle as a
    * `lag`-based gaps-and-islands with `diff >= gap` starting new sessions.
    */
  def eventsSessions(spark: SparkSession, sfDir: String): DataFrame = {
    val e = events(spark, sfDir)
      .withColumn("v", col("value").cast(DecimalType(18, 2)))
    Canon.canonicalize(e
      .groupBy(col("user_id"), session_window(col("ts"), sessionGap))
      .agg(
        min("ts").as("session_start"),
        max("ts").as("session_end"),
        count(lit(1)).as("n_events"),
        sum("v").as("total_value"))
      .drop("session_window"))
  }

  val eventsSessionsOracle: String =
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN epoch_us(ts) -
      |              lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |              >= 30 * 60 * 1000000 THEN 1
      |         WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
      |         ELSE 0 END AS new_session
      |  FROM events),
      |sessions AS (
      |  SELECT *, sum(new_session) OVER (PARTITION BY user_id
      |           ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_seq
      |  FROM flagged)
      |SELECT user_id,
      |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
      |       count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM sessions GROUP BY user_id, session_seq""".stripMargin

  /** Backward AS-OF join: each `purchase` event picks up the most recent
    * `view` event of the same user with view.ts ≤ purchase.ts — the
    * operator Spark's joins don't offer natively (an inequality join
    * would plan as a per-user range explosion).
    *
    * Spark-first shape: tag both streams, UNION them, and carry the last
    * view forward with one `last(..., ignoreNulls)` window per attached
    * column — ONE keyed shuffle + sort over (user, ts), linear in
    * |views| + |purchases|, the standard distributed as-of. Ties at equal
    * ts resolve views-first then event_id (a total order, so the result
    * is deterministic — unlike a native ASOF join's unspecified tie pick;
    * on this fixture DuckDB's ASOF JOIN agrees, and the oracle mirrors
    * the union+carry form exactly so the twin holds on any input).
    *
    * Timestamps leave as BIGINT epoch-micros (Canon's type surface), and
    * `view_age_us` is the purchase-to-view gap.
    */
  /** Direction-parameterized as-of core — ONE implementation for both
    * directions (they may never diverge; this is the machinery the
    * oracle template mirrors 1:1). Backward: latest view at-or-before,
    * views sort BEFORE purchases at equal ts, carry = `last` over the
    * preceding frame. Forward: earliest view at-or-after, views sort
    * AFTER purchases, carry = `first` over the following frame.
    */
  private def asofCore(spark: SparkSession, sfDir: String,
                       backward: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = events(spark, sfDir)
    def tagged(etype: String, isView: Int) =
      e.filter(col("event_type") === etype)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"),
          lit(isView).as("is_view"))
    val ordered = Window.partitionBy("user_id").orderBy(
      col("ts").asc,
      if (backward) col("is_view").desc else col("is_view").asc,
      col("event_id").asc)
    val w =
      if (backward)
        ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    def carry(c: Column) = {
      val tagged = when(col("is_view") === 1, c)
      (if (backward) last(tagged, ignoreNulls = true)
       else first(tagged, ignoreNulls = true)).over(w)
    }
    val gap =
      if (backward)
        (unix_micros(col("ts")) - col("view_ts_us")).as("view_age_us")
      else (col("view_ts_us") - unix_micros(col("ts"))).as("view_wait_us")
    Canon.canonicalize(
      tagged("view", 1).union(tagged("purchase", 0))
        .withColumn("view_event_id", carry(col("event_id")))
        .withColumn("view_value", carry(col("value")))
        .withColumn("view_ts_us", carry(unix_micros(col("ts"))))
        .filter(col("is_view") === 0)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("view_event_id"), col("view_value"), gap))
  }

  private def asofOracle(backward: Boolean): String = {
    val (pick, dir, frame, gapExpr, gapName) =
      if (backward)
        ("last_value", "DESC", "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
          "epoch_us(ts) - view_ts_us", "view_age_us")
      else
        ("first_value", "ASC", "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING",
          "view_ts_us - epoch_us(ts)", "view_wait_us")
    s"""WITH tagged AS (
       |  SELECT user_id, ts, event_id, value, 1 AS is_view
       |  FROM events WHERE event_type = 'view'
       |  UNION ALL
       |  SELECT user_id, ts, event_id, value, 0
       |  FROM events WHERE event_type = 'purchase'),
       |c AS (
       |  SELECT *,
       |    $pick(CASE WHEN is_view = 1 THEN event_id END IGNORE NULLS)
       |      OVER w AS view_event_id,
       |    $pick(CASE WHEN is_view = 1 THEN value END IGNORE NULLS)
       |      OVER w AS view_value,
       |    $pick(CASE WHEN is_view = 1 THEN epoch_us(ts) END IGNORE NULLS)
       |      OVER w AS view_ts_us
       |  FROM tagged
       |  WINDOW w AS (PARTITION BY user_id
       |               ORDER BY ts ASC, is_view $dir, event_id ASC
       |               $frame))
       |SELECT user_id, event_id, epoch_us(ts) AS ts_us,
       |       view_event_id, view_value,
       |       $gapExpr AS $gapName
       |FROM c WHERE is_view = 0""".stripMargin
  }

  def asofJoin(spark: SparkSession, sfDir: String): DataFrame =
    asofCore(spark, sfDir, backward = true)

  val asofJoinOracle: String = asofOracle(backward = true)

  /** Typed semi-structured extraction: `from_json` with a DECLARED schema
    * into a struct column, then relational work on the typed fields —
    * the scale path for JSON payloads (one parse per row inside codegen,
    * nulls for malformed/missing under PERMISSIVE mode; contrast the
    * stringly get_json_object probe eventsDaily uses for a single field).
    */
  def jsonExtract(spark: SparkSession, sfDir: String): DataFrame = {
    val e = events(spark, sfDir)
      .withColumn("p", from_json(col("props"),
        StructType(Seq(StructField("k", LongType)))))
    Canon.canonicalize(e.groupBy("event_type").agg(
      count(col("p.k")).as("n_with_k"),
      sum(col("p.k")).as("sum_k"),
      max(col("p.k")).as("max_k")))
  }

  val jsonExtractOracle: String =
    """SELECT event_type,
      |  count(CAST(props ->> '$.k' AS BIGINT)) AS n_with_k,
      |  CAST(sum(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) AS sum_k,
      |  CAST(max(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) AS max_k
      |FROM events GROUP BY 1""".stripMargin

  /** Winsorization bounds (percentile ranks) for [[winsorize]]. */
  val winsorLo = 0.05
  val winsorHi = 0.95

  /** Percentile-based WINSORIZATION per event_type — the standard
    * numeric-cleaning pass (clip the tails instead of dropping rows):
    * values outside [p05, p95] of their group clamp to the bound, and
    * `clipped` flags the affected rows. The oracle states SPARK's
    * interpolation arithmetic via [[sparkPctCtes]] — `quantile_cont`
    * agrees only up to the last float bit, which flipped a boundary
    * row's `clipped` flag at ×10 (round-14 gate finding).
    *
    * Bounds strategy (the countDistinct/HLL pairing, applied to
    * quantiles): exact `percentile` is the oracle/default path, but it
    * aggregates a value→count map PER GROUP — with a handful of
    * event-type groups over continuous-ish values, one reducer buffers
    * ~every distinct value in the corpus. At 100 TB pass
    * `approxBounds = true`: bounds come from Greenwald-Khanna
    * `percentile_approx` (bounded-memory summaries, rank error ≤
    * n/accuracy — the contract SketchOpsSpec pins), and only the clamp
    * points move within that rank tolerance; the clip itself is
    * unchanged.
    *
    * Shape: one keyed percentile aggregation (groups = event types,
    * tiny) broadcast back over the stream — the fact side never
    * shuffles. The bounds frame is groups-sized, so the broadcast hint
    * here is safe (unlike a duplicate-scaled set).
    */
  def winsorize(spark: SparkSession, sfDir: String,
                approxBounds: Boolean = false): DataFrame = {
    val e = events(spark, sfDir)
    val bounds =
      if (approxBounds) {
        val acc = lit(SketchOps.percentileAccuracy)
        e.groupBy("event_type").agg(
          percentile_approx(col("value"), lit(winsorLo), acc).as("lo"),
          percentile_approx(col("value"), lit(winsorHi), acc).as("hi"))
      } else e.groupBy("event_type").agg(
        percentile(col("value"), lit(winsorLo)).as("lo"),
        percentile(col("value"), lit(winsorHi)).as("hi"))
    Canon.canonicalize(
      e.join(broadcast(bounds), Seq("event_type"))
        .select(col("event_id"), col("event_type"), col("value"),
          least(greatest(col("value"), col("lo")), col("hi"))
            .as("value_w"),
          (col("value") < col("lo") || col("value") > col("hi"))
            .as("clipped")))
  }

  val winsorizeOracle: String =
    s"""WITH ${sparkPctCtes("b",
         Seq(("lo", winsorLo), ("hi", winsorHi)))}
       |SELECT event_id, e.event_type, value,
       |       least(greatest(value, lo), hi) AS value_w,
       |       value < lo OR value > hi AS clipped
       |FROM events e JOIN b ON e.event_type = b.event_type""".stripMargin

  /** FORWARD as-of: each purchase joined to the same user's EARLIEST
    * view at-or-after it — the mirror of [[asofJoin]] (attribution
    * windows that look ahead: "did a view follow this purchase"). Same
    * single keyed shuffle; the carry window just runs over the
    * following frame, with views ordered after purchases at equal
    * timestamps so a same-instant view counts as "at or after".
    */
  def asofJoinForward(spark: SparkSession, sfDir: String): DataFrame =
    asofCore(spark, sfDir, backward = false)

  val asofJoinForwardOracle: String = asofOracle(backward = false)

  /** Band half-width of the range join, microseconds (±15 minutes). At
    * scale the width doubles as the skew lever: rows per (bucket) key is
    * events-per-band, so a hotter stream takes a narrower band (or the
    * band key composes with DedupOps-style salting).
    */
  val bandWidthUs: Long = 15L * 60 * 1000000

  /** RANGE (band) JOIN: every purchase against all views — any user —
    * within ±[[bandWidthUs]], aggregated per purchase. The missing Spark
    * join family: a raw `abs(t_v - t_p) <= W` condition has no equi-key,
    * so Catalyst plans a BroadcastNestedLoopJoin — O(n·m) and
    * driver-memory-bound, dead at any real scale.
    *
    * The banded plan makes it equi-join-shaped: both sides bucket time
    * by the band width, the (smaller) purchase side probes its own
    * bucket ±1, and the exact predicate filters after the hash join. A
    * view within the band lies in EXACTLY ONE of the three probed
    * buckets, so no pair dedup is needed and the match set is exact —
    * recall 100% by construction, cost one bucket-keyed shuffle plus a
    * 3× fan-out of the probe side.
    */
  def bandJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val e = events(spark, sfDir)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        unix_micros(col("ts")).as("t_p"))
    val v = e.filter(col("event_type") === "view")
      .select(col("value").cast(DecimalType(18, 2)).as("view_value"),
        unix_micros(col("ts")).as("t_v"))
      .withColumn("bucket", expr(s"t_v div $bandWidthUs"))
    val probes = p
      .withColumn("pb", expr(s"t_p div $bandWidthUs"))
      .withColumn("bucket",
        explode(array(col("pb") - 1, col("pb"), col("pb") + 1)))
      .drop("pb")
    val near = probes.join(v, Seq("bucket"))
      .filter(abs(col("t_v") - col("t_p")) <= bandWidthUs)
      .groupBy("purchase_id").agg(
        count(lit(1)).as("n_views"),
        sum("view_value").as("sv"),
        min(abs(col("t_v") - col("t_p"))).as("closest"))
    Canon.canonicalize(
      p.join(near, Seq("purchase_id"), "left")
        .select(
          col("purchase_id"),
          col("t_p").as("ts_us"),
          coalesce(col("n_views"), lit(0L)).as("n_views_band"),
          coalesce(col("sv").cast("double"), lit(0.0)).as("view_value_sum"),
          coalesce(col("closest"), lit(-1L)).as("closest_view_us")))
  }

  /** The oracle states the SEMANTICS (a plain inequality theta-join) —
    * DuckDB's IEJoin handles it directly; the Spark plan above is the
    * scale-shaped equivalent.
    */
  val bandJoinOracle: String =
    s"""WITH p AS (
       |  SELECT event_id AS purchase_id, epoch_us(ts) AS t_p
       |  FROM events WHERE event_type = 'purchase'),
       |v AS (
       |  SELECT CAST(value AS DECIMAL(18,2)) AS view_value, epoch_us(ts) AS t_v
       |  FROM events WHERE event_type = 'view'),
       |j AS (
       |  SELECT purchase_id, count(*) AS n_views, sum(view_value) AS sv,
       |         min(abs(t_v - t_p)) AS closest
       |  FROM p JOIN v ON abs(t_v - t_p) <= $bandWidthUs
       |  GROUP BY 1)
       |SELECT purchase_id, t_p AS ts_us,
       |  CAST(coalesce(n_views, 0) AS BIGINT) AS n_views_band,
       |  CAST(coalesce(sv, 0) AS DOUBLE) AS view_value_sum,
       |  CAST(coalesce(closest, -1) AS BIGINT) AS closest_view_us
       |FROM p LEFT JOIN j USING (purchase_id)""".stripMargin

  // ---- equi-width histograms -----------------------------------------

  val histBuckets = 16

  /** Equi-width value histogram per event_type — the distribution view
    * behind every profiling dashboard, and [[Quality.profile]]'s
    * missing shape column. Bucket `i` covers
    * [min + w·i, min + w·(i+1)) with w = (max−min)/k; the max value
    * itself clamps into the last bucket (half-open buckets would
    * otherwise lose it), and a constant column collapses into bucket 0.
    *
    * Two passes: per-group min/max broadcast back, then one keyed
    * count — the stream never shuffles (winsorize's shape, but the
    * bounds aggregation here is constant-size, no percentile buffers).
    * Bucket index arithmetic is the identical double expression on
    * both engines; edges re-derive from (min, w, i) so the output is
    * self-describing.
    */
  def histogram(spark: SparkSession, sfDir: String): DataFrame = {
    val e = events(spark, sfDir)
    val bounds = e.groupBy("event_type").agg(
      min("value").as("mn"), max("value").as("mx"))
    val k = histBuckets
    val w = (col("mx") - col("mn")) / lit(k.toDouble)
    val bucket = when(col("mx") === col("mn"), lit(0L)).otherwise(
      least(lit(k - 1L),
        floor((col("value") - col("mn")) / w).cast("long")))
    Canon.canonicalize(
      e.join(broadcast(bounds), Seq("event_type"))
        .withColumn("bucket", bucket)
        .groupBy("event_type", "bucket")
        .agg(count(lit(1)).as("n"),
          first(col("mn") + (col("mx") - col("mn")) / lit(k.toDouble)
            * col("bucket").cast("double")).as("lo"),
          first(col("mn") + (col("mx") - col("mn")) / lit(k.toDouble)
            * (col("bucket") + 1L).cast("double")).as("hi")))
  }

  val histogramOracle: String = {
    val k = histBuckets
    s"""WITH b AS (
       |  SELECT event_type, min(value) AS mn, max(value) AS mx
       |  FROM events GROUP BY 1),
       |bk AS (
       |  SELECT e.event_type,
       |         CASE WHEN b.mx = b.mn THEN 0
       |              ELSE least($k - 1, CAST(floor(
       |                (e.value - b.mn) / ((b.mx - b.mn) / $k.0))
       |                AS BIGINT)) END AS bucket,
       |         b.mn, b.mx
       |  FROM events e JOIN b ON e.event_type = b.event_type)
       |SELECT event_type, bucket, count(*) AS n,
       |       min(mn + (mx - mn) / $k.0 * CAST(bucket AS DOUBLE)) AS lo,
       |       min(mn + (mx - mn) / $k.0 * CAST(bucket + 1 AS DOUBLE))
       |         AS hi
       |FROM bk GROUP BY 1, 2""".stripMargin
  }

  // ---- cohort retention ----------------------------------------------

  /** Weekly cohort retention: users cohorted by the ISO week of their
    * FIRST signup event; cell (cohort_week, week_n) counts the
    * cohort's distinct users with ANY event activity n weeks later,
    * plus the retention fraction — the companion analysis to
    * [[funnel]] (funnel: how deep; retention: how long).
    *
    * Scale shape: cohort table = one user_id-keyed aggregation;
    * activity = distinct (user, week) — both map-side-combining keyed
    * aggs; one join on user_id; the final cell rollup is keyed on
    * (cohort, week_n). Nothing quadratic, nothing broadcast-unbounded
    * (the cohort table is per-user, joined on its key).
    */
  def retention(spark: SparkSession, sfDir: String): DataFrame = {
    val e = events(spark, sfDir)
    val cohort = e.filter(col("event_type") === "signup")
      .groupBy("user_id")
      .agg(min(date_trunc("week", col("ts"))).as("cohort_week"))
    val activity = e
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .distinct()
    val cells = activity.join(cohort, Seq("user_id"))
      .filter(col("wk") >= col("cohort_week"))
      .withColumn("week_n",
        expr("datediff(wk, cohort_week) div 7"))
      .groupBy("cohort_week", "week_n")
      .agg(countDistinct("user_id").as("n_active"))
    val sizes = cohort.groupBy("cohort_week")
      .agg(countDistinct("user_id").as("n_cohort"))
    Canon.canonicalize(cells.join(sizes, Seq("cohort_week"))
      .select(col("cohort_week"), col("week_n"), col("n_active"),
        col("n_cohort"),
        (col("n_active").cast("double") / col("n_cohort").cast("double"))
          .as("retention")))
  }

  val retentionOracle: String =
    """WITH cohort AS (
      |  SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
      |  FROM events WHERE event_type = 'signup' GROUP BY 1),
      |activity AS (
      |  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
      |  FROM events),
      |cells AS (
      |  SELECT c.cohort_week, date_diff('day', c.cohort_week, a.wk) // 7
      |           AS week_n,
      |         count(DISTINCT a.user_id) AS n_active
      |  FROM activity a JOIN cohort c ON a.user_id = c.user_id
      |  WHERE a.wk >= c.cohort_week
      |  GROUP BY 1, 2),
      |sizes AS (
      |  SELECT cohort_week, count(DISTINCT user_id) AS n_cohort
      |  FROM cohort GROUP BY 1)
      |SELECT strftime(cells.cohort_week, '%Y-%m-%d %H:%M:%S')
      |         AS cohort_week,
      |       CAST(week_n AS BIGINT) AS week_n, n_active, n_cohort,
      |       CAST(n_active AS DOUBLE) / CAST(n_cohort AS DOUBLE)
      |         AS retention
      |FROM cells JOIN sizes USING (cohort_week)""".stripMargin

  // ---- robust outlier detection (median/MAD) -------------------------

  /** Robust-z multiplier: |x − median| > k·MAD flags an outlier. The
    * 1.4826 normal-consistency constant is deliberately folded into k
    * (k = 3 on raw MAD ≈ 2·sigma under normality) — what matters here
    * is identical arithmetic on both engines, not the asymptotic
    * calibration.
    */
  val madK = 3.0

  /** Median/MAD outlier flags per event_type — the robust alternative
    * to mean/stddev z-scores (one far outlier corrupts the mean and
    * inflates stddev; the median and MAD have a 50% breakdown point),
    * the curation shape for "drop documents with absurd loss/length"
    * style filters.
    *
    * Two grouped percentile passes (median, then MAD over the
    * residuals) with the bounds BROADCAST back — the stream itself
    * never shuffles, [[winsorize]]'s shape. Same bounds-strategy
    * caveat as winsorize: exact `percentile` buffers a group's
    * distinct values; `approxBounds = true` swaps in GK
    * percentile_approx for the 100 TB path (oracle runs exact).
    */
  def madOutliers(spark: SparkSession, sfDir: String,
                  approxBounds: Boolean = false): DataFrame = {
    val e = events(spark, sfDir)
    def pct(c: org.apache.spark.sql.Column) =
      if (approxBounds)
        percentile_approx(c, lit(0.5), lit(SketchOps.percentileAccuracy))
      else percentile(c, lit(0.5))
    val med = e.groupBy("event_type").agg(pct(col("value")).as("med"))
    val withMed = e.join(broadcast(med), Seq("event_type"))
    val mad = withMed.groupBy("event_type")
      .agg(pct(abs(col("value") - col("med"))).as("mad"))
    Canon.canonicalize(
      withMed.join(broadcast(mad), Seq("event_type"))
        .select(col("event_id"), col("event_type"), col("value"),
          col("med"), col("mad"),
          (abs(col("value") - col("med")) > lit(madK) * col("mad"))
            .as("is_outlier")))
  }

  /** Metric-stream anomaly detection: per event_type, the DAILY event
    * count series scored by median/MAD robust-z — the day a pipeline's
    * volume halves or doubles, flagged without the mean/stddev
    * fragility (one broken day would drag a z-score baseline toward
    * itself; the median's 50% breakdown point shrugs it off).
    *
    * Scale shape: the only corpus-sized pass is the first keyed count
    * (map-side combined, one exchange on (day, event_type)); everything
    * after — both percentile passes, the joins, the flag — runs on the
    * BOUNDED daily rollup (days × types rows), so the exact percentile
    * is cheap here and the [[madOutliers]] GK `approxBounds` hatch is
    * kept only for interface symmetry.
    */
  def dailyAnomalies(spark: SparkSession, sfDir: String,
                     approxBounds: Boolean = false): DataFrame = {
    def pct(c: org.apache.spark.sql.Column) =
      if (approxBounds)
        percentile_approx(c, lit(0.5), lit(SketchOps.percentileAccuracy))
      else percentile(c, lit(0.5))
    val daily = events(spark, sfDir)
      .withColumn("day", date_trunc("day", col("ts")))
      .groupBy("day", "event_type").agg(count(lit(1)).as("n_events"))
    val med = daily.groupBy("event_type")
      .agg(pct(col("n_events").cast("double")).as("med"))
    val withMed = daily.join(broadcast(med), Seq("event_type"))
    val mad = withMed.groupBy("event_type")
      .agg(pct(abs(col("n_events").cast("double") - col("med")))
        .as("mad"))
    Canon.canonicalize(
      withMed.join(broadcast(mad), Seq("event_type"))
        .select(col("day").as("day_start"), col("event_type"),
          col("n_events"), col("med"), col("mad"),
          (abs(col("n_events").cast("double") - col("med")) >
            lit(madK) * col("mad")).as("is_anomaly")))
  }

  val dailyAnomaliesOracle: String =
    s"""WITH daily AS (
       |  SELECT date_trunc('day', ts) AS day, event_type,
       |         count(*) AS n_events
       |  FROM events GROUP BY 1, 2),
       |dmed AS (
       |  SELECT event_type,
       |         quantile_cont(CAST(n_events AS DOUBLE), 0.5) AS med
       |  FROM daily GROUP BY 1),
       |dmad AS (
       |  SELECT d.event_type,
       |         quantile_cont(abs(CAST(d.n_events AS DOUBLE) - m.med),
       |                       0.5) AS mad
       |  FROM daily d JOIN dmed m ON d.event_type = m.event_type
       |  GROUP BY 1)
       |SELECT strftime(d.day, '%Y-%m-%d %H:%M:%S') AS day_start,
       |       d.event_type, d.n_events, m.med, a.mad,
       |       abs(CAST(d.n_events AS DOUBLE) - m.med) > $madK * a.mad
       |         AS is_anomaly
       |FROM daily d JOIN dmed m ON d.event_type = m.event_type
       |             JOIN dmad a ON d.event_type = a.event_type"""
      .stripMargin

  /** Fixed application pepper for [[pseudonymize]]. In production this
    * is a managed secret rotated per data-sharing agreement; the value
    * is baked here so the oracle derives the identical digests.
    */
  val pseudonymPepper = "graft-pepper-2026:"

  /** PSEUDONYMIZED per-user rollup: the user key leaves as
    * SHA-256(pepper ‖ user_id) — deterministic (joinable across
    * extracts built with the same pepper) but not reversible without
    * the pepper, which is what a privacy-preserving analytics export
    * needs (GDPR-style pseudonymization: stable linkage, no raw IDs at
    * rest). Aggregation BEFORE export — n_events and exact
    * decimal-summed value — so row-level behavior never leaves either.
    *
    * Scale shape: one keyed agg on user_id (map-side combined), the
    * digest computed once per surviving GROUP (users, not events) as a
    * codegen'd projection after the agg.
    */
  def pseudonymize(spark: SparkSession, sfDir: String): DataFrame = {
    val e = events(spark, sfDir)
      .withColumn("v", col("value").cast(DecimalType(18, 2)))
    Canon.canonicalize(e.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum("v").as("total_value"))
      .select(
        sha2(concat(lit(pseudonymPepper), col("user_id").cast("string")),
          256).as("user_pseudo"),
        col("n_events"),
        col("total_value").cast("double").as("total_value")))
  }

  val pseudonymizeOracle: String =
    s"""SELECT sha256('$pseudonymPepper' || CAST(user_id AS VARCHAR))
       |         AS user_pseudo,
       |       count(*) AS n_events,
       |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
       |         AS total_value
       |FROM events GROUP BY user_id""".stripMargin

  val madOutliersOracle: String =
    s"""WITH med AS (
       |  SELECT event_type, quantile_cont(value, 0.5) AS med
       |  FROM events GROUP BY 1),
       |mad AS (
       |  SELECT e.event_type,
       |         quantile_cont(abs(e.value - med.med), 0.5) AS mad
       |  FROM events e JOIN med ON e.event_type = med.event_type
       |  GROUP BY 1)
       |SELECT e.event_id, e.event_type, e.value, med.med, mad.mad,
       |       abs(e.value - med.med) > $madK * mad.mad AS is_outlier
       |FROM events e JOIN med ON e.event_type = med.event_type
       |              JOIN mad ON e.event_type = mad.event_type"""
      .stripMargin

  // ---- funnel analysis -----------------------------------------------

  /** Funnel stage order: each stage's timestamp is the EARLIEST matching
    * event at-or-after the previous stage's timestamp (first-touch,
    * order-enforced — the standard product-funnel semantics; same-instant
    * progression counts, matching the as-of family's inclusive bound).
    */
  val funnelStages = Seq("signup", "view", "click", "purchase")

  /** Per-user ordered funnel: how far each user progressed through
    * [[funnelStages]], with the first-touch timestamp of every reached
    * stage.
    *
    * Scale shape: ONE exchange on user_id; the four stage resolutions
    * are chained UNORDERED window minima over that same partitioning
    * (each stage's `min(ts where type matches and ts ≥ prev)` — a
    * sort-free full-partition frame, not an ordered running window),
    * then one rollup per user. No self-joins, no per-stage shuffles —
    * the plan a 100 TB event log wants.
    */
  def funnel(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val staged = funnelStages.zipWithIndex.foldLeft(
      events(spark, sfDir).select("user_id", "event_type", "ts")) {
      case (acc, (stage, i)) =>
        val gate = if (i == 0) col("event_type") === stage
          else col("event_type") === stage && col("ts") >= col(s"t$i")
        acc.withColumn(s"t${i + 1}", min(when(gate, col("ts"))).over(w))
    }
    val stageAggs = funnelStages.indices.map(i =>
      min(col(s"t${i + 1}")).as(s"t_${funnelStages(i)}"))
    val perUser = staged.groupBy("user_id")
      .agg(stageAggs.head, stageAggs.tail: _*)
    // fold stage 0 outward so the DEEPEST reached stage wins the CASE
    val nStages = funnelStages.indices.foldLeft(lit(0L)) {
      case (els, i) =>
        when(col(s"t_${funnelStages(i)}").isNotNull, (i + 1).toLong)
          .otherwise(els)
    }
    Canon.canonicalize(perUser.select(
      col("user_id") +: nStages.as("n_stages") +:
        funnelStages.map(s => col(s"t_$s")): _*))
  }

  val funnelOracle: String = {
    val stageCtes = funnelStages.zipWithIndex.map { case (stage, i) =>
      if (i == 0)
        s"""s1 AS (
           |  SELECT user_id, min(ts) AS t1 FROM events
           |  WHERE event_type = '$stage' GROUP BY 1)""".stripMargin
      else
        s"""s${i + 1} AS (
           |  SELECT e.user_id, min(e.ts) AS t${i + 1}
           |  FROM events e JOIN s$i ON e.user_id = s$i.user_id
           |  WHERE e.event_type = '$stage' AND e.ts >= s$i.t$i
           |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    val nStagesCase = funnelStages.indices.reverse
      .map(i => s"WHEN t${i + 1} IS NOT NULL THEN ${i + 1}")
      .mkString(" ")
    val tsCols = funnelStages.zipWithIndex.map { case (s, i) =>
      s"strftime(t${i + 1}, '%Y-%m-%d %H:%M:%S') AS t_$s"
    }.mkString(",\n       ")
    s"""WITH $stageCtes,
       |u AS (SELECT DISTINCT user_id FROM events)
       |SELECT u.user_id,
       |       CAST(CASE $nStagesCase ELSE 0 END AS BIGINT) AS n_stages,
       |       $tsCols
       |FROM u
       |LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
       |LEFT JOIN s3 USING (user_id) LEFT JOIN s4 USING (user_id)"""
      .stripMargin
  }
}
