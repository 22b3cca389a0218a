package graft

import graft.ops.TemporalOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Semantics of the temporal joins (TemporalOps): as-of matching rules and
  * the bucketed range join's equivalence to the naive inequality join.
  */
class TemporalSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoin picks the latest right row at or before the left time") {
    val left = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "l1"),
      (1L, 2L, ts("2024-01-01 10:05:00"), "l2"),
      (2L, 3L, ts("2024-01-01 10:00:00"), "l3")) // key 2: no right rows
      .toDF("k", "lid", "lt", "lpay")
    val right = Seq(
      (1L, ts("2024-01-01 09:58:00"), "early"),
      (1L, ts("2024-01-01 10:00:00"), "equal"), // inclusive: matches l1
      (1L, ts("2024-01-01 10:03:00"), "mid"),
      (1L, ts("2024-01-01 10:06:00"), "late")) // after both lefts
      .toDF("k", "rt", "rpay")
    val out = TemporalOps.asofJoin(left, right, Seq("k"), "lt", "rt")
      .select("lid", "rpay").orderBy("lid").collect()
    assert(out.toSeq === Seq(
      Row(1L, "equal"), // ties are inclusive (<=), right row wins at equal ts
      Row(2L, "mid"),   // latest <= 10:05 is 10:03, not 09:58
      Row(3L, null)))   // left-outer: key with no right rows keeps null
  }

  test("asofJoin carries the matched right row whole: null payload fields " +
      "stay null, never back-filled from older rows") {
    val left = Seq((1L, 10L, ts("2024-01-01 10:10:00")))
      .toDF("k", "lid", "lt")
    // the matched (latest) right row has a NULL in column a; per-column
    // carry would tear it, resurrecting a=5 from the older row
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(5L), 6L),
      (1L, ts("2024-01-01 10:05:00"), None, 7L))
      .toDF("k", "rt", "a", "b")
    val out = TemporalOps.asofJoin(left, right, Seq("k"), "lt", "rt")
      .select("a", "b").collect()
    assert(out.toSeq === Seq(Row(null, 7L)),
      "row-level as-of semantics (DuckDB ASOF): matched row carried whole")
    // reserved internal names are rejected loudly, not silently rebound
    val bad = Seq((1L, ts("2024-01-01 10:00:00"), 1L)).toDF("k", "rt", "__r")
    val ex = intercept[IllegalArgumentException] {
      TemporalOps.asofJoin(left, bad, Seq("k"), "lt", "rt")
    }
    assert(ex.getMessage.contains("reserved"))
  }

  test("asofJoin ASOF null semantics: a null right time or null right " +
      "key can never fabricate a match") {
    val left = Seq((1L, 1L, ts("2024-01-01 10:00:00"), "l1"))
      .toDF("k", "lid", "lt", "lpay")
    // a null rt would sort FIRST (nulls-first asc) and be carried into
    // every otherwise-unmatched left row; a null key matches nothing in
    // an equality join — both must be dropped from the right side
    val right = Seq(
      (java.lang.Long.valueOf(1L), null: java.sql.Timestamp, "ghost"),
      (null: java.lang.Long, ts("2024-01-01 09:00:00"), "nokey"))
      .toDF("k", "rt", "rpay")
    val out = TemporalOps.asofJoin(left, right, Seq("k"), "lt", "rt")
      .select("lid", "rpay").collect()
    assert(out.toSeq === Seq(Row(1L, null)),
      s"null right rows must never match: ${out.toSeq}")
  }

  test("rolling active users rejects a non-positive window loudly") {
    // sequence(0, -1) DESCENDS — a zero-day window would silently vote
    // each day into its predecessor
    val e = intercept[IllegalArgumentException] {
      TemporalOps.rollingActiveUsersOn(
        Seq((1L, ts("2024-01-01 10:00:00"))).toDF("user_id", "ts"), 0)
    }
    assert(e.getMessage.contains("windowDays"))
  }

  test("asofJoin never matches a later right row") {
    val left = Seq((1L, 1L, ts("2024-01-01 00:00:00"))).toDF("k", "lid", "lt")
    val right = Seq((1L, ts("2024-01-01 00:00:01"), 9L)).toDF("k", "rt", "rid")
    val out = TemporalOps.asofJoin(left, right, Seq("k"), "lt", "rt")
    assert(out.select("rid").collect() === Array(Row(null)))
  }

  test("asofJoin plans one shuffle (no join, no candidate expansion)") {
    val left = Seq((1L, 1L, ts("2024-01-01 00:00:00"))).toDF("k", "lid", "lt")
    val right = Seq((1L, ts("2024-01-01 00:00:01"), 9L)).toDF("k", "rt", "rid")
    val plan = TemporalOps.asofJoin(left, right, Seq("k"), "lt", "rt")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1, plan)
  }

  test("bucketed range join matches the naive inequality join") {
    val events = Tables.t(spark, sfDir, "events")
    val got = TemporalOps.incidentWindowsOn(events)
    // naive formulation: raw interval predicate (plans a nested-loop join —
    // the correctness ground truth, not the scale path)
    val err = events.filter(col("event_type") === "error")
      .select(col("event_id").as("incident_id"), col("user_id").as("i_user"),
        col("ts").as("incident_ts"), unix_micros(col("ts")).as("start_us"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), unix_micros(col("ts")).as("c_us"),
        col("value"))
    val naive = err.join(clicks,
        col("i_user") === col("c_user") &&
          col("c_us") >= col("start_us") &&
          col("c_us") < col("start_us") + lit(300000000L), "left")
      .groupBy(col("incident_id"), col("i_user").as("user_id"),
        col("incident_ts"))
      .agg(count(col("c_us")).as("n_clicks"),
        coalesce(Tables.dsum(col("value")), lit(0.0)).as("click_value"))
    assert(got.count() === naive.count())
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("range join plans an equi-join on buckets, not a nested loop") {
    val plan = TemporalOps.incidentWindows(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join must not plan a nested loop:\n$plan")
  }

  test("retention cohorts: first week is the cohort, offsets count returns") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")), // u1: cohort W0, active W0+W1
      (1L, ts("2024-01-08 10:00:00")),
      (1L, ts("2024-01-08 11:00:00")), // same week twice: counted once
      (2L, ts("2024-01-01 12:00:00")), // u2: cohort W0 only
      (3L, ts("2024-01-08 09:00:00"))) // u3: cohort W1 only
      .toDF("user_id", "ts")
    val out = TemporalOps.retentionCohortsOn(events)
      .select("cohort_week", "week_offset", "n_users").collect()
    assert(out.toSeq === Seq(
      Row(ts("2024-01-01 00:00:00"), 0L, 2L), // u1+u2 in cohort W0
      Row(ts("2024-01-01 00:00:00"), 1L, 1L), // only u1 returned at +1
      Row(ts("2024-01-08 00:00:00"), 0L, 1L))) // u3's own cohort
  }

  test("gapfill emits every minute in range, zeros for silent minutes") {
    val events = Seq(
      (ts("2024-01-01 00:00:30"), 1L),
      (ts("2024-01-01 00:00:45"), 2L), // minute 0: 2 events
      (ts("2024-01-01 00:03:10"), 3L)) // minutes 1,2 silent
      .toDF("ts", "event_id")
    val out = TemporalOps.minutelyGapfillOn(events)
      .select("minute", "n_events").collect()
    assert(out.toSeq === Seq(
      Row(ts("2024-01-01 00:00:00"), 2L),
      Row(ts("2024-01-01 00:01:00"), 0L),
      Row(ts("2024-01-01 00:02:00"), 0L),
      Row(ts("2024-01-01 00:03:00"), 1L)))
  }

  test("gapfill span guard sits exactly at the boundary: a span AT the " +
      "limit fills, one minute past raises the named error") {
    import org.apache.spark.sql.functions.{count => fcount}
    val limit = TemporalOps.MaxGapfillMinutes
    def spanOf(mins: Long) = Seq(
      (ts("2024-01-01 00:00:00"), 1L),
      (new java.sql.Timestamp(
        ts("2024-01-01 00:00:00").getTime + mins * 60000L), 2L))
      .toDF("ts", "event_id")
    // at the limit: fills (limit+1 rows — count, don't collect 10.5M rows)
    val atLimit = TemporalOps.minutelyGapfillOn(spanOf(limit))
      .agg(fcount(lit(1))).head().getLong(0)
    assert(atLimit === limit + 1, "span == limit must fill, not raise")
    // one past: the named guard, not an array-size error
    val e = intercept[Exception] {
      TemporalOps.minutelyGapfillOn(spanOf(limit + 1)).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t.getMessage).toSeq ++
        Option(t.getCause).toSeq.flatMap(msgs)
    assert(msgs(e).exists(_.contains("exceeds the")),
      s"expected the named span-guard error, got: ${msgs(e)}")
  }

  test("anomaly z-score flags a planted spike, nulls the warm-up") {
    // 26h alternating 1/2 events per minute (so trailing variance is
    // nonzero), plus a 100-event spike mid-day-2: the spike is the only
    // anomaly, and its window crosses the day boundary's carry rows
    val base = (0 until 26 * 60).flatMap { i =>
      val t = new java.sql.Timestamp(
        ts("2024-01-01 00:00:00").getTime + i * 60000L)
      Seq.fill(1 + i % 2)((t, i.toLong))
    }
    val spikeTs = ts("2024-01-02 01:30:00")
    val events = (base ++ Seq.fill(99)((spikeTs, 99999L)))
      .toDF("ts", "event_id")
    val out = TemporalOps.anomalyZscoreOn(events)
    val flagged = out.filter(col("is_anomaly")).collect()
    assert(flagged.map(_.getAs[java.sql.Timestamp]("minute")).toSeq ===
      Seq(spikeTs))
    // warm-up minutes (first 60) have null z
    assert(out.orderBy("minute").limit(60)
      .filter(col("z").isNotNull).count() === 0)
  }

  test("day-partitioned anomaly scan equals the single global window") {
    val events = Tables.t(spark, sfDir, "events")
    val got = TemporalOps.anomalyZscoreOn(events)
    val dense = TemporalOps.minutelyGapfillOn(events)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("minute").rowsBetween(-60, -1)
    val naive = dense
      .withColumn("s", sum("n_events").over(w))
      .withColumn("s2", sum(col("n_events") * col("n_events")).over(w))
      .withColumn("k", count(lit(1)).over(w))
      .select(col("minute"), col("n_events"), expr(TemporalOps.ZExpr).as("z"))
      .withColumn("is_anomaly", abs(col("z")) > 3.0)
    assert(got.count() === naive.count())
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("session transitions skip gaps and count within-session bigrams") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 10:01:00"), 1L, "click"),   // view→click
      (3L, ts("2024-01-01 11:00:00"), 1L, "purchase"),// >30min gap: none
      (4L, ts("2024-01-01 11:05:00"), 1L, "click"),   // purchase→click
      (5L, ts("2024-01-01 10:00:00"), 2L, "view"),
      (6L, ts("2024-01-01 10:10:00"), 2L, "view")) // view→view, other user
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = TemporalOps.sessionTransitionsOn(events)
      .select("from_type", "to_type", "n_transitions").collect()
    assert(out.toSeq === Seq(
      Row("purchase", "click", 1L),
      Row("view", "click", 1L),
      Row("view", "view", 1L)))
  }

  test("range join keeps zero-click incidents with 0 counts") {
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "error", 0.0),
      (2L, ts("2024-01-01 00:04:59"), 1L, "click", 2.5), // inside window
      (3L, ts("2024-01-01 00:05:00"), 1L, "click", 9.9), // boundary: excluded
      (4L, ts("2024-01-01 00:00:01"), 2L, "error", 0.0)) // no clicks at all
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = TemporalOps.incidentWindowsOn(events)
      .select("incident_id", "n_clicks", "click_value").collect()
    assert(out.toSeq === Seq(Row(1L, 1L, 2.5), Row(4L, 0L, 0.0)))
  }

  test("interval sweep equals the naive per-day interval count") {
    val li = Tables.t(spark, sfDir, "lineitem")
    val ord = Tables.t(spark, sfDir, "orders")
    val spans = li.select(col("l_orderkey"), col("l_shipdate"))
      .join(ord.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate"))
    val sweep = TemporalOps.openOrderLinesOn(li, ord).collect()
      .map(r => r.getAs[java.time.LocalDateTime](0)
        -> r.getAs[Long]("n_open")).toMap
    // spot-check a spread of days against the quadratic definition:
    // open on d = ordered on or before d AND shipped after d
    implicit val ldtOrd: Ordering[java.time.LocalDateTime] =
      Ordering.fromLessThan(_ isBefore _)
    val days = sweep.keys.toSeq.sorted
    val sample = Seq(days.head, days(days.size / 3),
      days(2 * days.size / 3), days.last)
    for (d <- sample) {
      val naive = spans.filter(col("o_orderdate") <= lit(d) &&
        col("l_shipdate") > lit(d)).count()
      assert(sweep(d) === naive, s"day $d")
    }
    // every interval that opens also closes: the sweep ends drained
    assert(sweep(days.last) === 0L)
  }

  test("rolling 7-day active users equals the naive per-day distinct") {
    val events = Tables.t(spark, sfDir, "events")
    val out = TemporalOps.rollingActiveUsersOn(events, windowDays = 7)
      .collect()
      .map(r => r.getDate(0) -> r.getAs[Long]("n_active_7d"))
    assert(out.nonEmpty)
    val sample = Seq(out.head, out(out.length / 2), out.last)
    for ((d, n) <- sample) {
      val naive = events
        .filter(to_date(col("ts")) <= lit(d) &&
          to_date(col("ts")) >= date_sub(lit(d), 6))
        .select("user_id").distinct().count()
      assert(n === naive, s"day $d")
    }
    // window days cover exactly the data span (one row per day)
    val days = out.map(_._1.toLocalDate)
    assert(days.length ===
      java.time.temporal.ChronoUnit.DAYS.between(
        days.head, days.last) + 1)
  }
}
