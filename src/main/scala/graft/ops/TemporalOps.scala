package graft.ops

import graft.Tables
import graft.Tables.dsum
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively: as-of join and
  * point-in-interval (range) join over the event stream.
  *
  * Both are implemented as shuffle-bounded compositions rather than
  * inequality joins — Spark plans a bare non-equi join condition as a
  * broadcast-nested-loop / cartesian product, which is exactly the plan that
  * dies at 100 TB. The as-of join is one shuffle + per-partition sort; the
  * range join turns the interval predicate into an equi-join on
  * interval-aligned buckets.
  */
object TemporalOps {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "events")

  /** As-of join: for every left row, attach the latest right row with
    * `rightTime <= leftTime` in the same key group (the time-series join of
    * kdb/Pandas `merge_asof`/DuckDB `ASOF JOIN`; Spark has no native
    * operator).
    *
    * Implementation — union-and-carry: tag each side, union them, shuffle
    * once on `keys`, sort each group by (time, side) with right rows first
    * at equal times (inclusive `<=` semantics), and carry the most recent
    * right row forward as ONE struct with `last(ignoreNulls)` over a
    * running window — the struct is non-null for every right row, so a
    * matched row whose payload FIELDS are null is carried as-is (row-level
    * semantics, like DuckDB ASOF) instead of each column back-filling
    * independently from older rows. Unmatched left rows keep a null
    * struct → null right columns (left-outer semantics).
    *
    * Scale: ONE shuffle of |left|+|right| rows and a linear scan per group —
    * no candidate-pair expansion, unlike the naive inequality-join +
    * max-window formulation which materializes every (left, earlier-right)
    * pair. Parallelism is the key cardinality (here: users), which at
    * 100 TB is millions of groups — far above any executor count.
    *
    * Requirements: `left` and `right` share exactly the `keys` column names
    * and nothing else; `right` must be unique per (keys, rightTime) —
    * pre-aggregate duplicates, otherwise which duplicate wins is
    * nondeterministic (same caveat as DuckDB ASOF).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String): DataFrame = {
    val lPayload = left.columns.filterNot(keys.contains)
    val rPayload = right.columns.filterNot(keys.contains)
    val clash = lPayload.intersect(rPayload)
    require(clash.isEmpty,
      s"asofJoin: non-key columns must be disjoint; both sides have: " +
        clash.mkString(", "))
    val reserved = Seq("__t", "__side", "__r")
    val taken = (left.columns ++ right.columns).intersect(reserved)
    require(taken.isEmpty,
      s"asofJoin: column names ${taken.mkString(", ")} are reserved")
    val rStruct = org.apache.spark.sql.types.StructType(
      rPayload.map(right.schema(_)))
    val lTagged = left.select(
      keys.map(col) ++ Seq(col(leftTime).as("__t"), lit(1).as("__side")) ++
        lPayload.map(col) :+ lit(null).cast(rStruct).as("__r"): _*)
    // ASOF null semantics (the DuckDB contract): a right row with a NULL
    // time can never satisfy `rightTime <= leftTime`, and a NULL key
    // matches nothing in an equality join — but the union-sort would put
    // a null __t FIRST (nulls-first asc) and carry its payload into every
    // otherwise-unmatched left row, and null keys would group together.
    // Drop such right rows; null-keyed LEFT rows stay (left-outer: they
    // emit with a null match like DuckDB's).
    val rClean = right.filter(
      col(rightTime).isNotNull &&
        keys.map(col(_).isNotNull).reduceOption(_ && _).getOrElse(lit(true)))
    val rTagged = rClean.select(
      keys.map(col) ++ Seq(col(rightTime).as("__t"), lit(0).as("__side")) ++
        lPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rPayload.map(col): _*).as("__r"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .select(
        keys.map(col) ++ lPayload.map(col) ++ Seq(col("__side"),
          last(col("__r"), ignoreNulls = true).over(w).as("__r")): _*)
      .filter(col("__side") === 1)
      .select(keys.map(col) ++ lPayload.map(col) ++
        rPayload.map(c => col("__r").getField(c).as(c)): _*)
  }

  /** q54: click→view as-of attribution — every click joined to the latest
    * preceding (or simultaneous) view by the same user, with the
    * click-to-view gap in microseconds; clicks with no prior view keep
    * nulls. Views are pre-deduplicated to one per (user, ts) (max event_id)
    * so the match is deterministic. Oracle: DuckDB's native ASOF LEFT JOIN.
    */
  def clickAsofView(s: SparkSession, dir: String): DataFrame =
    clickAsofViewOn(ev(s, dir))

  /** `events` needs (event_id, user_id, ts, event_type, value). */
  def clickAsofViewOn(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts", "value")
    val views = events.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts").as("view_ts"))
      .agg(max("event_id").as("view_id"))
    asofJoin(clicks, views, Seq("user_id"), "ts", "view_ts")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("view_id"),
        (unix_micros(col("ts")) - unix_micros(col("view_ts"))).as("gap_us"))
      .orderBy("event_id")
  }

  private val WindowUs = 300000000L // 5-minute incident window, in micros

  /** q55: point-in-interval range join — every `error` event opens a
    * 5-minute incident window [ts, ts+5min); count and sum the same user's
    * clicks inside each window (zero-click incidents kept, left-outer).
    *
    * Scale design: Spark would plan the raw interval predicate as a
    * broadcast-nested-loop join (O(|errors|·|clicks|) comparisons per key).
    * Instead the interval is decomposed onto window-aligned buckets: each
    * incident explodes to the (at most 2) buckets it overlaps, each click
    * maps to exactly 1 bucket, and the join becomes an equi-join on
    * (user, bucket) with the exact containment predicate as a residual
    * filter. Each (click, incident) pair can only meet in the click's
    * single bucket, so no dedup pass is needed. Cost: one hash shuffle and
    * ≤2× expansion of the (much smaller) interval side.
    */
  def incidentWindows(s: SparkSession, dir: String): DataFrame =
    incidentWindowsOn(ev(s, dir))

  /** `events` needs (event_id, user_id, ts, event_type, value). */
  def incidentWindowsOn(events: DataFrame): DataFrame = {
    val err = events.filter(col("event_type") === "error")
      .select(col("event_id").as("incident_id"), col("user_id").as("i_user"),
        col("ts").as("incident_ts"), unix_micros(col("ts")).as("start_us"))
      .withColumn("end_us", col("start_us") + lit(WindowUs))
      // integral `div`, not `/`: long division must not round-trip a double
      .withColumn("bucket",
        explode(sequence(expr(s"start_us div ${WindowUs}L"),
          expr(s"(end_us - 1L) div ${WindowUs}L"))))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), unix_micros(col("ts")).as("c_us"),
        col("value"))
      .withColumn("bucket", expr(s"c_us div ${WindowUs}L"))
    err.join(clicks,
        col("i_user") === col("c_user") && err("bucket") === clicks("bucket") &&
          col("c_us") >= col("start_us") && col("c_us") < col("end_us"),
        "left")
      .groupBy(col("incident_id"), col("i_user").as("user_id"),
        col("incident_ts"))
      .agg(count(col("c_us")).as("n_clicks"),
        coalesce(dsum(col("value")), lit(0.0)).as("click_value"))
      .orderBy("incident_id")
  }

  /** q73: weekly retention cohorts — every user is assigned to the cohort of
    * their first active week, and each cell counts how many of that cohort's
    * users were active again `week_offset` weeks later (offset 0 = cohort
    * size). The standard product-analytics retention triangle.
    *
    * Scale: user activity first contracts to DISTINCT (user, week) — one
    * hash aggregation keyed by millions of (user, week) pairs — and the
    * cohort week attaches with a min-window over `user_id` (a second keyed
    * exchange, no self-join). The final cell aggregation is tiny
    * (weeks × offsets). Nothing is ever keyed by fewer than |users| groups,
    * and no row carries more than three columns into a shuffle.
    */
  def retentionCohorts(s: SparkSession, dir: String): DataFrame =
    retentionCohortsOn(ev(s, dir))

  /** `events` needs (user_id, ts). */
  def retentionCohortsOn(events: DataFrame): DataFrame = {
    val weekly = events
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      .distinct()
    val w = Window.partitionBy("user_id")
    weekly
      .withColumn("cohort_week", min("week").over(w))
      // calendar-day difference of the week-boundary DATES: week starts
      // are always whole multiples of 7 calendar days apart, so the
      // offset is exact in ANY session timezone — an epoch-micros `div`
      // would drop an offset on the DST spring-forward week (the repo
      // pins UTC, but the public On-form must not depend on it)
      .select(col("cohort_week"),
        expr("CAST(datediff(to_date(week), to_date(cohort_week)) AS BIGINT)" +
          " div 7").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users")) // rows are distinct (user, week)
      .orderBy("cohort_week", "week_offset")
  }

  /** q74: dense per-minute event counts — the q06 timeseries with the gaps
    * filled in: one row for EVERY minute between the first and last event,
    * zero-count minutes included (dashboards and the q75 anomaly scan both
    * need the dense spine; a sparse series silently stretches trailing
    * windows across gaps).
    *
    * Scale: the heavy side (per-minute counts) is a map-side partial
    * aggregation whose output is bounded by the time range, not the event
    * count. The spine is generated from the 2-row min/max aggregate and
    * exploded — bounded by minutes-in-range (~526k rows/year), then
    * re-partitioned so the join against the counts distributes instead of
    * running in the explode's single task.
    */
  def minutelyGapfill(s: SparkSession, dir: String): DataFrame =
    minutelyGapfillOn(ev(s, dir))

  /** `events` needs (ts). */
  def minutelyGapfillOn(events: DataFrame): DataFrame =
    gapfillUnordered(events).orderBy("minute")

  /** The gap-fill spine refuses spans past this (20 years ≈ 10.5M
    * minutes): a SENTINEL timestamp (9999-12-31 is endemic in enterprise
    * feeds) or a corrupt epoch-scale value would otherwise explode a
    * multi-billion-row sequence — an opaque array-size error (or an OOM)
    * from deep inside codegen, at ANY corpus size. The guard makes it a
    * named, actionable error instead; it rides the 1-row min/max
    * aggregate the spine already pays for, so the data pass is untouched.
    */
  private[graft] val MaxGapfillMinutes: Long = 20L * 366 * 24 * 60

  /** The dense series without q74's presentation sort — q75 builds windows
    * on top (whose day-partition exchange would immediately destroy a
    * global order), so it must not inherit a useless mid-plan range-sort.
    */
  private def gapfillUnordered(events: DataFrame): DataFrame = {
    val perMin = events
      .groupBy(date_trunc("minute", col("ts")).as("minute"))
      .agg(count(lit(1)).as("n_events"))
    // span guard (see MaxGapfillMinutes). The all-null-ts corpus keeps
    // its zero-row spine: a NULL bound passes the guard arm and
    // sequence(NULL, …) explodes to nothing, same as before.
    val spanMinutes =
      (unix_timestamp(col("t1")) - unix_timestamp(col("t0"))) / 60L
    val guardedT0 =
      when(col("t0").isNull || col("t1").isNull ||
          spanMinutes <= MaxGapfillMinutes, col("t0"))
        .otherwise(raise_error(concat(
          lit("gapfill: minute span "), spanMinutes.cast("string"),
          lit(s" exceeds the $MaxGapfillMinutes-minute guard "),
          lit("(sentinel/corrupt timestamp? min="),
          col("t0").cast("string"), lit(" max="),
          col("t1").cast("string"), lit(")"))))
    val spine = events
      .agg(date_trunc("minute", min("ts")).as("t0"),
        date_trunc("minute", max("ts")).as("t1"))
      .select(explode(sequence(guardedT0, col("t1"),
        expr("interval 1 minute"))).as("minute"))
      .repartition(col("minute"))
    spine.join(perMin, Seq("minute"), "left")
      .select(col("minute"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
  }

  private val TrailMin = 60 // trailing window length, minutes

  /** q75: trailing-window anomaly detection over the dense minute series —
    * each minute's event count is z-scored against the mean/variance of the
    * PREVIOUS 60 minutes (the current minute never sees itself), and flagged
    * when |z| > 3. Warm-up minutes (fewer than 60 predecessors) and
    * flat-history minutes (zero variance) carry null z — no fake scores.
    *
    * Determinism: mean and variance come from integer window sums
    * (Σn, Σn², both exact), combined by ONE double expression evaluated
    * identically by Spark and the DuckDB oracle — no engine-internal
    * streaming variance whose rounding differs.
    *
    * Scale: a single global ordered window would sort the whole series in
    * one task. Instead the series is partitioned BY DAY and each day's first
    * 60 minutes borrow the previous day's tail via a carry-forward copy
    * (tagged, used for sums, never emitted) — parallelism is #days while
    * every window still sees its full 60-minute history.
    */
  def anomalyZscore(s: SparkSession, dir: String): DataFrame =
    anomalyZscoreOn(ev(s, dir))

  /** `events` needs (ts). */
  def anomalyZscoreOn(events: DataFrame): DataFrame = {
    val dense = gapfillUnordered(events)
      .withColumn("day", date_trunc("day", col("minute")))
    // previous day's last TrailMin minutes, re-tagged onto the next day
    val carry = dense
      .filter(unix_micros(col("minute")) >=
        unix_micros(col("day")) + (1440L - TrailMin) * 60000000L)
      .withColumn("day", col("day") + expr("interval 1 day"))
      .withColumn("carry", lit(1))
    val all = dense.withColumn("carry", lit(0)).unionByName(carry)
    val w = Window.partitionBy("day").orderBy("minute")
      .rowsBetween(-TrailMin, -1)
    val stats = all
      .withColumn("s", sum("n_events").over(w))
      .withColumn("s2", sum(col("n_events") * col("n_events")).over(w))
      .withColumn("k", count(lit(1)).over(w))
      .filter(col("carry") === 0)
    // one shared double expression — the DuckDB oracle repeats it verbatim
    stats.select(col("minute"), col("n_events"),
        expr(ZExpr).as("z"))
      .withColumn("is_anomaly", abs(col("z")) > 3.0)
      .orderBy("minute")
  }

  /** z-score expression, engine-portable: integer sums in, one double
    * expression out. Kept as a constant so the oracle repeats it verbatim.
    */
  private[graft] val ZExpr: String =
    s"""CASE WHEN k = $TrailMin
       |  AND (CAST(s2 AS DOUBLE) -
       |       CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / $TrailMin.0)
       |      / $TrailMin.0 > 0.0
       |THEN (CAST(n_events AS DOUBLE) - CAST(s AS DOUBLE) / $TrailMin.0)
       |  / sqrt((CAST(s2 AS DOUBLE) -
       |          CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / $TrailMin.0)
       |         / $TrailMin.0)
       |ELSE NULL END""".stripMargin

  /** q82: session transition matrix — within-session event-type bigrams
    * (view→click, click→purchase, …) counted across all users, the Markov
    * input for funnel diagnosis and next-action prediction. Session
    * boundaries reuse the q13 convention (>30-minute gap, ties broken by
    * event_id, [[graft.streaming.SessionPipeline.GapMicros]]) so "session"
    * means the same thing across the batch, streaming, and path layers.
    *
    * Scale: one shuffle keyed by user_id; both the boundary flag and the
    * transition source come from the same ordered window pass (no
    * sessionize-then-self-join). The (from, to) aggregation is ≤
    * |event_types|² rows with map-side partials.
    */
  def sessionTransitions(s: SparkSession, dir: String): DataFrame =
    sessionTransitionsOn(ev(s, dir))

  /** `events` needs (event_id, user_id, ts, event_type). */
  def sessionTransitionsOn(events: DataFrame): DataFrame = {
    val gapUs = graft.streaming.SessionPipeline.GapMicros
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      // a transition needs a previous event within the same session
      .filter(col("prev_us").isNotNull &&
        col("us") - col("prev_us") <= gapUs)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .orderBy("from_type", "to_type")
  }

  /** DuckDB twin of [[minutelyGapfillOn]], shared by q74 and q75's oracle. */
  private val GapfillSql: String =
    """SELECT s.minute, coalesce(pm.n_events, 0) AS n_events
      |FROM (SELECT unnest(generate_series(
      |        date_trunc('minute', (SELECT min(ts) FROM events)),
      |        date_trunc('minute', (SELECT max(ts) FROM events)),
      |        INTERVAL 1 MINUTE)) AS minute) s
      |LEFT JOIN (SELECT date_trunc('minute', ts) AS minute,
      |    count(*) AS n_events FROM events GROUP BY 1) pm
      |  USING (minute)
      |ORDER BY minute""".stripMargin

  /** q91: interval concurrency — for every calendar day, how many order
    * lines are in fulfillment (order placed, line not yet shipped). The
    * classic interval-overlap aggregation, done as a boundary sweep
    * instead of a per-day interval join: each line's interval
    * [o_orderdate, l_shipdate) contributes +1 at its start and −1 at its
    * end, the deltas CONTRACT to one row per date (a ~2.5k-row table for
    * ANY corpus size — TPC-H's date domain is constant), and the running
    * sum over that contracted table is the concurrency curve. The naive
    * form — join every interval to every day it spans — expands 100 TB of
    * intervals ~50× before aggregating; the sweep shuffles |dates| rows.
    * The interval endpoints live on two tables, so the only data-sized
    * work is the id-keyed lineitem⋈orders equi-join (bucketable at
    * scale). The orderBy-only window is safe here for the same reason as
    * q85's offset ladder: it runs on the contracted date table, never
    * the data.
    */
  def openOrderLines(s: SparkSession, dir: String): DataFrame =
    openOrderLinesOn(
      Tables.t(s, dir, "lineitem"), Tables.t(s, dir, "orders"))

  /** `lineitemDf` needs (l_orderkey, l_shipdate); `ordersDf` (o_orderkey,
    * o_orderdate).
    */
  def openOrderLinesOn(lineitemDf: DataFrame,
      ordersDf: DataFrame): DataFrame = {
    val spans = lineitemDf.select(col("l_orderkey"), col("l_shipdate"))
      .join(ordersDf.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      // only positive fulfillment spans define an open interval (the
      // synthetic data draws ship dates independently of order dates)
      .filter(col("l_shipdate") > col("o_orderdate"))
    // one pass over the joined result: each span emits its ±1 boundary
    // pair via a row-local explode (a self-union would execute the
    // data-sized join once per branch)
    val deltas = spans
      .select(explode(array(
        struct(col("o_orderdate").as("d"), lit(1L).as("delta")),
        struct(col("l_shipdate").as("d"), lit(-1L).as("delta")))).as("e"))
      .select(col("e.d").as("d"), col("e.delta").as("delta"))
      .groupBy("d").agg(sum("delta").as("delta"))
    deltas
      .withColumn("n_open", sum("delta").over(Window.orderBy("d")))
      .select("d", "n_open")
      .orderBy("d")
  }

  /** q94: rolling 7-day distinct active users per day — the sliding-
    * window COUNT(DISTINCT) no engine computes incrementally (distinct
    * doesn't decompose over window slides). The scale-shaped plan:
    *
    *   1. contract the event stream to DISTINCT (day, user) pairs — the
    *      only data-sized aggregation, map-side combined;
    *   2. each pair votes into the 7 window-days it influences (a 7×
    *      explode of the CONTRACTED pairs, not the events);
    *   3. distinct again (a user active on several days in one window
    *      must count once) and count per window-day.
    *
    * Shuffle volume is bounded by |days|·|users|·7, independent of event
    * count. The windowed-rank alternative — count(distinct) over a RANGE
    * window — isn't supported by Spark (or most engines) precisely
    * because distinct state can't slide; this decomposition is the
    * standard rewrite.
    */
  def rollingActiveUsers(s: SparkSession, dir: String): DataFrame =
    rollingActiveUsersOn(ev(s, dir), windowDays = 7)

  /** `eventsDf` needs (ts, user_id). */
  def rollingActiveUsersOn(eventsDf: DataFrame,
      windowDays: Int): DataFrame = {
    // sequence(0, -1) DESCENDS (Spark defaults step to -1), so a
    // non-positive window would silently vote each day into its
    // PREDECESSOR instead of erroring
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val du = eventsDf
      .select(to_date(col("ts")).as("d"), col("user_id"))
      .distinct()
    val bounds = du.agg(min("d").as("lo"), max("d").as("hi"))
    du.select(explode(sequence(lit(0), lit(windowDays - 1))).as("i"),
        col("d"), col("user_id"))
      .select(expr("date_add(d, i)").as("wd"), col("user_id"))
      .distinct()
      .crossJoin(broadcast(bounds))
      .filter(col("wd") >= col("lo") && col("wd") <= col("hi"))
      .groupBy(col("wd").as("d"))
      .agg(count(lit(1)).as("n_active_7d"))
      .orderBy("d")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q54_click_asof_view" -> clickAsofView,
    "q55_incident_windows" -> incidentWindows,
    "q73_retention_cohorts" -> retentionCohorts,
    "q74_minutely_gapfill" -> minutelyGapfill,
    "q75_anomaly_zscore" -> anomalyZscore,
    "q82_session_transitions" -> sessionTransitions,
    "q91_open_orderlines" -> openOrderLines,
    "q94_rolling_active_users" -> rollingActiveUsers)

  val oracle: Map[String, String] = Map(
    "q91_open_orderlines" ->
      """WITH s AS (SELECT o_orderdate, l_shipdate
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_shipdate > o_orderdate),
        |b AS (SELECT d, sum(delta) AS delta FROM (
        |    SELECT o_orderdate AS d, 1 AS delta FROM s
        |    UNION ALL
        |    SELECT l_shipdate AS d, -1 AS delta FROM s)
        |  GROUP BY d)
        |SELECT d, CAST(sum(delta) OVER (ORDER BY d) AS BIGINT)
        |  AS n_open
        |FROM b ORDER BY d""".stripMargin,
    "q94_rolling_active_users" ->
      """WITH du AS (SELECT DISTINCT
        |    CAST(date_trunc('day', ts) AS DATE) AS d, user_id
        |  FROM events),
        |bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM du),
        |win AS (SELECT DISTINCT d + CAST(i AS INTEGER) AS wd, user_id
        |  FROM du CROSS JOIN
        |    (SELECT unnest(generate_series(0, 6)) AS i) g)
        |SELECT wd AS d, count(*) AS n_active_7d
        |FROM win, bounds WHERE wd BETWEEN lo AND hi
        |GROUP BY wd ORDER BY wd""".stripMargin,
    "q54_click_asof_view" ->
      """WITH clicks AS (SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'click'),
        |views AS (SELECT user_id, ts AS view_ts, max(event_id) AS view_id
        |  FROM events WHERE event_type = 'view' GROUP BY user_id, ts)
        |SELECT c.event_id, c.user_id, c.ts, c.value, v.view_id,
        |  epoch_us(c.ts) - epoch_us(v.view_ts) AS gap_us
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND c.ts >= v.view_ts
        |ORDER BY c.event_id""".stripMargin,
    "q55_incident_windows" ->
      """WITH err AS (SELECT event_id AS incident_id, user_id,
        |    ts AS incident_ts, epoch_us(ts) AS start_us
        |  FROM events WHERE event_type = 'error'),
        |c AS (SELECT user_id, epoch_us(ts) AS c_us, value FROM events
        |  WHERE event_type = 'click')
        |SELECT e.incident_id, e.user_id, e.incident_ts,
        |  count(c.c_us) AS n_clicks,
        |  coalesce(CAST(round(sum(CAST(c.value AS DECIMAL(38,10))), 2)
        |    AS DOUBLE), 0.0) AS click_value
        |FROM err e LEFT JOIN c ON c.user_id = e.user_id
        |  AND c.c_us >= e.start_us AND c.c_us < e.start_us + 300000000
        |GROUP BY e.incident_id, e.user_id, e.incident_ts
        |ORDER BY e.incident_id""".stripMargin,
    "q73_retention_cohorts" ->
      """WITH weekly AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts) AS TIMESTAMP) AS week FROM events),
        |w2 AS (SELECT user_id, week,
        |    min(week) OVER (PARTITION BY user_id) AS cohort_week FROM weekly)
        |SELECT cohort_week,
        |  (epoch_us(week) - epoch_us(cohort_week)) // 604800000000
        |    AS week_offset,
        |  count(*) AS n_users
        |FROM w2 GROUP BY cohort_week, week_offset
        |ORDER BY cohort_week, week_offset""".stripMargin,
    "q74_minutely_gapfill" -> GapfillSql,
    "q75_anomaly_zscore" ->
      s"""WITH dense AS ($GapfillSql),
         |stats AS (SELECT minute, n_events,
         |    sum(n_events) OVER win AS s,
         |    sum(n_events * n_events) OVER win AS s2,
         |    count(*) OVER win AS k
         |  FROM dense
         |  WINDOW win AS (ORDER BY minute
         |    ROWS BETWEEN $TrailMin PRECEDING AND 1 PRECEDING))
         |SELECT minute, n_events, z, abs(z) > 3.0 AS is_anomaly
         |FROM (SELECT minute, n_events, $ZExpr AS z FROM stats)
         |ORDER BY minute""".stripMargin,
    "q82_session_transitions" ->
      s"""WITH seq AS (SELECT event_type, epoch_us(ts) AS us,
         |    lag(epoch_us(ts)) OVER w AS prev_us,
         |    lag(event_type) OVER w AS from_type
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
         |SELECT from_type, event_type AS to_type,
         |  count(*) AS n_transitions
         |FROM seq
         |WHERE prev_us IS NOT NULL
         |  AND us - prev_us <= ${graft.streaming.SessionPipeline.GapMicros}
         |GROUP BY from_type, to_type
         |ORDER BY from_type, to_type""".stripMargin)
}
