package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One typed event on the wire (events-table shape, minus payload). */
case class TypedEvent(event_type: String, event_id: Long, tsMicros: Long)

/** Per-metric detector state: the still-open minute bucket plus the EWMA
  * baseline learned from every CLOSED minute so far.
  */
case class EwmaState(openMinute: Long, openCount: Long,
    mean: Double, variance: Double, nClosed: Long)

/** One scored minute — the streaming twin of a q75_anomaly_zscore row
  * (EWMA baseline instead of a trailing window; same dense-series
  * semantics: silent minutes score as explicit zeros).
  */
case class ScoredMinute(event_type: String, minuteMicros: Long,
    n_events: Long, z: Option[Double], is_anomaly: Option[Boolean])

/** Streaming anomaly detection — the incremental twin of the batch q75
  * scan. Per event type, minute buckets close as later events arrive; each
  * closed minute is z-scored against an exponentially-weighted baseline
  * (mean + variance) and then folded into it. Gap minutes between events
  * are closed as ZERO-count minutes, exactly like q74's dense gap-filled
  * spine — an EWMA that never sees the quiet minutes would learn the wrong
  * baseline.
  *
  * Why custom state: a trailing-window z-score needs the last N closed
  * buckets per key; chaining a windowed aggregation into a second stateful
  * operator is unsupported after aggregation, and keeping N buckets per key
  * is exactly the state the EWMA recursion compresses to two doubles. State
  * per key is ONE small case class — bounded by the metric universe, not
  * history.
  *
  * Scale: the shuffle keys on event_type here (the testdata's metric
  * space); in production the group key is the full metric identity
  * (entity × type), giving millions of groups. Warm-up minutes
  * (fewer than [[AnomalyPipeline.Warmup]] closed minutes) and flat-history
  * minutes (zero variance) emit null z — no fake scores, matching q75.
  *
  * Ordering: like [[SessionPipeline.sessionize]], events must arrive in
  * event-time order per key across triggers (produce-time ordering); the
  * buffered-until-watermark pattern of `sessionizeBuffered` composes the
  * same way here if the feed reorders.
  */
object AnomalyPipeline {

  val MinuteUs: Long = 60L * 1000000L

  /** EWMA smoothing factor (weight of the newest closed minute). */
  val Alpha: Double = 0.125

  /** Closed minutes before z-scores are emitted. */
  val Warmup: Long = 30L

  /** Zero-fill bound for silent gaps (one week of minutes): a single
    * corrupt far-future timestamp (producer clock skew) must not make one
    * fold emit tens of millions of gap rows into an in-memory builder
    * (executor OOM). A week of explicit zeros already saturates the EWMA
    * toward zero, so silent minutes beyond the cap are SKIPPED, not
    * fabricated — the bucket jumps to the event's minute and scoring
    * continues.
    */
  val MaxGapMinutes: Long = 7L * 1440L

  /** Score one closed minute against the state's baseline, then absorb it
    * (Welford-style EWMA update: mean' = mean + a·d; var' = (1−a)·(var +
    * a·d²)). Shared by the streaming operator and the test's batch fold.
    */
  private[streaming] def closeMinute(eventType: String, minute: Long,
      count: Long, st: EwmaState): (ScoredMinute, EwmaState) = {
    val z = if (st.nClosed >= Warmup && st.variance > 0.0)
      Some((count.toDouble - st.mean) / math.sqrt(st.variance))
    else None
    val d = count.toDouble - st.mean
    val next = st.copy(
      mean = st.mean + Alpha * d,
      variance = (1.0 - Alpha) * (st.variance + Alpha * d * d),
      nClosed = st.nClosed + 1)
    (ScoredMinute(eventType, minute, count, z, z.map(v => math.abs(v) > 3.0)),
      next)
  }

  /** Fold a batch of one key's events into the detector state, emitting a
    * scored row per minute that closed (silent minutes close as zeros).
    */
  private def foldEvents(eventType: String, evs: Iterator[TypedEvent],
      st: GroupState[EwmaState]): Iterator[ScoredMinute] = {
    val out = Seq.newBuilder[ScoredMinute]
    var state = st.getOption.getOrElse(
      EwmaState(Long.MinValue, 0L, 0.0, 0.0, 0L))
    evs.toSeq.sortBy(e => (e.tsMicros, e.event_id)).foreach { e =>
      val m = Math.floorDiv(e.tsMicros, MinuteUs)
      if (state.openMinute == Long.MinValue)
        state = state.copy(openMinute = m, openCount = 1L)
      else if (m == state.openMinute)
        state = state.copy(openCount = state.openCount + 1L)
      else if (m < state.openMinute) {
        // behind the open bucket: outside the documented per-key ordering
        // contract — folding it would rewind the bucket and re-emit
        // already-closed minutes (silent duplicate rows + a corrupted
        // baseline). Dropped; the buffered-until-watermark composition is
        // the tolerant path for feeds that genuinely reorder.
      } else {
        // close the open minute, then every silent minute up to m
        // (bounded by MaxGapMinutes — see its scaladoc)
        var cur = state
        var minute = cur.openMinute
        var count = cur.openCount
        val fillTo = math.min(m, minute + MaxGapMinutes)
        while (minute < fillTo) {
          val (row, next) = closeMinute(eventType, minute * MinuteUs,
            count, cur)
          out += row
          cur = next
          minute += 1
          count = 0L // minutes between events closed as zeros
        }
        state = cur.copy(openMinute = m, openCount = 1L)
      }
    }
    st.update(state)
    out.result().iterator
  }

  /** The streaming detector: one EWMA state per event type, scored rows in
    * append mode as minutes close. A minute closes only when a LATER
    * same-key event arrives — a metric that goes permanently silent stops
    * scoring (its open bucket never closes). Use [[detectWithTimeout]]
    * when total-outage alarms matter; this form stays for
    * produce-time-ordered feeds with no watermark column.
    */
  def detect(events: Dataset[TypedEvent])(
      implicit spark: SparkSession): Dataset[ScoredMinute] = {
    import spark.implicits._
    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[EwmaState, ScoredMinute](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (k: String, evs: Iterator[TypedEvent], st: GroupState[EwmaState]) =>
          foldEvents(k, evs, st)
      }
  }

  /** [[detect]] plus outage coverage: minutes ALSO close as the
    * event-time watermark passes them, so a metric that goes permanently
    * silent keeps closing zero-count minutes and ALARMS on the collapse —
    * the most important anomaly of all, and the one the event-driven form
    * is structurally blind to (its open bucket waits forever for a next
    * event). The `sessionizeWithTimeout` pattern: watermark +
    * EventTimeTimeout, re-armed at the end of the open bucket and clamped
    * above the current watermark. Closing stays bounded by
    * [[MaxGapMinutes]] per firing, with the same jump-ahead semantics as
    * the event-driven fill.
    */
  def detectWithTimeout(events: Dataset[TypedEvent],
      watermarkDelay: String = "2 minutes")(
      implicit spark: SparkSession): Dataset[ScoredMinute] = {
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    import spark.implicits._
    events
      .withColumn("event_ts", timestamp_micros(col("tsMicros")))
      .withWatermark("event_ts", watermarkDelay)
      .as[TypedEvent]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[EwmaState, ScoredMinute](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (k: String, evs: Iterator[TypedEvent], st: GroupState[EwmaState]) =>
          val out =
            if (st.hasTimedOut) closeThroughWatermark(k, st)
            else foldEvents(k, evs, st)
          // re-arm: fire when the watermark passes the open bucket's end
          st.getOption.filter(_.openMinute != Long.MinValue).foreach { s2 =>
            st.setTimeoutTimestamp(math.max(
              (s2.openMinute + 1) * MinuteUs / 1000L,
              st.getCurrentWatermarkMs() + 1))
          }
          out
      }
  }

  /** Close the open bucket and every complete silent minute strictly
    * below the watermark's minute (a minute is complete once the
    * watermark reaches its successor's start); the open bucket then
    * jumps to the watermark minute with a zero count, exactly like the
    * event-driven fill jumps past a capped gap.
    */
  private def closeThroughWatermark(eventType: String,
      st: GroupState[EwmaState]): Iterator[ScoredMinute] = {
    val wmMinute = Math.floorDiv(st.getCurrentWatermarkMs() * 1000L, MinuteUs)
    val out = Seq.newBuilder[ScoredMinute]
    var cur = st.get
    if (cur.openMinute == Long.MinValue || wmMinute <= cur.openMinute)
      Iterator.empty
    else {
      var minute = cur.openMinute
      var count = cur.openCount
      val fillTo = math.min(wmMinute, minute + MaxGapMinutes)
      while (minute < fillTo) {
        val (row, next) = closeMinute(eventType, minute * MinuteUs, count, cur)
        out += row
        cur = next
        minute += 1
        count = 0L
      }
      st.update(cur.copy(openMinute = wmMinute, openCount = 0L))
      out.result().iterator
    }
  }

  /** Batch reference fold (same algorithm over an in-memory series) — the
    * test oracle for [[detect]].
    */
  private[graft] def batchFold(eventType: String,
      minuteCounts: Seq[(Long, Long)]): Seq[ScoredMinute] = {
    var st = EwmaState(Long.MinValue, 0L, 0.0, 0.0, 0L)
    minuteCounts.flatMap { case (minuteMicros, n) =>
      val (row, next) = closeMinute(eventType, minuteMicros, n, st)
      st = next
      Some(row)
    }
  }
}
