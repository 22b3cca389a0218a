package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event on the wire (events-table shape). */
case class SessionEvent(user_id: Long, event_id: Long, tsMicros: Long,
    value: Double)

/** Open-session state kept per user between micro-batches. `totalValue`
  * is the EXACT decimal running sum (see `SessionPipeline.dec`): the batch
  * q13 twin totals through `Tables.dsum`'s order-independent decimal sum,
  * and a raw double fold would drift off it by ulps on any
  * non-representable values — "agree row-for-row" has to include the
  * total.
  */
case class OpenSession(seq: Long, startMicros: Long, lastMicros: Long,
    nEvents: Long, totalValue: BigDecimal)

/** Per-user state of the watermark-driven variants: events newer than
  * the watermark wait in `buffer` until no earlier event can still arrive;
  * `nextSeq` preserves session numbering across watermark-closed sessions
  * AND across idle-state eviction (the state shrinks to this one counter
  * as a tombstone — removing it entirely would restart a returning user at
  * seq 1, emitting duplicate (user_id, session_seq) keys).
  */
case class BufferedSession(buffer: Seq[SessionEvent],
    open: Option[OpenSession], nextSeq: Long)

/** A closed session — matches the batch q13_user_sessions row shape. */
case class ClosedSession(user_id: Long, session_seq: Long,
    startMicros: Long, endMicros: Long, n_events: Long, total_value: Double)

/** Streaming sessionization via `flatMapGroupsWithState` — the custom-state
  * operator the built-in windowed aggregates cannot express (session extent
  * depends on the data, not the clock).
  *
  * Per user, state holds the single open session; an incoming event either
  * extends it or (gap > 30 min) closes it and opens the next. Closed
  * sessions are emitted exactly once (append mode). Batch twin:
  * `ops.EventOps.userSessions` — the two agree row-for-row once sessions
  * close (StreamingSpec asserts this).
  *
  * Scale design: state is one small case class per active user (not per
  * event); the shuffle keys on user_id only. [[SessionPipeline.sessionize]]
  * reproduces the reference's unbounded model (state never evicts — like its
  * Postgres PK); [[SessionPipeline.sessionizeWithTimeout]] is the production
  * variant: event-time watermark + `GroupStateTimeout.EventTimeTimeout`
  * closes and emits long-idle sessions, after which the state shrinks to a
  * numbering tombstone (one counter per ever-seen user — the irreducible
  * memory of exact per-user session_seq; the heavy open-session payload and
  * buffers are what eviction reclaims). Events must arrive in event-time
  * order per user within the feed (the reference's produce-time ordering
  * guarantees this); [[SessionPipeline.sessionizeBuffered]] is the
  * out-of-order-tolerant variant that buffers per-user until the watermark.
  */
object SessionPipeline {

  val GapMicros: Long = 1800L * 1000000L

  /** The batch `Tables.dsum` contract replayed per event: each value
    * enters the running sum as DECIMAL(38,10) — exactly Spark's
    * double→decimal cast — so the fold is order-independent and the
    * emitted 2-dp total is bit-equal to q13's.
    */
  private def dec(v: Double): BigDecimal =
    BigDecimal(v).setScale(10, BigDecimal.RoundingMode.HALF_UP)

  private def emit(userId: Long, o: OpenSession): ClosedSession =
    ClosedSession(userId, o.seq, o.startMicros, o.lastMicros, o.nEvents,
      o.totalValue.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)

  /** Fold already-settled events (sorted here) into the open session —
    * the ONE definition of the session rule, shared by all three stateful
    * variants. `nextSeq0` seeds the seq of a session opened from empty
    * state; returns (closed sessions, new open state, next fresh seq).
    */
  private def fold(userId: Long, evs: Seq[SessionEvent],
      open0: Option[OpenSession], nextSeq0: Long)
      : (Seq[ClosedSession], Option[OpenSession], Long) = {
    val closed = Seq.newBuilder[ClosedSession]
    var open = open0
    evs.sortBy(e => (e.tsMicros, e.event_id)).foreach { e =>
      open match {
        case Some(o) if e.tsMicros - o.lastMicros <= GapMicros =>
          open = Some(o.copy(lastMicros = e.tsMicros,
            nEvents = o.nEvents + 1, totalValue = o.totalValue + dec(e.value)))
        case Some(o) =>
          closed += emit(userId, o)
          open = Some(OpenSession(o.seq + 1, e.tsMicros, e.tsMicros, 1L,
            dec(e.value)))
        case None =>
          open = Some(OpenSession(nextSeq0, e.tsMicros, e.tsMicros, 1L,
            dec(e.value)))
      }
    }
    (closed.result(), open, open.map(_.seq + 1).getOrElse(nextSeq0))
  }

  /** Unbounded-state sessionization (reference parity: state lives forever,
    * a user's final session only closes when a later event arrives).
    */
  def sessionize(events: Dataset[SessionEvent])(
      implicit spark: SparkSession): Dataset[ClosedSession] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, evs: Iterator[SessionEvent], st: GroupState[OpenSession]) =>
          val (closed, open, _) =
            fold(userId, evs.toSeq, st.getOption, 1L)
          open.foreach(st.update)
          closed.iterator
      }
  }

  /** Out-of-order-tolerant sessionization: events buffer per user until the
    * event-time watermark passes them — only then is their relative order
    * final — and are folded into the open session in (ts, event_id) order,
    * so the closed sessions are IDENTICAL to the batch q13 definition even
    * when the feed delivers a user's events out of order across
    * micro-batches (the in-order variants would mis-split sessions).
    *
    * Closing rule: once `watermark − lastEvent > gap`, no admissible future
    * event (all have ts > watermark) can extend the session, so it closes
    * exactly where a later event would have closed it. State per user =
    * the not-yet-final buffer + one open session; buffered events drain as
    * the watermark advances, so state is bounded by the out-of-orderness
    * budget (`watermarkDelay`), not history — a fully drained user keeps
    * only the nextSeq tombstone.
    */
  def sessionizeBuffered(events: Dataset[SessionEvent],
      watermarkDelay: String = "10 minutes")(
      implicit spark: SparkSession): Dataset[ClosedSession] = {
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    import spark.implicits._
    events
      .withColumn("event_ts", timestamp_micros(col("tsMicros")))
      .withWatermark("event_ts", watermarkDelay)
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[BufferedSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, evs: Iterator[SessionEvent],
            st: GroupState[BufferedSession]) =>
          val prior = st.getOption.getOrElse(BufferedSession(Nil, None, 1L))
          val wmMicros = st.getCurrentWatermarkMs() * 1000L
          val all = prior.buffer ++ evs
          // events at/behind the watermark are final — no earlier event can
          // still arrive, so their order is settled
          val (ready, pending) = all.partition(_.tsMicros <= wmMicros)
          val closed = Seq.newBuilder[ClosedSession]
          val (foldClosed, folded, seqAfter) =
            fold(userId, ready, prior.open, prior.nextSeq)
          closed ++= foldClosed
          var open = folded
          var nextSeq = seqAfter
          // any future event has ts > watermark: if even the watermark is
          // past the gap horizon, nothing can extend this session
          open.foreach { o =>
            if (wmMicros - o.lastMicros > GapMicros) {
              closed += emit(userId, o)
              nextSeq = o.seq + 1
              open = None
            }
          }
          st.update(BufferedSession(pending, open, nextSeq))
          // wake when the watermark can settle more work: the open
          // session's gap horizon or the oldest buffered event. A drained
          // user (tombstone) needs no wake-up — the counter just persists.
          val targets =
            open.map(o => (o.lastMicros + GapMicros) / 1000L).toSeq ++
              pending.map(_.tsMicros / 1000L)
          if (targets.nonEmpty)
            st.setTimeoutTimestamp(
              math.max(targets.min + 1L, st.getCurrentWatermarkMs() + 1L))
          closed.result().iterator
      }
  }

  /** Watermarked sessionization with idle-session eviction: once the
    * event-time watermark passes `lastEvent + gap`, the open session times
    * out, is emitted as closed, and its state shrinks to the numbering
    * tombstone. `watermarkDelay` is the out-of-orderness budget; the
    * timeout itself reuses the same 30-minute gap that defines a session
    * boundary, so a timed-out session closes exactly where a subsequent
    * event would have closed it — and a returning user continues at the
    * next session_seq, exactly like the batch q13 numbering.
    */
  def sessionizeWithTimeout(events: Dataset[SessionEvent],
      watermarkDelay: String = "10 minutes")(
      implicit spark: SparkSession): Dataset[ClosedSession] = {
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    import spark.implicits._
    events
      .withColumn("event_ts", timestamp_micros(col("tsMicros")))
      .withWatermark("event_ts", watermarkDelay)
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[BufferedSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, evs: Iterator[SessionEvent],
            st: GroupState[BufferedSession]) =>
          if (st.hasTimedOut) {
            val prior = st.get
            prior.open match {
              case Some(o) =>
                st.update(BufferedSession(Nil, None, o.seq + 1))
                Iterator.single(emit(userId, o))
              case None =>
                Iterator.empty
            }
          } else {
            val prior = st.getOption.getOrElse(BufferedSession(Nil, None, 1L))
            val (closed, open, nextSeq) =
              fold(userId, evs.toSeq, prior.open, prior.nextSeq)
            st.update(BufferedSession(Nil, open, nextSeq))
            open.foreach { o =>
              // fire once the watermark passes the session gap; clamp above
              // the current watermark (Spark rejects timeouts at/behind it)
              st.setTimeoutTimestamp(math.max(
                (o.lastMicros + GapMicros) / 1000L,
                st.getCurrentWatermarkMs() + 1))
            }
            closed.iterator
          }
      }
  }

  /** Declarative twin via the built-in `session_window` aggregate: Spark's
    * streaming session-window state store does the merging, closing, and
    * eviction that [[sessionizeWithTimeout]] hand-rolls — and it handles
    * out-of-order events within the watermark for free. Boundary semantics
    * match the custom operator exactly (probed: an event at precisely
    * lastEvent + gap MERGES; gap-exceeding splits — i.e. `<= gap` extends,
    * like the shared fold), with `end = lastEvent + gap` instead of the
    * last event time. What it CANNOT express is per-user session NUMBERING
    * (session_seq) — the reason the custom-state operators exist.
    *
    * Also runs in batch (same aggregate, no watermark needed), where
    * StreamingSpec pins it row-for-row against the q13 window definition.
    */
  def sessionizeDeclarative(events: Dataset[SessionEvent],
      watermarkDelay: String = "10 minutes",
      streaming: Boolean = true): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val withTs = events.toDF()
      .withColumn("event_ts", timestamp_micros(col("tsMicros")))
    val src =
      if (streaming) withTs.withWatermark("event_ts", watermarkDelay)
      else withTs
    src
      .groupBy(col("user_id"),
        session_window(col("event_ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        graft.Tables.dsum(col("value")).as("total_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))
  }
}
