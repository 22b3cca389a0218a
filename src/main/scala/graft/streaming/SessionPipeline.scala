package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event on the wire (events-table shape). */
case class SessionEvent(user_id: Long, event_id: Long, tsMicros: Long,
    value: Double)

/** Open-session state kept per user between micro-batches. */
case class OpenSession(seq: Long, startMicros: Long, lastMicros: Long,
    nEvents: Long, totalValue: Double)

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
  * event); the shuffle keys on user_id only; with event-time watermarking a
  * production deployment adds `GroupStateTimeout.EventTimeTimeout` to flush
  * long-idle sessions and bound state. Events must arrive in event-time
  * order per user within the feed (the reference's produce-time ordering
  * guarantees this); an out-of-order-tolerant variant would buffer per-user
  * until the watermark.
  */
object SessionPipeline {

  val GapMicros: Long = 1800L * 1000000L

  def sessionize(events: Dataset[SessionEvent])(
      implicit spark: SparkSession): Dataset[ClosedSession] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, evs: Iterator[SessionEvent], st: GroupState[OpenSession]) =>
          val closed = Seq.newBuilder[ClosedSession]
          var open = st.getOption
          evs.toSeq.sortBy(e => (e.tsMicros, e.event_id)).foreach { e =>
            open match {
              case Some(o) if e.tsMicros - o.lastMicros <= GapMicros =>
                open = Some(o.copy(lastMicros = e.tsMicros,
                  nEvents = o.nEvents + 1, totalValue = o.totalValue + e.value))
              case Some(o) =>
                closed += ClosedSession(userId, o.seq, o.startMicros,
                  o.lastMicros, o.nEvents, o.totalValue)
                open = Some(OpenSession(o.seq + 1, e.tsMicros, e.tsMicros, 1L,
                  e.value))
              case None =>
                open = Some(OpenSession(1L, e.tsMicros, e.tsMicros, 1L, e.value))
            }
          }
          open.foreach(st.update)
          closed.result().iterator
      }
  }
}
