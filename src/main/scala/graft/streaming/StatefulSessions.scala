package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization via `flatMapGroupsWithState` — the
  * escape hatch for session logic the built-in `session_window` can't
  * express (per-session event caps, custom emit conditions). Keyed state
  * is one small Session per user; the event-time timeout closes idle
  * sessions so state is bounded on an infinite stream.
  */
object StatefulSessions {

  case class Event(user_id: Long, ts: Timestamp, event_type: String)
  case class SessionState(start: Long, last: Long, n: Long)
  case class SessionOut(user_id: Long, session_start: Timestamp,
                        session_end: Timestamp, n_events: Long)

  val GapMs: Long = 30L * 60 * 1000

  /** Flush closed sessions for one user given newly arrived events. */
  private[graft] def updateUser(
      userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator(SessionOut(userId, new Timestamp(s.start), new Timestamp(s.last), s.n))
    }
    // drop sub-watermark events: flatMapGroupsWithState passes late
    // data through (the watermark only gates the timeout), and a late
    // event arriving after its session timed out and flushed would
    // open a spurious second session for the same activity
    val wmMs =
      try state.getCurrentWatermarkMs() catch { case _: Throwable => Long.MinValue }
    val sorted = events.toSeq.filter(_.ts.getTime >= wmMs)
      .sortBy(e => (e.ts.getTime, e.event_type))
    var cur = state.getOption
    val closed = Seq.newBuilder[SessionOut]
    sorted.foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(s) if t - s.last < GapMs =>
          cur = Some(s.copy(last = t, n = s.n + 1))
        case Some(s) =>
          closed += SessionOut(userId, new Timestamp(s.start), new Timestamp(s.last), s.n)
          cur = Some(SessionState(t, t, 1))
        case None =>
          cur = Some(SessionState(t, t, 1))
      }
    }
    cur match {
      case Some(s) =>
        state.update(s)
        if (state.getOption.isDefined && eventTimeTimeoutAvailable(state)) {
          // clamp: a batch that delivers ONLY sub-watermark events for a
          // user with stale state would otherwise set a timeout at or
          // below the current watermark — Spark throws on that, and the
          // failed batch replays into the same throw (a stuck stream).
          // Clamped, the stale session times out on the next trigger.
          val wm = try state.getCurrentWatermarkMs()
            catch { case _: Throwable => Long.MinValue }
          state.setTimeoutTimestamp(math.max(s.last + GapMs, wm + 1))
        }
      case None => state.remove()
    }
    closed.result().iterator
  }

  private def eventTimeTimeoutAvailable(state: GroupState[SessionState]): Boolean =
    try { state.getCurrentWatermarkMs(); true } catch { case _: Throwable => false }

  /** Wire the stateful sessionizer over a STREAMING events Dataset (add
    * a watermark upstream; closed sessions emit as state times out).
    *
    * BATCH CAVEAT: batch execution never fires timeouts and discards
    * state at the end, so each user's final (still-open) session is NOT
    * emitted — a single-burst user produces zero batch output. For
    * batch sessionization use the `session_window` aggregation
    * (EventPipeline's batch twin), which has no open-session notion.
    */
  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stEnc = Encoders.product[SessionState]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(updateUser)
  }
}
