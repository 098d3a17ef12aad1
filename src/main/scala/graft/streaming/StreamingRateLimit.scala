package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming rate limit — the stream twin of `q_rate_limit`'s rank
  * window: at most `maxPerWindow` events per (user, event_type) per
  * tumbling window, decided continuously. State per key is ONE
  * (windowStart, count) pair — counts reset when the window rolls, and
  * the event-time timeout drops the key's state once the watermark
  * passes its window end (late events beyond the watermark are gone
  * anyway, so eviction is semantics-free). Within a batch events order
  * by (ts, event_id); like every continuous limiter the decision is
  * arrival-aware across batches (the batch rank window is the
  * replay-exact form; StreamingRateLimitSpec proves stream == batch
  * when per-key event time respects batch boundaries).
  */
object StreamingRateLimit {

  import StreamingDebounce.Ev

  case class WindowCount(windowStartMicros: Long, n: Int)

  private def micros(t: Timestamp): Long =
    t.getTime / 1000L * 1000000L + t.getNanos / 1000L

  private[graft] def updateKey(windowMicros: Long, maxPerWindow: Int)(
      key: (Long, String), events: Iterator[Ev],
      state: GroupState[WindowCount]): Iterator[Ev] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    // drop sub-watermark events explicitly: flatMapGroupsWithState
    // passes late data through, and a late event after its window's
    // state was evicted would restart the count and breach the cap
    val wmMicros =
      try state.getCurrentWatermarkMs() * 1000L catch { case _: Throwable => Long.MinValue }
    var cur = state.getOption.getOrElse(WindowCount(Long.MinValue, 0))
    val kept = events.toSeq.sortBy(e => (micros(e.ts), e.event_id)).filter { e =>
      val t = micros(e.ts)
      if (t < wmMicros) false // late: must not touch the live window either
      else {
        val w = t / windowMicros * windowMicros
        if (w != cur.windowStartMicros) cur = WindowCount(w, 0)
        val keep = cur.n < maxPerWindow
        if (keep) cur = cur.copy(n = cur.n + 1)
        keep
      }
    }
    if (cur.windowStartMicros != Long.MinValue) {
      state.update(cur)
      try {
        state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp((cur.windowStartMicros + windowMicros) / 1000L + 1)
      } catch { case _: Throwable => () } // batch frames: no watermark
    }
    kept.iterator
  }

  def limit(events: Dataset[Ev], windowMicros: Long,
            maxPerWindow: Int): Dataset[Ev] = {
    require(windowMicros > 0 && maxPerWindow > 0)
    implicit val keyEnc = Encoders.product[(Long, String)]
    implicit val evEnc = Encoders.product[Ev]
    implicit val stEnc = Encoders.product[WindowCount]
    events.groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(updateKey(windowMicros, maxPerWindow))
  }
}
