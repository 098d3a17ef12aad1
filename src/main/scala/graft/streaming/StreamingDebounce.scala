package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming debounce — the stream twin of
  * [[graft.operators.Debounce]]: the last-KEPT timestamp per
  * (user, event_type) lives in the state store, so reset-on-keep
  * suppression carries ACROSS micro-batches with O(live keys) state.
  *
  * State eviction is watermark-clean: once the watermark passes
  * `lastKept + gap`, every event the stream can still deliver is
  * beyond the suppression horizon and would be kept regardless — the
  * event-time timeout drops the key's state at exactly that point, so
  * an infinite stream holds state only for keys suppressed within the
  * current horizon. Ordering contract: events are debounced in
  * (ts, event_id) order WITHIN each batch; cross-batch order is arrival
  * order (exact equality with the batch operator when per-key event
  * time respects batch boundaries — StreamingDebounceSpec feeds split
  * batches and proves it).
  */
object StreamingDebounce {

  case class Ev(user_id: Long, event_type: String, event_id: Long, ts: Timestamp)
  case class Kept(lastKeptMicros: Long) // public: encoder codegen needs it

  private def micros(t: Timestamp): Long =
    t.getTime / 1000L * 1000000L + t.getNanos / 1000L

  private[graft] def updateKey(gapMicros: Long)(
      key: (Long, String), events: Iterator[Ev],
      state: GroupState[Kept]): Iterator[Ev] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    // flatMapGroupsWithState does NOT drop late data itself (the
    // watermark only gates state timeout) — drop sub-watermark events
    // HERE, or an event arriving after its key's state was evicted
    // could land inside a suppression window whose state is gone and
    // be wrongly kept. With this guard the eviction is semantics-free
    // by construction.
    val wmMicros =
      try state.getCurrentWatermarkMs() * 1000L catch { case _: Throwable => Long.MinValue }
    var lastKept = state.getOption.map(_.lastKeptMicros).getOrElse(Long.MinValue)
    val kept = events.toSeq.sortBy(e => (micros(e.ts), e.event_id)).filter { e =>
      val t = micros(e.ts)
      val keep = t >= wmMicros &&
        (lastKept == Long.MinValue || t >= lastKept + gapMicros)
      if (keep) lastKept = t
      keep
    }
    if (lastKept != Long.MinValue) {
      state.update(Kept(lastKept))
      // safe eviction: past this watermark every deliverable event is
      // beyond the suppression horizon
      try {
        state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp((lastKept + gapMicros) / 1000L + 1)
      } catch { case _: Throwable => () } // batch frames: no watermark
    }
    kept.iterator
  }

  /** Kept events from a (batch or streaming) [[Ev]] Dataset; on a
    * stream add a watermark upstream and write in Append mode.
    */
  def suppress(events: Dataset[Ev], gapMicros: Long): Dataset[Ev] = {
    implicit val keyEnc = Encoders.product[(Long, String)]
    implicit val evEnc = Encoders.product[Ev]
    implicit val stEnc = Encoders.product[Kept]
    events.groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(updateKey(gapMicros))
  }
}
