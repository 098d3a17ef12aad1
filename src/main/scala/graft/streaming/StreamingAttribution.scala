package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming last-touch attribution — the stream twin of
  * `q_attribution_last_touch`: per user, the most recent view/click is
  * carried as state; each purchase emits its credited touch (or null
  * when the last touch is older than the 24h lookback). Semantics are
  * pinned to the batch as-of join: the comparison is INCLUSIVE
  * (a touch at the purchase's exact timestamp credits — within a
  * micro-batch, same-ts touches process before the purchase), and
  * exact-ts touch ties resolve to the LARGEST event id, exactly as the
  * batch query dedups them. StreamingAttributionSpec proves
  * stream == batch across micro-batch splits.
  *
  * State is (ts, touch id) per live user; `idleTtlMicros` bounds the
  * store by event-time timeout (an evicted user's next purchase simply
  * finds no touch — identical to the lookback expiring). Sub-watermark
  * stragglers are dropped: a late touch must not rewrite an
  * attribution already emitted.
  */
object StreamingAttribution {

  case class Ev(user_id: Long, event_id: Long, ts: Timestamp, event_type: String)

  case class Credit(user_id: Long, purchase_id: Long, ts: Timestamp,
                    credited_touch_id: Option[Long])

  case class St(touchMicros: Long, touchId: Long, lastMicros: Long)

  private def micros(t: Timestamp): Long =
    t.getTime / 1000L * 1000000L + t.getNanos / 1000L

  private[graft] def updateKey(lookbackMicros: Long, idleTtlMicros: Long)(
      key: Long, events: Iterator[Ev],
      state: GroupState[St]): Iterator[Credit] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val wmMicros =
      try state.getCurrentWatermarkMs() * 1000L catch { case _: Throwable => Long.MinValue }
    var cur = state.getOption.getOrElse(St(Long.MinValue, Long.MinValue, Long.MinValue))
    val out = Seq.newBuilder[Credit]
    // same-ts touches sort BEFORE the purchase (inclusive as-of), and
    // by id so the largest same-ts touch id lands last (batch dedup)
    val ordered = events.toSeq.sortBy(e =>
      (micros(e.ts), if (e.event_type == "purchase") 1 else 0, e.event_id))
    ordered.foreach { e =>
      val t = micros(e.ts)
      if (t >= wmMicros) {
        e.event_type match {
          case "view" | "click" =>
            if (t > cur.touchMicros ||
              (t == cur.touchMicros && e.event_id > cur.touchId))
              cur = St(t, e.event_id, t)
            else cur = cur.copy(lastMicros = t)
          case "purchase" =>
            val credited =
              if (cur.touchMicros != Long.MinValue &&
                t - cur.touchMicros <= lookbackMicros)
                Some(cur.touchId)
              else None
            out += Credit(key, e.event_id, e.ts, credited)
            cur = cur.copy(lastMicros = t)
          case _ => cur = cur.copy(lastMicros = t)
        }
      }
    }
    if (cur.lastMicros != Long.MinValue) {
      state.update(cur)
      try {
        state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp((cur.lastMicros + idleTtlMicros) / 1000L + 1)
      } catch { case _: Throwable => () } // batch frames: no watermark
    }
    out.result().iterator
  }

  def credits(events: Dataset[Ev], lookbackMicros: Long,
              idleTtlMicros: Long): Dataset[Credit] = {
    require(lookbackMicros > 0 && idleTtlMicros > 0)
    implicit val keyEnc = Encoders.scalaLong
    implicit val evEnc = Encoders.product[Ev]
    implicit val stEnc = Encoders.product[St]
    implicit val outEnc = Encoders.product[Credit]
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(
        updateKey(lookbackMicros, idleTtlMicros))
  }
}
