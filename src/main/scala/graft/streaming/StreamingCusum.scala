package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CUSUM — the stream twin of `q_cusum`
  * ([[graft.operators.Recurrences.cusumAlarms]]): the one-sided page
  * statistic s = max(0, s + (x - target)) maintained continuously per
  * key, an alarm row emitted (and the statistic reset) whenever s
  * reaches `threshold`. Same exact-integer recurrence as the batch
  * operator, so stream output == batch output whenever each key's
  * event time respects batch boundaries (StreamingCusumSpec proves it).
  *
  * State is ONE long per live key. A lifetime accumulator never
  * expires on its own, so `idleTtlMicros` bounds total state: a key
  * idle past the TTL (by event time, enforced via watermark timeout)
  * is evicted and its statistic restarts at zero on the next event —
  * the documented trade of unbounded state for restart-after-silence
  * semantics. Sub-watermark stragglers are dropped explicitly: a late
  * event must not perturb a statistic that already advanced past it.
  */
object StreamingCusum {

  /** Valued event: `xq` pre-quantized (cents etc.), as in the batch op. */
  case class VEv(user_id: Long, event_id: Long, ts: Timestamp, xq: Long)

  case class Alarm(user_id: Long, event_id: Long, ts: Timestamp, cusum_q: Long)

  case class St(s: Long, lastMicros: Long)

  private def micros(t: Timestamp): Long =
    t.getTime / 1000L * 1000000L + t.getNanos / 1000L

  private[graft] def updateKey(target: Long, threshold: Long, idleTtlMicros: Long)(
      key: Long, events: Iterator[VEv],
      state: GroupState[St]): Iterator[Alarm] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val wmMicros =
      try state.getCurrentWatermarkMs() * 1000L catch { case _: Throwable => Long.MinValue }
    var cur = state.getOption.getOrElse(St(0L, Long.MinValue))
    val alarms = Seq.newBuilder[Alarm]
    events.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
      val t = micros(e.ts)
      if (t >= wmMicros) {
        val s = Math.max(0L, cur.s + (e.xq - target))
        if (s >= threshold) {
          alarms += Alarm(key, e.event_id, e.ts, s)
          cur = St(0L, t)
        } else cur = St(s, t)
      }
    }
    if (cur.lastMicros != Long.MinValue) {
      state.update(cur)
      try {
        state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp((cur.lastMicros + idleTtlMicros) / 1000L + 1)
      } catch { case _: Throwable => () } // batch frames: no watermark
    }
    alarms.result().iterator
  }

  def alarms(events: Dataset[VEv], target: Long, threshold: Long,
             idleTtlMicros: Long): Dataset[Alarm] = {
    require(threshold > 0 && idleTtlMicros > 0)
    implicit val keyEnc = Encoders.scalaLong
    implicit val evEnc = Encoders.product[VEv]
    implicit val stEnc = Encoders.product[St]
    implicit val outEnc = Encoders.product[Alarm]
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(updateKey(target, threshold, idleTtlMicros))
  }
}
