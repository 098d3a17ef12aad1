package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming Holt linear-trend smoothing — the stream twin of `q_holt`
  * ([[graft.operators.Recurrences.holt]]): level and trend maintained
  * continuously per key with the SAME exact-integer recurrence
  * (Math.floorDiv at every step), one fitted row l+b emitted per
  * event. Stream output == batch output whenever each key's event time
  * respects batch boundaries (StreamingHoltSpec proves it).
  *
  * State is TWO longs (+ a first-step flag folded into them) per live
  * key. Like [[StreamingCusum]], a smoother never expires on its own,
  * so `idleTtlMicros` bounds total state: a key idle past the TTL (by
  * event time, watermark-enforced) is evicted and restarts cold — the
  * documented trade of unbounded state for restart-after-silence.
  * Sub-watermark stragglers are dropped explicitly: a late event must
  * not rewrite a level that already advanced past it.
  */
object StreamingHolt {

  case class VEv(user_id: Long, event_id: Long, ts: Timestamp, xq: Long)

  case class Fit(user_id: Long, event_id: Long, ts: Timestamp, holt_q: Long)

  case class St(l: Long, b: Long, started: Boolean, lastMicros: Long)

  private def micros(t: Timestamp): Long =
    t.getTime / 1000L * 1000000L + t.getNanos / 1000L

  private[graft] def updateKey(aNum: Long, aDen: Long, bNum: Long, bDen: Long,
                               idleTtlMicros: Long)(
      key: Long, events: Iterator[VEv],
      state: GroupState[St]): Iterator[Fit] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val wmMicros =
      try state.getCurrentWatermarkMs() * 1000L catch { case _: Throwable => Long.MinValue }
    var cur = state.getOption.getOrElse(St(0L, 0L, started = false, Long.MinValue))
    val fits = Seq.newBuilder[Fit]
    events.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
      val t = micros(e.ts)
      if (t >= wmMicros) {
        cur =
          if (!cur.started) St(e.xq, 0L, started = true, t)
          else {
            val lNew = Math.floorDiv(aNum * e.xq + (aDen - aNum) * (cur.l + cur.b), aDen)
            val bNew = Math.floorDiv(bNum * (lNew - cur.l) + (bDen - bNum) * cur.b, bDen)
            St(lNew, bNew, started = true, t)
          }
        fits += Fit(key, e.event_id, e.ts, cur.l + cur.b)
      }
    }
    if (cur.started) {
      state.update(cur)
      try {
        state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp((cur.lastMicros + idleTtlMicros) / 1000L + 1)
      } catch { case _: Throwable => () } // batch frames: no watermark
    }
    fits.result().iterator
  }

  def fitted(events: Dataset[VEv], aNum: Long, aDen: Long,
             bNum: Long, bDen: Long, idleTtlMicros: Long): Dataset[Fit] = {
    require(aNum > 0 && aDen > aNum, s"need 0 < aNum < aDen, got $aNum/$aDen")
    require(bNum > 0 && bDen > bNum, s"need 0 < bNum < bDen, got $bNum/$bDen")
    require(idleTtlMicros > 0)
    implicit val keyEnc = Encoders.scalaLong
    implicit val evEnc = Encoders.product[VEv]
    implicit val stEnc = Encoders.product[St]
    implicit val outEnc = Encoders.product[Fit]
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(
        updateKey(aNum, aDen, bNum, bDen, idleTtlMicros))
  }
}
