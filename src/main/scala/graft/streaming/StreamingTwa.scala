package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming time-weighted average — the stream twin of `q_twa`
  * ([[graft.operators.Resample.timeWeightedAvg]]): the sample-and-hold
  * integral Σ v·Δt maintained continuously per key. Each arriving
  * event CLOSES the segment the previous event opened, so the row
  * emitted at event eₙ carries the TWA over [e₁, eₙ] — and the last
  * row per key equals the batch operator over the same prefix
  * (StreamingTwaSpec proves stream == batch, same floor division).
  *
  * State is three longs per live key (last ts, last value, integral +
  * span). `idleTtlMicros` evicts silent keys — the same
  * restart-after-silence trade every accumulator twin documents; a
  * re-appearing key starts a fresh window rather than bridging a
  * TTL-sized gap with one stale segment. Sub-watermark stragglers drop
  * explicitly: a late event must not re-open a closed segment.
  */
object StreamingTwa {

  /** Valued event: `vq` pre-quantized (cents etc.). */
  case class VEv(user_id: Long, event_id: Long, ts: Timestamp, vq: Long)

  case class TwaRow(user_id: Long, event_id: Long, ts: Timestamp,
                    n_obs: Long, span_s: Long, twa: Long)

  case class St(lastSec: Long, lastV: Long, vs: Long, span: Long, n: Long)

  private def micros(t: Timestamp): Long =
    t.getTime / 1000L * 1000000L + t.getNanos / 1000L

  private[graft] def updateKey(idleTtlMicros: Long)(
      key: Long, events: Iterator[VEv],
      state: GroupState[St]): Iterator[TwaRow] = {
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val wmMicros =
      try state.getCurrentWatermarkMs() * 1000L catch { case _: Throwable => Long.MinValue }
    var cur = state.getOption.orNull
    val out = Seq.newBuilder[TwaRow]
    events.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
      val t = micros(e.ts)
      // the second guard: an ABOVE-watermark event can still arrive
      // behind this key's last processed event when batches interleave
      // under a lagging watermark — applying it would close a NEGATIVE
      // segment and corrupt the integral; it drops like a straggler
      // (the documented in-order trade every sequential twin makes)
      if (t >= wmMicros && (cur == null || t / 1000000L >= cur.lastSec)) {
        val sec = t / 1000000L // truncated epoch seconds, the batch grain
        if (cur == null) cur = St(sec, e.vq, 0L, 0L, 1L)
        else {
          val dur = sec - cur.lastSec
          cur = St(sec, e.vq, cur.vs + cur.lastV * dur, cur.span + dur,
            cur.n + 1L)
          if (cur.span > 0L)
            out += TwaRow(key, e.event_id, e.ts, cur.n, cur.span,
              Math.floorDiv(cur.vs, cur.span))
        }
      }
    }
    if (cur != null) {
      state.update(cur)
      try {
        state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp((cur.lastSec * 1000000L + idleTtlMicros) / 1000L + 1)
      } catch { case _: Throwable => () } // batch frames: no watermark
    }
    out.result().iterator
  }

  def running(events: Dataset[VEv], idleTtlMicros: Long): Dataset[TwaRow] = {
    require(idleTtlMicros > 0)
    implicit val keyEnc = Encoders.scalaLong
    implicit val evEnc = Encoders.product[VEv]
    implicit val stEnc = Encoders.product[St]
    implicit val outEnc = Encoders.product[TwaRow]
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(updateKey(idleTtlMicros))
  }
}
