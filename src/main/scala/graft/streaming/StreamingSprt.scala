package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SPRT — the stream twin of `q_sprt`
  * ([[graft.operators.Stats.sprt]]), and the test that WANTS to be a
  * stream: Wald's sequential ratio is defined observation-by-
  * observation, so a continuous experiment monitor maintains (c, n)
  * per arm and emits EXACTLY ONE decision row the moment the LLR
  * crosses a boundary. Same pinned double constants as the batch
  * operator (pass them from [[graft.operators.Stats.sprtConstants]]),
  * so the streamed crossing row equals the batch first-crossing row
  * over the same ordered prefix (StreamingSprtSpec proves it).
  *
  * State is two longs + a decided flag per arm — arm cardinality is
  * bounded by contract (an experiment has a handful of arms), so there
  * is no TTL: a decided arm's tombstone is the guarantee later events
  * can't re-decide it. Sub-watermark stragglers drop explicitly — a
  * late observation must not perturb a statistic that already advanced
  * (the same trade every sequential twin documents).
  */
object StreamingSprt {

  /** Bernoulli observation in arm `arm`; `x` ∈ {0, 1}. */
  case class Obs(arm: Long, event_id: Long, ts: Timestamp, x: Long)

  case class Decision(arm: Long, n_decide: Long, decision: String,
                      llr_bp: Long)

  case class St(c: Long, n: Long, decided: Boolean)

  private def micros(t: Timestamp): Long =
    t.getTime / 1000L * 1000000L + t.getNanos / 1000L

  private[graft] def updateKey(l1: Double, l0: Double, up: Double,
                               lo: Double)(
      key: Long, events: Iterator[Obs],
      state: GroupState[St]): Iterator[Decision] = {
    val wmMicros =
      try state.getCurrentWatermarkMs() * 1000L catch { case _: Throwable => Long.MinValue }
    var cur = state.getOption.getOrElse(St(0L, 0L, decided = false))
    val out = Seq.newBuilder[Decision]
    events.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
      if (!cur.decided && micros(e.ts) >= wmMicros) {
        val c = cur.c + e.x
        val n = cur.n + 1L
        val llr = (c * l1) + ((n - c) * l0)
        if (llr >= up || llr <= lo) {
          out += Decision(key, n,
            if (llr >= up) "accept_h1" else "accept_h0",
            math.floor(llr * 10000.0 + 0.5).toLong)
          cur = St(c, n, decided = true)
        } else cur = St(c, n, decided = false)
      }
    }
    state.update(cur)
    out.result().iterator
  }

  def decisions(events: Dataset[Obs], l1: Double, l0: Double,
                up: Double, lo: Double): Dataset[Decision] = {
    implicit val keyEnc = Encoders.scalaLong
    implicit val evEnc = Encoders.product[Obs]
    implicit val stEnc = Encoders.product[St]
    implicit val outEnc = Encoders.product[Decision]
    events.groupByKey(_.arm)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(updateKey(l1, l0, up, lo))
  }
}
