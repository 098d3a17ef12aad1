package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `graft.operators.Resample.forwardFill`: emit one
  * (key, grid_epoch, value_ff) row per elapsed grid slot as the
  * WATERMARK closes each slot, carrying the latest observation forward
  * across empty slots — the continuous "regular snapshot series from an
  * irregular change stream" a monitoring sink consumes.
  *
  * Why not a window aggregate: `groupBy(window(ts, step))` emits only
  * slots that CONTAIN events — the forward fill across empty slots (the
  * whole point of sample-and-hold) needs carried per-key state, hence
  * `flatMapGroupsWithState`.
  *
  * State per key stays SMALL on an infinite stream: the carried
  * (last-obs ts, value), the next slot to emit, and the pending
  * observations still above the watermark (bounded by the watermark
  * delay × event rate, the same bound every watermarked stateful op
  * carries). Slots emit only once their boundary is at or below the
  * watermark, so results are deterministic under reordering within the
  * watermark delay. Sub-watermark late rows never reach the update
  * function — Spark's stateful late-row filter drops them (verified in
  * the spec: an event landing exactly ON the watermark under a 0s delay
  * vanishes), so an emitted slot is never contradicted; should Spark's
  * filtering contract ever loosen, a late observation would still only
  * fold into the carry when newer than the carried one.
  *
  * A watermark jump over a long gap would emit gap/step rows in one
  * invocation; `maxSlotsPerInvoke` bounds that burst — remaining slots
  * emit on the next trigger via the timeout (state keeps `nextSlot`, no
  * slot is lost). The event-time timeout keeps firing while the carry
  * exists, so empty slots emit with NO new data arriving — clamped past
  * the watermark (the StatefulSessions stuck-stream lesson).
  */
object StreamingResample {

  case class Obs(key: Long, ts: Timestamp, value: Double)
  case class FillOut(key: Long, grid_epoch: Long, value_ff: Double)
  /** pendingT/pendingV: parallel arrays of not-yet-folded observations
    * (epoch seconds, value — max per ts). carried: latest folded obs.
    */
  case class FillState(pendingT: Seq[Long], pendingV: Seq[Double],
                       carriedT: Long, carriedV: Double, hasCarry: Boolean,
                       nextSlot: Long)

  def forwardFill(obs: Dataset[Obs], stepSeconds: Long,
                  maxSlotsPerInvoke: Int = 100000): Dataset[FillOut] = {
    require(stepSeconds > 0 && maxSlotsPerInvoke > 0)
    implicit val outEnc = Encoders.product[FillOut]
    implicit val stEnc = Encoders.product[FillState]
    obs.groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update(stepSeconds, maxSlotsPerInvoke))
  }

  private[graft] def update(step: Long, maxSlots: Int)(
      key: Long, events: Iterator[Obs],
      state: GroupState[FillState]): Iterator[FillOut] = {
    val wmSec = (try state.getCurrentWatermarkMs()
      catch { case _: Throwable => Long.MinValue }) match {
      case Long.MinValue => Long.MinValue
      case ms => math.floorDiv(ms, 1000L)
    }

    // fold new observations into pending (max value per exact ts — the
    // batch twin's deterministic tie rule)
    val pending = scala.collection.mutable.LongMap.empty[Double]
    val st0 = state.getOption.getOrElse(FillState(Nil, Nil, 0L, 0.0, false, Long.MinValue))
    st0.pendingT.zip(st0.pendingV).foreach { case (t, v) => pending(t) = v }
    events.foreach { o =>
      if (o.ts != null) {
        val t = math.floorDiv(o.ts.getTime, 1000L)
        pending(t) = pending.get(t).fold(o.value)(math.max(_, o.value))
      }
    }

    var (carriedT, carriedV, hasCarry) = (st0.carriedT, st0.carriedV, st0.hasCarry)
    // first slot: ceil-aligned to the earliest observation ever seen
    var nextSlot = st0.nextSlot
    if (nextSlot == Long.MinValue && pending.nonEmpty) {
      val mn = pending.keys.min
      nextSlot = mn + math.floorMod(step - math.floorMod(mn, step), step)
    }

    val out = Seq.newBuilder[FillOut]
    var emitted = 0
    if (nextSlot != Long.MinValue) {
      while (nextSlot <= wmSec && emitted < maxSlots) {
        // fold every pending obs at or before this slot into the carry
        val due = pending.keys.filter(_ <= nextSlot)
        if (due.nonEmpty) {
          val t = due.max
          if (!hasCarry || t > carriedT) {
            carriedT = t; carriedV = pending(t); hasCarry = true
          } else if (t == carriedT) {
            // same exact ts seen again (late duplicate): keep the batch
            // twin's max-per-ts tie rule
            carriedV = math.max(carriedV, pending(t))
          }
          due.foreach(pending.remove)
        }
        if (hasCarry) { out += FillOut(key, nextSlot, carriedV); emitted += 1 }
        nextSlot += step
      }
    }
    // a straggler below the carry can no longer affect any future slot
    if (hasCarry) pending.keys.filter(_ < carriedT).foreach(pending.remove)

    val ts = pending.keys.toArray.sorted
    state.update(FillState(ts.toSeq, ts.map(pending).toSeq,
      carriedT, carriedV, hasCarry, nextSlot))
    // keep firing at the next slot boundary (empty slots emit with no
    // new data); clamp past the watermark so a stale key never sets a
    // timeout Spark rejects
    if (nextSlot != Long.MinValue && wmSec != Long.MinValue)
      state.setTimeoutTimestamp(math.max(nextSlot * 1000L, wmSec * 1000L + 1))
    out.result().iterator
  }
}
