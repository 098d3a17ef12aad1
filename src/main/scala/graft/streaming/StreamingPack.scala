package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming best-fit sequence packing — the stream twin of
  * [[graft.pipelines.Pack.bestFitArrival]]: open bins per pack group
  * live in the state store, so a bin partially filled by one
  * micro-batch keeps filling in later ones. The continuous-crawl shape:
  * documents arrive forever, training sequences ship as they fill.
  *
  * Order contract: docs pack in `doc_id` order WITHIN each batch,
  * arrival order across batches — exactly
  * [[graft.pipelines.Pack.bestFitArrival]] when global doc_id order
  * respects batch boundaries (StreamingPackSpec feeds split batches and
  * proves stream == batch). The largest-first sort of batch BFD cannot
  * exist on a stream; this is the price of incrementality, and every
  * doc still packs WHOLE.
  *
  * State: per group, the total bin count plus the (id, remaining cap)
  * of bins that can still fit the smallest possible doc — FULL bins
  * (cap 0) leave the state the moment they fill, so state holds only
  * open bins. Like the batch operator, callers bound groups (the
  * chunk-wise shard contract) — state per group is open-bin-count
  * sized, and the group key bounds it.
  */
object StreamingPack {

  case class Doc(grp: String, doc_id: Long, len: Long)
  case class Placed(grp: String, doc_id: Long, len: Long,
                    bin_id: Long, bin_pos: Long)
  /** nBins = bins ever opened (ids are dense 0-based); ids/caps = the
    * still-open bins. Public: encoder codegen needs it.
    */
  case class Bins(nBins: Long, ids: Array[Long], caps: Array[Long])

  private[graft] def updateKey(budget: Long)(
      key: String, docs: Iterator[Doc],
      state: GroupState[Bins]): Iterator[Placed] = {
    val prev = state.getOption.getOrElse(Bins(0L, Array.empty, Array.empty))
    var nBins = prev.nBins
    // capacity -> open bin ids; ties to the lowest id, the batch rule
    val byCap = new java.util.TreeMap[Long, java.util.TreeSet[Long]]
    val capOf = scala.collection.mutable.HashMap.empty[Long, Long]
    prev.ids.indices.foreach { i =>
      byCap.computeIfAbsent(prev.caps(i), _ => new java.util.TreeSet[Long])
        .add(prev.ids(i))
      capOf(prev.ids(i)) = prev.caps(i)
    }
    val placed = docs.toSeq.sortBy(_.doc_id).map { d =>
      require(d.len >= 1 && d.len <= budget,
        s"StreamingPack needs 1 <= len <= budget=$budget, got ${d.len} — " +
          "pre-chop longer docs into budget-sized pieces")
      val e = byCap.ceilingEntry(d.len)
      val (bin, capBefore) =
        if (e == null) { val b = nBins; nBins += 1; (b, budget) }
        else {
          val set = e.getValue
          val b = set.first()
          set.remove(b)
          if (set.isEmpty) byCap.remove(e.getKey)
          (b, e.getKey)
        }
      val capAfter = capBefore - d.len
      if (capAfter > 0) {
        byCap.computeIfAbsent(capAfter, _ => new java.util.TreeSet[Long]).add(bin)
        capOf(bin) = capAfter
      } else capOf.remove(bin) // full: evict from state permanently
      Placed(d.grp, d.doc_id, d.len, bin, budget - capBefore)
    }
    val open = capOf.toArray.sortBy(_._1)
    state.update(Bins(nBins, open.map(_._1), open.map(_._2)))
    placed.iterator
  }

  /** Placements from a (batch or streaming) [[Doc]] Dataset; on a
    * stream write in Append mode. Bins never time out — a pack group is
    * a bounded chunk by the caller's contract, and an open bin must
    * stay fillable for the group's whole lifetime.
    */
  def pack(docs: Dataset[Doc], budget: Long): Dataset[Placed] = {
    require(budget > 0, "budget must be positive")
    implicit val keyEnc = Encoders.STRING
    implicit val plEnc = Encoders.product[Placed]
    implicit val stEnc = Encoders.product[Bins]
    docs.groupByKey(_.grp)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(updateKey(budget))
  }
}
