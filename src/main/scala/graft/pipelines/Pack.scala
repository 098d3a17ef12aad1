package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Best-fit sequence packing — the published fewer-truncations result
  * (best-fit-decreasing bin packing of whole documents into fixed token
  * budgets; Ding et al. 2024 report it removes nearly all document
  * splits that concat-and-chop packing inflicts). Where
  * [[Mixture.packSequences]] CHOPS the concatenated stream at budget
  * boundaries (every straddling doc is split), best-fit packs WHOLE
  * docs: sort descending by length, place each doc into the open bin
  * with the SMALLEST remaining capacity that still fits (ties → lowest
  * bin id), open a new bin when none fits. Only docs longer than the
  * budget itself are ever split (pre-chopped by the caller into
  * budget-sized pieces).
  *
  * Scale contract (the paper's own): packing runs CHUNK-WISE — the
  * caller groups by (source, shard) so each group is a bounded data
  * chunk, and groups pack independently in parallel. One keyed shuffle
  * with secondary sort ([[org.apache.spark.sql.KeyValueGroupedDataset
  * .flatMapSortedGroups]], the [[graft.operators.Recurrences]] machine),
  * then an O(log bins) tree probe per doc; per-task memory is the open
  * bin set — bounded by group_tokens/budget, which the shard bound
  * keeps small. The fold is deterministic (total order, deterministic
  * tie-breaks), so a DuckDB recursive CTE replays every placement
  * bit-for-bit: the packing is oracle-checkable, not heuristic-trusted.
  */
object Pack {

  /** Append `binCol` (0-based per group) and `posCol` (token offset
    * within the bin) to every row, under best-fit-decreasing packing of
    * `lenCol` into `budget`-token bins per `groupCols` group. Rows are
    * processed in (len DESC, sortCols ASC) order; `sortCols` must make
    * the order total within a group or placement is nondeterministic.
    * Every `lenCol` value must be in [1, budget] — pre-chop longer docs.
    */
  def bestFit(df: DataFrame, groupCols: Seq[String], lenCol: String,
              sortCols: Seq[Column], budget: Long,
              binCol: String = "bin_id", posCol: String = "bin_pos"): DataFrame =
    run(df, groupCols, lenCol, col(lenCol).desc +: sortCols, budget,
      binCol, posCol)

  /** Best-fit in the caller's `sortCols` order WITHOUT the
    * largest-first sort — the shape a STREAM can maintain (docs arrive,
    * they cannot be globally sorted by length first). Utilization is
    * below BFD's but every doc still packs whole;
    * [[graft.streaming.StreamingPack]] is proven equal to this form
    * when arrival order matches `sortCols`.
    */
  def bestFitArrival(df: DataFrame, groupCols: Seq[String], lenCol: String,
                     sortCols: Seq[Column], budget: Long,
                     binCol: String = "bin_id",
                     posCol: String = "bin_pos"): DataFrame =
    run(df, groupCols, lenCol, sortCols, budget, binCol, posCol)

  private def run(df: DataFrame, groupCols: Seq[String], lenCol: String,
                  sort: Seq[Column], budget: Long,
                  binCol: String, posCol: String): DataFrame = {
    require(budget > 0, "budget must be positive")
    val schema = df.schema
    Seq(binCol, posCol).foreach(c => require(!schema.fieldNames.contains(c),
      s"output column $c already exists in the input"))
    require(schema(lenCol).dataType == LongType,
      s"$lenCol must be LongType; got ${schema(lenCol).dataType}")
    val keyIdx = groupCols.map(schema.fieldIndex)
    val lenIdx = schema.fieldIndex(lenCol)
    val outSchema = schema.add(binCol, LongType, nullable = false)
      .add(posCol, LongType, nullable = false)
    val grouped = df.groupByKey { r: Row =>
      keyIdx.map(i => String.valueOf(r.get(i))).mkString("\u0000")
    }(Encoders.STRING)
    grouped.flatMapSortedGroups(sort: _*) {
      (_, it: Iterator[Row]) =>
        // remaining capacity -> open bin ids at that capacity; best fit
        // is one ceiling probe, ties resolved to the lowest bin id
        val byCap = new java.util.TreeMap[Long, java.util.TreeSet[Long]]
        var nBins = 0L
        it.map { r =>
          val len = r.getLong(lenIdx)
          require(len >= 1 && len <= budget,
            s"bestFit needs 1 <= $lenCol <= budget=$budget, got $len — " +
              "pre-chop longer docs into budget-sized pieces")
          val e = byCap.ceilingEntry(len)
          val (bin, capBefore) =
            if (e == null) { val b = nBins; nBins += 1; (b, budget) }
            else {
              val set = e.getValue
              val b = set.first()
              set.remove(b)
              if (set.isEmpty) byCap.remove(e.getKey)
              (b, e.getKey)
            }
          val capAfter = capBefore - len
          // full bins (capAfter == 0) are evicted, not re-inserted:
          // len >= 1 can never match cap 0, and keeping them would grow
          // per-task state to bins-ever-opened instead of open bins
          // (mirrors StreamingPack.updateKey's eviction)
          if (capAfter > 0)
            byCap.computeIfAbsent(capAfter,
              _ => new java.util.TreeSet[Long]).add(bin)
          Row.fromSeq(r.toSeq :+ bin :+ (budget - capBefore))
        }
    }(Encoders.row(outSchema))
  }
}
