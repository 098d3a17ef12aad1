package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** FIFO layer matching over a movement ledger: match each issue
  * (consumption) against the oldest unconsumed receipts of its key —
  * the costing/aging primitive behind FIFO inventory valuation, lot
  * consumption tracking, and queue-latency attribution. The
  * reference's stock handling walks rows mutating per-part state
  * (EcomProvider.cs:849's writer-state loop); declaratively the
  * matching IS an interval overlap: with per-key cumulative unit
  * ranges [hi−q, hi) on each side independently, receipt r supplies
  * issue i exactly `min(r.hi, i.hi) − max(r.lo, i.lo)` units whenever
  * the ranges overlap — the classic prefix-sum reformulation that
  * turns a sequential scan into ONE equi-join.
  *
  * All arithmetic is BIGINT on integral quantities: cumulative ranges,
  * overlap widths, everything exact and oracle-replayable.
  *
  * Shape: two keyed windows (one per side, same exchange shape) + one
  * equi-join on the keys with the overlap predicate evaluated inside
  * the join. Per-key candidate work is r_k·i_k pairs (filtered to the
  * ≤ r_k+i_k−1 true layers); movement counts per key are bounded in a
  * real ledger — a single-key pathological ledger should pre-split on
  * coarse cum-range buckets first (the RangeJoin bucketing idea)
  * before matching.
  */
object Ledger {

  /** @param moves        one ledger of movements, receipts and issues mixed
    * @param keys         the ledger key (part/SKU/account)
    * @param orderCols    total order within a key (FIFO time order)
    * @param qtyCol       LongType positive quantity
    * @param isReceiptCol BooleanType side indicator
    * @return (keys..., r_seq, i_seq, matched_q): issue `i_seq` consumes
    *         `matched_q` units of receipt `r_seq` (both 1-based per-key
    *         per-side sequence numbers in FIFO order). Issues beyond
    *         total receipts (shortage) and receipt tails beyond total
    *         issues (ending stock) simply have no matching row.
    */
  def fifoMatch(moves: DataFrame, keys: Seq[String], orderCols: Seq[String],
                qtyCol: String, isReceiptCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols.map(col): _*)
    // negative quantities would break cum-range monotonicity silently
    val q = when(col(qtyCol) < 0, raise_error(concat(
      lit(s"Ledger.fifoMatch: negative quantity in $qtyCol: "), col(qtyCol))))
      .otherwise(col(qtyCol))
    def side(receipt: Boolean) = moves
      .filter(if (receipt) col(isReceiptCol) else !col(isReceiptCol))
      .withColumn("__hi", sum(q).over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
      .withColumn("__lo", col("__hi") - q)
      .withColumn("__seq", row_number().over(w).cast("long"))
      .select(keys.map(col) :+ col("__lo") :+ col("__hi") :+ col("__seq"): _*)
    val r = side(true)
    val i = side(false)
    r.as("r").join(i.as("i"),
        keys.map(k => col(s"r.$k") === col(s"i.$k"))
          .reduce(_ && _) &&
          col("r.__hi") > col("i.__lo") && col("i.__hi") > col("r.__lo"))
      .select(keys.map(k => col(s"r.$k")) ++ Seq(
        col("r.__seq").as("r_seq"), col("i.__seq").as("i_seq"),
        (least(col("r.__hi"), col("i.__hi")) -
          greatest(col("r.__lo"), col("i.__lo"))).as("matched_q")): _*)
  }
}
