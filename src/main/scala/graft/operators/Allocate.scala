package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact integer allocation (proration): split a per-key integer amount
  * across the key's rows proportionally to a non-negative integer
  * weight so the parts SUM EXACTLY to the amount — the
  * largest-remainder (Hamilton) method. The reference prorates
  * order-level discounts/charges onto lines the same way a header
  * rebate lands on order lines (EcomOrder line context,
  * EcomProvider.cs:849's per-row writer state): naive
  * `round(amount * w/T)` leaks cents (sums drift from the header
  * amount); largest-remainder is the published fix.
  *
  * Semantics per key: base_i = floor(A*w_i/T), then the D = A - Σbase
  * leftover units go one each to the D rows with the largest
  * remainders (A*w_i mod T), ties broken by `tiebreak`. If every
  * weight is zero the split degrades to equal shares (weight 1).
  *
  * Fully declarative — two window functions over ONE hash partitioning
  * (sum + rank reuse the same exchange; no fold, no state): scales as
  * a single keyed shuffle, and amounts/weights stay BIGINT throughout
  * (A*w_i must fit a long: |A| * max w < 2^63 — cents-scale money is
  * ~10 orders of magnitude below the bound).
  */
object Allocate {

  def largestRemainder(df: DataFrame, keys: Seq[String], weightCol: String,
                       amountCol: String, tiebreak: Seq[String],
                       outCol: String = "alloc_q"): DataFrame = {
    require(tiebreak.nonEmpty, "tiebreak columns are required for determinism")
    val w = Window.partitionBy(keys.map(col): _*)
    // negative weights make "remainder" meaningless — fail loudly per row
    val wt = when(col(weightCol) < 0,
      raise_error(concat(lit(s"Allocate: negative weight in $weightCol: "),
        col(weightCol)))).otherwise(col(weightCol))
    val total = sum(wt).over(w)
    // all-zero weights: equal split (weight 1 over n rows)
    val n = count(lit(1)).over(w)
    val w1 = when(total === 0, lit(1L)).otherwise(wt)
    val t1 = when(total === 0, n).otherwise(total)
    // the amount is a PER-KEY quantity carried on every row; a key whose
    // rows disagree would silently prorate garbage — fail loudly instead
    // (same exchange: min/max ride the existing per-key window)
    val amt = when(min(col(amountCol)).over(w) =!= max(col(amountCol)).over(w),
      raise_error(concat(lit(s"Allocate: $amountCol is not constant within a key "),
        lit("(it must be the key-level amount on every row)"))))
      .otherwise(col(amountCol))
    // FLOOR division with the amount×weight product in DECIMAL(38,0):
    // the pure-BIGINT product overflows exactly in the 100 TB regime
    // (a 10¹¹-cent region amount × a 10¹⁰ weight is 10²¹ — caught by
    // the forecast-reconciliation sf0.1 gate). Subtracting the
    // non-negative pmod keeps the division exact; floor semantics keep
    // negative amounts (refunds) correct: bases round DOWN, so the
    // deficit stays in [0, n).
    def dec(c: Column) = c.cast("decimal(38,0)")
    val prod = dec(amt) * dec(w1)
    val rem = pmod(prod, dec(t1))
    val base = ((prod - rem) / dec(t1)).cast("long")
    val rankW = Window.partitionBy(keys.map(col): _*)
      .orderBy(rem.desc +: tiebreak.map(col(_).asc): _*)
    val deficit = (amt - sum(base).over(w)).cast("long")
    df.withColumn(outCol,
      base + when(row_number().over(rankW) <= deficit, 1L).otherwise(0L))
  }
}
