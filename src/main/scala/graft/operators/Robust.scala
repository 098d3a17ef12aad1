package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group cleaning of numeric feeds — winsorization (clamp to
  * in-group quantile cuts) and median imputation of missing values: the
  * statistical tier of the reference's default-value fill
  * (EcomDestinationWriter.cs:1546, 4426 fill CONSTANTS; a numeric feed
  * at corpus scale needs distribution-aware treatment the writer's
  * ScriptType rules can't express).
  *
  * Both use DISCRETE rank-selected quantiles — the `(n·q)⌈⌉`-th
  * smallest ACTUAL value, never interpolation arithmetic (the
  * q_mad_outliers rule: element selection is bit-exact cross-engine,
  * interpolated formulas differ in the last ulp) — so every clamped /
  * imputed cell is a value that existed in the group, and the whole
  * output hash-compares exactly.
  *
  * Shape: one sort-window per group (rank + windowed max-at-rank), no
  * self-joins; the mergeable `approx_percentile` sketch is the
  * documented scale path when groups are data-sized and cut exactness
  * can relax (same contract as q_mad_outliers / q_percentiles_approx).
  */
object Robust {

  /** Rank of the q-basis-point discrete quantile in a group of n:
    * ceil(n·q/10⁴), clamped to ≥ 1.
    */
  private def rankAt(n: Column, qBp: Int): Column =
    greatest(expr(s"(__n * $qBp + 9999) div 10000"), lit(1L))

  /** Per-row winsorization: `valueCol` clamped to the group's
    * [loBp, hiBp] discrete quantile cuts; adds `<value>_w` (clamped),
    * `clamped_lo`, `clamped_hi`. Null values pass through unclamped.
    */
  def winsorize(df: DataFrame, groupCols: Seq[String], valueCol: String,
                loBp: Int = 500, hiBp: Int = 9500): DataFrame = {
    require(loBp >= 0 && hiBp <= 10000 && loBp < hiBp, "need 0 <= lo < hi <= 10000")
    val wv = Window.partitionBy(groupCols.map(col): _*).orderBy(col(valueCol))
    val wg = Window.partitionBy(groupCols.map(col): _*)
    val v = col(valueCol)
    val ranked = df
      .withColumn("__nn", v.isNotNull)
      .withColumn("__rn", when(col("__nn"),
        row_number().over(wv.orderBy(v.asc_nulls_last))))
      .withColumn("__n", sum(col("__nn").cast("long")).over(wg))
      .withColumn("__lo", max(when(col("__rn") === rankAt(col("__n"), loBp), v)).over(wg))
      .withColumn("__hi", max(when(col("__rn") === rankAt(col("__n"), hiBp), v)).over(wg))
    ranked
      .withColumn(valueCol + "_w",
        when(v.isNull, v).otherwise(least(greatest(v, col("__lo")), col("__hi"))))
      .withColumn("clamped_lo", col("__nn") && v < col("__lo"))
      .withColumn("clamped_hi", col("__nn") && v > col("__hi"))
      .drop("__nn", "__rn", "__n", "__lo", "__hi")
  }

  /** Median imputation: null `valueCol` cells take the group's DISCRETE
    * lower median of the non-null values (`(n+1) div 2`-th smallest);
    * adds `<value>_f` (filled) and `imputed`. A group with no non-null
    * values keeps its nulls (flagged imputed = false).
    */
  def imputeGroupMedian(df: DataFrame, groupCols: Seq[String],
                        valueCol: String): DataFrame = {
    val v = col(valueCol)
    val wv = Window.partitionBy(groupCols.map(col): _*).orderBy(v.asc_nulls_last)
    val wg = Window.partitionBy(groupCols.map(col): _*)
    val ranked = df
      .withColumn("__nn", v.isNotNull)
      .withColumn("__rn", when(col("__nn"), row_number().over(wv)))
      .withColumn("__n", sum(col("__nn").cast("long")).over(wg))
      .withColumn("__med",
        max(when(col("__rn") === expr("(__n + 1) div 2"), v)).over(wg))
    ranked
      .withColumn(valueCol + "_f", coalesce(v, col("__med")))
      .withColumn("imputed", v.isNull && col("__med").isNotNull)
      .drop("__nn", "__rn", "__n", "__med")
  }
}
