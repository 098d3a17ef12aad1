package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Running COUNT(DISTINCT value) OVER (PARTITION BY keys ORDER BY time) —
  * the one window aggregate Spark has no native form for.
  *
  * Composition: a first-occurrence flag (lag over VALUE-major order —
  * the flagged row is the value's earliest by `timeOrder`) then a
  * running sum in time order. Both windows share the SAME partition
  * keys, so the physical plan is ONE exchange with two in-partition
  * sorts — the flag pass costs no second shuffle (PLANS.md
  * q_window_count_distinct).
  *
  * NULL values are not counted, matching SQL COUNT(DISTINCT). The
  * `isNotNull` guard suffices because nulls sort FIRST in value-major
  * order: a `lag = null` at the head of a null run can only mean
  * partition start or "previous row was a null value" — either way the
  * current (non-null) row is its value's first occurrence.
  *
  * `timeOrder` must be deterministic (include a unique tiebreaker);
  * ties across rows would otherwise make the running value
  * partitioning-dependent.
  */
object RunningDistinct {

  def countDistinct(df: DataFrame, partitionCols: Seq[String], valueCol: String,
                    timeOrder: Seq[Column], as: String = "n_distinct"): DataFrame = {
    val v = col(valueCol)
    val byValue = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(v +: timeOrder: _*)
    val byTime = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(timeOrder: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(v, 1).over(byValue)
    df.withColumn("__first",
        when(v.isNotNull.and(prev.isNull.or(prev =!= v)), 1L).otherwise(0L))
      .withColumn(as, sum(col("__first")).over(byTime))
      .drop("__first")
  }
}
