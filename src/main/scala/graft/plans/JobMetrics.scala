package graft.plans

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Zero-extra-pass job metrics via `Dataset.observe`.
  *
  * The reference reports per-table progress as it writes
  * (`ReportProgress` EcomDestinationWriter.cs:2997, row counters in
  * `RunJob`). A naive Spark port would `count()` each frame — an extra
  * full pass per table. `observe` attaches aggregates to the existing
  * action: metrics are collected WHILE the write runs, for free.
  */
object JobMetrics {

  /** Attach row-count (+ null-count per key column) observation to a
    * frame; read the values from the returned Observation after the
    * caller's action completes.
    */
  def observed(df: DataFrame, name: String, keyCols: Seq[String] = Nil): (DataFrame, Observation) = {
    val obs = Observation(name)
    val aggs: Seq[Column] = count(lit(1)).as("rows") +:
      keyCols.map(c => sum(when(col(c).isNull, 1).otherwise(0)).as(s"null_$c"))
    (df.observe(obs, aggs.head, aggs.tail: _*), obs)
  }
}
