package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level error tolerance: split instead of fail.
  *
  * The reference's `SkipFailingRows` mode (EcomProvider.cs:247) logs and
  * skips rows that fail validation instead of aborting the whole job
  * (writer-side row checks live in EcomDestinationWriter's per-row
  * guards). [[SchemaCheck.validate]] is the strict half — whole-frame,
  * fail-fast; this is the permissive half — per-row, keep-going: rows
  * failing any rule are diverted to a quarantine frame with a reason
  * column, rows passing all rules continue into the merge.
  *
  * Scale shape: one narrow, codegen'd projection computes the failed-rule
  * list per row; both outputs are filters over it — no shuffle, no UDF,
  * no second scan of the source (Spark evaluates each branch lazily off
  * the same narrow plan).
  */
object Quarantine {

  /** Split `df` into (valid, quarantined) by `rules` — each rule is
    * (reason, predicate) where the predicate is TRUE for GOOD rows. A
    * predicate evaluating to NULL counts as failing (an unparseable cell
    * is exactly what quarantine is for). The quarantine frame carries
    * `reasonCol`: the comma-joined names of every failed rule, in rule
    * order, so one pass reports all problems per row like SchemaCheck
    * reports all problems per frame.
    */
  def split(df: DataFrame, rules: Seq[(String, Column)],
            reasonCol: String = "quarantine_reason"): (DataFrame, DataFrame) = {
    require(rules.nonEmpty, "quarantine needs at least one rule")
    val failed = array_compact(array(rules.map { case (name, pred) =>
      when(!coalesce(pred, lit(false)), lit(name))
    }: _*))
    val tagged = df.withColumn("__failed", failed)
    val valid = tagged.filter(size(col("__failed")) === 0).drop("__failed")
    val quarantined = tagged.filter(size(col("__failed")) > 0)
      .withColumn(reasonCol, array_join(col("__failed"), ","))
      .drop("__failed")
    (valid, quarantined)
  }
}
