package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Golden-record survivorship — the MDM merge step the reference gestures
  * at with its merged-source values and default-fill ladder
  * (EcomDestinationWriter.cs:4453 GetMergedValue, :1546 language
  * fallback): when several feeds describe the same entity, each attribute
  * of the merged record takes the value from the most-preferred feed that
  * actually HAS one. Different attributes may survive from different
  * feeds — that per-column independence is what distinguishes
  * survivorship from "pick the best row".
  *
  * One keyed aggregate, no join: each column is a `max_by` over the
  * ordering struct (non-null flag first, then the caller's preference
  * order), so the whole merge is one shuffle with partial map-side
  * aggregation — at 100 TB this is the same cost as any groupBy, never a
  * per-source join cascade.
  */
object Survivorship {

  /** Merge duplicate rows per `keyCols` into one golden record.
    *
    * For each of `valueCols`, the surviving value comes from the row with
    * the lexicographically greatest (value-is-non-null, prefCols...) key —
    * i.e. non-null beats null, then `prefCols` decide (higher = more
    * preferred). `prefCols` must totally order rows within a key group
    * (include a unique tiebreaker if preferences can tie) — `max_by` over
    * tied keys is nondeterministic otherwise. A column null in every
    * source row stays null.
    */
  def goldenRecord(df: DataFrame, keyCols: Seq[String], prefCols: Seq[Column],
                   valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && valueCols.nonEmpty)
    val aggs = valueCols.map { v =>
      max_by(col(v), struct((col(v).isNotNull.cast("int") +: prefCols): _*)).as(v)
    }
    df.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
