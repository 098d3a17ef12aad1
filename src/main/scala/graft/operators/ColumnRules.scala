package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level mapping rules from the reference's writer.
  *
  * - `mergedValue`: several source columns mapped onto ONE destination
  *   column concatenate in mapping order (EcomDestinationWriter.cs:4453
  *   `GetMergedValue`); nulls contribute nothing.
  * - `prefixedId`: generated ids carry a type prefix over a dense counter
  *   ("ImportedPRICE" + n, EcomDestinationWriter.cs:1722; PRODx/GROUPx
  *   elsewhere) — compose with [[SurrogateKeys.assign]] for the counter.
  * - `withDefault`: constant fallback for null/blank values (default
  *   currency/language fill, EcomDestinationWriter.cs:1730,1546).
  */
object ColumnRules {

  def mergedValue(sources: Seq[Column]): Column =
    concat(sources.map(c => coalesce(c.cast("string"), lit(""))): _*)

  def prefixedId(prefix: String, counter: Column): Column =
    concat(lit(prefix), counter.cast("string"))

  def withDefault(c: Column, default: String): Column =
    when(c.isNull || trim(c.cast("string")) === "", lit(default)).otherwise(c)
}
