package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key/value ↔ wide-column pivoting.
  *
  * The reference pivots `EcomProductCategoryFieldValue` rows into
  * `ProductCategory|<cat>|<field>` columns with `PIVOT (max(FieldValueValue)
  * FOR fieldKey IN (...))` (EcomSourceReader.cs:267-279), and unpivots on
  * the destination side when writing category values back row-wise
  * (EcomDestinationWriter.cs:2376 WriteCategoyFieldValues).
  *
  * Spark-native: `groupBy(keys).pivot(keyCol, explicitValues).agg(max)` —
  * explicit values skip the extra distinct pass AND make the output schema
  * deterministic (required both for the oracle compare and for stable
  * production schemas). One shuffle on the group keys.
  */
object PivotOps {

  def toWide(df: DataFrame, keys: Seq[String], keyCol: String,
             agg: Column, values: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).pivot(keyCol, values).agg(agg)

  /** Wide → key/value rows via stack(); null cells dropped, mirroring the
    * reference writing only present field values.
    */
  def toLong(df: DataFrame, keys: Seq[String], valueCols: Seq[String],
             keyOut: String, valueOut: String): DataFrame = {
    val stackArgs = valueCols.map(c => s"'$c', `$c`").mkString(", ")
    df.selectExpr(keys :+
      s"stack(${valueCols.size}, $stackArgs) as ($keyOut, $valueOut)": _*)
      .filter(col(valueOut).isNotNull)
  }
}
