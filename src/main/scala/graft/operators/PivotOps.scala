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

  /** Dynamic pivot: column set DISCOVERED from the data, the way the
    * reference discovers `ProductCategory|<cat>|<field>` columns from the
    * EcomProductCategoryFieldValue rows themselves (GetProductCategoryFields,
    * EcomSourceReader.cs:56-81, applied :267-279). Two passes: a distinct
    * scan finds the value set (sorted, so the output schema is
    * deterministic for a given dataset), then the same single-shuffle
    * pivot as [[toWide]].
    *
    * `maxColumns` is a hard cap, not a silent truncation: pivoting an
    * unbounded key column into the schema is how a bad feed turns into a
    * million-column table, so exceeding the cap fails with the count.
    * The discovery collect is bounded by the cap (limit cap+1) — at
    * 100 TB the distinct runs distributed and only ≤cap+1 values ever
    * reach the driver.
    */
  def toWideDynamic(df: DataFrame, keys: Seq[String], keyCol: String,
                    agg: Column, maxColumns: Int = 1000): DataFrame = {
    val values = df.select(col(keyCol).cast("string")).distinct()
      .filter(col(keyCol).isNotNull) // a null key never becomes a column
      .orderBy(col(keyCol)).limit(maxColumns + 1)
      .collect().map(_.getString(0)).toSeq
    require(values.size <= maxColumns,
      s"pivot on $keyCol discovered more than $maxColumns distinct values")
    df.groupBy(keys.map(col): _*).pivot(keyCol, values).agg(agg)
  }

  /** Wide → key/value rows via stack(); null cells dropped, mirroring the
    * reference writing only present field values.
    *
    * `dropEmpty` is the reference's `IgnoreEmptyCategoryFieldValues`
    * switch (EcomProvider.cs:257, acting at
    * EcomDestinationWriter.cs:1494's IsNullOrEmpty guard): when ON, an
    * empty-STRING cell is treated as absent too — the key/value row is
    * not emitted, so a stale destination value survives instead of
    * being overwritten with "". Non-string cells are unaffected (their
    * string form is never empty).
    */
  def toLong(df: DataFrame, keys: Seq[String], valueCols: Seq[String],
             keyOut: String, valueOut: String,
             dropEmpty: Boolean = false): DataFrame = {
    val stackArgs = valueCols.map(c => s"'$c', `$c`").mkString(", ")
    val long = df.selectExpr(keys :+
      s"stack(${valueCols.size}, $stackArgs) as ($keyOut, $valueOut)": _*)
      .filter(col(valueOut).isNotNull)
    if (dropEmpty) long.filter(col(valueOut).cast("string") =!= lit(""))
    else long
  }
}
