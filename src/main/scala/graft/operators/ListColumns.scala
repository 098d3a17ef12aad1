package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pack 1:N relations into delimited list columns and back.
  *
  * Source side the reference emits `STUFF((SELECT ',"'+x+'"' ... FOR XML
  * PATH('')),1,1,'')` — a comma-separated, double-quoted list per outer row
  * (EcomSourceReader.cs:336 Shops, :348 ParentGroups, :393 Groups, :434
  * VariantOptions). Destination side it splits those lists back into
  * relation rows with `SplitOnComma` (EcomDestinationWriter.cs:1508) and
  * per-element reference rows (:1413 groups, :2013 parent groups).
  *
  * Spark-native: pack = groupBy(key).agg(array_join(array_sort(collect_list)))
  * — one shuffle, map-side partial aggregation, deterministic order via the
  * sort (SQL Server's FOR XML PATH order is undefined; we pin it).
  * Unpack = split + explode — narrow, no shuffle.
  *
  * HOT-KEY BOUND IS OUTPUT-INHERENT: pack's aggregation state per key is
  * the key's full element list — but unlike the bucket builders the repo
  * bounds with [[graft.functions.BoundedDistinctSet]] (where the list is
  * an INTERMEDIATE a cap can truncate), here the packed list IS the
  * declared output: a key with 50M relation rows contracts to a
  * 50M-element string, so no aggregate redesign can hold less state than
  * that output (the reference has the same bound — its STUFF/FOR XML
  * PATH subquery materializes the same list per outer row,
  * EcomSourceReader.cs:336). A key that large is a data-model smell, not
  * an engine limit: pre-flight with [[Diagnostics.keySkew]] (any
  * high-`skew_x` key here becomes a proportionally huge output cell) and
  * keep such relations as rows, or cap them upstream with an explicit
  * business rule. OperatorsSpec plants a hot key and shows output size
  * tracks the key's relation count one-for-one.
  */
object ListColumns {

  /** Sorted, quoted, comma-joined list of `value` per `keys` row. */
  def pack(df: DataFrame, keys: Seq[String], value: Column, as: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(array_join(array_sort(collect_list(concat(lit("\""), value, lit("\"")))), ",").as(as))

  /** Pack ordered by a separate sort column — the reference emits
    * parallel list columns that must align element-for-element (Groups
    * ordered with GroupSorting, Shops with ShopSorting:
    * EcomSourceReader.cs:393,399,336,340). Calling this twice with the
    * same `order` (once for the value, once for the sort key itself)
    * yields aligned lists.
    */
  def packOrdered(df: DataFrame, keys: Seq[String], value: Column,
                  order: Column, as: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(array_join(
        transform(array_sort(collect_list(struct(order.as("o"), value.as("v")))),
          s => concat(lit("\""), s.getField("v").cast("string"), lit("\""))), ",").as(as))

  /** Split a delimited list column into one row per element. */
  def unpack(df: DataFrame, listCol: Column, delimiter: String, as: String): DataFrame =
    df.withColumn(as, explode(split(listCol, java.util.regex.Pattern.quote(delimiter))))

  /** Split with element position (relation-sorting columns like
    * GroupSorting travel as parallel lists in the reference).
    */
  def unpackWithPos(df: DataFrame, listCol: Column, delimiter: String,
                    posAs: String, as: String): DataFrame = {
    val exploded = posexplode(split(listCol, java.util.regex.Pattern.quote(delimiter)))
    df.select(col("*"), exploded.as(Seq(posAs, as)))
  }
}
