package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact key-based deduplication.
  *
  * The reference's `Write(row, mapping, discardDuplicates)` drops rows whose
  * key columns were already seen in the batch — i.e. keep-FIRST in arrival
  * order (EcomDestinationWriter.cs:1042). Arrival order is meaningless on a
  * distributed engine, so the Spark-native contract is keep-first under an
  * explicit deterministic ordering: `row_number() = 1` per key partition.
  * One shuffle on the key; no driver state (the reference keeps an in-memory
  * hash per table — at 100 TB that becomes the groupBy below).
  */
object Dedup {

  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Distinct on full row — reference's relation-table dedup
    * (EcomDestinationWriter.cs:2916 checks existing relation rows before add).
    */
  def distinctRows(df: DataFrame): DataFrame = df.distinct()
}
