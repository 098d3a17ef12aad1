package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parent→child field propagation within a key group.
  *
  * The reference fills variant rows from their parent product row after
  * import (`UpdateVariantFieldsInProducts` EcomDestinationWriter.cs:3691,
  * `UpdateFieldsInExistingProductsWithVariantIDs` :3727): for each product
  * id, the row with the empty variant id is the parent, and null fields on
  * variant rows inherit the parent's value.
  *
  * Spark-native: a window per key group; parent value = `max(when(isParent,
  * col))` over the group (no self-join, one shuffle on the key).
  */
object Propagate {

  def fillFromParent(df: DataFrame, keys: Seq[String], isParent: Column,
                     fields: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    fields.foldLeft(df) { (d, f) =>
      d.withColumn(f, coalesce(col(f), max(when(isParent, col(f))).over(w)))
    }
  }
}
