package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequential surrogate-id assignment for keyless incoming rows.
  *
  * The reference allocates ids by reading the current max from the id
  * tables and incrementing a driver-side counter per new row
  * (EcomDestinationWriter.cs:657 `GetLastId`, PRODx/GROUPx counters).
  * A driver counter is a scale bottleneck; the Spark-native contract is
  * `maxExisting + dense sequence under a deterministic total order`.
  *
  * Implementation: range-repartition + in-partition sort on the order key,
  * then `zipWithIndex` (two distributed passes, no single-partition window
  * — `row_number() OVER (ORDER BY ...)` would funnel 100 TB through one
  * task). Result is identical to the single-partition window, without the
  * bottleneck.
  */
object SurrogateKeys {

  def assign(df: DataFrame, orderBy: Seq[Column], idCol: String,
             startAt: Long = 1L): DataFrame = {
    val sorted = df.repartitionByRange(orderBy: _*).sortWithinPartitions(orderBy: _*)
    val schema = sorted.schema.add(idCol, LongType, nullable = false)
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (startAt + i))
    }
    df.sparkSession.createDataFrame(indexed, schema)
  }
}
