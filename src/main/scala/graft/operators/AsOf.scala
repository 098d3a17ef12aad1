package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the LATEST right row
  * with `right.ts <= left.ts` per key — price-as-of-order-time, config
  * state at event time, and every other temporal lookup a data-
  * integration pipeline needs. Spark has no native ASOF JOIN; the naive
  * range join explodes to |left|·|right| per key before filtering.
  *
  * Realization: the union-sort carry — tag both sides, ONE shuffle on
  * the key, sort each partition by (ts, side) with right rows first at
  * equal timestamps (inclusive match), then carry the last non-null
  * right payload forward with an unbounded-preceding `last(ignoreNulls)`
  * window and keep only left rows. Cost is one keyed shuffle + one sort
  * over |left|+|right| — no pair explosion, skew bounded by the hottest
  * key's combined rows (salt upstream if a single key dominates).
  *
  * Left rows with no prior right row keep null payloads (left-join
  * semantics). Right payload columns are prefixed to avoid collisions.
  * The payload travels as ONE struct so the carry always yields all
  * columns from the SAME (latest) right row — per-column carries would
  * reach further back for columns that happen to be null. `right`
  * should be unique per (keys, ts); pre-aggregate if it isn't (ties at
  * the same timestamp have no defined winner).
  */
object AsOf {

  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, payloadCols: Seq[String],
               prefix: String = "asof_"): DataFrame = {
    require(payloadCols.nonEmpty, "as-of join needs right payload columns")
    val leftExtra = left.columns.toSeq.filterNot(c => keys.contains(c) || c == tsCol)
    val payloadStruct = struct(payloadCols.map(col): _*)
    // a right row with a null timestamp can never be "at or before"
    // anything — but nulls sort FIRST, so unfiltered it would carry into
    // every left row; left rows with null ts sort first themselves and
    // naturally get null payloads
    val taggedRight = right.filter(col(tsCol).isNotNull).select(
      (keys.map(col) :+ col(tsCol) :+ payloadStruct.as("__p")) ++
        leftExtra.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        lit(0).as("__side"): _*)
    val nullPayload = lit(null).cast(
      org.apache.spark.sql.types.StructType(payloadCols.map(c => right.schema(c))))
    val taggedLeft = left.select(
      (keys.map(col) :+ col(tsCol) :+ nullPayload.as("__p")) ++
        leftExtra.map(col) :+
        lit(1).as("__side"): _*)
    // right (side 0) sorts BEFORE left (side 1) at equal ts => inclusive
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedRight.unionByName(taggedLeft)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
    payloadCols.foldLeft(carried.filter(col("__side") === 1)) {
      case (df, c) => df.withColumn(s"$prefix$c", col("__p").getField(c))
    }.drop("__p", "__side")
  }
}
