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

  /** `direction`: "backward" (latest right at-or-before, the default),
    * "forward" (earliest right at-or-after), or "nearest" (whichever of
    * the two is closer in time; exact ties prefer backward). All three
    * share the single-shuffle union shape — nearest runs two RUNNING
    * frames (ascending + descending in-partition sorts) over one keyed
    * exchange, not two joins.
    */
  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, payloadCols: Seq[String],
               prefix: String = "asof_",
               direction: String = "backward"): DataFrame = {
    require(payloadCols.nonEmpty, "as-of join needs right payload columns")
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got $direction")
    val leftExtra = left.columns.toSeq.filterNot(c => keys.contains(c) || c == tsCol)
    // carry the right timestamp inside the payload struct: forward/nearest
    // need the matched row's distance, and backward gets it for free
    val payloadStruct = struct((col(tsCol).as("__rts") +:
      payloadCols.map(col)): _*)
    // a right row with a null timestamp can never be "at or before"
    // anything — but nulls sort FIRST, so unfiltered it would carry into
    // every left row; left rows with null ts sort first themselves and
    // naturally get null payloads
    val taggedRight = right.filter(col(tsCol).isNotNull).select(
      (keys.map(col) :+ col(tsCol) :+ payloadStruct.as("__p")) ++
        leftExtra.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        lit(0).as("__side"): _*)
    val nullPayload = lit(null).cast(
      org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("__rts",
          right.schema(tsCol).dataType) +:
          payloadCols.map(c => right.schema(c))))
    val taggedLeft = left.select(
      (keys.map(col) :+ col(tsCol) :+ nullPayload.as("__p")) ++
        leftExtra.map(col) :+
        lit(1).as("__side"): _*)
    // right (side 0) sorts BEFORE left (side 1) at equal ts => the
    // backward frame is inclusive. EVERY carry is a RUNNING
    // [unboundedPreceding, currentRow] frame: Spark executes that frame
    // in O(1) per row (one accumulating pass), whereas a
    // [currentRow, unboundedFollowing] frame is rebuilt from the current
    // row to the partition end for EVERY row — O(n²) on a hot key, a
    // silent wall-clock cliff at scale. The forward carry therefore
    // scans the partition in DESCENDING ts order (last right seen on the
    // way down = earliest right at-or-after), costing a second in-
    // partition sort over the SAME keyed exchange instead of a quadratic
    // frame. Desc order keeps right (0) before left (1) at equal ts, so
    // forward stays inclusive; backward already matches equal-ts rows.
    val base = Window.partitionBy(keys.map(col): _*)
    val union = taggedRight.unionByName(taggedLeft)
    val wBack = base.orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = base.orderBy(col(tsCol).desc, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = direction match {
      case "backward" =>
        union.withColumn("__p", last(col("__p"), ignoreNulls = true).over(wBack))
      case "forward" =>
        // a null-ts left row sorts to the desc-scan TAIL where the
        // running carry holds the earliest right — guard it to the
        // contractual null payload
        union.withColumn("__p", when(col(tsCol).isNull, nullPayload)
          .otherwise(last(col("__p"), ignoreNulls = true).over(wFwd)))
      case "nearest" =>
        // carries land as COLUMNS first: referencing the window
        // expression inline in the when-chain would plan one window
        // expression per reference (4 identical running accumulators
        // per carry instead of 1)
        val withCarries = union
          .withColumn("__back", last(col("__p"), ignoreNulls = true).over(wBack))
          .withColumn("__fwd", last(col("__p"), ignoreNulls = true).over(wFwd))
        // distances in epoch units; ties prefer backward (an equal-ts
        // right row is both carries' match at distance 0 — same row
        // either way). Null-ts left rows guarded as in forward.
        val db = col(tsCol).cast("double") -
          col("__back").getField("__rts").cast("double")
        val df_ = col("__fwd").getField("__rts").cast("double") -
          col(tsCol).cast("double")
        withCarries.withColumn("__p",
          when(col(tsCol).isNull, nullPayload)
            .when(col("__back").isNull, col("__fwd"))
            .when(col("__fwd").isNull, col("__back"))
            .when(df_ < db, col("__fwd")).otherwise(col("__back")))
          .drop("__back", "__fwd")
    }
    payloadCols.foldLeft(carried.filter(col("__side") === 1)) {
      case (df, c) => df.withColumn(s"$prefix$c", col("__p").getField(c))
    }.drop("__p", "__side")
  }
}
