package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2: history-preserving merge.
  *
  * The reference's merge overwrites matched rows in place
  * (MoveDataToMainTable, EcomDestinationWriter.cs:3220); warehouse users
  * of the same import need the history-keeping variant — when a tracked
  * attribute changes, the open row is CLOSED (valid_to = batch time,
  * current = false) and a new open row is appended, so every past state
  * stays queryable as-of its interval.
  *
  * Shape: one full-outer join of the CURRENT slice against the batch on
  * the business key (history rows never join — they pass through
  * untouched), then three disjoint projections (kept / closed / new)
  * unioned. Null-safe comparison (`<=>`) on the tracked columns, so
  * null→value and value→null both count as changes.
  *
  * Contract: `dest` columns = keys ++ attributes ++ (fromCol, toCol,
  * curCol); `incoming` columns = keys ++ attributes (a current
  * snapshot of those keys).
  */
object Scd {

  def applyType2(dest: DataFrame, incoming: DataFrame, keys: Seq[String],
                 compareCols: Seq[String], batchTs: String,
                 fromCol: String = "valid_from", toCol: String = "valid_to",
                 curCol: String = "is_current"): DataFrame = {
    val attrs = dest.columns.toSeq.filterNot(c =>
      keys.contains(c) || c == fromCol || c == toCol || c == curCol)
    require(incoming.columns.toSet == (keys ++ attrs).toSet,
      s"incoming must carry exactly keys ++ attributes: ${(keys ++ attrs).sorted}")
    require(compareCols.forall(attrs.contains), "compareCols must be attributes")

    val cur = dest.filter(col(curCol))
    val hist = dest.filter(!col(curCol))
    val inTagged = incoming.select(keys.map(col) ++
      attrs.map(c => col(c).as(s"__in_$c")) :+ lit(1).as("__in_present"): _*)
    val j = cur.withColumn("__cur_present", lit(1))
      .join(inTagged, keys, "full_outer")
    val changed = col("__in_present").isNotNull && col("__cur_present").isNotNull &&
      compareCols.map(c => !(col(c) <=> col(s"__in_$c"))).reduce(_ || _)

    val destCols = dest.columns.toSeq
    val tsLit = lit(batchTs).cast(dest.schema(toCol).dataType)
    val kept = j.filter(col("__cur_present").isNotNull &&
        (col("__in_present").isNull || !changed))
      .select(destCols.map(col): _*)
    val closed = j.filter(changed)
      .select(destCols.map {
        case c if c == toCol => tsLit.as(toCol)
        case c if c == curCol => lit(false).as(curCol)
        case c => col(c)
      }: _*)
    val opened = j.filter(col("__in_present").isNotNull &&
        (col("__cur_present").isNull || changed))
      .select(destCols.map {
        case c if c == fromCol => lit(batchTs).cast(dest.schema(fromCol).dataType).as(fromCol)
        case c if c == toCol => lit(null).cast(dest.schema(toCol).dataType).as(toCol)
        case c if c == curCol => lit(true).as(curCol)
        case c if attrs.contains(c) => col(s"__in_$c").as(c)
        case c => col(c)
      }: _*)
    hist.unionByName(kept).unionByName(closed).unionByName(opened)
  }

  /** Time travel over a Type 2 history: the table as it stood at `ts` —
    * rows whose validity interval covers the instant, business columns
    * only (the as-of read every SCD2 consumer runs). Filter-only: no
    * join, no shuffle; at scale the predicate partition-prunes when the
    * history is laid out by `curCol` or a `toCol`-derived month.
    * q_scd2_snapshot proves the reconstruction is exact: the as-of read
    * at a pre-merge instant hash-matches the original table.
    */
  def snapshotAsOf(dest: DataFrame, ts: String,
                   fromCol: String = "valid_from", toCol: String = "valid_to",
                   curCol: String = "is_current"): DataFrame = {
    val t = lit(ts)
    dest.filter(col(fromCol) <= t && (col(toCol).isNull || col(toCol) > t))
      .drop(fromCol, toCol, curCol)
  }

  /** SCD Type 2 from a CHANGE FEED: unlike [[applyType2]] (one snapshot
    * per call), the batch may carry several versions of a key, each with
    * its own event time — every non-delete change becomes a history
    * interval [its ts, next change's ts), the key's last change stays
    * current unless it is a delete, and the previously-open destination
    * row closes at the key's FIRST change. One window over the feed
    * (lead per key) + the same current-slice join as applyType2; the
    * feed is trusted (no attribute comparison — standard CDC→SCD2
    * materialization).
    *
    * Contract: `changes` columns = keys ++ attrs ++ (tsCol, opCol);
    * at most one change per (keys, tsCol).
    */
  def applyType2Feed(dest: DataFrame, changes: DataFrame, keys: Seq[String],
                     tsCol: String, opCol: String, deleteOp: String = "D",
                     fromCol: String = "valid_from", toCol: String = "valid_to",
                     curCol: String = "is_current"): DataFrame = {
    val attrs = dest.columns.toSeq.filterNot(c =>
      keys.contains(c) || c == fromCol || c == toCol || c == curCol)
    require(changes.columns.toSet == (keys ++ attrs :+ tsCol :+ opCol).toSet,
      s"changes must carry exactly keys ++ attributes ++ ($tsCol, $opCol)")

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col(tsCol))
    val withNext = changes.withColumn("__next_ts", lead(col(tsCol), 1).over(w))
    val destCols = dest.columns.toSeq
    val toType = dest.schema(toCol).dataType
    val versions = withNext.filter(col(opCol) =!= deleteOp)
      .select(destCols.map {
        case c if c == fromCol => col(tsCol).cast(dest.schema(fromCol).dataType).as(fromCol)
        case c if c == toCol => col("__next_ts").cast(toType).as(toCol)
        case c if c == curCol => col("__next_ts").isNull.as(curCol)
        case c => col(c)
      }: _*)

    val firstTs = changes.groupBy(keys.map(col): _*)
      .agg(min(col(tsCol)).as("__first_ts"))
    val cur = dest.filter(col(curCol))
    val hist = dest.filter(!col(curCol))
    val joined = cur.join(firstTs, keys, "left_outer")
    val kept = joined.filter(col("__first_ts").isNull)
      .select(destCols.map(col): _*)
    val closed = joined.filter(col("__first_ts").isNotNull)
      .select(destCols.map {
        case c if c == toCol => col("__first_ts").cast(toType).as(toCol)
        case c if c == curCol => lit(false).as(curCol)
        case c => col(c)
      }: _*)
    hist.unionByName(kept).unionByName(closed).unionByName(versions)
  }

  /** Point-in-time join against a Type 2 history: each fact row joins
    * the dimension version whose validity interval covers the fact's OWN
    * timestamp — the query [[snapshotAsOf]] can't express (that
    * reconstructs ONE instant; here every row brings its instant). The
    * canonical warehouse correctness query: "price/segment/status as it
    * stood when the order was placed", immune to the
    * join-current-and-restate bug.
    *
    * Shape: ONE backward [[AsOf.joinAsOf]] on `fromCol` (one keyed
    * exchange, RUNNING-frame carry — never an interval explode or a
    * per-version equi-join fanout), then the matched version's `toCol`
    * is checked: a version that CLOSED before the fact's instant (the
    * key was retired) nulls the payload out rather than shipping a stale
    * version. With non-overlapping intervals this equals interval-
    * containment semantics exactly; under overlapping (corrupt)
    * intervals the latest-starting version wins deterministically.
    */
  def pitJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
              factTs: String, payloadCols: Seq[String],
              fromCol: String = "valid_from", toCol: String = "valid_to",
              prefix: String = "dim_"): DataFrame = {
    require(payloadCols.nonEmpty, "pitJoin needs dimension payload columns")
    val right = dim.select(
      (keys.map(col) :+ col(fromCol).as(factTs) :+ col(toCol).as("__vt")) ++
        payloadCols.map(col): _*)
    val joined = AsOf.joinAsOf(fact, right, keys, factTs,
      payloadCols :+ "__vt", prefix = "__pit_")
    val stale = col("__pit___vt").isNotNull && col("__pit___vt") <= col(factTs)
    payloadCols.foldLeft(joined) { case (df, c) =>
      df.withColumn(s"$prefix$c",
          when(stale, lit(null)).otherwise(col(s"__pit_$c")))
        .drop(s"__pit_$c")
    }.drop("__pit___vt")
  }
}
