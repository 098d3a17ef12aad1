package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: left rows matched to right rows whose
  * [lo, hi] interval contains the left value — price-band
  * classification, time-interval enrichment, IP-range lookup.
  *
  * Spark plans a naive `l.v BETWEEN r.lo AND r.hi` as
  * BroadcastNestedLoopJoin (every left row probes every right row —
  * |L|·|R| comparisons even when the broadcast fits). The scale shape
  * here is BUCKETIZATION: each right interval explodes into the
  * fixed-width buckets it overlaps, the join becomes an EQUI-join on
  * the bucket id (hash join, shuffle on bucket), and the exact BETWEEN
  * predicate verifies inside the bucket. Explode factor =
  * ⌈interval span / bucketWidth⌉, so pick `bucketWidth` near the
  * typical interval length — each left row then probes ~1-2 buckets of
  * candidates instead of all |R|.
  *
  * Inner-join semantics over numeric (long-compatible) bounds;
  * intervals are inclusive on both ends and may overlap (a left row
  * matches every containing interval).
  */
object RangeJoin {

  /** `maxSpanBuckets` guards the per-row explode factor: ONE interval
    * encoding "valid forever" as hi = Long.MaxValue would ask for a
    * ~10¹⁴-element sequence and kill the job with an array-size error
    * (or OOM) — an open-ended sentinel is a modeling bug this surfaces
    * loudly, per offending row, instead of dying inside sequence().
    * Clamp sentinels to the observed left max (or raise the cap
    * deliberately) when wide intervals are genuine.
    */
  def byBucket(left: DataFrame, right: DataFrame, valueCol: String,
               loCol: String, hiCol: String, bucketWidth: Long,
               maxSpanBuckets: Int = 1 << 20): DataFrame = {
    require(bucketWidth > 0)
    require(maxSpanBuckets > 0)
    val loB = floor(col(loCol).cast("double") / bucketWidth).cast("long")
    val hiB = floor(col(hiCol).cast("double") / bucketWidth).cast("long")
    // the guard feeds the sequence bound, so it cannot be pruned away
    val hiGuarded = when(hiB - loB <= lit(maxSpanBuckets.toLong), hiB)
      .otherwise(raise_error(concat(
        lit(s"range_join: interval spans more than $maxSpanBuckets buckets "),
        lit("(lo="), col(loCol).cast("string"),
        lit(", hi="), col(hiCol).cast("string"),
        lit(s", bucketWidth=$bucketWidth) — widen bucketWidth, clamp "),
        lit("open-ended sentinels, or raise maxSpanBuckets"))).cast("long"))
    val leftB = left.withColumn("__bucket",
      floor(col(valueCol).cast("double") / bucketWidth).cast("long"))
    val rightB = right.withColumn("__bucket", explode(sequence(loB, hiGuarded)))
    leftB.join(rightB, Seq("__bucket"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop("__bucket")
  }
}
