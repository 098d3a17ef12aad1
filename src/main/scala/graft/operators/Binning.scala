package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quantile binning — equal-population bucketing of a numeric column
  * (feature binning / price-band segmentation) in the shape that scales:
  * a global `ntile` window would funnel the whole table through one
  * ordered partition, so instead boundaries come from ONE aggregate pass
  * (exact interpolated percentiles — a few doubles on the driver,
  * data-size-independent), and assignment is a broadcast codegen'd CASE
  * in a second narrow pass.
  *
  * Boundaries are FLOORED to integers: bucket membership then compares a
  * value against an integer constant, so an engine computing the
  * interpolated boundary a last-ulp differently still bins every row
  * identically (the cross-engine boundary-safety rule SURVEY.md §6
  * applies to data, not just output).
  *
  * CAVEATS of the floor rule (both inherent to cross-engine binning, not
  * to this implementation):
  *   - if the exact interpolated percentile lands within one ulp of an
  *     integer (plausible with 2-decimal money values), two engines can
  *     floor to ADJACENT longs and shift that bin edge — when comparing
  *     engines, compare the emitted `boundaries` first; row assignment
  *     agrees whenever the boundaries do;
  *   - two probs whose percentiles floor to the SAME integer would
  *     yield an empty bucket (no value can fall between equal
  *     boundaries). By default this THROWS with the colliding
  *     boundaries named — a silent empty price band is a data bug the
  *     caller should see. Passing `allowCollapsed = true` keeps the
  *     duplicates instead, with stable indexes — bucket i is always
  *     "probs(i-1) ≤ v < probs(i)" — for callers whose downstream
  *     contract fixes the bucket count. Boundaries are also asserted
  *     non-decreasing (always true for ascending probs; that assert
  *     guards engine bugs, not inputs).
  *
  * BREAKING CHANGE (round 4→5): collapsed boundaries previously kept
  * the duplicates silently; they now throw unless `allowCollapsed =
  * true`. A caller binning degenerate or heavily-skewed data (many ties
  * at one value) that upgraded across that boundary will start failing
  * at runtime — that is the intended surfacing of a previously-silent
  * empty bucket; pass `allowCollapsed = true` to restore the old
  * behavior unchanged (same indexes, same assignments).
  */
object Binning {

  /** Add `as` = bucket index (0..probs.size) using floored quantile
    * boundaries at `probs` (ascending, in (0,1)). Returns the frame and
    * the boundaries used.
    *
    * `approx = true` (the 100 TB path) computes boundaries with
    * `approx_percentile`: its quantile-summary state is bounded and
    * merges map-side. `approx = false` uses exact interpolated
    * `percentile` — whose aggregation state is the FULL value multiset,
    * fine at dimension scale and for oracle parity, an OOM at corpus
    * scale. Both paths emit a few doubles to the driver either way.
    */
  def quantileBins(df: DataFrame, value: Column, probs: Seq[Double],
                   as: String = "bucket",
                   approx: Boolean = false,
                   allowCollapsed: Boolean = false): (DataFrame, Seq[Long]) = {
    require(probs.nonEmpty && probs == probs.sorted &&
      probs.distinct == probs &&
      probs.forall(p => p > 0 && p < 1),
      s"probs must be strictly ascending in (0,1): $probs")
    val arr = probs.mkString("array(", ",", ")")
    val agg = if (approx) s"approx_percentile(CAST(__bin_v AS DOUBLE), $arr, 10000)"
      else s"percentile(CAST(__bin_v AS DOUBLE), $arr)"
    // one tiny aggregate: collect k doubles, floor to stable ints
    val row = df.select(value.as("__bin_v"))
      .agg(expr(agg).as("bs"))
      .head()
    require(!row.isNullAt(0),
      "quantileBins: input has no non-null values to compute boundaries from")
    val boundaries = row.getSeq[Double](0).map(math.floor(_).toLong)
    require(boundaries.zip(boundaries.tail).forall { case (a, b) => a <= b },
      s"quantileBins: floored boundaries must be non-decreasing, got $boundaries")
    require(allowCollapsed || boundaries.distinct == boundaries,
      s"quantileBins: floored boundaries collide ($boundaries) — the bucket " +
        "between equal boundaries can hold no value. Use fewer or more-" +
        "separated probs, or pass allowCollapsed = true to keep the " +
        "duplicate boundaries (stable bucket indexes, empty bucket).")
    val bucket = boundaries.zipWithIndex.foldRight(lit(boundaries.size)) {
      case ((b, i), acc) => when(value < b, lit(i)).otherwise(acc)
    }
    (df.withColumn(as, bucket.cast("long")), boundaries)
  }
}
