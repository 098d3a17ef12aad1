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

  /** V-optimal histogram (Jagadish et al., "Optimal Histograms with
    * Quality Guarantees", VLDB'98): the `nBuckets` partition of the
    * value domain minimizing total within-bucket SSE — the principled
    * answer where equal-width buckets waste resolution and quantile
    * buckets ignore variance. One row per bucket:
    * (bucket, lo, hi, n_rows, mean_q, sse_q).
    *
    * Scale shape: the input collapses to one (value, count) row per
    * DISTINCT VALUE first (map-side combinable); the O(m²·B) dynamic
    * program runs on the DRIVER over that frame, EXACT throughout —
    * BigInt prefix moments, floor-integer SSE costs, smallest-boundary
    * tie-breaks — so the chosen boundaries are bit-deterministic.
    * `maxValues` guards the DP cost: pre-quantize (e.g. `x DIV 16`)
    * above it; the error is loud and names the fix.
    */
  def vOptimal(df: DataFrame, valueCol: String, nBuckets: Int,
               maxValues: Int = 4096): DataFrame = {
    require(nBuckets >= 1 && maxValues >= nBuckets)
    val spark = df.sparkSession
    val levels = df.groupBy(col(valueCol).cast("long").as("__v"))
      .agg(count(lit(1)).as("__c"))
      .orderBy(col("__v")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val m = levels.length
    require(m <= maxValues,
      s"vOptimal: $m distinct values exceeds maxValues=$maxValues — " +
        s"pre-quantize the column (e.g. $valueCol DIV 16) or raise maxValues")
    val b = math.min(nBuckets, m)
    // prefix moments over value levels, weighted by count
    val p0 = new Array[BigInt](m + 1); val p1 = new Array[BigInt](m + 1)
    val p2 = new Array[BigInt](m + 1)
    p0(0) = 0; p1(0) = 0; p2(0) = 0
    for (i <- 0 until m) {
      val (v, c) = levels(i)
      p0(i + 1) = p0(i) + c
      p1(i + 1) = p1(i) + BigInt(v) * c
      p2(i + 1) = p2(i) + BigInt(v) * v * c
    }
    def cost(lo: Int, hi: Int): BigInt = { // [lo, hi), floor-integer SSE
      val n = p0(hi) - p0(lo)
      if (n == 0) BigInt(0)
      else {
        val s1 = p1(hi) - p1(lo); val s2 = p2(hi) - p2(lo)
        (n * s2 - s1 * s1) / n // non-negative: floor == truncate
      }
    }
    // dp(k)(j) = min cost of splitting levels [0, j) into k buckets;
    // smallest-split tie-break keeps the choice deterministic
    val NoCost = BigInt(-1)
    val dp = Array.fill(b + 1, m + 1)(NoCost)
    val cut = Array.fill(b + 1, m + 1)(-1)
    dp(0)(0) = BigInt(0)
    for (k <- 1 to b; j <- k to m) {
      var bestC = NoCost; var bestI = -1
      var i = k - 1
      while (i <= j - 1) {
        if (dp(k - 1)(i) != NoCost) {
          val c = dp(k - 1)(i) + cost(i, j)
          if (bestC == NoCost || c < bestC) { bestC = c; bestI = i }
        }
        i += 1
      }
      dp(k)(j) = bestC; cut(k)(j) = bestI
    }
    // walk back the boundaries
    val bounds = new Array[Int](b + 1)
    bounds(b) = m
    for (k <- b until 0 by -1) bounds(k - 1) = cut(k)(bounds(k))
    val rows = (0 until b).map { k =>
      val (lo, hi) = (bounds(k), bounds(k + 1))
      val n = p0(hi) - p0(lo)
      val meanQ = Frac.mk(p1(hi) - p1(lo), n).floorScaled(100L) // floor, negatives safe
      org.apache.spark.sql.Row(k.toLong + 1, levels(lo)._1,
        levels(hi - 1)._1, n.toLong, meanQ, cost(lo, hi).toLong)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("bucket",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("lo",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("hi",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_rows",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("mean_q",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("sse_q",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }
}
