package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, LongType, StructField, StructType}

/** Offline changepoint detection by binary segmentation (the classical
  * greedy for the optimal-partition problem; Scott & Knott 1974
  * lineage, the baseline every PELT paper compares against):
  * recursively split the series at the point that maximally reduces
  * within-segment SSE, accepting a split while the reduction clears
  * `minGainPermille` of the parent segment's SSE.
  *
  * EXACT end to end: the series is integer-quantized, prefix sums run
  * in BigInt, and segment SSEs compare as RATIONALS
  * ((n·S2 − S1²)/n — never a float), so the selected changepoints are
  * bit-deterministic. Ties break to the smallest index.
  *
  * Scale shape: the fact table reduces to one row per period FIRST
  * (the q_acf contract — the collected series is bounded by time
  * resolution, not data volume); the O(len²-ish) greedy runs on the
  * driver over that tiny frame. `maxLen` makes the contract a GUARD:
  * the collect itself is capped at maxLen+1 rows (limit before
  * collect, never an unbounded pull) and a longer series fails loudly
  * naming the fix instead of silently melting the driver.
  *
  * If NO split clears the threshold, the single best candidate is
  * still returned with `significant = false` — "where would the break
  * be, and does it matter" — so a stationary series yields a
  * non-vacuous answer instead of an empty frame.
  */
object ChangePoints {

  def binarySegmentation(series: DataFrame, ordCol: String, xCol: String,
                         minSeg: Int = 7, maxPoints: Int = 10,
                         minGainPermille: Long = 50L,
                         maxLen: Int = 65536): DataFrame = {
    require(minSeg >= 2, s"minSeg must be >= 2, got $minSeg")
    require(maxPoints >= 1 && minGainPermille >= 1 && maxLen >= 2 * minSeg)
    val spark = series.sparkSession
    val capped = series.select(col(ordCol).cast("long"), col(xCol).cast("long"))
      .limit(maxLen + 1).collect()
    require(capped.length <= maxLen,
      s"binarySegmentation: series has more than maxLen=$maxLen rows — " +
        s"aggregate $ordCol to a coarser period first (one row per period " +
        s"is the contract) or raise maxLen")
    val pts = capped.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val xs = pts.map(p => BigInt(p._2))
    val n = xs.length
    val p1 = new Array[BigInt](n + 1); val p2 = new Array[BigInt](n + 1)
    p1(0) = 0; p2(0) = 0
    for (i <- 0 until n) { p1(i + 1) = p1(i) + xs(i); p2(i + 1) = p2(i) + xs(i) * xs(i) }
    def sse(lo: Int, hi: Int): Frac = { // [lo, hi) with hi > lo
      val len = BigInt(hi - lo)
      val s1 = p1(hi) - p1(lo); val s2 = p2(hi) - p2(lo)
      Frac.mk(len * s2 - s1 * s1, len)
    }
    def gt(a: Frac, b: Frac): Boolean = (a - b).num.signum > 0
    // best split of [lo, hi): (k, gain) with smallest-k tie-break
    def best(lo: Int, hi: Int): Option[(Int, Frac)] = {
      val parent = sse(lo, hi)
      var bk = -1; var bg = Frac.Zero
      var k = lo + minSeg
      while (k <= hi - minSeg) {
        val g = parent - sse(lo, k) - sse(k, hi)
        if (bk == -1 || gt(g, bg)) { bk = k; bg = g }
        k += 1
      }
      if (bk == -1) None else Some((bk, bg))
    }
    def significant(lo: Int, hi: Int, gain: Frac): Boolean = {
      val parent = sse(lo, hi)
      // gain·1000 > minGainPermille·parent, rational compare
      gt(gain * Frac.mk(1000, 1), Frac.mk(minGainPermille, 1) * parent)
    }
    // greedy recursion, left-first, capped at maxPoints accepted splits
    val accepted = scala.collection.mutable.ArrayBuffer[(Int, Frac, Int, Int)]()
    def go(lo: Int, hi: Int): Unit =
      if (accepted.size < maxPoints) best(lo, hi) match {
        case Some((k, g)) if significant(lo, hi, g) =>
          accepted += ((k, g, lo, hi)); go(lo, k); go(k, hi)
        case _ => ()
      }
    go(0, n)
    val rows =
      if (accepted.nonEmpty) accepted.toSeq
      else best(0, n).map { case (k, g) => (k, g, 0, n) }.toSeq
    def meanQ(lo: Int, hi: Int): Long =
      Frac.mk(p1(hi) - p1(lo), BigInt(hi - lo)).floorScaled(100L)
    val out = rows.sortBy(_._1).map { case (k, g, lo, hi) =>
      val parent = sse(lo, hi)
      val permille =
        if (parent.isZero) 0L else (g / parent).floorScaled(1000L)
      Row(pts(k)._1, meanQ(lo, k), meanQ(k, hi), permille,
        significant(lo, hi, g))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1),
      StructType(Seq(
        StructField("cp_ord", LongType, nullable = false),
        StructField("left_mean_q", LongType, nullable = false),
        StructField("right_mean_q", LongType, nullable = false),
        StructField("gain_permille", LongType, nullable = false),
        StructField("significant", BooleanType, nullable = false))))
  }
}
