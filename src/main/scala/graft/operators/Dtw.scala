package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Dynamic time warping over per-key series — the elastic distance that
  * matches two series whose shapes agree but whose timing drifts
  * (Sakoe & Chiba 1978): the alignment view Euclidean distance gets
  * wrong whenever one series leads the other by a varying lag. The
  * standard similarity kernel for demand curves, sensor traces, and
  * event-volume profiles.
  *
  * Scale shape: series are POST-AGGREGATION by contract (one row per
  * (key, index) — e.g. daily counts), so each key's array is bounded
  * (`maxLen` guard names the violation); the k² key pairs distribute
  * one-per-task with an O(n·band) Sakoe-Chiba DP in exact BIGINT cost
  * (|a−b| on LONG values — no float, deterministic). This is the
  * typed-map tier of the custom-operator ladder (like Debounce): the
  * DP's data-dependent recurrence has no window/HOF form, and the
  * per-pair state is two rolling rows, never the full matrix.
  */
object Dtw {

  /** Pairwise banded DTW distances between every key pair (k1 < k2):
    * (k1, k2, len1, len2, dtw). Series values align by ascending
    * `idxCol`; cost = |a − b|; `band` is the Sakoe-Chiba radius around
    * the diagonal (pass `band >= max(len)` for the unconstrained
    * distance). Keys with |len1 − len2| > band have no in-band
    * alignment and return -1 by convention (documented sentinel — the
    * caller chose a band too narrow for those lengths).
    */
  def pairDistances(series: DataFrame, keyCol: String, idxCol: String,
                    valCol: String, band: Int,
                    maxLen: Int = 20000): DataFrame = {
    require(band >= 1, s"band must be >= 1, got $band")
    val spark = series.sparkSession
    val arr = series.groupBy(col(keyCol).as("k"))
      .agg(sort_array(collect_list(struct(col(idxCol).cast("long").as("i"),
        col(valCol).cast("long").as("x")))).as("s"))
      .select(col("k").cast("string").as("k"),
        col("s").getField("x").as("xs"))
    val guarded = arr.withColumn("xs",
      when(size(col("xs")) <= maxLen, col("xs"))
        .otherwise(raise_error(concat(
          lit(s"dtw: series for key "), col("k"),
          lit(s" exceeds maxLen=$maxLen ("), size(col("xs")).cast("string"),
          lit(" points) — pre-aggregate to a coarser index"))).cast("array<bigint>")))
    val pairs = guarded.as("a").join(guarded.as("b"), col("a.k") < col("b.k"))
      .select(col("a.k").as("k1"), col("b.k").as("k2"),
        col("a.xs").as("x1"), col("b.xs").as("x2"))
    implicit val enc = Encoders.product[(String, String, Long, Long, Long)]
    pairs.as(Encoders.product[(String, String, Seq[Long], Seq[Long])])
      .map { case (k1, k2, a, b) =>
        (k1, k2, a.length.toLong, b.length.toLong, banded(a, b, band))
      }
      .toDF("k1", "k2", "len1", "len2", "dtw")
  }

  /** O(n·band) time, O(m) space Sakoe-Chiba DP; exact LONG costs.
    * Returns -1 when no in-band alignment exists.
    */
  private[graft] def banded(a: Seq[Long], b: Seq[Long], band: Int): Long = {
    val n = a.length; val m = b.length
    if (n == 0 || m == 0) return -1L
    if (math.abs(n - m) > band) return -1L
    val Inf = Long.MaxValue / 4
    var prev = Array.fill(m + 1)(Inf)
    var cur = Array.fill(m + 1)(Inf)
    prev(0) = 0L
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, Inf)
      var j = math.max(1, i - band)
      val jEnd = math.min(m, i + band)
      while (j <= jEnd) {
        val c = math.abs(a(i - 1) - b(j - 1))
        val best = math.min(prev(j), math.min(cur(j - 1), prev(j - 1)))
        if (best < Inf) cur(j) = c + best
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    if (prev(m) >= Inf) -1L else prev(m)
  }
}
