package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact frequent-key detection with bounded memory — the profiling pass
  * a 100 TB corpus run starts from (hot products, boilerplate tokens,
  * dominant sources) where a plain `GROUP BY key HAVING count >= t`
  * would shuffle every distinct key, hot or not.
  *
  * Two phases, both with hard state bounds:
  *
  *  1. Candidate generation: a Misra–Gries summary per partition
  *     (capacity-bounded map, the classic frequent-items algorithm;
  *     Misra & Gries 1982, mergeability per Agarwal et al., "Mergeable
  *     Summaries", PODS 2012). A key with global count C > n/(capacity+1)
  *     must exceed its share n_p/(capacity+1) in at least one partition
  *     (pigeonhole over C = Σc_p, n = Σn_p), and Misra–Gries retains any
  *     key whose partition count beats n_p/(capacity+1) — so the union of
  *     per-partition summaries has NO false negatives for the φ-heavy set
  *     whenever φ > 1/(capacity+1).
  *  2. Exact verification: the (small) candidate set broadcast-semi-joins
  *     back onto the source and only candidate rows are counted exactly.
  *     False positives from phase 1 die here, so the result is EXACT —
  *     identical to the naive full GROUP BY — while the only shuffle
  *     carries candidate-key rows.
  *
  * State math at scale: candidates ≤ tasks × capacity keys (32 × 1024 at
  * local[32]; ~1M strings ≈ tens of MB at 1000 executors) — collected and
  * re-broadcast, both sides bounded and independent of data volume.
  * Null keys are ignored (a null never forms a frequency class).
  */
object HeavyHitters {

  /** Keys of `key` occurring in at least `phi` fraction of non-null rows
    * (count >= ceil(phi * n)), with exact counts. Output columns:
    * (hh_key: string, n_rows: long). Requires phi > 1/(capacity+1) for
    * the no-false-negative guarantee.
    */
  def frequentKeys(df: DataFrame, key: Column, phi: Double,
                   capacity: Int = 1023): DataFrame = {
    require(phi > 0.0 && phi < 1.0, s"phi must be in (0,1), got $phi")
    require(phi * (capacity + 1) > 1.0,
      s"capacity $capacity too small for phi=$phi: need capacity+1 > 1/phi " +
        "or heavy keys can be evicted from every per-partition summary")

    val keyed = df.select(key.cast("string").as("hh_key"))
      .filter(col("hh_key").isNotNull)
    val session = keyed.sparkSession
    import session.implicits._

    // Phase 1: per-partition Misra–Gries. Decrement-all eviction is
    // amortized O(1)/row (every decrement cancels one prior increment).
    val candidateKeys = keyed.as[String].mapPartitions { it =>
      val counts = mutable.HashMap.empty[String, Long]
      while (it.hasNext) {
        val k = it.next()
        counts.get(k) match {
          case Some(c) => counts.update(k, c + 1L)
          case None =>
            if (counts.size < capacity) counts.update(k, 1L)
            else {
              val dead = mutable.ArrayBuffer.empty[String]
              counts.foreach { case (kk, c) =>
                if (c == 1L) dead += kk else counts.update(kk, c - 1L)
              }
              dead.foreach(counts.remove)
            }
        }
      }
      counts.keysIterator
    }.distinct().collect() // bounded: ≤ tasks × capacity

    // Phase 2: exact counts for candidates only. n is a separate narrow
    // scan (no shuffle); at scale the scans are the cheap part — the win
    // is that no full-cardinality aggregation state ever exists.
    val n = keyed.count()
    val threshold = math.ceil(phi * n).toLong
    val candidates = candidateKeys.toSeq.toDF("hh_key")
    keyed
      .join(broadcast(candidates), Seq("hh_key"), "left_semi")
      .groupBy(col("hh_key"))
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") >= threshold)
  }
}
