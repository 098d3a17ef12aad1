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
  *  1. Candidate generation: Misra–Gries summaries (capacity-bounded
  *     maps; Misra & Gries 1982) computed per partition, then REDUCED by
  *     weighted MG merges — summaries are formally mergeable with the
  *     SAME εn error bound (Agarwal et al., "Mergeable Summaries", PODS
  *     2012). The reduction tree is `treeAggregate(depth = 2)`: its
  *     fan-in derives from the scan's own partition count (≈√P merge
  *     tasks appear only when P is large; small scans reduce straight to
  *     the driver with no extra exchange), and it ends in ONE summary of
  *     `capacity` entries regardless of how many input partitions a
  *     100 TB scan has. Total undercount ≤ n/(capacity+1), so any key
  *     with count ≥ phi·n keeps a positive residual and survives
  *     whenever phi > 1/(capacity+1) — no false negatives.
  *  2. Exact verification: the (≤ capacity) candidate set broadcast-
  *     semi-joins back onto the source and only candidate rows are
  *     counted exactly. False positives from phase 1 die here, so the
  *     result is EXACT — identical to the naive full GROUP BY — while
  *     the only shuffle carries candidate-key rows.
  *
  * Null keys are ignored (a null never forms a frequency class).
  */
object HeavyHitters {

  /** Absorb one weighted entry into a Misra–Gries summary of at most
    * `capacity` entries. On overflow, subtract the minimum count from
    * every entry and drop the zeros — each subtraction of δ consumes
    * ≥ δ·(capacity+1) stream mass, so any key's total undercount is
    * ≤ totalWeight/(capacity+1).
    */
  private[graft] def mgAbsorb(counts: mutable.HashMap[String, Long],
                              k: String, w: Long, capacity: Int): Unit = {
    counts.update(k, counts.getOrElse(k, 0L) + w)
    if (counts.size > capacity) {
      val min = counts.valuesIterator.min
      val dead = mutable.ArrayBuffer.empty[String]
      counts.foreach { case (kk, c) =>
        if (c <= min) dead += kk else counts.update(kk, c - min)
      }
      dead.foreach(counts.remove)
    }
  }

  /** Weighted Misra–Gries fold of a whole (key, weight) stream — the
    * shared kernel (the streaming operator folds through it too).
    */
  private[graft] def mgFold(it: Iterator[(String, Long)],
                            capacity: Int): Iterator[(String, Long)] = {
    val counts = mutable.HashMap.empty[String, Long]
    it.foreach { case (k, w) => mgAbsorb(counts, k, w, capacity) }
    counts.iterator
  }

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
        "or heavy keys can lose their entire residual across the merges")

    val keyed = df.select(key.cast("string").as("hh_key"))
      .filter(col("hh_key").isNotNull)
    val session = keyed.sparkSession
    import session.implicits._

    // Reduction tree via treeAggregate: per-row MG updates per partition,
    // then weighted MG merges (summaries are formally mergeable with the
    // same εn bound — Agarwal PODS'12). treeAggregate derives its fan-in
    // from the RDD's OWN partition count: ≤ ~√P merge tasks appear only
    // when P is large (a 100k-task scan never funnels all summaries to
    // the driver), and a small scan reduces straight to the driver with
    // NO extra exchange — the fan-in is never a hardcoded constant.
    // Every level carries ≤ capacity entries + the row total (totals
    // ride the aggregate value — an accumulator would overcount on task
    // retries).
    val (summary, n) = keyed.as[String].rdd.treeAggregate(
      (mutable.HashMap.empty[String, Long], 0L))(
      seqOp = { case ((m, c), k) => mgAbsorb(m, k, 1L, capacity); (m, c + 1L) },
      combOp = { case ((m1, c1), (m2, c2)) =>
        m2.foreach { case (k, w) => mgAbsorb(m1, k, w, capacity) }
        (m1, c1 + c2)
      },
      depth = 2)
    val candidateKeys = summary.keys.toSeq

    // Phase 2: exact counts for candidates only — the second and final
    // scan; no full-cardinality aggregation state ever exists.
    val threshold = math.ceil(phi * n).toLong
    val candidates = candidateKeys.toDF("hh_key")
    keyed
      .join(broadcast(candidates), Seq("hh_key"), "left_semi")
      .groupBy(col("hh_key"))
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") >= threshold)
  }
}
