package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two snapshots of a table —
  * the validation signal row counts and checksums miss: a sync can be
  * row-complete yet value-shifted (a currency re-scale, a unit bug, a
  * crawl whose document-length mix moved). The Population Stability
  * Index is the standard scorecard-monitoring measure:
  * Σ (pₙ − pₒ) · ln(pₙ / pₒ) over value buckets; < 0.1 stable,
  * 0.1–0.25 drifting, > 0.25 shifted (published credit-scoring rule of
  * thumb).
  *
  * Scale shape: one partial→final count aggregate per side over FIXED
  * boundaries (integer-exact bucket assignment — no cross-engine float
  * risk and no quantile pass), a bucket-count-sized outer join, one
  * broadcast totals row. Nothing holds per-row state; both snapshots
  * stream through once.
  */
object Drift {

  /** Per-bucket PSI contributions between snapshots.
    *
    * Returns (bucket, n_old, n_new, psi_ppm), one row per bucket seen
    * in EITHER snapshot; `psi_ppm` is the bucket's PSI term in parts
    * per million (floor(x·1e6 + 0.5) — the cross-engine float rule),
    * with +0.5 Laplace smoothing per bucket so one-sided-empty buckets
    * score finite instead of ±∞. Buckets empty on BOTH sides carry no
    * row; under the smoothing their term is not exactly 0 when the two
    * totals differ (pₒ = 0.5/(tₒ+0.5k) ≠ pₙ = 0.5/(tₙ+0.5k)) — it is
    * ~0 and omitted IDENTICALLY by this frame and the DuckDB oracle, so
    * the reported total slightly understates PSI by the sum of those
    * near-zero terms. Total PSI = Σ psi_ppm/1e6.
    * Bucket i covers [boundaries(i−1), boundaries(i)); bucket 0 is
    * everything below the first boundary, bucket k everything at or
    * above the last. NULL values are excluded on both sides (a CASE
    * fallthrough would silently pile them into the top bucket); a
    * null-RATE drift is a row-count signal, not a value-distribution
    * one — compare counts for that.
    */
  def psi(oldDf: DataFrame, newDf: DataFrame, value: Column,
          boundaries: Seq[Double]): DataFrame = {
    val nBuckets = boundaries.size + 1
    psiFromCounts(bucketCounts(oldDf, value, boundaries, "n_old"),
      bucketCounts(newDf, value, boundaries, "n_new"), nBuckets)
  }

  /** Bucket assignment for `boundaries` (see [[psi]]); nulls excluded. */
  def bucketOf(value: Column, boundaries: Seq[Double]): Column = {
    require(boundaries.nonEmpty && boundaries == boundaries.sorted &&
      boundaries.distinct == boundaries,
      s"boundaries must be strictly ascending: $boundaries")
    boundaries.zipWithIndex.foldRight(lit(boundaries.size)) {
      case ((b, i), acc) => when(value < b, lit(i)).otherwise(acc)
    }.cast("long")
  }

  /** Per-bucket count frame (bucket, `as`) — the summary [[psiFromCounts]]
    * scores. This IS a plain grouped count, so it is self-maintainable
    * under CDC feeds through [[IncrementalAgg.foldCdc]]: keep the bucket
    * counts current per sync and score drift against a frozen baseline
    * WITHOUT rescanning either snapshot (ReconcileSpec proves
    * maintained-counts PSI == two-snapshot PSI).
    */
  def bucketCounts(df: DataFrame, value: Column, boundaries: Seq[Double],
                   as: String = "n"): DataFrame =
    df.filter(value.isNotNull)
      .select(bucketOf(value, boundaries).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as(as))

  /** Bucket counts for MANY columns in ONE aggregate pass — table-wide
    * drift monitoring at the cost of a single scan (the
    * [[Profile.summarize]] shape: one wide aggregate row, `stack`
    * unpivots it to (col_name, bucket, n) rows). Per column the counts
    * equal [[bucketCounts]] exactly (nulls excluded, zero-count buckets
    * carry no row), so scoring semantics match the single-column path.
    * nCols × nBuckets count aggregates ride one partial→final
    * aggregation — no per-column scans, no shuffle beyond the one-row
    * aggregate.
    */
  def profileCounts(df: DataFrame, specs: Seq[(String, Seq[Double])],
                    as: String = "n"): DataFrame = {
    require(specs.nonEmpty, "profileCounts needs at least one column spec")
    specs.foreach { case (c, _) => require(!c.contains("`") && !c.contains("'"),
      s"unsupported character in column name: $c") }
    require(specs.map(_._1).distinct == specs.map(_._1),
      s"duplicate columns in specs: ${specs.map(_._1)}")
    val aggCols = specs.flatMap { case (c, bounds) =>
      (0 to bounds.size).map { i =>
        count(when(col(c).isNotNull && (bucketOf(col(c), bounds) === i), lit(1)))
          .as(s"__${c}_$i")
      }
    }.toList
    val one = df.agg(aggCols.head, aggCols.tail: _*)
    val n = specs.map(_._2.size + 1).sum
    val stackArgs = specs.flatMap { case (c, bounds) =>
      (0 to bounds.size).map(i => s"'$c', CAST($i AS BIGINT), `__${c}_$i`")
    }.mkString(", ")
    one.selectExpr(s"stack($n, $stackArgs) AS (col_name, bucket, $as)")
      .filter(col(as) > 0)
  }

  /** Table-wide PSI: per-column drift terms for every spec'd column,
    * two table scans total (one per snapshot) regardless of column
    * count. Output (col_name, bucket, n_old, n_new, psi_ppm); per
    * column the rows equal [[psi]] on that column exactly — the
    * smoothing uses each column's own bucket count and totals.
    */
  def psiProfile(oldDf: DataFrame, newDf: DataFrame,
                 specs: Seq[(String, Seq[Double])]): DataFrame = {
    val joined = profileCounts(oldDf, specs, "n_old")
      .join(profileCounts(newDf, specs, "n_new"), Seq("col_name", "bucket"), "full_outer")
      .na.fill(0L, Seq("n_old", "n_new"))
    val totals = joined.groupBy("col_name")
      .agg(sum("n_old").as("__to"), sum("n_new").as("__tn"))
    val nb = specs.foldLeft(lit(null).cast("double")) { case (acc, (c, b)) =>
      when(col("col_name") === c, lit(0.5 * (b.size + 1))).otherwise(acc)
    }
    val po = (col("n_old") + lit(0.5)) / (col("__to") + nb)
    val pn = (col("n_new") + lit(0.5)) / (col("__tn") + nb)
    joined.join(broadcast(totals), Seq("col_name")) // nCols rows
      .select(col("col_name"), col("bucket"), col("n_old"), col("n_new"),
        floor((pn - po) * log(pn / po) * 1000000.0 + 0.5)
          .cast("long").as("psi_ppm"))
  }

  /** Kolmogorov–Smirnov distance over the same fixed buckets [[psi]]
    * uses — the complementary signal: PSI is RATIO-sensitive (a bucket
    * going 0.1% → 0.4% scores loudly), KS is MASS-sensitive (the
    * largest absolute CDF displacement, robust to tail noise). Returns
    * one row per bucket: cumulative counts plus `diff_bp` =
    * `floor(|CDFₙ − CDFₒ|·10000 + 0.5)`; the KS statistic is
    * `max(diff_bp)`. The cumulative window runs over the nBuckets-row
    * count summary — a single-partition window over a frame that is
    * buckets-sized BY CONSTRUCTION, never data-sized. Both CDFs divide
    * exact integer counts as doubles (correctly-rounded IEEE ops on
    * identical operands — cross-engine deterministic).
    */
  def ksFromCounts(oldCounts: DataFrame, newCounts: DataFrame): DataFrame = {
    val joined = oldCounts.join(newCounts, Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("n_old", "n_new"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val totals = joined.agg(sum("n_old").as("__to"), sum("n_new").as("__tn"))
    joined
      .withColumn("cum_old", sum(col("n_old")).over(w))
      .withColumn("cum_new", sum(col("n_new")).over(w))
      .crossJoin(broadcast(totals)) // one row
      .select(col("bucket"), col("cum_old"), col("cum_new"),
        // greatest(total, 1): an empty side yields CDF 0 everywhere
        // (KS = the other side's mass) instead of NaN rows
        floor(abs(col("cum_new").cast("double") / greatest(col("__tn"), lit(1L)).cast("double") -
            col("cum_old").cast("double") / greatest(col("__to"), lit(1L)).cast("double")) * 10000.0
          + 0.5).cast("long").as("diff_bp"))
  }

  /** Per-bucket KS rows between two snapshots (see [[ksFromCounts]]). */
  def ks(oldDf: DataFrame, newDf: DataFrame, value: Column,
         boundaries: Seq[Double]): DataFrame =
    ksFromCounts(bucketCounts(oldDf, value, boundaries, "n_old"),
      bucketCounts(newDf, value, boundaries, "n_new"))

  /** Approximate quantiles FROM the maintained bucket counts — the
    * percentile report a monitoring pipeline serves with ZERO snapshot
    * rescans once [[IncrementalAgg.foldCdc]] keeps the counts current
    * (the same nBuckets-row state PSI and KS already score). Accuracy is
    * bucket-resolution (the maintained-state tradeoff); the mergeable
    * sketch (`approx_percentile`, q_percentiles_approx) is the
    * higher-resolution scan-time alternative.
    *
    * For each requested quantile (basis points), the covering bucket is
    * the first whose cumulative count reaches `q·N/10⁴`, and the
    * estimate linearly interpolates between the bucket's boundaries in
    * ONE fixed parenthesization (`lo + (hi−lo)·(target−cum_before)/n`)
    * so an oracle replaying the operand order matches bit-for-bit. The
    * unbounded edge buckets clamp to their finite boundary. All frames
    * are buckets- or qs-sized — never data-sized.
    *
    * Input: `counts` (bucket, n) — [[bucketCounts]] output or its
    * foldCdc-maintained twin. Output: (q_bp, bucket, est).
    */
  def quantilesFromCounts(counts: DataFrame, boundaries: Seq[Double],
                          qBps: Seq[Int]): DataFrame = {
    require(boundaries.nonEmpty && boundaries == boundaries.sorted &&
      boundaries.distinct == boundaries,
      s"boundaries must be strictly ascending: $boundaries")
    require(qBps.nonEmpty && qBps.forall(q => q > 0 && q <= 10000),
      s"quantile basis points must be in (0, 10000]: $qBps")
    val spark = counts.sparkSession
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // single-partition window over ≤ nBuckets+1 rows BY CONSTRUCTION
    val cum = counts.na.fill(0L, Seq("n"))
      .withColumn("cum", sum(col("n")).over(w))
      .withColumn("cum_before", col("cum") - col("n"))
    val totals = cum.agg(coalesce(max(col("cum")), lit(0L)).as("__total"))
    val bArr = typedlit(boundaries)
    val lo = when(col("bucket") === 0, lit(boundaries.head))
      .otherwise(element_at(bArr, col("bucket").cast("int")))
    val hi = when(col("bucket") >= boundaries.size, lit(boundaries.last))
      .otherwise(element_at(bArr, col("bucket").cast("int") + 1))
    val target = col("q_bp") * col("__total") / lit(10000.0)
    qBps.toDF("q_bp")
      .crossJoin(broadcast(cum.crossJoin(broadcast(totals)).filter(col("n") > 0)))
      .filter(col("cum_before") < target && target <= col("cum"))
      .select(col("q_bp"), col("bucket"),
        (lo + (hi - lo) * (target - col("cum_before")) / col("n").cast("double"))
          .as("est"))
  }

  /** Categorical bucket assignment over a FROZEN category list: listed
    * categories keep their identity, everything else folds into
    * `otherLabel`. Freezing the list is what makes categorical counts
    * maintainable against a baseline (the top-k of a LIVE snapshot
    * changes over time; a drift score only means something against
    * fixed buckets) — get the list from [[psiCategorical]]'s top-k or
    * from domain knowledge. Nulls pass through as null (callers filter,
    * matching [[bucketOf]]'s null contract).
    */
  def categoricalBucketOf(value: Column, categories: Seq[String],
                          otherLabel: String = "__OTHER__"): Column = {
    require(!categories.contains(otherLabel),
      s"category list collides with the other-label sentinel '$otherLabel'")
    val cat = value.cast("string")
    val inList = if (categories.isEmpty) lit(false) else cat.isin(categories: _*)
    when(cat.isNull, lit(null).cast("string"))
      .otherwise(when(inList, cat).otherwise(lit(otherLabel)))
  }

  /** Categorical drift — the columns numeric buckets can't score
    * (status codes, priorities, country/language mixes: exactly the
    * columns a sync validation watches). The category space is BOUNDED
    * before anything shuffles twice: the top `maxCategories` categories
    * by OLD-side count (ties broken by category value ascending —
    * deterministic and oracle-replayable) keep their identity, the
    * long tail folds into `otherLabel` — so a high-cardinality column
    * (user agents, referrer URLs) costs one grouped count plus a
    * distributed top-k (`TakeOrderedAndProject`, never a single-
    * partition global sort), and the PSI frame stays ≤ maxCategories+1
    * rows. The driver holds only the top-k label list.
    *
    * Returns (category, n_old, n_new, psi_ppm), smoothing k =
    * |top| + 1 (the OTHER bucket counts whether or not it has rows).
    * Nulls are excluded like [[psi]]; a category literally named
    * `otherLabel` would collide — pass a sentinel that cannot occur.
    */
  def psiCategorical(oldDf: DataFrame, newDf: DataFrame, value: Column,
                     maxCategories: Int = 1000,
                     otherLabel: String = "__OTHER__"): DataFrame = {
    require(maxCategories > 0, "maxCategories must be positive")
    val cat = value.cast("string")
    // ONE old-side corpus scan: the grouped counts (≤ cardinality rows,
    // spillable) are cached only long enough to serve BOTH the top-k
    // selection and the fold-to-OTHER re-aggregation, then RELEASED —
    // the folded result is ≤ maxCategories+1 rows and returns as a
    // local relation, so no cardinality-sized storage outlives the call
    // (an id-like column — cardinality ≈ rows — still pays a data-sized
    // temporary cache; its top-k is also meaningless: don't drift-score
    // identifiers)
    val oldCats = oldDf.filter(cat.isNotNull)
      .groupBy(cat.as("category")).agg(count(lit(1)).as("__n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (top, oldFolded) = try {
      val top = oldCats
        .orderBy(col("__n").desc, col("category").asc)
        .limit(maxCategories) // distributed top-k, bounded driver result
        .select("category").collect().map(_.getString(0)).toSeq
      val folded = oldCats
        .select(categoricalBucketOf(col("category"), top, otherLabel)
          .as("category"), col("__n"))
        .groupBy("category").agg(sum(col("__n")).as("n_old"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      (top, folded)
    } finally oldCats.unpersist()
    val spark = oldDf.sparkSession
    import spark.implicits._
    val oldCounts = oldFolded.toDF("category", "n_old")
    val newCounts = newDf.filter(cat.isNotNull)
      .select(categoricalBucketOf(value, top, otherLabel).as("category"))
      .groupBy("category").agg(count(lit(1)).as("n_new"))
    val joined = oldCounts
      .join(newCounts, Seq("category"), "full_outer")
      .na.fill(0L, Seq("n_old", "n_new"))
    val k = top.size + 1
    val totals = joined.agg(sum("n_old").as("__to"), sum("n_new").as("__tn"))
    val po = (col("n_old") + lit(0.5)) / (col("__to") + lit(0.5 * k))
    val pn = (col("n_new") + lit(0.5)) / (col("__tn") + lit(0.5 * k))
    joined.crossJoin(broadcast(totals)) // one row
      .select(col("category"), col("n_old"), col("n_new"),
        floor((pn - po) * log(pn / po) * 1000000.0 + 0.5)
          .cast("long").as("psi_ppm"))
  }

  /** PSI terms from two (bucket, count) summaries — tiny inputs (one
    * row per bucket), so drift scoring is free once the counts exist.
    * `nBuckets` is the TOTAL bucket count (boundaries + 1) so the
    * Laplace smoothing matches [[psi]] even when some buckets carry no
    * row. Column contracts: first frame (bucket, n_old), second
    * (bucket, n_new) — use [[bucketCounts]]' `as` parameter.
    */
  /** Period-over-period PSI down a TIME SERIES — the monitoring view of
    * drift (each hour/day scored against its predecessor), where
    * [[psi]] scores one snapshot pair. `period` must be an INTEGER
    * period index (e.g. epoch-hour `ts div 3600`): the predecessor join
    * is then pure arithmetic (`period+1`), no window, no range
    * exchange. Output: one row per scored period —
    * (period, n_old, n_new, psi_ppm) with psi_ppm = Σ floored
    * per-bucket terms (exact integer sum of the same quantized terms
    * [[psiFromCounts]] ships) — only periods where BOTH sides carry
    * rows are scored (an empty hour has no distribution to compare).
    *
    * Shape: one (period, bucket) count aggregate over the data; the
    * scoring self-join and totals all run on the periods×buckets
    * summary — data-sized work is the single count.
    */
  def psiSeries(df: DataFrame, value: Column, boundaries: Seq[Double],
                period: Column): DataFrame =
    psiSeriesFromCounts(
      df.filter(value.isNotNull)
        .groupBy(period.as("period"), bucketOf(value, boundaries).as("bucket"))
        .agg(count(lit(1)).as("n")),
      boundaries.length + 1)

  /** [[psiSeries]] from an existing (period, bucket, n) count table —
    * the summary is PLAIN GROUPED COUNTS, so a stream maintains it with
    * batch-delta writes and the whole timeline re-scores from state
    * with zero event rescans (see `streaming.StreamingDriftSeries`).
    */
  def psiSeriesFromCounts(counts: DataFrame, nb: Int): DataFrame = {
    val joined = counts.select(col("period"), col("bucket"), col("n").as("n_new"))
      .join(counts.select((col("period") + 1L).as("period"), col("bucket"),
        col("n").as("n_old")), Seq("period", "bucket"), "full_outer")
      .na.fill(0L, Seq("n_old", "n_new"))
    val totals = joined.groupBy(col("period"))
      .agg(sum(col("n_old")).as("__to"), sum(col("n_new")).as("__tn"))
      .filter(col("__to") > 0 && col("__tn") > 0)
    val po = (col("n_old") + lit(0.5)) / (col("__to") + lit(0.5 * nb))
    val pn = (col("n_new") + lit(0.5)) / (col("__tn") + lit(0.5 * nb))
    joined.join(totals, Seq("period")) // summary-sized, shared period key
      .select(col("period"), col("__to"), col("__tn"),
        floor((pn - po) * log(pn / po) * 1000000.0 + 0.5)
          .cast("long").as("__term"))
      .groupBy(col("period"))
      .agg(max(col("__to")).as("n_old"), max(col("__tn")).as("n_new"),
        sum(col("__term")).as("psi_ppm"))
  }

  def psiFromCounts(oldCounts: DataFrame, newCounts: DataFrame,
                    nBuckets: Int): DataFrame = {
    val joined = oldCounts.join(newCounts, Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("n_old", "n_new"))
    val totals = joined.agg(sum("n_old").as("__to"), sum("n_new").as("__tn"))
    val po = (col("n_old") + lit(0.5)) / (col("__to") + lit(0.5 * nBuckets))
    val pn = (col("n_new") + lit(0.5)) / (col("__tn") + lit(0.5 * nBuckets))
    joined.crossJoin(broadcast(totals)) // one row
      .select(col("bucket"), col("n_old"), col("n_new"),
        floor((pn - po) * log(pn / po) * 1000000.0 + 0.5)
          .cast("long").as("psi_ppm"))
  }
}
