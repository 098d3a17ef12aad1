package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Shapley-value multi-touch attribution — the game-theoretic third leg
  * beside the positional rules (`q_attribution_linear`) and the Markov
  * removal effect (`q_markov_attribution`): channels are players, the
  * coalition value v(S) is the number of conversions reachable with the
  * channel subset S alone, and each channel's credit is its Shapley
  * value (Shapley 1953; applied to ad attribution in Zhao et al. 2018 —
  * the formulation behind most "data-driven attribution" products).
  *
  * v(S) = Σ_{T ⊆ S} m(T), where m(T) counts converting journeys whose
  * exposure set is EXACTLY T — monotone and supermodular-free by
  * construction, and v(C) − v(∅) (all conversions touching ≥1 channel)
  * is exactly the credit the Shapley values split: the efficiency
  * axiom, asserted in the spec.
  *
  * Scale shape mirrors [[MarkovAttribution]]: the DISTRIBUTED work is
  * journey truncation (one keyed window) and exposure-mask counting
  * (one grouped count over ≤ 2^k masks, map-side combinable — the
  * shuffled frame is 2^k rows regardless of input size); the Shapley
  * sum runs on the DRIVER over the 2^k-entry mask table with EXACT
  * BigInt rationals (subset-sum DP for v, factorial weights as
  * integers, one floor quantization at the end — no float anywhere).
  * k is the CHANNEL UNIVERSE size, capped at 16 by contract: 2^16
  * masks is the driver ceiling, and a Shapley split over more than ~16
  * channels is statistically meaningless anyway (most masks unobserved).
  */
object ShapleyAttribution {

  /** Per-journey exposure mask + conversion flag. Journeys truncate at
    * the FIRST `convType` event (exposures after conversion are not
    * causes); the mask covers distinct `channels` seen strictly before
    * it, bit i = channels(i) (pass the universe SORTED — the bit
    * layout is part of the output contract). Events outside the
    * universe are ignored.
    */
  def journeyMasks(events: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, idCol: String, convType: String,
                   channels: Seq[String]): DataFrame = {
    require(channels.nonEmpty && channels.size <= 16,
      s"channel universe 1..16, got ${channels.size}")
    require(channels.distinct.size == channels.size, "duplicate channels")
    require(!channels.contains(convType), "conversion type is not a channel")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val prior = w.rowsBetween(Window.unboundedPreceding, -1)
    val isConv = when(col(typeCol) === convType, 1L).otherwise(0L)
    val bit = channels.zipWithIndex.foldLeft(lit(0L)) { case (acc, (c, i)) =>
      when(col(typeCol) === c, lit(1L << i)).otherwise(acc)
    }
    events.filter(col(userCol).isNotNull)
      .withColumn("__convs_before", coalesce(sum(isConv).over(prior), lit(0L)))
      .filter(col("__convs_before") === 0) // prefix through the first conv
      .groupBy(col(userCol))
      // distinct bit VALUES sum to the exposure mask (bits are distinct
      // powers of two; non-channel rows contribute the distinct value 0)
      .agg(sum_distinct(bit).as("mask"),
        max(isConv).as("converted"))
      .select(col(userCol).as("journey_id"),
        coalesce(col("mask"), lit(0L)).as("mask"),
        col("converted"))
  }

  /** Shapley credit per channel: (channel, phi_e6, n_conv_touching,
    * total_conv). phi_e6 = floor(φ·10⁶); Σφ over channels =
    * v(C) − v(∅) exactly (conversions with at least one exposure).
    */
  def shapley(events: DataFrame, userCol: String, typeCol: String,
              tsCol: String, idCol: String, convType: String,
              channels: Seq[String]): DataFrame = {
    val spark = events.sparkSession
    val ch = channels.sorted
    val k = ch.size
    val masks = journeyMasks(events, userCol, typeCol, tsCol, idCol,
      convType, ch)
    // ≤ 2^k + 1 rows cross the driver boundary — the contract-bounded
    // tier (same as Markov's transition counts)
    val mRows = masks.filter(col("converted") === 1L)
      .groupBy(col("mask")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1))).toMap
    val size = 1 << k
    // v by subset-sum DP over the mask lattice: k passes of 2^k
    val v = Array.tabulate(size)(t => BigInt(mRows.getOrElse(t, 0L)))
    for (i <- 0 until k; s <- 0 until size if (s & (1 << i)) != 0)
      v(s) += v(s ^ (1 << i))
    val fact = (0 to k).map(i => (1 to i).foldLeft(BigInt(1))(_ * _)).toArray
    val totalConv = v(size - 1)
    val rows = ch.zipWithIndex.map { case (c, i) =>
      val b = 1 << i
      var num = BigInt(0)
      for (s <- 0 until size if (s & b) == 0)
        num += fact(Integer.bitCount(s)) * fact(k - 1 - Integer.bitCount(s)) *
          (v(s | b) - v(s))
      val phi = Frac.mk(num, fact(k))
      val touching = mRows.collect { case (t, n) if (t & b) != 0 => n }.sum
      Row(c, phi.floorScaled(1000000L), touching, totalConv.toLong)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("channel", StringType, nullable = false),
        StructField("phi_e6", LongType, nullable = false),
        StructField("n_conv_touching", LongType, nullable = false),
        StructField("total_conv", LongType, nullable = false))))
  }
}
