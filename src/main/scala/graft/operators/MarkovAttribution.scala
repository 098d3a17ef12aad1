package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Markov-chain (removal-effect) multi-touch attribution — the
  * data-driven complement to the positional rules
  * (`q_attribution_last_touch`, `q_attribution_linear`): model user
  * journeys as a first-order Markov chain over channels with absorbing
  * conversion/null states; a channel's credit is its REMOVAL EFFECT —
  * how much the conversion probability drops when every transition into
  * the channel is redirected to null (Anderl, Becker, von Wangenheim &
  * Schumann 2014, the industry-standard formulation).
  *
  * Scale shape: the DISTRIBUTED work is journey truncation (one keyed
  * window) and transition counting (one grouped count, map-side
  * combinable) — input-sized. The chain itself lives on the DRIVER:
  * its state space is the distinct channel set (+ start/conv/null),
  * BOUNDED BY CONTRACT (event-type cardinality, not data volume — the
  * same tier as Knn's centroid table), and the absorption
  * probabilities solve by Gaussian elimination over EXACT BigInt
  * rationals, so the whole operator is deterministic to the last bit:
  * transition counts are exact integers, the solve is exact rational
  * arithmetic, and the output quantizes rationals by integer floor —
  * no float enters at any point.
  */
object MarkovAttribution {


  /** Journey transition counts from an event log: per user, events
    * ordered by (`tsCol`, `idCol`), truncated at the FIRST `convType`
    * event (the conversion); transitions start→s₁, sᵢ→sᵢ₊₁, and
    * sₙ→null for non-converting journeys. Returns (from_state,
    * to_state, n) with conv/null as absorbers. One keyed window + one
    * grouped count.
    */
  def transitions(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, idCol: String,
                  convType: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val prior = w.rowsBetween(Window.unboundedPreceding, -1)
    val isConv = when(col(typeCol) === convType, 1L).otherwise(0L)
    val truncated = events.filter(col(userCol).isNotNull)
      .withColumn("__convs_before", coalesce(sum(isConv).over(prior), lit(0L)))
      .filter(col("__convs_before") === 0) // keep through the first conv
      .withColumn("__state",
        when(col(typeCol) === convType, lit("conv")).otherwise(col(typeCol)))
    val withNext = truncated
      .withColumn("__next", lead(col("__state"), 1).over(w))
      .withColumn("__rn", row_number().over(w))
    val steps = withNext.select(col(userCol), col("__rn"),
      col("__state").as("from_state"),
      coalesce(col("__next"),
        when(col("__state") === "conv", lit(null).cast(StringType))
          .otherwise(lit("null"))).as("to_state"))
    val starts = withNext.filter(col("__rn") === 1)
      .select(col(userCol), lit(0L).as("__rn"),
        lit("start").as("from_state"), col("__state").as("to_state"))
    steps.unionByName(starts)
      .filter(col("to_state").isNotNull) // conv is absorbing: no out-edge
      .groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n"))
  }

  /** Solve absorption probabilities P(reach conv | state) for the chain
    * given by `counts` rows (from, to, n), exactly. Transients = every
    * from-state; conv/null absorb.
    */
  private[graft] def absorption(counts: Seq[(String, String, Long)]): Map[String, Frac] = {
    val transients = counts.map(_._1).distinct.sorted
    val idx = transients.zipWithIndex.toMap
    val outTotals = counts.groupBy(_._1).map { case (f, rs) => f -> rs.map(_._3).sum }
    val n = transients.size
    // (I - Q) p = r  with Q = transitions to transients, r = P(· -> conv)
    val a = Array.fill(n, n + 1)(Frac.Zero)
    for (i <- 0 until n) a(i)(i) = Frac.One
    counts.foreach { case (f, t, c) =>
      val i = idx(f)
      val p = Frac.mk(c, outTotals(f))
      if (t == "conv") a(i)(n) = a(i)(n) + p
      else idx.get(t).foreach(j => a(i)(j) = a(i)(j) - p)
    }
    // exact Gaussian elimination with partial (first-nonzero) pivoting
    for (c0 <- 0 until n) {
      val pivot = (c0 until n).find(r => !a(r)(c0).isZero)
        .getOrElse(throw new IllegalStateException(
          "singular chain matrix — a transient state has no resolvable outcome"))
      val tmp = a(c0); a(c0) = a(pivot); a(pivot) = tmp
      val pv = a(c0)(c0)
      for (j <- c0 to n) a(c0)(j) = a(c0)(j) / pv
      for (r <- 0 until n if r != c0 && !a(r)(c0).isZero) {
        val f = a(r)(c0)
        for (j <- c0 to n) a(r)(j) = a(r)(j) - f * a(c0)(j)
      }
    }
    transients.zipWithIndex.map { case (s, i) => s -> a(i)(n) }.toMap
  }

  /** Removal-effect attribution over the event log. Output: one row per
    * channel — (channel, removal_effect_bp, share_bp) — plus the
    * baseline conversion probability repeated as `p_conv_bp`. Shares
    * are the normalized removal effects (the credit split); everything
    * quantizes from exact rationals by integer floor.
    */
  def removalEffects(events: DataFrame, userCol: String, typeCol: String,
                     tsCol: String, idCol: String,
                     convType: String): DataFrame = {
    val spark = events.sparkSession
    val counts = transitions(events, userCol, typeCol, tsCol, idCol, convType)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val base = absorption(counts)("start")
    require(!base.isZero, "no conversions in the log — removal effects undefined")
    val channels = counts.map(_._1).filter(_ != "start").distinct.sorted
    val effects = channels.map { c =>
      // redirect every transition INTO c to null; c's own out-edges
      // become unreachable and drop out of the chain
      val removed = counts.filter(_._1 != c).map {
        case (f, t, n) if t == c => (f, "null", n)
        case other => other
      }
      val p = absorption(removed).getOrElse("start", Frac.Zero)
      c -> (Frac.One - p / base)
    }
    val total = effects.map(_._2).foldLeft(Frac.Zero)(_ + _)
    val rows = effects.map { case (c, re) =>
      val share = if (total.isZero) Frac.Zero else re / total
      Row(c, re.floorScaled(10000L), share.floorScaled(10000L),
        base.floorScaled(10000L))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("channel", StringType, nullable = false),
        StructField("removal_effect_bp", LongType, nullable = false),
        StructField("share_bp", LongType, nullable = false),
        StructField("p_conv_bp", LongType, nullable = false))))
  }
}
