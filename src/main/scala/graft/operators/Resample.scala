package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-grid resampling with forward fill — turn an irregular observation
  * stream into a regular per-key series ("value as of every 6 hours"), the
  * standard feature-engineering step before windowed training features or
  * gap-tolerant monitoring.
  *
  * Reference tie-in: the provider's scheduled-sync model snapshots source
  * state on a fixed cadence (EcomProvider.cs:167 activity-schedule
  * plumbing); resampling is the query-side dual — reconstruct the regular
  * snapshot series FROM the irregular change stream.
  *
  * Shape at 100 TB:
  *  - observations reduce to one row per (key, ts) via a keyed aggregate
  *    (partial map-side combine; ties at the same timestamp take `max` —
  *    deterministic, unlike "whichever row the scan saw last").
  *  - per-key bounds are a second partial aggregate on the SAME key, so
  *    AQE can reuse the exchange; the grid explodes from an arithmetic
  *    `sequence(ceil(mn), floor(mx), step)` — no range sampling, no
  *    driver materialization, and a `maxGridPoints` guard feeds the
  *    sequence end so a pathological span (an epoch-0 sentinel timestamp)
  *    raises a named error instead of asking `sequence()` for 10¹⁴ rows.
  *  - the fill itself is [[AsOf.joinAsOf]] backward — one keyed exchange,
  *    RUNNING-frame carry, O(n) per key.
  *
  * Grid points are epoch-second multiples of `stepSeconds` (ceil-aligned
  * start, floor-aligned end), so every grid row has at least one
  * observation at-or-before it and the filled value is never null.
  */
object Resample {

  /** (key, grid_epoch, value_ff): `valueCol` forward-filled onto the
    * per-key regular grid. `tsCol` may be a timestamp (cast to epoch
    * seconds, fractional part truncated) or an integral epoch column.
    */
  def forwardFill(df: DataFrame, keyCol: String, tsCol: String,
                  valueCol: String, stepSeconds: Long,
                  maxGridPoints: Long = 1L << 20): DataFrame = {
    val grid = alignedGrid(df, keyCol, tsCol, valueCol, stepSeconds, maxGridPoints)
    val obs = dedupObs(df, keyCol, tsCol, valueCol)
    AsOf.joinAsOf(grid, obs, Seq("key"), "t", Seq("v"))
      .select(col("key"), col("t").as("grid_epoch"),
        col("asof_v").as("value_ff"))
  }

  /** (key, grid_epoch, value_lerp): linear interpolation between the
    * surrounding observations instead of [[forwardFill]]'s
    * last-value-carried — the resampling mode for continuously-varying
    * signals (sensor series, prices) where a step function distorts.
    *
    * Same grid construction; the surrounding pair comes from TWO as-of
    * joins (backward for (t0,v0), forward for (t1,v1) — each the
    * single-keyed-exchange RUNNING-frame shape; never a quadratic
    * frame). Ceil/floor grid alignment guarantees both neighbours exist
    * for every grid point. An exact on-grid observation (t0 == t == t1)
    * short-circuits to its own value, so the divide-by-zero case never
    * evaluates. The interpolation expression is written in ONE fixed
    * parenthesization (`v0 + (v1-v0) * (t-t0) / (t1-t0)`) — IEEE ops
    * are correctly rounded, so an oracle replaying the identical
    * operand order reproduces every double bit-for-bit.
    */
  def interpolate(df: DataFrame, keyCol: String, tsCol: String,
                  valueCol: String, stepSeconds: Long,
                  maxGridPoints: Long = 1L << 20): DataFrame = {
    val grid = alignedGrid(df, keyCol, tsCol, valueCol, stepSeconds, maxGridPoints)
    val obs = dedupObs(df, keyCol, tsCol, valueCol)
      .withColumn("t0", col("t")).withColumn("t1", col("t"))
    val back = AsOf.joinAsOf(grid, obs.select(col("key"), col("t"),
      col("v").as("v0"), col("t0")), Seq("key"), "t", Seq("v0", "t0"))
    val both = AsOf.joinAsOf(back, obs.select(col("key"), col("t"),
      col("v").as("v1"), col("t1")), Seq("key"), "t", Seq("v1", "t1"),
      direction = "forward")
    both.select(col("key"), col("t").as("grid_epoch"),
      when(col("asof_t1") === col("asof_t0"), col("asof_v0"))
        .otherwise(col("asof_v0") +
          (col("asof_v1") - col("asof_v0")) *
            (col("t") - col("asof_t0")).cast("double") /
            (col("asof_t1") - col("asof_t0")).cast("double"))
        .as("value_lerp"))
  }

  private def dedupObs(df: DataFrame, keyCol: String, tsCol: String,
                       valueCol: String): DataFrame =
    df.select(col(keyCol).as("key"), col(tsCol).cast("long").as("t"),
        col(valueCol).as("v"))
      .filter(col("key").isNotNull && col("t").isNotNull)
      .groupBy(col("key"), col("t"))
      .agg(max(col("v")).as("v"))

  private def alignedGrid(df: DataFrame, keyCol: String, tsCol: String,
                          valueCol: String, stepSeconds: Long,
                          maxGridPoints: Long): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be positive, got $stepSeconds")
    require(maxGridPoints > 0, s"maxGridPoints must be positive, got $maxGridPoints")
    val obs = dedupObs(df, keyCol, tsCol, valueCol)
    val bounds = obs.groupBy(col("key"))
      .agg(min(col("t")).as("mn"), max(col("t")).as("mx"))
      .withColumn("gstart",
        expr(s"mn + (${stepSeconds}L - mn % ${stepSeconds}L) % ${stepSeconds}L"))
      .withColumn("gend", expr(s"mx - mx % ${stepSeconds}L"))
      .filter(col("gend") >= col("gstart"))
    // the guard feeds the sequence end, so it cannot be pruned away
    val gendGuarded = when(
      (col("gend") - col("gstart")) / stepSeconds < lit(maxGridPoints),
      col("gend"))
      .otherwise(raise_error(concat(
        lit(s"resample: grid exceeds $maxGridPoints points for key "),
        col("key").cast("string"),
        lit(" (span "), (col("gend") - col("gstart")).cast("string"),
        lit(s"s at step ${stepSeconds}s) — widen stepSeconds, clamp "),
        lit("sentinel timestamps, or raise maxGridPoints"))).cast("long"))
    bounds.select(col("key"),
      explode(sequence(col("gstart"), gendGuarded, lit(stepSeconds))).as("t"))
  }

  /** Time-weighted average per key over an irregular sample-and-hold
    * stream — the metering/IoT/finance staple where a plain mean
    * overweights busy periods: each observation's value holds until the
    * next observation, so it contributes value × holding-duration, and
    * the TWA is Σ v·Δt / Σ Δt over [first, last] observation.
    *
    * Exactness: `valueCol` is LONG units (quantize first), durations
    * are integer epoch seconds, so the numerator is an exact BIGINT sum
    * and the average a single floor division — hash-stable under any
    * row order. The last observation (no successor) bounds the window;
    * keys with fewer than two observations have no time extent and are
    * excluded by definition. Equal-timestamp ties order by `idCol`:
    * the earlier-id value holds for zero seconds — harmless, but the
    * ORDER must be total or `lead` is nondeterministic.
    *
    * Shape: one keyed window (lead) + one grouped sum on the SAME key —
    * a single exchange end to end, partial aggregation map-side.
    */
  def timeWeightedAvg(df: DataFrame, keyCol: String, tsCol: String,
                      idCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // decimal floor division — Σ v·Δt can clear double's 2^53 integer
    // ceiling long before 100 TB does anything else wrong
    def fdiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      val ad = a.cast("decimal(38,0)"); val bd = b.cast("decimal(38,0)")
      ((ad - pmod(ad, bd)) / bd).cast("long")
    }
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val ep = col(tsCol).cast("long")
    val seg = df.filter(col(tsCol).isNotNull)
      .withColumn("__dur", lead(ep, 1).over(w) - ep)
      .filter(col("__dur").isNotNull)
    seg.groupBy(col(keyCol))
      .agg((count(lit(1)) + 1).as("n_obs"),
        sum(col("__dur")).as("span_s"),
        sum(col(valueCol) * col("__dur")).as("__vs"))
      .filter(col("span_s") > 0)
      .withColumn("twa", fdiv(col("__vs"), col("span_s")))
      .drop("__vs")
  }
}
