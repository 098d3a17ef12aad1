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
}
