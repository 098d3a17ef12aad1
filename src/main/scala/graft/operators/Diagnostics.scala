package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pre-flight diagnostics for joins and aggregations at scale: cheap
  * bounded-state summaries that catch the two classic 100 TB killers
  * BEFORE a job runs — the skewed hot key (one straggler task holding
  * the stage) and the many-to-many join explosion (output orders of
  * magnitude beyond either input). Both reuse the engine's bounded
  * sketch machinery ([[HeavyHitters]] Misra–Gries candidates + exact
  * verify): two scans, candidate state capped, nothing full-cardinality.
  */
object Diagnostics {

  /** Per-key skew report: every key holding ≥ `phi` of the rows, with
    * its exact count, share (basis points), and skew multiplier vs the
    * MEAN key load (`n_rows × n_distinct / total` — how many
    * average-key partitions this one key equals; the number a shuffle
    * planner cares about). `n_distinct` is an HLL estimate (±~2%), the
    * heavy-key counts are exact.
    */
  def keySkew(df: DataFrame, key: Column, phi: Double = 0.001): DataFrame = {
    val heavy = HeavyHitters.frequentKeys(df, key, phi)
    val totals = df.select(key.cast("string").as("hh_key"))
      .filter(col("hh_key").isNotNull)
      .agg(count(lit(1)).as("__total"),
        approx_count_distinct(col("hh_key")).as("__distinct"))
    heavy.crossJoin(broadcast(totals)) // one row
      .select(col("hh_key").as("key"), col("n_rows"),
        floor(col("n_rows") * 10000.0 / col("__total")).cast("long")
          .as("share_bp"),
        (col("n_rows") * col("__distinct") / col("__total")).cast("double")
          .as("skew_x"))
  }

  /** Lower bound on an equi-join's output from the heavy keys of BOTH
    * sides: Σ over shared heavy keys of cnt_a × cnt_b, plus each side's
    * row count (any non-heavy match adds at least ~1 row per probe-side
    * row in the worst accounting, so the heavy-product is the part that
    * explodes). The EXACT join size costs as much as the join; this
    * costs two bounded scans per side and catches the hot-key blowup
    * that matters. Returns one row:
    * (heavy_product_rows, shared_heavy_keys, rows_a, rows_b).
    */
  def joinExplosionBound(a: DataFrame, keyA: Column,
                         b: DataFrame, keyB: Column,
                         phi: Double = 0.001): DataFrame = {
    val ha = HeavyHitters.frequentKeys(a, keyA, phi)
      .select(col("hh_key"), col("n_rows").as("__na"))
    val hb = HeavyHitters.frequentKeys(b, keyB, phi)
      .select(col("hh_key"), col("n_rows").as("__nb"))
    val prod = ha.join(hb, Seq("hh_key"))
      .agg(coalesce(sum(col("__na") * col("__nb")), lit(0L))
          .as("heavy_product_rows"),
        count(lit(1)).as("shared_heavy_keys"))
    val counts = a.agg(count(lit(1)).as("rows_a"))
      .crossJoin(b.agg(count(lit(1)).as("rows_b")))
    prod.crossJoin(broadcast(counts))
  }
}
