package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — keep per-key aggregates current by
  * folding change batches into a persistent state table instead of
  * re-aggregating the whole fact table after every sync (the reference
  * re-derives its counts after each MoveDataToMainTable pass; at 100 TB
  * "recompute the world" is the thing you can never do).
  *
  * State is restricted to SELF-MAINTAINABLE aggregates — count and exact
  * decimal sum — which absorb both inserts and deletes algebraically
  * (an update is a delete+insert pair, the standard incremental
  * view-maintenance lowering). Averages derive from (sum, count) at read
  * time. min/max are deliberately NOT offered: they are not maintainable
  * under deletes without keeping the full value multiset.
  *
  * Scale shape: one keyed shuffle over the DELTA (plus the state table,
  * which is already aggregated — one row per key), never over the fact
  * history. Keys whose count reaches zero leave the state table, so
  * state size tracks the live key set.
  */
object IncrementalAgg {

  /** Build the initial state: per-key `n_rows` + exact `total` of
    * `value` (decimal — order-independent, mergeable).
    */
  def init(df: DataFrame, keys: Seq[String], value: Column): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        // pin the state type so every fold round-trips the same schema
        sum(value.cast("decimal(30,6)")).cast("decimal(38,6)").as("total"))

  /** Fold a CDC batch into the state. `op` holds "I" (insert) or "D"
    * (delete of a previously-inserted row, with the SAME value the
    * insert carried). Updates arrive as D(old) + I(new). The fold is one
    * union + one keyed aggregate — merge(init(A), feed) == init(A ⊎ feed)
    * (PropertiesSpec asserts the algebra on random feeds).
    */
  def foldCdc(state: DataFrame, delta: DataFrame, keys: Seq[String],
              value: Column, op: Column): DataFrame = {
    val sign = when(op === "D", lit(-1L)).otherwise(lit(1L))
    val deltaState = delta.groupBy(keys.map(col): _*)
      .agg(sum(sign).as("n_rows"),
        sum((value.cast("decimal(30,6)") * sign.cast("decimal(30,6)"))
          .cast("decimal(30,6)")).cast("decimal(38,6)").as("total"))
    state.unionByName(deltaState)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"),
        sum(col("total")).cast("decimal(38,6)").as("total"))
      .filter(col("n_rows") > 0) // fully-deleted keys leave the state
  }
}
