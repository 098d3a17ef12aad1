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

  /** Bounded MAX (or MIN) maintenance under deletes — the aggregate
    * [[foldCdc]] deliberately excludes, made maintainable with CAPPED
    * state: per key keep the `k` LARGEST values (with multiplicity) as
    * a sorted array. Inserts merge in; a delete of a kept value removes
    * one copy; a delete BELOW the kept range is provably irrelevant to
    * the maximum and is ignored. The array may shrink to a top-j
    * (j < k) prefix — still exact — and only when deletes exhaust it
    * entirely while rows remain does the key need a rebuild, flagged in
    * `needs_rebuild` (the standard partial-recompute IVM design: the
    * caller re-derives JUST those keys from the fact table; a key's
    * rebuild probability after d deletes is ~(d/n)^k).
    *
    * State per key: `n_rows` (exact, like foldCdc) + `topk`
    * array<double> descending. `max = topk[0]` whenever the array is
    * non-empty. Aggregation state is bounded by k COPIES at every
    * stage — init, fold, and rebuild all run on the
    * [[graft.functions.BoundedTopKMultiset]] aggregate, so a hot key's
    * history never materializes (a `collect_list`-then-slice would
    * buffer every row of the key before capping). For MIN, negate
    * values going in and out.
    */
  def initTopK(df: DataFrame, keys: Seq[String], value: Column,
               k: Int = 16): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        graft.functions.BoundedTopK.topKDesc(value.cast("double"), k)
          .as("topk"))

  def foldCdcTopK(state: DataFrame, delta: DataFrame, keys: Seq[String],
                  value: Column, op: Column, k: Int = 16): DataFrame = {
    val kc = keys.map(col)
    // per (key, value): copies available (kept state + batch inserts)
    // minus batch deletes, clamped at zero — a negative net means the
    // deletes refer to copies below the kept range (irrelevant to max)
    val present = state.select(kc :+ explode(col("topk")).as("__v"): _*)
      .withColumn("__m", lit(1L))
    val ins = delta.filter(op === "I")
      .select(kc :+ value.cast("double").as("__v"): _*)
      .withColumn("__m", lit(1L))
    val dels = delta.filter(op === "D")
      .select(kc :+ value.cast("double").as("__v"): _*)
      .withColumn("__m", lit(-1L))
    val merged = present.unionByName(ins).unionByName(dels)
      .groupBy(kc :+ col("__v"): _*)
      .agg(greatest(sum(col("__m")), lit(0L)).as("__net"))
      .filter(col("__net") > 0)
      .groupBy(kc: _*)
      // weighted bounded top-k: state caps at k copies — never
      // materializes array_repeat(v, net) for a value with a huge net
      .agg(graft.functions.BoundedTopK.topKDescWeighted(
        col("__v"), col("__net"), k).as("topk"))
    // row counts fold exactly like foldCdc
    val counts = foldCdc(
      state.select(kc :+ col("n_rows") :+ lit(null).cast("decimal(38,6)")
        .as("total"): _*),
      delta, keys, lit(0), op).drop("total")
    counts.join(merged, keys, "left_outer")
      .withColumn("needs_rebuild",
        (col("topk").isNull || size(col("topk")) === 0) && col("n_rows") > 0)
  }

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
