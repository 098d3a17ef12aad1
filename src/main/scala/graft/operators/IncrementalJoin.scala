package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental JOIN maintenance — keep a materialized equi-join current
  * under change feeds of either side without recomputing the join (the
  * join-shaped sibling of [[IncrementalAgg]]: the reference re-derives
  * its denormalized views after every sync; at 100 TB the materialized
  * join is the thing you can never rebuild per batch).
  *
  * Strategy: dirty-set partial recompute. Any row id MENTIONED in a
  * delta (insert, delete, or the delete+insert pair of an update — op
  * tags are irrelevant, mention alone dirties) invalidates every
  * materialized pair it participates in; the replacement pairs come from
  * the CURRENT snapshots restricted to the join-key values the deltas
  * touched. Key-changing updates work because a standard feed carries
  * the old key on the D row and the new key on the I row — both land in
  * the dirty key set.
  *
  * Scale shape (the point of the operator):
  *  - the dirty id/key frames are DELTA-sized → both state-side anti
  *    joins and both snapshot-side semi filters broadcast; the
  *    materialized state is scanned but never shuffled, and the
  *    snapshots are key-pruned before their one keyed join.
  *  - fresh work ∝ |delta| × key fanout, never |A| × |B|.
  *  - pair a parquet-backed state with partition pruning on the join
  *    key (StreamingImport's relocating upsert) to avoid even the scan.
  *
  * Contract: `aIdCol` / `bIdCol` are unique row ids within their side;
  * non-key column names must not collide across sides (rename first);
  * state was produced by [[joinOf]] (or schema-matches it).
  */
object IncrementalJoin {

  /** The canonical materialized form: inner equi-join on `joinKeys`,
    * A columns then B's non-key columns.
    */
  def joinOf(a: DataFrame, b: DataFrame, joinKeys: Seq[String]): DataFrame =
    a.join(b, joinKeys)
      .select((a.columns ++ b.columns.filterNot(joinKeys.contains)).map(col): _*)

  /** Fold both sides' deltas into the materialized join.
    *
    * `deltaA` / `deltaB` need only the id + join-key columns of their
    * side (extra columns — op tags, attributes — are ignored); either
    * may be empty. `aNew` / `bNew` are the post-delta snapshots.
    * Returns the new materialized join == `joinOf(aNew, bNew, joinKeys)`
    * (IncrementalJoinSpec proves equality on random feeds including
    * key-changing updates; the state branch is Exchange-free).
    */
  def maintain(state: DataFrame, aNew: DataFrame, deltaA: DataFrame,
               bNew: DataFrame, deltaB: DataFrame,
               joinKeys: Seq[String], aIdCol: String, bIdCol: String,
               broadcastDirty: Boolean = true): DataFrame = {
    // broadcastDirty = true is the steady-state contract (deltas are
    // batch-sized); for a BACKFILL-sized delta the forced broadcast
    // would exhaust the driver — pass false and AQE picks the join
    // strategy instead (the state then pays one keyed shuffle, which a
    // backfill has to pay somewhere anyway)
    val hint: DataFrame => DataFrame =
      if (broadcastDirty) broadcast(_: DataFrame) else identity
    val dirtyA = deltaA.select(col(aIdCol)).distinct()
    val dirtyB = deltaB.select(col(bIdCol)).distinct()
    val dirtyKeys = deltaA.select(joinKeys.map(col): _*)
      .unionByName(deltaB.select(joinKeys.map(col): _*)).distinct()

    // replacement pairs: current snapshots, key-pruned to the touched
    // join keys, joined once, kept only where a dirty row participates
    // (clean-by-clean pairs under a touched key are already in state)
    val freshA = aNew.join(hint(dirtyKeys), joinKeys, "left_semi")
    val freshB = bNew.join(hint(dirtyKeys), joinKeys, "left_semi")
    val fresh = joinOf(freshA, freshB, joinKeys)
      .join(hint(dirtyA.withColumn("__da", lit(1))), Seq(aIdCol), "left")
      .join(hint(dirtyB.withColumn("__db", lit(1))), Seq(bIdCol), "left")
      .filter(col("__da").isNotNull || col("__db").isNotNull)
      .drop("__da", "__db")

    // survivors: state pairs touching NO dirty id — two broadcast anti
    // joins (AND of NOTs == NOT of the OR), zero state-side shuffle
    val survivors = state
      .join(hint(dirtyA), Seq(aIdCol), "left_anti")
      .join(hint(dirtyB), Seq(bIdCol), "left_anti")
      .select(state.columns.map(col): _*) // USING joins reorder; pin schema

    survivors.unionByName(fresh.select(survivors.columns.map(col): _*))
  }
}
