package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.{IncrementalAgg, IncrementalJoin, Profile, Reconcile}

/** One incremental warehouse refresh from a snapshot pair — the
  * composed counterpart of the reference's RunJob, which re-derives its
  * aggregates and denormalized views after every sync
  * (EcomDestinationWriter.cs MoveDataToMainTables → CountProductVariant
  * Groups :4478): here ONE snapshot diff drives every derived artifact
  * with delta-bounded work.
  *
  * Stages (all consumers of the SAME change feed):
  *   1. [[Reconcile.changeFeed]] — digests decide who changed
  *      (16 B/row shuffle), content moves only for the delta;
  *   2. [[IncrementalAgg.foldCdc]] — per-key count/sum state folds the
  *      feed (delta-sized aggregate);
  *   3. the content checksum folds THROUGH the same machinery
  *      ([[Profile.rowDigest]] is a plain decimal sum) — continuous
  *      sync validation without a fact rescan;
  *   4. [[IncrementalJoin.maintain]] — the materialized fact⨝dim view
  *      absorbs the same feed, state never shuffled.
  *
  * IncrementalSyncSpec proves every artifact equals its
  * recompute-the-world form after the refresh.
  */
object IncrementalSync {

  case class State(agg: DataFrame, checksum: DataFrame, joined: DataFrame)

  /** Derive the three artifacts from scratch (first sync / rebuild). */
  def init(snapshot: DataFrame, dim: DataFrame, idCol: String,
           joinKeys: Seq[String], aggKeys: Seq[String], value: Column,
           contentCols: Seq[String]): State = State(
    agg = IncrementalAgg.init(snapshot, aggKeys, value),
    checksum = IncrementalAgg.init(snapshot, aggKeys,
      Profile.rowDigest(contentCols)),
    joined = IncrementalJoin.joinOf(snapshot, dim, joinKeys))

  /** Refresh every artifact from the old→new snapshot diff. Work is
    * bounded by the drift, not the warehouse: one digest-join over the
    * snapshots decides the feed; each maintenance stage is delta-sized
    * (the join state is scanned, never shuffled).
    */
  def refresh(state: State, oldSnap: DataFrame, newSnap: DataFrame,
              dim: DataFrame, idCol: String, joinKeys: Seq[String],
              aggKeys: Seq[String], value: Column,
              contentCols: Seq[String]): State = {
    val feed = Reconcile.changeFeed(oldSnap, newSnap, Seq(idCol), contentCols)
    val emptyDim = dim.filter(lit(false))
    State(
      agg = IncrementalAgg.foldCdc(state.agg, feed, aggKeys, value, col("op")),
      checksum = IncrementalAgg.foldCdc(state.checksum, feed, aggKeys,
        Profile.rowDigest(contentCols), col("op")),
      joined = IncrementalJoin.maintain(state.joined, newSnap, feed,
        dim, emptyDim, joinKeys, idCol,
        // dim ids are its join keys here; dim-side deltas are out of
        // scope for a fact refresh (rerun init on dim changes)
        joinKeys.head))
  }
}
