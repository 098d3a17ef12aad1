package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.{Drift, IncrementalAgg, IncrementalJoin, Profile, Reconcile}

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
  *      absorbs the same feed, state never shuffled;
  *   5. (optional) [[Drift]] bucket counts fold through the same feed —
  *      a sync can be row-complete and checksum-stable per surviving
  *      key yet DISTRIBUTION-shifted (a currency re-scale arrives as
  *      legitimate updates); the maintained counts score PSI against a
  *      frozen baseline without ever rescanning a snapshot.
  *
  * IncrementalSyncSpec proves every artifact equals its
  * recompute-the-world form after the refresh.
  */
object IncrementalSync {

  /** Drift monitoring config: `value` is scored into the FIXED buckets
    * `bucket` assigns (fixed is what makes a maintained baseline
    * comparison meaningful); [[driftAlarmed]] fires when total PSI vs
    * the frozen baseline reaches `alarmPpm` (default 250000 ppm = 0.25
    * — the published "population shifted" threshold). Build with
    * [[DriftSpec.numeric]] (boundary buckets) or
    * [[DriftSpec.categorical]] (frozen category list + OTHER) — both
    * lower to the same plain-grouped-count state, so the same foldCdc
    * maintenance serves value distributions and category mixes.
    */
  case class DriftSpec(value: Column, bucket: Column, nBuckets: Int,
                       alarmPpm: Long = 250000L)

  object DriftSpec {
    def numeric(value: Column, boundaries: Seq[Double],
                alarmPpm: Long = 250000L): DriftSpec =
      DriftSpec(value, Drift.bucketOf(value, boundaries),
        boundaries.size + 1, alarmPpm)

    /** `categories` is the frozen identity list (take it from
      * [[Drift.psiCategorical]]'s top-k on the baseline snapshot, or
      * from domain knowledge); the tail folds into the OTHER bucket.
      */
    def categorical(value: Column, categories: Seq[String],
                    alarmPpm: Long = 250000L,
                    otherLabel: String = "__OTHER__"): DriftSpec =
      DriftSpec(value, Drift.categoricalBucketOf(value, categories, otherLabel),
        categories.size + 1, alarmPpm)
  }

  /** `baseline` is frozen at [[init]]; `counts` stays current through
    * every [[refresh]]. Both are nBuckets-row frames in the
    * IncrementalAgg state schema (bucket, n_rows, total).
    */
  case class DriftState(spec: DriftSpec, baseline: DataFrame, counts: DataFrame)

  case class State(agg: DataFrame, checksum: DataFrame, joined: DataFrame,
                   drift: Option[DriftState] = None)

  private def bucketFeed(df: DataFrame, spec: DriftSpec, extra: Seq[Column]): DataFrame =
    df.filter(spec.value.isNotNull) // Drift.psi excludes nulls; match it
      .select(spec.bucket.as("bucket") +: extra: _*)

  /** Derive the artifacts from scratch (first sync / rebuild). */
  def init(snapshot: DataFrame, dim: DataFrame, idCol: String,
           joinKeys: Seq[String], aggKeys: Seq[String], value: Column,
           contentCols: Seq[String],
           driftSpec: Option[DriftSpec] = None): State = State(
    agg = IncrementalAgg.init(snapshot, aggKeys, value),
    checksum = IncrementalAgg.init(snapshot, aggKeys,
      Profile.rowDigest(contentCols)),
    joined = IncrementalJoin.joinOf(snapshot, dim, joinKeys),
    drift = driftSpec.map { sp =>
      // MATERIALIZE (nBuckets rows): a lazy plan here would re-read the
      // snapshot source on every later score — and in the warehouse
      // pattern the next sync overwrites that path in place, so a lazy
      // "baseline" would silently track the live data and the alarm
      // could never fire
      val counts = IncrementalAgg.init(bucketFeed(snapshot, sp, Nil),
        Seq("bucket"), lit(0)).localCheckpoint(true)
      DriftState(sp, counts, counts)
    })

  /** Refresh every artifact from the old→new snapshot diff. Work is
    * bounded by the drift, not the warehouse: one digest-join over the
    * snapshots decides the feed; each maintenance stage is delta-sized
    * (the join state is scanned, never shuffled; the drift counts fold
    * the feed into nBuckets rows).
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
        joinKeys.head),
      drift = state.drift.map { d =>
        // materialized per refresh (nBuckets rows) so the folded counts
        // never lazily re-derive through the snapshots they summarize
        d.copy(counts = IncrementalAgg.foldCdc(d.counts,
          bucketFeed(feed, d.spec, Seq(col("op"))), Seq("bucket"), lit(0),
          col("op")).localCheckpoint(true))
      })
  }

  /** Per-bucket PSI of the maintained counts vs the frozen baseline —
    * the [[Drift.psiFromCounts]] frame over two nBuckets-row inputs;
    * no snapshot is touched (score a persisted state and the plan scans
    * only the two count tables — IncrementalSyncSpec asserts it).
    */
  def driftScore(state: State): Option[DataFrame] = state.drift.map { d =>
    Drift.psiFromCounts(
      d.baseline.select(col("bucket"), col("n_rows").as("n_old")),
      d.counts.select(col("bucket"), col("n_rows").as("n_new")),
      d.spec.nBuckets)
  }

  /** True when total PSI vs the baseline has reached `alarmPpm` — the
    * "this sync moved the distribution" gate a caller checks after
    * [[refresh]] before promoting the sync. None if drift monitoring
    * wasn't configured at [[init]].
    */
  def driftAlarmed(state: State): Option[Boolean] = driftScore(state).map { s =>
    s.agg(coalesce(sum(col("psi_ppm")), lit(0L)).as("t")).head.getLong(0) >=
      state.drift.get.spec.alarmPpm
  }
}
