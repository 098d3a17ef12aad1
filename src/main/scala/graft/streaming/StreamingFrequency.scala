package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters — the continuous twin of
  * `graft.operators.HeavyHitters`: a Misra–Gries summary maintained in
  * the state store, updated per micro-batch, snapshot-emitted so a
  * downstream exact-verify (or dashboard) always has current candidates.
  *
  * Keys are hash-SHARDED and a shard's whole key set lives in that shard
  * (the shard id is a function of the key), so the per-shard MG bound
  * carries the batch guarantee over: a key with global count
  * C ≥ phi·n has C > shardTotal/(capacity+1) whenever
  * phi > 1/(capacity+1), hence a positive residual in its shard's
  * summary — NO false negatives, on a stream, with state bounded at
  * shards × capacity entries forever.
  */
object StreamingFrequency {

  case class Keyed(shard: Int, key: String)
  case class MgState(counts: Map[String, Long], total: Long)
  case class CandidateOut(shard: Int, key: String, residual: Long,
                          shard_total: Long)

  /** Fold new keys into one shard's MG summary, REUSING the batch
    * operator's weighted kernel (the prior summary's entries enter as
    * weights — the standard mergeable-summaries fold), so the eviction
    * rule and its error bound live in exactly one place.
    */
  private[graft] def updateShard(capacity: Int)(
      shard: Int, rows: Iterator[Keyed],
      state: GroupState[MgState]): Iterator[CandidateOut] = {
    val prev = state.getOption.getOrElse(MgState(Map.empty, 0L))
    var batchRows = 0L
    val unit = rows.map { r => batchRows += 1L; (r.key, 1L) }
    val merged = graft.operators.HeavyHitters
      .mgFold(prev.counts.iterator ++ unit, capacity).toMap
    val total = prev.total + batchRows
    state.update(MgState(merged, total))
    merged.iterator.map { case (k, c) => CandidateOut(shard, k, c, total) }
  }

  /** Continuous candidate stream: emits each touched shard's full
    * summary snapshot per micro-batch (Update mode — consumers keep the
    * latest row per (shard, key)). `keyCol` must be a string column.
    */
  def candidates(events: DataFrame, keyCol: String, shards: Int = 32,
                 capacity: Int = 1023): Dataset[CandidateOut] = {
    val session = events.sparkSession
    import session.implicits._
    events
      .filter(col(keyCol).isNotNull) // match the batch operator's contract
      .select(pmod(xxhash64(col(keyCol)), lit(shards)).cast("int").as("shard"),
        col(keyCol).cast("string").as("key"))
      .as[Keyed]
      .groupByKey(_.shard)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(updateShard(capacity))
  }
}
