package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Staged-import merge semantics, Spark-first.
  *
  * The reference buffers incoming rows into temp tables and then merges
  * them into the live tables: UPDATE matched rows, INSERT unmatched, with
  * `updateOnly` / `insertOnly` switches (EcomDestinationWriter.cs:3165
  * `MoveDataToMainTables`, :3220 `MoveDataToMainTable`), plus full-sync
  * deletes of destination rows missing from the import
  * (EcomDestinationWriter.cs:3067 `DeleteExcessFromMainTable`) or a
  * soft-hide flag instead (`hideDeactivatedProducts`).
  *
  * Here each mode is a declarative join the optimizer can reorder, prune
  * and (for small incoming batches) broadcast. All joins shuffle on the
  * business key only once; at 100 TB both sides hash-partition on `keys`
  * and AQE converts to broadcast when the incoming batch is small.
  */
object Merge {

  /** UPDATE matched + INSERT unmatched (MoveDataToMainTable with both
    * flags false). Incoming values win for matched rows; destination rows
    * with no incoming match pass through; incoming rows with no match are
    * inserted. Full outer join on the key, `coalesce(incoming, dest)` per
    * non-key column.
    */
  def upsert(dest: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame = {
    val in = incoming.select(incoming.columns.map(c =>
      if (keys.contains(c)) col(c) else col(c).as(s"__in_$c")): _*)
    val joined = dest.join(in, keys, "full_outer")
    val merged = dest.columns.map { c =>
      if (keys.contains(c)) col(c)
      else if (incoming.columns.contains(c)) coalesce(col(s"__in_$c"), col(c)).as(c)
      else col(c)
    }
    joined.select(merged: _*)
  }

  /** updateOnly: matched destination rows get incoming values; unmatched
    * incoming rows are DISCARDED, unmatched destination rows unchanged.
    */
  def updateExisting(dest: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame = {
    val in = incoming.select(incoming.columns.map(c =>
      if (keys.contains(c)) col(c) else col(c).as(s"__in_$c")): _*)
    val joined = dest.join(in, keys, "left_outer")
    val merged = dest.columns.map { c =>
      if (keys.contains(c)) col(c)
      else if (incoming.columns.contains(c)) coalesce(col(s"__in_$c"), col(c)).as(c)
      else col(c)
    }
    joined.select(merged: _*)
  }

  /** insertOnly: incoming rows whose key is NOT already in dest. */
  def insertMissing(dest: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    incoming.join(dest.select(keys.map(col): _*), keys, "left_anti")

  /** Full-sync delete set: destination rows absent from the import
    * (the rows DeleteExcessFromMainTable would delete).
    */
  def deleteExcess(dest: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    dest.join(incoming.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /** SCOPED full-sync delete set: only destination rows whose scope
    * value appears in the incoming batch are delete candidates. The
    * reference applies exactly this guard so a one-language / one-shop
    * import deletes only that scope's rows instead of wiping every other
    * language (EcomDestinationWriter.cs:3067-3091 `GetExtraConditions`,
    * `GetDeleteFromSpecificLanguageExtraCondition`). An unscoped
    * full-sync on a partial import is the classic data-loss bug this
    * prevents.
    *
    * The scope set is a distinct over the batch — tiny — so the
    * membership join broadcasts; the key anti-join is the same single
    * keyed shuffle as [[deleteExcess]].
    */
  def deleteExcessScoped(dest: DataFrame, incoming: DataFrame, keys: Seq[String],
                         scopeCols: Seq[String]): DataFrame = {
    val scopes = incoming.select(scopeCols.map(col): _*).distinct()
    dest.join(broadcast(scopes), scopeCols, "left_semi")
      .join(incoming.select(keys.map(col): _*).distinct(), keys, "left_anti")
  }

  /** Apply a CDC change feed: the modern form of the reference's staged
    * sync (MoveDataToMainTable upsert + DeleteExistingFromMainTable,
    * EcomDestinationWriter.cs:3220,3116) when the source emits
    * per-row change events instead of full snapshots. Per key, only the
    * LATEST change (by `orderCol`; equal versions break ties by op then
    * every attribute column in name order, so repeated runs over the
    * same feed always apply the SAME change — a version-only window
    * would resolve equal-version changes nondeterministically) applies:
    * a delete op removes the row, anything else upserts
    * the change's values. One keyed dedup shuffle over the (small)
    * change feed + the standard merge joins — the destination never
    * shuffles more than a plain upsert.
    *
    * @param orderCol version/sequence column on `changes` — highest wins
    * @param opCol    operation column on `changes`; rows with value
    *                 `deleteOp` are tombstones
    */
  def applyCdc(dest: DataFrame, changes: DataFrame, keys: Seq[String],
               orderCol: String, opCol: String,
               deleteOp: String = "D"): DataFrame = {
    val tiebreak = changes.columns
      .filterNot(c => keys.contains(c) || c == orderCol).sorted
      .map(c => col(c).asc_nulls_last).toSeq
    val latest = Dedup.keepFirst(changes, keys, col(orderCol).desc +: tiebreak)
    val tombstones = latest.filter(col(opCol) === deleteOp)
      .select(keys.map(col): _*)
    val upserts = latest.filter(col(opCol) =!= deleteOp)
      .drop(opCol, orderCol)
    upsert(dest, upserts, keys)
      .join(tombstones, keys, "left_anti")
  }

  /** Soft-hide variant: keep all destination rows, flag whether each still
    * exists in the import (hideDeactivatedProducts semantics).
    */
  def flagMissing(dest: DataFrame, incoming: DataFrame, keys: Seq[String],
                  flagCol: String): DataFrame = {
    val present = incoming.select(keys.map(col): _*).distinct()
      .withColumn("__present", lit(1))
    dest.join(present, keys, "left_outer")
      .withColumn(flagCol, col("__present").isNotNull)
      .drop("__present")
  }
}
