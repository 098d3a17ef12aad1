package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sync reconciliation: WHICH keys differ between a source and its
  * synced destination — the row-level complement of
  * [[Profile.groupChecksum]] (the group checksum says "something in g0
  * drifted"; this names the keys, the step an operator actually acts
  * on). The reference validates syncs by row count (TotalRowsAffected);
  * at 100 TB a count can match while content differs.
  *
  * Scale shape: content columns NEVER move — each side reduces to
  * (key, 60-bit row digest) map-side, so the one full-outer join
  * shuffles ~16 bytes/row regardless of row width, and the equal rows
  * (the overwhelming majority in a healthy sync) are dropped right
  * after the join. Statuses: `missing` (source only), `extra`
  * (destination only), `differs` (both present, digest mismatch; a
  * digest collision masking a real difference has probability 2⁻⁶⁰
  * per row). Keys must be unique per side (it is a sync contract);
  * digest portability rules are [[Profile.rowDigest]]'s.
  */
object Reconcile {

  /** Generate the CDC feed that turns `oldDf` into `newDf`: deletes
    * carry the old version, inserts the new, updates lower to
    * delete+insert — exactly the feed shape every incremental consumer
    * here eats ([[IncrementalAgg.foldCdc]], [[IncrementalJoin]],
    * [[Merge.applyCdc]], [[Scd.applyType2Feed]]), closing the loop for
    * sources that only publish snapshots (the reference's import model:
    * each sync IS a snapshot).
    *
    * Scale shape: the digest compare ([[diffKeys]]) decides WHO changed
    * with a 16-byte/row shuffle; full content then moves ONLY for the
    * changed keys, fetched by semi joins the optimizer broadcasts when
    * the drift is small (the healthy-sync case).
    */
  def changeFeed(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                 contentCols: Seq[String], opCol: String = "op"): DataFrame = {
    val diff = diffKeys(oldDf, newDf, keys, contentCols)
    val dels = oldDf.join(
      diff.filter(col("status").isin("missing", "differs"))
        .select(keys.map(col): _*), keys, "left_semi")
      .withColumn(opCol, lit("D"))
    val ins = newDf.join(
      diff.filter(col("status").isin("extra", "differs"))
        .select(keys.map(col): _*), keys, "left_semi")
      .withColumn(opCol, lit("I"))
    dels.unionByName(ins)
  }

  def diffKeys(src: DataFrame, dst: DataFrame, keys: Seq[String],
               contentCols: Seq[String]): DataFrame = {
    val s = src.select(keys.map(col) :+
      Profile.rowDigest(contentCols).as("__src_digest"): _*)
    val d = dst.select(keys.map(col) :+
      Profile.rowDigest(contentCols).as("__dst_digest"): _*)
    s.join(d, keys, "full_outer")
      .withColumn("status",
        when(col("__dst_digest").isNull, lit("missing"))
          .when(col("__src_digest").isNull, lit("extra"))
          .when(col("__src_digest") =!= col("__dst_digest"), lit("differs")))
      .filter(col("status").isNotNull)
      .select(keys.map(col) :+ col("status"): _*)
  }
}
