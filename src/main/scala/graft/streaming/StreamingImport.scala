package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Merge

/** Continuous staged import: the reference's temp-table → merge cycle
  * (EcomProvider.RunJob per scheduled batch), re-expressed as a
  * Structured Streaming sink — every micro-batch upserts into the
  * destination via `foreachBatch` + [[Merge.upsert]]. Exactly-once per
  * batch comes from the checkpoint; the destination swap is
  * materialize-then-overwrite (a table format with ACID merge slots in
  * here unchanged).
  */
object StreamingImport {

  def start(stream: DataFrame, destPath: String, keys: Seq[String],
            checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch((batch: DataFrame, _: Long) => upsertBatch(batch, destPath, keys))
      .start()

  /** One micro-batch merge (also directly callable for batch backfill).
    * NOTE: rewrites the whole destination — use [[upsertBatchPartitioned]]
    * for any destination big enough to partition (i.e., all of them at
    * scale); this unpartitioned form is only for small dimension tables.
    */
  def upsertBatch(batch: DataFrame, destPath: String, keys: Seq[String]): Unit = {
    val spark = batch.sparkSession
    val destExists = new java.io.File(destPath).exists()
    val merged = if (destExists)
      Merge.upsert(spark.read.parquet(destPath), batch, keys)
    else batch
    // cut lineage before overwriting the directory being read
    // (localCheckpoint materializes; cached-parquet re-read can't occur)
    merged.localCheckpoint(true).write.mode("overwrite").parquet(destPath)
  }

  /** Partition-scoped micro-batch merge: cost O(touched partitions), not
    * O(|dest|). Only the partitions present in the batch are read
    * (partition-pruned scan), merged, and swapped (dynamic partition
    * overwrite) — a 100 TB destination with a day-partitioned layout
    * rewrites one day per batch, and untouched partitions' files are
    * never opened or replaced. The reference stages only incoming rows
    * per batch (CreateTempTables, EcomDestinationWriter.cs:234); this is
    * the partitioned-parquet equivalent (a table format with ACID MERGE
    * slots in unchanged).
    */
  def upsertBatchPartitioned(batch: DataFrame, destPath: String,
                             keys: Seq[String], partCol: String): Unit = {
    val spark = batch.sparkSession
    val destExists = new java.io.File(destPath).exists()
    // the batch's touched partition values: one distinct over a
    // micro-batch, bounded by the batch's partition spread — driver-safe
    val touched = batch.select(partCol).distinct().collect().map(_.get(0))
    val merged = if (destExists && touched.nonEmpty) {
      val dest = spark.read.parquet(destPath)
        .filter(col(partCol).isin(touched: _*)) // prunes to touched dirs
      Merge.upsert(dest, batch, keys)
    } else batch
    merged.localCheckpoint(true).write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol)
      .parquet(destPath)
  }

  def startPartitioned(stream: DataFrame, destPath: String, keys: Seq[String],
                       partCol: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch((batch: DataFrame, _: Long) =>
        upsertBatchPartitioned(batch, destPath, keys, partCol))
      .start()
}
