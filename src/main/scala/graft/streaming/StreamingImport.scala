package graft.streaming

import org.apache.spark.sql.DataFrame
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

  /** One micro-batch merge (also directly callable for batch backfill). */
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
}
