package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Drift

/** Streaming twin of [[graft.operators.Drift.psiSeries]]: maintain the
  * (period, bucket) count summary continuously from an event stream and
  * score the period-over-period PSI timeline from PERSISTED state —
  * zero event rescans, ever.
  *
  * Replay exactness for free: each micro-batch writes its (period,
  * bucket, n) DELTA as a `batch=<id>` OVERWRITE partition — a replayed
  * batch overwrites its own delta with identical content, so the
  * summed-counts read is correct at ANY crash point with no markers, no
  * driver state, no last-batch guard (deltas are idempotent by layout
  * where in-place folds need the full StreamingImport machinery).
  * Late events are not a correctness concern: a late row lands in its
  * TRUE period's counts whenever it arrives, and the next `score()`
  * reflects it — the timeline is always the timeline of the data seen
  * so far.
  *
  * State size: periods × buckets rows spread across batch-delta
  * partitions; `Sink.compact`-style consolidation applies when batch
  * count grows (reads already aggregate, so compaction is an
  * optimization, not correctness).
  */
class StreamingDriftSeries(countsDir: String, valueCol: String,
                           boundaries: Seq[Double], periodExpr: String)
  extends Serializable {

  private val nb = boundaries.length + 1

  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    val delta = batch.filter(col(valueCol).isNotNull)
      .groupBy(expr(periodExpr).as("period"),
        Drift.bucketOf(col(valueCol), boundaries).as("bucket"))
      .agg(count(lit(1)).as("n"))
    delta.write.mode("overwrite").parquet(s"$countsDir/batch=$batchId")
  }

  /** The maintained (period, bucket, n) summary — equals a full rescan
    * of everything ingested (spec-proven).
    */
  def counts(spark: SparkSession): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(countsDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = if (!fs.exists(p)) Nil
      else fs.listStatus(p).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
        .filter(st => fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
        .map(_.getPath.toString)
    if (dirs.isEmpty)
      spark.range(0).select(col("id").as("period"), col("id").as("bucket"),
        col("id").as("n")).limit(0)
    else spark.read.parquet(dirs: _*)
      .groupBy(col("period"), col("bucket")).agg(sum(col("n")).as("n"))
  }

  /** The full PSI timeline from persisted counts alone. */
  def score(spark: SparkSession): DataFrame =
    Drift.psiSeriesFromCounts(counts(spark), nb)

  def start(stream: DataFrame, checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: Long) => processBatch(b, id))
      .start()
}
