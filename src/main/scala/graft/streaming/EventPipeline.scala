package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming twins of the batch event queries.
  *
  * The reference is batch-only ETL; a modern pipeline runs the same
  * aggregations continuously. Each transform here takes ANY events
  * DataFrame — batch or streaming — so the logic is written once and the
  * ScalaTest suite proves stream output == batch output on the same rows
  * (the Structured Streaming unification contract).
  */
object EventPipeline {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Tumbling-window counts/sums per event type. On a stream, callers
    * add `.withWatermark("ts", ...)` upstream to bound state.
    */
  def tumblingAgg(events: DataFrame, windowLength: String = "1 hour"): DataFrame =
    events.groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        // round in DECIMAL (exact HALF_UP) before the double cast: a
        // double round-trip first can flip the last digit on half-cent
        // sums vs an exact-decimal engine
        round(sum(col("value").cast("decimal(30,6)")), 2).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Session windows per user with a 30-minute inactivity gap — the
    * built-in session_window keeps per-user state in the state store
    * (on a stream, watermark bounds it; in batch it degenerates to a
    * grouped agg).
    */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events.groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))

  /** Streaming exact dedup — the streaming twin of `q_dedup_exact`
    * (discardDuplicates, EcomDestinationWriter.cs:1042) for a continuous
    * feed: duplicate keys arriving within the watermark are dropped,
    * and the dedup state store stays BOUNDED by the watermark instead of
    * growing with the stream's lifetime (`dropDuplicatesWithinWatermark`
    * evicts key state once the event-time watermark passes it). On a
    * batch frame the operator is not defined in Spark, so this falls
    * back to plain `dropDuplicates` — same visible semantics, letting
    * the one pipeline definition serve both modes.
    */
  def dedupedStream(events: DataFrame, keys: Seq[String], tsCol: String = "ts",
                    watermark: String = "1 hour"): DataFrame =
    if (events.isStreaming)
      events.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(keys)
    else events.dropDuplicates(keys)

  /** Stream-stream interval join: each purchase attributed to the same
    * user's views in the preceding `within` window — the continuous twin
    * of funnel attribution. On streams BOTH sides carry watermarks and
    * the join predicate time-bounds purchase_ts against view_ts, which is
    * exactly what Structured Streaming needs to EVICT join state (a
    * buffered view can be dropped once the purchase-side watermark passes
    * view_ts + within; without the bound, state grows with the stream's
    * lifetime). Batch frames run the identical condition directly, so one
    * definition serves both modes and the spec proves stream == batch.
    */
  def intervalJoin(views: DataFrame, purchases: DataFrame,
                   within: String = "30 minutes",
                   watermark: String = "1 hour"): DataFrame = {
    val l = views.select(col("event_id").as("view_id"), col("user_id"),
      col("ts").as("view_ts"))
    val r = purchases.select(col("event_id").as("purchase_id"),
      col("user_id").as("__p_user"), col("ts").as("purchase_ts"),
      col("value").as("purchase_value"))
    val streaming = views.isStreaming || purchases.isStreaming
    val (lw, rw) =
      if (streaming) (l.withWatermark("view_ts", watermark),
        r.withWatermark("purchase_ts", watermark))
      else (l, r)
    lw.join(rw,
      col("user_id") === col("__p_user") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr(s"INTERVAL $within"))
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        col("view_ts"), col("purchase_ts"), col("purchase_value"))
  }

  /** Streaming reader over a parquet directory with the events schema
    * (file-source streaming; each new file is a micro-batch).
    */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)
}
