package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.AsOf
import graft.streaming.StreamingAttribution
import graft.streaming.StreamingAttribution.Ev

class StreamingAttributionSpec extends SparkSuite {
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0) =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:$sec%02d")
  private val DayMicros = 24L * 3600 * 1000000

  /** The batch reference: q_attribution_last_touch's exact logic. */
  private def batchCredits(events: Seq[Ev]) = {
    val ev = events.toDF()
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val touches = ev.filter($"event_type".isin("view", "click"))
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("touch_id"))
      .withColumn("touch_ts", $"ts")
    AsOf.joinAsOf(purchases, touches, Seq("user_id"), "ts",
        Seq("touch_id", "touch_ts"), direction = "backward")
      .select($"event_id",
        when($"asof_touch_ts".isNotNull &&
          $"ts".cast("long") - $"asof_touch_ts".cast("long") <= 86400L,
          $"asof_touch_id").as("credited"))
      .as[(Long, Option[Long])].collect().toMap
  }

  test("stream == batch across micro-batch splits, incl. same-ts touch ties") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_sattr")
    val batches = Seq(
      Seq(Ev(1, 1, ts(1), "view"), Ev(1, 2, ts(1), "click"), // same-ts tie -> id 2
          Ev(1, 3, ts(2), "purchase")),
      Seq(Ev(1, 4, ts(10), "purchase"),                       // still touch 2
          Ev(2, 5, ts(10), "view")),
      Seq(Ev(2, 6, ts(10), "purchase"),                       // same-ts as touch: inclusive
          Ev(1, 7, ts(20), "purchase")))                      // touch 2, within 24h
    val stream = MemoryStream[Ev]
    val out = StreamingAttribution.credits(
      stream.toDS().withWatermark("ts", "2 hours").as[Ev],
      lookbackMicros = DayMicros, idleTtlMicros = 7L * DayMicros)
    val q = out.writeStream.outputMode("append").format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .start()
    try batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    finally q.stop()

    val streamed = spark.read.parquet(s"$dir/out")
      .select($"purchase_id", $"credited_touch_id")
      .as[(Long, Option[Long])].collect().toMap
    val want = batchCredits(batches.flatten)
    assert(streamed == want)
    assert(streamed(3L).contains(2L))
    assert(streamed(6L).contains(5L)) // inclusive same-ts credit
  }

  test("lookback expiry: a stale touch yields a null credit, as in batch") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_sattr2")
    val events = Seq(
      Seq(Ev(1, 1, ts(1), "view")),
      Seq(Ev(1, 2, Timestamp.valueOf("2024-01-03 00:30:00"), "purchase")))
    val stream = MemoryStream[Ev]
    val out = StreamingAttribution.credits(
      stream.toDS().withWatermark("ts", "1 hour").as[Ev],
      lookbackMicros = DayMicros, idleTtlMicros = 30L * DayMicros)
    val q = out.writeStream.outputMode("append").format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .start()
    try events.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    val got = spark.read.parquet(s"$dir/out")
      .select($"purchase_id", $"credited_touch_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(got(2L).isEmpty)
    assert(got == batchCredits(events.flatten))
  }
}
