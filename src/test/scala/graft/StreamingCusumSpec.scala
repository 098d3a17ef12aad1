package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Recurrences
import graft.streaming.StreamingCusum
import graft.streaming.StreamingCusum.VEv

class StreamingCusumSpec extends SparkSuite {
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0) =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:$sec%02d")
  private val DayMicros = 24L * 3600 * 1000000

  test("alarm state persists across micro-batches; stream == batch") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_scusum")
    // target 10, threshold 25: +20 events add 10 each
    val batches = Seq(
      Seq(VEv(1, 1, ts(1), 20L), VEv(1, 2, ts(2), 20L)),  // s = 10, 20
      Seq(VEv(1, 3, ts(3), 20L),                          // s = 30 -> alarm, reset
          VEv(2, 4, ts(3), 100L)),                        // s = 90 -> alarm
      Seq(VEv(1, 5, ts(4), 5L), VEv(1, 6, ts(5), 40L)))   // s = 0, 30 -> alarm

    val stream = MemoryStream[VEv]
    val out = StreamingCusum.alarms(
      stream.toDS().withWatermark("ts", "2 hours").as[VEv],
      target = 10L, threshold = 25L, idleTtlMicros = DayMicros)
    val q = out.writeStream.outputMode("append").format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .start()
    try batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    finally q.stop()

    val streamed = spark.read.parquet(s"$dir/out")
      .select("event_id", "cusum_q").as[(Long, Long)].collect().sorted.toSeq
    assert(streamed === Seq((3L, 30L), (4L, 90L), (6L, 30L)))

    // equality with the batch operator over the concatenated feed
    val batchAlarms = Recurrences.cusumAlarms(
        batches.flatten.toDF().select($"user_id", $"event_id", $"ts", $"xq"),
        Seq("user_id"), Seq("ts", "event_id"), "xq", 10L, 25L)
      .select("event_id", "cusum_q").as[(Long, Long)].collect().sorted.toSeq
    assert(streamed === batchAlarms)
  }

  test("idle TTL evicts a silent key's statistic (restart semantics)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_scusum_state")
    val stream = MemoryStream[VEv]
    val out = StreamingCusum.alarms(
      stream.toDS().withWatermark("ts", "0 seconds").as[VEv],
      target = 10L, threshold = 100L, idleTtlMicros = 3600L * 1000000)
    val q = out.writeStream.outputMode("append").format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      def stateRows: Long = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      stream.addData(VEv(1, 1, ts(1), 50L)) // s = 40, idle horizon min 61
      q.processAllAvailable()
      assert(stateRows === 1)
      // key 2 pushes the watermark far past key 1's TTL
      stream.addData(VEv(2, 2, ts(300), 5L))
      q.processAllAvailable()
      stream.addData(VEv(2, 3, ts(310), 5L))
      q.processAllAvailable()
      assert(stateRows === 1, "idle key 1 must leave the store")
      // key 1 returns: statistic restarted from zero, no alarm from
      // the stale 40
      stream.addData(VEv(1, 4, ts(320), 60L)) // restart: s = 50 < 100
      q.processAllAvailable()
      val alarms = spark.read.parquet(s"$dir/out").count()
      assert(alarms === 0)
    } finally q.stop()
  }

  test("sub-watermark stragglers are dropped, not applied out of order") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_scusum_late")
    val stream = MemoryStream[VEv]
    val out = StreamingCusum.alarms(
      stream.toDS().withWatermark("ts", "0 seconds").as[VEv],
      target = 0L, threshold = 100L, idleTtlMicros = DayMicros)
    val q = out.writeStream.outputMode("append").format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      stream.addData(VEv(1, 1, ts(100), 50L)) // s = 50; watermark -> min 100
      q.processAllAvailable()
      // a straggler from min 1 would push s to 110 -> alarm; must drop
      stream.addData(VEv(1, 2, ts(1), 60L))
      q.processAllAvailable()
      assert(spark.read.parquet(s"$dir/out").count() === 0)
    } finally q.stop()
  }
}
