package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.Recurrences
import graft.streaming.StreamingHolt
import graft.streaming.StreamingHolt.VEv

class StreamingHoltSpec extends SparkSuite {
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0) =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:$sec%02d")
  private val DayMicros = 24L * 3600 * 1000000

  test("level/trend state persists across micro-batches; stream == batch") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_sholt")
    // a collapsing then recovering series exercises negative trend state
    val batches = Seq(
      Seq(VEv(1, 1, ts(1), 1000L), VEv(1, 2, ts(2), 900L)),
      Seq(VEv(1, 3, ts(3), 50L), VEv(2, 4, ts(3), 77L)),
      Seq(VEv(1, 5, ts(4), 40L), VEv(1, 6, ts(5), 2000L), VEv(2, 7, ts(6), 91L)))

    val stream = MemoryStream[VEv]
    val out = StreamingHolt.fitted(
      stream.toDS().withWatermark("ts", "2 hours").as[VEv],
      aNum = 1L, aDen = 4L, bNum = 1L, bDen = 4L, idleTtlMicros = DayMicros)
    val q = out.writeStream.outputMode("append").format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .start()
    try batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    finally q.stop()

    val streamed = spark.read.parquet(s"$dir/out")
      .select("event_id", "holt_q").as[(Long, Long)].collect().sorted.toSeq
    val batch = Recurrences.holt(
        batches.flatten.toDF().select($"user_id", $"event_id", $"ts", $"xq"),
        Seq("user_id"), Seq("ts", "event_id"), "xq", 1L, 4L, 1L, 4L)
      .select("event_id", "holt_q").as[(Long, Long)].collect().sorted.toSeq
    assert(streamed === batch)
    assert(streamed.length === batches.flatten.length)
  }

  test("idle TTL evicts a silent key's smoother (cold restart)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_sholt_state")
    val stream = MemoryStream[VEv]
    val out = StreamingHolt.fitted(
      stream.toDS().withWatermark("ts", "0 seconds").as[VEv],
      aNum = 1L, aDen = 4L, bNum = 1L, bDen = 4L,
      idleTtlMicros = 3600L * 1000000)
    val q = out.writeStream.outputMode("append").format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      def stateRows: Long = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      stream.addData(VEv(1, 1, ts(1), 1000L))
      q.processAllAvailable()
      assert(stateRows === 1)
      // key 2 pushes the watermark far past key 1's TTL
      stream.addData(VEv(2, 2, ts(300), 500L))
      q.processAllAvailable()
      stream.addData(VEv(2, 3, ts(310), 500L))
      q.processAllAvailable()
      assert(stateRows === 1, "idle key 1 must leave the store")
      // key 1 returns cold: the first fitted value is the raw x (l=x,
      // b=0), NOT a continuation of the stale level 1000
      stream.addData(VEv(1, 4, ts(320), 200L))
      q.processAllAvailable()
      val restarted = spark.read.parquet(s"$dir/out")
        .filter($"event_id" === 4L).select("holt_q").as[Long].head()
      assert(restarted === 200L)
    } finally q.stop()
  }

  test("sub-watermark stragglers are dropped, not applied out of order") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_sholt_late")
    val stream = MemoryStream[VEv]
    val out = StreamingHolt.fitted(
      stream.toDS().withWatermark("ts", "0 seconds").as[VEv],
      aNum = 1L, aDen = 4L, bNum = 1L, bDen = 4L, idleTtlMicros = DayMicros)
    val q = out.writeStream.outputMode("append").format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      stream.addData(VEv(1, 1, ts(100), 1000L))
      q.processAllAvailable() // watermark advances to ts(100)
      // a straggler far below the watermark must not perturb the level
      stream.addData(VEv(1, 2, ts(1), 999999L))
      q.processAllAvailable()
      stream.addData(VEv(1, 3, ts(101), 1000L))
      q.processAllAvailable()
      val rows = spark.read.parquet(s"$dir/out")
        .select("event_id", "holt_q").as[(Long, Long)].collect().toMap
      assert(!rows.contains(2L), "straggler must be dropped")
      assert(rows(3L) === 1000L) // flat series stays at the level
    } finally q.stop()
  }
}
