package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Resample
import graft.streaming.StreamingTwa
import graft.streaming.StreamingTwa.VEv

class StreamingTwaSpec extends SparkSuite {
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0) =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:$sec%02d")
  private val DayMicros = 24L * 3600 * 1000000

  test("running TWA across micro-batches; last row per key == batch operator") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_stwa")
    // key 1: 100 for 60s, 200 for 120s, then closes at a fourth event
    val batches = Seq(
      Seq(VEv(1, 1, ts(1), 100L), VEv(1, 2, ts(2), 200L)),
      Seq(VEv(1, 3, ts(4), 400L), VEv(2, 4, ts(4), 7L)),
      Seq(VEv(1, 5, ts(5), 0L), VEv(2, 6, ts(6), 9L)))

    val stream = MemoryStream[VEv]
    val out = StreamingTwa.running(
      stream.toDS().withWatermark("ts", "2 hours").as[VEv],
      idleTtlMicros = DayMicros)
    val q = out.writeStream.outputMode("append").format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .start()
    try batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    finally q.stop()

    val rows = spark.read.parquet(s"$dir/out")
      .select("user_id", "event_id", "twa", "span_s", "n_obs")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._2)
    // k1 e2: 100 held 60s -> 100 ; e3: (100*60 + 200*120)/180 = 166
    // e5: (6000+24000+400*60)/240 = 225 ; k2 e6: 7 held 120s -> 7
    assert(rows.toSeq === Seq(
      (1L, 2L, 100L, 60L, 2L), (1L, 3L, 166L, 180L, 3L),
      (1L, 5L, 225L, 240L, 4L), (2L, 6L, 7L, 120L, 2L)))

    // the LAST streamed row per key equals the batch operator
    val batch = Resample.timeWeightedAvg(
        batches.flatten.toDF()
          .select($"user_id", $"ts", $"event_id", $"vq".as("v")),
        "user_id", "ts", "event_id", "v")
      .select("user_id", "n_obs", "span_s", "twa")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val lastPerKey = rows.groupBy(_._1).map(_._2.maxBy(_._2))
      .map(r => (r._1, r._5, r._4, r._3)).toSeq.sortBy(_._1)
    assert(lastPerKey === batch)
  }

  test("idle TTL evicts; a re-appearing key starts a fresh window") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_stwa_ttl")
    val stream = MemoryStream[VEv]
    val out = StreamingTwa.running(
      stream.toDS().withWatermark("ts", "0 seconds").as[VEv],
      idleTtlMicros = 3600L * 1000000)
    val q = out.writeStream.outputMode("append").format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      def stateRows: Long = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      stream.addData(VEv(1, 1, ts(1), 100L))
      q.processAllAvailable()
      assert(stateRows === 1)
      stream.addData(VEv(2, 2, ts(300), 5L))
      q.processAllAvailable()
      stream.addData(VEv(2, 3, ts(310), 5L))
      q.processAllAvailable()
      assert(stateRows === 1, "idle key 1 must leave the store")
      // key 1 returns long after: NO segment bridges the TTL gap
      stream.addData(VEv(1, 4, ts(320), 999L))
      q.processAllAvailable()
      val k1 = spark.read.parquet(s"$dir/out")
        .filter($"user_id" === 1L).count()
      assert(k1 === 0, "fresh window: first event emits nothing")
    } finally q.stop()
  }

  test("above-watermark but behind-state events drop: no negative segment") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_stwa_ooo")
    val stream = MemoryStream[VEv]
    // 3-hour watermark lag leaves room for an event that is above the
    // watermark yet OLDER than the key's last processed event
    val out = StreamingTwa.running(
      stream.toDS().withWatermark("ts", "3 hours").as[VEv],
      idleTtlMicros = DayMicros)
    val q = out.writeStream.outputMode("append").format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      stream.addData(VEv(1, 1, ts(10), 100L), VEv(1, 2, ts(20), 100L))
      q.processAllAvailable()
      // older than ts(20) but above the lagging watermark: applying it
      // would close a negative segment — it must drop instead
      stream.addData(VEv(1, 3, ts(15), 999L))
      q.processAllAvailable()
      stream.addData(VEv(1, 4, ts(30), 0L))
      q.processAllAvailable()
      val rows = spark.read.parquet(s"$dir/out")
        .select("event_id", "span_s", "twa")
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      // e2: 100 held 600s; e4: +100 held another 600s — e3 never applied
      assert(rows.toSeq == Seq((2L, 600L, 100L), (4L, 1200L, 100L)))
    } finally q.stop()
  }

  test("sub-watermark stragglers never re-open a closed segment") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_stwa_late")
    val stream = MemoryStream[VEv]
    val out = StreamingTwa.running(
      stream.toDS().withWatermark("ts", "0 seconds").as[VEv],
      idleTtlMicros = DayMicros)
    val q = out.writeStream.outputMode("append").format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      stream.addData(VEv(1, 1, ts(100), 50L))
      q.processAllAvailable()
      stream.addData(VEv(1, 2, ts(1), 9999L)) // pre-watermark: dropped
      q.processAllAvailable()
      assert(spark.read.parquet(s"$dir/out").count() === 0)
    } finally q.stop()
  }
}
