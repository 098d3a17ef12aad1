package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.streaming.StreamingDebounce.Ev
import graft.streaming.StreamingRateLimit

class StreamingRateLimitSpec extends SparkSuite {
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0) =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:$sec%02d")
  private val HourMicros = 3600L * 1000000

  test("cap persists across micro-batches and resets on the window roll") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_srl")
    val batches = Seq(
      // hour 0: events 1,2 kept; 3 would be the 3rd → capped at 2
      Seq(Ev(1, "view", 1, ts(1)), Ev(1, "view", 2, ts(2)), Ev(1, "view", 3, ts(3))),
      // still hour 0 in a NEW batch: state remembers the count → capped
      Seq(Ev(1, "view", 4, ts(30)), Ev(2, "view", 5, ts(30))),
      // hour 1: window rolled → count resets
      Seq(Ev(1, "view", 6, ts(61)), Ev(1, "view", 7, ts(62)), Ev(1, "view", 8, ts(63))))

    val stream = MemoryStream[Ev]
    val out = StreamingRateLimit.limit(
      stream.toDS().withWatermark("ts", "6 hours").as[Ev], HourMicros, 2)
    val q = out.writeStream.outputMode("append").format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .start()
    try batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    finally q.stop()

    val streamed = spark.read.parquet(s"$dir/out")
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(streamed === Seq(1L, 2L, 5L, 6L, 7L))

    // equality with the batch rank-window form over the concatenation
    val w = Window.partitionBy($"user_id", $"event_type",
      date_trunc("hour", $"ts")).orderBy($"ts", $"event_id")
    val batchKept = batches.flatten.toDF()
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(streamed === batchKept)
  }

  test("state store bound: a key's window state evicts once the watermark passes its end") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_srl_state")
    val stream = MemoryStream[Ev]
    val out = StreamingRateLimit.limit(
      stream.toDS().withWatermark("ts", "0 seconds").as[Ev], HourMicros, 2)
    val q = out.writeStream.outputMode("append").format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      def stateRows: Long = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      stream.addData(Ev(1, "view", 1, ts(1))) // hour-0 window, ends min 60
      q.processAllAvailable()
      assert(stateRows === 1)
      // a later key pushes the watermark to min 200 ≫ u1's window end;
      // an engine that never evicts would hold 2 rows forever
      stream.addData(Ev(2, "view", 2, ts(200)))
      q.processAllAvailable()
      stream.addData(Ev(2, "view", 3, ts(210)))
      q.processAllAvailable()
      assert(stateRows === 1,
        "u1's rolled-past window state must leave the store")
    } finally q.stop()
  }
}
