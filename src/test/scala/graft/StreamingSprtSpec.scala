package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Stats
import graft.streaming.StreamingSprt
import graft.streaming.StreamingSprt.Obs

class StreamingSprtSpec extends SparkSuite {
  import spark.implicits._

  private def ts(min: Int) =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:00")

  test("one decision per arm at the crossing; equals the batch first-crossing") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_ssprt")
    val (l1, l0, up, lo) = Stats.sprtConstants(3000L, 7000L, 500L, 500L)
    // arm 0: steady successes -> accepts H1 quickly; split across
    // batches so the crossing happens mid-stream with carried state.
    // arm 1: steady failures -> accepts H0.
    val a0 = (1 to 12).map(i => Obs(0L, i.toLong, ts(i), 1L))
    val a1 = (1 to 12).map(i => Obs(1L, 100 + i.toLong, ts(i), 0L))
    val batches = Seq(
      (a0.take(2) ++ a1.take(2)),
      (a0.slice(2, 7) ++ a1.slice(2, 7)),
      (a0.drop(7) ++ a1.drop(7)))

    val stream = MemoryStream[Obs]
    val out = StreamingSprt.decisions(
      stream.toDS().withWatermark("ts", "2 hours").as[Obs], l1, l0, up, lo)
    val q = out.writeStream.outputMode("append").format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .start()
    try batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    finally q.stop()

    val streamed = spark.read.parquet(s"$dir/out")
      .select("arm", "n_decide", "decision", "llr_bp")
      .as[(Long, Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(streamed.length == 2, "exactly ONE decision row per arm")

    // batch reference over the same ordered feed
    val batch = Stats.sprt(
        batches.flatten.toDF().withColumn("x", $"x"),
        "arm", Seq(col("ts"), col("event_id")), "x", 3000L, 7000L)
      .filter(col("decision") =!= "undecided")
      .select("arm", "n_decide", "decision", "llr_bp")
      .as[(Long, Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(streamed == batch)
  }

  test("post-decision observations are ignored; stragglers dropped") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_ssprt2")
    val (l1, l0, up, lo) = Stats.sprtConstants(3000L, 7000L, 500L, 500L)
    val stream = MemoryStream[Obs]
    val out = StreamingSprt.decisions(
      stream.toDS().withWatermark("ts", "0 seconds").as[Obs], l1, l0, up, lo)
    val q = out.writeStream.outputMode("append").format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      stream.addData((1 to 10).map(i => Obs(0L, i.toLong, ts(100 + i), 1L)): _*)
      q.processAllAvailable()
      val afterFirst = spark.read.parquet(s"$dir/out").count()
      assert(afterFirst == 1L)
      // more successes after the decision: no second row
      stream.addData(Obs(0L, 50L, ts(150), 1L))
      q.processAllAvailable()
      // a pre-watermark straggler for a FRESH arm: dropped, no state
      stream.addData(Obs(1L, 60L, ts(1), 1L))
      q.processAllAvailable()
      assert(spark.read.parquet(s"$dir/out").count() == 1L)
    } finally q.stop()
  }
}
