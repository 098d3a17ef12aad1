package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Debounce
import graft.streaming.StreamingDebounce
import graft.streaming.StreamingDebounce.Ev

class StreamingDebounceSpec extends SparkSuite {
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0) =
    Timestamp.valueOf(f"2024-01-01 ${min / 60}%02d:${min % 60}%02d:$sec%02d")
  private val Gap = 10L * 60 * 1000000 // 10 min in micros

  test("suppression state carries across micro-batches; stream == batch") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_sdb")
    val batches = Seq(
      // batch 1: u1 keeps min 0, suppresses 5 and 9
      Seq(Ev(1, "view", 1, ts(0)), Ev(1, "view", 2, ts(5)), Ev(1, "view", 3, ts(9))),
      // batch 2: min 14 ≥ 0+10 → kept even though 9 was the last SEEN;
      // u2's first event kept; u1/click independent of u1/view
      Seq(Ev(1, "view", 4, ts(14)), Ev(2, "view", 5, ts(14)),
        Ev(1, "click", 6, ts(15))),
      // batch 3: min 20 < 14+10 suppressed; min 24 kept
      Seq(Ev(1, "view", 7, ts(20)), Ev(1, "view", 8, ts(24))))

    val stream = MemoryStream[Ev]
    val out = StreamingDebounce.suppress(
      stream.toDS().withWatermark("ts", "2 hours").as[Ev], Gap)
    val q = out.writeStream.outputMode("append").format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()

    val streamed = spark.read.parquet(s"$dir/out")
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(streamed === Seq(1L, 4L, 5L, 6L, 8L))

    // equality with the batch operator over the concatenated feed
    val all = batches.flatten.toDF()
    val batchKept = Debounce.suppress(all, Seq("user_id", "event_type"), "ts",
      Gap, tiebreak = Seq("event_id"))
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(streamed === batchKept)
  }

  test("late events below the watermark are dropped, never wrongly kept") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_sdb_late")
    val stream = MemoryStream[Ev]
    // zero-delay watermark: it advances to each batch's max event time
    val out = StreamingDebounce.suppress(
      stream.toDS().withWatermark("ts", "0 seconds").as[Ev], Gap)
    val q = out.writeStream.outputMode("append").format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      // batch 1: keep min 0; watermark advances to ~min 50
      stream.addData(Ev(1, "view", 1, ts(0)), Ev(1, "view", 2, ts(50)))
      q.processAllAvailable()
      // batch 2: a LATE event at min 5 — inside the suppression window
      // of the kept min-0 event; without the in-function guard a state
      // eviction could let it through. It must never appear.
      stream.addData(Ev(1, "view", 3, ts(5)), Ev(1, "view", 4, ts(65)))
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.read.parquet(s"$dir/out")
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(1L, 2L, 4L), s"late event 3 must be dropped: $kept")
  }

  test("state store bound: keys evict once the watermark passes lastKept + gap") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_sdb_state")
    val stream = MemoryStream[Ev]
    val out = StreamingDebounce.suppress(
      stream.toDS().withWatermark("ts", "0 seconds").as[Ev], Gap)
    val q = out.writeStream.outputMode("append").format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      def stateRows: Long = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      stream.addData(Ev(1, "view", 1, ts(0)))
      q.processAllAvailable()
      assert(stateRows === 1)
      // two later keys march the watermark far past u1's horizon
      // (0 + 10min); an engine that never evicts would hold 3 rows
      stream.addData(Ev(2, "view", 2, ts(60)))
      q.processAllAvailable()
      stream.addData(Ev(3, "view", 3, ts(70)))
      q.processAllAvailable()
      assert(stateRows === 2,
        "u1's state must leave the store once the watermark passes its horizon")
    } finally q.stop()
  }

  test("batch frames run the same definition without a watermark") {
    val kept = StreamingDebounce.suppress(
      Seq(Ev(9, "view", 1, ts(0)), Ev(9, "view", 2, ts(5)),
        Ev(9, "view", 3, ts(11))).toDS(), Gap)
      .collect().map(_.event_id).sorted.toSeq
    assert(kept === Seq(1L, 3L))
  }
}
