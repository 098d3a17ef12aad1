package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Resample
import graft.streaming.StreamingResample
import graft.streaming.StreamingResample.{FillOut, Obs}

class StreamingResampleSpec extends SparkSuite {
  import spark.implicits._

  private def o(key: Long, epochSec: Long, v: Double) =
    Obs(key, new Timestamp(epochSec * 1000L), v)

  test("stream equals the batch forward fill over the watermark-closed slots") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Obs]
    // 5s delay: Spark's stateful late-row filter drops events at or
    // below the watermark, so an event landing EXACTLY on it (key 2's
    // 130 after batch 1 under a 0s delay) would silently vanish — real
    // pipelines always run a nonzero delay for exactly this reason
    val q = StreamingResample.forwardFill(
      stream.toDS().withWatermark("ts", "5 seconds").as[Obs], stepSeconds = 60L)
      .writeStream.outputMode("append").format("memory")
      .queryName("resample_out").start()
    try {
      // batch 1: irregular observations for two keys
      stream.addData(o(1, 100, 1.0), o(1, 130, 2.0), o(2, 70, 9.0))
      q.processAllAvailable()
      // batch 2: advance time past several empty slots for key 1
      stream.addData(o(1, 400, 3.0), o(2, 130, 8.0))
      q.processAllAvailable()
      // batch 3: push the watermark further so slot 420 closes too
      stream.addData(o(1, 430, 4.0), o(2, 430, 7.0))
      q.processAllAvailable()

      val got = spark.table("resample_out").as[FillOut].collect()
        .map(f => (f.key, f.grid_epoch, f.value_ff)).toSeq.sorted

      // the final watermark is max event time - 5s = 425; batch twin
      // truncated to watermark-closed slots must match exactly
      val all = Seq((1L, 100L, 1.0), (1L, 130L, 2.0), (1L, 400L, 3.0),
        (1L, 430L, 4.0), (2L, 70L, 9.0), (2L, 130L, 8.0), (2L, 430L, 7.0))
      val want = Resample.forwardFill(
          all.toDF("k", "t", "v"), "k", "t", "v", stepSeconds = 60L)
        .as[(Long, Long, Double)].collect().toSeq
        .filter(_._2 <= 425L).sorted
      assert(got === want)
      // the empty slots between 130 and 400 carried value 2.0 forward
      assert(got.contains((1L, 240L, 2.0)) && got.contains((1L, 300L, 2.0)))
    } finally q.stop()
  }

  test("out-of-order within the watermark delay lands in the right slot") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Obs]
    val q = StreamingResample.forwardFill(
      stream.toDS().withWatermark("ts", "100 seconds").as[Obs], stepSeconds = 60L)
      .writeStream.outputMode("append").format("memory")
      .queryName("resample_ooo").start()
    try {
      stream.addData(o(1, 100, 1.0), o(1, 250, 5.0))
      q.processAllAvailable() // watermark 150: only slot 120 closes
      stream.addData(o(1, 170, 3.0)) // out of order, above the watermark
      q.processAllAvailable()
      stream.addData(o(1, 500, 9.0)) // watermark 400: slots through 360 close
      q.processAllAvailable()
      val got = spark.table("resample_ooo").as[FillOut].collect()
        .map(f => (f.grid_epoch, f.value_ff)).toSeq.sorted
      // slot 180 must see the late-arriving 170 observation
      assert(got.contains((180L, 3.0)))
      assert(got.contains((240L, 3.0)))
      assert(got.contains((300L, 5.0))) // 250 folded
      assert(got === got.distinct, "no slot emits twice")
    } finally q.stop()
  }

  test("update emits nothing before the watermark reaches the first slot") {
    val st = new FakeFillState
    val out = StreamingResample.update(60L, 1000)(1L,
      Iterator(o(1, 100, 1.0)), st).toSeq
    assert(out.isEmpty) // FakeState has no watermark → nothing closes
    assert(st.getOption.exists(_.nextSlot == 120L))
    assert(st.getOption.exists(s => s.pendingT == Seq(100L)))
  }

  test("update caps a burst at maxSlotsPerInvoke and resumes from nextSlot") {
    val st = new FakeFillState { override def getCurrentWatermarkMs(): Long = 10000L * 1000L }
    val first = StreamingResample.update(60L, 5)(1L,
      Iterator(o(1, 30, 1.0)), st).toSeq
    assert(first.size === 5) // capped burst
    assert(first.map(_.grid_epoch) === Seq(60L, 120L, 180L, 240L, 300L))
    val resumed = StreamingResample.update(60L, 5)(1L, Iterator.empty, st).toSeq
    assert(resumed.map(_.grid_epoch) === Seq(360L, 420L, 480L, 540L, 600L))
    assert(resumed.forall(_.value_ff == 1.0))
  }
}

/** Minimal in-memory GroupState for unit-testing the update function. */
class FakeFillState
    extends org.apache.spark.sql.streaming.GroupState[StreamingResample.FillState] {
  private var v: Option[StreamingResample.FillState] = None
  override def exists: Boolean = v.isDefined
  override def get: StreamingResample.FillState = v.get
  override def getOption: Option[StreamingResample.FillState] = v
  override def update(s: StreamingResample.FillState): Unit = v = Some(s)
  override def remove(): Unit = v = None
  override def hasTimedOut: Boolean = false
  override def setTimeoutDuration(d: Long): Unit = ()
  override def setTimeoutDuration(d: String): Unit = ()
  override def setTimeoutTimestamp(t: Long): Unit = ()
  override def setTimeoutTimestamp(t: Long, additional: String): Unit = ()
  override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(t: java.sql.Date, additional: String): Unit = ()
  override def getCurrentWatermarkMs(): Long = throw new UnsupportedOperationException
  override def getCurrentProcessingTimeMs(): Long = System.currentTimeMillis()
}
