package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingDriftSeries

case class DriftEv(epoch_s: Long, value: Double)

class StreamingDriftSeriesSpec extends SparkSuite {
  import spark.implicits._

  private val bounds = Seq(25.0, 50.0, 75.0, 100.0)
  // days 0..3, day 3 re-scaled (the alarm day)
  private val events = for (d <- 0 to 3; i <- 0 until 200) yield {
    val v = (i % 100).toDouble + 1.0
    DriftEv(d.toLong * 86400L + i, if (d == 3) v * 4 else v)
  }

  private def batchTimeline = graft.operators.Drift.psiSeries(
    events.toDF("epoch_s", "value"), col("value"), bounds,
    expr("epoch_s div 86400"))

  test("streamed counts score the identical timeline as the batch form") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_sdrift")
    val sds = new StreamingDriftSeries(s"$dir/counts", "value", bounds,
      "epoch_s div 86400")
    val stream = MemoryStream[DriftEv]
    val q = sds.start(stream.toDF(), s"$dir/ckpt")
    try {
      // split WITHIN periods across micro-batches — folds must accumulate
      val (b1, rest) = events.splitAt(300)
      val (b2, b3) = rest.splitAt(300)
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      stream.addData(b3: _*); q.processAllAvailable()
      val got = sds.score(spark)
      assert(got.exceptAll(batchTimeline).isEmpty &&
        batchTimeline.exceptAll(got).isEmpty)
      // the planted day alarms from persisted state
      val last = got.orderBy(col("period")).collect().last
      assert(last.getLong(3) > 250000)
    } finally q.stop()
  }

  test("replaying a batch leaves counts unchanged (delta overwrite)") {
    val dir = Files.createTempDirectory("graft_sdrift2")
    val sds = new StreamingDriftSeries(s"$dir/counts", "value", bounds,
      "epoch_s div 86400")
    val (b1, b2) = events.splitAt(350)
    sds.processBatch(b1.toDF(), 0L)
    sds.processBatch(b2.toDF(), 1L)
    val before = sds.counts(spark).orderBy("period", "bucket").collect()
    sds.processBatch(b2.toDF(), 1L) // crash replay
    val after = sds.counts(spark).orderBy("period", "bucket").collect()
    assert(after === before)
    assert(sds.score(spark).exceptAll(batchTimeline).isEmpty)
  }
}
