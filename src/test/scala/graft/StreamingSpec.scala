package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventPipeline

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double, props: String)

class StreamingSpec extends SparkSuite {

  private def mkEv(id: Long, minute: Int, user: Long, typ: String): Ev =
    Ev(id, Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00"), user, typ, id * 1.5, "{}")

  private val events = Seq(
    mkEv(1, 0, 1, "click"), mkEv(2, 5, 1, "click"), mkEv(3, 50, 1, "view"),
    mkEv(4, 2, 2, "purchase"), mkEv(5, 59, 2, "click"))

  test("streaming tumblingAgg over MemoryStream equals batch on same rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    stream.addData(events)
    val q = EventPipeline.tumblingAgg(stream.toDF().withWatermark("ts", "10 minutes"))
      .writeStream.outputMode("complete").format("memory").queryName("tumbling_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("tumbling_out")
        .select("window_start", "event_type", "n_events", "total_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      val batch = EventPipeline.tumblingAgg(events.toDF())
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(streamed === batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("sessionAgg groups by 30-minute inactivity gap") {
    import spark.implicits._
    val out = EventPipeline.sessionAgg(events.toDF())
      .orderBy("user_id", "session_start")
      .as[(Long, Timestamp, Long)].collect()
    // user 1: events at 10:00,10:05 (one session) then 10:50 (new session)
    // user 2: 10:02, then 10:59 (new session)
    assert(out.map(r => (r._1, r._3)).toSeq === Seq((1L, 2L), (1L, 1L), (2L, 1L), (2L, 1L)))
  }

  test("dedupedStream drops duplicate keys across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = EventPipeline.dedupedStream(stream.toDF(), Seq("event_id"))
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try {
      stream.addData(mkEv(1, 0, 1, "click"), mkEv(2, 5, 1, "view"),
        mkEv(1, 0, 1, "click")) // in-batch duplicate
      q.processAllAvailable()
      stream.addData(mkEv(2, 6, 1, "view"), mkEv(3, 7, 2, "click")) // cross-batch dup
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .as[Long].collect().sorted
      assert(ids === Array(1L, 2L, 3L))
    } finally q.stop()
    // same call on a BATCH frame degenerates to plain exact dedup
    val batchIds = EventPipeline.dedupedStream(
      Seq(mkEv(1, 0, 1, "a"), mkEv(1, 0, 1, "a"), mkEv(2, 1, 1, "b")).toDF(),
      Seq("event_id")).select("event_id").as[Long].collect().sorted
    assert(batchIds === Array(1L, 2L))
  }

  test("stream-stream intervalJoin over MemoryStreams equals batch join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = Seq(mkEv(1, 0, 1, "view"), mkEv(2, 5, 1, "view"),
      mkEv(3, 2, 2, "view"), mkEv(4, 40, 1, "view"))
    val purchases = Seq(mkEv(10, 20, 1, "purchase"), // joins views 1 and 2
      mkEv(11, 50, 1, "purchase"),                   // joins view 4 only (45m > 30m past view 2)
      mkEv(12, 59, 2, "purchase"))                   // 57m past view 3: no match
    val vStream = MemoryStream[Ev]
    val pStream = MemoryStream[Ev]
    val q = EventPipeline.intervalJoin(vStream.toDF(), pStream.toDF())
      .writeStream.outputMode("append").format("memory").queryName("ij_out").start()
    try {
      // split across micro-batches so the join must BUFFER view state
      vStream.addData(views.take(2)); pStream.addData(purchases.take(1))
      q.processAllAvailable()
      vStream.addData(views.drop(2)); pStream.addData(purchases.drop(1))
      q.processAllAvailable()
      val streamed = spark.table("ij_out")
        .select("user_id", "view_id", "purchase_id", "purchase_value")
        .as[(Long, Long, Long, Double)].collect().toSet
      val batch = EventPipeline.intervalJoin(views.toDF(), purchases.toDF())
        .select("user_id", "view_id", "purchase_id", "purchase_value")
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(streamed === batch)
      assert(batch.map(r => (r._2, r._3)) ===
        Set((1L, 10L), (2L, 10L), (4L, 11L)))
    } finally q.stop()
  }

  test("file-source readStream matches the events schema") {
    val df = EventPipeline.readStream(spark, sf)
    assert(df.isStreaming)
    assert(df.schema.fieldNames.toSeq === EventPipeline.eventSchema.fieldNames.toSeq)
  }
}
