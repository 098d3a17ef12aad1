package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.{Event, SessionOut}

class StatefulSessionsSpec extends SparkSuite {

  private def ev(user: Long, hhmm: String, typ: String = "click") =
    Event(user, Timestamp.valueOf(s"2024-01-01 $hhmm:00"), typ)

  test("streaming stateful sessionizer closes sessions across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = StatefulSessions.sessionize(
      stream.toDS().withWatermark("ts", "0 seconds").as[Event])
      .writeStream.outputMode("append").format("memory").queryName("sessions_out").start()
    try {
      // batch 1: two events 5 min apart (one open session)
      stream.addData(ev(1, "10:00"), ev(1, "10:05"))
      q.processAllAvailable()
      // batch 2: an event far past the gap → closes session 1 inline,
      // and advances the watermark
      stream.addData(ev(1, "11:30"))
      q.processAllAvailable()
      val closed = spark.table("sessions_out").as[SessionOut].collect()
      assert(closed.exists(s => s.user_id == 1 && s.n_events == 2 &&
        s.session_start == Timestamp.valueOf("2024-01-01 10:00:00") &&
        s.session_end == Timestamp.valueOf("2024-01-01 10:05:00")))
    } finally q.stop()
  }

  test("updateUser splits on gap and counts events") {
    val out = StatefulSessions.updateUser(7L,
      Iterator(ev(7, "09:00"), ev(7, "09:10"), ev(7, "10:30"), ev(7, "10:31")),
      new FakeState).toSeq
    assert(out.map(_.n_events) === Seq(2))
    assert(out.head.session_end === Timestamp.valueOf("2024-01-01 09:10:00"))
  }
}

/** Minimal in-memory GroupState for unit-testing the update function. */
class FakeState extends org.apache.spark.sql.streaming.GroupState[StatefulSessions.SessionState] {
  private var v: Option[StatefulSessions.SessionState] = None
  override def exists: Boolean = v.isDefined
  override def get: StatefulSessions.SessionState = v.get
  override def getOption: Option[StatefulSessions.SessionState] = v
  override def update(s: StatefulSessions.SessionState): Unit = v = Some(s)
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
