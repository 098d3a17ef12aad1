package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.pipelines.Pack
import graft.streaming.StreamingPack
import graft.streaming.StreamingPack.{Doc, Placed}

class StreamingPackSpec extends SparkSuite {
  import spark.implicits._

  private def drain(batches: Seq[Seq[Doc]], budget: Long): Seq[Placed] = {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_spack")
    val stream = MemoryStream[Doc]
    val q = StreamingPack.pack(stream.toDS(), budget)
      .writeStream.outputMode("append").format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .start()
    try batches.foreach { b => stream.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    spark.read.parquet(s"$dir/out").as[Placed].collect().toSeq
  }

  test("bins keep filling across micro-batches; stream == arrival-order batch") {
    // doc_ids increase across batches, so global doc_id order IS the
    // arrival order — the equality precondition
    val batches = Seq(
      Seq(Doc("g", 1, 200L), Doc("g", 2, 100L)),
      Seq(Doc("g", 3, 56L), Doc("g", 4, 150L), Doc("h", 5, 10L)),
      Seq(Doc("g", 6, 6L), Doc("h", 7, 246L)))
    val streamed = drain(batches, budget = 256L)
      .map(p => (p.grp, p.doc_id, p.bin_id, p.bin_pos)).toSet
    // batch-2's 56-token doc must land in batch-1's 200-token bin
    // (state carried), batch-3's 6-token doc in the 100+150 bin
    assert(streamed.contains(("g", 3L, 0L, 200L)))
    assert(streamed.contains(("g", 6L, 1L, 250L)))
    val batch = Pack.bestFitArrival(
      batches.flatten.toDF(), Seq("grp"), "len", Seq(col("doc_id")), 256L)
      .select(col("grp"), col("doc_id"), col("bin_id"), col("bin_pos"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(streamed === batch)
  }

  test("full bins leave the state store; open-bin state stays minimal") {
    // fill bin 0 exactly (cap 0 -> evicted), leave bin 1 open
    val batches = Seq(
      Seq(Doc("g", 1, 256L), Doc("g", 2, 100L)),
      // a new doc must OPEN bin 2 if it cannot fit bin 1's 156 slack —
      // and must NOT resurrect the evicted full bin 0
      Seq(Doc("g", 3, 200L), Doc("g", 4, 156L)))
    val out = drain(batches, budget = 256L)
      .map(p => (p.doc_id, p.bin_id, p.bin_pos)).toSet
    assert(out === Set((1L, 0L, 0L), (2L, 1L, 0L), (3L, 2L, 0L),
      (4L, 1L, 100L)))
  }

  test("restart from checkpoint resumes bin state (crash between batches)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_spack_rs")
    val stream = MemoryStream[Doc]
    def start() = StreamingPack.pack(stream.toDS(), 256L)
      .writeStream.outputMode("append").format("parquet")
      .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
      .start()
    val q1 = start()
    try { stream.addData(Doc("g", 1, 200L)); q1.processAllAvailable() }
    finally q1.stop()
    // a fresh query on the same checkpoint — the crash-restart window:
    // bin 0's 56-token slack must survive into the new instance
    val q2 = start()
    try { stream.addData(Doc("g", 2, 56L)); q2.processAllAvailable() }
    finally q2.stop()
    val out = spark.read.parquet(s"$dir/out").as[Placed]
      .collect().map(p => (p.doc_id, p.bin_id, p.bin_pos)).toSet
    assert(out === Set((1L, 0L, 0L), (2L, 0L, 200L)))
  }

  test("overlong docs fail loudly on the stream too") {
    val e = intercept[Exception] {
      drain(Seq(Seq(Doc("g", 1, 300L))), budget = 256L)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("pre-chop")), e.toString)
  }
}
