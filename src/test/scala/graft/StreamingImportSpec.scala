package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingImport

case class KV(id: Long, v: String)

class StreamingImportSpec extends SparkSuite {

  test("micro-batches upsert into the destination across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_simport")
    val dest = s"$dir/dest"
    val stream = MemoryStream[KV]
    val q = StreamingImport.start(stream.toDF(), dest, Seq("id"), s"$dir/ckpt")
    try {
      stream.addData(KV(1, "a"), KV(2, "b"))
      q.processAllAvailable()
      stream.addData(KV(2, "B2"), KV(3, "c"))
      q.processAllAvailable()
      val out = spark.read.parquet(dest).orderBy("id").as[KV].collect()
      assert(out === Array(KV(1, "a"), KV(2, "B2"), KV(3, "c")))
    } finally q.stop()
  }

  test("upsertBatch doubles as batch backfill") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_simport2")
    val dest = s"$dir/dest"
    StreamingImport.upsertBatch(Seq(KV(1, "x")).toDF(), dest, Seq("id"))
    StreamingImport.upsertBatch(Seq(KV(1, "y"), KV(5, "z")).toDF(), dest, Seq("id"))
    val out = spark.read.parquet(dest).orderBy("id").as[KV].collect()
    assert(out === Array(KV(1, "y"), KV(5, "z")))
  }
}
