package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.dedup.SpanDedup
import graft.streaming.StreamingSpanDedup

case class SpanDoc(doc_id: Long, text: String)

class StreamingSpanDedupSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    SpanDoc(1L, "a b c d"),       // spans(2): [a b][c d]
    SpanDoc(2L, "x y a b"),       // [x y] + dup [a b]
    SpanDoc(3L, "c d x y p q"),   // both dups + novel [p q]
    SpanDoc(4L, "p q r s"),
    SpanDoc(5L, "r s"),
    SpanDoc(6L, "fresh stuff"))

  private def oneShot = SpanDedup
    .dedupSpans(docs.toDF("doc_id", "text"), "doc_id", "text", n = 2)

  test("stream over micro-batches equals the one-shot corpus run") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_sspan")
    val sd = new StreamingSpanDedup(s"$dir/clean", s"$dir/reg",
      "doc_id", "text", n = 2, expectedSpans = 10000L)
    val stream = MemoryStream[SpanDoc]
    val q = sd.start(stream.toDF(), s"$dir/ckpt")
    try {
      stream.addData(docs(0), docs(1)); q.processAllAvailable()
      stream.addData(docs(2), docs(3)); q.processAllAvailable()
      stream.addData(docs(4), docs(5)); q.processAllAvailable()
      val got = spark.read.parquet(s"$dir/clean")
        .select("doc_id", "n_spans", "n_kept", "clean_text")
      assert(got.exceptAll(oneShot).isEmpty && oneShot.exceptAll(got).isEmpty)
      // the registry never holds a span twice
      val reg = spark.read.parquet(s"$dir/reg").select("span")
      assert(reg.count() === reg.distinct().count())
    } finally q.stop()
  }

  test("a half-written FIRST registry write cannot wedge the stream") {
    val dir = Files.createTempDirectory("graft_sspan3")
    // simulate a crash during the very first registry write: the dir
    // exists with debris but no committed partition — partition
    // discovery would throw on schema inference forever
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/reg/batch=0"))
    Files.writeString(
      java.nio.file.Paths.get(s"$dir/reg/batch=0/part-garbage"), "")
    val sd = new StreamingSpanDedup(s"$dir/clean", s"$dir/reg",
      "doc_id", "text", n = 2, expectedSpans = 10000L)
    sd.processBatch(docs.toDF("doc_id", "text"), 0L)
    val got = spark.read.parquet(s"$dir/clean")
      .select("doc_id", "n_spans", "n_kept", "clean_text")
    assert(got.exceptAll(oneShot).isEmpty && oneShot.exceptAll(got).isEmpty)
  }

  test("crash replay of a batch is idempotent; restart rebuilds the bloom") {
    val dir = Files.createTempDirectory("graft_sspan2")
    val sd = new StreamingSpanDedup(s"$dir/clean", s"$dir/reg",
      "doc_id", "text", n = 2, expectedSpans = 10000L)
    sd.processBatch(Seq(docs(0), docs(1)).toDF(), 0L)
    // replay batch 0 on a FRESH instance (post-crash restart): committed
    // marker short-circuits, output unchanged
    val sd2 = new StreamingSpanDedup(s"$dir/clean", s"$dir/reg",
      "doc_id", "text", n = 2, expectedSpans = 10000L)
    sd2.processBatch(Seq(docs(0), docs(1)).toDF(), 0L)
    sd2.processBatch(Seq(docs(2), docs(3)).toDF(), 1L)
    // replay batch 1 mid-crash: delete the registry marker but keep the
    // cleaned write — the batch must recompute IDENTICALLY
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/reg/batch=1"), true)
    val sd3 = new StreamingSpanDedup(s"$dir/clean", s"$dir/reg",
      "doc_id", "text", n = 2, expectedSpans = 10000L)
    sd3.processBatch(Seq(docs(2), docs(3)).toDF(), 1L)
    sd3.processBatch(Seq(docs(4), docs(5)).toDF(), 2L)
    val got = spark.read.parquet(s"$dir/clean")
      .select("doc_id", "n_spans", "n_kept", "clean_text")
    assert(got.exceptAll(oneShot).isEmpty && oneShot.exceptAll(got).isEmpty)
    val reg = spark.read.parquet(s"$dir/reg").select("span")
    assert(reg.count() === reg.distinct().count())
  }
}
