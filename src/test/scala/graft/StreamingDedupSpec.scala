package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingDedup

case class Seen(k: String, seq: Long)

class StreamingDedupSpec extends SparkSuite {
  import spark.implicits._

  test("append-only destination never receives a key twice across batches") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_sdedup")
    val dest = s"$dir/dest"
    val stream = MemoryStream[Seen]
    val dedup = new StreamingDedup(dest, Seq("k"), Seq(col("seq").asc),
      expectedItems = 10000)
    val q = dedup.start(stream.toDF(), s"$dir/ckpt")
    try {
      // batch 1: within-batch dup on "a" — keep-first by seq
      stream.addData(Seen("a", 1), Seen("a", 2), Seen("b", 3))
      q.processAllAvailable()
      // batch 2: "a" and "b" replayed across batches, "c" new
      stream.addData(Seen("a", 4), Seen("b", 5), Seen("c", 6))
      q.processAllAvailable()
      // batch 3: everything already seen
      stream.addData(Seen("a", 7), Seen("c", 8))
      q.processAllAvailable()
      val out = spark.read.parquet(dest).orderBy("k").as[Seen].collect()
      assert(out === Array(Seen("a", 1), Seen("b", 3), Seen("c", 6)))
    } finally q.stop()
  }

  test("restart rebuilds the filter from the destination (no duplicates after)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_sdedup2")
    val dest = s"$dir/dest"
    val first = new StreamingDedup(dest, Seq("k"), Seq(col("seq").asc), 10000)
    first.processBatch(Seq(Seen("a", 1), Seen("b", 2)).toDF(), 0L)

    // a FRESH instance (restart): bloom starts empty, must rebuild from dest
    val second = new StreamingDedup(dest, Seq("k"), Seq(col("seq").asc), 10000)
    second.processBatch(Seq(Seen("b", 9), Seen("c", 3)).toDF(), 1L)
    val out = spark.read.parquet(dest).orderBy("k").as[Seen].collect()
    assert(out === Array(Seen("a", 1), Seen("b", 2), Seen("c", 3)))

    // crash-replay idempotence: the same batch again is a full no-op
    second.processBatch(Seq(Seen("b", 9), Seen("c", 3)).toDF(), 1L)
    assert(spark.read.parquet(dest).count() === 3)
  }

  test("stream result equals batch againstHistory + keepFirst composition") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_sdedup3")
    val dest = s"$dir/dest"
    val batches = Seq(
      (0 until 40).map(i => Seen(s"k${i % 25}", i.toLong)),
      (40 until 80).map(i => Seen(s"k${i % 37}", i.toLong)),
      (80 until 120).map(i => Seen(s"k${i % 13}", i.toLong)))
    val d = new StreamingDedup(dest, Seq("k"), Seq(col("seq").asc), 10000)
    batches.zipWithIndex.foreach { case (b, i) => d.processBatch(b.toDF(), i.toLong) }
    // batch oracle: keep-first by seq over the full concatenated input
    val want = graft.operators.Dedup.keepFirst(
      batches.flatten.toDF(), Seq("k"), Seq(col("seq").asc))
      .orderBy("k").as[Seen].collect()
    val got = spark.read.parquet(dest).orderBy("k").as[Seen].collect()
    assert(got === want)
  }
}
