package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.IncrementalJoin
import graft.streaming.StreamingJoin

case class Cdc(id: Long, k: String, v: String, op: String, ts: Long)

class StreamingJoinSpec extends SparkSuite {
  import spark.implicits._

  private lazy val dim = Seq(
    ("k0", "d0"), ("k1", "d1"), ("k2", "d2"), ("k3", "d3"), ("k4", "d4"))
    .toDF("k", "dv")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "k", "v", "dv").orderBy("id", "k").collect().toSeq

  test("streamed CDC maintains fact⨝dim across batches == batch recompute") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_sjoin")
    val sj = new StreamingJoin(s"$dir/state", Seq("k"), "id", nBuckets = 8)
    val stream = MemoryStream[Cdc]
    val q = sj.start(stream.toDF(), dim, Seq(col("ts").desc), s"$dir/ckpt")
    try {
      // batch 1: initial inserts, incl. an in-batch update (ts wins)
      stream.addData(Cdc(1, "k0", "a1", "I", 1), Cdc(2, "k1", "a2", "I", 1),
        Cdc(3, "k2", "a3", "I", 1), Cdc(3, "k2", "a3x", "I", 2))
      q.processAllAvailable()
      // batch 2: key-changing update (1 moves k0→k3), delete (2), insert
      stream.addData(Cdc(1, "k3", "a1'", "I", 3), Cdc(2, "k1", "a2", "D", 3),
        Cdc(4, "k4", "a4", "I", 3))
      q.processAllAvailable()
      // batch 3: re-insert a deleted id, delete-then-reinsert in one batch
      stream.addData(Cdc(2, "k2", "a2'", "I", 4),
        Cdc(4, "k4", "a4", "D", 5), Cdc(4, "k0", "a4'", "I", 6))
      q.processAllAvailable()

      val finalA = Seq((1L, "k3", "a1'"), (2L, "k2", "a2'"), (3L, "k2", "a3x"),
        (4L, "k0", "a4'")).toDF("id", "k", "v")
      assert(canon(sj.read(spark)) ===
        canon(IncrementalJoin.joinOf(finalA, dim, Seq("k"))))
    } finally q.stop()
  }

  test("only dirty buckets are rewritten; untouched bucket files keep their mtime") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_sjoin2")
    val state = s"$dir/state"
    val sj = new StreamingJoin(state, Seq("k"), "id", nBuckets = 8)
    // seed many ids so several buckets exist
    val seed = (1L to 64L).map(i => Cdc(i, s"k${i % 5}", s"a$i", "I", 1))
    sj.processBatch(seed.toDF(), dim, Seq(col("ts").desc))

    def mtimes: Map[String, Long] = {
      val root = new java.io.File(state)
      root.listFiles().filter(_.getName.startsWith("__jbucket="))
        .flatMap(d => d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => s"${d.getName}/${f.getName}" -> f.lastModified())).toMap
    }
    val before = mtimes
    Thread.sleep(1100) // mtime granularity

    // touch exactly one id → one dirty bucket
    sj.processBatch(Seq(Cdc(7, "k1", "a7'", "I", 2)).toDF(), dim,
      Seq(col("ts").desc))
    val after = mtimes
    val changed = after.filter { case (f, t) => before.get(f).exists(_ != t) }
      .keySet ++ (after.keySet -- before.keySet)
    val buckets = changed.map(_.split("/")(0))
    assert(buckets.size === 1, s"exactly one bucket dir rewritten: $buckets")
    // and the data is still right
    val expect = (1L to 64L).map(i =>
      if (i == 7L) (i, "k1", "a7'") else (i, s"k${i % 5}", s"a$i"))
      .toDF("id", "k", "v")
    assert(canon(sj.read(spark)) ===
      canon(IncrementalJoin.joinOf(expect, dim, Seq("k"))))
  }

  test("delete-only batch that empties a bucket drops the bucket dir, not just skips it") {
    val dir = Files.createTempDirectory("graft_sjoin4")
    val state = s"$dir/state"
    val nBuckets = 4
    val sj = new StreamingJoin(state, Seq("k"), "id", nBuckets = nBuckets)
    val ids = (1L to 20L)
    sj.processBatch(ids.map(i => Cdc(i, s"k${i % 5}", s"a$i", "I", 1)).toDF(),
      dim, Seq(col("ts").desc))
    // delete EVERY id of one bucket (bucket = pmod(xxhash64(id), n), same
    // derivation as the operator) so survivors and fresh are both empty
    val bucketOfId = spark.range(1, 21)
      .select($"id", pmod(xxhash64($"id"), lit(nBuckets.toLong)).as("b"))
      .as[(Long, Long)].collect().toMap
    val victimBucket = bucketOfId(1L)
    val victims = ids.filter(bucketOfId(_) == victimBucket)
    assert(victims.nonEmpty && victims.size < ids.size)
    sj.processBatch(victims.map(i => Cdc(i, s"k${i % 5}", s"a$i", "D", 2)).toDF(),
      dim, Seq(col("ts").desc))
    // dead rows are gone from the view (pre-fix they survived: dynamic
    // overwrite wrote nothing for the bucket and the old files remained)
    val remaining = sj.read(spark).select("id").as[Long].collect().toSet
    assert(remaining === ids.toSet -- victims)
    // and the emptied bucket directory itself is dropped
    assert(!new java.io.File(s"$state/__jbucket=$victimBucket").exists())
  }

  test("crash-replay idempotence: reprocessing the same batch is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_sjoin3")
    val sj = new StreamingJoin(s"$dir/state", Seq("k"), "id", nBuckets = 4)
    sj.processBatch(Seq(Cdc(1, "k0", "a1", "I", 1), Cdc(2, "k1", "a2", "I", 1))
      .toDF(), dim, Seq(col("ts").desc))
    val once = canon(sj.read(spark))
    sj.processBatch(Seq(Cdc(1, "k0", "a1", "I", 1), Cdc(2, "k1", "a2", "I", 1))
      .toDF(), dim, Seq(col("ts").desc))
    assert(canon(sj.read(spark)) === once)
  }
}
