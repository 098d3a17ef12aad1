package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.dedup.{IncrementalNearDup, NearDup}

case class Doc(doc_id: Long, text: String)

/** The incremental LSH index must emit EXACTLY the pair set the batch
  * run finds on the same corpus — fed through a MemoryStream in
  * micro-batches that split duplicate pairs across batch boundaries.
  */
class IncrementalNearDupSpec extends SparkSuite {
  import spark.implicits._

  private def docs: Seq[Doc] = {
    val base = (0 until 20).map { i =>
      Doc(i.toLong, (0 until 40).map(j => s"w${(i * 7 + j * 13) % 97}").mkString(" "))
    }
    base ++ Seq(
      Doc(100L, base(3).text),                                  // exact dup of 3
      Doc(101L, base(5).text.replace("w68 ", "w68 EXTRA ")),    // near dup of 5
      Doc(102L, (0 until 40).map(j => s"z$j").mkString(" ")))   // unrelated
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet

  test("incremental over MemoryStream equals the batch run") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_inclsh")
    val (indexDir, pairsDir, ckpt) = (s"$dir/index", s"$dir/pairs", s"$dir/ckpt")

    val stream = MemoryStream[Doc]
    val q = IncrementalNearDup.start(stream.toDF(), "doc_id", "text",
      indexDir, pairsDir, ckpt, threshold = 0.5)
    try {
      // batch 1 holds doc 3 and 5; their duplicates 100/101 arrive LATER —
      // the new×old path is what's under test
      stream.addData(docs.take(10): _*)
      q.processAllAvailable()
      stream.addData(docs.slice(10, 20): _*)
      q.processAllAvailable()
      stream.addData(docs.drop(20): _*)
      q.processAllAvailable()
    } finally q.stop()

    val incremental = pairSet(spark.read.parquet(pairsDir))
    val batch = NearDup.minhashPairs(docs.toDF(), "doc_id", "text", threshold = 0.5)
    val expected = pairSet(batch)
    batch.unpersist()
    assert(incremental === expected)
    assert(expected.exists(p => p._1 == 3L && p._2 == 100L && p._3 == 1.0))
    assert(expected.exists(p => p._1 == 5L && p._2 == 101L))
  }

  test("compactIndex shrinks file count and changes nothing semantically") {
    val dir = Files.createTempDirectory("graft_inclsh3")
    val indexDir = s"$dir/index"
    // several small batches -> many small files
    docs.grouped(6).foreach { g =>
      IncrementalNearDup.processBatch(g.toDF(), "doc_id", "text", indexDir,
        threshold = 0.5).unpersist()
    }
    def files(sub: String) = new java.io.File(s"$indexDir/$sub")
      .listFiles().count(_.getName.endsWith(".parquet"))
    def content(sub: String) = spark.read.parquet(s"$indexDir/$sub")
      .collect().map(_.toString).sorted.toSeq
    val (sigsBefore, bandsBefore) = (content("sigs"), content("bands"))
    assert(files("sigs") > 2)
    IncrementalNearDup.compactIndex(spark, indexDir, targetFiles = 2)
    assert(files("sigs") === 2 && files("bands") === 2)
    assert(content("sigs") === sigsBefore)
    assert(content("bands") === bandsBefore)
    // the compacted index still serves incremental batches
    val more = IncrementalNearDup.processBatch(
      Seq(Doc(900L, docs(3).text)).toDF(), "doc_id", "text", indexDir,
      threshold = 0.5)
    assert(pairSet(more).exists(p => (p._1, p._2) == ((3L, 900L)) && p._3 == 1.0))
  }

  test("a replayed micro-batch is idempotent at any crash point") {
    val dir = Files.createTempDirectory("graft_inclsh4")
    val indexDir = s"$dir/index"
    // batch 0 commits fully
    IncrementalNearDup.processBatch(docs.take(10).toDF(), "doc_id", "text",
      indexDir, threshold = 0.5, batchTag = Some(0L))
    // batch 1 CRASHES between the index writes and the pairs write:
    // sigs/bands batch=1 partitions exist, the pair output was lost
    val attempt1 = IncrementalNearDup.processBatch(docs.drop(10).toDF(),
      "doc_id", "text", indexDir, threshold = 0.5, batchTag = Some(1L))
    val lost = pairSet(attempt1)
    // foreachBatch replays batch 1 from the start: same-tag partitions
    // are excluded from the reads and overwritten, so the replay derives
    // the SAME pairs instead of an empty set (ids "already indexed")
    val attempt2 = IncrementalNearDup.processBatch(docs.drop(10).toDF(),
      "doc_id", "text", indexDir, threshold = 0.5, batchTag = Some(1L))
    assert(pairSet(attempt2) === lost)
    assert(lost.exists(p => (p._1, p._2) == ((3L, 100L))))
    // the index holds each id exactly once after the replay
    val idCounts = spark.read.parquet(s"$indexDir/sigs")
      .groupBy("id").count().filter($"count" > 1).count()
    assert(idCounts === 0L)
    // and the full pair stream equals the batch run over everything
    // (batch 0's pairs re-derived on a scratch index)
    val batch0 = IncrementalNearDup.processBatch(docs.take(10).toDF(),
      "doc_id", "text", s"$dir/scratch", threshold = 0.5)
    val all = lost ++ pairSet(batch0)
    val batchRun = NearDup.minhashPairs(docs.toDF(), "doc_id", "text", threshold = 0.5)
    assert(all === pairSet(batchRun))
    batchRun.unpersist()
  }

  test("a markerless pairs dir (crash during the pairs write) is NOT a commit — the batch replays") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_inclsh6")
    val (indexDir, pairsDir, ckpt) = (s"$dir/index", s"$dir/pairs", s"$dir/ckpt")
    // simulate the crash the committer leaves behind: batch 0's pairs
    // OUTPUT DIRECTORY exists (job setup creates it before any task
    // commits, possibly with partial task files) but no _SUCCESS landed
    val partial = new java.io.File(s"$pairsDir/batch=0")
    assert(partial.mkdirs())
    java.nio.file.Files.write(partial.toPath.resolve("part-crashed.parquet"),
      Array[Byte](9, 9, 9))
    val stream = MemoryStream[Doc]
    val q = IncrementalNearDup.start(stream.toDF(), "doc_id", "text",
      indexDir, pairsDir, ckpt, threshold = 0.5)
    try {
      // the whole corpus in one micro-batch — it gets batchId 0, the
      // exact id whose debris is on disk; a dir-existence marker would
      // skip it and lose every pair FOREVER
      stream.addData(docs: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(new java.io.File(s"$pairsDir/batch=0/_SUCCESS").exists())
    val incremental = pairSet(spark.read.parquet(pairsDir))
    val batch = NearDup.minhashPairs(docs.toDF(), "doc_id", "text", threshold = 0.5)
    val expected = pairSet(batch)
    batch.unpersist()
    assert(incremental === expected)
    assert(expected.exists(p => p._1 == 3L && p._2 == 100L && p._3 == 1.0))
  }

  test("the bloom gate changes nothing but the index-scan work") {
    val dir = Files.createTempDirectory("graft_inclsh5")
    val indexDir = s"$dir/index"
    IncrementalNearDup.processBatch(docs.take(10).toDF(), "doc_id", "text",
      indexDir, threshold = 0.5, batchTag = Some(0L))
    val bloom = graft.operators.Dedup.buildKeyBloom(
      spark.read.parquet(s"$indexDir/sigs").select("id"), Seq("id"), 10000L)
    // re-deliver an indexed doc + novel docs, gated vs ungated
    val batch = (Seq(Doc(3L, docs(3).text)) ++ docs.drop(10)).toDF()
    val gated = IncrementalNearDup.processBatch(batch, "doc_id", "text",
      indexDir, threshold = 0.5, batchTag = Some(1L), knownBloom = Some(bloom))
    val gatedPairs = pairSet(gated)
    val dir2 = Files.createTempDirectory("graft_inclsh6")
    IncrementalNearDup.processBatch(docs.take(10).toDF(), "doc_id", "text",
      s"$dir2/index", threshold = 0.5, batchTag = Some(0L))
    val ungated = IncrementalNearDup.processBatch(batch, "doc_id", "text",
      s"$dir2/index", threshold = 0.5, batchTag = Some(1L))
    assert(gatedPairs === pairSet(ungated))
    // the re-delivered doc 3 was skipped in both (no (3, x) where x is old)
    assert(spark.read.parquet(s"$indexDir/sigs")
      .groupBy("id").count().filter($"count" > 1).count() === 0L)
  }

  test("already-indexed ids are skipped, not re-paired") {
    val dir = Files.createTempDirectory("graft_inclsh2")
    val indexDir = s"$dir/index"
    val first = IncrementalNearDup.processBatch(
      docs.take(5).toDF(), "doc_id", "text", indexDir, threshold = 0.5)
    val firstBatchRun = NearDup.minhashPairs(
      docs.take(5).toDF(), "doc_id", "text", threshold = 0.5)
    assert(pairSet(first) === pairSet(firstBatchRun))
    firstBatchRun.unpersist()
    // re-deliver doc 3 together with its exact dup: only the NEW doc pairs
    val redelivered = IncrementalNearDup.processBatch(
      Seq(Doc(3L, docs(3).text), Doc(100L, docs(3).text)).toDF(),
      "doc_id", "text", indexDir, threshold = 0.5)
    val got = pairSet(redelivered).map(p => (p._1, p._2))
    redelivered.unpersist()
    // doc 3 was skipped as already-indexed: every pair involves the NEW
    // doc 100 (no re-pairing of old docs among themselves)
    assert(got.nonEmpty && got.forall(_._2 == 100L))
    assert(got.contains((3L, 100L)))
  }
}
