package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.pipelines.{Bpe, Unigram, WordPiece}
import graft.streaming.StreamingTokenizerCounts

case class DocCdc(doc_id: Long, text: String, op: String)

class StreamingTokenizerCountsSpec extends SparkSuite {
  import spark.implicits._

  // three syncs: inserts, then an update (delete+insert pair) and a
  // pure delete — the net corpus is what a rescan would see
  private val b1 = Seq(
    DocCdc(1L, "spark park spark", "I"),
    DocCdc(2L, "the park of spark", "I"),
    DocCdc(3L, "transient words here", "I"))
  private val b2 = Seq(
    DocCdc(3L, "transient words here", "D"), // delete doc 3 outright
    DocCdc(2L, "the park of spark", "D"),    // update doc 2 ...
    DocCdc(2L, "the spark of sparkly parks", "I"))
  private val b3 = Seq(
    DocCdc(4L, "sparkly parking spark park", "I"))
  private val net = Seq(
    (1L, "spark park spark"),
    (2L, "the spark of sparkly parks"),
    (4L, "sparkly parking spark park")).toDF("doc_id", "text")

  test("folded counts equal a full rescan of the net corpus (streamed)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_tokcnt")
    val stc = new StreamingTokenizerCounts(s"$dir/counts", "text")
    val stream = MemoryStream[DocCdc]
    val q = stc.start(stream.toDF(), s"$dir/ckpt")
    try {
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      stream.addData(b3: _*); q.processAllAvailable()
      val got = stc.counts(spark)
      val want = Bpe.wordCounts(net, "text")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
      // fully-deleted words ("transient", "words", "here") are GONE,
      // not present with cnt 0 — a dead word must not seed a vocabulary
      assert(got.filter(col("word") === "transient").isEmpty)
    } finally q.stop()
  }

  test("replaying a batch leaves counts unchanged (delta overwrite)") {
    val dir = Files.createTempDirectory("graft_tokcnt2")
    val stc = new StreamingTokenizerCounts(s"$dir/counts", "text")
    stc.processBatch(b1.toDF(), 0L)
    stc.processBatch(b2.toDF(), 1L)
    val before = stc.counts(spark).orderBy("word").collect()
    stc.processBatch(b2.toDF(), 1L) // crash replay
    val after = stc.counts(spark).orderBy("word").collect()
    assert(after === before)
  }

  test("both tokenizer families retrain from maintained state == rescan training") {
    val dir = Files.createTempDirectory("graft_tokcnt3")
    val stc = new StreamingTokenizerCounts(s"$dir/counts", "text")
    Seq(b1, b2, b3).zipWithIndex.foreach { case (b, i) =>
      stc.processBatch(b.toDF(), i.toLong)
    }
    val u1 = stc.retrainUnigram(spark, vocabSize = 10)
    val u2 = Unigram.fit(net, "text", vocabSize = 10)
    assert(u1.tokens.toSeq === u2.tokens.toSeq)
    assert(u1.counts.toSeq === u2.counts.toSeq)
    val w1 = stc.retrainWordPiece(spark, numMerges = 8)
    val w2 = WordPiece.fit(net, "text", numMerges = 8)
    assert(w1.merges.toSeq === w2.merges.toSeq)
    assert(w1.vocab.toSeq === w2.vocab.toSeq)
  }

  test("empty state yields empty counts and empty models") {
    val dir = Files.createTempDirectory("graft_tokcnt4")
    val stc = new StreamingTokenizerCounts(s"$dir/counts", "text")
    assert(stc.counts(spark).isEmpty)
    assert(stc.retrainUnigram(spark, 5).tokens.isEmpty)
    assert(stc.retrainWordPiece(spark, 5).merges.isEmpty)
  }
}
