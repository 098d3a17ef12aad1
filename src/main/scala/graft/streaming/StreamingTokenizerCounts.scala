package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.pipelines.{Bpe, Unigram, WordPiece}

/** Streaming maintenance of the tokenizer WORD-COUNT state — the stream
  * twin that operationalizes `Unigram.fitFromCounts` /
  * `WordPiece.fitFromCounts` end to end: every published tokenizer
  * trainer's ONLY corpus-scale input is the (word, cnt) table, which is
  * additively maintainable under document CDC. This class maintains it
  * from a change stream, so a 100 TB corpus retrains its tokenizer per
  * sync from delta-sized work with no corpus rescan, continuously.
  *
  * Per micro-batch: word counts of INSERTED docs minus word counts of
  * DELETED docs (op column 'I'/'D'; an update is a delete+insert pair,
  * and delete rows must carry the deleted document's TEXT — full-row
  * CDC images, since the subtraction needs the old content; a
  * key-only delete feed would need a lookup against the destination
  * first), written as a `batch=<id>` OVERWRITE
  * partition — the [[StreamingDriftSeries]] replay-exact-by-layout
  * recipe: a replayed batch overwrites its own delta with identical
  * content, so the summed read is correct at ANY crash point with no
  * markers and no driver state.
  *
  * State size: vocabulary-bounded rows per batch partition (the word
  * table, not the corpus); reads aggregate across partitions, so
  * `Sink.compact`-style consolidation is an optimization, never
  * correctness.
  */
class StreamingTokenizerCounts(countsDir: String, textCol: String,
                               opCol: String = "op") extends Serializable {

  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    val ins = Bpe.wordCounts(batch.filter(col(opCol) === "I"), textCol)
    val del = Bpe.wordCounts(batch.filter(col(opCol) === "D"), textCol)
      .select(col("word"), (-col("cnt")).as("cnt"))
    ins.unionByName(del)
      .groupBy(col("word")).agg(sum(col("cnt")).as("cnt"))
      .write.mode("overwrite").parquet(s"$countsDir/batch=$batchId")
  }

  /** The maintained (word, cnt) table — equals `Bpe.wordCounts` over a
    * full rescan of the net corpus (spec-proven). Words whose net count
    * reached zero are dropped (a fully-deleted word must not seed a
    * vocabulary).
    */
  def counts(spark: SparkSession): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(countsDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = if (!fs.exists(p)) Nil
      else fs.listStatus(p).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
        .filter(st => fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
        .map(_.getPath.toString)
    if (dirs.isEmpty)
      spark.range(0).select(col("id").cast("string").as("word"),
        col("id").as("cnt")).limit(0)
    else spark.read.parquet(dirs: _*)
      .groupBy(col("word")).agg(sum(col("cnt")).as("cnt"))
      .filter(col("cnt") > 0L)
  }

  /** Retrain the unigram tokenizer from maintained state alone. */
  def retrainUnigram(spark: SparkSession, vocabSize: Int): Unigram.Model =
    Unigram.fitFromCounts(counts(spark), vocabSize)

  /** Retrain the WordPiece merges from maintained state alone. */
  def retrainWordPiece(spark: SparkSession, numMerges: Int): WordPiece.Model =
    WordPiece.fitFromCounts(counts(spark), numMerges)

  def start(stream: DataFrame, checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, id: Long) => processBatch(b, id))
      .start()
}
