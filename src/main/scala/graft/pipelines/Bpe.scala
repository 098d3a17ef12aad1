package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-Pair-Encoding vocabulary induction (Sennrich, Haddow & Birch,
  * ACL 2016) — train the subword merge table LLM tokenizers are built
  * from, directly on the corpus the engine already holds.
  *
  * The published algorithm operates on the WORD-FREQUENCY table, not
  * the corpus: one corpus aggregate reduces 100 TB of text to a
  * vocabulary-sized (word, count) frame, and every merge round then
  * touches only that frame — count all adjacent symbol pairs weighted
  * by word count, merge the globally most frequent pair, repeat. All
  * corpus-scale work is the single word count; the loop is
  * vocabulary-sized.
  *
  * Determinism: pair selection orders by (count desc, left asc,
  * right asc) — a TOTAL order, so the merge sequence is a pure function
  * of the corpus (partitioning/engine independent; exact integer
  * counts). Merge application is the standard greedy LEFT-TO-RIGHT
  * non-overlapping scan, expressed as a per-row `aggregate` fold (no
  * shuffle; O(len²) per word on short words).
  *
  * Per round: one pair explode over the vocab frame + one keyed count +
  * one driver-collected argmax row (`TakeOrderedAndProject`), then a
  * narrow map applying the merge; the symbol frame is
  * lineage-checkpointed every `checkpointEvery` rounds (Hierarchy
  * idiom). Word boundary carries the published `</w>` end-of-word
  * symbol.
  */
object Bpe {

  private val WS = "[ \\t\\n\\r\\f]+"
  val EndOfWord = "</w>"

  /** Vocabulary-sized (word, cnt) frame — the only corpus-scale pass. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.filter(trim(col(textCol)) =!= "" && col(textCol).isNotNull)
      .select(explode(split(trim(col(textCol)), WS)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  private def charSymbols(word: Column): Column =
    concat(
      transform(sequence(lit(1), length(word)), i => substring(word, i, lit(1))),
      array(lit(EndOfWord)))

  /** Greedy left-to-right non-overlapping application of ONE merge. */
  private def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x))))

  /** Train `numMerges` BPE merges; returns (rank, left, right,
    * pair_count) in merge order. Stops early when no pair reaches
    * `minCount` (the published frequency floor).
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            minCount: Long = 2L, checkpointEvery: Int = 5,
            maxWordChars: Int = 200): DataFrame = {
    require(numMerges >= 1 && numMerges <= 5000, "numMerges in [1, 5000]")
    val spark = docs.sparkSession
    var syms = wordCounts(docs, textCol)
      // merge application is O(len²) per word: a pathological megabyte
      // "word" (base64 spill, minified JS) would hang a round — the
      // published trainers cap word length the same way; real words are
      // orders of magnitude under the cap, so the vocabulary is intact
      .filter(length(col("word")) <= maxWordChars)
      .select(charSymbols(col("word")).as("s"), col("cnt"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var done = false
    var lastCkpt = syms
    while (rank <= numMerges && !done) {
      val best = syms.filter(size(col("s")) >= 2)
        .select(explode(transform(sequence(lit(0), size(col("s")) - 2),
          i => struct(element_at(col("s"), i.cast("int") + 1).as("l"),
            element_at(col("s"), i.cast("int") + 2).as("r")))).as("p"),
          col("cnt"))
        .groupBy(col("p.l"), col("p.r")).agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty || best(0).getLong(2) < minCount) done = true
      else {
        val (l, r, n) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((rank, l, r, n))
        val next = syms.select(applyMerge(col("s"), l, r).as("s"), col("cnt"))
        syms = if (rank % checkpointEvery == 0) {
          val cut = next.localCheckpoint(true)
          org.apache.spark.sql.graftbridge.bridge.freeLocalCheckpoint(lastCkpt)
          lastCkpt = cut
          cut
        } else next
        rank += 1
      }
    }
    val out = spark.createDataFrame(
      spark.sparkContext.parallelize(
        merges.toSeq.map(m => Row(m._1, m._2, m._3, m._4)), 1),
      StructType(Seq(StructField("rank", IntegerType),
        StructField("left", StringType), StructField("right", StringType),
        StructField("pair_count", LongType))))
    org.apache.spark.sql.graftbridge.bridge.freeLocalCheckpoint(lastCkpt)
    out
  }

  /** Segment a text column under a trained merge list: the merges apply
    * per word in RANK order (each one the same greedy left-to-right
    * scan training used), so segmenting the training corpus reproduces
    * training's final symbol state exactly (spec-proven). Returns the
    * subword array column. Expression depth grows with the merge count —
    * cap segments at a few hundred merges per expression (codegen);
    * larger vocabularies belong in a dedicated kernel.
    */
  def segmentExpr(text: Column, merges: Seq[(String, String)]): Column = {
    require(merges.length <= 500, "segmentExpr caps at 500 merges (codegen)")
    val words = split(trim(text), WS)
    transform(words, w =>
      merges.foldLeft(charSymbols(w)) { case (acc, (l, r)) =>
        applyMerge(acc, l, r)
      })
  }

  /** Per-doc subword token count under the trained merges (flattened). */
  def tokenCount(docs: DataFrame, idCol: String, textCol: String,
                 merges: Seq[(String, String)]): DataFrame =
    docs.filter(trim(col(textCol)) =!= "" && col(textCol).isNotNull)
      .select(col(idCol),
        aggregate(
          transform(segmentExpr(col(textCol), merges), a => size(a).cast("long")),
          lit(0L), (acc, x) => acc + x).as("n_subwords"))
}
