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
  * The merge loop runs ON THE DRIVER over the collected word table —
  * the Lloyd-centroid/binning-boundary collect tier: the table is
  * vocabulary-bounded BY CONSTRUCTION and the collect is
  * limit(maxVocab+1)-guarded with a loud fix-naming error (prune rare
  * words with `minWordCount`, the published trainers' frequency floor,
  * or raise `maxVocab`). Until round 10 each round was a separate
  * Spark job (pair explode + keyed count + TakeOrdered + a merge map
  * over the cluster) — 30 driver-sequenced jobs whose per-job floor
  * dominated; the driver loop is the published reference shape
  * (BpeSpec holds an independent implementation it must equal) and
  * leaves exactly ONE corpus-scale Spark job: the word count.
  * Word boundary carries the published `</w>` end-of-word symbol.
  * Symbol iteration is by CODE POINT and tie-breaks compare UTF-8
  * bytes — the same total order Spark SQL and DuckDB use for strings,
  * so the merge sequence stays engine-replayable beyond ASCII.
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

  /** UTF-8 byte order — the total order Spark SQL's string sort and
    * DuckDB's string compare share (≡ code-point order); Java's
    * String.compareTo diverges on supplementary characters.
    */
  private[pipelines] def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    var i = 0
    while (i < x.length && i < y.length) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** Train `numMerges` BPE merges; returns (rank, left, right,
    * pair_count) in merge order. Stops early when no pair reaches
    * `minCount` (the published frequency floor). `minWordCount` prunes
    * the word table BEFORE the guarded collect — at web scale the raw
    * whitespace vocabulary exceeds any driver budget, and dropping
    * hapax words is what the published trainers do.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            minCount: Long = 2L, maxWordChars: Int = 200,
            minWordCount: Long = 1L, maxVocab: Int = 2000000): DataFrame = {
    require(numMerges >= 1 && numMerges <= 5000, "numMerges in [1, 5000]")
    val spark = docs.sparkSession
    val rows = wordCounts(docs, textCol)
      // merge application scans every word per round: a pathological
      // megabyte "word" (base64 spill, minified JS) would dominate —
      // the published trainers cap word length the same way; real words
      // are orders of magnitude under the cap, so the vocabulary is
      // intact
      .filter(length(col("word")) <= maxWordChars)
      .filter(col("cnt") >= minWordCount)
      .limit(maxVocab + 1).collect()
    require(rows.length <= maxVocab,
      s"Bpe.train: word table exceeds maxVocab=$maxVocab — raise " +
        s"minWordCount (prune rare words, the published frequency floor) " +
        s"or maxVocab")
    // symbol state per word, split by CODE POINT (matches Spark SQL's
    // substring/length semantics the distributed form used)
    val words: Array[(Array[String], Long)] = rows.map { r =>
      val w = r.getString(0)
      val syms = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        syms += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      syms += EndOfWord
      (syms.toArray, r.getLong(1))
    }
    val state = words.map { case (s, c) =>
      (scala.collection.mutable.ArrayBuffer.from(s), c)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      state.foreach { case (s, c) =>
        var i = 0
        while (i < s.length - 1) {
          val k = (s(i), s(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      // argmax by (count desc, left utf8 asc, right utf8 asc) — the
      // identical total order the distributed orderBy used
      var best: ((String, String), Long) = null
      counts.foreach { kv =>
        if (best == null || kv._2 > best._2 ||
          (kv._2 == best._2 && (utf8Lt(kv._1._1, best._1._1) ||
            (kv._1._1 == best._1._1 && utf8Lt(kv._1._2, best._1._2)))))
          best = kv
      }
      if (best == null || best._2 < minCount) done = true
      else {
        val ((l, r), n) = best
        merges += ((rank, l, r, n))
        // greedy left-to-right non-overlapping — the applyMerge fold
        val lr = l + r
        state.foreach { case (s, _) =>
          if (s.length >= 2) {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            s.foreach { x =>
              if (out.nonEmpty && out.last == l && x == r)
                out(out.length - 1) = lr
              else out += x
            }
            if (out.length != s.length) { s.clear(); s ++= out }
          }
        }
        rank += 1
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        merges.toSeq.map(m => Row(m._1, m._2, m._3, m._4)), 1),
      StructType(Seq(StructField("rank", IntegerType),
        StructField("left", StringType), StructField("right", StringType),
        StructField("pair_count", LongType))))
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
