package graft.pipelines

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WordPiece subword tokenizer training (Schuster & Nakajima, ICASSP
  * 2012; the BERT/GNMT tokenizer — Wu et al. 2016 §4.1), the THIRD
  * published tokenizer family beside [[Bpe]] (frequency merges) and
  * [[Unigram]] (likelihood pruning): WordPiece GROWS the vocabulary by
  * merges like BPE, but picks each merge by the LIKELIHOOD-RATIO score
  *
  *   score(l, r) = count(l r) / (count(l) · count(r))
  *
  * — merge the pair whose fusion most increases corpus likelihood under
  * a unigram LM, not the merely most frequent one (the published
  * trainers' formulation, e.g. the HuggingFace tokenizers WordPiece
  * trainer). Word-internal continuation symbols carry the `##` prefix
  * and the merged token strips the right side's prefix, so the trained
  * vocabulary is position-aware the way BERT's is.
  *
  * Like the other two trainers, the algorithm runs on the WORD-FREQUENCY
  * table: one corpus aggregate reduces 100 TB of text to a
  * vocabulary-sized (word, count) frame, and every merge round touches
  * only that frame on the driver (the Lloyd-centroid/BPE collect tier,
  * limit-guarded with a loud error).
  *
  * Determinism and exactness: scores are RATIONALS p/(n_l·n_r) compared
  * by exact BigInt cross-multiplication — p1·n_l2·n_r2 vs p2·n_l1·n_r1 —
  * never floating-point, with ties broken by (left utf8 asc, right utf8
  * asc). The oracle replays every round in SQL using a 2^100-scaled
  * HUGEINT floor key, which provably agrees with the exact rational
  * order whenever every symbol count stays ≤ 2^25−1 (distinct rationals
  * with denominators ≤ C² differ by ≥ C⁻⁴ > 2^-100); the oracle gates
  * that bound on the data instead of assuming it.
  *
  * Encoding is the published greedy LONGEST-MATCH-FIRST (maximal munch)
  * walk over the final vocabulary — NOT a replay of training's merge
  * state — with whole-word `[UNK]` on any unmatched position, exactly
  * BERT's WordpieceTokenizer. Segmentation happens ONCE per DISTINCT
  * word on the vocabulary-sized frame; corpus-scale consumers join the
  * resulting broadcastable (word, n_toks) frame (the
  * [[Unigram.wordTokenCounts]] scale shape — no per-occurrence DP).
  */
object WordPiece {

  val ContPrefix = "##"

  final case class Merge(rank: Int, left: String, right: String,
                         pairCount: Long, leftCount: Long, rightCount: Long)

  /** Trained model: the merge sequence, the final vocabulary (initial
    * alphabet — word-initial chars bare, continuations `##`-prefixed —
    * plus each merge's output token), and the word table it trained on.
    */
  final case class Model(merges: Array[Merge], vocab: Array[String],
                         words: Array[(String, Long)]) {
    lazy val vocabSet: Set[String] = vocab.toSet
    /** Upper bound on a match's code-point length (full token text,
      * `##` included — an over-estimate for continuations is harmless:
      * longer probes simply never match).
      */
    lazy val maxTokenLen: Int =
      if (vocab.isEmpty) 0 else vocab.iterator.map(t => t.codePointCount(0, t.length)).max
  }

  private def codePoints(w: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toArray
  }

  /** Train `numMerges` WordPiece merges on the corpus word table.
    * Stops early when no pair reaches `minCount` (the published
    * frequency floor — a pair seen once has an unreliable score).
    */
  def fit(docs: DataFrame, textCol: String, numMerges: Int,
          minCount: Long = 2L, maxWordChars: Int = 200,
          minWordCount: Long = 1L, maxVocab: Int = 2000000): Model =
    fitFromCounts(Bpe.wordCounts(docs, textCol), numMerges, minCount,
      maxWordChars, minWordCount, maxVocab)

  /** Train from a persisted/maintained (word, cnt) table — the same
    * incremental-refresh form as [[Unigram.fitFromCounts]]: the word
    * count is additively maintainable under document CDC, so a 100 TB
    * corpus retrains per sync from delta-sized folds with no rescan.
    */
  def fitFromCounts(wordCnt: DataFrame, numMerges: Int,
                    minCount: Long = 2L, maxWordChars: Int = 200,
                    minWordCount: Long = 1L, maxVocab: Int = 2000000): Model = {
    require(numMerges >= 1 && numMerges <= 5000, "numMerges in [1, 5000]")
    val rows = wordCnt
      .filter(length(col("word")) <= maxWordChars)
      .filter(col("cnt") >= minWordCount)
      .limit(maxVocab + 1).collect()
    require(rows.length <= maxVocab,
      s"WordPiece.fit: word table exceeds maxVocab=$maxVocab — raise " +
        "minWordCount (prune rare words, the published frequency floor) " +
        "or maxVocab")
    val words: Array[(String, Long)] =
      rows.map(r => (r.getString(0), r.getLong(1)))

    // symbol state per word: first code point bare, the rest ##-prefixed
    val state: Array[(scala.collection.mutable.ArrayBuffer[String], Long)] =
      words.map { case (w, c) =>
        val cps = codePoints(w)
        val syms = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < cps.length) {
          syms += (if (i == 0) cps(i) else ContPrefix + cps(i))
          i += 1
        }
        (syms, c)
      }
    val alphabet = scala.collection.mutable.LinkedHashSet.empty[String]
    state.foreach { case (s, _) => s.foreach(alphabet += _) }

    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    val merged = scala.collection.mutable.ArrayBuffer.empty[String]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      // weighted pair and symbol counts over the current state
      val pairCnt = scala.collection.mutable.HashMap.empty[(String, String), Long]
      val symCnt = scala.collection.mutable.HashMap.empty[String, Long]
      state.foreach { case (s, c) =>
        var i = 0
        while (i < s.length) {
          symCnt.update(s(i), symCnt.getOrElse(s(i), 0L) + c)
          if (i < s.length - 1) {
            val k = (s(i), s(i + 1))
            pairCnt.update(k, pairCnt.getOrElse(k, 0L) + c)
          }
          i += 1
        }
      }
      // argmax of p/(n_l·n_r) by exact cross-multiplication; ties by
      // (left utf8 asc, right utf8 asc) — a total order, so the merge
      // sequence is a pure function of the corpus
      var best: ((String, String), Long) = null
      var bestNl = 0L; var bestNr = 0L
      pairCnt.foreach { case (k @ (l, r), p) =>
        if (p >= minCount) {
          val nl = symCnt(l); val nr = symCnt(r)
          val better =
            if (best == null) true
            else {
              val cmp = (BigInt(p) * BigInt(bestNl) * BigInt(bestNr))
                .compare(BigInt(best._2) * BigInt(nl) * BigInt(nr))
              cmp > 0 || (cmp == 0 &&
                (Bpe.utf8Lt(l, best._1._1) ||
                  (l == best._1._1 && Bpe.utf8Lt(r, best._1._2))))
            }
          if (better) { best = (k, p); bestNl = nl; bestNr = nr }
        }
      }
      if (best == null) done = true
      else {
        val ((l, r), p) = best
        require(r.startsWith(ContPrefix),
          "WordPiece invariant: the right side of any adjacent pair is a continuation symbol")
        val tok = l + r.substring(ContPrefix.length)
        merges += Merge(rank, l, r, p, bestNl, bestNr)
        merged += tok
        state.foreach { case (s, _) =>
          if (s.length >= 2) {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            s.foreach { x =>
              if (out.nonEmpty && out.last == l && x == r)
                out(out.length - 1) = tok
              else out += x
            }
            if (out.length != s.length) { s.clear(); s ++= out }
          }
        }
        rank += 1
      }
    }
    // canonical utf8 vocab order: the alphabet set's encounter order
    // follows the collected word table's row order, which groupBy does
    // NOT determine — an unsorted vocab would make Model equality (and
    // anything reading vocab positionally) partitioning-dependent
    Model(merges.toArray,
      (alphabet ++ merged).toArray.distinct.sortWith(Bpe.utf8Lt), words)
  }

  /** Greedy longest-match-first (maximal munch) over the vocabulary —
    * BERT's WordpieceTokenizer: at each position take the LONGEST vocab
    * token matching (bare at word start, `##`-prefixed after); any
    * unmatched position makes the WHOLE word a single `[UNK]` token.
    * Returns (n_tokens, is_unk).
    */
  def encodeWord(word: String, m: Model): (Long, Boolean) = {
    val cps = codePoints(word)
    if (cps.isEmpty) return (0L, false)
    var pos = 0
    var n = 0L
    while (pos < cps.length) {
      var l = math.min(m.maxTokenLen, cps.length - pos)
      var hit = -1
      while (l >= 1 && hit < 0) {
        val sub = cps.slice(pos, pos + l).mkString
        val cand = if (pos == 0) sub else ContPrefix + sub
        if (m.vocabSet.contains(cand)) hit = l
        l -= 1
      }
      if (hit < 0) return (1L, true)
      n += 1
      pos += hit
    }
    (n, false)
  }

  /** Query form of training: one row per merge — (rank, left, right,
    * pair_count, left_count, right_count) in merge order; the score's
    * inputs ride along so the oracle verifies the argmax, not just the
    * winner.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val m = fit(docs, textCol, numMerges)
    val spark = docs.sparkSession
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        m.merges.map(x =>
          Row(x.rank, x.left, x.right, x.pairCount, x.leftCount, x.rightCount))
          .toIndexedSeq, 1),
      StructType(Seq(StructField("rank", IntegerType),
        StructField("left", StringType), StructField("right", StringType),
        StructField("pair_count", LongType),
        StructField("left_count", LongType),
        StructField("right_count", LongType))))
  }

  /** Per-DISTINCT-word greedy-encode results as a joinable frame —
    * (word, n_toks, is_unk). Encoding happened ONCE on the
    * vocabulary-sized word table; corpus-scale consumers broadcast-join
    * this frame instead of running maximal munch per occurrence.
    */
  def wordPieceCounts(spark: SparkSession, m: Model): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        m.words.map { case (w, _) =>
          val (n, unk) = encodeWord(w, m)
          Row(w, n, unk)
        }.toIndexedSeq, 1),
      StructType(Seq(StructField("word", StringType),
        StructField("n_toks", LongType), StructField("is_unk", BooleanType))))
}
