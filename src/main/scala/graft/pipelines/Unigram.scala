package graft.pipelines

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unigram-LM subword tokenizer training (Kudo, ACL 2018 — the
  * SentencePiece unigram model), the OTHER tokenizer family every
  * published LLM pipeline offers beside BPE: instead of growing a
  * vocabulary by greedy merges, START from a large substring candidate
  * set and fit a unigram language model over segmentations, keeping the
  * tokens the model actually uses.
  *
  * Like [[Bpe]], the published algorithm operates on the
  * WORD-FREQUENCY table: one corpus aggregate reduces 100 TB of text to
  * a vocabulary-sized (word, count) frame, and everything after — seed
  * candidates, EM, pruning — touches only that frame on the driver (the
  * Lloyd-centroid/BPE collect tier, limit-guarded with a loud error).
  *
  * This implementation is the HARD-EM (Viterbi) variant: the E-step
  * assigns each word its single best segmentation under the current
  * token costs, the M-step recounts token frequencies from those
  * segmentations, iterating TO A FIXPOINT (counts stable). Hard EM
  * keeps every quantity an exact integer except the cost table itself,
  * which is quantized to integer MICRO-NATS — cost(t) = floor(−1e6 ·
  * ln((c_t + 1) / (T + V))) (Laplace-smoothed so zero-count tokens stay
  * finite) — so the Viterbi DP is pure integer min-plus and the trained
  * model is verifiable from outside: at the fixpoint, re-running one
  * E-step with the pinned integer costs and recounting MUST reproduce
  * the pinned counts exactly (the oracle's gate), and each pinned cost
  * must be the floor of the log of its own pinned count (cost gate).
  *
  * Determinism: seed candidates are capped by the total order
  * (count desc, token utf8 asc); Viterbi tie-breaks by (cost asc,
  * earliest token start asc) — i.e. the LONGEST last token on equal
  * cost; the fixpoint is reached by exact integer comparison. The whole
  * trainer is a pure function of the word table.
  */
object Unigram {

  /** Trained model: parallel arrays over the final vocabulary plus the
    * per-word Viterbi token counts at the fixpoint (for encode /
    * fertility without a distributed DP — the word table is the
    * vocabulary-sized frame, so segment-once-join-everywhere is the
    * scale shape).
    */
  final case class Model(
      tokens: Array[String],     // final vocabulary
      counts: Array[Long],       // fixpoint Viterbi counts (may be 0)
      costs: Array[Long],        // micro-nat costs derived from counts
      wordTokens: Array[(String, Long, Array[String])]) // (word, cnt, segmentation)

  /** Viterbi-segment one word (code-point symbols) under an integer
    * cost table. Returns token START indices (code-point offsets) plus
    * the end; tie-break = (cost asc, earliest start asc) so equal-cost
    * paths prefer the LONGEST last token — mirrored verbatim by the
    * oracle's min-struct.
    */
  private def viterbi(cps: Array[String], cost: collection.Map[String, Long],
                      maxTokLen: Int): Array[Int] = {
    val n = cps.length
    val dp = new Array[Long](n + 1)
    val pred = new Array[Int](n + 1)
    var j = 1
    while (j <= n) {
      var best = Long.MaxValue
      var bi = -1
      var i = math.max(0, j - maxTokLen)
      while (i < j) {
        val tok = cps.slice(i, j).mkString
        cost.get(tok) match {
          case Some(c) if dp(i) != Long.MaxValue =>
            val cand = dp(i) + c
            if (cand < best) { best = cand; bi = i }
          case _ =>
        }
        i += 1
      }
      dp(j) = best
      pred(j) = bi
      j += 1
    }
    require(dp(n) != Long.MaxValue,
      "Unigram.viterbi: unreachable word — single-codepoint coverage was violated")
    // backtrack to starts
    val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var p = n
    while (p > 0) { starts += pred(p); p = pred(p) }
    starts.reverseIterator.toArray
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

  /** cost(t) = floor(−1e6 · ln((c+1)/(T+V))) — Laplace-smoothed
    * micro-nats; always finite, monotone decreasing in c.
    */
  private def microNatCost(c: Long, total: Long, vocab: Int): Long =
    math.floor(-1e6 * StrictMath.log((c + 1).toDouble / (total + vocab).toDouble)).toLong

  /** Train the unigram model. Returns the [[Model]]; see [[train]] for
    * the DataFrame form the query registry uses.
    *
    * @param vocabSize   multi-codepoint token budget after pruning
    *                    (single codepoints are ALWAYS kept — coverage)
    * @param seedMaxLen  max token length in code points (the DP window)
    * @param seedFactor  seed candidate pool = seedFactor × vocabSize
    * @param minSubCount seed floor: a multi-char substring must occur
    *                    this often (weighted by word count) to seed
    */
  def fit(docs: DataFrame, textCol: String, vocabSize: Int,
          seedMaxLen: Int = 6, seedFactor: Int = 4, minSubCount: Long = 2L,
          maxIters: Int = 30, maxWordChars: Int = 200,
          minWordCount: Long = 1L, maxVocab: Int = 2000000): Model =
    fitFromCounts(Bpe.wordCounts(docs, textCol), vocabSize, seedMaxLen,
      seedFactor, minSubCount, maxIters, maxWordChars, minWordCount, maxVocab)

  /** Train from a PERSISTED/MAINTAINED (word, cnt) table — the
    * incremental-refresh form: the trainer's only corpus-scale input
    * is the word-count frame, which is ADDITIVELY MAINTAINABLE under
    * document CDC (counts(inserts) − counts(deletes), the
    * Dsir/IncrementalAgg/ItemSim state pattern) — so a 100 TB corpus
    * retrains its tokenizer per sync from delta-sized folds with no
    * corpus rescan. UnigramSpec proves fold == rescan end-to-end
    * (identical Model from the folded table and the full re-count).
    */
  def fitFromCounts(wordCnt: DataFrame, vocabSize: Int,
                    seedMaxLen: Int = 6, seedFactor: Int = 4,
                    minSubCount: Long = 2L, maxIters: Int = 30,
                    maxWordChars: Int = 200, minWordCount: Long = 1L,
                    maxVocab: Int = 2000000): Model = {
    require(vocabSize >= 1 && vocabSize <= 1000000, "vocabSize in [1, 1e6]")
    require(seedMaxLen >= 2 && seedMaxLen <= 16, "seedMaxLen in [2, 16]")
    val rows = wordCnt
      .filter(length(col("word")) <= maxWordChars)
      .filter(col("cnt") >= minWordCount)
      .limit(maxVocab + 1).collect()
    require(rows.length <= maxVocab,
      s"Unigram.fit: word table exceeds maxVocab=$maxVocab — raise " +
        "minWordCount (the published frequency floor) or maxVocab")
    val words: Array[(Array[String], Long)] =
      rows.map(r => (codePoints(r.getString(0)), r.getLong(1)))
    if (words.isEmpty)
      return Model(Array.empty, Array.empty, Array.empty, Array.empty)

    // ---- seed: every single code point (coverage) + the top
    // seedFactor×vocabSize multi-char substrings by weighted occurrence
    val seedCounts = scala.collection.mutable.HashMap.empty[String, Long]
    words.foreach { case (cps, cnt) =>
      val n = cps.length
      var i = 0
      while (i < n) {
        var l = 1
        val sb = new StringBuilder
        while (l <= seedMaxLen && i + l <= n) {
          sb.append(cps(i + l - 1))
          val t = sb.toString
          seedCounts.update(t, seedCounts.getOrElse(t, 0L) + cnt)
          l += 1
        }
        i += 1
      }
    }
    val singles = seedCounts.keysIterator
      .filter(t => t.codePointCount(0, t.length) == 1).toArray
    val multi = seedCounts.iterator
      .filter { case (t, c) => t.codePointCount(0, t.length) > 1 && c >= minSubCount }
      .toArray
      .sortWith { case ((t1, c1), (t2, c2)) =>
        c1 > c2 || (c1 == c2 && Bpe.utf8Lt(t1, t2))
      }
      .take(seedFactor * vocabSize)
      .map(_._1)
    var vocab: Array[String] = (singles ++ multi).sortWith(Bpe.utf8Lt)
    // seed counts bootstrap the first cost table
    var counts: collection.Map[String, Long] =
      vocab.iterator.map(t => t -> seedCounts(t)).toMap

    // ---- hard EM to fixpoint (counts stable under E+M)
    def emToFixpoint(): Array[(String, Long, Array[String])] = {
      var segs: Array[(String, Long, Array[String])] = null
      var iter = 0
      var done = false
      while (!done && iter < maxIters) {
        val total = counts.valuesIterator.sum
        val cost: collection.Map[String, Long] =
          counts.map { case (t, c) => t -> microNatCost(c, total, vocab.length) }
        val next = scala.collection.mutable.HashMap.empty[String, Long]
        segs = words.map { case (cps, cnt) =>
          val starts = viterbi(cps, cost, seedMaxLen)
          val toks = new Array[String](starts.length)
          var k = 0
          while (k < starts.length) {
            val end = if (k + 1 < starts.length) starts(k + 1) else cps.length
            toks(k) = cps.slice(starts(k), end).mkString
            next.update(toks(k), next.getOrElse(toks(k), 0L) + cnt)
            k += 1
          }
          (cps.mkString, cnt, toks)
        }
        val nextCounts: collection.Map[String, Long] =
          vocab.iterator.map(t => t -> next.getOrElse(t, 0L)).toMap
        done = nextCounts == counts
        counts = nextCounts
        iter += 1
      }
      if (!done) throw new IllegalStateException(
        s"Unigram.fit: hard EM did not reach a count fixpoint in $maxIters " +
          "iterations (oscillating segmentation) — raise maxIters; a " +
          "non-fixpoint model would fail its own self-consistency oracle")
      segs
    }
    emToFixpoint()

    // ---- single prune round (the published shape, simplified to one
    // round): drop unused multi-char tokens, cap survivors at
    // vocabSize by (count desc, token utf8 asc), then EM to a fresh
    // fixpoint over the pruned vocabulary
    val keepMulti = vocab.iterator
      .filter(t => t.codePointCount(0, t.length) > 1 && counts(t) > 0L)
      .toArray
      .sortWith { (a, b) =>
        val ca = counts(a); val cb = counts(b)
        ca > cb || (ca == cb && Bpe.utf8Lt(a, b))
      }
      .take(vocabSize)
    vocab = (singles ++ keepMulti).sortWith(Bpe.utf8Lt)
    counts = vocab.iterator.map(t => t -> counts(t)).toMap
    val segs = emToFixpoint()

    val total = counts.valuesIterator.sum
    Model(
      vocab,
      vocab.map(counts),
      vocab.map(t => microNatCost(counts(t), total, vocab.length)),
      segs)
  }

  /** Query form: one row per vocabulary token — (token, cnt,
    * cost_unat), ordered by token.
    */
  def train(docs: DataFrame, textCol: String, vocabSize: Int,
            seedMaxLen: Int = 6): DataFrame = {
    val m = fit(docs, textCol, vocabSize, seedMaxLen = seedMaxLen)
    val spark = docs.sparkSession
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        m.tokens.indices.map(i => Row(m.tokens(i), m.counts(i), m.costs(i))), 1),
      StructType(Seq(StructField("token", StringType),
        StructField("cnt", LongType), StructField("cost_unat", LongType))))
  }

  /** The fixpoint per-word subword counts as a joinable frame —
    * (word, n_toks). Segmentation happened ONCE on the vocabulary-sized
    * word table; corpus-scale consumers join this (broadcastable)
    * frame instead of running a distributed DP per occurrence.
    */
  def wordTokenCounts(spark: SparkSession, m: Model): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        m.wordTokens.map { case (w, _, toks) =>
          Row(w, toks.length.toLong)
        }.toIndexedSeq, 1),
      StructType(Seq(StructField("word", StringType),
        StructField("n_toks", LongType))))
}
