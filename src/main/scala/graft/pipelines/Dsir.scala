package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
  * 2023): score every corpus document by how target-like it is under
  * hashed bag-of-words models, log w(x) = Σ_b c_x[b]·(ln p̂_target[b] −
  * ln p̂_corpus[b]), where c_x is the document's hashed token-bucket
  * count vector and the p̂ are add-one-smoothed bucket distributions.
  * High-scoring documents read like the target domain; resampling by
  * the weights focuses a web-scale corpus on it (the published recipe
  * selects The-Pile-quality slices from Common Crawl this way).
  *
  * Cross-engine determinism (the SURVEY §6 rules): the per-bucket
  * log-ratio is quantized ONCE — `l[b] = floor(10⁴·ln(num/den) + 0.5)`
  * over exact integer num = (ct[b]+1)·(Nq+B), den = (cq[b]+1)·(Nt+B) —
  * and the document score is the exact BIGINT dot product Σ c_x[b]·l[b];
  * the single ln per bucket ships at the same ppm floor-boundary risk
  * the oracle-green PSI family carries. Token→bucket hashing is the
  * portable md5-prefix hash both engines compute identically.
  *
  * Scale shape: training totals come from a token explode into a
  * B-key grouped count — partial aggregation combines map-side, so the
  * shuffle carries ≤ (B+1)·tasks rows regardless of corpus size, and
  * per-row work is O(tokens) (the earlier row-local count-vector fold
  * was O(tokens·B) array rebuilds per document — measured 9.2× vs the
  * oracle before the round-14 rewrite); ≤ B+1 rows reach the driver.
  * Weights are B literals; scoring is a narrow zero-shuffle corpus
  * pass summing w[bucket(t)] per token. Total: two corpus scans + one
  * target scan.
  *
  * Contract: (ct+1)·(Nq+B) must stay < 2⁵³ for the double conversion to
  * be exact — with B=64 that allows ~10⁸ target tokens per bucket
  * against a 10¹⁴-token corpus; shard the corpus totals first if beyond.
  */
object Dsir {

  /** Pinned whitespace class (Java \s ∋ \x0B, RE2 \s ∌ — see SURVEY §6). */
  private val WS = "[ \\t\\n\\r\\f]+"

  /** Portable token bucket: 24-bit md5 prefix mod `nBuckets` — DuckDB
    * replays it as `('0x' || substr(md5(t),1,6))::BIGINT % nBuckets`.
    */
  def bucketOf(token: Column, nBuckets: Int): Column =
    pmod(conv(substring(md5(token), 1, 6), 16, 10).cast("long"), lit(nBuckets))

  /** Per-document hashed bucket-count vector (array of `nBuckets` longs),
    * built row-locally: O(tokens·B) per doc, zero shuffle. Blank docs
    * are dropped (they carry no evidence either way).
    */
  private[pipelines] def withBucketCounts(df: DataFrame, idCols: Seq[Column],
                               textCol: String, nBuckets: Int): DataFrame =
    df.filter(trim(col(textCol)) =!= "" && col(textCol).isNotNull)
      .select(idCols :+
        aggregate(
          transform(split(trim(col(textCol)), WS), t => bucketOf(t, nBuckets)),
          array_repeat(lit(0L), nBuckets),
          (acc, x) => transform(acc, (v, i) =>
            when(i.cast("long") === x, v + 1L).otherwise(v))).as("__bc"): _*)

  /** One wide aggregate → the corpus-wide bucket totals (B longs). */
  private[pipelines] def bucketTotals(bc: DataFrame, nBuckets: Int): Array[Long] = {
    val sums = (0 until nBuckets).map(i =>
      coalesce(sum(element_at(col("__bc"), i + 1)), lit(0L)).as(s"b$i"))
    val row = bc.agg(sums.head, sums.tail: _*).head()
    Array.tabulate(nBuckets)(i => row.getLong(i))
  }

  /** The quantized per-bucket log-ratio weights, evaluated by the SAME
    * engine expression stack the queries run (Spark SQL ln — matching
    * the oracle's DuckDB ln at the PSI family's established risk floor).
    */
  private[pipelines] def weights(spark: SparkSession, ct: Array[Long], cq: Array[Long],
                      nBuckets: Int): Array[Long] = {
    val nt = ct.sum; val nq = cq.sum
    val num = ct.map(c => (c + 1L) * (nq + nBuckets))
    val den = cq.map(c => (c + 1L) * (nt + nBuckets))
    val row = spark.range(1).select(
      transform(sequence(lit(0), lit(nBuckets - 1)), i =>
        floor(lit(10000.0) *
          log(element_at(lit(num), i.cast("int") + 1).cast("double") /
              element_at(lit(den), i.cast("int") + 1).cast("double")) +
          lit(0.5)).cast("long")).as("w")).head()
    row.getSeq[Long](0).toArray
  }

  /** The scoring pass: exact BIGINT dot product of each doc's bucket
    * counts with the quantized weights — narrow, zero shuffle.
    * Computed DIRECTLY as Σ_t w[bucket(t)] (identical by distributivity
    * to Σ_b c[b]·w[b]; long addition is exact and order-free): O(tokens)
    * per row, where materializing the count vector first was
    * O(tokens·B) array rebuilds — measured 9.2× vs the oracle on
    * q_quality_classifier before this rewrite (round 14).
    */
  private[pipelines] def scoreWith(corpus: DataFrame, idCol: String, textCol: String,
                        w: Array[Long], nBuckets: Int): DataFrame =
    graft.operators.Parallelism.spread(corpus)
      .filter(trim(col(textCol)) =!= "" && col(textCol).isNotNull)
      .select(col(idCol),
        aggregate(
          transform(split(trim(col(textCol)), WS), t =>
            element_at(lit(w), bucketOf(t, nBuckets).cast("int") + 1)),
          lit(0L), (acc, x) => acc + x).as("dsir_score"))

  /** (idCol, dsir_score): quantized DSIR log-importance per corpus
    * document, target-likeness under hashed unigram models. Resample by
    * the score (e.g. `Mixture.sampleWeighted` on a rate derived from it)
    * to focus the corpus on the target domain.
    */
  def importanceScores(corpus: DataFrame, target: DataFrame, idCol: String,
                       textCol: String, nBuckets: Int = 64): DataFrame = {
    require(nBuckets >= 2, "need at least two hash buckets")
    val spark = corpus.sparkSession
    val cq = bucketTotals(
      withBucketCounts(corpus, Seq(col(idCol)), textCol, nBuckets), nBuckets)
    val ct = bucketTotals(
      withBucketCounts(target, Seq(col(idCol)), textCol, nBuckets), nBuckets)
    scoreWith(corpus, idCol, textCol, weights(spark, ct, cq, nBuckets), nBuckets)
  }

  /** Both distributions of a flag-split corpus in ONE wide aggregate:
    * (flagged bucket totals, all-rows bucket totals, flagged non-blank
    * doc count, all non-blank doc count). The common pipeline shape —
    * target/positives marked by a predicate over the same corpus —
    * pays one scan instead of two scans plus two counts.
    */
  private[pipelines] def splitTotals(corpus: DataFrame, flag: Column,
                                     textCol: String, nBuckets: Int)
      : (Array[Long], Array[Long], Long, Long) = {
    // token explode into a B-key grouped count (partial aggregation
    // combines map-side, so shuffle volume is ≤ (B+1)·tasks rows, never
    // token-sized) — O(tokens) per row where the row-local count-vector
    // fold was O(tokens·B) array rebuilds. The -1 sentinel, one per
    // non-blank doc, carries the two doc counts in the same single pass.
    val rows = graft.operators.Parallelism.spread(corpus)
      .filter(trim(col(textCol)) =!= "" && col(textCol).isNotNull)
      .select(flag.as("__t"),
        explode(concat(array(lit(-1L)),
          transform(split(trim(col(textCol)), WS), t => bucketOf(t, nBuckets))))
          .as("__b"))
      .groupBy(col("__b"))
      .agg(sum(when(col("__t"), lit(1L)).otherwise(lit(0L))).as("t"),
        count(lit(1)).as("a"))
      .collect()
    val tM = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val aM = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    (Array.tabulate(nBuckets)(i => tM.getOrElse(i.toLong, 0L)),
      Array.tabulate(nBuckets)(i => aM.getOrElse(i.toLong, 0L)),
      tM.getOrElse(-1L, 0L), aM.getOrElse(-1L, 0L))
  }

  /** [[importanceScores]] when the target is a FLAG over the corpus
    * itself (the registered-pipeline shape): identical output, but both
    * distributions come from one wide aggregate — one training scan
    * instead of two, one driver action instead of two.
    */
  def importanceScoresByFlag(corpus: DataFrame, targetFlag: Column,
                             idCol: String, textCol: String,
                             nBuckets: Int = 64): DataFrame = {
    require(nBuckets >= 2, "need at least two hash buckets")
    val (ct, cq, _, _) = splitTotals(corpus, targetFlag, textCol, nBuckets)
    scoreWith(corpus, idCol, textCol,
      weights(corpus.sparkSession, ct, cq, nBuckets), nBuckets)
  }

  /** The FOLDABLE form of a distribution: a (b, n) bucket-count table —
    * plain grouped counts, exactly the state shape the engine's
    * incremental machinery maintains (a document CDC feed folds as
    * counts(inserts) − counts(deletes); DsirSpec proves fold == rescan).
    * Built from the row-local vectors through one wide aggregate —
    * zero token shuffle, ≤ nBuckets output rows.
    */
  def tokenBucketCounts(df: DataFrame, textCol: String,
                        nBuckets: Int = 64): DataFrame = {
    val bc = withBucketCounts(df, Seq(), textCol, nBuckets)
    val sums = (0 until nBuckets).map(i =>
      coalesce(sum(element_at(col("__bc"), i + 1)), lit(0L)).as(s"__s$i"))
    bc.agg(sums.head, sums.tail: _*)
      .select(posexplode(array((0 until nBuckets).map(i => col(s"__s$i")): _*))
        .as(Seq("__i", "n")))
      .select(col("__i").cast("long").as("b"), col("n"))
  }

  /** Scores against PERSISTED/MAINTAINED count tables: the importance
    * model refreshes per sync with delta-sized folds — no target or
    * corpus-distribution rescan; the only corpus pass is the scoring
    * scan itself. Missing buckets read as zero (a fold that never
    * touched a bucket and a rescan that counted zero agree).
    */
  def importanceScoresFromCounts(corpus: DataFrame, targetCounts: DataFrame,
                                 corpusCounts: DataFrame, idCol: String,
                                 textCol: String,
                                 nBuckets: Int = 64): DataFrame = {
    def toArr(counts: DataFrame): Array[Long] = {
      // bounded collect: a mistaken data-sized frame must fail loudly,
      // not pull the corpus onto the driver
      val rows = counts.select(col("b").cast("int"), col("n").cast("long"))
        .limit(nBuckets + 1).collect()
      require(rows.length <= nBuckets,
        s"count table has more than $nBuckets rows — not a bucket-count table?")
      val m = rows.map(r => r.getInt(0) -> r.getLong(1)).toMap
      require(m.keys.forall(b => b >= 0 && b < nBuckets),
        s"bucket id outside [0, $nBuckets) — counts built with a different nBuckets?")
      Array.tabulate(nBuckets)(i => m.getOrElse(i, 0L))
    }
    val w = weights(corpus.sparkSession, toArr(targetCounts),
      toArr(corpusCounts), nBuckets)
    scoreWith(corpus, idCol, textCol, w, nBuckets)
  }
}
