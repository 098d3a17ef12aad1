package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained quality-filter classifier — the "looks like the curated
  * corpus" selection signal of the published LLM pipelines (GPT-3
  * appendix A trains a classifier with curated corpora as positives and
  * raw Common Crawl as negatives; LLaMA's filter classifies pages
  * Wikipedia references as positives). Where [[Dsir]] scores
  * target-LIKENESS as an importance ratio, this is the 2-class
  * Naive-Bayes POSTERIOR log-odds:
  *
  *   score(x) = ln P(pos)/P(neg) + Σ_b c_x[b]·(ln p̂_pos[b] − ln p̂_neg[b])
  *
  * over the same hashed bag-of-words buckets — classify quality via
  * `score > 0` (posterior > 1/2), or keep the raw log-odds for the
  * GPT-3-style stochastic keep (`keep if score exceeds a Pareto draw`).
  *
  * Reuses the DSIR machinery verbatim: the per-bucket log-ratio IS
  * [[Dsir.weights]] with (positive, negative) in the (target, corpus)
  * slots — add-one smoothing included — and scoring is the same exact
  * BIGINT dot product of row-local bucket counts, plus the quantized
  * prior. Cross-engine determinism, quantization (`floor(10⁴·ln + 0.5)`)
  * and the scale shape (two wide aggregates to train, one narrow
  * zero-shuffle scoring pass) are inherited unchanged; the DuckDB oracle
  * replays training AND scoring end-to-end, so the trained model is
  * hash-verified, not trusted.
  */
object QualityClassifier {

  /** (idCol, nb_score, is_quality): quantized Naive-Bayes posterior
    * log-odds (units of 10⁻⁴ nats) of every corpus document under hashed
    * unigram class models trained on `positives` vs `negatives`, and the
    * MAP decision `nb_score > 0`. Blank/null docs carry no evidence and
    * are dropped, in training and scoring alike (the [[Dsir]] contract).
    */
  def scores(corpus: DataFrame, positives: DataFrame, negatives: DataFrame,
             idCol: String, textCol: String, nBuckets: Int = 64): DataFrame = {
    require(nBuckets >= 2, "need at least two hash buckets")
    val spark = corpus.sparkSession
    def nonBlank(df: DataFrame) =
      df.filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
    val cp = Dsir.bucketTotals(
      Dsir.withBucketCounts(positives, Seq(col(idCol)), textCol, nBuckets), nBuckets)
    val cn = Dsir.bucketTotals(
      Dsir.withBucketCounts(negatives, Seq(col(idCol)), textCol, nBuckets), nBuckets)
    val nPos = nonBlank(positives).count()
    val nNeg = nonBlank(negatives).count()
    require(nPos > 0 && nNeg > 0,
      s"both classes need non-blank training docs (pos=$nPos, neg=$nNeg)")
    val w = Dsir.weights(spark, cp, cn, nBuckets)
    Dsir.scoreWith(corpus, idCol, textCol, w, nBuckets)
      .select(col(idCol),
        (col("dsir_score") + priorCol(nPos, nNeg)).as("nb_score"))
      .withColumn("is_quality", col("nb_score") > 0L)
  }

  /** Scores against PERSISTED/MAINTAINED class-count tables (the
    * [[Dsir.importanceScoresFromCounts]] twin): each class is a
    * `(b, n)` token-bucket count table ([[Dsir.tokenBucketCounts]],
    * CDC-foldable as counts(inserts) − counts(deletes)) plus its
    * non-blank doc count — the classifier refreshes per sync with
    * delta-sized folds, and the only corpus pass is the scoring scan.
    * Missing buckets read as zero, like the DSIR twin.
    */
  def scoresFromCounts(corpus: DataFrame, posCounts: DataFrame,
                       negCounts: DataFrame, nPosDocs: Long, nNegDocs: Long,
                       idCol: String, textCol: String,
                       nBuckets: Int = 64): DataFrame = {
    require(nBuckets >= 2, "need at least two hash buckets")
    require(nPosDocs > 0 && nNegDocs > 0,
      s"both classes need training docs (pos=$nPosDocs, neg=$nNegDocs)")
    val spark = corpus.sparkSession
    def toArr(counts: DataFrame): Array[Long] = {
      val rows = counts.select(col("b").cast("int"), col("n").cast("long"))
        .limit(nBuckets + 1).collect()
      require(rows.length <= nBuckets,
        s"count table has more than $nBuckets rows — not a bucket-count table?")
      val m = rows.map(r => r.getInt(0) -> r.getLong(1)).toMap
      require(m.keys.forall(b => b >= 0 && b < nBuckets),
        s"bucket id outside [0, $nBuckets) — counts built with a different nBuckets?")
      Array.tabulate(nBuckets)(i => m.getOrElse(i, 0L))
    }
    val w = Dsir.weights(spark, toArr(posCounts), toArr(negCounts), nBuckets)
    Dsir.scoreWith(corpus, idCol, textCol, w, nBuckets)
      .select(col(idCol),
        (col("dsir_score") + priorCol(nPosDocs, nNegDocs)).as("nb_score"))
      .withColumn("is_quality", col("nb_score") > 0L)
  }

  /** [[scores]] when the classes are a FLAG over the corpus itself
    * (positives = flagged, negatives = the rest — the registered
    * pipeline shape): identical output, but the whole training pass is
    * ONE wide aggregate (both class distributions AND both doc counts),
    * so the query is two corpus scans total — train + score.
    */
  def scoresByFlag(corpus: DataFrame, positiveFlag: Column, idCol: String,
                   textCol: String, nBuckets: Int = 64): DataFrame = {
    require(nBuckets >= 2, "need at least two hash buckets")
    val spark = corpus.sparkSession
    val (cp, call, dPos, dAll) =
      Dsir.splitTotals(corpus, positiveFlag, textCol, nBuckets)
    val cn = cp.indices.map(i => call(i) - cp(i)).toArray
    val (nPos, nNeg) = (dPos, dAll - dPos)
    require(nPos > 0 && nNeg > 0,
      s"both classes need non-blank training docs (pos=$nPos, neg=$nNeg)")
    val w = Dsir.weights(spark, cp, cn, nBuckets)
    Dsir.scoreWith(corpus, idCol, textCol, w, nBuckets)
      .select(col(idCol),
        (col("dsir_score") + priorCol(nPos, nNeg)).as("nb_score"))
      .withColumn("is_quality", col("nb_score") > 0L)
  }

  /** The quantized class-prior log-odds floor(10⁴·ln(nPos/nNeg) + 0.5)
    * as an engine EXPRESSION over literals: Catalyst's ConstantFolding
    * evaluates it at plan time with the same Math.log the codegen path
    * uses, so the value is identical to the former spark.range(1).head()
    * round-trip — minus one scheduled job per call (round 13; the
    * classifier was two corpus scans plus this stray 1-row job).
    */
  private def priorCol(nPos: Long, nNeg: Long): Column =
    floor(lit(10000.0) * log(lit(nPos).cast("double") / lit(nNeg).cast("double"))
      + lit(0.5)).cast("long")
}
