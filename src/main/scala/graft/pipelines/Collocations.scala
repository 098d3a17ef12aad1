package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Collocation / co-occurrence mining: adjacent-token pair statistics
  * with a pointwise-mutual-information score — the phrase-discovery pass
  * (Mikolov et al.'s word2vec phrase scoring, Church & Hanks' PMI) a
  * corpus pipeline runs to find multi-word expressions worth treating as
  * units.
  *
  * The score is reported as the PMI RATIO p(ab)/(p(a)·p(b)) rather than
  * its log: the ratio is a pure division chain over exact integer counts
  * (IEEE-deterministic, identical in any engine evaluating the same
  * expression), while `log` is libm-dependent and can differ in the last
  * ulp across engines — the oracle would flake. ratio > 1 means the pair
  * co-occurs more than independence predicts; log it downstream if a
  * log-PMI threshold is preferred.
  *
  * Scale shape: two keyed aggregations (unigrams, bigrams) + two joins of
  * the bigram table against the (much smaller) unigram table; nothing is
  * ever quadratic in vocabulary and no driver-side state exists — the
  * grand-total join is a one-row broadcast.
  */
object Collocations {

  /** (w1, w2, n_ab, pmi_ratio) for adjacent pairs occurring at least
    * `minPairCount` times. Tokenization matches TextFunctions.tokens
    * (whitespace); docs with fewer than 2 tokens contribute nothing.
    */
  def pmi(docs: DataFrame, textCol: String, minPairCount: Long = 2L): DataFrame = {
    val toks = docs.select(TextFunctions.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 2)
    // persist the VOCABULARY-sized unigram table: the grand total and
    // both pair joins read it, so the corpus is scanned twice in all
    // (unigrams, bigrams) instead of three times
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n_w"))
      .persist()
    val total = uni.agg(sum(col("n_w")).as("n_total"))
    val bi = toks.select(explode(expr(
        "transform(sequence(0, size(toks) - 2), " +
          "i -> struct(toks[i] AS w1, toks[i + 1] AS w2))")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
    val out = bi
      .join(uni.select(col("w").as("w1"), col("n_w").as("n_w1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("n_w").as("n_w2")), Seq("w2"))
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("n_ab"),
        (floor(col("n_ab").cast("double") * col("n_total").cast("double") /
          (col("n_w1").cast("double") * col("n_w2").cast("double")) * 10000.0
          + 0.5) / 10000.0).as("pmi_ratio"))
      .persist()
    out.count() // materialize (pair-set-sized), then release the unigrams
    uni.unpersist()
    out // caller releases (unpersist()/clearCache) — CorpusClean contract
  }
}
