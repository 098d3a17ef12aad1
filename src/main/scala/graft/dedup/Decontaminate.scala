package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GramHash

/** Benchmark decontamination: find training documents sharing long
  * n-grams with an evaluation set (the published GPT-3/LLaMA hygiene
  * step: any training doc containing a benchmark n-gram is flagged).
  *
  * Shape: explode each side to hashed n-grams — 8-byte keys, never the
  * n-gram text — and hash-join on the key. The benchmark side is small
  * (eval sets are), so the join broadcasts; the corpus side is one
  * narrow explode, no corpus shuffle at all.
  */
object Decontaminate {

  private def gramHashes(df: DataFrame, idCol: String, textCol: String,
                         n: Int, as: String): DataFrame =
    // one-pass rolling-polynomial gram keys (GramHashKeys): each token
    // hashed once, each gram key O(1) from the previous — true O(tokens)
    // per doc, no per-position slice allocation
    df.select(col(idCol).as(as),
      explode(array_distinct(GramHash.gramHashes(col(textCol), n))).as("gram_hash"))

  /** (corpus_id, bench_id, n_shared_grams) for every contaminated pair. */
  def overlaps(corpus: DataFrame, benchmark: DataFrame, idCol: String,
               textCol: String, n: Int = 13): DataFrame = {
    val c = gramHashes(corpus, idCol, textCol, n, "corpus_id")
    val b = gramHashes(benchmark, idCol, textCol, n, "bench_id")
    c.join(broadcast(b), Seq("gram_hash"))
      .groupBy(col("corpus_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** Corpus ids to drop: any doc sharing ≥ `minShared` n-grams with any
    * benchmark doc.
    */
  def contaminatedIds(corpus: DataFrame, benchmark: DataFrame, idCol: String,
                      textCol: String, n: Int = 13, minShared: Int = 1): DataFrame =
    overlaps(corpus, benchmark, idCol, textCol, n)
      .filter(col("n_shared_grams") >= minShared)
      .select(col("corpus_id")).distinct()

  /** Corpus SELF-overlap: document pairs sharing ≥ `minShared` exact
    * `n`-token passages — the published repeated-passage dedup signal
    * (long verbatim spans duplicated across training documents). The
    * token-granular Spark shape of the suffix-array approach: both
    * "sides" are the corpus, so nothing broadcasts — instead each
    * distinct gram key becomes a bucket (ONE shuffle on the 8-byte gram
    * hash), pairs enumerate strictly inside buckets (capped at
    * `maxBucket` members — a gram shared by thousands of docs is
    * boilerplate whose full pair list adds nothing), and the pair count
    * aggregation is proportional to true overlap output.
    */
  def selfOverlaps(corpus: DataFrame, idCol: String, textCol: String,
                   n: Int = 13, maxBucket: Int = 1000,
                   minShared: Int = 1): DataFrame =
    pairsFromGrams(corpus.select(col(idCol).as("id"),
        explode(array_distinct(GramHash.gramHashes(col(textCol), n))).as("g")),
      maxBucket, minShared)

  /** Character-granular self-overlap: shared passages detected on
    * NORMALIZED char n-grams (lowercase, collapsed whitespace), so a
    * verbatim span matches across tokenization, case and formatting
    * differences — the below-token-granularity shared-passage signal
    * (suffix arrays find maximal extents; this finds the same pairs at
    * fixed granularity with one shuffle and no index build). Same capped
    * bucket-pair shape as the token form; `n` counts characters
    * (n=40 ≈ a sentence fragment).
    */
  def selfOverlapsChar(corpus: DataFrame, idCol: String, textCol: String,
                       n: Int = 40, maxBucket: Int = 1000,
                       minShared: Int = 1): DataFrame =
    pairsFromGrams(corpus.select(col(idCol).as("id"),
        explode(array_distinct(GramHash.charGramHashes(col(textCol), n))).as("g")),
      maxBucket, minShared)

  /** Shared pair machinery: each distinct gram key is a bucket (ONE
    * shuffle on the 8-byte hash), pairs enumerate strictly inside
    * capped buckets, and the count aggregation is ∝ true overlap.
    */
  private def pairsFromGrams(grams: DataFrame, maxBucket: Int,
                             minShared: Int): DataFrame = {
    val buckets = grams.groupBy(col("g"))
      .agg(slice(array_sort(collect_set(col("id"))), 1, maxBucket).as("members"))
      .filter(size(col("members")) > 1)
    buckets.select(explode(expr(
        "flatten(transform(members, (a, i) -> " +
          "transform(slice(members, i + 2, size(members)), " +
          "b -> named_struct('id_a', a, 'id_b', b))))")).as("p"))
      .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .agg(count(lit(1)).as("n_shared_grams"))
      .filter(col("n_shared_grams") >= minShared)
  }
}
