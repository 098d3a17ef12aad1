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

  /** The LARGE-benchmark scale path of [[overlaps]]: when the evaluation
    * set's gram table is too big to broadcast (a full eval-suite union at
    * 100 TB corpus scale easily holds 10⁸⁺ grams — past any broadcast
    * threshold), a plain shuffle join would move EVERY corpus gram. One
    * mergeable `BloomFilterAggregate` pass over the benchmark grams
    * builds a bloom of the gram hashes (sized by `expectedGrams`/`fpp`);
    * corpus grams missing the bloom are definitely-clean (no false
    * negatives) and never shuffle — only bloom hits (true overlaps +
    * ~fpp false positives) pay the exact join, which corrects every
    * false positive. Output == [[overlaps]] EXACTLY (proven in
    * NearDupSpec); the registered query `q_decontaminate_bloom` is
    * hash-checked against the same DuckDB oracle as `q_decontaminate`.
    */
  def overlapsBloomGated(corpus: DataFrame, benchmark: DataFrame,
                         idCol: String, textCol: String, n: Int = 13,
                         expectedGrams: Long = 1000000L,
                         fpp: Double = 0.01): DataFrame = {
    val b = gramHashes(benchmark, idCol, textCol, n, "bench_id")
    val c = gramHashes(corpus, idCol, textCol, n, "corpus_id")
    val bloom = graft.operators.Dedup.buildKeyBloom(
      b, Seq("gram_hash"), expectedGrams, fpp)
    if (bloom == null) // empty benchmark: nothing can be contaminated
      return c.limit(0).select(col("corpus_id"),
        lit(null).cast("long").as("bench_id"),
        lit(0L).as("n_shared_grams")).limit(0)
    val gated = graft.operators.Dedup
      .filterByKeyBloom(c, Seq("gram_hash"), bloom)
    gated.join(b, Seq("gram_hash"))
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
    * hash), pairs enumerate strictly inside buckets (grams in more than
    * `maxBucket` docs are boilerplate and are dropped with bounded
    * aggregation state — see [[pairsFromGrams]]), and the pair count
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

  /** MAXIMAL shared-passage extents: for each document pair, the longest
    * runs of consecutive shared `n`-grams, reported as
    * (id_a, id_b, start_a, start_b, length) with token-granular
    * positions — the full suffix-array-style signal ([[selfOverlaps]]
    * reports pair + gram count only; this answers WHERE the duplicated
    * span sits and HOW LONG it is, which is what span-level dedup and
    * contamination audits act on).
    *
    * Shape: grams keep their token position (`posexplode`), (id, pos)
    * packs into one long so the bucket builder stays the bounded
    * aggregate, pairs enumerate inside capped gram buckets exactly like
    * [[selfOverlaps]], and runs merge WITHOUT any per-pair loop: two hits
    * belong to the same aligned span iff they share the alignment offset
    * `pos_b - pos_a` AND their positions are consecutive — the classic
    * gaps-and-islands window (`pos_a - row_number()` is constant within a
    * run). One keyed shuffle for buckets + one window shuffle on pairs.
    *
    * Contract: ids must be non-negative and < 2^41, positions < 2^22
    * (docs beyond 4M grams should be chunked first — see `q_chunk_docs`).
    * `length` is in tokens: run-of-grams + n - 1.
    */
  def selfOverlapExtents(corpus: DataFrame, idCol: String, textCol: String,
                         n: Int = 13, maxBucket: Int = 1000,
                         minLength: Int = 0): DataFrame =
    extentsFromGrams(corpus.select(col(idCol).cast("long").as("id"),
        posexplode(GramHash.gramHashes(col(textCol), n)).as(Seq("pos", "g"))),
      n, maxBucket, minLength)

  /** Character-granular twin of [[selfOverlapExtents]]: spans on the
    * NORMALIZED text (lowercase, collapsed whitespace — the coordinates
    * refer to the normalized form), `length` in normalized characters.
    */
  def selfOverlapExtentsChar(corpus: DataFrame, idCol: String, textCol: String,
                             n: Int = 40, maxBucket: Int = 1000,
                             minLength: Int = 0): DataFrame =
    extentsFromGrams(corpus.select(col(idCol).cast("long").as("id"),
        posexplode(GramHash.charGramHashes(col(textCol), n)).as(Seq("pos", "g"))),
      n, maxBucket, minLength)

  private val PosBits = 22 // positions < 4M per doc; ids < 2^41

  private def extentsFromGrams(grams: DataFrame, n: Int, maxBucket: Int,
                               minLength: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val packed = grams.select(col("g"),
      (shiftleft(col("id"), PosBits) + col("pos")).as("m"))
    // bounded bucket build — same over-cap drop semantics as selfOverlaps
    // (cap counts gram OCCURRENCES here: positions, not just docs)
    val buckets = packed.groupBy(col("g"))
      .agg(graft.functions.BoundedDistinct.boundedDistinct(col("m"), maxBucket + 1).as("members"))
      .filter(size(col("members")).between(2, maxBucket))
    val hits = buckets.select(explode(expr(
        "flatten(transform(members, (a, i) -> " +
          "transform(slice(members, i + 2, size(members)), " +
          "b -> named_struct('a', a, 'b', b))))")).as("p"))
      .select(
        shiftrightunsigned(col("p.a"), PosBits).as("id_a"),
        col("p.a").bitwiseAND((1L << PosBits) - 1).as("pos_a"),
        shiftrightunsigned(col("p.b"), PosBits).as("id_b"),
        col("p.b").bitwiseAND((1L << PosBits) - 1).as("pos_b"))
      .filter(col("id_a") < col("id_b")) // drop within-doc self-pairs
    // members are sorted by packed value, so a < b can still be the same
    // doc (within-doc repetition) — those are repetition, not cross-doc
    // passages; id_a < id_b keeps exactly the cross-doc hits
    val w = Window.partitionBy(col("id_a"), col("id_b"),
      (col("pos_b") - col("pos_a")).as("delta")).orderBy(col("pos_a"))
    hits
      .withColumn("island", col("pos_a") - row_number().over(w))
      .groupBy(col("id_a"), col("id_b"),
        (col("pos_b") - col("pos_a")).as("delta"), col("island"))
      .agg(min(col("pos_a")).cast("int").as("start_a"),
        min(col("pos_b")).cast("int").as("start_b"),
        (max(col("pos_a")) - min(col("pos_a")) + n).cast("int").as("length"))
      .filter(col("length") >= minLength)
      .select("id_a", "id_b", "start_a", "start_b", "length")
  }

  /** Shared pair machinery: each distinct gram key is a bucket (ONE
    * shuffle on the 8-byte hash), pairs enumerate strictly inside
    * capped buckets, and the count aggregation is ∝ true overlap.
    *
    * The bucket builder's aggregation state is STRUCTURALLY bounded:
    * [[graft.functions.BoundedDistinctSet]] keeps ≤ maxBucket+1 ids per
    * gram at every stage (update, partial, merge) — a boilerplate gram
    * present in 50M docs costs the same buffer as one in 50. A result of
    * exactly maxBucket+1 members is an exact witness that the gram
    * exceeds the cap; such grams are boilerplate (license headers,
    * normalization artifacts) whose pairs the cap was discarding anyway,
    * so they are dropped entirely — pair output stays ∝ true passage
    * overlap, and no skewed straggler can form.
    */
  private def pairsFromGrams(grams: DataFrame, maxBucket: Int,
                             minShared: Int): DataFrame = {
    val buckets = grams.groupBy(col("g"))
      .agg(graft.functions.BoundedDistinct.boundedDistinct(col("id"), maxBucket + 1).as("members"))
      .filter(size(col("members")).between(2, maxBucket))
    buckets.select(explode(expr(
        "flatten(transform(members, (a, i) -> " +
          "transform(slice(members, i + 2, size(members)), " +
          "b -> named_struct('id_a', a, 'id_b', b))))")).as("p"))
      .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .agg(count(lit(1)).as("n_shared_grams"))
      .filter(col("n_shared_grams") >= minShared)
  }
}
