package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Span-level duplicate REMOVAL with document reassembly — the C4 recipe
  * (Raffel et al. 2020, §2.2: "we discarded all but one of any
  * three-sentence span occurring more than once in the data set") in its
  * tokenization-free form: documents are partitioned into consecutive
  * fixed-length token windows, every duplicated window keeps exactly ONE
  * copy corpus-wide (the lexicographically-first (doc, position)
  * occurrence), and each document is reassembled from its surviving
  * windows in order.
  *
  * This is the REMOVAL complement of the detection family
  * ([[Decontaminate.selfOverlaps]] reports which pairs share passages;
  * this rewrites the corpus with the duplicated spans gone) and the
  * sub-document complement of whole-doc dedup (`q_dedup_exact_docs`
  * drops documents; boilerplate headers/footers duplicated across
  * mostly-distinct pages survive that and die here).
  *
  * Reference anchor: the reference engine dedups whole rows by key
  * (EcomDestinationWriter.cs:1042); span dedup is the corpus-scale text
  * analogue a training-data pipeline needs instead.
  *
  * Scale shape: one narrow chunking pass (no shuffle), one keyed
  * aggregate on the span text for the winner (partial map-side min, a
  * state of one (doc, idx) struct — never a membership list), a join
  * back on the same key, and one doc-keyed aggregate to reassemble. At
  * 100 TB the span JOIN key can be swapped for its 128-bit hash to cut
  * shuffle width (collision risk ~n²/2¹²⁸); the registered form keys on
  * the text itself so the oracle compare is collision-free.
  *
  * Within-doc duplicate spans dedup too (the second occurrence loses the
  * (doc, idx) tie) — same as C4's corpus-wide rule. The trailing partial
  * window (< n tokens) is a candidate like any other span, matching only
  * equal-length tails.
  */
object SpanDedup {

  /** Explicit whitespace class, not \s: Java's \s includes \x0B where
    * RE2's does not — pinned so both engines tokenize identically.
    */
  private val WS = "[ \\t\\n\\r\\f]+"

  /** (\_\_id, idx, span) rows, one per consecutive `n`-token window;
    * blank docs surface as one (\_\_id, null, null) row (posexplode_outer)
    * so reassembly can emit them with zero spans.
    */
  private def spansOf(df: DataFrame, idCol: String, textCol: String,
                      n: Int): DataFrame = {
    val toks = df.select(col(idCol).as("__id"),
      when(trim(col(textCol)) === "" || col(textCol).isNull,
        array().cast("array<string>"))
        .otherwise(split(trim(col(textCol)), WS)).as("__toks"))
    // span i covers tokens [i*n+1, i*n+n] (slice is 1-based); ceil-div
    // span count keeps the partial tail
    toks.select(col("__id"),
      when(size(col("__toks")) === 0, array().cast("array<string>"))
        .otherwise(transform(
          // the float division is exact (counts ≪ 2^52)
          sequence(lit(0L),
            floor((size(col("__toks")) + lit(n - 1)) / lit(n)).cast("long") - 1L),
          i => array_join(
            slice(col("__toks"), (i * n + 1).cast("int"), lit(n)), " ")))
        .as("__spans"))
      .select(col("__id"), posexplode_outer(col("__spans")).as(Seq("idx", "span")))
  }

  /** One doc-keyed aggregate: kept spans rejoin in position order;
    * blank/fully-deduped docs come out with empty clean_text.
    */
  private def reassemble(flagged: DataFrame, idCol: String): DataFrame =
    flagged.groupBy(col("__id"))
      .agg(count(col("idx")).as("n_spans"),
        sum(when(col("__kept"), 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("__kept"),
            struct(col("idx"), col("span"))))),
          x => x("span")), " ").as("clean_text"))
      .withColumnRenamed("__id", idCol)

  /** (idCol, n_spans, n_kept, clean_text): duplicated `n`-token windows
    * removed corpus-wide (first (doc, position) occurrence survives),
    * text reassembled from kept windows joined by single spaces. Blank
    * documents pass through with 0 spans and empty clean_text.
    */
  def dedupSpans(df: DataFrame, idCol: String, textCol: String,
                 n: Int = 10): DataFrame = {
    require(n >= 1, "span length must be >= 1")
    val spans = spansOf(df, idCol, textCol, n)
    // corpus-wide winner per span text: lexicographically-first (doc, idx)
    val winners = spans.filter(col("span").isNotNull)
      .groupBy(col("span"))
      .agg(min(struct(col("__id").as("wid"), col("idx").as("widx"))).as("__w"))
    val flagged = spans.join(winners, Seq("span"), "left")
      .withColumn("__kept", col("span").isNotNull &&
        col("__w.wid") === col("__id") && col("__w.widx") === col("idx"))
    reassemble(flagged, idCol)
  }

  /** Incremental-ingest form: dedup a NEW batch's spans against an
    * append-only span REGISTRY (every span kept by any earlier batch).
    * A registry span removes every batch copy; spans new to the
    * registry dedup in-batch by the same min (doc, idx) winner rule.
    *
    * Returns (cleaned, newSpans): append `newSpans` (single `span`
    * column, distinct) to the registry after a successful write — the
    * registry only ever grows, so a crash between the two writes
    * re-derives the identical result on replay (the batch re-runs
    * against the same registry).
    *
    * First-seen-forever semantics: when batches arrive in doc order,
    * a sequential run equals [[dedupSpans]] over the concatenated
    * corpus EXACTLY (SpanDedupSpec proves it) — the batch winner IS the
    * global winner because all earlier ids live in earlier batches.
    *
    * Scale shape: ONE mergeable bloom pass over the registry
    * (`Dedup.buildKeyBloom`); batch spans missing the bloom are
    * definitely-new and skip the registry entirely — the exact semi
    * join against the registry reads it ONCE, column-pruned, only for
    * the (small) bloom-hit candidate set. Work per batch is
    * O(batch + bloom hits), never O(registry).
    */
  def dedupSpansAgainstHistory(batch: DataFrame, registry: DataFrame,
                               idCol: String, textCol: String, n: Int = 10,
                               expectedSpans: Long = 1000000L,
                               fpp: Double = 0.01): (DataFrame, DataFrame) = {
    require(n >= 1, "span length must be >= 1")
    val bloom = graft.operators.Dedup.buildKeyBloom(
      registry, Seq("span"), expectedSpans, fpp)
    if (bloom == null) { // empty registry: pure in-batch dedup
      val spans = spansOf(batch, idCol, textCol, n)
      return dedupGated(spans, idCol,
        spans.filter(col("span").isNotNull).select(col("span")).limit(0))
    }
    dedupSpansGated(batch, registry, idCol, textCol, n, bloom)
  }

  /** [[dedupSpansAgainstHistory]] with a CALLER-HELD bloom (must be a
    * SUPERSET of the registry's spans — the streaming twin maintains one
    * mergeably in O(batch) per batch instead of aggregating the registry
    * every micro-batch; phantom entries cost a needless exact check,
    * missing ones would be wrong and are the caller's contract).
    */
  def dedupSpansGated(batch: DataFrame, registry: DataFrame,
                      idCol: String, textCol: String, n: Int,
                      bloomBytes: Array[Byte]): (DataFrame, DataFrame) = {
    require(n >= 1, "span length must be >= 1")
    val spans = spansOf(batch, idCol, textCol, n)
    val real = spans.filter(col("span").isNotNull)
    val inHistory = graft.operators.Dedup
      .filterByKeyBloom(real.select(col("span")).distinct(), Seq("span"), bloomBytes)
      .join(registry.select(col("span")), Seq("span"), "left_semi")
    dedupGated(spans, idCol, inHistory)
  }

  private def dedupGated(spans: DataFrame, idCol: String,
                         inHistory: DataFrame): (DataFrame, DataFrame) = {
    val real = spans.filter(col("span").isNotNull)
    val withHist = spans.join(inHistory.withColumn("__hist", lit(true)),
      Seq("span"), "left")
    val winners = real.join(inHistory, Seq("span"), "left_anti")
      .groupBy(col("span"))
      .agg(min(struct(col("__id").as("wid"), col("idx").as("widx"))).as("__w"))
    val flagged = withHist.join(winners, Seq("span"), "left")
      .withColumn("__kept", col("span").isNotNull && col("__hist").isNull &&
        col("__w.wid") === col("__id") && col("__w.widx") === col("idx"))
    val cleaned = reassemble(flagged, idCol)
    val newSpans = winners.select(col("span"))
    (cleaned, newSpans)
  }
}
