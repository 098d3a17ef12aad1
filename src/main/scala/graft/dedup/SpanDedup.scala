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
  * aggregate on the span text for the winner (partial map-side min), a
  * join back on the same key (no extra exchange beyond the agg's), and
  * one doc-keyed aggregate to reassemble. Aggregation state per span key
  * is one (doc, idx) struct — never a membership list. At 100 TB the
  * span JOIN key can be swapped for its 128-bit hash to cut shuffle
  * width (collision risk ~n²/2¹²⁸); the registered form keys on the text
  * itself so the oracle compare is collision-free.
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

  /** (idCol, n_spans, n_kept, clean_text): duplicated `n`-token windows
    * removed corpus-wide (first (doc, position) occurrence survives),
    * text reassembled from kept windows joined by single spaces. Blank
    * documents pass through with 0 spans and empty clean_text.
    */
  def dedupSpans(df: DataFrame, idCol: String, textCol: String,
                 n: Int = 10): DataFrame = {
    require(n >= 1, "span length must be >= 1")
    val toks = df.select(col(idCol).as("__id"),
      when(trim(col(textCol)) === "" || col(textCol).isNull,
        array().cast("array<string>"))
        .otherwise(split(trim(col(textCol)), WS)).as("__toks"))
    // consecutive n-token windows: span i covers tokens [i*n+1, i*n+n]
    // (slice is 1-based); ceil-div span count keeps the partial tail
    val spans = toks.select(col("__id"),
      when(size(col("__toks")) === 0, array().cast("array<string>"))
        .otherwise(transform(
          // ceil-div span count; the float division is exact (counts ≪ 2^52)
          sequence(lit(0L),
            floor((size(col("__toks")) + lit(n - 1)) / lit(n)).cast("long") - 1L),
          i => array_join(
            slice(col("__toks"), (i * n + 1).cast("int"), lit(n)), " ")))
        .as("__spans"))
      .select(col("__id"), posexplode_outer(col("__spans")).as(Seq("idx", "span")))
    // corpus-wide winner per span text: lexicographically-first (doc, idx)
    val winners = spans.filter(col("span").isNotNull)
      .groupBy(col("span"))
      .agg(min(struct(col("__id").as("wid"), col("idx").as("widx"))).as("__w"))
    val flagged = spans.join(winners, Seq("span"), "left")
      .withColumn("__kept", col("span").isNotNull &&
        col("__w.wid") === col("__id") && col("__w.widx") === col("idx"))
    flagged.groupBy(col("__id"))
      .agg(count(col("idx")).as("n_spans"),
        sum(when(col("__kept"), 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("__kept"),
            struct(col("idx"), col("span"))))),
          x => x("span")), " ").as("clean_text"))
      .withColumnRenamed("__id", idCol)
  }
}
