package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.exprs

/** Exact key-based deduplication.
  *
  * The reference's `Write(row, mapping, discardDuplicates)` drops rows whose
  * key columns were already seen in the batch — i.e. keep-FIRST in arrival
  * order (EcomDestinationWriter.cs:1042). Arrival order is meaningless on a
  * distributed engine, so the Spark-native contract is keep-first under an
  * explicit deterministic ordering: `row_number() = 1` per key partition.
  * One shuffle on the key; no driver state (the reference keeps an in-memory
  * hash per table — at 100 TB that becomes the groupBy below).
  */
object Dedup {

  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Distinct on full row — reference's relation-table dedup
    * (EcomDestinationWriter.cs:2916 checks existing relation rows before add).
    */
  def distinctRows(df: DataFrame): DataFrame = df.distinct()

  /** Incremental dedup: drop rows of `df` whose `keys` already exist in
    * `history` — the "skip rows already ingested in a previous run" shape
    * (the reference re-reads destination keys into a driver dictionary
    * per batch, EcomDestinationWriter.cs:657 GetLastId / the
    * `_existing*` lookups; at corpus scale the dictionary becomes the
    * bloom gate below).
    *
    * A plain `left_anti` join shuffles EVERY `df` row on the key even
    * though, on a typical incremental batch, almost none collide with
    * history. Spark's own runtime-filter rule (InjectRuntimeFilter)
    * cannot help an anti join — the rows a bloom filter would prune are
    * exactly the rows an anti join must KEEP. So the gate is explicit,
    * built from the same public sketch machinery the runtime filter
    * uses:
    *
    *  1. ONE aggregation over `history` builds a bloom filter of
    *     xxhash64(keys) (`BloomFilterAggregate` — mergeable, so it
    *     map-side-combines; the driver receives `numBits/8` bytes once,
    *     like a broadcast dimension).
    *  2. `df` splits on `might_contain`: misses are DEFINITELY new
    *     (bloom filters have no false negatives) and flow through with
    *     ZERO shuffle; hits — true dups plus an `fpp` fraction of false
    *     positives — are the only rows that pay the exact anti-join.
    *
    * At 100 TB with a 1% collision rate, ~99% of the batch never
    * shuffles. Output == `df.join(history, keys, "left_anti")` exactly
    * (the anti join corrects every false positive); rows with a null key
    * are never duplicates (SQL equality) and always survive.
    *
    * `expectedItems`/`fpp` size the filter: n·|ln fpp|/ln²2 bits
    * (~1.2 GB per 10⁹ keys at 1% — cluster-realistic; size to the
    * HISTORY key count, not the batch).
    */
  def againstHistory(df: DataFrame, history: DataFrame, keys: Seq[String],
                     expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bloomBytes = buildKeyBloom(history, keys, expectedItems, fpp)
    if (bloomBytes == null) df // empty history: nothing to dedup against
    else gateByBloom(df, history, keys, bloomBytes)
  }

  private def keyHash(d: DataFrame, keys: Seq[String]) =
    XxHash64(keys.map(k => exprs.toExpr(d(k))), 42L)

  /** One mergeable-aggregate pass over `history`: a serialized bloom
    * filter of xxhash64(keys), `numBits/8` bytes to the driver. The
    * bytes are `org.apache.spark.util.sketch.BloomFilter` format —
    * driver-mergeable across calls built with the SAME
    * (expectedItems, fpp), which is how the streaming twin maintains
    * one filter incrementally. Null on empty input.
    */
  def buildKeyBloom(history: DataFrame, keys: Seq[String],
                    expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    require(keys.nonEmpty && expectedItems > 0 && fpp > 0 && fpp < 1)
    val numBits = math.max(64L,
      math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    history
      .select(exprs.toColumn(new BloomFilterAggregate(keyHash(history, keys),
        Literal(expectedItems), Literal(numBits), 0, 0)
        .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** The gate itself, given a prebuilt bloom that is a SUPERSET of
    * `history`'s keys (extra entries cost a needless exact check; a
    * missing entry would let a duplicate through — the invariant the
    * caller owns). Bloom misses pass with zero shuffle; hits resolve
    * exactly via semi-then-anti: `history` is scanned ONCE column-pruned
    * against the (small) candidate key set — never aggregated wholesale
    * into an anti-join build side — and AQE picks broadcast for the
    * small sides at runtime.
    */
  /** The positive-side gate: rows whose xxhash64(keys) MIGHT be in the
    * bloom. No false negatives — every true member passes; ~fpp
    * non-members pass too, so the caller must correct survivors with an
    * exact join (see `Decontaminate.overlapsBloomGated`). Pure filter,
    * zero shuffle.
    */
  def filterByKeyBloom(df: DataFrame, keys: Seq[String],
                       bloomBytes: Array[Byte]): DataFrame =
    df.filter(exprs.toColumn(
      BloomFilterMightContain(Literal(bloomBytes), keyHash(df, keys))))

  def gateByBloom(df: DataFrame, history: DataFrame, keys: Seq[String],
                  bloomBytes: Array[Byte]): DataFrame = {
    val mightContain = exprs.toColumn(
      BloomFilterMightContain(Literal(bloomBytes), keyHash(df, keys)))
    val misses = df.filter(!mightContain)
    val hits = df.filter(mightContain)
    val candKeys = hits.select(keys.map(col): _*).distinct()
    val matched = history.select(keys.map(col): _*)
      .join(candKeys, keys, "left_semi").distinct()
    misses.unionByName(hits.join(matched, keys, "left_anti"))
  }
}
