package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe two-phase aggregation.
  *
  * WHICH aggregates need salting: only the ones whose state is
  * NON-COMBINABLE map-side. A hash-aggregated SUM/COUNT already
  * combines per map task (each mapper emits ONE row per key), so a hot
  * key reaches the reducer as at most numMapTasks tiny rows — salting a
  * plain sum buys nothing and pays an extra shuffle; use a plain
  * `groupBy().agg(sum)` for those. The genuine skew case is exact
  * COUNT(DISTINCT) ([[saltedCountDistinct]]) — its state is the value
  * SET, which cannot combine without moving the values — and the joins
  * AQE can't re-split ([[saltedJoin]]).
  *
  * [[saltedSum]] exists as the oracle-checked PROOF of the salting
  * transform itself (salted == plain, hash-verified by q_salted_agg):
  * the two-phase decimal rewrite is exactness-preserving, which is the
  * property saltedCountDistinct's correctness rests on.
  */
object Salt {

  /** Exact two-phase sum on (keys, salt) — the salting TRANSFORM
    * demonstrated on an aggregate whose exactness an oracle can check
    * (see the object note: a plain sum does not NEED salting; its
    * partial aggregation already combines map-side — this is the
    * correctness witness for the rewrite, not a perf recommendation).
    * `distributor` picks the salt deterministically from row content
    * (any well-spread column works; correctness never depends on it).
    */
  def saltedSum(df: DataFrame, keys: Seq[String], value: Column, as: String,
                distributor: Column, buckets: Int = 16,
                outScale: Option[Int] = None): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(hash(distributor), lit(buckets)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(value.cast("decimal(30,6)")).as("__partial"))
    // rounding is OPT-IN (presentation concern, not aggregate semantics);
    // when requested it happens while still DECIMAL (exact HALF_UP), THEN
    // casts to double — a double round-trip before rounding can land a
    // half-cent sum just below the boundary and flip the last digit vs an
    // exact engine
    val total = sum(col("__partial"))
    val out = outScale.fold(total.cast("double"))(s => round(total, s).cast("double"))
    partial.groupBy(keys.map(col): _*).agg(out.as(as))
  }

  /** Skew-spread equi-join: the manual fallback for the joins AQE can't
    * re-split (AQE only splits SORT-MERGE reduce partitions — a
    * shuffled-hash join, a join inside a cached/reused exchange, or a
    * build running with AQE disabled still funnels a hot key through
    * one task). The big side assigns each row a uniform RANDOM bucket
    * (not a content hash — see the inline note); the small side replicates
    * `buckets`× so every (key, salt) bucket holds a complete copy —
    * output EXACTLY equals the plain join (OperatorsSpec proves it,
    * duplicates included) while the hot key's probe work spreads over
    * `buckets` tasks. Cost: small side shuffles `buckets`× its size —
    * use for big⨝medium where medium is too large to broadcast but far
    * smaller than big (the classic salting trade).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 buckets: Int = 16): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    // rand salt, NOT a row hash: a hot key's rows are often literally
    // identical (the skew case!), so any content hash would pin them
    // all to one bucket. The salt value is semantically irrelevant —
    // every bucket holds a full small-side copy, so each big row joins
    // its matches exactly once under ANY assignment, including a task
    // retry re-rolling it.
    val bigSalted = big.withColumn("__salt", (rand(7) * buckets).cast("int"))
    val smallRep = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    bigSalted.join(smallRep, keys :+ "__salt")
      .drop("__salt")
      .select((big.columns ++ small.columns.filterNot(keys.contains)).map(col): _*)
  }

  /** Exact skew-spread distinct count. A plain two-phase partial sum
    * cannot skew (sum combines map-side); exact COUNT(DISTINCT v) is the
    * aggregate that genuinely funnels a hot key through one reducer
    * (its state is the value SET — non-combinable without moving the
    * values). The salt is derived from the VALUE, so each distinct value
    * lands in exactly one (key, salt) bucket: per-bucket distinct sets
    * are disjoint and the per-key total is the exact sum of bucket
    * counts. Mirrors the reference's per-product variant counting
    * (ProductVariantsCountDictionary, EcomDestinationWriter.cs:37,
    * CountProductVariantGroups :4478) at hot-product scale.
    */
  def saltedCountDistinct(df: DataFrame, keys: Seq[String], value: Column,
                          as: String, buckets: Int = 16): DataFrame = {
    val partial = df
      .withColumn("__v", value)
      .withColumn("__salt", pmod(xxhash64(col("__v")), lit(buckets)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count_distinct(col("__v")).as("__partial"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(as))
  }
}
