package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe two-phase aggregation.
  *
  * When a group key is heavily skewed (a handful of hot products/groups —
  * exactly the shape of e-commerce relation tables the reference imports),
  * a single groupBy funnels the hot key through one reducer. Salting
  * splits each key into `buckets` sub-keys for a partial aggregate, then
  * combines partials — the hot key's work spreads over `buckets` tasks.
  * Results are identical to the direct aggregate because the partial
  * aggregates run on exact decimal sums (order-independent).
  *
  * AQE's skew-join splitting covers joins; this covers aggregations,
  * where AQE does not re-split.
  */
object Salt {

  /** Exact skew-spread sum: decimal partial sums on (keys, salt), then
    * combine per key. `distributor` picks the salt deterministically from
    * row content (any well-spread column works; correctness never
    * depends on it).
    */
  def saltedSum(df: DataFrame, keys: Seq[String], value: Column, as: String,
                distributor: Column, buckets: Int = 16): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(hash(distributor), lit(buckets)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(value.cast("decimal(30,6)")).as("__partial"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).cast("double").as(as))
  }
}
