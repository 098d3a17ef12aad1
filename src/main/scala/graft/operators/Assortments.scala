package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Assortment rebuild: materialize user×product visibility rows from
  * permission pairs, then maintain the active flag on the existing rows.
  *
  * The reference's `AssortmentHandler.RebuildAssortments`
  * (AssortmentHandler.cs:116) collects the distinct user/permission pairs
  * per assortment, joins them against the assortment's products into a
  * temp table, and `UpdateAssortmentsProducts(setActive)`
  * (AssortmentHandler.cs:272) flips the active flag: rebuilt rows become
  * active, previously-materialized rows missing from the rebuild become
  * inactive (flagged, not deleted — same soft-sync idea as
  * hideDeactivatedProducts).
  *
  * Scale shape: the rebuild is ONE equi-join on the assortment key. Its
  * output is |users per assortment| × |products per assortment| — an
  * intentional materialization (that's the operator's job), but nothing
  * upstream is quadratic and the join shuffles each side once on the
  * assortment key; hot assortments split under AQE skew handling.
  */
object Assortments {

  /** Distinct (user, product) rows visible through a shared assortment:
    * `userPairs` (user, assortment) ⨝ `productPairs` (assortment,
    * product). Both inputs are deduped first so repeated permission rows
    * don't multiply the join.
    */
  def rebuild(userPairs: DataFrame, productPairs: DataFrame,
              assortmentCol: String): DataFrame =
    userPairs.distinct()
      .join(productPairs.distinct(), Seq(assortmentCol))
      .drop(assortmentCol)
      .distinct()

  /** Full setActive maintenance: every row of `existing` ∪ `rebuilt`,
    * with `flagCol` = true iff the row is in the rebuild (rebuilt rows
    * activate, stale existing rows deactivate — never deleted).
    *
    * Shape: ONE tagged union + grouped max — `flag = max(tag)` over
    * (existing tagged 0) ∪ (rebuilt tagged 1) is exactly "key present
    * in the rebuild", and the single keyed aggregate replaces the old
    * union-distinct + second rebuilt reference + left-outer flag join
    * (three keyed exchanges and a DUPLICATED rebuild subtree — the
    * rebuild is a corpus-scale join, so its second evaluation was a
    * full re-shuffle at scale; guide §2.4).
    */
  def rebuildWithFlag(existing: DataFrame, userPairs: DataFrame,
                      productPairs: DataFrame, assortmentCol: String,
                      keys: Seq[String], flagCol: String): DataFrame = {
    // the rebuild WITHOUT its trailing distinct — the grouped max below
    // dedupes for free, so the join's duplicate (user, product) rows
    // never pay their own exchange
    val rebuilt = userPairs.distinct()
      .join(productPairs.distinct(), Seq(assortmentCol))
      .drop(assortmentCol)
      .select(keys.map(col): _*)
    existing.select(keys.map(col): _*).withColumn("__tag", lit(0))
      .unionByName(rebuilt.withColumn("__tag", lit(1)))
      .groupBy(keys.map(col): _*)
      .agg((max(col("__tag")) === 1).as(flagCol))
  }
}
