package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-k rows per group — the "best N per category" shape the reference
  * computes when ranking products inside a group/assortment page
  * (EcomSourceReader.cs builds ORDER BY + TOP fragments per group query).
  *
  * Declared as a rank window + filter so Catalyst's rank-limit pushdown
  * (`WindowGroupLimit`, Spark 3.5+) inserts a PARTIAL group-limit before
  * the partition-key exchange: each map task keeps only its local top-k
  * per group, so the shuffle moves O(groups × k) rows per task instead of
  * the whole table. That is the difference between "sort 100 TB" and
  * "sort k rows per group per task" at cluster scale — PlansSpec asserts
  * the partial node is present so a regression (e.g. an ordering Catalyst
  * can't push) fails the build rather than silently shuffling everything.
  */
object TopK {

  /** Keep the top `k` rows of each group, ranked by `order` (include a
    * unique tiebreaker column in `order` for deterministic output).
    * Adds `rankCol` (1-based rank inside the group).
    */
  def perGroup(df: DataFrame, groupCols: Seq[String], order: Seq[Column],
               k: Int, rankCol: String = "rank_in_group"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    // row_number (not rank/dense_rank): exactly k rows per group, and all
    // three trigger the same WindowGroupLimit pushdown.
    df.withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= k)
  }
}
