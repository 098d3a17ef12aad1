package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lookup-join denormalization: id→name on the way out, name→id on the
  * way in.
  *
  * Source side the reference joins dimension tables to emit display names
  * (EcomSourceReader.cs:260 manufacturer name for products, :252 variant
  * group names, :286 related product names). Destination side it resolves
  * business keys back to ids, e.g. manufacturer by name
  * (EcomDestinationWriter.cs:4146), group by name or id (:4524), product by
  * number (:3984) — and fabricates referenced rows that don't exist yet
  * (:2267, :2571).
  *
  * Dimensions are small relative to facts, so every lookup is an explicit
  * `broadcast` — at 100 TB the fact side streams map-side with zero
  * shuffle.
  */
object Denormalize {

  /** Left-join `dim` onto `df` (broadcast), keeping `take` columns.
    * Dim columns are re-aliased up front so chained resolves against the
    * same dimension don't trip Spark's ambiguous-self-join detection.
    */
  def resolve(df: DataFrame, dim: DataFrame, on: Seq[(String, String)],
              take: Seq[(String, String)]): DataFrame = {
    val slim = dim.select(
      (on.map(_._2).distinct.map(c => dim(c).as(s"__dim_$c")) ++
        take.map { case (c, as) => dim(c).as(as) }): _*)
    val cond = on.map { case (l, r) => df(l) === slim(s"__dim_$r") }.reduce(_ && _)
    val kept = df.columns.map(df(_)) ++ take.map { case (_, as) => slim(as) }
    df.join(broadcast(slim), cond, "left_outer").select(kept: _*)
  }

  /** Priority-ordered fallback resolution: try each (dfCol → dimCol) key
    * pair in order, first hit wins. This is the writer's product lookup
    * ladder — by id, then by number, then by name
    * (EcomDestinationWriter.cs:3984 `GetExistingProduct`, :1292
    * `HandleProductIdFoundByNumber`, manufacturer by name :4146). Each
    * rung is one broadcast left join; `coalesce` picks the
    * highest-priority match.
    */
  def resolveWithFallback(df: DataFrame, dim: DataFrame,
                          fallbacks: Seq[(String, String)],
                          take: (String, String)): DataFrame = {
    val (takeCol, takeAs) = take
    val resolved = fallbacks.zipWithIndex.foldLeft(df) { case (acc, ((l, r), i)) =>
      val slim = dim.select(dim(r).as(s"__fb_key_$i"), dim(takeCol).as(s"__fb_take_$i"))
      acc.join(broadcast(slim), acc(l) === slim(s"__fb_key_$i"), "left_outer")
        .drop(s"__fb_key_$i")
    }
    resolved
      .withColumn(takeAs,
        coalesce(fallbacks.indices.map(i => col(s"__fb_take_$i")): _*))
      .drop(fallbacks.indices.map(i => s"__fb_take_$i"): _*)
  }

  /** Names present in `df(nameCol)` but absent from `dim(dimNameCol)`:
    * the referenced rows the writer would fabricate
    * (EcomDestinationWriter.cs:2267 AddNewVariantOptionGroup).
    */
  def missingRefs(df: DataFrame, nameCol: String, dim: DataFrame,
                  dimNameCol: String): DataFrame =
    df.select(col(nameCol)).distinct()
      .join(broadcast(dim.select(col(dimNameCol).as(nameCol))), Seq(nameCol), "left_anti")
}
