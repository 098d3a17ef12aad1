package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Price-volume-mix revenue bridge — the FP&A decomposition answering
  * "WHY did revenue move": between two periods, how much of the change
  * came from charging different prices (price effect, Laspeyres
  * convention), selling different quantities (volume effect), the
  * price×volume interaction (mix/cross), and assortment churn (new /
  * discontinued items). The reference's analytics tier reports revenue
  * deltas per group (EcomProvider.cs:616); the bridge is the standard
  * decomposition layered on top.
  *
  * Exactness: unit prices are revenue/quantity RATIONALS that never
  * materialize — per-item effects compute as integer cross products
  * with ONE floor division each (pmod-subtract, exact for the negative
  * effects a price cut produces), and the cross term absorbs the
  * quantization so the bridge IDENTITY holds to the cent:
  * rev1 − rev0 = price + volume + cross + new − discontinued, EXACTLY,
  * at every group (spec-asserted).
  *
  * Shape: one (group, item) pivot aggregate over the two periods
  * (map-side combinable), per-item effect arithmetic row-local, one
  * final group rollup — two keyed exchanges end to end.
  */
object Bridge {

  /** `df`: one or more rows per (group, item, period) with `periodCol`
    * ∈ {0, 1}, `revCol` LONG units (cents), `qtyCol` LONG > 0 where
    * present. Output per group: rev0, rev1, delta, price_eff, vol_eff,
    * cross_eff, new_eff, disc_eff (disc reported POSITIVE, subtracted
    * in the identity).
    */
  def revenueBridge(df: DataFrame, groupCol: String, itemCol: String,
                    periodCol: String, revCol: String,
                    qtyCol: String): DataFrame = {
    def fdiv(a: Column, b: Column): Column = {
      val ad = a.cast("decimal(38,0)"); val bd = b.cast("decimal(38,0)")
      ((ad - pmod(ad, bd)) / bd).cast("long")
    }
    def per(p: Int, c: Column) =
      sum(when(col(periodCol) === p, c).otherwise(0L))
    val items = df.groupBy(col(groupCol), col(itemCol))
      .agg(per(0, col(revCol)).as("r0"), per(1, col(revCol)).as("r1"),
        per(0, col(qtyCol)).as("q0"), per(1, col(qtyCol)).as("q1"))
    val both = col("q0") > 0 && col("q1") > 0
    val effects = items.select(col(groupCol),
      col("r0"), col("r1"),
      when(both, fdiv(col("r1") * col("q0") - col("r0") * col("q1"),
        col("q1"))).otherwise(0L).as("__price"),
      when(both, fdiv(col("r0") * (col("q1") - col("q0")),
        col("q0"))).otherwise(0L).as("__vol"),
      when(col("q0") === 0 && col("q1") > 0, col("r1")).otherwise(0L)
        .as("__new"),
      when(col("q1") === 0 && col("q0") > 0, col("r0")).otherwise(0L)
        .as("__disc"),
      both.cast("long").as("__both"))
    effects.groupBy(col(groupCol)).agg(
      sum(col("r0")).as("rev0"), sum(col("r1")).as("rev1"),
      (sum(col("r1")) - sum(col("r0"))).as("delta"),
      sum(col("__price")).as("price_eff"),
      sum(col("__vol")).as("vol_eff"),
      // cross absorbs both the true interaction and the floor
      // quantization — defined as the remainder so the identity is
      // exact: delta = price + vol + cross + new - disc
      (sum(when(col("__both") === 1L, col("r1") - col("r0")).otherwise(0L)) -
        sum(col("__price")) - sum(col("__vol"))).as("cross_eff"),
      sum(col("__new")).as("new_eff"),
      sum(col("__disc")).as("disc_eff"))
  }
}
