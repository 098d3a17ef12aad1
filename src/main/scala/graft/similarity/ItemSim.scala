package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Item-item neighborhood model from implicit feedback — the classic
  * collaborative-filtering build (Sarwar et al., "Item-based
  * collaborative filtering recommendation algorithms", WWW 2001; the
  * co-occurrence/cosine form Amazon popularized). The reference's
  * related-products assortment feeds from exactly this table shape.
  *
  * Cosine over binary user sets: sim(i,j) = n_ij / √(n_i·n_j),
  * quantized to 4 dp with the repo's fixed parenthesization
  * (`floor(n_ij*10⁴/√(n_i·n_j) + 0.5)` — every step a single
  * correctly-rounded IEEE op, so DuckDB replays it bit-for-bit).
  *
  * THE scale hazard is the per-user pair explosion: a user with H
  * items emits H²/2 pairs (a crawler account with 1M items → 5·10¹¹
  * pairs). `maxUserItems` caps every user's history to the N
  * strongest interactions BEFORE pairing — the published mitigation
  * (history truncation) — so pair work is ≤ users·N²/2, a bound the
  * data cannot break. The cap is deterministic: rank by
  * (strength DESC, item ASC).
  *
  * Shape: one window over user (the cap), one self-join + pair
  * groupBy, two item-count equi-joins (AQE picks broadcast when the
  * item dimension fits), one per-item rank window for top-k (map-side
  * WindowGroupLimit prunes before the shuffle).
  */
object ItemSim {

  /** @param interactions (user, item, strength) rows, pre-aggregated
    *                     (one row per user-item).
    * @return (item, neighbor, n_both, sim_q, rank) — both directions,
    *         top `k` neighbors per item.
    */
  def neighbors(interactions: DataFrame, userCol: String, itemCol: String,
                strengthCol: String, k: Int, maxUserItems: Int): DataFrame = {
    require(k > 0 && maxUserItems > 1, s"need k>0, maxUserItems>1")
    val capW = Window.partitionBy(col(userCol))
      .orderBy(col(strengthCol).desc, col(itemCol).asc)
    // referenced three times (item counts + both pair sides): pin the
    // capped history eagerly — ≤ users·maxUserItems rows by construction,
    // so the pinned artifact is the bounded thing
    val capped = interactions
      .withColumn("__r", row_number().over(capW))
      .filter(col("__r") <= maxUserItems)
      .select(col(userCol).as("u"), col(itemCol).as("i"))
      .localCheckpoint(true)
    val nPerItem = capped.groupBy(col("i")).agg(count(lit(1)).as("n_i"))
    val pairs = capped.as("a").join(capped.as("b"),
        col("a.u") === col("b.u") && col("a.i") < col("b.i"))
      .groupBy(col("a.i").as("lo"), col("b.i").as("hi"))
      .agg(count(lit(1)).as("n_both"))
    val sym = pairs.select(col("lo").as("item"), col("hi").as("neighbor"), col("n_both"))
      .unionAll(pairs.select(col("hi").as("item"), col("lo").as("neighbor"), col("n_both")))
    val scored = sym
      .join(nPerItem.withColumnRenamed("i", "item").withColumnRenamed("n_i", "na"), "item")
      .join(nPerItem.withColumnRenamed("i", "neighbor").withColumnRenamed("n_i", "nb"), "neighbor")
      .withColumn("sim_q",
        floor(col("n_both") * 10000.0 /
          sqrt(col("na").cast("double") * col("nb").cast("double")) + 0.5)
          .cast("long"))
    val rankW = Window.partitionBy(col("item"))
      .orderBy(col("sim_q").desc, col("neighbor").asc)
    scored.withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select(col("item"), col("neighbor"), col("n_both"), col("sim_q"),
        col("rank").cast("int").as("rank"))
  }
}
