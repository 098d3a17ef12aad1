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
  * The model factors through two COUNT TABLES — pair co-occurrence
  * (lo < hi, n_both) and per-item set sizes (i, n_i) — which are
  * ADDITIVELY MAINTAINABLE under user-history change ([[maintainCounts]]):
  * a changed user's old and new capped sets diff into ±1 adjustments,
  * O(changed_users · cap²) work with NO corpus rescan — the same
  * persisted-state pattern as IncrementalAgg/Dsir/Drift. Scoring from
  * counts ([[neighborsFromCounts]]) is count-table-sized.
  *
  * Shape: one window over user (the cap), one self-join + pair
  * groupBy, two item-count equi-joins (AQE picks broadcast when the
  * item dimension fits), one per-item rank window for top-k (map-side
  * WindowGroupLimit prunes before the shuffle).
  */
object ItemSim {

  /** Deterministic capped binary history: one (u, i) row per kept
    * interaction. Pinned eagerly — ≤ users·maxUserItems rows by
    * construction (referenced by counts + both pair sides).
    */
  private def cappedSets(interactions: DataFrame, userCol: String,
                         itemCol: String, strengthCol: String,
                         maxUserItems: Int): DataFrame = {
    val capW = Window.partitionBy(col(userCol))
      .orderBy(col(strengthCol).desc, col(itemCol).asc)
    interactions
      .withColumn("__r", row_number().over(capW))
      .filter(col("__r") <= maxUserItems)
      .select(col(userCol).as("u"), col(itemCol).as("i"))
      .localCheckpoint(true)
  }

  private def pairCounts(sets: DataFrame): DataFrame =
    sets.as("a").join(sets.as("b"),
        col("a.u") === col("b.u") && col("a.i") < col("b.i"))
      .groupBy(col("a.i").as("lo"), col("b.i").as("hi"))
      .agg(count(lit(1)).as("n_both"))

  /** The model's state: (pair co-occurrence counts, item set sizes). */
  def counts(interactions: DataFrame, userCol: String, itemCol: String,
             strengthCol: String, maxUserItems: Int): (DataFrame, DataFrame) = {
    require(maxUserItems > 1, "maxUserItems must be > 1")
    val capped = cappedSets(interactions, userCol, itemCol, strengthCol, maxUserItems)
    (pairCounts(capped), capped.groupBy(col("i")).agg(count(lit(1)).as("n_i")))
  }

  /** Top-k cosine neighbors scored from persisted count tables. */
  def neighborsFromCounts(pairs: DataFrame, items: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val sym = pairs.select(col("lo").as("item"), col("hi").as("neighbor"), col("n_both"))
      .unionAll(pairs.select(col("hi").as("item"), col("lo").as("neighbor"), col("n_both")))
    val scored = sym
      .join(items.withColumnRenamed("i", "item").withColumnRenamed("n_i", "na"), "item")
      .join(items.withColumnRenamed("i", "neighbor").withColumnRenamed("n_i", "nb"), "neighbor")
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

  /** One-shot build: counts + scoring. */
  def neighbors(interactions: DataFrame, userCol: String, itemCol: String,
                strengthCol: String, k: Int, maxUserItems: Int): DataFrame = {
    val (p, n) = counts(interactions, userCol, itemCol, strengthCol, maxUserItems)
    neighborsFromCounts(p, n, k)
  }

  /** Fold a user-history delta into persisted counts WITHOUT a corpus
    * rescan. Inputs are the CHANGED USERS' interaction rows only —
    * their complete (user, item, strength) history before
    * (`oldChanged`) and after (`newChanged`) the change; unchanged
    * users must appear in neither. The cap is re-applied per side, the
    * two capped sets diff into ±1 item/pair adjustments, and counts
    * that reach zero leave the tables — so the maintained state is
    * IDENTICAL to a full rebuild on the new corpus (ItemSimSpec proves
    * both tables equal the rescan exactly). Work is
    * O(changed_users · cap²): the cap that bounds the build bounds the
    * maintenance too.
    */
  def maintainCounts(pairs: DataFrame, items: DataFrame,
                     oldChanged: DataFrame, newChanged: DataFrame,
                     userCol: String, itemCol: String, strengthCol: String,
                     maxUserItems: Int): (DataFrame, DataFrame) = {
    require(maxUserItems > 1, "maxUserItems must be > 1")
    // ONE tagged pass over both sides (round 14): the old and new
    // histories used to build two separately-pinned capped sets and
    // run two pair explosions whose counts were then union-diffed —
    // two serialized eager materializations. A ±1 side tag makes the
    // cap ONE window (partitioned by (side, user)), the explosion ONE
    // self-join (side equality keeps pairs within their snapshot), and
    // the delta a plain sum of the tag: every pair/item occurrence
    // contributes its own ±1. Value-identical to the two-pass diff
    // (ItemSimSpec proves maintained state == full rebuild).
    val tagged = oldChanged
      .select(col(userCol), col(itemCol), col(strengthCol), lit(-1L).as("__side"))
      .unionAll(newChanged
        .select(col(userCol), col(itemCol), col(strengthCol), lit(1L).as("__side")))
    val capW = Window.partitionBy(col("__side"), col(userCol))
      .orderBy(col(strengthCol).desc, col(itemCol).asc)
    val sets = tagged
      .withColumn("__r", row_number().over(capW))
      .filter(col("__r") <= maxUserItems)
      .select(col("__side"), col(userCol).as("u"), col(itemCol).as("i"))
      .localCheckpoint(true)
    val pairDelta = sets.as("a").join(sets.as("b"),
        col("a.__side") === col("b.__side") &&
          col("a.u") === col("b.u") && col("a.i") < col("b.i"))
      .groupBy(col("a.i").as("lo"), col("b.i").as("hi"))
      .agg(sum(col("a.__side")).as("__d"))
      .filter(col("__d") =!= 0L)
    val itemDelta = sets.groupBy(col("i")).agg(sum(col("__side")).as("__d"))
      .filter(col("__d") =!= 0L)
    val newPairs = pairs.join(pairDelta, Seq("lo", "hi"), "full_outer")
      .select(col("lo"), col("hi"),
        (coalesce(col("n_both"), lit(0L)) + coalesce(col("__d"), lit(0L))).as("n_both"))
      .filter(col("n_both") > 0)
    val newItems = items.join(itemDelta, Seq("i"), "full_outer")
      .select(col("i"),
        (coalesce(col("n_i"), lit(0L)) + coalesce(col("__d"), lit(0L))).as("n_i"))
      .filter(col("n_i") > 0)
    (newPairs, newItems)
  }
}
