package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Offline recommender evaluation: item-based CF scoring over a
  * train/test interaction split, then hit-rate@k and NDCG@k against
  * the held-out items — the evaluation loop every recommender ships
  * behind (Cremonesi RecSys'10 methodology, the standard top-N
  * protocol).
  *
  * Exactness: neighbor similarities arrive pre-quantized (ItemSim's
  * `sim_q` BIGINT), so candidate scores are EXACT integer sums
  * (order-independent — a double sum here would make re-runs
  * hash-unstable); NDCG discount gains are driver-computed integer
  * constants ⌊10⁶/log₂(p+1)⌋ riding a literal array; every mean is a
  * floor division. Bit-deterministic end to end.
  *
  * Scale shape: scoring is one train⨝neighbors equi-join + one keyed
  * sum; the seen-item filter is an anti join; top-k is a per-USER rank
  * window (user cardinality — never a global window); evaluation joins
  * on (user, item). All shuffles on natural keys.
  */
object RecEval {

  private def gains(k: Int): Seq[Long] =
    (1 to k).map(p => math.floor(1e6 / (math.log(p + 1.0) / math.log(2.0))).toLong)

  /** Top-`k` item-based CF recommendations per user: candidates =
    * neighbors of the user's train items, score = Σ sim_q over the
    * user's items (exact BIGINT), train items excluded, ties by item
    * id. Input: `train` (user, item), `neighbors` (item, neighbor,
    * sim_q — ItemSim's output). Returns (user, rec_item, rank).
    */
  def topK(train: DataFrame, neighbors: DataFrame, k: Int): DataFrame = {
    require(k >= 1)
    val cands = train.select(col("user"), col("item"))
      .join(neighbors.select(col("item"), col("neighbor"), col("sim_q")),
        Seq("item"))
      .groupBy(col("user"), col("neighbor").as("rec_item"))
      .agg(sum(col("sim_q")).as("score"))
      .join(train.select(col("user"), col("item").as("rec_item")),
        Seq("user", "rec_item"), "left_anti") // never re-recommend seen
    val w = Window.partitionBy(col("user"))
      .orderBy(col("score").desc, col("rec_item").asc)
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("user"), col("rec_item"), col("rank").cast("long").as("rank"))
  }

  /** Hit-rate@k and mean NDCG@k of `recs` (user, rec_item, rank)
    * against `test` (user, item): one row —
    * (n_users, n_hit_users, hit_rate_bp, mean_ndcg_bp). Users are the
    * TEST users (a user the model cannot score counts as a miss — the
    * honest protocol); per-user NDCG = ⌊10⁴·dcg/idcg⌋ with
    * idcg = the gain prefix for min(k, |test items|).
    */
  def evaluate(recs: DataFrame, test: DataFrame, k: Int): DataFrame = {
    require(k >= 1)
    val g = gains(k)
    val gainArr = lit(g.toArray)
    val idcgArr = lit(g.scanLeft(0L)(_ + _).tail.toArray) // prefix sums
    val t = test.select(col("user"), col("item")).distinct()
    val perUserTest = t.groupBy(col("user"))
      .agg(count(lit(1)).as("n_test"))
    val hits = recs.join(t.withColumnRenamed("item", "rec_item"),
        Seq("user", "rec_item"))
      .groupBy(col("user"))
      .agg(count(lit(1)).as("n_hits"),
        sum(element_at(gainArr, col("rank").cast("int"))).as("dcg_q"))
    val perUser = perUserTest.join(hits, Seq("user"), "left")
      .withColumn("idcg_q",
        element_at(idcgArr, least(col("n_test"), lit(k.toLong)).cast("int")))
      .withColumn("ndcg_bp",
        coalesce(expr("(10000 * dcg_q) DIV idcg_q"), lit(0L)))
      .withColumn("hit", when(col("n_hits").isNotNull, 1L).otherwise(0L))
    perUser.agg(
      count(lit(1)).as("n_users"),
      sum(col("hit")).as("n_hit_users"),
      expr("CAST((10000 * sum(hit)) DIV count(1) AS BIGINT)").as("hit_rate_bp"),
      expr("CAST(sum(ndcg_bp) DIV count(1) AS BIGINT)").as("mean_ndcg_bp"))
  }
}
