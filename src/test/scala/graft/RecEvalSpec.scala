package graft

import org.apache.spark.sql.functions._
import graft.similarity.RecEval

class RecEvalSpec extends SparkSuite {
  import spark.implicits._

  test("topK scores candidates by exact sim sums, excludes seen items, ranks by ties") {
    val train = Seq((1L, 10L), (1L, 20L)).toDF("user", "item")
    val nbrs = Seq(
      (10L, 30L, 5000L), (10L, 40L, 3000L),
      (20L, 30L, 4000L), (20L, 10L, 9000L)) // 10 is seen -> excluded
      .toDF("item", "neighbor", "sim_q")
    val recs = RecEval.topK(train, nbrs, k = 2)
      .orderBy("rank").as[(Long, Long, Long)].collect()
    // 30 scores 9000 (5000+4000), 40 scores 3000; 10 excluded
    assert(recs.toSeq == Seq((1L, 30L, 1L), (1L, 40L, 2L)))
  }

  test("evaluate computes hit rate and NDCG from integer gain tables") {
    // user 1: hit at rank 1 of 1 test item -> ndcg = 10000
    // user 2: no recs at all -> miss, ndcg 0
    // user 3: hit at rank 2, one test item -> ndcg = g(2)/g(1)
    val recs = Seq((1L, 100L, 1L), (3L, 300L, 1L), (3L, 301L, 2L))
      .toDF("user", "rec_item", "rank")
    val test = Seq((1L, 100L), (2L, 200L), (3L, 301L))
      .toDF("user", "item")
    val r = RecEval.evaluate(recs, test, k = 10).head()
    assert(r.getAs[Long]("n_users") == 3L)
    assert(r.getAs[Long]("n_hit_users") == 2L)
    assert(r.getAs[Long]("hit_rate_bp") == 6666L)
    val g1 = 1000000L // floor(1e6 / log2(2))
    val g2 = math.floor(1e6 / (math.log(3.0) / math.log(2.0))).toLong
    val ndcg3 = (10000L * g2) / g1
    assert(r.getAs[Long]("mean_ndcg_bp") == (10000L + 0L + ndcg3) / 3L)
  }

  test("a user whose test item tops their neighbors is a guaranteed hit") {
    val train = Seq((7L, 1L), (7L, 2L), (8L, 1L), (8L, 3L), (9L, 2L), (9L, 3L))
      .toDF("user", "item")
      .groupBy("user", "item").agg(count(lit(1)).as("strength"))
    val nbrs = graft.similarity.ItemSim.neighbors(train,
      "user", "item", "strength", k = 5, maxUserItems = 10)
    val recs = RecEval.topK(train, nbrs, k = 5)
    // user 7 trained on {1,2}; items 3 co-occurs with both via 8/9
    val rec7 = recs.filter($"user" === 7L).select("rec_item")
      .as[Long].collect().toSet
    assert(rec7.contains(3L))
    val eval = RecEval.evaluate(recs, Seq((7L, 3L)).toDF("user", "item"), 5).head()
    assert(eval.getAs[Long]("n_hit_users") == 1L)
  }
}
