package graft

import org.apache.spark.sql.functions._
import graft.similarity.{Knn, NnDescent}

class NnDescentSpec extends SparkSuite {
  import spark.implicits._

  // 10 tight clusters of 30 points each: the structured regime where
  // "neighbor of a neighbor is a neighbor" actually holds
  private def clustered = {
    val rnd = new scala.util.Random(81)
    (for {
      c <- 0 until 10
      i <- 0 until 30
    } yield {
      val v = Array.fill(32)(rnd.nextFloat() * 0.02f)
      v(c * 3) += 5f; v(c * 3 + 1) += 3f
      ((c * 30 + i).toLong, v)
    }).toDF("vec_id", "embedding")
  }

  test("converges to within-cluster neighbors on a structured corpus") {
    val d = clustered
    val g = NnDescent.knnGraph(d, "vec_id", "embedding", k = 5, rounds = 4)
      .as[(Long, Long, Double)].collect()
    // after 4 rounds, virtually all edges are within-cluster (true
    // k-NN of every point is within its 30-point cluster)
    val within = g.count { case (a, b, _) => a / 30 == b / 30 }
    assert(within.toDouble / g.length >= 0.95,
      s"within-cluster edge share ${within.toDouble / g.length}")
    // and recall vs brute force is high
    val brute = Knn.bruteForceTopK(d, d, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val mine = g.map { case (a, b, _) => (a, b) }.toSet
    val recall = (mine intersect brute).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall vs brute force $recall")
  }

  test("descent improves the graph round over round") {
    val d = clustered
    def avgCos(rounds: Int) =
      NnDescent.knnGraph(d, "vec_id", "embedding", k = 5, rounds = rounds)
        .agg(avg(col("cos_sim"))).head().getDouble(0)
    val r1 = avgCos(1); val r3 = avgCos(3)
    assert(r3 > r1, s"avg cos round1 $r1 vs round3 $r3")
  }

  test("deterministic and partition-invariant") {
    val d = clustered
    val a = NnDescent.knnGraph(d.repartition(1), "vec_id", "embedding", 5, 2)
      .orderBy("id", "neighbor_id").as[(Long, Long, Double)].collect().toSeq
    val b = NnDescent.knnGraph(d.repartition(19), "vec_id", "embedding", 5, 2)
      .orderBy("id", "neighbor_id").as[(Long, Long, Double)].collect().toSeq
    assert(a === b)
  }

  test("every node keeps at most k neighbors and no self-loops") {
    val d = clustered
    val g = NnDescent.knnGraph(d, "vec_id", "embedding", k = 5, rounds = 2)
    assert(g.filter(col("id") === col("neighbor_id")).isEmpty)
    assert(g.groupBy("id").count().filter(col("count") > 5).isEmpty)
    // all nodes present (the ring init reaches everyone)
    assert(g.select("id").distinct().count() === 300L)
  }

  test("null embeddings are excluded everywhere") {
    val d = clustered.unionAll(
      Seq((9999L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"))
    val g = NnDescent.knnGraph(d, "vec_id", "embedding", k = 3, rounds = 1)
    assert(g.filter(col("id") === 9999L || col("neighbor_id") === 9999L).isEmpty)
  }
}
