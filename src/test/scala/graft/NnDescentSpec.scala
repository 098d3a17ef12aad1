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

  test("GraphSearch over the descent graph finds within-cluster " +
    "neighbors; the beam's best score is monotone over rounds") {
    import graft.similarity.GraphSearch
    val d = clustered
    val graph = NnDescent.knnGraph(d, "vec_id", "embedding", k = 5, rounds = 4)
    val queries = d.filter(col("vec_id") % 30 === 7) // one per cluster
    // beam search reaches only the components its entry points touch —
    // this corpus's descent graph is 10 DISCONNECTED cluster
    // components, so 4 entries answer only ~3/10 queries well
    // (measured 0.3 within-share); 40 hash-spread entries cover every
    // component (the published remedy: restarts/entries scale with the
    // component structure). The registered query's noise corpus is one
    // connected component, where the default 4 suffice.
    val got = GraphSearch.search(graph, d, queries,
        beamWidth = 6, rounds = 4, k = 3, nEntry = 40)
      .as[(Long, Long, Double)].collect()
    assert(got.map(_._1).distinct.length === 10, "every query answered")
    // search must land inside the query's own cluster (the graph is
    // within-cluster after 4 descent rounds, and beams walk it)
    val within = got.count { case (q, n, _) => q / 30 == n / 30 }
    assert(within.toDouble / got.length >= 0.9,
      s"within-cluster hit share ${within.toDouble / got.length}")
    // recall vs exact brute-force top-3 on the same scoring
    val brute = Knn.bruteForceTopK(d, queries, k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val mine = got.map(r => (r._1, r._2)).toSet
    val recall = (mine intersect brute).size.toDouble / brute.size
    assert(recall >= 0.7, s"graph-search recall $recall")

    // monotonicity: because beam_{r-1} is a subset of round r's
    // candidate pool, the per-query best cosine can never decrease —
    // compare a 1-round and a 3-round search
    def best(rounds: Int): Map[Long, Double] =
      GraphSearch.search(graph, d, queries,
          beamWidth = 6, rounds = rounds, k = 1)
        .as[(Long, Long, Double)].collect()
        .map(r => r._1 -> r._3).toMap
    val b1 = best(1); val b3 = best(3)
    b1.keys.foreach(q =>
      assert(b3(q) >= b1(q), s"query $q: best cos fell ${b1(q)} -> ${b3(q)}"))

    // deterministic across partitionings
    val again = GraphSearch.search(graph.repartition(13, col("id")),
        d.repartition(7, col("vec_id")), queries, beamWidth = 6,
        rounds = 4, k = 3, nEntry = 40)
      .as[(Long, Long, Double)].collect()
    assert(got.sortBy(r => (r._1, r._2)).toSeq ===
      again.sortBy(r => (r._1, r._2)).toSeq)
  }
}
