package graft

import graft.dedup.Clusters
import graft.operators.Denormalize

class ClustersSpec extends SparkSuite {
  import spark.implicits._

  test("canonicalize resolves chains and keeps singletons") {
    val ids = (1L to 8L).toDF("id")
    // chain 1-2-3-4, pair 6-7, singletons 5 and 8
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (6L, 7L)).toDF("id_a", "id_b")
    val out = Clusters.canonicalize(ids, pairs).orderBy("id")
      .as[(Long, Long)].collect()
    assert(out === Array((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (5L, 5L), (6L, 6L), (7L, 6L), (8L, 8L)))
    val dups = Clusters.duplicates(ids, pairs).select("id").as[Long].collect().sorted
    assert(dups === Array(2L, 3L, 4L, 7L))
  }

  test("distributed propagation path agrees with local union-find") {
    val ids = (1L to 8L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (6L, 7L)).toDF("id_a", "id_b")
    val local = Clusters.canonicalize(ids, pairs).orderBy("id")
      .as[(Long, Long)].collect()
    val dist = Clusters.canonicalize(ids, pairs, maxLocalEdges = 0L).orderBy("id")
      .as[(Long, Long)].collect()
    assert(dist === local)
  }

  test("propagation converges on a deep chain via pointer jumping; non-convergence throws") {
    // a 200-link chain component: pure neighbor propagation moves the
    // min label one hop per round (200 rounds); pointer jumping must
    // converge within the default 10 (2^10 > 200)
    val n = 200L
    val ids = (1L to n).toDF("id")
    val chain = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Clusters.canonicalize(ids, chain, maxLocalEdges = 0L)
      .as[(Long, Long)].collect()
    assert(out.forall(_._2 == 1L), out.filter(_._2 != 1L).take(5).mkString(","))
    // a diameter beyond 2^maxIters fails LOUDLY instead of silently
    // splitting the cluster into several canonicals
    val ex = intercept[IllegalStateException] {
      Clusters.canonicalize(ids, chain, maxIters = 3, maxLocalEdges = 0L).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("resolveWithFallback prefers earlier rungs") {
    val facts = Seq(
      (1L, Some(10), "alpha"),   // key hit → rung 1
      (2L, None, "beta"),        // name hit → rung 2
      (3L, Some(99), "gamma"),   // bad key, name hit → rung 2
      (4L, None, "nope")         // no hit → null
    ).toDF("row_id", "k", "nm")
    val dim = Seq((10, "alpha", 100L), (20, "beta", 200L), (30, "gamma", 300L))
      .toDF("dk", "dn", "payload")
    val out = Denormalize.resolveWithFallback(facts, dim,
      Seq("k" -> "dk", "nm" -> "dn"), take = "payload" -> "resolved")
      .orderBy("row_id").select("row_id", "resolved")
      .as[(Long, Option[Long])].collect()
    assert(out === Array((1L, Some(100L)), (2L, Some(200L)),
      (3L, Some(300L)), (4L, None)))
  }
}
