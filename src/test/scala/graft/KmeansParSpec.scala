package graft

import org.apache.spark.sql.functions._
import graft.similarity.{KmeansPar, Knn}

class KmeansParSpec extends SparkSuite {
  import spark.implicits._

  // 8 well-separated clusters along distinct axes, 50 points each —
  // the regime where stride seeding can land several seeds in one
  // cluster and k-means|| must not
  private def clustered(seedOffset: Int = 0) = {
    val rnd = new scala.util.Random(61 + seedOffset)
    (for {
      c <- 0 until 8
      i <- 0 until 50
    } yield {
      val v = Array.fill(16)(rnd.nextFloat() * 0.05f)
      v(c * 2) += 10f
      ((c * 50 + i).toLong, v)
    }).toDF("vec_id", "embedding")
  }

  test("seeds land one per well-separated cluster") {
    val d = clustered()
    val s = KmeansPar.seed(d, k = 8, rounds = 3, oversample = 16)
    assert(s.rows.length === 8)
    // cluster of a vec_id is vec_id / 50 — the 8 seeds must cover all 8
    val covered = s.rows.map(_._2 / 50).toSet
    assert(covered.size === 8, s"seed clusters: ${s.rows.map(_._2 / 50).toSeq}")
  }

  test("seeding is deterministic and partition-invariant") {
    val d = clustered()
    val a = KmeansPar.seed(d.repartition(1), k = 8)
    val b = KmeansPar.seed(d.repartition(23), k = 8)
    assert(a.rows.toSeq === b.rows.toSeq)
  }

  test("weights count every corpus point exactly once across candidates") {
    val d = clustered()
    val s = KmeansPar.seed(d, k = 8)
    // chosen-seed weights are a subset of the candidate weights; the
    // FULL candidate weight mass is the corpus (every point nearest
    // exactly one candidate) — recompute from the vectors
    val cands = s.vectors
    val pts = d.as[(Long, Array[Float])].collect()
    val full = pts.groupBy { case (_, v) =>
      cands.minBy { case (cid, cv) => (KmeansPar.qdist(v, cv), cid) }._1
    }.map { case (cid, g) => cid -> g.length.toLong }
    assert(full.values.sum === pts.length.toLong)
    s.rows.foreach { case (_, id, w) =>
      assert(w === full.getOrElse(id, 0L), s"weight of seed $id")
    }
  }

  test("seeds feed Lloyd as centroids (the composition k-means|| exists for)") {
    val d = clustered()
    val s = KmeansPar.seed(d, k = 8)
    val assigned = Knn.withAssignment(d, s.centroids)
    // one Lloyd-free assignment over quality seeds: every cluster maps
    // to exactly one centroid id (seeds are one-per-cluster, clusters
    // are separated by >> intra-cluster noise)
    val m = assigned.select((col("vec_id") / 50).cast("int"), col("centroid_id"))
      .as[(Int, Int)].collect().groupBy(_._1).map { case (c, g) =>
        c -> g.map(_._2).distinct.length
      }
    assert(m.values.forall(_ === 1), s"cluster->centroid fanout: $m")
  }

  test("a degenerate corpus that selects fewer candidates than k fails loudly") {
    // all points identical: after the first center every qd is 0, no
    // round selects anything, candidates = 1 < k
    val d = (0 until 40).map(i => (i.toLong, Array.fill(8)(1.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      KmeansPar.seed(d, k = 4)
    }
    assert(e.getMessage.contains("oversample"))
  }
}
