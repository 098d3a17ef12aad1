package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.Clusters
import graft.functions.VectorFunctions
import graft.similarity.{Knn, SemDedup}

class SemDedupSpec extends SparkSuite {
  import spark.implicits._

  /** Four well-separated directions in R⁴; members of a family are tiny
    * perturbations (cosine ≈ 1 within a family, ≈ 0 across), so no
    * near-dup pair straddles a cell boundary and SemDeDup must equal the
    * brute-force all-pairs formulation exactly.
    */
  private def corpus: DataFrame = {
    val base = Seq(
      Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f),
      Array(0f, 0f, 1f, 0f), Array(0f, 0f, 0f, 1f))
    val rows = for {
      fam <- 0 until 4
      i <- 0 until 6
    } yield {
      val v = base(fam).clone()
      v((fam + 1) % 4) = 0.01f * i // small in-family spread
      ((fam * 6 + i).toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def bruteForce(emb: DataFrame, minCosine: Double): DataFrame = {
    val l = emb.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val r = emb.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val pairs = l.crossJoin(r)
      .filter(col("id_a") < col("id_b"))
      .filter(round(VectorFunctions.cosine(col("va"), col("vb")), 4) >= minCosine)
      .select("id_a", "id_b")
    Clusters.canonicalize(emb.select(col("vec_id").as("id")), pairs)
  }

  test("SemDeDup equals brute-force all-pairs on separated families") {
    val emb = corpus
    val cents = Knn.trainCentroids(emb, nCentroids = 4, iters = 2)
    val got = SemDedup.dedup(emb, cents, minCosine = 0.9)
      .as[(Long, Long)].collect().toSeq.sorted
    val want = bruteForce(emb, 0.9).as[(Long, Long)].collect().toSeq.sorted
    assert(got === want)
    // each family collapses to its minimum id
    assert(got.count { case (id, canon) => id == canon } === 4)
  }

  test("representatives are the minimum id of each duplicate group") {
    val emb = corpus
    val cents = Knn.trainCentroids(emb, nCentroids = 4, iters = 2)
    val m = SemDedup.dedup(emb, cents, minCosine = 0.9)
      .as[(Long, Long)].collect().toMap
    for (fam <- 0 until 4; i <- 0 until 6)
      assert(m(fam * 6L + i) === fam * 6L, s"family $fam member $i")
  }

  test("a vector similar to nothing keeps itself") {
    val emb = corpus.unionByName(
      Seq((99L, Seq(0.5f, 0.5f, 0.5f, 0.5f))).toDF("vec_id", "embedding"))
    val cents = Knn.trainCentroids(emb, nCentroids = 4, iters = 2)
    val m = SemDedup.dedup(emb, cents, minCosine = 0.95)
      .as[(Long, Long)].collect().toMap
    assert(m(99L) === 99L)
  }

  test("a collapsed cell beyond maxClusterSize raises a named error") {
    val emb = corpus
    // one centroid → everything lands in a single cell of 24 > 10
    val cents = Knn.trainCentroids(emb, nCentroids = 1, iters = 1)
    val e = intercept[Exception] {
      SemDedup.dedup(emb, cents, minCosine = 0.9, maxClusterSize = 10L).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("semdedup")), messages(e).mkString("; "))
  }
}
