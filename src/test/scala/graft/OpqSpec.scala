package graft

import org.apache.spark.sql.functions._
import graft.similarity.{Knn, Opq, Pq, Whitening}

class OpqSpec extends SparkSuite {
  import spark.implicits._

  private def mat(rows: (Double, Double)*): Array[Array[Double]] =
    rows.map { case (a, b) => Array(a, b) }.toArray

  test("polar recovers a known rotation from rotation·PSD") {
    // M = R0 · H with H symmetric positive definite — the polar factor
    // of M is exactly R0 (Schönemann's Procrustes solution)
    val th = 0.7
    val r0 = mat((math.cos(th), -math.sin(th)), (math.sin(th), math.cos(th)))
    val h = mat((3.0, 1.0), (1.0, 2.0)) // PSD (eigs ~ 3.6, 1.4)
    val m = Array.tabulate(2, 2)((i, j) => (0 until 2).map(k => r0(i)(k) * h(k)(j)).sum)
    val r = Opq.polar(m)
    for (i <- 0 until 2; j <- 0 until 2)
      assert(math.abs(r(i)(j) - r0(i)(j)) < 1e-9, s"polar($i)($j)")
  }

  test("polar throws on a singular cross-moment") {
    val m = mat((1.0, 2.0), (2.0, 4.0)) // rank 1
    val e = intercept[IllegalArgumentException] { Opq.polar(m) }
    assert(e.getMessage.contains("singular"))
  }

  test("trained rotation is orthonormal and no worse than identity") {
    val rnd = new scala.util.Random(47)
    val cloud = (0 until 300)
      .map(i => (i.toLong, Array.fill(16)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
    val r = Opq.trainRotation(cloud, m = 4, subDim = 4, k = 8)
    // rows orthonormal
    for (a <- 0 until 16; b <- a until 16) {
      val dp = (0 until 16).map(j => r(a)(j) * r(b)(j)).sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dp - want) < 1e-9, s"RRᵀ($a)($b) = $dp")
    }
    // Procrustes optimality vs identity: tr(RᵀM) ≥ tr(M), where M is
    // the cross-moment toward the SAME codebooks R was trained on —
    // recompute both traces from the library's own pieces
    val books0 = Pq.trainCodebooks(cloud, m = 4, subDim = 4, k = 8, iters = 1)
    val mm = Opq.crossMoment(cloud, books0, 4, 4)
    val trM = (0 until 16).map(i => mm(i)(i)).sum
    val trRM = (for (i <- 0 until 16; k <- 0 until 16) yield r(k)(i) * mm(k)(i)).sum
    assert(trRM >= trM - 1e-9, s"tr(RᵀM)=$trRM < tr(M)=$trM")
  }

  test("rotation is deterministic across partitionings") {
    val rnd = new scala.util.Random(48)
    val cloud = (0 until 300)
      .map(i => (i.toLong, Array.fill(16)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
    val r1 = Opq.trainRotation(cloud.repartition(1), m = 4, subDim = 4, k = 8)
    val r32 = Opq.trainRotation(cloud.repartition(32), m = 4, subDim = 4, k = 8)
    for (i <- 0 until 16; j <- 0 until 16)
      assert(r1(i)(j) === r32(i)(j), s"R($i)($j) differs across partitionings")
  }

  test("OPQ pipeline finds planted twins at recall >= the wpq bar") {
    // the q_ann_opq composition end-to-end on the PqSpec planted-twin
    // corpus: whiten -> learned rotation -> IVFADC; the extra stage
    // must not lose the twins (same >= 18/20 bar as the wpq spec)
    val rnd = new scala.util.Random(43)
    val base = (0 until 200).map(i => (i.toLong, Array.fill(64)(rnd.nextFloat() - 0.5f)))
    val twins = base.map { case (id, v) =>
      (id + 1000L, v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f))
    }
    val cloud = (base ++ twins).toDF("vec_id", "embedding")
    val t16 = Whitening.fit(cloud, "embedding", k = 16)
    val unit = cloud.select(col("vec_id"),
      transform(t16(col("embedding")), x => x.cast("float")).as("embedding"))
    val rot = Opq.trainRotation(unit, m = 4, subDim = 4, k = 8)
    val rimg = unit.select(col("vec_id"),
      Opq.rotateExpr(col("embedding"), rot).as("embedding"))
    val co = Knn.trainCentroids(rimg, nCentroids = 8, iters = 1)
    val bk = Pq.trainCodebooks(Pq.residualFrame(rimg, co), m = 4, subDim = 4, k = 8, iters = 1)
    val top1 = Pq.ivfpqTopK(rimg, rimg.filter(col("vec_id") < 20), co, bk,
      subDim = 4, k = 1, nProbe = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    val hits = top1.count { case (q, n) => n == q + 1000L }
    assert(hits >= 18, s"opq planted-twin recall ${hits / 20.0}")
  }
}
