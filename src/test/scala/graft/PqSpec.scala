package graft

import org.apache.spark.sql.functions._
import graft.similarity.{Knn, Pq}
import graft.sources.Tables

class PqSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, sf, "embeddings").cache()
  private lazy val queries = emb.filter(col("vec_id") < 5)

  private lazy val coarse = Knn.trainCentroids(emb, nCentroids = 8, iters = 1)
  private lazy val books = Pq.trainCodebooks(Pq.residualFrame(emb, coarse),
    m = 4, subDim = 16, k = 8, iters = 1)

  private def bruteSet = Knn.bruteForceTopK(emb, queries, k = 5)
    .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet

  test("IVFPQ finds planted near-duplicates at recall >= 0.9") {
    // the retrieval claim that matters for a 100 TB near-dup pass: when
    // real neighbor structure exists (a twin at distance ~0.01 in a unit
    // cloud), even 8-byte codes separate it from the bulk. The noise
    // corpus below measures the opposite regime.
    val rnd = new scala.util.Random(41)
    val base = (0 until 200).map(i => (i.toLong, Array.fill(64)(rnd.nextFloat() - 0.5f)))
    val twins = base.map { case (id, v) =>
      (id + 1000L, v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f))
    }
    val cloud = (base ++ twins).toDF("vec_id", "embedding")
    val co = Knn.trainCentroids(cloud, nCentroids = 8, iters = 1)
    val bk = Pq.trainCodebooks(Pq.residualFrame(cloud, co), m = 8, subDim = 8, k = 16, iters = 1)
    val qs = cloud.filter(col("vec_id") < 20)
    val top1 = Pq.ivfpqTopK(cloud, qs, co, bk, subDim = 8, k = 1, nProbe = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    val hits = top1.count { case (q, n) => n == q + 1000L }
    assert(hits >= 18, s"planted-twin recall ${hits / 20.0}")
  }

  test("on the near-isotropic test corpus, 16-byte codes keep measured recall") {
    // the sf embeddings are noise-like (per-query max cosine ~0.35 vs
    // p99 ~0.29 — the top-5 sit inside the bulk's tail), so ANY lossy
    // code shuffles ranks in that band; this pins the measured floor at
    // the published parameter shape (m=16, K=128) rather than claiming
    // a structure the data doesn't have. L2-normalized first: ADC
    // approximates L2, which matches cosine ranking only on the sphere.
    val unit = emb.select(col("vec_id"),
      graft.functions.VectorFunctions.l2Normalize(col("embedding")).as("embedding"))
      .cache()
    val uq = unit.filter(col("vec_id") < 5)
    val uBrute = Knn.bruteForceTopK(unit, uq, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val uCoarse = Knn.trainCentroids(unit, nCentroids = 8, iters = 1)
    val b16 = Pq.trainCodebooks(Pq.residualFrame(unit, uCoarse),
      m = 16, subDim = 4, k = 128, iters = 2)
    val pq = Pq.ivfpqTopK(unit, uq, uCoarse, b16, subDim = 4, k = 5, nProbe = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (pq intersect uBrute).size.toDouble / uBrute.size
    assert(recall >= 0.5, s"full-probe ADC recall $recall")
  }

  test("whitened PQ finds planted twins through the composed pipeline") {
    // the q_ann_wpq composition end-to-end: project through a trained
    // whitening basis, narrow to float, IVFADC on the conditioned
    // vectors — the planted-twin retrieval contract must survive the
    // extra stage
    val rnd = new scala.util.Random(43)
    val base = (0 until 200).map(i => (i.toLong, Array.fill(64)(rnd.nextFloat() - 0.5f)))
    val twins = base.map { case (id, v) =>
      (id + 1000L, v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f))
    }
    val cloud = (base ++ twins).toDF("vec_id", "embedding")
    val t16 = graft.similarity.Whitening.fit(cloud, "embedding", k = 16)
    val unit = cloud.select(col("vec_id"),
      transform(t16(col("embedding")), x => x.cast("float")).as("embedding"))
    val co = Knn.trainCentroids(unit, nCentroids = 8, iters = 1)
    val bk = Pq.trainCodebooks(Pq.residualFrame(unit, co), m = 4, subDim = 4, k = 8, iters = 1)
    val top1 = Pq.ivfpqTopK(unit, unit.filter(col("vec_id") < 20), co, bk,
      subDim = 4, k = 1, nProbe = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    val hits = top1.count { case (q, n) => n == q + 1000L }
    assert(hits >= 18, s"whitened planted-twin recall ${hits / 20.0}")
  }

  test("codebooks and codes are bit-identical across partitionings") {
    // the PQ extension inherits quantized Lloyd's determinism contract:
    // codebooks, and therefore every code, are partition-order-free
    val c1 = Knn.trainCentroids(emb.repartition(1), nCentroids = 8, iters = 1)
    val b1 = Pq.trainCodebooks(Pq.residualFrame(emb.repartition(1), c1),
      m = 4, subDim = 16, k = 8, iters = 1)
    val c17 = Knn.trainCentroids(emb.repartition(17, col("vec_id")), nCentroids = 8, iters = 1)
    val b17 = Pq.trainCodebooks(Pq.residualFrame(emb.repartition(17, col("vec_id")), c17),
      m = 4, subDim = 16, k = 8, iters = 1)
    b1.zip(b17).foreach { case (ba, bb) =>
      ba.zip(bb).foreach { case ((ia, va), (ib, vb)) =>
        assert(ia === ib)
        assert(va.map(java.lang.Float.floatToIntBits)
          .sameElements(vb.map(java.lang.Float.floatToIntBits)))
      }
    }
    val codes1 = Pq.encodeCorpus(emb.repartition(1), c1, b1, subDim = 16)
      .orderBy("vec_id").as[(Long, Int, Seq[Int])].collect()
    val codes17 = Pq.encodeCorpus(emb.repartition(17, col("vec_id")), c17, b17, subDim = 16)
      .orderBy("vec_id").as[(Long, Int, Seq[Int])].collect()
    assert(codes1 === codes17)
  }

  test("ADC distance is the exact integer sum of quantized LUT entries") {
    // recompute one query's distances on the driver from the trained
    // artifacts — the engine's integer must match EXACTLY, not nearly
    val out = Pq.ivfpqTopK(emb, queries, coarse, books, subDim = 16, k = 5, nProbe = 2)
      .as[(Long, Long, Long)].collect()
    val coarseById = coarse.toMap
    val assigned = Pq.encodeCorpus(emb, coarse, books, subDim = 16)
      .as[(Long, Int, Seq[Int])].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val vecs = emb.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().toMap
    out.take(10).foreach { case (q, n, got) =>
      val (bucket, codes) = assigned(n)
      val cent = coarseById(bucket)
      val qr = vecs(q).indices.map(d => (vecs(q)(d).toDouble - cent(d).toDouble).toFloat)
      val expected = (0 until 4).map { m =>
        val code = codes(m)
        val bookVec = books(m).toMap.apply(code)
        var s = 0.0
        for (d <- 0 until 16) {
          val diff = qr(m * 16 + d).toDouble - bookVec(d).toDouble
          s += diff * diff
        }
        math.floor(65536.0 * s).toLong
      }.sum
      assert(got === expected, s"query $q neighbor $n")
    }
  }

  test("persisted PQ index is a fraction of the float index's bytes") {
    def dirBytes(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) f.length() else 0L
      walk(new java.io.File(p))
    }
    val base = java.nio.file.Files.createTempDirectory("graft_pq").toString
    Knn.writeIndex(emb, coarse, s"$base/float")
    Pq.writeIndex(emb, coarse, books, subDim = 16, s"$base/pq")
    val fb = dirBytes(s"$base/float")
    val pb = dirBytes(s"$base/pq")
    assert(pb * 2 < fb, s"pq index $pb bytes vs float $fb — expected < half")
    // and the PQ index still partition-prunes on the coarse bucket
    val plan = spark.read.parquet(s"$base/pq")
      .filter(col("centroid_id") === 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("centroid_id"))
  }

  test("recall-vs-bytes frontier is monotone: more code bytes, no worse recall") {
    // the q_ann_frontier contract on a corpus with real neighbor
    // structure (planted twins in a unit cloud): coarser codes (m=2,
    // 32-dim subspaces with 16 cells) quantize the twin into the bulk;
    // finer codes recover it. Monotonicity is the frontier's defining
    // property — a budget rung that LOSES recall while spending more
    // bytes is a pipeline bug, not a tradeoff.
    val rnd = new scala.util.Random(43)
    val base = (0 until 200).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() - 0.5f)))
    val twins = base.map { case (id, v) =>
      (id + 1000L, v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f))
    }
    val cloud = (base ++ twins).toDF("vec_id", "embedding").cache()
    val co = Knn.trainCentroids(cloud, nCentroids = 8, iters = 1)
    val qs = cloud.filter(col("vec_id") < 40)
    val recalls = Seq(2, 4, 8).map { m =>
      val bk = Pq.trainCodebooks(Pq.residualFrame(cloud, co),
        m = m, subDim = 64 / m, k = 16, iters = 1)
      val top1 = Pq.ivfpqTopK(cloud, qs, co, bk, subDim = 64 / m,
          k = 1, nProbe = 8)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      top1.count { case (q, n) => n == q + 1000L }
    }
    assert(recalls.zip(recalls.tail).forall { case (lo, hi) => lo <= hi },
      s"frontier not monotone (twin hits of 40 at m=2,4,8): $recalls")
    assert(recalls.last >= 36,
      s"9-byte codes must find planted twins: ${recalls.last}/40")
    // and the REGISTERED frontier query emits the documented grid —
    // three PQ budgets plus the gnns graph rung (method, m, bytes)
    val rows = SparkEntry.queries("q_ann_frontier")(spark, sf)
      .orderBy("method", "m_subspaces").collect()
    assert(rows.map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSeq ===
      Seq(("gnns", 0, 40), ("ivfpq", 2, 3), ("ivfpq", 4, 5), ("ivfpq", 8, 9)))
    assert(rows.forall(r => r.getLong(3) >= 0L && r.getLong(3) <= 10000L))
  }
}
