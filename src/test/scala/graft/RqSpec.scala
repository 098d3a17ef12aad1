package graft

import org.apache.spark.sql.functions._
import graft.similarity.{Knn, Pq, Rq}

class RqSpec extends SparkSuite {
  import spark.implicits._

  private def cloud(seed: Int, n: Int = 200, dim: Int = 64) = {
    val rnd = new scala.util.Random(seed)
    val base = (0 until n).map(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() - 0.5f)))
    val twins = base.map { case (id, v) =>
      (id + 1000L, v.map(x => x + (rnd.nextFloat() - 0.5f) * 0.02f))
    }
    (base ++ twins).toDF("vec_id", "embedding")
  }

  test("RQ finds planted near-duplicates at recall >= 0.9") {
    // resolution contract made explicit: a 2-stage RQ has nCoarse·K₂
    // distinct reconstructions, and twin retrieval needs cells fine
    // enough that a twin rarely shares its cell with a smaller-id
    // point (ties rank by vec_id). 8·16 = 128 cells over 400 points
    // measured recall 0.1; 8·256 = 2048 cells clears the bar — the
    // same resolution-vs-budget tradeoff the depth note in Rq's
    // Scaladoc documents (PQ gets K^m cells from the same bytes)
    val c = cloud(47)
    val coarse = Knn.trainCentroids(c, nCentroids = 8, iters = 1)
    val book = Rq.trainBook(c, coarse, k = 256, iters = 1)
    val top1 = Rq.rqTopK(c, c.filter(col("vec_id") < 20), coarse, book,
      k = 1, nProbe = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    val hits = top1.count { case (q, n) => n == q + 1000L }
    assert(hits >= 18, s"planted-twin recall ${hits / 20.0}")
  }

  test("the LUT distance equals the reconstruction distance, exactly") {
    // rq_dist for a candidate must be floor(2^16·‖(q−c1)−c2‖²) computed
    // from the trained constants — recomputed here independently from
    // the collected codebooks, matching every returned row
    val c = cloud(48, n = 60)
    val coarse = Knn.trainCentroids(c, nCentroids = 4, iters = 1)
    val book = Rq.trainBook(c, coarse, k = 4, iters = 1)
    val coarseById = coarse.toMap
    val bookById = book.toMap
    val encoded = Rq.encodeCorpus(c, coarse, book)
      .as[(Long, Int, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val vecs = c.as[(Long, Array[Float])].collect().toMap
    val got = Rq.rqTopK(c, c.filter(col("vec_id") < 5), coarse, book,
      k = 3, nProbe = 4)
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (q, nb, dist) =>
      val (cid, _) = encoded(nb)
      // query residual against the CANDIDATE's bucket (the probe the
      // candidate was scored under), then minus the candidate's stage-2
      // entry — float narrowing then double ops, the kernel's order
      val qr = vecs(q).zip(coarseById(cid)).map { case (a, b) =>
        (a.toDouble - b.toDouble).toFloat
      }
      val c2 = bookById(encoded(nb)._2)
      val d2 = qr.zip(c2).map { case (a, b) =>
        val d = a.toDouble - b.toDouble; d * d
      }.sum
      val want = math.floor(65536.0 * d2).toLong
      assert(dist === want, s"query $q neighbor $nb")
    }
  }

  test("codes and top-k are identical across partitionings") {
    val c = cloud(49)
    val coarse = Knn.trainCentroids(c, nCentroids = 8, iters = 1)
    val book = Rq.trainBook(c, coarse, k = 8, iters = 1)
    val a = Rq.rqTopK(c.repartition(1), c.filter(col("vec_id") < 10), coarse,
      book, k = 5).orderBy("query_id", "neighbor_id")
      .as[(Long, Long, Long)].collect().toSeq
    val b = Rq.rqTopK(c.repartition(17), c.filter(col("vec_id") < 10), coarse,
      book, k = 5).orderBy("query_id", "neighbor_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(a === b)
    // and the trained book itself is partition-invariant
    val book2 = Rq.trainBook(c.repartition(17), coarse, k = 8, iters = 1)
    assert(book.map(x => (x._1, x._2.toSeq)).toSeq ===
      book2.map(x => (x._1, x._2.toSeq)).toSeq)
  }

  test("null embeddings are excluded from the index, not garbage-coded") {
    val c = cloud(50, n = 30)
      .unionAll(Seq((5000L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"))
    val coarse = Knn.trainCentroids(c, nCentroids = 4, iters = 1)
    val book = Rq.trainBook(c, coarse, k = 4, iters = 1)
    val ids = Rq.encodeCorpus(c, coarse, book).select("vec_id")
      .as[Long].collect()
    assert(!ids.contains(5000L))
  }
}
