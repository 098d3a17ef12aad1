package graft

import org.apache.spark.sql.functions._
import graft.similarity.Knn
import graft.sources.Tables

class KnnSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, sf, "embeddings").cache()
  private lazy val queries = emb.filter(col("vec_id") < 5)

  test("bruteForceTopK returns k neighbors per query, self excluded, sorted by cos") {
    val out = Knn.bruteForceTopK(emb, queries, k = 5)
      .as[(Long, Long, Double)].collect()
    assert(out.length === 25)
    assert(out.forall { case (q, n, _) => q != n })
    out.groupBy(_._1).values.foreach { g =>
      assert(g.length === 5)
    }
  }

  test("ivfTopK with all buckets probed equals brute force") {
    val centroids = Knn.trainCentroids(emb, nCentroids = 4, iters = 1)
    val ivf = Knn.ivfTopK(emb, queries, centroids, k = 5, nProbe = 4)
      .as[(Long, Long, Double)].collect().toSet
    val bf = Knn.bruteForceTopK(emb, queries, k = 5)
      .as[(Long, Long, Double)].collect().toSet
    assert(ivf === bf)
  }

  test("persisted index search equals in-memory IVF and prunes partitions") {
    val centroids = Knn.trainCentroids(emb, nCentroids = 4, iters = 1)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf").toString + "/index"
    Knn.writeIndex(emb, centroids, path)
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.forall(_.startsWith("centroid_id=")) && dirs.length > 1)
    val fromIndex = Knn.searchIndex(spark, path, queries, centroids, k = 5, nProbe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val inMem = Knn.ivfTopK(emb, queries, centroids, k = 5, nProbe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(fromIndex === inMem)
  }

  test("bucket filter on the persisted index reaches PartitionFilters") {
    val centroids = Knn.trainCentroids(emb, nCentroids = 4, iters = 1)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf2").toString + "/index"
    Knn.writeIndex(emb, centroids, path)
    val plan = spark.read.parquet(path)
      .filter(col("centroid_id") === 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("centroid_id"),
      s"expected partition pruning in plan:\n$plan")
  }

  test("top-k over int8-quantized vectors matches exact top-k closely") {
    import graft.functions.VectorFunctions._
    import org.apache.spark.sql.functions.col
    val quantized = emb.select(col("vec_id"),
      dequantizeInt8(quantizeInt8(col("embedding"))).as("embedding"))
    val qTop = Knn.bruteForceTopK(quantized, quantized.filter(col("vec_id") < 5), k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = Knn.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (qTop intersect exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"quantized recall $recall")
  }

  test("ivfTopK with nProbe=2 of 4 keeps reasonable recall") {
    val centroids = Knn.trainCentroids(emb, nCentroids = 4, iters = 1)
    val ivf = Knn.ivfTopK(emb, queries, centroids, k = 5, nProbe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val bf = Knn.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (ivf intersect bf).size.toDouble / bf.size
    assert(recall >= 0.3, s"recall $recall")
  }

  test("sampled centroid training keeps recall at a fraction of the cost") {
    // coarse quantizers need the density shape, not every vector: train
    // on a deterministic 30% hash-sample, search with the full corpus
    val sampled = Knn.trainCentroids(emb, nCentroids = 4, iters = 1,
      sampleFraction = 0.3)
    assert(sampled.nonEmpty)
    val ivf = Knn.ivfTopK(emb, queries, sampled, k = 5, nProbe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val bf = Knn.bruteForceTopK(emb, queries, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (ivf intersect bf).size.toDouble / bf.size
    assert(recall >= 0.3, s"recall $recall")
    // training is reproducible: the hash-sample is partitioning-stable
    val again = Knn.trainCentroids(emb, nCentroids = 4, iters = 1,
      sampleFraction = 0.3)
    assert(sampled.map(_._2.toSeq) === again.map(_._2.toSeq))
  }

  test("embedding drift: twin slices score near zero, a shifted slice alarms") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(19)
    def cloud(n: Int, offset: Float, base: Long) = (1 to n).map { i =>
      (base + i.toLong, Array.fill(8)(rnd.nextFloat() + offset))
    }.toDF("vec_id", "embedding")
    val ref = cloud(400, 0f, 0L)
    val same = cloud(400, 0f, 10000L)   // fresh draw, same distribution
    val moved = cloud(400, 3f, 20000L)  // shifted cloud
    val cents = Knn.trainCentroids(ref, nCentroids = 8, iters = 2)
    def counts(d: org.apache.spark.sql.DataFrame, nm: String) =
      Knn.assign(d, cents)
        .groupBy(col("centroid_id").cast("long").as("bucket"))
        .agg(count(lit(1)).as(nm))
    def psi(cur: org.apache.spark.sql.DataFrame) =
      graft.operators.Drift.psiFromCounts(
          counts(ref, "n_old"), counts(cur, "n_new"), 8)
        .agg(sum("psi_ppm")).head().getLong(0)
    val twin = psi(same)
    val alarm = psi(moved)
    assert(twin < 100000L, s"twin slices drifted: $twin ppm")
    assert(alarm > 500000L, s"shifted cloud should alarm: $alarm ppm")
  }

  test("trained centroids are bit-identical across partitionings") {
    // the quantized-Lloyd contract: the mean update sums exact
    // fixed-point longs, so task order / partition count cannot move a
    // single bit — a plain avg() double sum fails this on a wide input
    // (and DID fail it: this was the trio's rows-only reason through
    // round 8). Float bits compared exactly, not approximately.
    val a = Knn.trainCentroids(emb.repartition(1), nCentroids = 8, iters = 2)
    val b = Knn.trainCentroids(emb.repartition(17, col("vec_id")), nCentroids = 8, iters = 2)
    assert(a.length === b.length)
    a.zip(b).foreach { case ((ca, va), (cb, vb)) =>
      assert(ca === cb)
      assert(va.map(java.lang.Float.floatToIntBits)
        .sameElements(vb.map(java.lang.Float.floatToIntBits)),
        s"centroid $ca drifted across partitionings")
    }
  }
}
