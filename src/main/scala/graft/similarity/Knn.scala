package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Approximate/exact nearest-neighbor search over an `array<float>`
  * embedding column.
  *
  * Brute force is the correctness baseline: broadcast the (small) query
  * set, one scan of the corpus, per-query top-k via window — no corpus
  * self-join, no driver collect. IVF is the scale path: the coarse
  * centroid table is tiny BY CONSTRUCTION (hundreds of rows), so it is
  * collected once and folded into a literal expression — centroid
  * assignment is then a pure map over the corpus (zero shuffle, zero
  * join), and the bucket id becomes a partition-prunable column when the
  * index is persisted. Queries probe only `nProbe` buckets, turning a
  * full scan into an nProbe/nCentroids partial scan.
  */
object Knn {

  /** Exact top-k cosine neighbors for each query vector. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val pairs = corpus.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim", round(VectorFunctions.cosine(col("q_emb"), col("embedding")), 4))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    pairs.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos_sim"))
  }

  /** Local centroid table: (centroid_id, vector). Tiny by construction. */
  type Centroids = Array[(Int, Array[Float])]

  /** `argmin_c ||v - c||²` as a pure map expression: one struct per
    * centroid (squared L2 distance, id), `array_min` picks the smallest
    * with deterministic id tie-break. ||v||² is constant per row and
    * dropped: argmin needs only `-2·v·c + ||c||²` (the ||c||² term is
    * precomputed on the driver).
    */
  /** (distance², id) structs for every centroid, as a CONSTANT-SIZE
    * expression tree: the centroid matrix travels as three array
    * literals and the scoring loop is a higher-order `transform`, so
    * codegen cost does not grow with nCentroids×dim (an unrolled
    * per-centroid expression took seconds of janino compilation per
    * action at 8×64 already).
    */
  private[similarity] def centroidScores(vec: Column, cents: Centroids): Column = {
    val cVecs = typedlit(cents.map(_._2.toSeq).toSeq)
    val cIds = typedlit(cents.map(_._1).toSeq)
    val cNorm2 = typedlit(cents.map(_._2.map(x => x.toDouble * x.toDouble).sum).toSeq)
    transform(sequence(lit(1), lit(cents.length)), j =>
      struct(lit(-2.0) * VectorFunctions.dot(vec, element_at(cVecs, j))
          + element_at(cNorm2, j),
        element_at(cIds, j)))
  }

  private def nearestCentroid(vec: Column, cents: Centroids): Column =
    // array of struct normalizes field names to col1/col2
    array_min(centroidScores(vec, cents)).getField("col2")

  /** Deterministic coarse centroids: seed = every (n/nCentroids)-th
    * vector by id order, then `iters` Lloyd rounds. Assignment is the
    * map-side expression above; the mean update is one shuffle of
    * (centroid, dim) partial sums; the tiny result is collected per round.
    *
    * The mean update is BIT-DETERMINISTIC: each value is quantized to
    * 1/65536 fixed point (`floor(v·2^16)` — exact, the float→double
    * scaling is a power of two) and summed as exact longs, so the sum
    * is independent of partition count and task-completion order; the
    * centroid dim is then ONE correctly-rounded IEEE division
    * (sum/(2^16·n)) narrowed to float. A plain `avg(v)` double sum
    * re-associates per run — on a 1000-executor retrain the trained
    * centroids (and every downstream bucket assignment) would drift
    * run-to-run on identical data; quantized Lloyd pins them, at a
    * centroid perturbation ≤ 2⁻¹⁶ per dim that a COARSE quantizer
    * cannot observe (KnnSpec's recall bound is unchanged). It is also
    * what makes the trained-centroid queries exactly replayable by the
    * DuckDB oracle (q_ann_ivf / q_semantic_dedup / q_embedding_drift).
    * Overflow headroom: |floor(v·2^16)| ≤ 2^16·|v|, so for unit-scale
    * embeddings the per-(centroid,dim) long sum is safe past 10^13
    * assigned vectors — no realistic cell size approaches it.
    *
    * `sampleFraction` < 1 trains on a deterministic hash-sample of the
    * corpus — at 100 TB the centroids converge on ~1% of the data for
    * ~1% of the cost (coarse quantizers only need the density shape;
    * KnnSpec measures recall at 0.3). Sampling is hash-of-id, so the
    * training set is reproducible across runs and partitionings.
    */
  def trainCentroids(corpus: DataFrame, nCentroids: Int, iters: Int = 2,
                     sampleFraction: Double = 1.0): Centroids = {
    require(sampleFraction > 0 && sampleFraction <= 1)
    // null embeddings are excluded from training like every other
    // assignment surface: an unfiltered count() would skew the seed
    // stride and a null seed row would NPE at collect
    val nonNull = corpus.filter(col("embedding").isNotNull)
    val train = (if (sampleFraction >= 1.0) nonNull
      else nonNull.filter(
        pmod(xxhash64(col("vec_id")), lit(1000000L)) < (sampleFraction * 1000000L).toLong))
      .persist()
    try trainCentroidsImpl(train, nCentroids, iters)
    finally train.unpersist()
  }

  private def trainCentroidsImpl(corpus: DataFrame, nCentroids: Int,
                                 iters: Int): Centroids = {
    val n = corpus.count()
    val step = math.max(1L, n / nCentroids)
    var centroids: Centroids = corpus
      .filter(col("vec_id") % step === 0).orderBy(col("vec_id")).limit(nCentroids)
      .select(col("vec_id"), col("embedding")).collect()
      .sortBy(_.getLong(0)).zipWithIndex
      .map { case (r, i) => (i + 1, r.getSeq[Float](1).toArray) }
    for (_ <- 1 to iters) {
      centroids = corpus
        // assignment in its own projection BELOW the explode — in one
        // select with posexplode it would land above the Generate node
        // and re-score every vector once per exploded dimension
        .select(nearestCentroid(col("embedding"), centroids).as("centroid_id"),
          col("embedding"))
        .select(col("centroid_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("centroid_id"), col("dim"))
        .agg(sum(floor(col("v") * lit(65536.0)).cast("long")).as("sq"),
          count(lit(1)).as("n"))
        .collect()
        .groupBy(_.getInt(0)).toArray
        .map { case (cid, rows) =>
          (cid, rows.sortBy(_.getInt(1))
            .map(r => (r.getLong(2).toDouble / (65536.0 * r.getLong(3))).toFloat))
        }.sortBy(_._1)
    }
    centroids
  }

  /** (vec_id, centroid_id) assignment — pure map, no shuffle. A null
    * embedding has no bucket and is EXCLUDED (unfiltered, its null
    * scores make `array_min` pick centroid 1 — a garbage assignment
    * that pollutes bucket counts and the persisted index).
    */
  def assign(corpus: DataFrame, centroids: Centroids): DataFrame =
    corpus.filter(col("embedding").isNotNull).select(col("vec_id"),
      nearestCentroid(col("embedding"), centroids).as("centroid_id"))

  /** The corpus with a `centroid_id` column appended — [[assign]] keeping
    * every caller column (SemDedup needs the vector riding along with its
    * bucket). Still a pure map: no shuffle, no join. Null embeddings
    * excluded, as in [[assign]].
    */
  def withAssignment(corpus: DataFrame, centroids: Centroids): DataFrame =
    corpus.filter(col("embedding").isNotNull).withColumn("centroid_id",
      nearestCentroid(col("embedding"), centroids))

  /** Persist the IVF index: corpus written as parquet partitioned by
    * centroid bucket. Probing then reads ONLY the probed buckets'
    * directories — partition pruning at the filesystem level, the layout
    * that turns a 100 TB index scan into an nProbe/nCentroids directory
    * read.
    */
  def writeIndex(corpus: DataFrame, centroids: Centroids, path: String): Unit =
    graft.sources.Sink.writePartitioned(
      withAssignment(corpus, centroids), path, Seq("centroid_id"))

  /** Top-k against a persisted index: bucket filter prunes partitions. */
  def searchIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                  queries: DataFrame, centroids: Centroids, k: Int,
                  nProbe: Int = 2): DataFrame =
    ivfTopKImpl(spark.read.parquet(path), queries, centroids, k, nProbe,
      preBucketed = true)

  /** IVF top-k: probe the `nProbe` nearest centroid buckets per query,
    * exact cosine within the probed buckets only.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: Centroids,
              k: Int, nProbe: Int = 2): DataFrame =
    ivfTopKImpl(corpus, queries, centroids, k, nProbe, preBucketed = false)

  private def ivfTopKImpl(corpus: DataFrame, queries: DataFrame, centroids: Centroids,
                          k: Int, nProbe: Int, preBucketed: Boolean): DataFrame = {
    // withAssignment (not a bare withColumn) so null embeddings are
    // excluded here too — unfiltered, the null centroid scores make
    // array_min pick bucket 1 and a null-cos_sim row can surface as a
    // neighbor (the contract NullRobustnessSpec pins for the PQ path).
    val bucketed = if (preBucketed) corpus
      else withAssignment(corpus, centroids)

    // nProbe nearest centroids per query — computed the same map-side way,
    // one exploded row per probed bucket.
    val probeIds = (vec: Column) =>
      slice(transform(array_sort(centroidScores(vec, centroids)),
        s => s.getField("col2")), 1, nProbe)
    val probes = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        explode(probeIds(col("embedding"))).as("centroid_id"))

    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    bucketed.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim", round(VectorFunctions.cosine(col("q_emb"), col("embedding")), 4))
      .withColumn("__rk2", row_number().over(w))
      .filter(col("__rk2") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos_sim"))
  }
}
