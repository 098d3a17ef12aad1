package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Approximate/exact nearest-neighbor search over an `array<float>`
  * embedding column.
  *
  * Brute force is the correctness baseline: broadcast the (small) query
  * set, one scan of the corpus, per-query top-k via window — no corpus
  * self-join, no driver collect. IVF is the scale path: assign every
  * vector to its nearest coarse centroid (broadcast centroids, map-side),
  * store bucketed; queries probe only `nProbe` buckets, so a 100 TB
  * corpus scan becomes an `nProbe/nCentroids` partial scan, and the
  * bucket id is a partition-prunable column when persisted.
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

  /** Deterministic coarse centroids: seed = every (n/nCentroids)-th
    * vector by id order, then `iters` Lloyd rounds, all as DataFrame ops
    * (assignment is a broadcast-join argmin, update a groupBy avg — no
    * driver-side math over the corpus).
    */
  def trainCentroids(corpus: DataFrame, nCentroids: Int, iters: Int = 2): DataFrame = {
    val n = corpus.count()
    val step = math.max(1L, n / nCentroids)
    var centroids = corpus
      .filter(col("vec_id") % step === 0).orderBy(col("vec_id")).limit(nCentroids)
      .select(row_number().over(Window.orderBy(col("vec_id"))).cast("int").as("centroid_id"),
        col("embedding").as("centroid"))
    for (_ <- 1 to iters) {
      val assigned = assign(corpus, centroids)
      centroids = assigned.join(corpus, Seq("vec_id"))
        .select(col("centroid_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("centroid_id"), col("dim"))
        .agg(avg(col("v")).as("m"))
        .groupBy(col("centroid_id"))
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
          s => s.getField("m").cast("float")).as("centroid"))
    }
    centroids
  }

  /** (vec_id, centroid_id) assignment: argmin L2 over broadcast centroids. */
  def assign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id")).orderBy(col("__dist"), col("centroid_id"))
    corpus.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(centroids))
      .withColumn("__dist",
        VectorFunctions.dot(col("embedding"), col("embedding"))
          - lit(2.0) * VectorFunctions.dot(col("embedding"), col("centroid"))
          + VectorFunctions.dot(col("centroid"), col("centroid")))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col("vec_id"), col("centroid_id"))
  }

  /** IVF top-k: probe the `nProbe` nearest centroid buckets per query,
    * exact cosine within the probed buckets only.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
              k: Int, nProbe: Int = 2): DataFrame = {
    val bucketed = corpus.join(assign(corpus, centroids), Seq("vec_id"))

    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val probeW = Window.partitionBy(col("query_id")).orderBy(col("__dist"), col("centroid_id"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("__dist",
        VectorFunctions.dot(col("q_emb"), col("q_emb"))
          - lit(2.0) * VectorFunctions.dot(col("q_emb"), col("centroid"))
          + VectorFunctions.dot(col("centroid"), col("centroid")))
      .withColumn("__rk", row_number().over(probeW))
      .filter(col("__rk") <= nProbe)
      .select(col("query_id"), col("q_emb"), col("centroid_id"))

    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("vec_id"))
    bucketed.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim", round(VectorFunctions.cosine(col("q_emb"), col("embedding")), 4))
      .withColumn("__rk2", row_number().over(w))
      .filter(col("__rk2") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos_sim"))
  }
}
