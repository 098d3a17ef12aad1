package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Residual vector quantization (Chen, Guan & Wang, "Approximate
  * nearest neighbor search by residual vector quantization", Sensors
  * 2010; the additive-codebook family of Babenko & Lempitsky, CVPR
  * 2014) — the published rung BETWEEN the float IVF index and IVF-PQ's
  * subspace codes: quantize each vector's residual from its coarse
  * centroid with ONE full-dimension codebook instead of `m` per-subspace
  * ones. The reconstruction is c₁ + c₂ (two codebook entries), the
  * stored index row is two small ints, and — unlike PQ — the second
  * codebook sees the residual's full covariance structure (PQ's subspace
  * independence assumption is RQ's motivating critique).
  *
  * Search (the IVFADC shape, [[Pq.ivfpqTopK]]'s contract): a query
  * probes `nProbe` coarse buckets; per (query, bucket) the FULL distance
  * table over the K₂ second-stage entries is precomputed —
  * ‖q − c₁ − c₂‖² = ‖(q − c₁) − c₂‖², one `floor(2¹⁶·d²)` long per
  * entry, exact-integer and engine-replayable like the PQ LUT — and each
  * candidate costs ONE map lookup by its stage-2 code (PQ needs m).
  *
  * Exactness chain (all established machinery): both codebooks train
  * with the bit-deterministic quantized Lloyd ([[Knn.trainCentroids]] —
  * the stage-2 book is literally `trainCentroids` on
  * [[Pq.residualFrame]]); residuals are exact float narrowings; the LUT
  * subtraction (double(r_d) − double(c_d)) is one correctly-rounded IEEE
  * op per dim in a pinned order — so the DuckDB oracle replays the whole
  * pipeline: coarse Lloyd → residuals → stage-2 Lloyd → codes → probes →
  * LUT → integer top-k.
  *
  * Depth note: the published method stacks further stages; a third
  * stage's cross term ⟨c₂,c₃⟩ breaks the per-stage LUT (an exact pair
  * LUT is K₂·K₃ — fine for small books — or score by reconstruction).
  * Two stages are the memory rung this corpus needs; the contract for
  * deeper stacks is documented rather than half-built.
  */
object Rq {

  /** Stage-2 codebook: the quantized Lloyd on the coarse residuals.
    * `sampleFraction` is the 100 TB knob shared with the coarse
    * quantizer — codebooks need the residual density's shape, not the
    * corpus.
    */
  def trainBook(corpus: DataFrame, coarse: Knn.Centroids, k: Int,
                iters: Int = 1, sampleFraction: Double = 1.0): Knn.Centroids =
    Knn.trainCentroids(Pq.residualFrame(corpus, coarse), k, iters, sampleFraction)

  /** The corpus encoded for the RQ index: `(vec_id, centroid_id, code)`
    * — a coarse bucket plus ONE stage-2 entry id. Pure map over the
    * corpus (assign → residual → argmin), zero shuffle, float column
    * dropped.
    */
  def encodeCorpus(corpus: DataFrame, coarse: Knn.Centroids,
                   book: Knn.Centroids): DataFrame =
    Knn.withAssignment(corpus.filter(col("embedding").isNotNull), coarse)
      .select(col("vec_id"), col("centroid_id"),
        array_min(Knn.centroidScores(
          Pq.residualExpr(col("embedding"), col("centroid_id"), coarse), book))
          .getField("col2").as("code"))

  /** RQ top-k: probe `nProbe` coarse buckets per query, score every
    * candidate with one lookup into the per-(query, bucket) distance
    * table over the stage-2 book, keep the k smallest integer distances
    * (ties by vec_id).
    *
    * Scale shape: corpus side = the zero-shuffle encode; probe side =
    * queries × nProbe rows carrying K₂ longs each — broadcast; one
    * window per query id caps the result, candidates bounded by the
    * probed buckets (the [[Knn.ivfTopK]] contract).
    */
  def rqTopK(corpus: DataFrame, queries: DataFrame, coarse: Knn.Centroids,
             book: Knn.Centroids, k: Int, nProbe: Int = 2): DataFrame = {
    val encoded = encodeCorpus(corpus, coarse, book)

    val probeIds = (vec: Column) =>
      slice(transform(array_sort(Knn.centroidScores(vec, coarse)),
        s => s.getField("col2")), 1, nProbe)
    val bVecs = typedlit(book.map(_._2.toSeq).toSeq)
    val bIds = typedlit(book.map(_._1).toSeq)
    val sqDist = (a: Column, b: Column) =>
      aggregate(zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }), lit(0.0), (acc, v) => acc + v)
    val probes = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        explode(probeIds(col("embedding"))).as("centroid_id"))
      .select(col("query_id"), col("centroid_id"),
        map_from_arrays(bIds, {
          val qr = Pq.residualExpr(col("q_emb"), col("centroid_id"), coarse)
          transform(sequence(lit(1), lit(book.length)), j =>
            floor(lit(65536.0) * sqDist(qr, element_at(bVecs, j))).cast("long"))
        }).as("lut"))

    val w = Window.partitionBy(col("query_id")).orderBy(col("rq_dist"), col("vec_id"))
    encoded.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("rq_dist", element_at(col("lut"), col("code")))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rq_dist"))
  }
}
