package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Clusters
import graft.functions.VectorFunctions

/** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic deduplication
  * of an embedding corpus by clustering first and comparing pairs ONLY
  * within a cluster — the published recipe that made embedding-level
  * dedup tractable for LAION/C4-scale training data.
  *
  * Relationship to the rest of the dedup family: [[graft.dedup.NearDup]]
  * buckets by random-hyperplane signature (recall tied to bit
  * agreement), SemDeDup buckets by LEARNED density (k-means cells), so
  * it catches paraphrase-tier duplicates whose signatures disagree —
  * at the cost of missing pairs that straddle a cell boundary (the
  * published tradeoff; recall is tuned by nCentroids).
  *
  * Scale shape, stage by stage:
  *  - centroid assignment is [[Knn.withAssignment]] — a pure map over
  *    the corpus (the centroid table is literal-folded), zero shuffle.
  *  - the within-cell pair join shuffles BOTH sides once on
  *    `centroid_id`; per-cell work is O(|cell|²), which is the
  *    algorithm's contract — nCentroids ≈ N/targetCellSize keeps cells
  *    bounded, and a `maxClusterSize` guard raises a NAMED error (cell
  *    id + size) instead of silently burning a quadratic task when the
  *    centroids collapsed (the all-zero-vector corpus failure mode).
  *  - duplicate groups close transitively through
  *    [[Clusters.canonicalize]] (pointer-jumping union-find, loud
  *    non-convergence), exactly like the MinHash family — one shared
  *    component-closure engine for every dedup flavor.
  *
  * Output: (id, canonical_id) for EVERY corpus id — `id ==
  * canonical_id` marks the kept representative (the minimum id of its
  * duplicate group; deterministic).
  */
object SemDedup {

  /** `emb` must carry (vec_id, embedding) — the Knn family convention.
    * `minCosine` is the near-duplicate threshold (cosine rounded to 4
    * decimals, matching [[Knn.bruteForceTopK]]'s cross-engine contract).
    */
  def dedup(emb: DataFrame, centroids: Knn.Centroids, minCosine: Double,
            maxClusterSize: Long = 100000L): DataFrame = {
    require(minCosine > 0 && minCosine <= 1, s"bad minCosine $minCosine")
    require(maxClusterSize > 1, s"bad maxClusterSize $maxClusterSize")
    val assigned = Knn.withAssignment(emb, centroids)
      .select(col("vec_id"), col("embedding"), col("centroid_id"))

    // cell-size guard: the counts frame is nCentroids rows; the check
    // rides INTO the join key expression so it cannot be pruned away
    val sizes = assigned.groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("__cell_n"))
    val guardedCell = when(col("__cell_n") <= lit(maxClusterSize), col("centroid_id"))
      .otherwise(raise_error(concat(
        lit("semdedup: cluster "), col("centroid_id").cast("string"),
        lit(" holds "), col("__cell_n").cast("string"),
        lit(s" vectors (> $maxClusterSize) — raise nCentroids so cells "),
        lit("stay bounded, or raise maxClusterSize"))).cast("int"))
    val bounded = assigned.join(sizes, Seq("centroid_id"))
      .select(col("vec_id"), col("embedding"), guardedCell.as("centroid_id"))

    val l = bounded.select(col("centroid_id"), col("vec_id").as("id_a"),
      col("embedding").as("__va"))
    val r = bounded.select(col("centroid_id"), col("vec_id").as("id_b"),
      col("embedding").as("__vb"))
    val pairs = l.join(r, Seq("centroid_id"))
      .filter(col("id_a") < col("id_b"))
      .filter(round(VectorFunctions.cosine(col("__va"), col("__vb")), 4)
        >= minCosine)
      .select(col("id_a"), col("id_b"))

    Clusters.canonicalize(emb.select(col("vec_id").as("id")), pairs)
  }
}
