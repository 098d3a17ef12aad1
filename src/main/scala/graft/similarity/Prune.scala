package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Data pruning by PROTOTYPICALITY (Sorscher, Geirhos, Shekhar,
  * Ganguli & Morcos, NeurIPS 2022 "Beyond neural scaling laws"): rank
  * every example by its squared distance to its trained k-means
  * centroid and keep a per-cell fraction — keep the HARDEST (far from
  * the prototype) when data is abundant, the EASIEST (prototypical)
  * when data is scarce. The published self-supervised pruning metric,
  * and the missing selection rung between the dedup tier (removes
  * copies) and the mixture tier (reweights sources): this one removes
  * REDUNDANCY AROUND PROTOTYPES.
  *
  * Scale shape: centroid assignment and the distance are the same
  * literal-folded pure map as [[Knn]] search (zero shuffle, zero join);
  * the per-cell rank is ONE keyed window (cells are the partition — the
  * same key the IVF index is laid out on); the keep threshold needs the
  * cell size, one nCentroids-row broadcast. Nothing global, nothing
  * driver-side beyond the tiny centroid table.
  *
  * Determinism / replayability: with [[Knn.trainCentroids]]' quantized
  * Lloyd the centroids are bit-stable, dist² = ‖v‖² + (−2·v·c + ‖c‖²)
  * is two sequential double folds plus one add (exactly the replayable
  * q_ann_recall arithmetic), ranks tie-break by id, and the keep count
  * is integer floor arithmetic (`n·keepBp DIV 10000`, min 1) — the
  * whole operator replays in SQL (q_prototype_prune).
  */
object Prune {

  /** Per-example prototypicality ranks and the keep decision.
    *
    * Output: (vec_id, centroid_id, dist2, cell_n, drank, kept) — every
    * input row, flagged rather than filtered, so callers can audit the
    * boundary; filter on `kept` to materialize the pruned corpus.
    *
    * @param keepBp      kept fraction per cell in basis points (exact
    *                    integer contract — never a float fraction)
    * @param keepHardest true = keep the farthest-from-prototype rows
    *                    (the abundant-data regime in the paper);
    *                    false = keep the most prototypical
    * @param idCol       the example id column (rank tie-break + output)
    */
  def byPrototypicality(emb: DataFrame, vecCol: String,
                        centroids: Knn.Centroids, keepBp: Int,
                        keepHardest: Boolean, idCol: String = "vec_id"): DataFrame = {
    require(keepBp > 0 && keepBp <= 10000, s"keepBp in (0,10000], got $keepBp")
    require(centroids.nonEmpty, "byPrototypicality needs trained centroids")
    // assignment keeps its score: (−2·v·c + ‖c‖², cid) min-struct — the
    // same expression Knn.assign uses, plus ‖v‖² to complete dist²
    val best = array_min(Knn.centroidScores(col(vecCol), centroids))
    val withCell = emb
      .withColumn("__best", best)
      .withColumn("centroid_id", col("__best").getField("col2"))
      .withColumn("dist2",
        VectorFunctions.dot(col(vecCol), col(vecCol)) + col("__best").getField("col1"))
      .drop("__best")
    val cellW = Window.partitionBy(col("centroid_id"))
    val rankOrder: Seq[Column] =
      if (keepHardest) Seq(col("dist2").desc, col(idCol))
      else Seq(col("dist2").asc, col(idCol))
    withCell
      .withColumn("cell_n", count(lit(1)).over(cellW))
      .withColumn("drank",
        row_number().over(cellW.orderBy(rankOrder: _*)).cast("long"))
      .withColumn("kept",
        col("drank") <= greatest(lit(1L),
          expr(s"cell_n * $keepBp DIV 10000")))
      .select(col(idCol), col("centroid_id").cast("long").as("centroid_id"),
        col("dist2"), col("cell_n"), col("drank"), col("kept"))
  }
}
