package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate cluster canonicalization.
  *
  * LSH pipelines emit PAIRS; a training-data dedup job needs CLUSTERS —
  * each connected component of the pair graph keeps one canonical
  * representative (min id) and drops the rest. Min-label propagation over
  * the edge list: every round each node adopts the smallest label in its
  * neighborhood; converges in O(component diameter) rounds, and near-dup
  * components are shallow by construction (they are cliques-ish around a
  * shared template). Each round is one shuffle of the edge join; labels
  * persisted per round, convergence checked with an observable count.
  */
object Clusters {

  /** (id, canonical_id) for every id in `ids`; singletons map to
    * themselves.
    *
    * @param ids   one column `id`
    * @param pairs columns `id_a`, `id_b`
    */
  def canonicalize(ids: DataFrame, pairs: DataFrame, maxIters: Int = 10): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist()
    var labels = ids.select(col("id"), col("id").as("label")).persist()
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIters) {
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("label").as("dlabel")), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("dlabel")).as("nlabel"))
      val next = labels.join(nbrMin, Seq("id"), "left_outer")
        .select(col("id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .persist()
      changed = next.join(labels.withColumnRenamed("label", "__old"), Seq("id"))
        .filter(col("label") =!= col("__old")).count()
      labels.unpersist()
      labels = next
      iter += 1
    }
    edges.unpersist()
    labels.withColumnRenamed("label", "canonical_id")
  }

  /** Convenience: ids to DROP (non-canonical members of some cluster). */
  def duplicates(ids: DataFrame, pairs: DataFrame, maxIters: Int = 10): DataFrame =
    canonicalize(ids, pairs, maxIters).filter(col("id") =!= col("canonical_id"))
}
