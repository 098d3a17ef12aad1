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
    // both directions from ONE pass over pairs (a union of two selects
    // would compute the — possibly expensive — pair lineage twice when
    // the persist materializes)
    val edges = pairs.select(explode(expr(
        "array(named_struct('src', id_a, 'dst', id_b), " +
          "named_struct('src', id_b, 'dst', id_a))")).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .persist()
    // propagate ONLY over nodes that touch an edge — every other id is
    // trivially its own canonical. The loop's state is ∝ |edge nodes|
    // (the near-dup minority), not |corpus|: at 100 TB that's the
    // difference between iterating over a pair table and re-shuffling
    // the whole corpus id set every round.
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).persist()
    var iter = 0
    // labels only ever decrease, so sum(label) is strictly monotone until
    // the fixpoint — one cheap aggregate per round instead of a
    // join-and-compare convergence check
    var prevSum = Option.empty[Long]
    var converged = false
    while (!converged && iter < maxIters) {
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("label").as("dlabel")), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("dlabel")).as("nlabel"))
      val next = labels.join(nbrMin, Seq("id"), "left_outer")
        .select(col("id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .persist()
      val s = next.agg(sum(col("label"))).head.getLong(0)
      converged = prevSum.contains(s)
      prevSum = Some(s)
      labels.unpersist()
      labels = next
      iter += 1
    }
    edges.unpersist()
    ids.join(labels, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("label"), col("id")).as("canonical_id"))
  }

  /** Convenience: ids to DROP (non-canonical members of some cluster). */
  def duplicates(ids: DataFrame, pairs: DataFrame, maxIters: Int = 10): DataFrame =
    canonicalize(ids, pairs, maxIters).filter(col("id") =!= col("canonical_id"))
}
