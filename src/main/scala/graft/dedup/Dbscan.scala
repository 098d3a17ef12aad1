package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DBSCAN (Ester, Kriegel, Sander & Xu, KDD 1996) over the embedding
  * near-duplicate graph — density-based cluster discovery for the
  * near-dup tier: dense paraphrase families become clusters, chains of
  * borderline pairs attach as borders, and one-off embeddings stay
  * NOISE instead of being glued into a component the way plain
  * connected components ([[Clusters.canonicalize]]) would glue them.
  * That noise/core distinction is DBSCAN's whole point for curation: a
  * transitive closure over a near-dup graph merges everything a chain
  * touches; density gating keeps only regions that are actually dense.
  *
  * The eps-neighborhood is DEFINED as the [[NearDup.embeddingPairs]]
  * graph (sign-chunk candidates verified by cosine ≥ minCosine) — the
  * same honest contract as q_embed_neardup: the oracle replays the
  * chunk semantics verbatim, so no recall assumption hides in the
  * compare. |N(v)| counts v itself (the textbook convention), so
  * `core ⟺ degree + 1 ≥ minPts`.
  *
  * Determinism: cluster labels are component-minimum core ids
  * (the [[Clusters]] canonical rule); a border point adjacent to
  * multiple clusters takes the SMALLEST label (the textbook's
  * "first-found" tie made a total order). Roles and labels are a pure
  * function of the data.
  *
  * Scale shape: the pair stage is the bucketed LSH machine (never
  * all-pairs); degree/core are one keyed aggregate; components run
  * [[Clusters.canonicalize]] (driver union-find under the measured
  * 1M-edge gate, distributed pointer-jumping above it); border
  * assignment is one join + keyed min. No stage is quadratic in the
  * corpus.
  */
object Dbscan {

  /** One row per input id: (id, role ∈ core|border|noise, cluster_id —
    * NULL for noise).
    */
  def cluster(emb: DataFrame, idCol: String, vecCol: String,
              minCosine: Double, minPts: Int, nBits: Int = 32): DataFrame = {
    require(minPts >= 2, "minPts >= 2 (minPts = 1 makes every point core)")
    val ids = emb.filter(col(vecCol).isNotNull).select(col(idCol).as("id"))
    val pairs = NearDup.embeddingPairs(emb, idCol, vecCol, minCosine, nBits)
      .select(col("id_a"), col("id_b")).persist()
    try {
      val sym = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
        .unionAll(pairs.select(col("id_b").as("a"), col("id_a").as("b")))
      val core = sym.groupBy(col("a").as("id")).agg(count(lit(1)).as("__deg"))
        .filter(col("__deg") + 1 >= minPts).select("id")
      val coreEdges = pairs
        .join(core.withColumnRenamed("id", "id_a"), Seq("id_a"))
        .join(core.withColumnRenamed("id", "id_b"), Seq("id_b"))
      // canonicalize returns a persisted frame the caller must free
      // (its Scaladoc contract) — keep the raw handle so unpersist
      // matches the persisted plan, not the renamed one.
      val canon = Clusters.canonicalize(core, coreEdges)
      val labels = canon.withColumnRenamed("canonical_id", "cluster_id")
      // border: non-core adjacent to >= 1 core; smallest adjacent label
      val borders = sym
        .join(core.withColumnRenamed("id", "a"), Seq("a"), "left_anti")
        .join(labels.withColumnRenamed("id", "b"), Seq("b"))
        .groupBy(col("a").as("id"))
        .agg(min(col("cluster_id")).as("cluster_id"))
      val out = labels.withColumn("role", lit("core"))
        .unionByName(borders.withColumn("role", lit("border")))
      val result = ids.join(out, Seq("id"), "left_outer")
        .select(col("id"), coalesce(col("role"), lit("noise")).as("role"),
          col("cluster_id"))
        .localCheckpoint(true)
      // the checkpointed result no longer depends on the labels mapping:
      // free its cached blocks now instead of leaking them for the session
      canon.unpersist()
      result
    } finally pairs.unpersist()
  }
}
