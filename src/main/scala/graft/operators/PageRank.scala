package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point integer PageRank (Page et al. 1999) over a weighted
  * directed edge list — graph-authority scoring for the curation jobs
  * that need it (crawl-frontier prioritization, co-purchase influence,
  * near-dup-graph centrality) beyond the reachability family the engine
  * already has (Hierarchy.closure = transitive reach, Clusters = union
  * find; neither ranks).
  *
  * EXACT-INTEGER determinism: float PageRank is summation-order-
  * dependent (a shuffle reduce adds contributions in nondeterministic
  * order), so ranks here are BIGINT micro-units (initial rank = 10⁶)
  * and every per-edge contribution is the pinned integer form
  * `(((pr·w) div out_w)·85) div 100` — integer sums are associative, so
  * the result is bit-identical across partitionings, retries, and
  * engines (the DuckDB oracle replays the iterations verbatim). The
  * double floor-div is the DEFINITION here, not an approximation of a
  * float formula. Damping 0.85 ⇒ per-node base 150 000; dangling-node
  * mass is dropped (the common simplification — documented, replayed
  * identically by the oracle).
  *
  * Scale shape per iteration: one hash join pr⨝edges on src (pr is
  * node-sized — AQE broadcasts it when dims allow; at web scale both
  * sides shuffle on src once) + one keyed aggregate on dst + a left
  * join back to the node list. Iterations are lineage-checkpointed and
  * superseded rounds freed eagerly (the Hierarchy.closure idiom).
  *
  * Overflow contract: pr·w must stay < 2⁶³ — pr is bounded by
  * scale·(1 + 0.85·maxInDegreeShare·nNodes), so nodes·scale·maxWeight
  * ≲ 9·10¹⁸ holds for billions of nodes at moderate edge weights; trim
  * degenerate hub weights first if beyond.
  */
object PageRank {

  /** `edges`: (src long, dst long, weight long > 0). Returns
    * (node, pr) for every node appearing as src or dst, after `iters`
    * damped rounds from a flat start of `scale` micro-units.
    *
    * Lineage policy: rounds run UNCHECKPOINTED up to
    * `checkpointInterval` deep — the final action then sees the
    * edges/nodes subtrees several times and `ReusedExchange` evaluates
    * each ONCE, which beats paying a blocking materialization per round
    * (measured: 3 checkpointed rounds 3.7 s vs 1.2 s fused at
    * 520k edges). Past the interval the round is localCheckpoint'ed and
    * the superseded one freed (the Hierarchy idiom) — long walks get
    * bounded plans, short walks get fused ones.
    */
  def rank(edges: DataFrame, iters: Int = 3, scale: Long = 1000000L,
           checkpointInterval: Int = 4): DataFrame =
    run(edges, None, iters, scale, checkpointInterval)

  /** Personalized PageRank (random walk with restart to the SEED set):
    * the teleport mass lands only on `seeds` ("node" column) instead of
    * everywhere, so scores measure proximity TO the seeds — the graph
    * recommender primitive ("parts related to this brand"). Same exact
    * integer recurrence and lineage policy; the walk starts at the
    * seeds (non-seeds at 0) and non-seed teleport is 0.
    */
  def personalizedRank(edges: DataFrame, seeds: DataFrame, iters: Int = 3,
                       scale: Long = 1000000L,
                       checkpointInterval: Int = 4): DataFrame =
    run(edges, Some(seeds), iters, scale, checkpointInterval)

  private def run(edges: DataFrame, seeds: Option[DataFrame], iters: Int,
                  scale: Long, checkpointInterval: Int): DataFrame = {
    require(iters >= 1 && iters <= 50, "iters must be in [1, 50]")
    require(checkpointInterval >= 1, "checkpointInterval must be >= 1")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"),
      col("weight").cast("long"))
    val outW = e.groupBy(col("src")).agg(sum(col("weight")).as("__ow"))
    val ew = e.join(outW, Seq("src"))
    val base = scale - (scale * 85L) / 100L // (1-d)·scale in micro-units
    val allNodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    // per-node teleport: uniform for global PR, seed-only for PPR —
    // the nodes frame rides every round, so the seed flag joins once
    val nodes = seeds match {
      case None => allNodes.withColumn("__base", lit(base))
      case Some(sd) =>
        allNodes.join(
          sd.select(col("node").cast("long")).distinct()
            .withColumn("__seed", lit(1L)),
          Seq("node"), "left")
          .withColumn("__base",
            when(col("__seed") === 1L, lit(base)).otherwise(lit(0L)))
          .drop("__seed")
    }
    var pr = nodes.withColumn("pr",
      if (seeds.isEmpty) lit(scale)
      else when(col("__base") > 0L, lit(scale)).otherwise(lit(0L)))
      .select(col("node"), col("pr"))
    var lastCkpt: DataFrame = null
    for (i <- 1 to iters) {
      val inflow = ew.join(pr.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"),
          expr("(((pr * weight) div __ow) * 85) div 100").as("__c"))
        .groupBy(col("node")).agg(sum(col("__c")).as("__in"))
      val next = nodes.join(inflow, Seq("node"), "left")
        .select(col("node"),
          (col("__base") + coalesce(col("__in"), lit(0L))).as("pr"))
      pr = if (i < iters && i % checkpointInterval == 0) {
        val cut = next.localCheckpoint(true)
        if (lastCkpt != null)
          org.apache.spark.sql.graftbridge.bridge.freeLocalCheckpoint(lastCkpt)
        lastCkpt = cut
        cut
      } else next
    }
    pr
  }
}
