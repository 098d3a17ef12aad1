package graft.similarity

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein, SIGIR
  * 1998): diversify a top-k retrieval result by greedily selecting the
  * candidate that balances relevance against similarity to what is
  * already selected — `argmax λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)`.
  * The near-dup pages a plain top-k stacks at ranks 1..5 spread out; a
  * retrieval-augmented pipeline gets k DISTINCT pieces of evidence.
  *
  * Greedy selection is inherently sequential, but the candidate set is
  * top-k-sized BY CONSTRUCTION (the distributed retrieval stages
  * upstream — bm25TopK / bruteForceTopK / rrfFuse — bound it), so
  * selection runs driver-side over ≤ `maxCandidates` rows: the same
  * bounded-collect tier as Binning's boundary arrays. All corpus-scale
  * work stays in the upstream stages.
  *
  * Determinism: relevance enters RANK-based (the RRF transform
  * `10000 div (rrfK + rank)` — rank scales are comparable across any
  * scorer, the classic calibration-free trick), similarity as floored
  * cosine basis points, and the MMR objective is the exact integer
  * `λ_bp·rel_q − (10⁴−λ_bp)·maxSim_bp` with (score desc, rank asc,
  * id asc) tie-break — the selection is a pure function of the
  * candidate set, independent of input partitioning or arrival order
  * (spec-proven).
  */
object Mmr {

  /** Re-rank `candidates` (idCol: long, rankCol: 1-based relevance rank,
    * vecCol: float vector) to the `k` most relevant-yet-diverse, output
    * (idCol, mmr_rank, rel_rank, mmr_q).
    */
  def rerank(candidates: DataFrame, idCol: String, rankCol: String,
             vecCol: String, k: Int, lambdaBp: Int = 7000, rrfK: Int = 60,
             maxCandidates: Int = 4096): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(lambdaBp >= 0 && lambdaBp <= 10000, "lambdaBp in [0, 10000]")
    val rows = candidates
      .select(col(idCol).cast("long"), col(rankCol).cast("long"),
        col(vecCol).cast("array<float>"))
      .collect()
    require(rows.length <= maxCandidates,
      s"${rows.length} candidates exceed maxCandidates=$maxCandidates — " +
        "MMR is the FINALIZER of a bounded top-k, not a corpus operator; " +
        "tighten the upstream k or raise the cap deliberately")
    val cand = rows.collect {
      case r if !r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2) =>
        (r.getLong(0), r.getLong(1), r.getSeq[Float](2).toArray)
    }.sortBy(c => (c._2, c._1))

    def relQ(rank: Long): Long = 10000L / (rrfK + rank)
    def simBp(a: Array[Float], b: Array[Float]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1 }
      if (na == 0.0 || nb == 0.0) 0L
      else math.floor(dot / math.sqrt(na * nb) * 10000.0 + 0.5).toLong
    }

    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val remaining = scala.collection.mutable.ArrayBuffer(cand: _*)
    val maxSim = scala.collection.mutable.Map.empty[Long, Long] // id -> bp
    while (selected.length < k && remaining.nonEmpty) {
      var best = -1; var bestScore = Long.MinValue
      var bestRank = Long.MaxValue; var bestId = Long.MaxValue
      var i = 0
      while (i < remaining.length) {
        val (id, rank, _) = remaining(i)
        val penalty = if (selected.isEmpty) 0L else maxSim(id)
        val score = lambdaBp * relQ(rank) - (10000L - lambdaBp) * penalty
        if (score > bestScore || (score == bestScore &&
            (rank < bestRank || (rank == bestRank && id < bestId)))) {
          best = i; bestScore = score; bestRank = rank; bestId = id
        }
        i += 1
      }
      val (id, rank, vec) = remaining.remove(best)
      selected += ((id, rank, bestScore))
      remaining.foreach { case (rid, _, rvec) =>
        val s = simBp(rvec, vec)
        maxSim.updateWith(rid)(prev => Some(math.max(prev.getOrElse(Long.MinValue), s)))
      }
    }

    val spark = candidates.sparkSession
    val out = selected.zipWithIndex.map { case ((id, rank, score), i) =>
      Row(id, (i + 1).toLong, rank, score)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.toSeq, 1),
      StructType(Seq(StructField(idCol, LongType), StructField("mmr_rank", LongType),
        StructField("rel_rank", LongType), StructField("mmr_q", LongType))))
  }
}
