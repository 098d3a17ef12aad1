package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** k-means‖ ("k-means parallel") seeding — Bahmani, Moseley, Vattani,
  * Kumar & Vassilvitskii, "Scalable k-means++", VLDB 2012: the
  * published answer to "k-means++ needs k sequential corpus passes" at
  * cluster scale. A constant number of ROUNDS each samples ~`oversample`
  * points with probability proportional to their squared distance from
  * the current candidate set, then the small weighted candidate set is
  * re-clustered down to k on the driver.
  *
  * This engine's Lloyd ([[Knn.trainCentroids]]) seeds by vec_id stride —
  * deterministic and replayable but quality-blind (a stride can land
  * every seed in one dense region). k-means‖ fixes the quality while
  * keeping every step EXACT and engine-replayable:
  *
  *   - distances are the established floor(2¹⁶·‖x−c‖²) integer
  *     quantization, min over the candidate set;
  *   - "sample with probability L·d²(x)/φ" is DERANDOMIZED through the
  *     portable multiplicative hash (the q_dataset_split/q_sample rule):
  *     select x iff h(x)·φ < L·qd(x)·2²⁰ with h(x) ∈ [0, 2²⁰) — an
  *     EXACT integer inequality (DECIMAL(38,0) on the Spark side,
  *     HUGEINT in the oracle), so the "random" choices are a pure
  *     function of the data and both engines make identical ones;
  *   - the final re-cluster is the GREEDY weighted variant (pick the
  *     max-weight candidate, then repeatedly the candidate maximizing
  *     weight·min-quantized-distance-to-chosen, ties by vec_id asc) —
  *     deterministic argmax over exact integers instead of k-means++'s
  *     random draws (the greedy analog is standard practice, e.g.
  *     scikit-learn's n_local_trials argmax).
  *
  * Scale shape: each round is one zero-shuffle map (qd against ≤
  * maxCandidates literal vectors) + one 1-row sum + one filtered
  * collect of ~oversample rows; the driver holds only the candidate
  * set (loud `maxCandidates` guard). Corpus passes = rounds + 1
  * (weights), independent of k — exactly the paper's contract.
  */
object KmeansPar {

  /** h(x) ∈ [0, 2²⁰): the portable multiplicative hash both engines
    * compute identically (the q_dataset_split family).
    */
  private def hashExpr(id: Column): Column =
    id % 1048573L * 2654435761L % 1048576L

  private def sqDistTo(vec: Column, c: Seq[Float]): Column =
    aggregate(zip_with(vec, typedlit(c), (x, y) => {
      val d = x.cast("double") - y.cast("double")
      d * d
    }), lit(0.0), (acc, v) => acc + v)

  private def qdExpr(vec: Column, cands: Seq[(Long, Array[Float])]): Column =
    array_min(array(cands.map { case (_, c) =>
      floor(lit(65536.0) * sqDistTo(vec, c.toSeq)).cast("long")
    }: _*))

  /** Scala twin of the quantized distance — same left-to-right double
    * summation as the expression/oracle forms.
    */
  private[graft] def qdist(a: Array[Float], b: Array[Float]): Long = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      val d = a(i).toDouble - b(i).toDouble
      s += d * d
      i += 1
    }
    math.floor(65536.0 * s).toLong
  }

  /** The seeding result: k rows (rank, vec_id, weight) where weight is
    * the number of corpus points nearest that candidate (ties to the
    * smaller candidate id) — the paper's re-cluster weights.
    */
  final case class Seeds(rows: Array[(Int, Long, Long)],
                         vectors: Array[(Long, Array[Float])]) {
    /** As a [[Knn.Centroids]] (ids 1..k in rank order) to feed Lloyd. */
    def centroids: Knn.Centroids =
      rows.map { case (rank, id, _) =>
        (rank, vectors.find(_._1 == id).get._2)
      }
  }

  def seed(corpus: DataFrame, k: Int, rounds: Int = 3, oversample: Int = 16,
           maxCandidates: Int = 4096): Seeds = {
    require(k >= 1 && rounds >= 1 && oversample >= 1)
    val base = corpus.filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"), hashExpr(col("vec_id")).as("__h"))
      .persist()
    try {
      // first center: deterministic "uniform" draw = argmin (h, vec_id)
      val c0 = base.orderBy(col("__h"), col("vec_id")).limit(1)
        .select(col("vec_id"), col("embedding")).collect()
      require(c0.nonEmpty, "KmeansPar.seed: empty corpus")
      var cands = scala.collection.mutable.LinkedHashMap[Long, Array[Float]](
        c0(0).getLong(0) -> c0(0).getSeq[Float](1).toArray)

      for (_ <- 1 to rounds) {
        val candSeq = cands.toSeq.map { case (id, v) => (id, v) }
        val qd = qdExpr(col("embedding"), candSeq)
        // φ summed in DECIMAL(38,0), not LongType: a long sum wraps
        // silently at ~9.2e18, and at the 10^11-row tier (qd up to
        // ~10^8 per row) the true φ passes that — a wrapped-negative φ
        // would silently skip sampling rounds. The selection inequality
        // below is decimal arithmetic anyway, so this also keeps one
        // arithmetic domain end-to-end.
        val phiRaw = base.agg(sum(qd.cast("decimal(38,0)"))).head().getDecimal(0)
        val phi = if (phiRaw == null) BigDecimal(0) else BigDecimal(phiRaw)
        require(phi >= 0,
          s"KmeansPar.seed: negative φ ($phi) — quantized distances must be >= 0")
        if (phi > 0) {
          // select x iff h·φ < L·qd·2²⁰ — exact DECIMAL(38,0) integers
          val sel = base
            .withColumn("__qd", qd)
            .filter(col("__qd") > 0L)
            .filter(col("__h").cast("decimal(38,0)") * lit(phi.bigDecimal) <
              lit(oversample.toLong) * col("__qd").cast("decimal(38,0)") *
                lit(1048576L))
            .select(col("vec_id"), col("embedding"))
            .limit(maxCandidates + 1).collect()
          require(cands.size + sel.length <= maxCandidates,
            s"KmeansPar.seed: candidate set exceeds maxCandidates=" +
              s"$maxCandidates — lower oversample/rounds or raise the cap")
          // sorted by vec_id so the candidate ORDER is data-determined
          sel.sortBy(_.getLong(0)).foreach { r =>
            val id = r.getLong(0)
            if (!cands.contains(id)) cands(id) = r.getSeq[Float](1).toArray
          }
        }
      }
      require(cands.size >= k,
        s"KmeansPar.seed: only ${cands.size} candidates for k=$k — raise " +
          "oversample or rounds (degenerate corpora select few points)")

      // weights: nearest candidate per corpus point, ties to smaller id
      val candSeq = cands.toSeq
      val nearest = array_min(array(candSeq.map { case (id, c) =>
        struct(floor(lit(65536.0) * sqDistTo(col("embedding"), c.toSeq))
          .cast("long").as("qd"), lit(id).as("cid"))
      }: _*)).getField("cid")
      val wRows = base.groupBy(nearest.as("cid"))
        .agg(count(lit(1)).as("w")).collect()
      val weights = wRows.map(r => r.getLong(0) -> r.getLong(1)).toMap

      // greedy weighted re-cluster to k on the driver — exact integers
      val ids = candSeq.map(_._1).toArray
      val vecs = candSeq.toMap
      val w = ids.map(id => id -> weights.getOrElse(id, 0L)).toMap
      val chosen = scala.collection.mutable.ArrayBuffer.empty[Long]
      val first = ids.maxBy(id => (w(id), -id))
      chosen += first
      while (chosen.size < k) {
        var bestId = -1L
        var bestScore: BigInt = BigInt(-1)
        ids.filterNot(chosen.contains).foreach { id =>
          val minQd = chosen.iterator.map(ch => qdist(vecs(id), vecs(ch))).min
          val score = BigInt(w(id)) * BigInt(minQd)
          if (score > bestScore || (score == bestScore && id < bestId)) {
            bestScore = score; bestId = id
          }
        }
        chosen += bestId
      }
      Seeds(
        chosen.zipWithIndex.map { case (id, i) => (i + 1, id, w(id)) }.toArray,
        candSeq.map { case (id, v) => (id, v) }.toArray)
    } finally base.unpersist()
  }

  /** Query form: (rank, vec_id, weight) of the k chosen seeds.
    * `maxCandidates` forwards to [[seed]]'s driver-candidate cap so the
    * query surface can raise it (with driver heap to spare) instead of
    * hitting the loud guard with no recourse.
    */
  def seedTable(corpus: DataFrame, k: Int, rounds: Int = 3,
                oversample: Int = 16, maxCandidates: Int = 4096): DataFrame = {
    val s = seed(corpus, k, rounds, oversample, maxCandidates)
    val spark = corpus.sparkSession
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        s.rows.map { case (r, id, wt) => Row(r, id, wt) }.toIndexedSeq, 1),
      StructType(Seq(StructField("rank", IntegerType),
        StructField("vec_id", LongType), StructField("weight", LongType))))
  }
}
