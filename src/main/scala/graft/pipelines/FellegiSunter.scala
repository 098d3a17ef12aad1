package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage (JASA 1969) — the TRAINED
  * rung of the 15-family's matching ladder: where `q_fuzzy_match` /
  * `q_entity_resolution` decide by a single edit-distance threshold, this
  * learns PER-FIELD evidence weights from the data itself. Each candidate
  * pair carries K binary field agreements; unsupervised EM (Winkler 1988)
  * fits the two-class mixture
  *
  *   P(pair) = λ·Π m_k^{a_k}(1−m_k)^{1−a_k} + (1−λ)·Π u_k^{a_k}(1−u_k)^{1−a_k}
  *
  * (m_k = P(field k agrees | match), u_k = P(agrees | non-match)), and the
  * final score is the classic sum of log-likelihood ratios — agreement on
  * a field that is rare among non-matches (a name, a phone) earns a large
  * positive weight; agreement on a low-cardinality field (a segment) earns
  * a small one; disagreement earns the negative counterpart.
  *
  * Cross-engine determinism (the DSIR recipe, applied to EM):
  *  - the E-step weight w = λ·likeM / (λ·likeM + (1−λ)·likeU) is a pinned
  *    chain of correctly-rounded double ops and is QUANTIZED per pair to
  *    the integer floor(2³⁰·w), so every M-step statistic is an EXACT
  *    integer sum;
  *  - the M-step re-estimates are single double divisions of exact
  *    integers, Laplace-smoothed in integer space
  *    (m_k = (Σw·a_k + Q)/(Σw + 2Q), Q = 2³⁰ — no parameter ever reaches
  *    0 or 1, so no log blows up and EM cannot degenerate);
  *  - scoring quantizes each field's log-ratio ONCE
  *    (floor(10⁴·ln + 0.5), the Dsir/QualityClassifier constant) and the
  *    per-pair score is an exact integer sum of K table lookups.
  * The DuckDB oracle replays the full EM — every iteration unrolled as a
  * weight CTE + a 1-row parameter CTE — and the identical score table, so
  * the trained model is hash-verified, not trusted.
  *
  * Scale shape: `pairs` comes from blocking (sorted-neighborhood, PassJoin
  * segments, or a window stride — bounded, never all-pairs); training is
  * `iters` single wide aggregates over the pair table (2K+2 exact longs to
  * the driver per iteration — parameter-sized, not data-sized) and scoring
  * is one zero-shuffle projection.
  */
object FellegiSunter {

  /** 2³⁰ — the E-step weight quantum. */
  val Q: Long = 1073741824L

  /** Trained mixture parameters plus the quantized scoring weights. */
  final case class Params(lambda: Double, m: Array[Double], u: Array[Double]) {
    /** floor(10⁴·ln(m_k/u_k) + 0.5) — the agreement weight of field k. */
    def agreeWeights: Array[Long] =
      m.indices.map(i =>
        math.floor(1e4 * math.log(m(i) / u(i)) + 0.5).toLong).toArray
    /** floor(10⁴·ln((1−m_k)/(1−u_k)) + 0.5) — the disagreement weight. */
    def disagreeWeights: Array[Long] =
      m.indices.map(i =>
        math.floor(1e4 * math.log((1.0 - m(i)) / (1.0 - u(i))) + 0.5).toLong)
        .toArray
  }

  /** The quantized E-step weight floor(2³⁰·w) under the given parameters,
    * as an engine expression over the boolean agreement columns. Product
    * order is the column order — pinned, mirrored by the oracle.
    */
  private def wqExpr(agreeCols: Seq[String], lambda: Double,
                     m: Array[Double], u: Array[Double]): Column = {
    def like(ps: Array[Double]): Column =
      agreeCols.zipWithIndex.map { case (c, i) =>
        when(col(c), lit(ps(i))).otherwise(lit(1.0 - ps(i)))
      }.reduce(_ * _)
    val lm = lit(lambda) * like(m)
    val lu = lit(1.0 - lambda) * like(u)
    floor(lm / (lm + lu) * lit(Q.toDouble)).cast("long")
  }

  /** Unsupervised EM over a candidate-pair table: `agreeCols` are boolean
    * field-agreement columns; `iters` fixed iterations from the pinned
    * init (λ=0.5, m=0.9, u=0.1 — Winkler's standard starting point).
    * Each iteration is ONE wide aggregate; the driver holds 2K+2 longs.
    */
  def train(pairs: DataFrame, agreeCols: Seq[String], iters: Int = 5): Params = {
    require(agreeCols.nonEmpty, "need at least one agreement column")
    require(iters >= 1, "need at least one EM iteration")
    var lambda = 0.5
    var m = Array.fill(agreeCols.length)(0.9)
    var u = Array.fill(agreeCols.length)(0.1)
    for (_ <- 1 to iters) {
      val wq = wqExpr(agreeCols, lambda, m, u)
      val aggs: Seq[Column] =
        Seq(sum(wq).as("sw"), count(lit(1)).as("n")) ++
          agreeCols.zipWithIndex.flatMap { case (c, i) =>
            Seq(sum(wq * col(c).cast("long")).as(s"swa$i"),
              sum((lit(Q) - wq) * col(c).cast("long")).as(s"sua$i"))
          }
      val r = pairs.agg(aggs.head, aggs.tail: _*).head()
      val n = r.getAs[Long]("n")
      require(n > 0, "FellegiSunter.train: empty pair table")
      val sw = r.getAs[Long]("sw")
      lambda = (sw + Q).toDouble / ((n + 2) * Q).toDouble
      m = agreeCols.indices.map(i =>
        (r.getAs[Long](s"swa$i") + Q).toDouble / (sw + 2 * Q).toDouble).toArray
      u = agreeCols.indices.map(i =>
        (r.getAs[Long](s"sua$i") + Q).toDouble /
          ((n * Q - sw) + 2 * Q).toDouble).toArray
    }
    Params(lambda, m, u)
  }

  /** Per-pair score + MAP decision: `fs_score` = exact integer sum of the
    * quantized per-field log-likelihood-ratio weights (units of 10⁻⁴
    * nats), `is_match` = score > 0 (posterior odds favor the match class
    * at the learned weights). Zero-shuffle projection.
    */
  def score(pairs: DataFrame, agreeCols: Seq[String], p: Params): DataFrame = {
    val wm = p.agreeWeights
    val wn = p.disagreeWeights
    val s = agreeCols.zipWithIndex.map { case (c, i) =>
      when(col(c), lit(wm(i))).otherwise(lit(wn(i)))
    }.reduce(_ + _)
    pairs.withColumn("fs_score", s)
      .withColumn("is_match", col("fs_score") > 0L)
  }

  /** train + score in one call. */
  def link(pairs: DataFrame, agreeCols: Seq[String], iters: Int = 5): DataFrame =
    score(pairs, agreeCols, train(pairs, agreeCols, iters))
}
