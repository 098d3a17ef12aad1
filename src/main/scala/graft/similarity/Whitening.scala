package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding whitening / PCA — the standard retrieval-quality lever for
  * dense vectors (Jégou & Chum ECCV'12: whitening decorrelates the
  * embedding space so cosine stops over-weighting the dominant
  * directions; OPQ-style ANN pipelines whiten before quantizing).
  * Completes the similarity family: Knn searches, SemDedup dedups,
  * Whitening conditions the space both operate in.
  *
  * Scale shape:
  *  - [[moments]] is ONE pass: per-partition dense accumulation of the
  *    mean vector and the packed upper-triangle second-moment matrix
  *    (dim·(dim+3)/2 doubles of state — 2,144 for dim 64, independent of
  *    row count), reduced pairwise. This is the documented legitimate
  *    `mapPartitions` tier (a dense numeric kernel, like the multimodal
  *    codec boundary): expressing a dim² outer-product sum as exploded
  *    rows would shuffle dim²·N rows for no benefit.
  *  - the eigendecomposition runs on the DRIVER over the dim×dim
  *    covariance (cyclic Jacobi, pure Scala — 64×64 converges in a few
  *    sweeps; the matrix is tiny BY CONSTRUCTION, the same tier as
  *    Knn's centroid table).
  *  - [[project]] folds the transform matrix into a LITERAL expression
  *    (same pattern as Knn.centroidScores): projection is a pure map —
  *    zero shuffle, zero UDF, codegen-friendly HOF arithmetic.
  */
object Whitening {

  /** (count, mean, covariance) of an `array<float>` column in one pass.
    * Covariance is the population covariance (divide by n, not n−1) —
    * the whitening convention; at corpus scale the distinction is noise.
    *
    * BIT-DETERMINISTIC, the quantized-Lloyd recipe: every value and
    * pairwise product is quantized to 1/2²⁰ fixed point
    * (`floor(x·2^20)` longs) and summed EXACTLY, so the moments — and
    * the eigenbasis trained from them — are independent of partition
    * count and task order, and a SQL engine replays the sums verbatim
    * (q_embed_whiten's oracle recomputes them in DuckDB and gates the
    * pinned basis on eigen-residuals against ITS covariance). The
    * quantization perturbs each raw moment by ≤ 2⁻²⁰ — invisible at
    * whitening precision (WhiteningSpec keeps the naive-equality bound).
    * Overflow headroom: per-row quantized product ≤ B²·2²⁰ for values
    * bounded by B, so the long sums are safe past 10¹² rows of
    * unit-scale embeddings.
    */
  def moments(emb: DataFrame, vecCol: String): (Long, Array[Double], Array[Array[Double]]) = {
    val dim = emb.select(size(col(vecCol))).head().getInt(0)
    val packed = dim * (dim + 1) / 2
    // state: [n, qsum_0..qsum_{d-1}, upper-triangle quantized raw moments]
    // null VECTORS are excluded (a missing embedding contributes no
    // moment); null ELEMENTS inside a vector are a schema violation the
    // ragged-length require below surfaces loudly enough
    val parts = emb.select(col(vecCol)).filter(col(vecCol).isNotNull).rdd
      .mapPartitions { it =>
        val acc = new Array[Long](1 + dim + packed)
        var any = false
        it.foreach { row =>
          val v = row.getSeq[Float](0)
          require(v.length == dim, s"ragged embedding: ${v.length} vs $dim")
          any = true
          acc(0) += 1
          var i = 0; var p = 1 + dim
          while (i < dim) {
            val vi = v(i).toDouble
            acc(1 + i) += math.floor(vi * 1048576.0).toLong
            var j = i
            while (j < dim) {
              acc(p) += math.floor(vi * v(j).toDouble * 1048576.0).toLong
              p += 1; j += 1
            }
            i += 1
          }
        }
        if (any) Iterator.single(acc) else Iterator.empty
      }
      .collect() // long sums are order-free: no partition-index fold needed
    require(parts.nonEmpty, "moments over an empty corpus")
    val reduced = parts.reduce { (a, b) =>
      val out = a.clone()
      var i = 0
      while (i < out.length) { out(i) += b(i); i += 1 }
      out
    }
    val n = reduced(0)
    require(n > 0, "moments over an empty corpus")
    // pinned op order, replayed verbatim by the oracle:
    // mean = (Σq/2^20)/n ; cov = (Σq/2^20)/n − mean_i·mean_j
    val mean = Array.tabulate(dim)(i => (reduced(1 + i).toDouble / 1048576.0) / n)
    val cov = Array.ofDim[Double](dim, dim)
    var i = 0; var p = 1 + dim
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = (reduced(p).toDouble / 1048576.0) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        p += 1; j += 1
      }
      i += 1
    }
    (n, mean, cov)
  }

  /** Eigendecomposition of a symmetric matrix by cyclic Jacobi rotation
    * (Golub & Van Loan §8.5) — pure Scala, O(dim³) per sweep, a few
    * sweeps to machine precision for the dim ≤ a-few-hundred matrices
    * embeddings produce. Returns (eigenvalues, eigenvectors as ROWS),
    * sorted by eigenvalue DESCENDING; eigenvector sign pinned so each
    * row's largest-|component| entry is positive (determinism — Jacobi
    * is sign-ambiguous, and a flipped sign would flip projected values).
    */
  def eigenSym(m: Array[Array[Double]], sweeps: Int = 24,
               tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val dim = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (sweep < sweeps && off > tol) {
      var p = 0
      while (p < dim - 1) {
        var q = p + 1
        while (q < dim) {
          if (math.abs(a(p)(q)) > tol / (dim * dim)) {
            // symmetric Schur rotation zeroing a(p)(q)
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < dim) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < dim) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vpk = v(p)(k); val vqk = v(q)(k)
              v(p)(k) = c * vpk - s * vqk
              v(q)(k) = s * vpk + c * vqk
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    val order = (0 until dim).sortBy(i => -a(i)(i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { i =>
      val row = v(i)
      // sign pin: largest-|component| entry positive
      val lead = row.indices.maxBy(j => math.abs(row(j)))
      if (row(lead) < 0) row.map(x => -x) else row.clone()
    }.toArray
    (vals, vecs)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }

  /** Project `vecCol` through `rows` (a k×dim matrix, one output
    * component per row) after centering on `mean`, optionally scaling
    * each component by `scales` — as a LITERAL-folded pure-map
    * expression (no shuffle, no UDF). Output: `array<double>` of
    * length k.
    */
  def project(vec: Column, mean: Array[Double], rows: Array[Array[Double]],
              scales: Option[Array[Double]] = None): Column = {
    require(rows.nonEmpty && rows.forall(_.length == mean.length))
    scales.foreach(s => require(s.length == rows.length))
    val mLit = typedlit(mean.toSeq)
    val rLit = typedlit(rows.map(_.toSeq).toSeq)
    val sLit = typedlit(scales.getOrElse(Array.fill(rows.length)(1.0)).toSeq)
    // centered once, then one dot product per output component
    val centered = zip_with(vec, mLit, (x, mu) => x.cast("double") - mu)
    transform(sequence(lit(1), lit(rows.length)), k =>
      element_at(sLit, k) *
        aggregate(zip_with(centered, element_at(rLit, k), (x, r) => x * r),
          lit(0.0), (acc, x) => acc + x))
  }

  /** PCA-whitening transform fit on the corpus: y = Λ^(−½)·Vᵀ·(x − μ)
    * over the top-`k` components (`k = dim` for full whitening). `eps`
    * regularizes near-zero eigenvalues (a degenerate direction would
    * otherwise blow up to ±∞).
    */
  case class Transform(mean: Array[Double], components: Array[Array[Double]],
                       eigenvalues: Array[Double], eps: Double) {
    def apply(vec: Column): Column =
      project(vec, mean, components,
        Some(eigenvalues.map(l => 1.0 / math.sqrt(math.max(l, 0.0) + eps))))
  }

  def fit(emb: DataFrame, vecCol: String, k: Int, eps: Double = 1e-6): Transform = {
    require(k > 0, s"k must be positive, got $k")
    val (_, mean, cov) = moments(emb, vecCol)
    require(k <= mean.length, s"k=$k exceeds dim ${mean.length}")
    val (vals, vecs) = eigenSym(cov)
    Transform(mean, vecs.take(k), vals.take(k), eps)
  }
}
