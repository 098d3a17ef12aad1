package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Optimized Product Quantization — the LEARNED rotation ahead of PQ
  * (Ge, He, Ke & Sun, "Optimized Product Quantization for Approximate
  * Nearest Neighbor Search", CVPR 2013; non-parametric variant), the
  * published rung past [[Whitening]]'s PCA conditioning: instead of
  * assuming the PCA axes are the right subspace split, ALTERNATE
  * codebook fitting with an orthogonal Procrustes solve so the rotation
  * adapts to what the quantizer can actually represent.
  *
  * One alternation round (the library's pinned shape — each further
  * round is the same two verified machines re-run):
  *   1. fit PQ codebooks B₀ on the input frame ([[Pq.trainCodebooks]],
  *      bit-deterministic quantized Lloyd);
  *   2. reconstruct every vector from its codes (y = its codebook
  *      entries concatenated) and accumulate the cross-moment
  *      M = Σ_i y_i·x_iᵀ as QUANTIZED integer sums
  *      (floor(2²⁰·y_r·x_c) longs — partition-order-free, the
  *      [[Whitening.moments]] recipe);
  *   3. R = the polar factor M·(MᵀM)^(−1/2) — the closed-form
  *      Procrustes optimum max_R tr(RᵀM) (Schönemann 1966), computed
  *      on the driver from the d×d moment via the existing Jacobi
  *      [[Whitening.eigenSym]].
  *
  * Everything downstream (rotate, coarse-quantize, residual codebooks,
  * integer ADC search) is the verified [[Pq]] machine on the rotated
  * frame. The rotation is verifiable from OUTSIDE (the oracle's gates):
  * RᵀR = I (orthonormality), RᵀM symmetric (the Procrustes
  * critical-point condition, with M recomputed independently from the
  * replayed codebooks), and tr(RᵀM) ≥ tr(M) (no worse than identity —
  * rules out descent branches).
  */
object Opq {

  /** Quantized cross-moment M = Σ_i floor(2²⁰ · y_r · x_c) / 2²⁰, where
    * y is the PQ reconstruction of x under `books`. One narrow map +
    * one (d×d)-row grouped integer aggregate — no driver pass over the
    * corpus; exact long sums make M a pure function of the frame.
    */
  private[graft] def crossMoment(frame: DataFrame, books: Pq.Codebooks,
                                 m: Int, subDim: Int): Array[Array[Double]] = {
    val d = m * subDim
    val codes = Pq.encodeExpr(col("embedding"), books, subDim)
    // reconstruction: per subspace, the codebook entry for the code
    // (keyed by id — a Lloyd round can drop an emptied entry)
    val yParts = books.zipWithIndex.map { case (book, i) =>
      val byId = typedlit(book.map { case (id, v) => id -> v.toSeq }.toMap)
      element_at(byId, element_at(col("__codes"), i + 1))
    }
    val rows = frame.filter(col("embedding").isNotNull)
      .select(col("embedding"), codes.as("__codes"))
      .select(col("embedding"), concat(yParts: _*).as("__y"))
      .select(col("embedding"), posexplode(col("__y")).as(Seq("r", "yv")))
      .select(col("r"), col("yv"), posexplode(col("embedding")).as(Seq("c", "xv")))
      .groupBy(col("r"), col("c"))
      .agg(sum(floor(col("yv").cast("double") * col("xv").cast("double")
        * lit(1048576.0)).cast("long")).as("q"))
      .collect()
    require(rows.nonEmpty, "Opq.crossMoment over an empty corpus")
    val mm = Array.ofDim[Double](d, d)
    rows.foreach { row =>
      mm(row.getInt(0))(row.getInt(1)) = row.getLong(2).toDouble / 1048576.0
    }
    mm
  }

  /** Polar factor R = M·(MᵀM)^(−1/2): the orthogonal Procrustes optimum
    * (max_R tr(RᵀM) over orthogonal R). Driver-side O(d³) via the
    * Jacobi eigendecomposition of the symmetric MᵀM; THROWS on a
    * (near-)singular M — the polar factor is then not unique, and a
    * silently arbitrary rotation would poison every downstream code.
    */
  private[graft] def polar(mm: Array[Array[Double]]): Array[Array[Double]] = {
    val d = mm.length
    val s = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) {
        var acc = 0.0
        var k = 0
        while (k < d) { acc += mm(k)(i) * mm(k)(j); k += 1 }
        s(i)(j) = acc
        j += 1
      }
      i += 1
    }
    val (vals, vecs) = Whitening.eigenSym(s)
    // scale-relative singularity test: σ_min/σ_max = sqrt(λ_min/λ_max)
    require(vals.last > vals.head * 1e-16,
      "Opq.polar: cross-moment is numerically singular (σ_min/σ_max < 1e-8) " +
        "— the polar factor is not unique; more data or fewer dims")
    val sinv = Array.ofDim[Double](d, d)
    i = 0
    while (i < d) {
      var j = 0
      while (j < d) {
        var acc = 0.0
        var k = 0
        while (k < d) { acc += vecs(k)(i) * vecs(k)(j) / math.sqrt(vals(k)); k += 1 }
        sinv(i)(j) = acc
        j += 1
      }
      i += 1
    }
    val r = Array.ofDim[Double](d, d)
    i = 0
    while (i < d) {
      var j = 0
      while (j < d) {
        var acc = 0.0
        var k = 0
        while (k < d) { acc += mm(i)(k) * sinv(k)(j); k += 1 }
        r(i)(j) = acc
        j += 1
      }
      i += 1
    }
    // one Newton–Schulz polish R ← R·(3I − RᵀR)/2: quadratic convergence
    // to the nearest orthogonal matrix, cleaning the Jacobi/inverse-sqrt
    // residual (measured ~1e-9 on ill-conditioned moments) to machine
    // precision — the oracle's 1e-9 orthonormality gate then has orders
    // of margin. Deterministic: plain double arithmetic on R.
    val t = Array.ofDim[Double](d, d)
    i = 0
    while (i < d) {
      var j = 0
      while (j < d) {
        var acc = 0.0
        var k = 0
        while (k < d) { acc += r(k)(i) * r(k)(j); k += 1 }
        t(i)(j) = (if (i == j) 3.0 else 0.0) - acc
        j += 1
      }
      i += 1
    }
    val out = Array.ofDim[Double](d, d)
    i = 0
    while (i < d) {
      var j = 0
      while (j < d) {
        var acc = 0.0
        var k = 0
        while (k < d) { acc += r(i)(k) * t(k)(j); k += 1 }
        out(i)(j) = acc / 2.0
        j += 1
      }
      i += 1
    }
    out
  }

  /** One OPQ-NP alternation: B₀ on the input frame, then the Procrustes
    * rotation toward B₀'s reconstructions. Returns R as ROWS (apply
    * with [[rotateExpr]]; rotated_k = R_k · x).
    */
  def trainRotation(frame: DataFrame, m: Int, subDim: Int, k: Int,
                    iters: Int = 1,
                    sampleFraction: Double = 1.0): Array[Array[Double]] = {
    require(iters == 1,
      "one alternation is the library's pinned shape (each further round " +
        "re-runs the same two machines; re-compose externally if needed)")
    require(sampleFraction > 0 && sampleFraction <= 1)
    // at 100 TB the rotation trains on a deterministic hash-sample like
    // the codebooks do (rotations need the density shape, not the
    // corpus); ONE sample frame feeds both halves so the cross-moment
    // measures exactly the codebooks' training distribution
    val f = if (sampleFraction >= 1.0) frame
      else frame.filter(pmod(xxhash64(col("vec_id")), lit(1000000L))
        < (sampleFraction * 1000000L).toLong)
    val books0 = Pq.trainCodebooks(f, m, subDim, k, iters = 1)
    polar(crossMoment(f, books0, m, subDim))
  }

  /** y = R·x as a zero-shuffle map expression, narrowed to float (the
    * [[Whitening.project]] kernel with a zero mean).
    */
  def rotateExpr(vec: Column, r: Array[Array[Double]]): Column =
    transform(
      Whitening.project(vec, Array.fill(r.head.length)(0.0), r),
      x => x.cast("float"))
}
