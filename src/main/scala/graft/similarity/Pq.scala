package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ: product quantization with asymmetric-distance (ADC) search
  * (Jégou, Douze & Schmid, "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011 — public knowledge).
  *
  * The memory rung the float32 IVF index lacks: a dim-64 float vector is
  * 256 bytes; its PQ form is `m` single-byte codes (4 bytes at m=4) — the
  * difference between an embedding index that fits executor memory at
  * 100 TB and one that does not. The recipe:
  *
  *   - split each vector into `m` contiguous subspaces of `subDim` dims;
  *   - train an independent K-entry codebook per subspace with the
  *     EXISTING quantized Lloyd ([[Knn.trainCentroids]] on a sliced
  *     projection) — bit-deterministic, so the trained codebooks are
  *     DuckDB-replayable exactly like the coarse IVF centroids;
  *   - encode: per subspace, argmin codebook entry — a pure map
  *     expression over the corpus, zero shuffle (the [[Knn]] scoring
  *     kernel on the subvector);
  *   - search (IVFADC): corpus vectors are encoded as RESIDUALS from
  *     their coarse centroid; a query probes `nProbe` coarse buckets,
  *     takes its own residual against each probed centroid, builds one
  *     m×K lookup table of QUANTIZED squared distances (`floor(d·2^16)`
  *     longs), and scores every candidate code with `m` array lookups
  *     and an exact integer sum — no float math per candidate, and the
  *     integer ADC distance is hash-stable across engines by
  *     construction.
  *
  * Reference tie-in: the reference has no ANN tier; this extends the
  * brief-mandated similarity-search family (SURVEY §2C) to the published
  * corpus-scale memory shape.
  */
object Pq {

  /** One codebook per subspace, each a [[Knn.Centroids]] (ids 1..k). */
  type Codebooks = Array[Knn.Centroids]

  /** Fail loudly when `m·subDim` does not cover a vector's width.
    * Without this the slice/zip_with kernels silently produce null
    * sub-scores and `array_min` emits a FIXED garbage code for every
    * vector — a corrupt index, not an error. An EXPRESSION guard (one
    * per-row size comparison, `raise_error` on mismatch) rather than a
    * probe scan: validation costs zero extra Spark actions, and a
    * mixed-width corpus fails on the offending ROW, not just the first.
    */
  private def guardDim(vec: Column, m: Int, subDim: Int,
                       what: String): Column =
    when(size(vec) === lit(m * subDim), vec)
      .otherwise(raise_error(concat(
        lit(s"$what: m*subDim = ${m * subDim} (m=$m, subDim=$subDim) " +
          "must equal the embedding dimension "),
        size(vec).cast("string"))))

  private def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double")
      d * d
    }), lit(0.0), (acc, v) => acc + v)

  /** Train `m` codebooks of `k` entries each on the `subDim`-wide
    * slices of the embedding — ALL SUBSPACES FUSED per Lloyd round: one
    * count, one seed collect (the seed vec_ids are subspace-independent
    * by construction — `vec_id % (n/k) = 0`), and ONE grouped
    * fixed-point aggregate over exploded (subspace, entry, dim) rows
    * per round, instead of m independent trainCentroids walks (m+?
    * driver-sequenced jobs each). Bit-identical to the per-subspace
    * form: the quantized sums per (subspace, entry, dim) are the same
    * longs in any grouping, and the seed slicing happens locally on the
    * same collected rows. Measured: the fused form cut q_ann_ivfpq's
    * training from ~12 sequential jobs to ~4.
    * `sampleFraction` rides through: at 100 TB codebooks train on a
    * deterministic hash-sample like the coarse quantizer does.
    */
  def trainCodebooks(frame: DataFrame, m: Int, subDim: Int, k: Int,
                     iters: Int = 1, sampleFraction: Double = 1.0): Codebooks = {
    require(m > 0 && subDim > 0, "m and subDim must be positive")
    require(sampleFraction > 0 && sampleFraction <= 1)
    val cached = (if (sampleFraction >= 1.0) frame
      else frame.filter(pmod(xxhash64(col("vec_id")), lit(1000000L))
        < (sampleFraction * 1000000L).toLong))
      .select(col("vec_id"),
        guardDim(col("embedding"), m, subDim, "trainCodebooks").as("embedding"))
      .persist()
    try {
      val n = cached.count()
      val step = math.max(1L, n / k)
      // one seed collect; slice per subspace locally (same floats the
      // per-subspace trainCentroids would read)
      val seedRows = cached
        .filter(col("vec_id") % step === 0).orderBy(col("vec_id")).limit(k)
        .select(col("vec_id"), col("embedding")).collect()
        .sortBy(_.getLong(0)).zipWithIndex
      var books: Codebooks = Array.tabulate(m) { i =>
        seedRows.map { case (r, j) =>
          (j + 1, r.getSeq[Float](1).slice(i * subDim, (i + 1) * subDim).toArray)
        }
      }
      for (_ <- 1 to iters) {
        // per subspace: argmin entry for the slice, then explode the
        // slice dims — one job, one shuffle for ALL m books
        val subs = array(books.indices.map { i =>
          val sv = slice(col("embedding"), i * subDim + 1, subDim)
          struct(lit(i).as("m"),
            array_min(Knn.centroidScores(sv, books(i))).getField("col2").as("bid"),
            sv.as("sv"))
        }: _*)
        val collected = cached
          .select(explode(subs).as("s"))
          .select(col("s.m"), col("s.bid"),
            posexplode(col("s.sv")).as(Seq("d", "v")))
          .groupBy(col("m"), col("bid"), col("d"))
          .agg(sum(floor(col("v") * lit(65536.0)).cast("long")).as("sq"),
            count(lit(1)).as("n"))
          .collect()
        books = collected.groupBy(_.getInt(0)).toArray.sortBy(_._1).map {
          case (_, rows) =>
            rows.groupBy(_.getInt(1)).toArray.map { case (bid, dims) =>
              (bid, dims.sortBy(_.getInt(2))
                .map(r => (r.getLong(3).toDouble / (65536.0 * r.getLong(4))).toFloat))
            }.sortBy(_._1)
        }
      }
      books
    } finally cached.unpersist()
  }

  /** Residual of `vec` against the coarse centroid `cid` points at:
    * `float(double(v_d) − double(c_d))` per dim. The double difference of
    * two floats is EXACT (no rounding), and the float narrowing is one
    * correctly-rounded IEEE op — so the residual is engine-portable and
    * the DuckDB oracle reproduces it bit-for-bit.
    */
  private[similarity] def residualExpr(vec: Column, cid: Column,
                                       coarse: Knn.Centroids): Column = {
    // keyed by id, not position: a Lloyd round can drop an emptied
    // centroid, leaving non-contiguous ids
    val byId = typedlit(coarse.map { case (id, v) => id -> v.toSeq }.toMap)
    zip_with(vec, element_at(byId, cid),
      (a, b) => (a.cast("double") - b.cast("double")).cast("float"))
  }

  /** PQ codes for a (residual) vector: per subspace, the argmin codebook
    * entry id — `array<int>` of length m, ids 1-based. Pure map: the
    * codebooks travel as literals, scoring is the [[Knn.centroidScores]]
    * kernel on each slice, zero shuffle.
    */
  def encodeExpr(vec: Column, books: Codebooks, subDim: Int): Column =
    array(books.zipWithIndex.map { case (book, i) =>
      array_min(Knn.centroidScores(slice(vec, i * subDim + 1, subDim), book))
        .getField("col2")
    }: _*)

  /** The ADC lookup table for one query (residual) vector: per subspace a
    * map from codebook-entry ID to `floor(2^16 · ‖q_i − c‖²)` as a long.
    * Keyed by id, not position — a Lloyd round can drop an emptied
    * centroid, and codes carry ids. Built once per (query, probed
    * bucket) — a handful of rows — then broadcast; per candidate the
    * scorer does m map reads and an integer sum.
    */
  def lutExpr(vec: Column, books: Codebooks, subDim: Int): Column =
    array(books.zipWithIndex.map { case (book, i) =>
      val sub = slice(vec, i * subDim + 1, subDim)
      val bVecs = typedlit(book.map(_._2.toSeq).toSeq)
      val bIds = typedlit(book.map(_._1).toSeq)
      map_from_arrays(bIds,
        transform(sequence(lit(1), lit(book.length)), j =>
          floor(lit(65536.0) * sqDist(sub, element_at(bVecs, j))).cast("long")))
    }: _*)

  /** Asymmetric distance: Σ_i lut[i][code_i] — m lookups, exact long sum. */
  def adcDistExpr(codes: Column, lut: Column, m: Int): Column =
    aggregate(sequence(lit(1), lit(m)), lit(0L),
      (acc, i) => acc + element_at(element_at(lut, i), element_at(codes, i)))

  /** The corpus encoded for the IVF-PQ index: coarse bucket + residual PQ
    * codes, `(vec_id, centroid_id, codes)`. One narrow projection — the
    * float embedding column is DROPPED, which is the whole point: the
    * index row is a bucket id plus m small ints.
    */
  def encodeCorpus(corpus: DataFrame, coarse: Knn.Centroids,
                   books: Codebooks, subDim: Int): DataFrame = {
    // a null embedding has no bucket and no codes — excluded, like
    // Whitening.moments (unfiltered, the null scores make array_min
    // pick centroid 1 and emit GARBAGE codes that pollute the index)
    val assigned = Knn.withAssignment(
      corpus.filter(col("embedding").isNotNull), coarse)
    assigned.select(col("vec_id"), col("centroid_id"),
      encodeExpr(residualExpr(
          guardDim(col("embedding"), books.length, subDim, "encodeCorpus"),
          col("centroid_id"), coarse),
        books, subDim).as("codes"))
  }

  /** Residual frame for codebook training: `(vec_id, embedding)` where
    * embedding is the residual from the assigned trained coarse centroid.
    */
  def residualFrame(corpus: DataFrame, coarse: Knn.Centroids): DataFrame =
    Knn.withAssignment(corpus.filter(col("embedding").isNotNull), coarse)
      .select(col("vec_id"),
        residualExpr(col("embedding"), col("centroid_id"), coarse).as("embedding"))

  /** IVFADC top-k: probe `nProbe` coarse buckets per query, score every
    * candidate's PQ codes against the per-(query,bucket) lookup table,
    * keep the k smallest integer distances (ties by vec_id).
    *
    * Scale shape: the corpus side is assign→residual→encode — pure
    * codegen map, zero shuffle, and the scored payload per candidate is
    * m ints, not dim floats. The probe side is queries×nProbe rows
    * carrying m×K longs each — broadcast. One window per query id caps
    * the result; candidate count per query is bounded by the probed
    * buckets, the same contract as [[Knn.ivfTopK]].
    */
  def ivfpqTopK(corpus: DataFrame, queries: DataFrame, coarse: Knn.Centroids,
                books: Codebooks, subDim: Int, k: Int, nProbe: Int = 2): DataFrame = {
    val m = books.length
    val encoded = encodeCorpus(corpus, coarse, books, subDim)

    val probeIds = (vec: Column) =>
      slice(transform(array_sort(Knn.centroidScores(vec, coarse)),
        s => s.getField("col2")), 1, nProbe)
    val probes = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        explode(probeIds(col("embedding"))).as("centroid_id"))
      .select(col("query_id"), col("centroid_id"),
        lutExpr(residualExpr(
            guardDim(col("q_emb"), m, subDim, "ivfpqTopK(queries)"),
            col("centroid_id"), coarse),
          books, subDim).as("lut"))

    val w = Window.partitionBy(col("query_id")).orderBy(col("adc_dist"), col("vec_id"))
    encoded.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adc_dist", adcDistExpr(col("codes"), col("lut"), m))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("adc_dist"))
  }

  /** Persist the PQ index: bucket-partitioned parquet of
    * `(vec_id, codes: array<tinyint>)` — codes fit a byte each (K ≤ 127),
    * so the stored row is m bytes of payload vs 4·dim for floats. Probing
    * reads only the probed buckets' directories, same layout contract as
    * [[Knn.writeIndex]].
    */
  def writeIndex(corpus: DataFrame, coarse: Knn.Centroids, books: Codebooks,
                 subDim: Int, path: String): Unit = {
    // With ANSI off a codebook id >= 128 would silently WRAP to a
    // negative byte (id 128 -> -128), corrupting the persisted index.
    // Enforce the byte contract instead of documenting it.
    require(books.forall(_.forall(_._1 <= 127)),
      "writeIndex stores codes as bytes: every codebook entry id must " +
        "be <= 127 (store as smallint for larger K)")
    graft.sources.Sink.writePartitioned(
      encodeCorpus(corpus, coarse, books, subDim)
        .withColumn("codes", transform(col("codes"), _.cast("byte"))),
      path, Seq("centroid_id"))
  }
}
