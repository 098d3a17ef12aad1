package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{MinHash, SimHash, TextFunctions, VectorFunctions}

/** Near-duplicate detection pipelines for document corpora.
  *
  * Scale shape shared by all three (SURVEY.md §5): per-row sketch (one
  * pass, no explode) → bounded band/chunk explode carrying ONLY
  * (id, band, bucket) — never the sketch or text, so the exploded
  * intermediate is a few dozen bytes per row — one shuffle keyed by
  * (band, bucket) → pair generation strictly inside buckets → dedup the
  * pair set → join sketches/shingle-sets back by id for verification.
  * Verification touches |candidates| rows, not |corpus|².
  */
object NearDup {

  /** Distinct word-shingle set, for exact Jaccard verification. */
  private def shingles(text: Column, shingleLen: Int): Column = {
    val toks = TextFunctions.tokens(text)
    val n = size(toks)
    array_distinct(
      when(n === 0, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(0), greatest(n - shingleLen, lit(0))),
          i => array_join(slice(toks, i + 1, lit(shingleLen)), " "))))
  }

  /** (id, band, bucket) rows: one per doc per LSH band. */
  private def bandBuckets(sigs: DataFrame, bands: Int, rows: Int): DataFrame =
    sigs.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col("sig"), b * rows + 1, lit(rows)), b))).as(Seq("band", "bucket")))

  /** Bucket-local candidate pairs (id_a < id_b), deduped. */
  private def bucketPairs(buckets: DataFrame, keys: Seq[String]): DataFrame = {
    val left = buckets.select((keys.map(col) :+ col("id").as("id_a")): _*)
    val right = buckets.select((keys.map(col) :+ col("id").as("id_b")): _*)
    left.join(right, keys)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
  }

  /** MinHash + banded LSH candidate pairs with exact n-gram Jaccard
    * verification. Returns (id_a, id_b, est_jaccard, jaccard) with
    * id_a < id_b and jaccard >= `threshold`.
    */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 64, bands: Int = 16, shingleLen: Int = 3,
                   threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    // ONE pass over the text computes both sketches; persisted because the
    // table feeds the band explode and both sides of the verification
    // joins (without persist the sketch would be recomputed three times).
    // At 100 TB this is the natural "signature table" an LSH dedup job
    // would checkpoint anyway: numHashes*8 B + shingle set per doc.
    val features = docs.select(col(idCol).as("id"),
      MinHash.minhashSignature(col(textCol), numHashes, shingleLen).as("sig"),
      shingles(col(textCol), shingleLen).as("sset")).persist()
    val cand = bucketPairs(bandBuckets(features, bands, rows), Seq("band", "bucket"))

    val featA = features.select(col("id").as("id_a"),
      col("sig").as("sig_a"), col("sset").as("set_a"))
    val featB = features.select(col("id").as("id_b"),
      col("sig").as("sig_b"), col("sset").as("set_b"))
    cand.join(featA, Seq("id_a")).join(featB, Seq("id_b"))
      .withColumn("est_jaccard", round(
        size(filter(zip_with(col("sig_a"), col("sig_b"), (a, b) => a === b),
          x => x)).cast("double") / numHashes, 4))
      .withColumn("jaccard", round(
        size(array_intersect(col("set_a"), col("set_b"))).cast("double") /
          greatest(size(array_union(col("set_a"), col("set_b"))), lit(1)).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("est_jaccard"), col("jaccard"))
  }

  /** SimHash near-dup pairs: 64-bit simhash, candidates via 4×16-bit
    * chunk buckets (any pair within Hamming distance 3 shares at least
    * one exact chunk, by pigeonhole over 4 chunks), verified by popcount.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val withHash = docs.select(col(idCol).as("id"),
      SimHash.simhash(col(textCol)).as("sh")).persist()
    val chunked = withHash.select(col("id"),
      posexplode(expr("transform(sequence(0, 3), c -> (shiftright(sh, c * 16) & 65535))"))
        .as(Seq("chunk", "key")))
    val cand = bucketPairs(chunked, Seq("chunk", "key"))
    val shA = withHash.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val shB = withHash.select(col("id").as("id_b"), col("sh").as("sh_b"))
    cand.join(shA, Seq("id_a")).join(shB, Seq("id_b"))
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Exact n-gram Jaccard for an arbitrary candidate-pair set
    * (pairs: columns id_a, id_b): joins shingle sets back by id — two
    * hash joins on the pair table, never a corpus self-join.
    */
  def ngramJaccard(docs: DataFrame, pairs: DataFrame, idCol: String,
                   textCol: String, shingleLen: Int = 3): DataFrame = {
    val sets = docs.select(col(idCol).as("id"), shingles(col(textCol), shingleLen).as("sset"))
    pairs
      .join(sets.select(col("id").as("id_a"), col("sset").as("set_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("sset").as("set_b")), Seq("id_b"))
      .withColumn("jaccard", round(
        size(array_intersect(col("set_a"), col("set_b"))).cast("double") /
          greatest(size(array_union(col("set_a"), col("set_b"))), lit(1)).cast("double"), 4))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Embedding-cosine near-duplicates via sign-bit LSH: bucket on
    * hashed chunks of the leading `nBits` dimensions' sign pattern,
    * verify cosine within buckets. High-cosine pairs agree on most sign
    * bits, so 4 chunks of nBits/4 keep recall while pruning the
    * quadratic pair space.
    */
  def embeddingPairs(emb: DataFrame, idCol: String, vecCol: String,
                     minCosine: Double = 0.9, nBits: Int = 16): DataFrame = {
    require(nBits % 4 == 0)
    val chunkBits = nBits / 4
    val base = emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val withSigns = base.withColumn("signs",
      slice(transform(col("vec"), v => when(v >= 0, lit(1)).otherwise(lit(0))), 1, nBits))
    val chunked = withSigns.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(3)),
        c => hash(slice(col("signs"), c * chunkBits + 1, lit(chunkBits)), c)))
        .as(Seq("chunk", "key")))
    val cand = bucketPairs(chunked, Seq("chunk", "key"))
    val vA = base.select(col("id").as("id_a"), col("vec").as("vec_a"))
    val vB = base.select(col("id").as("id_b"), col("vec").as("vec_b"))
    cand.join(vA, Seq("id_a")).join(vB, Seq("id_b"))
      .withColumn("cos_sim", round(VectorFunctions.cosine(col("vec_a"), col("vec_b")), 4))
      .filter(col("cos_sim") >= minCosine)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
  }
}
