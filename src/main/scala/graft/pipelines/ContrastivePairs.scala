package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contrastive training-pair mining — build (anchor, positive, negative)
  * triplets for retrieval-encoder training (the SimCSE/DPR data shape)
  * from the corpus itself: positives are verified NEAR-duplicates in a
  * Jaccard band (similar enough to share meaning, not so identical the
  * pair teaches nothing), negatives are deterministic hash-picked
  * documents PROVEN not near-dup of the anchor.
  *
  * Scale shape: positives ride the existing MinHash-LSH pipeline (one
  * bucket shuffle, bounded buckets — `NearDup.minhashPairs`); negative
  * candidates come from a `negBuckets`-row broadcast table (one
  * representative doc per hash bucket — a tiny aggregate, never a
  * corpus join); the not-near-dup guarantee is one anti join against
  * the (small) pair set. Every choice is a pure hash function of the
  * ids — reproducible across runs and partitionings.
  *
  * Both orientations of each positive pair anchor a triplet (a near-dup
  * relation is symmetric; training wants both directions).
  */
object ContrastivePairs {

  /** (anchor_id, positive_id, negative_id, jaccard) triplets.
    *
    * `minJbp`/`maxJbp` bound the positive band in Jaccard basis points;
    * `negBuckets` controls negative diversity (one candidate per
    * bucket); `salt` decorrelates the negative assignment from the
    * corpus ids.
    *
    * `hashFn` is the id→bucket hash behind the negative assignment —
    * any salted integer hash works because the choice of negative only
    * needs determinism and decorrelation, not avalanche quality.
    * Default is xxhash64 (production). The registered driver query
    * injects a portable multiplicative hash instead so the WHOLE
    * triplet pipeline replays in the DuckDB oracle (the round-7
    * portable-hash rule: never let an engine-private hash decide
    * driver-checked output).
    */
  def mine(docs: DataFrame, idCol: String, textCol: String,
           minJbp: Int = 5000, maxJbp: Int = 9900,
           numHashes: Int = 64, bands: Int = 16, shingleLen: Int = 3,
           negBuckets: Int = 64, salt: Long = 7L,
           hashFn: (org.apache.spark.sql.Column, Long) => org.apache.spark.sql.Column =
             (c, s) => xxhash64(c, lit(s))): DataFrame = {
    require(minJbp >= 0 && maxJbp <= 10000 && minJbp < maxJbp,
      "need 0 <= minJbp < maxJbp <= 10000")
    val pairs = graft.dedup.NearDup.minhashPairs(docs, idCol, textCol,
      numHashes, bands, shingleLen, threshold = minJbp / 10000.0)
    val banded = pairs.filter(col("jaccard") * 10000 <= maxJbp)
    // both orientations: near-dup is symmetric, training wants both
    val anchors = banded.select(col("id_a").as("anchor_id"),
        col("id_b").as("positive_id"), col("jaccard"))
      .unionByName(banded.select(col("id_b").as("anchor_id"),
        col("id_a").as("positive_id"), col("jaccard")))
    // negative candidates: ONE representative per hash bucket (smallest
    // secondary hash, id tiebreak) — a negBuckets-row broadcast table
    val negCand = docs
      .select(col(idCol).as("__nid"),
        pmod(hashFn(col(idCol), salt), lit(negBuckets.toLong)).as("__nb"))
      .groupBy(col("__nb"))
      .agg(min(struct(hashFn(col("__nid"), salt + 1).as("h"),
        col("__nid").as("id"))).as("__w"))
      .select(col("__nb"), col("__w.id").as("negative_id"))
    // the anchor's negative bucket: shifted off its own bucket so the
    // candidate is almost always a different doc; exact exclusions below
    val withNeg = anchors
      .withColumn("__nb", pmod(hashFn(col("anchor_id"), salt) + 1L,
        lit(negBuckets.toLong)))
      .join(broadcast(negCand), Seq("__nb"))
      .drop("__nb")
      .filter(col("negative_id") =!= col("anchor_id") &&
        col("negative_id") =!= col("positive_id"))
    // PROVEN not near-dup: drop triplets whose (anchor, negative) is in
    // the pair set, either orientation
    val exclude = pairs.select(col("id_a").as("anchor_id"),
        col("id_b").as("negative_id"))
      .unionByName(pairs.select(col("id_b").as("anchor_id"),
        col("id_a").as("negative_id")))
    withNeg.join(exclude, Seq("anchor_id", "negative_id"), "left_anti")
      .select(col("anchor_id"), col("positive_id"), col("negative_id"),
        col("jaccard"))
  }
}
