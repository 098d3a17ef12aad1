package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.Decontaminate
import graft.functions.TextFunctions

/** The full training-data preparation pipeline, composed end-to-end from
  * graft operators — the capstone run a pretraining data job executes:
  *
  *   clean (quality floor + exact/near dedup, CorpusClean)
  *   → decontaminate against the benchmark/eval set (broadcast, no
  *     corpus shuffle)
  *   → mixture-sample per source (deterministic hash rates, epoch
  *     replication)
  *   → reproducible train/val/test split (hash-bucketed, drift-free)
  *   → token counting → concat-and-chop sequence packing of the TRAIN
  *     slice (per-source windows, never a global sort)
  *
  * Every stage is a narrow transform, a single keyed shuffle, or a
  * broadcast join; the composition inherits each operator's 100 TB shape.
  * Stage counts come from ONE action per materialized stage boundary
  * (the same materialize-then-release contract CorpusClean uses).
  */
object TrainingData {

  case class Config(
      clean: CorpusClean.Config = CorpusClean.Config(),
      decontaminateN: Int = 13,
      rates: Map[String, Double] = Map.empty, // empty = keep all at 1.0
      fractions: Seq[(String, Double)] =
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
      packBudget: Int = 2048,
      // Some(salt): pack in deterministic HASH order (document mixing —
      // neighbors in a sequence come from across the corpus) instead of
      // doc_id order; None keeps corpus order
      packShuffleSalt: Option[Long] = None,
      // id → uniform [0,1) for the split assignment. Default = xxhash64
      // at salt 7 (DISTINCT from Mixture.sample's 0 — with the same
      // hash a fractional-rate source's keep-decision and the split
      // would be fully correlated and val/test would never see it).
      // Pluggable for the same reason as ContrastivePairs.hashFn: the
      // registered driver query injects a portable multiplicative hash
      // so the WHOLE pipeline replays in the DuckDB oracle; any
      // deterministic uniform hash preserves the split contract
      splitHash: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
        c => Mixture.uniformHash(c, salt = 7L))

  case class Metrics(input: Long, cleaned: Long, decontaminated: Long,
                     sampled: Long, trainPacked: Long)

  /** Returns (prepared frame, stage metrics). The frame carries
    * doc_id, source, split, epoch, n_tokens, and — for train rows —
    * seq_id/seq_pos packing coordinates (null for val/test, which are
    * never packed: eval sets stay document-shaped).
    */
  def prepare(docs: DataFrame, benchmark: DataFrame,
              cfg: Config = Config()): (DataFrame, Metrics) = {
    require(cfg.rates.values.forall(r => r >= 0 && r < 16),
      "per-source rates must be in [0, 16) — the epoch tiebreaker packs " +
        "epoch into 4 bits of the packing order")
    val input = docs.count()

    // pin the post-clean intermediate ONCE (the q_item_neighbors
    // pattern): it feeds the decontaminate sketch AND the keep-join, so
    // a cache-evicted persist would silently replay the whole
    // clean/dedup pipeline per consumer — the bench-variance source.
    // localCheckpoint truncates that lineage; the clean's own persist
    // is released immediately after.
    val cleanedRaw = CorpusClean.run(docs, cfg.clean) // materialized by contract
    val cleaned = cleanedRaw.localCheckpoint(true)
    cleanedRaw.unpersist()
    val nCleaned = cleaned.count()

    val dirty = Decontaminate.contaminatedIds(cleaned, benchmark,
      "doc_id", "text", n = cfg.decontaminateN)
    val decon = cleaned.join(dirty.withColumnRenamed("corpus_id", "doc_id"),
      Seq("doc_id"), "left_anti").persist()
    val nDecon = decon.count()
    // the pinned blocks stay alive for the query's lifetime (the SE
    // q_item_neighbors precedent): downstream stages MAY re-read the
    // checkpoint past this point (measured — an eager free here turned
    // the silent decon re-read into CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND),
    // and the ContextCleaner reclaims the blocks once the frame is
    // unreachable. Explicit freeing is for per-round loops (Graphs LPA),
    // not single-pin pipelines.

    val sampled = (if (cfg.rates.isEmpty) decon.withColumn("epoch", lit(0))
      else Mixture.sample(decon, "source", "doc_id", cfg.rates))
      .withColumn("n_tokens", TextFunctions.tokenCount(col("text")).cast("long"))
      .select(col("doc_id"), col("source"), col("epoch"), col("n_tokens"))
    val split = Mixture.split(sampled,
      cfg.splitHash(col("doc_id")), cfg.fractions).persist()
    val nSampled = split.count()
    decon.unpersist()

    // pack ONLY the train slice, per source; (doc_id, epoch) makes the
    // packing order unique when replication duplicates a doc, and the
    // optional salt swaps corpus order for reproducible shuffled mixing
    val baseOrd = col("doc_id") * 16 + col("epoch")
    // struct order key: hash first, unique baseOrd as collision tiebreak
    val ord = cfg.packShuffleSalt.fold(baseOrd)(salt =>
      struct(xxhash64(baseOrd, lit(salt)), baseOrd))
    val train = Mixture.packSequences(
      split.filter(col("split") === cfg.fractions.head._1)
        .withColumn("__ord", ord),
      "source", "__ord", "n_tokens", cfg.packBudget)
      .drop("__ord")
    val eval = split.filter(col("split") =!= cfg.fractions.head._1)
      .withColumn("seq_id", lit(null).cast("int"))
      .withColumn("seq_pos", lit(null).cast("int"))
    val out = train.unionByName(eval).persist()
    val nTrain = out.filter(col("seq_id").isNotNull).count()
    split.unpersist()
    (out, Metrics(input, nCleaned, nDecon, nSampled, nTrain))
  }
}
