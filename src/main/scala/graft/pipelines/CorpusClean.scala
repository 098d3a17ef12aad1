package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.{Clusters, NearDup}
import graft.functions.TextFunctions

/** End-to-end training-corpus cleaning: the composed pipeline a 100 TB
  * pretraining-data job runs, built entirely from graft operators.
  *
  * quality/lang annotate (one map pass) → quality floor filter →
  * exact dedup on the normalized form (one shuffle) → MinHash-LSH
  * near-dup clustering → keep each cluster's canonical doc. Every stage
  * is a narrow transform or a single keyed shuffle; nothing is
  * corpus-quadratic.
  */
object CorpusClean {

  case class Config(
      minQualityBp: Int = 3000,
      languages: Set[String] = Set.empty, // empty = keep all
      shingleLen: Int = 3,
      jaccardThreshold: Double = 0.8)

  /** Returns the cleaned corpus: original columns + quality_bp,
    * pred_lang. Dropped: below-floor quality, out-of-scope languages,
    * normalized exact dups (min doc_id wins), near-dup cluster
    * non-canonicals.
    *
    * The returned frame is MATERIALIZED (persisted + counted) and every
    * intermediate cache — the dedup survivors, the LSH pair set, the
    * cluster mapping — is released before returning, so a session running
    * many pipelines doesn't accumulate storage blocks. The caller
    * releases the result with `unpersist()`/`clearCache()`; a production
    * 100 TB run would instead stream the result straight to its sink and
    * skip the final persist.
    */
  def run(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    // tokenize ONCE into a column; quality + language both read it (the
    // compose-by-column form would re-run the regex split per metric —
    // higher-order-function expressions sit outside codegen CSE)
    val annotated = docs
      .withColumn("__toks", TextFunctions.tokens(col("text")))
      .withColumn("quality_bp", TextFunctions.qualityScoreT(col("__toks"), col("text")))
      .withColumn("pred_lang", TextFunctions.langIdT(col("__toks")))
      .drop("__toks")

    val qualityKept = annotated.filter(col("quality_bp") >= cfg.minQualityBp)
    val langKept = if (cfg.languages.isEmpty) qualityKept
      else qualityKept.filter(col("pred_lang").isin(cfg.languages.toSeq: _*))

    // exact dedup on the canonical text form, min doc_id survives
    // persisted: feeds the minhash sketches, the cluster id set AND the
    // final semi-join — its lineage (annotate + dedup window) would
    // otherwise recompute for each consumer. The dedup key is the
    // 128-bit md5 of the canonical form, not the form itself: the
    // dedup shuffle then moves 16 bytes per row instead of the document
    // text (and 128 bits stays collision-safe at 100 TB corpus sizes,
    // unlike a 64-bit hash).
    val normKeep = langKept
      .withColumn("__normh", md5(TextFunctions.normalizeForDedup(col("text"))))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__normh"))
          .orderBy(col("doc_id"))))
      .filter(col("__rn") === 1)
      .drop("__normh", "__rn")
      .persist()

    // near-dup clusters over the survivors; keep canonical members only.
    // minhashPairs and canonicalize each return MATERIALIZED frames and
    // free their own intermediates; both are released here once consumed.
    val pairs = NearDup.minhashPairs(normKeep, "doc_id", "text",
      shingleLen = cfg.shingleLen, threshold = cfg.jaccardThreshold)
    val mapping = Clusters.canonicalize(
      normKeep.select(col("doc_id").as("id")), pairs.select(col("id_a"), col("id_b")))
    val canon = mapping
      .filter(col("id") === col("canonical_id"))
      .select(col("id").as("doc_id"))

    val out = normKeep.join(canon, Seq("doc_id"), "left_semi").persist()
    out.count() // materialize, then release everything upstream
    pairs.unpersist()
    mapping.unpersist()
    normKeep.unpersist()
    out
  }
}
