package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Observational causal inference: propensity-score matching as a
  * nearest-neighbor join on the score axis.
  *
  * The reference's analytics tier compares treated/untreated segments
  * with plain group-bys (EcomProvider.cs:616); matching is the standard
  * upgrade when assignment is confounded (Rosenbaum & Rubin 1983).
  * Re-expressed Spark-first, 1-NN matching WITH replacement is exactly
  * an as-of join where the "time" axis is the score: within each
  * stratum, every treated unit takes the control whose score is nearest
  * (ties prefer the at-or-below control — AsOf's backward preference).
  * That reuses the single-shuffle two-frame machine in [[AsOf]] instead
  * of a treated×control distance join: O(n log n) per stratum, never
  * O(n·m), and the stratum key keeps partitions balanced at 100 TB
  * (exact covariate blocking + nearest score is also statistically
  * tighter than global matching).
  *
  * Greedy WITHOUT-replacement matching is inherently sequential (each
  * match consumes a control) — that variant belongs on a per-stratum
  * mapGroups only when strata are small; the with-replacement estimator
  * here is the standard parallelizable form.
  */
object Causal {

  /** 1-NN caliper matching with replacement, stratified.
    *
    * `df` must carry: `idCol` (unique), `strataCol` (exact-match block,
    * e.g. nation), `scoreCol` (LONG — quantize scores to integer units
    * first; exactness of the distance compare depends on it),
    * `treatedCol` (boolean), `outcomeCol` (LONG, e.g. cents).
    *
    * Controls are deduplicated per (stratum, score) to the MIN id (the
    * as-of right side must be unique per key+axis; min-id is the
    * deterministic winner). Output: one row per treated unit that found
    * a control within `caliper` score units — (id, stratum, score,
    * outcome, match_id, match_score, match_outcome, effect) with
    * effect = outcome − match_outcome (exact integer). Mean(effect)
    * over the output is the ATT estimate; it stays per-row here so the
    * caller chooses the aggregation grain.
    */
  def propensityMatch(df: DataFrame, idCol: String, strataCol: String,
                      scoreCol: String, treatedCol: String,
                      outcomeCol: String, caliper: Long): DataFrame = {
    val treated = df.filter(col(treatedCol))
      .select(col(strataCol), col(scoreCol), col(idCol), col(outcomeCol))
    // min(struct(id, outcome)) orders by id first (unique), so the
    // winner and ITS outcome travel together — no second join
    val controls = df.filter(!col(treatedCol))
      .groupBy(col(strataCol), col(scoreCol))
      .agg(min(struct(col(idCol), col(outcomeCol))).as("__w"))
      .select(col(strataCol), col(scoreCol),
        col("__w").getField(idCol).as("match_id"),
        col("__w").getField(outcomeCol).as("match_outcome"),
        col(scoreCol).as("match_score"))
    val joined = AsOf.joinAsOf(treated, controls, Seq(strataCol),
      scoreCol, Seq("match_id", "match_outcome", "match_score"),
      prefix = "", direction = "nearest")
    joined
      .filter(col("match_id").isNotNull &&
        abs(col(scoreCol) - col("match_score")) <= caliper)
      .select(col(idCol), col(strataCol), col(scoreCol), col(outcomeCol),
        col("match_id"), col("match_score"), col("match_outcome"),
        (col(outcomeCol) - col("match_outcome")).as("effect"))
  }
}
