package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Clusters
import graft.operators.{FuzzyJoin, Survivorship}

/** Entity resolution end-to-end — the MDM loop the reference runs piecewise
  * (resolve-by-name ladders EcomDestinationWriter.cs:4146/4524, merged
  * values :4453) composed from the engine's own parts:
  *
  *   1. CANDIDATE PAIRS: [[FuzzyJoin.byEditDistance]] — PassJoin segment
  *      blocking, so the near-duplicate name pairs surface from ONE equi
  *      join (never an O(n²) cross join; FuzzyJoinSpec proves pair-set
  *      equality with the naive form).
  *   2. IDENTITY CLOSURE: [[Clusters.canonicalize]] — pointer-jumping
  *      union-find over the pair graph; transitive chains (A≈B≈C) merge
  *      even when A and C are not directly similar.
  *   3. SURVIVORSHIP: [[Survivorship.goldenRecord]] — per-attribute
  *      most-preferred non-null value within each identity group; one
  *      keyed aggregate.
  *
  * Every stage is keyed/bounded: the segment join's blow-up bound, the
  * closure's capped rounds + loud non-convergence, one shuffle for the
  * merge. Output: one golden record per canonical identity with the
  * group size.
  */
object EntityResolution {

  /** `entities` must carry `idCol` (unique), `nameCol` (the fuzzy business
    * key), `prefCols` (higher = more preferred source ordering; must
    * totally order rows within a group — include the id) and `valueCols`
    * (the attributes to survive). `maxDist` is the name edit-distance
    * threshold (names shorter than maxDist+1 chars only match exactly —
    * the PassJoin contract).
    */
  def resolve(entities: DataFrame, idCol: String, nameCol: String,
              maxDist: Int, prefCols: Seq[Column],
              valueCols: Seq[String]): DataFrame = {
    val l = entities.select(col(idCol).as("id_a"), col(nameCol).as("__na"))
    val r = entities.select(col(idCol).as("id_b"), col(nameCol).as("__nb"))
    val fuzzy = FuzzyJoin.byEditDistance(l, r, "__na", "__nb", maxDist,
        leftRowId = Some("id_a"), rightRowId = Some("id_b"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    // names below the segment-join length floor still deserve their
    // EXACT duplicates: one equi self-join on the name catches them
    val exact = l.join(r, col("__na") === col("__nb") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    val pairs = fuzzy.unionByName(exact).dropDuplicates("id_a", "id_b")

    val canon = Clusters.canonicalize(entities.select(col(idCol).as("id")), pairs)
    val tagged = entities.join(
      canon.withColumnRenamed("id", idCol), Seq(idCol))
    val golden = Survivorship.goldenRecord(tagged, Seq("canonical_id"),
      prefCols, valueCols)
    val sizes = tagged.groupBy(col("canonical_id"))
      .agg(count(lit(1)).as("n_members"))
    golden.join(sizes, Seq("canonical_id"))
  }
}
