package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pre-flight diagnostics for joins and aggregations at scale: cheap
  * bounded-state summaries that catch the two classic 100 TB killers
  * BEFORE a job runs — the skewed hot key (one straggler task holding
  * the stage) and the many-to-many join explosion (output orders of
  * magnitude beyond either input). Both reuse the engine's bounded
  * sketch machinery ([[HeavyHitters]] Misra–Gries candidates + exact
  * verify): two scans, candidate state capped, nothing full-cardinality.
  */
object Diagnostics {

  /** Per-key skew report: every key holding ≥ `phi` of the rows, with
    * its exact count, share (basis points), and skew multiplier vs the
    * MEAN key load (`n_rows × n_distinct / total` — how many
    * average-key partitions this one key equals; the number a shuffle
    * planner cares about). `n_distinct` is an HLL estimate (±~2%), the
    * heavy-key counts are exact.
    */
  def keySkew(df: DataFrame, key: Column, phi: Double = 0.001): DataFrame = {
    val heavy = HeavyHitters.frequentKeys(df, key, phi)
    val totals = df.select(key.cast("string").as("hh_key"))
      .filter(col("hh_key").isNotNull)
      .agg(count(lit(1)).as("__total"),
        approx_count_distinct(col("hh_key")).as("__distinct"))
    heavy.crossJoin(broadcast(totals)) // one row
      .select(col("hh_key").as("key"), col("n_rows"),
        floor(col("n_rows") * 10000.0 / col("__total")).cast("long")
          .as("share_bp"),
        (col("n_rows") * col("__distinct") / col("__total")).cast("double")
          .as("skew_x"))
  }

  /** Benford first-digit audit — the classic "does this numeric feed look
    * organic?" data-quality signal (fabricated/corrupted feeds drift from
    * the logarithmic first-digit law). Values floor to integers FIRST so
    * digit extraction goes through exact integer-to-string rendering
    * (double formatting is engine-divergent); non-positive values are
    * excluded. Expected shares are the published Benford basis points as
    * PINNED constants — computing log10(1+1/d) at runtime would hang a
    * cross-engine comparison on libm's last ulp.
    *
    * Output: one row per digit 1-9 (absent digits count 0):
    * (digit, n, share_bp, expected_bp, delta_bp). One grouped count (9
    * groups) + one broadcast totals row.
    */
  def benford(df: DataFrame, value: Column): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    val expectedBp =
      Seq(1 -> 3010L, 2 -> 1761L, 3 -> 1249L, 4 -> 969L, 5 -> 792L,
        6 -> 669L, 7 -> 580L, 8 -> 512L, 9 -> 458L)
        .toDF("digit", "expected_bp")
    val counts = df.select(floor(value).cast("long").as("v"))
      .filter(col("v") > 0)
      .select(substring(col("v").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = counts.agg(coalesce(sum(col("n")), lit(0L)).as("__total"))
    broadcast(expectedBp).join(counts, Seq("digit"), "left_outer")
      .na.fill(0L, Seq("n"))
      .crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        floor(col("n") * 10000.0 / greatest(col("__total"), lit(1L)) + 0.5)
          .cast("long").as("share_bp"),
        col("expected_bp"),
        (floor(col("n") * 10000.0 / greatest(col("__total"), lit(1L)) + 0.5)
          .cast("long") - col("expected_bp")).as("delta_bp"))
  }

  /** Referential-integrity report: for each declared FK, how many fact
    * rows point at a key absent from its dimension — the audit artifact
    * behind the reference's relation cleanup (CleanRelationsTables,
    * EcomDestinationWriter.cs:4191) and the pre-flight a full-sync delete
    * deserves. Null FKs are NOT orphans (SQL reference-integrity
    * semantics — and a null never equi-matches, so without the explicit
    * filter an anti join would miscount them as orphans).
    *
    * Per FK: one anti join (dimension side reduced to distinct keys —
    * broadcast when dimension-sized) + one count; the per-FK 1-row
    * results union into the report. Output:
    * (fk_name, n_orphans, n_rows, orphan_bp).
    */
  def fkOrphans(fact: DataFrame,
                fks: Seq[(String, String, DataFrame, String)]): DataFrame = {
    require(fks.nonEmpty)
    val totals = fact.agg(count(lit(1)).as("n_rows"))
    val reports = fks.map { case (name, factKey, dim, dimKey) =>
      fact.select(col(factKey)).filter(col(factKey).isNotNull)
        .join(dim.select(col(dimKey).as(factKey)).distinct(),
          Seq(factKey), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
        .select(lit(name).as("fk_name"), col("n_orphans"))
    }
    reports.reduce(_ unionByName _)
      .crossJoin(broadcast(totals))
      .select(col("fk_name"), col("n_orphans"), col("n_rows"),
        floor(col("n_orphans") * 10000.0 / greatest(col("n_rows"), lit(1L)) + 0.5)
          .cast("long").as("orphan_bp"))
  }

  /** k-anonymity audit — the privacy pre-flight before a dataset leaves
    * the pipeline (Sweeney 2002): every combination of quasi-identifier
    * values shared by FEWER than `k` rows is a re-identification risk.
    * The complement of [[graft.functions.TextFunctions]]-style PII
    * redaction: redaction scrubs direct identifiers, this audits whether
    * the remaining columns still single people out.
    *
    * One keyed aggregate with partial map-side combine (same cost as any
    * groupBy — no self-join, no window), then a filter to the violating
    * classes. The violating set is the actionable artifact: generalize or
    * suppress exactly these rows. Output: (quasiCols..., class_size),
    * class_size < k.
    */
  def kAnonymityViolations(df: DataFrame, quasiCols: Seq[String],
                           k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be at least 2, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .filter(col("class_size") < k)
  }

  /** One-row k-anonymity summary: (n_classes, n_violating_classes,
    * rows_at_risk, risk_bp) — the gate value a release pipeline checks
    * before [[kAnonymityViolations]]'s detail is worth reading. Derived
    * from the SAME single grouped count (one shuffle; the class frame is
    * cardinality-sized, far below the data).
    */
  def kAnonymityStats(df: DataFrame, quasiCols: Seq[String],
                      k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be at least 2, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("class_size") < k, 1L).otherwise(0L))
          .as("n_violating_classes"),
        sum(when(col("class_size") < k, col("class_size")).otherwise(0L))
          .as("rows_at_risk"),
        floor(sum(when(col("class_size") < k, col("class_size")).otherwise(0L))
            * 10000.0 / greatest(sum(col("class_size")), lit(1L)) + 0.5)
          .cast("long").as("risk_bp"))
  }

  /** l-diversity violations (Machanavajjhala ICDE'06): k-anonymity is
    * not enough when a small class is homogeneous in the SENSITIVE
    * attribute — every member leaks it even at class_size ≥ k. Returns
    * the quasi-identifier classes whose sensitive column shows fewer
    * than `l` distinct values: quasi cols + (class_size,
    * n_sensitive_values). Distinct counts are EXACT by requirement (a
    * privacy gate cannot run on an estimate); one grouped aggregate
    * with a single distinct column — Spark's two-phase
    * partial-distinct rewrite, no Expand multiplication.
    */
  def lDiversityViolations(df: DataFrame, quasiCols: Seq[String],
                           sensitiveCol: String, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 2, s"l must be at least 2, got $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("n_sensitive_values"))
      .filter(col("n_sensitive_values") < l)
  }

  /** Lower bound on an equi-join's output from the heavy keys of BOTH
    * sides: Σ over shared heavy keys of cnt_a × cnt_b, plus each side's
    * row count (any non-heavy match adds at least ~1 row per probe-side
    * row in the worst accounting, so the heavy-product is the part that
    * explodes). The EXACT join size costs as much as the join; this
    * costs two bounded scans per side and catches the hot-key blowup
    * that matters. Returns one row:
    * (heavy_product_rows, shared_heavy_keys, rows_a, rows_b).
    */
  def joinExplosionBound(a: DataFrame, keyA: Column,
                         b: DataFrame, keyB: Column,
                         phi: Double = 0.001): DataFrame = {
    val ha = HeavyHitters.frequentKeys(a, keyA, phi)
      .select(col("hh_key"), col("n_rows").as("__na"))
    val hb = HeavyHitters.frequentKeys(b, keyB, phi)
      .select(col("hh_key"), col("n_rows").as("__nb"))
    val prod = ha.join(hb, Seq("hh_key"))
      .agg(coalesce(sum(col("__na") * col("__nb")), lit(0L))
          .as("heavy_product_rows"),
        count(lit(1)).as("shared_heavy_keys"))
    val counts = a.agg(count(lit(1)).as("rows_a"))
      .crossJoin(b.agg(count(lit(1)).as("rows_b")))
    prod.crossJoin(broadcast(counts))
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian 2007) — the third
    * rung of the privacy ladder after k-anonymity (class size) and
    * l-diversity (sensitive cardinality): a class can be large AND
    * diverse yet still leak by having a sensitive DISTRIBUTION far
    * from the global one (all-high-earners in one quasi-class). For an
    * ORDERED sensitive attribute pre-bucketed into `bucketCol` ∈
    * [0, nBuckets), the distance is the ordered-domain EMD — the mean
    * |cumulative difference| between the class and global bucket
    * distributions.
    *
    * Exactness: the cumulative difference at bucket j is
    * C_j = Σ_{i≤j}(c_i·N − g_i·n_class) — INTEGER; t·10⁴ =
    * Σ_j|C_j| · 10⁴ / (n_class·N·(nBuckets−1)) is one decimal floor
    * division. No float anywhere, trivially oracle-replayable.
    *
    * Shape: one (class, bucket) grouped count + one global bucket
    * count; the class×bucket grid joins two POST-aggregation frames
    * (bucket side broadcast by construction); the cumsum windows over
    * nBuckets rows per class.
    */
  def tCloseness(df: DataFrame, quasiCols: Seq[String], bucketCol: String,
                 nBuckets: Int): DataFrame = {
    require(quasiCols.nonEmpty && nBuckets >= 2)
    def dec(c: Column) = c.cast("decimal(38,0)")
    val qs = quasiCols.map(col)
    val cls = df.groupBy(qs :+ col(bucketCol).as("__b"): _*)
      .agg(count(lit(1)).as("__c"))
    val glob = df.groupBy(col(bucketCol).as("__b"))
      .agg(count(lit(1)).as("__g"))
    val tot = df.agg(count(lit(1)).as("__n"))
    val classes = cls.groupBy(qs: _*).agg(sum(col("__c")).as("__nc"))
    // full grid: every class × every observed bucket (absent cells = 0)
    val grid = classes.crossJoin(broadcast(glob))
      .join(cls, quasiCols :+ "__b", "left")
      .withColumn("__c", coalesce(col("__c"), lit(0L)))
      .crossJoin(broadcast(tot))
    val w = Window.partitionBy(qs: _*).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = grid.withColumn("__cum",
      sum(dec(col("__c")) * dec(col("__n")) -
        dec(col("__g")) * dec(col("__nc"))).over(w))
    withCum.groupBy(qs :+ col("__nc").as("n_class") :+ col("__n").as("__nn"): _*)
      .agg(sum(abs(col("__cum"))).as("__s"))
      .withColumn("t_bp", {
        val num = col("__s") * lit(10000L)
        val den = dec(col("n_class")) * dec(col("__nn")) *
          lit((nBuckets - 1).toLong)
        ((num - pmod(num, den)) / den).cast("long")
      })
      .drop("__s", "__nn")
  }

  /** Functional-dependency audit over candidate column pairs: for each
    * lhs → rhs candidate, does lhs determine rhs, and if not, how
    * badly? Reports the TANE g₃ error (Huhtala et al. 1999) — the
    * minimum number of rows to delete for the FD to hold, i.e.
    * Σ_lhs (group size − max single-rhs count) — alongside the
    * violating-lhs count. The workhorse of schema recovery over
    * denormalized feeds: a g₃ of 0 certifies a join-lineage column, a
    * small g₃ flags dirty rows, a large one disproves the dependency.
    *
    * Shape: ONE input scan — candidates fan out as generated structs
    * (×p rows, not p scans), then one grouped count, re-aggregated
    * per lhs, then to one row — each stage map-side combinable, state
    * bounded by the (lhs, rhs) cardinality, never raw rows. Candidates
    * union AFTER aggregation (p tiny frames, not p full scans of
    * unioned raw data). Rows with NULL lhs are dropped (a null
    * determinant determines nothing); NULL rhs counts as a regular
    * value (GROUP BY null-equality, identical in Spark and ANSI SQL).
    */
  def fdProfile(df: DataFrame, candidates: Seq[(String, String)]): DataFrame = {
    require(candidates.nonEmpty, "need at least one lhs -> rhs candidate")
    // ONE scan: each row fans into one struct per candidate (a ×p
    // Generate beats p full scans of a 100 TB table); values compare
    // STRINGIFIED (toString is injective within one typed column), and
    // a null rhs rides a (isnull, value) struct so it stays distinct
    // from any real string
    val fan = explode(array(candidates.map { case (lhs, rhs) =>
      struct(lit(lhs).as("__ln"), lit(rhs).as("__rn"),
        col(lhs).cast("string").as("__l"),
        struct(col(rhs).isNull.as("__rnull"),
          col(rhs).cast("string").as("__rv")).as("__r"))
    }: _*))
    val pairCounts = df.select(fan.as("__c")).select(col("__c.*"))
      .filter(col("__l").isNotNull)
      .groupBy(col("__ln"), col("__rn"), col("__l"), col("__r"))
      .agg(count(lit(1)).as("__n"))
    val perLhs = pairCounts.groupBy(col("__ln"), col("__rn"), col("__l"))
      .agg(count(lit(1)).as("__kr"), sum(col("__n")).as("__rows"),
        max(col("__n")).as("__keep"))
    perLhs.groupBy(col("__ln").as("lhs"), col("__rn").as("rhs"))
      .agg(count(lit(1)).as("n_lhs"),
        sum(when(col("__kr") > 1, 1L).otherwise(0L)).as("n_violating"),
        sum(col("__rows")).as("n_rows"),
        sum(col("__rows") - col("__keep")).as("g3_remove"))
      .withColumn("fd_holds", col("n_violating") === 0L)
  }
}
