package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Classical statistical tests and series diagnostics as exact-moment
  * aggregations: chi-square independence, Welch two-sample comparison,
  * Kaplan-Meier survival, autocorrelation, and additive seasonal
  * decomposition.
  *
  * The reference's analytics tier surfaces these as report queries over
  * the synced tables (EcomProvider.cs:616 aggregates order statistics
  * per group for exactly this kind of downstream test); here each one is
  * ONE exact aggregation pass over the fact table — sums/counts in
  * BIGINT or DECIMAL(38,0), which are order-independent and therefore
  * hash-stable — followed by a pinned-parenthesization double finish on
  * the tiny aggregated frame, quantized to basis points. The 100 TB
  * shape: the statistic's input moments combine map-side (plain
  * partial aggregation), the finish touches rows ∝ cells/times/lags,
  * never ∝ input.
  *
  * Integer-window contracts (document per method) follow the repo rule:
  * quantized inputs must keep every exact product inside BIGINT or the
  * explicitly-cast decimal; callers above the bound pre-aggregate.
  */
object Stats {

  private def D(c: Column): Column = c.cast("double")
  private def bp(c: Column): Column = floor(c * lit(10000.0) + lit(0.5)).cast("long")

  /** Pearson chi-square test of independence over the `aCol` × `bCol`
    * contingency table. Returns ONE ROW PER CELL of the full grid
    * (zero-observed cells included — dropping them understates the
    * statistic): (a, b, obs, term_bp) plus the grand `chi2_bp` and
    * `dof` repeated on every row so the output is self-contained.
    *
    * Shape: one grouped count per margin + one for the cells (all
    * combine map-side); the grid is the CROSS JOIN OF THE MARGINS —
    * both post-aggregation frames, broadcast by construction. Caller
    * contract: a and b are low-cardinality categoricals (the test is
    * meaningless otherwise); n·n must fit a long (n < 3·10⁹ — above
    * that, test a uniform sample; the statistic's power saturates long
    * before).
    *
    * Exactness: obs·n − na·nb is computed in BIGINT (exact), the single
    * division happens once in double with pinned parenthesization, and
    * the per-cell quantized terms sum in BIGINT — cross-engine
    * deterministic end to end.
    */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    // NULL CATEGORIES ARE DROPPED, loudly by contract: a null key would
    // count in the margins yet never match the grid's equi-join (NULL
    // != NULL), silently vanishing observations from the statistic —
    // callers wanting missingness as a level fillna() an explicit
    // sentinel first. (Audit catch on this round's own first cut.)
    val dfNN = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
    // ONE scan of the input: margins, the grand total, and the grid
    // dimensions all re-aggregate the CELL frame (|a|·|b| rows), which
    // is pinned because four consumers re-read it — at 100 TB the
    // alternative is five full passes
    val cells = dfNN.groupBy(col(aCol), col(bCol)).agg(count(lit(1)).as("__o"))
      .localCheckpoint(true)
    val aMar = cells.groupBy(col(aCol)).agg(sum(col("__o")).as("__na"))
    val bMar = cells.groupBy(col(bCol)).agg(sum(col("__o")).as("__nb"))
    val tot = cells.agg(sum(col("__o")).as("__n"))
    val aCnt = aMar.agg(count(lit(1)).as("__ka"))
    val bCnt = bMar.agg(count(lit(1)).as("__kb"))
    val grid = aMar.crossJoin(broadcast(bMar)).crossJoin(broadcast(tot))
      .crossJoin(broadcast(aCnt)).crossJoin(broadcast(bCnt))
      .join(cells, Seq(aCol, bCol), "left")
      .withColumn("obs", coalesce(col("__o"), lit(0L)))
    // d = obs·n − na·nb exact in BIGINT; term = d² / (n·na·nb), ONE
    // double expression with explicit parens replayed by the oracle
    val d = D(col("obs") * col("__n") - col("__na") * col("__nb"))
    val term = (d * d) /
      (D(col("__n")) * D(col("__na")) * D(col("__nb")))
    val terms = grid.select(col(aCol), col(bCol), col("obs"),
      bp(term).as("term_bp"),
      ((col("__ka") - 1) * (col("__kb") - 1)).cast("long").as("dof"))
    // the grand total rides a window over the CELL GRID — a frame of
    // |a|·|b| rows by contract, not input-sized
    terms.withColumn("chi2_bp",
      sum(col("term_bp")).over(Window.partitionBy(lit(1))))
  }

  /** Welch's unequal-variance t-test plus a pooled two-proportion
    * z-test between `variant` 0 and 1, in one row:
    * (n0, n1, mean0_q, mean1_q, t_bp, conv0, conv1, z_bp).
    *
    * `xCol` is the pre-quantized LongType metric (|x| < 3·10⁹ so x²
    * stays in BIGINT); `convCol` a 0/1 LongType conversion flag. All
    * five moments per arm (n, Σx, Σx², conversions) come from ONE
    * aggregation with map-side combine (conditional sums, no second
    * scan, no shuffle beyond the single global agg); means are exact
    * floor-divided integers; the t and z finishes are pinned double
    * expressions over the one-row frame.
    */
  def welchAb(df: DataFrame, variantCol: String, xCol: String,
              convCol: String): DataFrame =
    welchFinish(abMoments(df, variantCol, xCol, convCol))

  /** The eight A/B moments as a ONE-ROW state table: (__n0, __n1, __s0,
    * __s1, __ss0, __ss1, __c0, __c1), all DECIMAL(38,0) — exact,
    * order-independent, and SIGNED-FOLDABLE: [[foldAbMoments]] maintains
    * this row under a CDC feed and [[welchFinish]] recovers the
    * identical statistic, so the experiment readout never rescans the
    * fact history (the IncrementalAgg design applied to test moments).
    */
  def abMoments(df: DataFrame, variantCol: String, xCol: String,
                convCol: String, sign: Column = lit(1L)): DataFrame = {
    def arm(v: Int, c: Column) = sum((when(col(variantCol) === v, c)
      .otherwise(lit(0L)) * sign).cast("decimal(38,0)"))
    val x = col(xCol)
    // a null metric/variant/flag row would enter n but not the sums —
    // inconsistent moments; excluded wholesale (subjects WITH a metric)
    val df2 = df.filter(col(variantCol).isNotNull && x.isNotNull &&
      col(convCol).isNotNull)
    df2.agg(
      arm(0, lit(1L)).as("__n0"), arm(1, lit(1L)).as("__n1"),
      arm(0, x).as("__s0"), arm(1, x).as("__s1"),
      arm(0, x * x).as("__ss0"), arm(1, x * x).as("__ss1"),
      arm(0, col(convCol)).as("__c0"), arm(1, col(convCol)).as("__c1"))
  }

  /** Fold a CDC batch (op = "I"/"D"; a delete carries the same variant/
    * x/conv the insert did) into the one-row moment state: delta
    * moments with ±1 sign, then a two-row union summed — exact decimal
    * algebra, so fold(init(A), feed) == init(A ⊎ feed).
    */
  def foldAbMoments(state: DataFrame, delta: DataFrame, variantCol: String,
                    xCol: String, convCol: String, opCol: String): DataFrame = {
    val sign = when(col(opCol) === "D", lit(-1L)).otherwise(lit(1L))
    val d = abMoments(delta, variantCol, xCol, convCol, sign)
    val cols = Seq("__n0", "__n1", "__s0", "__s1", "__ss0", "__ss1",
      "__c0", "__c1")
    state.unionByName(d)
      .agg(sum(col(cols.head)).cast("decimal(38,0)").as(cols.head),
        cols.tail.map(c => sum(col(c)).cast("decimal(38,0)").as(c)): _*)
  }

  /** The t/z finish over the one-row moment state (see [[welchAb]]). */
  def welchFinish(m: DataFrame): DataFrame = {
    def meanQ(s: Column, n: Column): Column =
      ((s - pmod(s, n)) / n).cast("long")
    def variance(n: Column, s: Column, ss: Column): Column =
      (D(n) * D(ss) - D(s) * D(s)) / (D(n) * (D(n) - lit(1.0)))
    val (n0, n1) = (col("__n0"), col("__n1"))
    val (s0, s1) = (col("__s0"), col("__s1"))
    val t = (D(s1) / D(n1) - D(s0) / D(n0)) /
      sqrt(variance(n1, s1, col("__ss1")) / D(n1) +
        variance(n0, s0, col("__ss0")) / D(n0))
    val p0 = D(col("__c0")) / D(n0)
    val p1 = D(col("__c1")) / D(n1)
    val pPool = (D(col("__c0")) + D(col("__c1"))) / (D(n0) + D(n1))
    val z = (p1 - p0) /
      sqrt(pPool * (lit(1.0) - pPool) * (lit(1.0) / D(n0) + lit(1.0) / D(n1)))
    m.select(
      n0.cast("long").as("n0"), n1.cast("long").as("n1"),
      meanQ(s0, n0).as("mean0_q"), meanQ(s1, n1).as("mean1_q"),
      bp(t).as("t_bp"),
      col("__c0").cast("long").as("conv0"), col("__c1").cast("long").as("conv1"),
      bp(z).as("z_bp"))
  }

  /** CUPED variance reduction (Deng, Xu, Kohavi & Walker WSDM'13): the
    * experiment metric Y adjusted by the pre-period covariate X,
    * Y' = Y − θ(X − mean(X)) with θ = cov(X,Y)/var(X) pooled across
    * arms — the published lever that shrinks A/B confidence intervals
    * without more traffic. One row per SUBJECT in (LongType `xCol`,
    * `yCol`, 0/1 `variantCol`); |x|,|y| < 3·10⁹ so the cross products
    * stay in BIGINT before the decimal sums. Output one row:
    * (n0, n1, theta_bp, raw_diff_q, adj_diff_q, vr_bp) — vr is the
    * variance-reduction ratio cov²/(varX·varY) = corr²(X,Y), the
    * fraction of metric variance the covariate removes.
    *
    * ONE aggregation pass (map-side combinable): per-arm counts and
    * sums plus the three global cross moments; the finish is a pinned
    * double expression over the one-row frame.
    */
  def cuped(df: DataFrame, variantCol: String, xCol: String,
            yCol: String): DataFrame = {
    val dfNN = df.filter(col(variantCol).isNotNull && col(xCol).isNotNull &&
      col(yCol).isNotNull)
    def arm(v: Int, c: Column) = sum(when(col(variantCol) === v, c)
      .otherwise(lit(0L)).cast("decimal(38,0)"))
    def S(c: Column) = sum(c.cast("decimal(38,0)"))
    val (x, y) = (col(xCol), col(yCol))
    val m = dfNN.agg(
      arm(0, lit(1L)).as("__n0"), arm(1, lit(1L)).as("__n1"),
      arm(0, x).as("__sx0"), arm(1, x).as("__sx1"),
      arm(0, y).as("__sy0"), arm(1, y).as("__sy1"),
      S(x * x).as("__sxx"), S(y * y).as("__syy"), S(x * y).as("__sxy"))
    val n = D(col("__n0")) + D(col("__n1"))
    val sx = D(col("__sx0")) + D(col("__sx1"))
    val sy = D(col("__sy0")) + D(col("__sy1"))
    val sxxC = n * D(col("__sxx")) - sx * sx
    val syyC = n * D(col("__syy")) - sy * sy
    val sxyC = n * D(col("__sxy")) - sx * sy
    val theta = sxyC / sxxC
    val meanX = sx / n
    val m0adj = D(col("__sy0")) / D(col("__n0")) -
      theta * (D(col("__sx0")) / D(col("__n0")) - meanX)
    val m1adj = D(col("__sy1")) / D(col("__n1")) -
      theta * (D(col("__sx1")) / D(col("__n1")) - meanX)
    val rawDiff = D(col("__sy1")) / D(col("__n1")) -
      D(col("__sy0")) / D(col("__n0"))
    val vr = (sxyC * sxyC) / (sxxC * syyC)
    m.select(
      col("__n0").cast("long").as("n0"), col("__n1").cast("long").as("n1"),
      bp(theta).as("theta_bp"),
      floor(rawDiff * lit(100.0) + lit(0.5)).cast("long").as("raw_diff_q"),
      floor((m1adj - m0adj) * lit(100.0) + lit(0.5)).cast("long").as("adj_diff_q"),
      bp(vr).as("vr_bp"))
  }

  /** Mann-Whitney U (Wilcoxon rank-sum) two-sample test — the
    * nonparametric sibling of [[welchAb]]: compares the DISTRIBUTIONS
    * of `xCol` between variant 0 and 1 without a normality assumption.
    * Output one row: (n0, n1, u2, z_bp) where `u2` = 2·U₁ (doubled so
    * the tied-rank half-units stay EXACT integers) and z is the
    * normal approximation WITH the standard tie correction.
    *
    * Scale shape: rows collapse to one row per DISTINCT VALUE first
    * (map-side combinable); tied ranks come from ONE ranged global
    * running sum over that value frame ([[RunningTotals]] — no
    * single-task window over raw rows); rank/tie moments are exact
    * DECIMAL sums; the z finish is one pinned double expression.
    */
  def mannWhitney(df: DataFrame, variantCol: String, xCol: String): DataFrame = {
    val df2 = df.filter(col(variantCol).isNotNull && col(xCol).isNotNull)
    val byV = df2.groupBy(col(xCol).as("__mwv"))
      .agg(count(lit(1)).as("__cnt"),
        sum(when(col(variantCol) === 1, 1L).otherwise(0L)).as("__cnt1"))
    val cum = RunningTotals.globalRunningSum(byV,
      Seq(col("__mwv").asc), "__cnt", "__cum") // inclusive
    // doubled average rank of the tie group at this value:
    // 2·(cumBefore + 1) + (cnt − 1) = 2·cumBefore + cnt + 1
    val r2 = lit(2L) * (col("__cum") - col("__cnt")) + col("__cnt") + lit(1L)
    def S(c: Column) = sum(c.cast("decimal(38,0)"))
    val m = cum.agg(
      S(col("__cnt") - col("__cnt1")).as("__n0"),
      S(col("__cnt1")).as("__n1"),
      S(col("__cnt1") * r2).as("__r12"), // 2·(rank sum of group 1)
      S(col("__cnt") * col("__cnt") * col("__cnt") - col("__cnt")).as("__t"))
    val (n0, n1) = (D(col("__n0")), D(col("__n1")))
    val n = n0 + n1
    val u2 = col("__r12") - col("__n1") * (col("__n1") + lit(1)) // exact 2·U1
    val z = (D(u2) / lit(2.0) - n0 * n1 / lit(2.0)) /
      sqrt((n0 * n1 / lit(12.0)) *
        ((n + lit(1.0)) - D(col("__t")) / (n * (n - lit(1.0)))))
    m.select(col("__n0").cast("long").as("n0"),
      col("__n1").cast("long").as("n1"),
      u2.cast("long").as("u2"), bp(z).as("z_bp"))
  }

  /** One-way ANOVA F across the groups of `groupCol`: F =
    * (SSB/(k−1)) / (SSW/(n−k)) from per-group exact moments (n, Σx,
    * Σx² in DECIMAL — one grouped aggregate, map-side combinable; the
    * group frame is tiny by the categorical contract). Output one row:
    * (k, n, f_bp). Completes the test family: chi-square (two
    * categoricals), Welch t (two means), Mann-Whitney (two
    * distributions), ANOVA (k means).
    *
    * Determinism: the textbook identity SSB = Σ_g s_g²/n_g − S²/n,
    * SSW = Σx² − Σ_g s_g²/n_g is evaluated with EVERY division as an
    * exact DECIMAL floor division (s² stays inside DECIMAL(38,0) for
    * |Σx| < 10¹⁹) — sums of exact integers, cancellation-free, and NO
    * double anywhere before the final F ratio. The first cut quantized
    * s_g²/n_g through a double: above 2⁵³ the term silently lost
    * low bits AND Spark's double→decimal cast (shortest-string) split
    * from DuckDB's exact-binary cast — caught by the sf gate, fixed by
    * never leaving integer arithmetic.
    */
  def anovaF(df: DataFrame, groupCol: String, xCol: String): DataFrame = {
    val dfNN = df.filter(col(groupCol).isNotNull && col(xCol).isNotNull)
    def S(c: Column) = sum(c.cast("decimal(38,0)"))
    // exact floor division of non-negative decimals
    def fdiv(a: Column, b: Column) = ((a - pmod(a, b)) / b).cast("decimal(38,0)")
    val g = dfNN.groupBy(col(groupCol)).agg(count(lit(1)).as("__ng"),
      S(col(xCol)).as("__sg"), S(col(xCol) * col(xCol)).as("__ssg"))
    val term = fdiv(col("__sg") * col("__sg"), col("__ng").cast("decimal(38,0)"))
    val m = g.agg(count(lit(1)).as("__k"), sum(col("__ng")).as("__n"),
      S(col("__sg")).as("__s"), sum(col("__ssg")).cast("decimal(38,0)").as("__ss"),
      sum(term).cast("decimal(38,0)").as("__bq")) // Σ ⌊s_g²/n_g⌋, exact
    val ssb = (col("__bq") -
      fdiv(col("__s") * col("__s"), col("__n").cast("decimal(38,0)")))
      .cast("decimal(38,0)")
    val ssw = (col("__ss") - col("__bq")).cast("decimal(38,0)")
    val n = D(col("__n")); val k = D(col("__k"))
    val f = (D(ssb) / (k - lit(1.0))) / (D(ssw) / (n - k))
    m.select(col("__k").cast("long").as("k"), col("__n").cast("long").as("n"),
      bp(f).as("f_bp"))
  }

  /** Kruskal-Wallis H across the groups of `groupCol` — the rank-based
    * (distribution-free) k-group test beside [[anovaF]], generalizing
    * [[mannWhitney]] past two arms. Tied average ranks come from the
    * same value-level ranged cumsum; doubled rank sums stay exact
    * integers; H with the standard tie correction is one pinned double
    * finish. Output one row: (k, n, h_bp).
    *
    * H = [12/(n(n+1)) · Σ_g R_g²/n_g − 3(n+1)] / (1 − ΣT/(n³−n)),
    * with R_g the group rank sum and T = Σ(t³−t) over tie groups.
    * Each R_g²/n_g = (2R_g)²/(4n_g) term is an exact DECIMAL floor
    * division summed in integers (the [[anovaF]] rule — no double
    * before the final H ratio).
    */
  def kruskalWallis(df: DataFrame, groupCol: String, xCol: String): DataFrame = {
    val df2 = df.filter(col(groupCol).isNotNull && col(xCol).isNotNull)
    val byVG = df2.groupBy(col(xCol).as("__kwv"), col(groupCol).as("__g"))
      .agg(count(lit(1)).as("__cvg"))
    val byV = byVG.groupBy(col("__kwv")).agg(sum(col("__cvg")).as("__cnt"))
    val cum = RunningTotals.globalRunningSum(byV,
      Seq(col("__kwv").asc), "__cnt", "__cum")
    val r2 = lit(2L) * (col("__cum") - col("__cnt")) + col("__cnt") + lit(1L)
    def S(c: Column) = sum(c.cast("decimal(38,0)"))
    // per-group doubled rank sums: join value-group counts back to the
    // value frame (both value-level, one shuffle each)
    val perG = byVG.join(cum.select(col("__kwv"), r2.as("__r2")), Seq("__kwv"))
      .groupBy(col("__g"))
      .agg(sum(col("__cvg")).as("__ng"), S(col("__cvg") * col("__r2")).as("__rg2"))
    // (2R_g)²/(4·n_g) = R_g²/n_g as an exact decimal floor division
    def fdiv(a: Column, b: Column) = ((a - pmod(a, b)) / b).cast("decimal(38,0)")
    val term = fdiv(col("__rg2") * col("__rg2"),
      (lit(4L) * col("__ng")).cast("decimal(38,0)"))
    val ties = cum.agg(
      S(col("__cnt") * col("__cnt") * col("__cnt") - col("__cnt")).as("__t"))
    val m = perG.agg(count(lit(1)).as("__k"), sum(col("__ng")).as("__n"),
      sum(term).cast("decimal(38,0)").as("__rq"))
      .crossJoin(broadcast(ties))
    val n = D(col("__n"))
    val rsum = D(col("__rq"))
    val h = (lit(12.0) / (n * (n + lit(1.0))) * rsum - lit(3.0) * (n + lit(1.0))) /
      (lit(1.0) - D(col("__t")) / (n * n * n - n))
    m.select(col("__k").cast("long").as("k"), col("__n").cast("long").as("n"),
      bp(h).as("h_bp"))
  }

  /** Theil-Sen robust slope per group (Theil 1950 / Sen 1968): the
    * MEDIAN of all pairwise slopes — breakdown point 29%, where one
    * contaminated month drags an OLS slope (`q_trend_slope`) anywhere.
    * Input: (group, LongType index, LongType value), POST-AGGREGATION
    * by contract (points per group bounded by the calendar). Output one
    * row per group: (group, n_points, n_pairs, slope_q) with slope_q =
    * ⌊median · 100⌋.
    *
    * The pairwise slopes are EXACT RATIONALS ((x_j−x_i)/(j−i)) sorted
    * by cross-multiplication compare and lower-median selected on the
    * DRIVER — bit-deterministic, no float until the final quantize.
    * `maxPoints` turns the post-aggregation contract into a GUARD: the
    * collect is capped at maxPoints+1 rows (limit before collect) and
    * a bigger input fails loudly naming the fix — pairwise slopes are
    * O(n²) per group, so an unaggregated fact table here would melt
    * the driver long before the math finished.
    */
  def theilSen(series: DataFrame, groupCol: String, rnCol: String,
               xCol: String, maxPoints: Int = 65536): DataFrame = {
    require(maxPoints >= 2, s"maxPoints must be >= 2, got $maxPoints")
    val spark = series.sparkSession
    val capped = series.select(col(groupCol).cast("string"),
        col(rnCol).cast("long"), col(xCol).cast("long"))
      .limit(maxPoints + 1).collect()
    require(capped.length <= maxPoints,
      s"theilSen: input has more than maxPoints=$maxPoints rows across " +
        s"groups — aggregate to a bounded calendar grid first (one row " +
        s"per $groupCol x $rnCol period is the contract) or raise maxPoints")
    val pts = capped.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rows = pts.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, rs) =>
      val s = rs.map(p => (p._2, p._3)).sortBy(_._1)
      val slopes = for {
        i <- s.indices; j <- (i + 1) until s.length
        if s(j)._1 != s(i)._1
      } yield Frac.mk(s(j)._2 - s(i)._2, s(j)._1 - s(i)._1)
      require(slopes.nonEmpty, s"theilSen: group $g has no index spread")
      val sorted = slopes.sortWith((a, b) => (a - b).num.signum < 0)
      val med = sorted((sorted.length - 1) / 2) // lower median
      org.apache.spark.sql.Row(g, s.length.toLong, slopes.length.toLong,
        med.floorScaled(100L))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("grp",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("n_points",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_pairs",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("slope_q",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** Isotonic regression by pool-adjacent-violators (Ayer et al. 1955;
    * the calibration-curve fitter behind Platt/isotonic score
    * calibration): fit the best monotone-nondecreasing step function
    * of `yCol` on `xCol` under squared loss. Input rows aggregate to
    * one (x level, n, Σy) row per DISTINCT x first (map-side); the
    * O(m) PAV stack runs on the DRIVER with EXACT rational pool means,
    * so pooling decisions are bit-deterministic. Output one row per
    * final pool: (x_lo, x_hi, n_rows, rate_bp).
    */
  def isotonic(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val spark = df.sparkSession
    val levels = df.filter(col(xCol).isNotNull && col(yCol).isNotNull).groupBy(col(xCol).cast("long").as("__x"))
      .agg(count(lit(1)).as("__n"), sum(col(yCol)).cast("long").as("__sy"))
      .orderBy(col("__x")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // PAV stack: each pool (xLo, xHi, n, sy); merge while the mean
    // would decrease (rational compare: syA·nB >= syB·nA)
    val stack = scala.collection.mutable.ArrayBuffer[(Long, Long, BigInt, BigInt)]()
    levels.foreach { case (x, n, sy) =>
      var cur = (x, x, BigInt(n), BigInt(sy))
      while (stack.nonEmpty &&
        stack.last._4 * cur._3 >= cur._4 * stack.last._3) {
        val p = stack.remove(stack.length - 1)
        cur = (p._1, cur._2, p._3 + cur._3, p._4 + cur._4)
      }
      stack += cur
    }
    val rows = stack.toSeq.map { case (lo, hi, n, sy) =>
      org.apache.spark.sql.Row(lo, hi, n.toLong,
        Frac.mk(sy, n).floorScaled(10000L))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("x_lo",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("x_hi",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_rows",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("rate_bp",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** Kaplan-Meier product-limit survival estimator, exact in fixed
    * point. Input: one row per subject with a LongType `durationCol`
    * (≥ 0) and a 0/1 LongType `eventCol` (1 = event observed, 0 =
    * censored at that duration). Output: one row per EVENT time —
    * (duration, n_risk, n_events, surv_q) with surv_q the survival
    * probability scaled by `scale`, folded as
    * S ← ⌊S·(n−d)/n⌋ in BIGINT (n·scale must fit a long: subjects
    * < 9·10⁹ at the default 10⁹ scale).
    *
    * Scale shape: subjects aggregate to ONE ROW PER DISTINCT DURATION
    * (map-side combinable), the at-risk counts are an exclusive
    * running sum over that tiny frame, and only the product fold is
    * sequential — inherently so (each step divides by its own risk
    * set), but it runs over event times, not subjects: bounded by the
    * time resolution regardless of input size.
    */
  def kaplanMeier(df: DataFrame, durationCol: String, eventCol: String,
                  scale: Long = 1000000000L): DataFrame = {
    require(scale > 0)
    val dfNN = df.filter(col(durationCol).isNotNull && col(eventCol).isNotNull)
    val byT = dfNN.groupBy(col(durationCol).as("duration"))
      .agg(sum(col(eventCol)).cast("long").as("d"),
        sum(lit(1L) - col(eventCol)).cast("long").as("c"))
    val tot = dfNN.agg(count(lit(1)).cast("long").as("__total"))
    // exclusive running sum over the per-duration frame (tiny by the
    // distinct-durations contract — a plain ordered window is fine)
    val w = Window.partitionBy(lit(1)).orderBy(col("duration"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = byT.crossJoin(broadcast(tot))
      .withColumn("n_risk",
        col("__total") - coalesce(sum(col("d") + col("c")).over(w), lit(0L)))
      .filter(col("d") > 0)
      .select(col("duration"), col("n_risk"), col("d"))
      .withColumn("__k", lit(1L))
    Recurrences.scanAppend2(risk, Seq("__k"), Seq("duration"),
      "d", "n_risk", "surv_q") { () =>
      var s = scale
      (d, n) => {
        s = Math.floorDiv(s * (n - d), n)
        Some(s)
      }
    }.select(col("duration"), col("n_risk"), col("d").as("n_events"),
      col("surv_q"))
  }

  /** Autocorrelation of an evenly-indexed series at lags 1..`maxLag`:
    * (lag, n_pairs, acf_bp). `rnCol` is a dense 1-based LongType index,
    * `xCol` the LongType series value (|x| < 3·10⁹ so x·y fits BIGINT
    * before the decimal sum). Pearson over the (x_t, x_{t+k}) pairs per
    * lag — the standard sample-ACF-with-per-lag-means variant, which
    * keeps every moment exact.
    *
    * The series is POST-AGGREGATION by contract (e.g. one row per day),
    * so the lag explode (×maxLag) and the joins run on a frame ∝
    * series length, never ∝ fact rows.
    */
  def acf(series: DataFrame, rnCol: String, xCol: String,
          maxLag: Int): DataFrame = {
    require(maxLag >= 1)
    val left = series.select(col(rnCol).as("__rn"), col(xCol).as("__x"))
    val right = series.select(col(rnCol).as("__rn2"), col(xCol).as("__y"))
      .withColumn("lag",
        explode(lit((1 to maxLag).map(_.toLong).toArray)))
    def S(c: Column) = sum(c.cast("decimal(38,0)"))
    val pairs = left.join(right, col("__rn") === col("__rn2") - col("lag"))
    val m = pairs.groupBy(col("lag")).agg(
      count(lit(1)).as("n_pairs"),
      S(col("__x")).as("__sx"), S(col("__y")).as("__sy"),
      S(col("__x") * col("__x")).as("__sxx"),
      S(col("__y") * col("__y")).as("__syy"),
      S(col("__x") * col("__y")).as("__sxy"))
    val n = D(col("n_pairs"))
    val r = (n * D(col("__sxy")) - D(col("__sx")) * D(col("__sy"))) /
      sqrt((n * D(col("__sxx")) - D(col("__sx")) * D(col("__sx"))) *
        (n * D(col("__syy")) - D(col("__sy")) * D(col("__sy"))))
    m.select(col("lag"), col("n_pairs"), bp(r).as("acf_bp"))
  }

  /** Additive seasonal decomposition by centered moving average
    * (the classical-decomposition recipe STL refines): trend = centered
    * `window`-point MA (edges null), seasonal = per-`phaseCol` mean of
    * the detrended values, residual = x − trend − seasonal. All three
    * components are EXACT floor-divided integers, so the identity
    * x = trend + seasonal + residual holds bit-for-bit wherever trend
    * is defined. `window` must be odd.
    *
    * Series is post-aggregation by contract (rows ∝ periods); the MA
    * window and the per-phase means both run on that tiny frame.
    */
  def decomposeAdditive(series: DataFrame, rnCol: String, phaseCol: String,
                        xCol: String, window: Int = 7): DataFrame = {
    require(window >= 3 && window % 2 == 1, s"window must be odd >= 3, got $window")
    val half = window / 2
    // floor division via pmod-subtract: exact for NEGATIVE numerators
    // too (Spark `div` truncates toward zero; DuckDB replays the same
    // formula so neither engine's native convention matters)
    def fdiv(a: Column, b: Column): Column =
      ((a - pmod(a, b)) / b).cast("long")
    val w = Window.partitionBy(lit(1)).orderBy(col(rnCol))
      .rowsBetween(-half, half)
    val trended = series
      .withColumn("trend",
        when(count(lit(1)).over(w) === window,
          fdiv(sum(col(xCol)).over(w), lit(window.toLong))))
      .withColumn("__detr", col(xCol) - col("trend"))
    val seasonal = trended.filter(col("__detr").isNotNull)
      .groupBy(col(phaseCol))
      .agg(fdiv(sum(col("__detr")), count(lit(1))).as("seasonal"))
    trended.join(broadcast(seasonal), Seq(phaseCol), "left")
      .withColumn("resid",
        col(xCol) - col("trend") - col("seasonal"))
      .drop("__detr")
  }

  /** Market-concentration report per group: Herfindahl–Hirschman index
    * and the 4-entity concentration ratio over an entity-level value
    * (both standard antitrust/assortment diagnostics). One grouped sum
    * per (group, entity), one rank window, one final group agg — all on
    * the same group key, so the entity frame's exchange is reused.
    *
    * Exactness: values are LONG units (cents); HHI·10⁸ =
    * floor(Σ revᵢ² · 10⁸ / total²) and CR4·10⁴ = floor(top4 · 10⁴ /
    * total) both compute in DECIMAL(38,0) with the pmod-subtract floor
    * division (exact, engine-independent). Integer-window contract:
    * Σ revᵢ²·10⁸ must fit 38 digits — holds through total ≈ 10¹⁵ value
    * units per group (revᵢ² ≤ total², ×10⁸ → 10³⁸); above that,
    * pre-scale the unit.
    *
    * Entities with zero rows simply don't appear — the caller decides
    * whether absent entities are zero-share members (they change
    * nothing but `n_entities`). Values must be non-negative.
    */
  def concentration(df: DataFrame, groupCol: String, entityCol: String,
                    valueCol: String): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    def fdiv(a: Column, b: Column) = ((a - pmod(a, b)) / b).cast("long")
    val rev = df.groupBy(col(groupCol), col(entityCol))
      .agg(sum(col(valueCol)).as("__rev"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__rev").desc, col(entityCol))
    val ranked = rev.withColumn("__rk", row_number().over(w))
    ranked.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_entities"),
      sum(col("__rev")).as("total"),
      sum(dec(col("__rev")) * dec(col("__rev"))).as("__sq"),
      sum(when(col("__rk") <= 4, col("__rev")).otherwise(0L)).as("__t4"))
      .select(col(groupCol), col("n_entities"), col("total"),
        fdiv(col("__sq") * lit(100000000L),
          dec(col("total")) * dec(col("total"))).as("hhi_e8"),
        fdiv(dec(col("__t4")) * lit(10000L), dec(col("total"))).as("cr4_bp"))
  }

  /** Split-conformal prediction intervals per group (Vovk et al.;
    * Lei et al. 2018): the calibration half fits the "model" (here the
    * group mean), the conformal quantile of absolute residuals at level
    * 1−α gives a finite-sample-valid interval, and the held-out half
    * measures empirical coverage.
    *
    * Exactness: with y LONG and the group mean S/n kept as the exact
    * rational pair, every residual compares as |y·n − S| in
    * DECIMAL(38,0) — rank selection and the coverage test are integer
    * compares, no division anywhere until the final quantized readout.
    * The conformal rank k = ⌈(1−α)(n+1)⌉ (α in basis points), clamped
    * to n (k > n means the interval is the whole line; the clamp keeps
    * the row finite and the coverage column tells the truth).
    *
    * Shape: one grouped moment pass, one in-group rank window on the
    * calibration rows, one final grouped count — group-keyed
    * throughout, residual frames never leave their exchange. GROUP
    * CARDINALITY IS BOUNDED BY CONTRACT (sources, segments — the
    * per-group stats and conformal quantiles broadcast back to the
    * row side); per-entity conformal over millions of keys would need
    * the broadcast hints replaced with keyed joins.
    */
  def conformalSplit(df: DataFrame, groupCol: String, idCol: String,
                     yCol: String, calibCol: String,
                     alphaBp: Long = 1000L): DataFrame = {
    require(alphaBp > 0 && alphaBp < 10000, s"alphaBp in (0,10000), got $alphaBp")
    def dec(c: Column) = c.cast("decimal(38,0)")
    def fdiv(a: Column, b: Column) = ((a - pmod(a, b)) / b).cast("long")
    val cal = df.filter(col(calibCol))
    val stats = cal.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_cal"), sum(dec(col(yCol))).as("__s"))
    val resid = cal.join(broadcast(stats), Seq(groupCol))
      .withColumn("__r", abs(dec(col(yCol)) * dec(col("n_cal")) - col("__s")))
    // k = ceil((1-a)(n+1)) with a = alphaBp/1e4: ceil(m/1e4) via the
    // add-(denom-1) floor identity, all in BIGINT
    val k = least(
      fdiv((lit(10000L) - lit(alphaBp)) * (col("n_cal") + 1) + lit(9999L),
        lit(10000L)),
      col("n_cal"))
    val wR = Window.partitionBy(col(groupCol))
      .orderBy(col("__r"), col(idCol))
    val qhat = resid.withColumn("__k", k)
      .withColumn("__rk", row_number().over(wR))
      .filter(col("__rk") === col("__k"))
      .select(col(groupCol), col("__r").as("__q"))
    val test = df.filter(!col(calibCol))
      .join(broadcast(stats), Seq(groupCol))
      .join(broadcast(qhat), Seq(groupCol))
      .withColumn("__cov",
        when(abs(dec(col(yCol)) * dec(col("n_cal")) - col("__s")) <= col("__q"),
          1L).otherwise(0L))
    test.groupBy(col(groupCol)).agg(
      first(col("n_cal")).as("n_cal"),
      fdiv(first(col("__s")) * lit(10000L), dec(first(col("n_cal"))))
        .as("mu_e4"),
      fdiv(first(col("__q")) * lit(10000L), dec(first(col("n_cal"))))
        .as("q_e4"),
      count(lit(1)).as("n_test"),
      sum(col("__cov")).as("covered"))
      .withColumn("cover_bp",
        fdiv(dec(col("covered")) * lit(10000L), dec(col("n_test"))))
  }

  /** Percentile-bootstrap confidence interval for the per-group mean via
    * the POISSON bootstrap (Chamandy et al., "Estimating Uncertainty
    * for Massive Data Streams", Google 2012): instead of resampling n
    * slots with replacement (which needs a global row index — a full
    * shuffle just to set up), each row independently enters replicate b
    * with multiplicity w ~ Poisson(1). That keeps the whole bootstrap
    * ONE map-side pass: explode ×B, weight from a portable hash, and
    * the per-(group, replicate) sums combine map-side; only B·|groups|
    * tiny rows ever shuffle. The classic resampler is O(n·B) SHUFFLED
    * rows — this is O(n·B) mapped, O(B·G) shuffled, the difference
    * between impossible and cheap at 100 TB.
    *
    * Determinism: the multiplicity is the quantized inverse Poisson(1)
    * CDF (thresholds pinned as double literals — both engines parse the
    * identical IEEE values) applied to the repo's portable
    * multiplicative hash of (id·131 + b), so every replicate is
    * reproducible across runs, partitionings, AND engines. Replicate
    * means are exact integer floor divisions; the CI bounds are exact
    * rank selections (lo = ⌈0.025B⌉-th, hi = ⌈0.975B⌉-th smallest,
    * replicate id breaking ties).
    */
  def poissonBootstrap(df: DataFrame, groupCol: String, idCol: String,
                      valueCol: String, b: Int = 100): DataFrame = {
    require(b >= 20 && b <= 10000, s"replicates in [20,10000], got $b")
    // decimal floor division: the long/long path goes through double,
    // whose 2^53 integer ceiling a 100 TB weighted sum can clear
    def fdiv(a: Column, c: Column) = {
      val ad = a.cast("decimal(38,0)"); val cd = c.cast("decimal(38,0)")
      ((ad - pmod(ad, cd)) / cd).cast("long")
    }
    val loRk = math.ceil(0.025 * b).toLong
    val hiRk = math.ceil(0.975 * b).toLong
    val u = (pmod(col(idCol) * lit(131L) + col("__b"), lit(1048573L)) *
      lit(2654435761L) % lit(1000000L)).cast("double") / lit(1000000.0)
    val wgt = when(u < 0.36787944117144233, 0L)
      .when(u < 0.7357588823428847, 1L)
      .when(u < 0.9196986029286058, 2L)
      .when(u < 0.9810118431238463, 3L)
      .when(u < 0.9963401531726563, 4L)
      .when(u < 0.9994058151824183, 5L)
      .when(u < 0.999916758850712, 6L)
      .when(u < 0.9999897508033253, 7L)
      .when(u < 0.999998874797402, 8L)
      .otherwise(9L)
    val reps = df.select(col(groupCol), col(idCol), col(valueCol))
      .withColumn("__b", explode(sequence(lit(0L), lit(b - 1L))))
      .withColumn("__w", wgt)
      .groupBy(col(groupCol), col("__b"))
      .agg(sum(col("__w") * col(valueCol)).as("__ws"),
        sum(col("__w")).as("__n"))
      .filter(col("__n") > 0) // P(empty replicate) = e^-n: a guard, not a path
      .withColumn("__mean", fdiv(col("__ws"), col("__n")))
    val wRk = Window.partitionBy(col(groupCol))
      .orderBy(col("__mean"), col("__b"))
    reps.withColumn("__rk", row_number().over(wRk))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_reps"),
        max(when(col("__rk") === loRk, col("__mean"))).as("ci_lo"),
        max(when(col("__rk") === hiRk, col("__mean"))).as("ci_hi"))
  }

  /** Wald sequential probability ratio test (SPRT, Wald 1945) per arm
    * over an ordered Bernoulli stream: H0 p=p0 vs H1 p=p1, stop at the
    * first observation where the log-likelihood ratio crosses
    * ln((1−β)/α) (accept H1) or ln(β/(1−α)) (accept H0) — the
    * always-valid alternative to fixed-n tests that peeking invalidates.
    *
    * Determinism: the LLR is cₙ·l1 + (n−cₙ)·l0 with INTEGER cumulative
    * counts and two pinned double constants — two flops in a fixed
    * order, bit-identical cross-engine (`constants` exposes the exact
    * values so an oracle can embed the same literals). Cumulative
    * counts run through [[RunningTotals.groupedRunningSum]] — the
    * range-partitioned two-pass machine, so a hot arm NEVER funnels
    * through one task the way a per-arm window would.
    *
    * Output per arm: (arm, n_decide, decision
    * 'accept_h1'|'accept_h0'|'undecided', llr_bp at that row, n_total).
    * Undecided arms report their final row.
    */
  def sprt(df: DataFrame, armCol: String, orderBys: Seq[Column],
           xCol: String, p0Bp: Long, p1Bp: Long,
           alphaBp: Long = 500L, betaBp: Long = 500L): DataFrame = {
    val (l1, l0, up, lo) = sprtConstants(p0Bp, p1Bp, alphaBp, betaBp)
    require(!df.columns.exists(Set("__x", "__one", "__cx", "__cn")),
      "sprt: temp columns __x/__one/__cx/__cn collide with the input")
    val base = df.withColumn("__x", col(xCol).cast("long"))
    // ONE ranged pass for both cumulative series: __cn is the per-arm
    // positional rank (count of ones), so it rides the machine's rank
    // arithmetic instead of a second full machine (round 14)
    val cum = RunningTotals.groupedSumAndRank(base, Seq(armCol), orderBys,
      "__x", "__cx", "__cn")
    val llr = (col("__cx") * lit(l1)) + ((col("__cn") - col("__cx")) * lit(l0))
    val scored = cum.select(col(armCol), col("__cn"),
      llr.as("__llr"),
      when(llr >= lit(up), 1L).when(llr <= lit(lo), -1L)
        .otherwise(0L).as("__dec"))
    val firstCross = scored.filter(col("__dec") =!= 0L)
      .groupBy(col(armCol))
      .agg(min(struct(col("__cn"), col("__dec"), col("__llr"))).as("__hit"))
    val lastRow = scored.groupBy(col(armCol))
      .agg(max(struct(col("__cn"), col("__dec"), col("__llr"))).as("__end"),
        max(col("__cn")).as("n_total"))
    lastRow.join(firstCross, Seq(armCol), "left")
      .withColumn("__pick", coalesce(col("__hit"), col("__end")))
      .select(col(armCol),
        col("__pick.__cn").as("n_decide"),
        when(col("__pick.__dec") === 1L, "accept_h1")
          .when(col("__pick.__dec") === -1L, "accept_h0")
          .otherwise("undecided").as("decision"),
        floor(col("__pick.__llr") * lit(10000.0) + lit(0.5)).cast("long")
          .as("llr_bp"),
        col("n_total"))
  }

  /** The four SPRT constants (l1, l0, upper, lower) exactly as [[sprt]]
    * pins them — an oracle embeds `.toString` of these (shortest
    * round-trip repr parses back to the identical IEEE double).
    */
  def sprtConstants(p0Bp: Long, p1Bp: Long, alphaBp: Long,
                    betaBp: Long): (Double, Double, Double, Double) = {
    require(0 < p0Bp && p0Bp < p1Bp && p1Bp < 10000, s"need 0<p0<p1<1")
    require(0 < alphaBp && alphaBp < 10000 && 0 < betaBp && betaBp < 10000)
    (math.log(p1Bp.toDouble / p0Bp.toDouble),
      math.log((10000.0 - p1Bp) / (10000.0 - p0Bp)),
      math.log((10000.0 - betaBp) / alphaBp.toDouble),
      math.log(betaBp.toDouble / (10000.0 - alphaBp)))
  }

  /** Empirical-Bayes rate smoothing with a method-of-moments Beta prior
    * (Robbins 1956; the standard CTR/ratings shrinkage): small-n keys'
    * raw success rates are noise — shrink each toward the population
    * prior by the evidence it carries: smoothed = (k+α)/(n+α+β) with
    * (α, β) fitted from the across-key rate distribution.
    *
    * Determinism: per-key rates quantize to e6 integers (k·10⁶ DIV n),
    * the moment sums over those are exact decimals, the MoM finish
    * (α, β) is ONE pinned double expression each — floored to e6 — and
    * every smoothed rate is then an integer floor division again. The
    * across-key variance must be positive (all-equal rates leave the
    * prior strength undefined); the operator raises a named error
    * rather than silently dividing by zero.
    *
    * Shape: one keyed (n, k) aggregate, one tiny moment aggregate over
    * the key frame, prior broadcast back — two keyed exchanges.
    */
  def ebSmoothRates(df: DataFrame, keyCol: String,
                    successCol: String): DataFrame = {
    def D(c: Column) = c.cast("double")
    def dec(c: Column) = c.cast("decimal(38,0)")
    def fdiv(a: Column, b: Column) =
      ((dec(a) - pmod(dec(a), dec(b))) / dec(b)).cast("long")
    val perKey = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(successCol)).as("k"))
      .withColumn("__r6", fdiv(col("k") * lit(1000000L), col("n")))
    val mom = perKey.agg(count(lit(1)).as("__kk"),
      sum(dec(col("__r6"))).as("__s"),
      sum(dec(col("__r6")) * dec(col("__r6"))).as("__ss"))
    // m, v in e6/e12 units: m = S/kk ; v = SS/kk − m². The UNIT-scale
    // prior strength is ab = α+β = m(1−m)/v − 1 = m·(10⁶−m)/v − 1
    // (the e6 factors cancel: 10⁻⁶·10⁻⁶·10¹² = 1); then α·10⁶ = ab·m.
    // The first cut subtracted 10⁶ instead of 1 — a NEGATIVE prior the
    // cross-engine gate can't catch (the oracle mirrored the same pin);
    // the shrinkage-direction spec did.
    val prior = mom.select(
      (D(col("__s")) / D(col("__kk"))).as("__m"),
      (D(col("__ss")) / D(col("__kk")) -
        (D(col("__s")) / D(col("__kk"))) * (D(col("__s")) / D(col("__kk"))))
        .as("__v"))
      .select(col("__m"), col("__v"),
        when(col("__v") > 0 &&
          col("__m") * (lit(1000000.0) - col("__m")) / col("__v") -
            lit(1.0) > 0,
          col("__m") * (lit(1000000.0) - col("__m")) / col("__v") -
            lit(1.0))
          .otherwise(raise_error(
            lit("ebSmoothRates: across-key rate variance is zero or " +
              "exceeds the Bernoulli limit m(1-m) — the Beta prior " +
              "is undefined for this rate distribution"))
            .cast("double")).as("__ab"))
      .select(
        floor(col("__ab") * col("__m")).cast("long").as("alpha_e6"),
        floor(col("__ab") * (lit(1000000.0) - col("__m"))).cast("long")
          .as("beta_e6"))
    perKey.crossJoin(broadcast(prior))
      .select(col(keyCol), col("n"), col("k"),
        fdiv(col("k") * lit(10000L), col("n")).as("raw_bp"),
        fdiv((col("k") * lit(1000000L) + col("alpha_e6")) * lit(10000L),
          col("n") * lit(1000000L) + col("alpha_e6") + col("beta_e6"))
          .as("smoothed_bp"),
        col("alpha_e6"), col("beta_e6"))
  }

  /** Qini uplift curve (Radcliffe 2007) over pre-assigned targeting
    * deciles: walk the population best-score-first and ask, at each
    * decile, how many INCREMENTAL responses the treatment bought vs a
    * scaled control — q(k) = R_t(k) − R_c(k)·N_t(k)/N_c(k). The
    * standard evaluation of "who should we target", the uplift twin of
    * an ROC curve.
    *
    * Input: one row per unit with `treatedCol` (boolean),
    * `responseCol` (0/1 long), `decileCol` (0-based bucket, assign via
    * [[RunningTotals.globalRank]] so the global sort never funnels one
    * task). Output: one row per decile with cumulative counts and
    * `qini_e4` = floor(10⁴·q) via the pmod-subtract floor (q can be
    * negative — a harmful treatment shows below zero). All counts
    * exact; one decimal floor division per decile row.
    */
  def qiniCurve(df: DataFrame, treatedCol: String, responseCol: String,
                decileCol: String): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val t1 = when(col(treatedCol), 1L).otherwise(0L)
    val byDec = df.groupBy(col(decileCol).as("decile"))
      .agg(sum(t1).as("__nt"), sum(lit(1L) - t1).as("__nc"),
        sum(t1 * col(responseCol)).as("__rt"),
        sum((lit(1L) - t1) * col(responseCol)).as("__rc"))
    val w = Window.partitionBy(lit(1)).orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDec
      .withColumn("cum_nt", sum(col("__nt")).over(w))
      .withColumn("cum_nc", sum(col("__nc")).over(w))
      .withColumn("cum_rt", sum(col("__rt")).over(w))
      .withColumn("cum_rc", sum(col("__rc")).over(w))
      .withColumn("qini_e4", {
        val num = (dec(col("cum_rt")) * dec(col("cum_nc")) -
          dec(col("cum_rc")) * dec(col("cum_nt"))) * lit(10000L)
        val den = dec(col("cum_nc"))
        ((num - pmod(num, den)) / den).cast("long")
      })
      .select(col("decile"), col("cum_nt"), col("cum_nc"),
        col("cum_rt"), col("cum_rc"), col("qini_e4"))
  }

  /** Lag-1 Granger causality F per key: does `xCol` yesterday help
    * predict `yCol` today beyond `yCol`'s own lag (Granger 1969)?
    * Restricted (AR(1)) vs unrestricted (AR(1) + x₁) SSEs in CLOSED
    * FORM from exact decimal moments — the 2-regressor normal
    * equations solve by determinant, so the whole finish is one pinned
    * double chain, no iterative fit. Series are post-aggregation by
    * contract (one row per (key, ord)); one keyed window for the lags,
    * one grouped moment pass. Output: (key, n, f_bp) with
    * F ~ F(1, n−3) under the null. Deterministically collinear series
    * (y ≡ a·x₁ exactly) zero the unrestricted SSE and make F infinite
    * — outside the contract, like a zero-variance t-test.
    */
  def grangerLag1(series: DataFrame, keyCol: String, ordCol: String,
                  yCol: String, xCol: String): DataFrame = {
    def S(c: Column) = sum(c.cast("decimal(38,0)"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(ordCol))
    val lagged = series
      .withColumn("__y1", lag(col(yCol), 1).over(w))
      .withColumn("__x1", lag(col(xCol), 1).over(w))
      .filter(col("__y1").isNotNull)
    val m = lagged.groupBy(col(keyCol)).agg(
      count(lit(1)).as("n"),
      S(col(yCol)).as("sy"), S(col("__y1")).as("sy1"), S(col("__x1")).as("sx1"),
      S(col(yCol) * col(yCol)).as("syy"),
      S(col(yCol) * col("__y1")).as("syy1"),
      S(col(yCol) * col("__x1")).as("syx1"),
      S(col("__y1") * col("__y1")).as("sy1y1"),
      S(col("__x1") * col("__x1")).as("sx1x1"),
      S(col("__y1") * col("__x1")).as("sy1x1"))
    def cm(sab: Column, sa: Column, sb: Column) =
      D(sab) - D(sa) * D(sb) / D(col("n"))
    val cyy = cm(col("syy"), col("sy"), col("sy"))
    val cyy1 = cm(col("syy1"), col("sy"), col("sy1"))
    val cyx1 = cm(col("syx1"), col("sy"), col("sx1"))
    val cy1y1 = cm(col("sy1y1"), col("sy1"), col("sy1"))
    val cx1x1 = cm(col("sx1x1"), col("sx1"), col("sx1"))
    val cy1x1 = cm(col("sy1x1"), col("sy1"), col("sx1"))
    val sseR = cyy - cyy1 * cyy1 / cy1y1
    val det = cy1y1 * cx1x1 - cy1x1 * cy1x1
    val b1 = (cyy1 * cx1x1 - cyx1 * cy1x1) / det
    val b2 = (cyx1 * cy1y1 - cyy1 * cy1x1) / det
    val sseU = cyy - (b1 * cyy1 + b2 * cyx1)
    val f = (sseR - sseU) / (sseU / (D(col("n")) - lit(3.0)))
    m.select(col(keyCol), col("n").cast("long").as("n"),
      floor(f * lit(10000.0) + lit(0.5)).cast("long").as("f_bp"))
  }

  /** Mutual information between two categorical columns, with the
    * marginal entropies and the normalized MI — the model-free
    * dependence screen feature selection runs where [[chiSquare]]
    * gives a yes/no: MI ranks how MUCH one column tells you about the
    * other (Cover & Thomas; Strehl & Ghosh 2002 for the √(Ha·Hb)
    * normalization).
    *
    * Shape mirrors chiSquare's one-scan rule: ONE (a,b) grouped count,
    * margins re-aggregated from the pinned cell frame (broadcast
    * post-aggregation joins). Unlike chi-square, zero cells contribute
    * exactly 0 — no margin grid needed, only observed cells. Each
    * cell/margin term is one pinned double expression quantized to e8
    * then summed in BIGINT (the WOE-family ln rule); the nmi finish is
    * one pinned double over the three quantized sums.
    */
  def mutualInfo(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    def D(c: Column) = c.cast("double")
    def e8(c: Column) = floor(c * lit(100000000.0) + lit(0.5)).cast("long")
    val dfNN = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
    val cells = dfNN.groupBy(col(aCol), col(bCol))
      .agg(count(lit(1)).as("__o")).localCheckpoint(true)
    val aMar = cells.groupBy(col(aCol)).agg(sum(col("__o")).as("__na"))
    val bMar = cells.groupBy(col(bCol)).agg(sum(col("__o")).as("__nb"))
    val tot = cells.agg(sum(col("__o")).as("__n"))
    val miTerm = (D(col("__o")) / D(col("__n"))) *
      log((D(col("__o")) * D(col("__n"))) / (D(col("__na")) * D(col("__nb"))))
    val mi = cells
      .join(broadcast(aMar), Seq(aCol)).join(broadcast(bMar), Seq(bCol))
      .crossJoin(broadcast(tot))
      .agg(sum(e8(miTerm)).as("mi_e8"), count(lit(1)).as("cells"))
    val ha = aMar.crossJoin(broadcast(tot))
      .agg(sum(e8((D(col("__na")) / D(col("__n"))) *
        log(D(col("__n")) / D(col("__na"))))).as("h_a_e8"))
    val hb = bMar.crossJoin(broadcast(tot))
      .agg(sum(e8((D(col("__nb")) / D(col("__n"))) *
        log(D(col("__n")) / D(col("__nb"))))).as("h_b_e8"))
    mi.crossJoin(broadcast(ha)).crossJoin(broadcast(hb))
      .crossJoin(broadcast(tot))
      .select(col("__n").as("n"), col("cells"), col("mi_e8"),
        col("h_a_e8"), col("h_b_e8"),
        floor(D(col("mi_e8")) /
            sqrt(D(col("h_a_e8")) * D(col("h_b_e8"))) * lit(10000.0) +
            lit(0.5)).cast("long").as("nmi_bp"))
  }

  /** Two-sample log-rank test (Mantel 1966) — "do these two survival
    * curves differ?", the inference step after [[kaplanMeier]] draws
    * them. At every event time: observed group-1 deaths vs expected
    * under the null (d·n1/n), plus the hypergeometric variance; the
    * statistic is (ΣO−E)²/ΣV ~ χ²(1).
    *
    * Shape: subjects collapse to one row per (duration) with per-group
    * death/censor counts (map-side combinable), at-risk counts are an
    * exclusive cumsum over that tiny frame (distinct-durations
    * contract), and the per-time O−E / variance terms quantize to e8
    * from pinned-parenthesization doubles before summing in BIGINT —
    * hash-stable in any order. One row out, self-contained.
    */
  def logRank(df: DataFrame, groupCol: String, durationCol: String,
              eventCol: String): DataFrame = {
    def D(c: Column) = c.cast("double")
    val dfNN = df.filter(col(durationCol).isNotNull &&
      col(eventCol).isNotNull && col(groupCol).isNotNull)
    val g1 = col(groupCol).cast("long")
    val byT = dfNN.groupBy(col(durationCol).as("t"))
      .agg(sum(col(eventCol) * g1).cast("long").as("d1"),
        sum(col(eventCol)).cast("long").as("d"),
        sum(g1).cast("long").as("r1"),
        count(lit(1)).cast("long").as("r"))
    val tot = dfNN.agg(count(lit(1)).cast("long").as("__n"),
      sum(g1).cast("long").as("__n1"))
    val w = Window.partitionBy(lit(1)).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val risk = byT.crossJoin(broadcast(tot))
      .withColumn("n", col("__n") - coalesce(sum(col("r")).over(w), lit(0L)))
      .withColumn("n1", col("__n1") - coalesce(sum(col("r1")).over(w), lit(0L)))
      .filter(col("d") > 0)
    // per-time terms in ONE pinned double expression each, quantized to
    // e8 — the oracle replays the identical parenthesization
    val p1 = D(col("n1")) / D(col("n"))
    val oe = D(col("d1")) - D(col("d")) * p1
    val vr = when(col("n") > 1,
      D(col("d")) * p1 * (lit(1.0) - p1) *
        D(col("n") - col("d")) / D(col("n") - 1)).otherwise(lit(0.0))
    val sums = risk.agg(
      sum(floor(oe * lit(100000000.0) + lit(0.5)).cast("long")).as("oe_e8"),
      sum(floor(vr * lit(100000000.0) + lit(0.5)).cast("long")).as("var_e8"),
      sum(col("d1")).as("deaths_1"), sum(col("d")).as("deaths"))
    sums.crossJoin(broadcast(tot))
      .select(col("__n1").as("n_1"), (col("__n") - col("__n1")).as("n_0"),
        col("deaths_1"), col("deaths"), col("oe_e8"), col("var_e8"),
        floor((D(col("oe_e8")) / lit(100000000.0)) *
            (D(col("oe_e8")) / lit(100000000.0)) /
            (D(col("var_e8")) / lit(100000000.0)) * lit(10000.0) + lit(0.5))
          .cast("long").as("chi2_bp"))
  }
}
