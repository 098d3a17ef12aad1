package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.{Recurrences, Stats}

class StatsSpec extends SparkSuite {
  import spark.implicits._

  test("chiSquare matches the hand-computed 2x2 statistic and fills zero cells") {
    // classic 2x2: a=yes/no vs b=left/right
    //            left  right   margin
    //   yes       20     30      50
    //   no        30     20      50
    //            50     50      100
    // E = 25 everywhere; chi2 = 4 * (5^2/25) = 4.0
    val rows =
      Seq.fill(20)(("yes", "l")) ++ Seq.fill(30)(("yes", "r")) ++
      Seq.fill(30)(("no", "l")) ++ Seq.fill(20)(("no", "r"))
    val df = rows.toDF("a", "b")
    val out = Stats.chiSquare(df, "a", "b").collect()
    assert(out.length == 4)
    assert(out.forall(_.getAs[Long]("chi2_bp") == 40000L))
    assert(out.forall(_.getAs[Long]("dof") == 1L))
    assert(out.forall(_.getAs[Long]("term_bp") == 10000L)) // each cell contributes 1.0

    // a value pair that never co-occurs must still appear as a zero cell
    val sparse = Seq(("x", "p"), ("x", "p"), ("y", "q")).toDF("a", "b")
    val cells = Stats.chiSquare(sparse, "a", "b").collect()
    assert(cells.length == 4)
    val zero = cells.find(r => r.getString(0) == "y" && r.getString(1) == "p").get
    assert(zero.getAs[Long]("obs") == 0L)
    assert(zero.getAs[Long]("term_bp") > 0L) // (0 - E)^2/E contributes
  }

  test("welchAb reproduces a textbook two-sample computation") {
    // variant 0: {10, 20, 30}; variant 1: {20, 40}   (conv: v0 none, v1 one)
    val df = Seq((0L, 10L, 0L), (0L, 20L, 0L), (0L, 30L, 0L),
      (1L, 20L, 0L), (1L, 40L, 1L)).toDF("variant", "x", "conv")
    val r = Stats.welchAb(df, "variant", "x", "conv").head()
    assert(r.getAs[Long]("n0") == 3L && r.getAs[Long]("n1") == 2L)
    assert(r.getAs[Long]("mean0_q") == 20L && r.getAs[Long]("mean1_q") == 30L)
    // v0 var = 100, v1 var = 200; t = 10/sqrt(100/3 + 200/2) = 10/sqrt(133.33)
    val t = 10.0 / math.sqrt(100.0 / 3.0 + 200.0 / 2.0)
    assert(r.getAs[Long]("t_bp") == math.floor(t * 10000.0 + 0.5).toLong)
    assert(r.getAs[Long]("conv0") == 0L && r.getAs[Long]("conv1") == 1L)
  }

  test("foldAbMoments: folded CDC state reproduces the one-shot readout exactly") {
    val rnd = new scala.util.Random(42)
    val full = (1 to 400).map { i =>
      (i.toLong, (rnd.nextInt(2)).toLong, (rnd.nextInt(100000) + 1).toLong)
    }.map { case (id, v, x) => (id, v, x, if (x > 90000) 1L else 0L) }
    val fullDf = full.toDF("id", "variant", "x", "conv")
    // a third of the rows arrive late; poisoned placeholders (x+1) sit
    // in the base and are retracted when the true rows insert
    val late = fullDf.filter($"id" % 3 === 0)
    val poison = late.withColumn("x", $"x" + 1L)
      .withColumn("conv", when($"x" > 90000L, 1L).otherwise(0L))
    val base = fullDf.filter($"id" % 3 =!= 0).unionByName(poison)
    val delta = poison.withColumn("op", lit("D"))
      .unionByName(late.withColumn("op", lit("I")))
    val folded = Stats.foldAbMoments(
      Stats.abMoments(base, "variant", "x", "conv"),
      delta, "variant", "x", "conv", "op")
    val got = Stats.welchFinish(folded).collect().head
    val want = Stats.welchAb(fullDf, "variant", "x", "conv").collect().head
    assert(got == want)
  }

  test("cuped: a perfectly explanatory covariate zeroes the adjusted diff") {
    // Y = 2X exactly; arms imbalanced in X -> raw diff is pure
    // covariate imbalance, the adjustment removes ALL of it
    val df = Seq((0L, 10L, 20L), (0L, 20L, 40L), (1L, 30L, 60L), (1L, 40L, 80L))
      .toDF("variant", "x", "y")
    val r = Stats.cuped(df, "variant", "x", "y").head()
    assert(r.getAs[Long]("n0") == 2L && r.getAs[Long]("n1") == 2L)
    assert(r.getAs[Long]("theta_bp") == 20000L) // theta = 2
    assert(r.getAs[Long]("vr_bp") == 10000L)    // corr^2 = 1
    assert(r.getAs[Long]("raw_diff_q") == 4000L) // (70-30) * 100
    assert(r.getAs[Long]("adj_diff_q") == 0L)
  }

  test("mannWhitney reproduces textbook rank sums, with and without ties") {
    // no ties: g0 = {1,2,3}, g1 = {4,5} -> R1 = 9, U1 = 6, z = sqrt(3)
    val a = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 4L), (1L, 5L))
      .toDF("variant", "x")
    val ra = Stats.mannWhitney(a, "variant", "x").head()
    assert(ra.getAs[Long]("n0") == 3L && ra.getAs[Long]("n1") == 2L)
    assert(ra.getAs[Long]("u2") == 12L) // 2*U1
    assert(ra.getAs[Long]("z_bp") ==
      math.floor(math.sqrt(3.0) * 10000.0 + 0.5).toLong)
    // ties across groups: g0 = {1,2,2}, g1 = {2,3} -> avg rank of the
    // three 2s is 3 -> R1 = 3 + 5 = 8, U1 = 5, tie term = 2^3... = 24
    val b = Seq((0L, 1L), (0L, 2L), (0L, 2L), (1L, 2L), (1L, 3L))
      .toDF("variant", "x")
    val rb = Stats.mannWhitney(b, "variant", "x").head()
    assert(rb.getAs[Long]("u2") == 10L)
    val z = (5.0 - 3.0) /
      math.sqrt(6.0 / 12.0 * ((5.0 + 1.0) - 24.0 / (5.0 * 4.0)))
    assert(rb.getAs[Long]("z_bp") == math.floor(z * 10000.0 + 0.5).toLong)
  }

  test("kaplanMeier matches the product-limit definition on a textbook frame") {
    // durations: events at t=2 (2 of 5 at risk), t=4 (1 of 2); censored at 3
    val df = Seq((2L, 1L), (2L, 1L), (3L, 0L), (4L, 1L), (5L, 0L))
      .toDF("duration", "event")
    val out = Stats.kaplanMeier(df, "duration", "event").orderBy("duration").collect()
    assert(out.map(_.getAs[Long]("duration")).toSeq == Seq(2L, 4L))
    val s2 = out(0); val s4 = out(1)
    assert(s2.getAs[Long]("n_risk") == 5L && s2.getAs[Long]("n_events") == 2L)
    // S(2) = 3/5 = 0.6
    assert(s2.getAs[Long]("surv_q") == 600000000L)
    // at t=4: at risk = 5 - (2 events + 1 censored) = 2, one event
    assert(s4.getAs[Long]("n_risk") == 2L && s4.getAs[Long]("n_events") == 1L)
    // S(4) = 0.6 * 1/2 = 0.3
    assert(s4.getAs[Long]("surv_q") == 300000000L)
  }

  test("acf is exactly 1 at any lag of a constant-free linear series' self-correlation") {
    // x_t = t: every lag gives perfectly correlated pairs -> acf_bp = 10000
    val series = (1L to 50L).map(i => (i, i * 3L + 7L)).toDF("rn", "x")
    val out = Stats.acf(series, "rn", "x", maxLag = 3).orderBy("lag").collect()
    assert(out.length == 3)
    assert(out.forall(_.getAs[Long]("acf_bp") == 10000L))
    assert(out.map(_.getAs[Long]("n_pairs")).toSeq == Seq(49L, 48L, 47L))
  }

  test("decomposeAdditive: exact identity x = trend + seasonal + resid where defined") {
    // weekly pattern + ramp, with a negative-sum phase to exercise the
    // floor-division convention on negative numerators
    val xs = (1 to 42).map { i =>
      val phase = (i - 1) % 7
      (i.toLong, phase.toLong, 1000L + i * 10L + Seq(-300L, 0L, 50L, 120L, -80L, 200L, -40L)(phase))
    }
    val df = xs.toDF("rn", "phase", "x")
    val out = Stats.decomposeAdditive(df, "rn", "phase", "x", window = 7).collect()
    assert(out.length == 42)
    out.foreach { r =>
      val trend = Option(r.getAs[Any]("trend"))
      if (trend.isDefined) {
        assert(r.getAs[Long]("x") ==
          r.getAs[Long]("trend") + r.getAs[Long]("seasonal") + r.getAs[Long]("resid"))
      } else assert(r.isNullAt(r.fieldIndex("resid")))
    }
    // edges (first/last 3 rows) have no full window
    assert(out.count(r => r.isNullAt(r.fieldIndex("trend"))) == 6)
  }

  test("theilSen recovers a clean slope exactly and shrugs off an outlier OLS cannot") {
    // y = 50x + 7 with ONE wild outlier at x=10
    val pts = (1L to 20L).map(i => ("g", i, 50L * i + 7L + (if (i == 10) 100000L else 0L)))
    val r = Stats.theilSen(pts.toDF("g", "rn", "x"), "g", "rn", "x").head()
    assert(r.getAs[Long]("n_points") == 20L && r.getAs[Long]("n_pairs") == 190L)
    assert(r.getAs[Long]("slope_q") == 5000L) // median slope still exactly 50.00
    // determinism under row order
    val shuffled = Stats.theilSen(
      pts.toDF("g", "rn", "x").orderBy(rand(9)), "g", "rn", "x").head()
    assert(shuffled == r)
  }

  test("theilSen maxPoints guard fails loudly on unaggregated input, " +
    "naming the fix") {
    val pts = (1L to 30L).map(i => ("g", i, 50L * i))
    val e = intercept[IllegalArgumentException] {
      Stats.theilSen(pts.toDF("g", "rn", "x"), "g", "rn", "x",
        maxPoints = 29)
    }
    assert(e.getMessage.contains("maxPoints=29"))
    assert(e.getMessage.contains("calendar grid"))
    // exactly at the bound it runs: the cap detects overflow, it does
    // not silently truncate the series
    val ok = Stats.theilSen(pts.toDF("g", "rn", "x"), "g", "rn", "x",
      maxPoints = 30).head()
    assert(ok.getAs[Long]("n_points") == 30L)
  }

  test("null rows are excluded wholesale, never half-counted") {
    // chiSquare: a null category would inflate margins but miss the
    // grid join — with the guard, nulls change NOTHING
    val clean = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
    val dirty = clean ++ Seq((null, "x"), ("a", null))
    val c1 = Stats.chiSquare(clean.toDF("a", "b"), "a", "b").collect().toSeq
    val c2 = Stats.chiSquare(dirty.toDF("a", "b"), "a", "b").collect().toSeq
    assert(c1 == c2)
    // welchAb: a null metric row must not enter n while missing the sums
    val base = Seq((0L, 10L, 0L), (0L, 30L, 0L), (1L, 20L, 1L), (1L, 40L, 0L))
    val w1 = Stats.welchAb(base.toDF("variant", "x", "conv"),
      "variant", "x", "conv").head()
    val w2 = Stats.welchAb(
      (base.map { case (v, x, c) => (Option(v), Option(x), Option(c)) } :+
        ((Option(0L), Option.empty[Long], Option(0L))))
        .toDF("variant", "x", "conv"), "variant", "x", "conv").head()
    assert(w1 == w2)
  }

  test("anovaF matches the textbook computation on a three-group frame") {
    // g1 = {1,2,3}, g2 = {4,5,6}, g3 = {7,8,9}: grand mean 5,
    // SSB = 3*(2-5)^2 + 3*(5-5)^2 + 3*(8-5)^2 = 54, SSW = 6
    // F = (54/2)/(6/6) = 27
    val df = Seq(("a",1L),("a",2L),("a",3L),("b",4L),("b",5L),("b",6L),
      ("c",7L),("c",8L),("c",9L)).toDF("g", "x")
    val r = Stats.anovaF(df, "g", "x").head()
    assert(r.getAs[Long]("k") == 3L && r.getAs[Long]("n") == 9L)
    assert(r.getAs[Long]("f_bp") == 270000L)
  }

  test("kruskalWallis matches a hand-computed tied example") {
    // values: g1 = {1, 2}, g2 = {2, 3}: ranks 1, 2.5, 2.5, 4 ->
    // 2R1 = 7, 2R2 = 13; the DEFINED statistic floors each
    // (2R)²/(4n) term: 49//8 = 6, 169//8 = 21 (exact 6.125/21.125 —
    // the floor loss is sub-unit on a 4-row frame, invisible at data
    // scale); H = (0.6·27 − 15) / (1 − 6/60) = 1.2/0.9 -> 13333 bp
    val df = Seq(("a",1L),("a",2L),("b",2L),("b",3L)).toDF("g", "x")
    val r = Stats.kruskalWallis(df, "g", "x").head()
    assert(r.getAs[Long]("k") == 2L && r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("h_bp") == 13333L)
  }

  test("isotonic PAV pools violators, preserves pool means, and ends monotone") {
    // textbook: rates 0.2, 0.8, 0.4 at x=1,2,3 -> levels 2 and 3 pool
    // to (0.8·5 + 0.4·5)/10 = 0.6
    val rows =
      (1 to 5).map(i => (1L, if (i == 1) 1L else 0L)) ++     // 1/5
      (1 to 5).map(i => (2L, if (i <= 4) 1L else 0L)) ++     // 4/5
      (1 to 5).map(i => (3L, if (i <= 2) 1L else 0L))        // 2/5
    val out = Stats.isotonic(rows.toDF("x", "y"), "x", "y")
      .orderBy("x_lo").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("x_lo") == 1L && out(0).getAs[Long]("rate_bp") == 2000L)
    assert(out(1).getAs[Long]("x_lo") == 2L && out(1).getAs[Long]("x_hi") == 3L)
    assert(out(1).getAs[Long]("rate_bp") == 6000L)
    // monotone and mass-preserving on random data
    val rnd = new scala.util.Random(17)
    val rand = (1 to 500).map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(2).toLong))
    val fit = Stats.isotonic(rand.toDF("x", "y"), "x", "y")
      .orderBy("x_lo").collect()
    val rates = fit.map(_.getAs[Long]("rate_bp"))
    assert(rates.sameElements(rates.sorted), "fit must be nondecreasing")
    assert(fit.map(_.getAs[Long]("n_rows")).sum == 500L)
  }

  test("holtWinters replays its sequential definition, seasonal ring included") {
    val period = 3
    val xs = Seq(100L, 200L, 300L, 120L, 230L, 290L, 105L, 220L, 310L, 90L)
    val df = xs.zipWithIndex.map { case (x, i) => (1L, i.toLong, x) }
      .toDF("k", "ord", "x")
    val got = graft.operators.Recurrences.holtWinters(df, Seq("k"), Seq("ord"),
        "x", period, 1L, 4L, 1L, 4L, 1L, 4L)
      .orderBy("ord").collect().map(_.getAs[Long]("hw_q")).toSeq
    val season = new Array[Long](period)
    var l = 0L; var b = 0L
    val want = xs.zipWithIndex.map { case (x, i) =>
      val slot = i % period
      if (i < period) { l = x; b = 0L; season(slot) = 0L; x }
      else {
        val sOld = season(slot); val lp = l
        l = Math.floorDiv(1L * (x - sOld) + 3L * (l + b), 4L)
        b = Math.floorDiv(1L * (l - lp) + 3L * b, 4L)
        season(slot) = Math.floorDiv(1L * (x - l) + 3L * sOld, 4L)
        l + b + season(slot)
      }
    }
    assert(got == want)
  }

  test("holt replays a sequential simulation exactly, including negative trend states") {
    // a collapsing series forces l to fall and b negative — the
    // floor-division (not truncation) branch must match
    val xs = Seq(1000L, 900L, 50L, 40L, 30L, 2000L, 10L, 5L, 5L, 5L)
    val df = xs.zipWithIndex.map { case (x, i) => (1L, i.toLong, x) }
      .toDF("k", "ord", "x")
    val got = Recurrences.holt(df, Seq("k"), Seq("ord"), "x", 1L, 4L, 1L, 4L)
      .orderBy("ord").collect().map(_.getAs[Long]("holt_q")).toSeq
    // sequential replay
    var l = 0L; var b = 0L; val want = xs.zipWithIndex.map { case (x, i) =>
      if (i == 0) { l = x; b = 0L }
      else {
        val lp = l
        l = Math.floorDiv(1L * x + 3L * (l + b), 4L)
        b = Math.floorDiv(1L * (l - lp) + 3L * b, 4L)
      }
      l + b
    }
    assert(got == want)
    assert(want.exists(_ < 0) || b < 0, "test data should exercise a negative state")
  }

  test("concentration: monopoly, even split, and a hand-computed mix") {
    val df = Seq(
      ("mono", "e1", 100L),
      ("even4", "a", 25L), ("even4", "b", 25L), ("even4", "c", 25L), ("even4", "d", 25L),
      // shares 50/30/20: HHI = .25+.09+.04 = .38 ; CR4 = 100%
      ("mix", "x", 30L), ("mix", "x", 20L), ("mix", "y", 30L), ("mix", "z", 20L))
      .toDF("g", "e", "v")
    val out = Stats.concentration(df, "g", "e", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("mono").getAs[Long]("hhi_e8") == 100000000L)
    assert(out("mono").getAs[Long]("cr4_bp") == 10000L)
    assert(out("even4").getAs[Long]("hhi_e8") == 25000000L)
    assert(out("even4").getAs[Long]("cr4_bp") == 10000L)
    assert(out("mix").getAs[Long]("hhi_e8") == 38000000L)
    assert(out("mix").getAs[Long]("n_entities") == 3L)
    assert(out("mix").getAs[Long]("total") == 100L)
  }

  test("conformalSplit: hand-checked quantile rank and interval coverage") {
    // cal y: {10, 10, 10, 20} -> n=4, S=50, residuals |4y-50| = {10,10,10,30}
    // k = min(ceil(0.9*5), 4) = 4 -> qhat_scaled = 30 (q_e4 = 30*1e4/4 = 75000)
    // test y in [50/4 - 7.5, 20] -> covered iff |4y-50| <= 30 iff 5 <= y <= 20
    val df = Seq(
      (1L, 10L, true), (2L, 10L, true), (3L, 10L, true), (4L, 20L, true),
      (5L, 5L, false), (6L, 20L, false), (7L, 21L, false), (8L, 4L, false))
      .map { case (id, y, c) => ("g", id, y, c) }.toDF("g", "id", "y", "cal")
    val r = Stats.conformalSplit(df, "g", "id", "y", "cal", alphaBp = 1000L).head()
    assert(r.getAs[Long]("n_cal") == 4L)
    assert(r.getAs[Long]("mu_e4") == 125000L)
    assert(r.getAs[Long]("q_e4") == 75000L)
    assert(r.getAs[Long]("n_test") == 4L)
    assert(r.getAs[Long]("covered") == 2L)
    assert(r.getAs[Long]("cover_bp") == 5000L)
  }

  test("conformalSplit: finite-sample coverage holds on exchangeable data") {
    val rnd = new scala.util.Random(11)
    val df = (1L to 2000L).map(i => ("g", i, rnd.nextInt(1000).toLong,
      rnd.nextBoolean())).toDF("g", "id", "y", "cal")
    val r = Stats.conformalSplit(df, "g", "id", "y", "cal", alphaBp = 1000L).head()
    // guarantee is P(cover) >= 90%; on ~1000 test points allow 3 sigma
    assert(r.getAs[Long]("cover_bp") >= 8700L)
  }

  test("sprt replays a naive sequential walk; short streams stay undecided") {
    val (l1, l0, up, lo) = Stats.sprtConstants(4000L, 6000L, 500L, 500L)
    val rnd = new scala.util.Random(9)
    // arm 0: p ~ 0.6 (should accept H1); arm 1: 5 rows (undecided)
    val a0 = (1L to 500L).map(i => (0L, i, if (rnd.nextDouble() < 0.6) 1L else 0L))
    val a1 = (1L to 5L).map(i => (1L, i, 1L))
    val df = (a0 ++ a1).toDF("arm", "i", "x")
    val out = Stats.sprt(df, "arm", Seq(col("i")), "x", 4000L, 6000L)
      .collect().map(r => r.getAs[Long]("arm") -> r).toMap
    // naive replay for arm 0
    var c = 0L; var n = 0L; var hit = Option.empty[(Long, Long)]
    a0.foreach { case (_, _, x) =>
      if (hit.isEmpty) {
        c += x; n += 1
        val llr = c * l1 + (n - c) * l0
        if (llr >= up) hit = Some((n, 1L))
        else if (llr <= lo) hit = Some((n, -1L))
      }
    }
    assert(out(0L).getAs[String]("decision") ==
      (if (hit.get._2 == 1L) "accept_h1" else "accept_h0"))
    assert(out(0L).getAs[Long]("n_decide") == hit.get._1)
    assert(out(0L).getAs[Long]("n_total") == 500L)
    assert(out(1L).getAs[String]("decision") == "undecided")
    assert(out(1L).getAs[Long]("n_decide") == 5L)
  }

  test("grangerLag1: a strict lead alarms one direction, noise neither") {
    val rnd = new scala.util.Random(29)
    // x is noise; y_t = x_{t-1} + small noise -> x Granger-causes y,
    // never the reverse. (An EXACT lead makes the unrestricted SSE
    // literally zero and F infinite — deterministically collinear
    // series are outside the test's domain, like a zero-variance
    // t-test; the noise keeps the edge away.)
    val xs = (1 to 300).map(_ => rnd.nextInt(1000).toLong)
    val ys = (1 until 300).map(t => xs(t - 1) + rnd.nextInt(20))
    val rows =
      (1 until 300).map(t => ("x_causes_y", t.toLong, ys(t - 1), xs(t))) ++
        (1 until 300).map(t => ("y_causes_x", t.toLong, xs(t), ys(t - 1)))
    val df = rows.toDF("k", "ord", "y", "x")
    val out = Stats.grangerLag1(df, "k", "ord", "y", "x").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("f_bp")).toMap
    assert(out("x_causes_y") > 1000L * 10000L,
      s"perfect lead must give an enormous F: ${out("x_causes_y")}")
    assert(out("y_causes_x") < 7 * 10000L,
      s"no reverse causality: ${out("y_causes_x")}")

    // two independent noise series: both directions small
    val na = (1 to 300).map(_ => rnd.nextInt(1000).toLong)
    val nb = (1 to 300).map(_ => rnd.nextInt(1000).toLong)
    val ind = (0 until 300).map(t => ("ind", t.toLong, na(t), nb(t)))
      .toDF("k", "ord", "y", "x")
    val f0 = Stats.grangerLag1(ind, "k", "ord", "y", "x").head()
      .getAs[Long]("f_bp")
    assert(f0 < 7 * 10000L, s"independent noise: $f0")
  }

  test("ebSmoothRates: shrinkage toward the prior, more for small n") {
    val rnd = new scala.util.Random(23)
    // 300 keys with true rate ~0.3 and binomial noise; one tiny-n key
    // at an extreme raw rate and one huge-n key at the same raw rate
    val base = (1 to 300).flatMap { k =>
      (1 to 30).map(_ => (s"k$k", if (rnd.nextDouble() < 0.3) 1L else 0L)) }
    val tiny = (1 to 2).map(_ => ("tiny", 1L))       // raw rate 1.0, n=2
    val huge = (1 to 5000).map(_ => ("huge", 1L))    // raw rate 1.0, n=5000
    val df = (base ++ tiny ++ huge).toDF("key", "hit")
    val out = Stats.ebSmoothRates(df, "key", "hit").collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("raw_bp"), r.getAs[Long]("smoothed_bp"))).toMap
    assert(out("tiny")._1 == 10000L && out("huge")._1 == 10000L)
    // both shrink toward the prior mean, the tiny key MUCH further
    assert(out("tiny")._2 < out("huge")._2)
    assert(out("huge")._2 > 9000L, "evidence-heavy key barely moves")
    assert(out("tiny")._2 < 9000L, "evidence-light key shrinks hard")
    // deterministic under repartition
    val out2 = Stats.ebSmoothRates(df.repartition(13), "key", "hit")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("smoothed_bp")).toMap
    assert(out.map { case (k, v) => k -> v._2 } == out2)
  }

  test("qiniCurve: hand-computed curve, negative uplift goes below zero") {
    // decile 0: 2 treated (2 resp), 2 control (0 resp) -> q = 2
    // decile 1 cumulative: +2t(0r) +2c(2r) -> cum: rt=2 nt=4 rc=2 nc=4
    //   q = 2 - 2*4/4 = 0
    val df = Seq(
      (true, 1L, 0L), (true, 1L, 0L), (false, 0L, 0L), (false, 0L, 0L),
      (true, 0L, 1L), (true, 0L, 1L), (false, 1L, 1L), (false, 1L, 1L))
      .toDF("tr", "resp", "dec")
    val out = Stats.qiniCurve(df, "tr", "resp", "dec").collect()
      .map(r => r.getAs[Long]("decile") -> r.getAs[Long]("qini_e4")).toMap
    assert(out == Map(0L -> 20000L, 1L -> 0L))

    // harmful targeting: controls respond, treated don't -> negative
    val bad = Seq((true, 0L, 0L), (false, 1L, 0L)).toDF("tr", "resp", "dec")
    val q = Stats.qiniCurve(bad, "tr", "resp", "dec").head()
    assert(q.getAs[Long]("qini_e4") == -10000L)
  }

  test("mutualInfo: zero for independence, equals entropy for a bijection") {
    // independent 2x2 with equal counts: every cell term ln(1) = 0
    val ind = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
      .flatMap(p => Seq.fill(10)(p)).toDF("a", "b")
    val r0 = Stats.mutualInfo(ind, "a", "b").head()
    assert(r0.getAs[Long]("mi_e8") == 0L)
    // deterministic bijection: MI = Ha = Hb, nmi = 1
    val dep = Seq(("x", "p"), ("y", "q"), ("z", "r"))
      .flatMap(p => Seq.fill(5)(p)).toDF("a", "b")
    val r1 = Stats.mutualInfo(dep, "a", "b").head()
    assert(r1.getAs[Long]("mi_e8") == r1.getAs[Long]("h_a_e8"))
    assert(r1.getAs[Long]("h_a_e8") == r1.getAs[Long]("h_b_e8"))
    assert(r1.getAs[Long]("nmi_bp") == 10000L)
    // ln(3) entropy for the uniform 3-way margin
    assert(math.abs(r1.getAs[Long]("h_a_e8") -
      math.floor(math.log(3.0) * 1e8 + 0.5).toLong) <= 3L)
  }

  test("logRank: zero on identical curves, naive-formula parity on random data") {
    // two identical groups -> O-E = 0 at every time -> chi2 = 0
    val same = (1 to 50).flatMap(i =>
      Seq((0L, (i % 7).toLong, (i % 2).toLong), (1L, (i % 7).toLong, (i % 2).toLong)))
      .toDF("g", "dur", "ev")
    val z = Stats.logRank(same, "g", "dur", "ev").head()
    assert(z.getAs[Long]("oe_e8") == 0L && z.getAs[Long]("chi2_bp") == 0L)

    // naive replay on a random frame
    val rnd = new scala.util.Random(21)
    val subj = (1 to 300).map(_ => (rnd.nextInt(2).toLong,
      rnd.nextInt(20).toLong, rnd.nextInt(2).toLong))
    val r = Stats.logRank(subj.toDF("g", "dur", "ev"), "g", "dur", "ev").head()
    val times = subj.map(_._2).distinct.sorted
    var oeS = 0L; var vrS = 0L
    times.foreach { t =>
      val atRisk = subj.filter(_._2 >= t)
      val nr = atRisk.size.toLong
      val nr1 = atRisk.count(_._1 == 1L).toLong
      val d = subj.count(s => s._2 == t && s._3 == 1L).toLong
      val d1 = subj.count(s => s._2 == t && s._3 == 1L && s._1 == 1L).toLong
      if (d > 0) {
        val p1 = nr1.toDouble / nr.toDouble
        oeS += math.floor((d1.toDouble - d.toDouble * p1) * 1e8 + 0.5).toLong
        if (nr > 1)
          vrS += math.floor(d.toDouble * p1 * (1.0 - p1) *
            (nr - d).toDouble / (nr - 1).toDouble * 1e8 + 0.5).toLong
      }
    }
    assert(r.getAs[Long]("oe_e8") == oeS)
    assert(r.getAs[Long]("var_e8") == vrS)
    assert(r.getAs[Long]("n_1") == subj.count(_._1 == 1L))
  }

  test("poissonBootstrap: deterministic, CI brackets the point mean") {
    val rnd = new scala.util.Random(5)
    val df = (1L to 3000L).map(i => ("g", i, 1000L + rnd.nextInt(500)))
      .toDF("g", "id", "v")
    val a = Stats.poissonBootstrap(df, "g", "id", "v", b = 100).head()
    val b2 = Stats.poissonBootstrap(
      df.repartition(7), "g", "id", "v", b = 100).head()
    assert(a.getAs[Long]("n_reps") == 100L)
    // bit-identical under any partitioning — the portable-hash contract
    assert(a.getAs[Long]("ci_lo") == b2.getAs[Long]("ci_lo"))
    assert(a.getAs[Long]("ci_hi") == b2.getAs[Long]("ci_hi"))
    val mean = df.agg(sum($"v") / count(lit(1))).head().getDouble(0)
    assert(a.getAs[Long]("ci_lo") <= mean && mean <= a.getAs[Long]("ci_hi"))
    // a ~1250 +/- ~145/sqrt(3000) mean: the CI must be tight, not vacuous
    assert(a.getAs[Long]("ci_hi") - a.getAs[Long]("ci_lo") < 30L)
  }
}
