package graft

import org.apache.spark.sql.functions._
import graft.operators.{IncrementalAgg, Reconcile}

class ReconcileSpec extends SparkSuite {
  import spark.implicits._

  private lazy val oldRows = (1 to 200).map(i => (i.toLong, s"g${i % 5}", i * 1.5))
  private lazy val newRows =
    oldRows.filter(_._1 % 11 != 0) // deletes
      .map { case (id, g, v) => if (id % 7 == 0) (id, g, v + 100.0) else (id, g, v) } ++
      (301 to 330).map(i => (i.toLong, s"g${i % 5}", i * 2.0)) // inserts
  private def toDf(s: Seq[(Long, String, Double)]) = s.toDF("id", "g", "v")

  test("changeFeed applied to the old snapshot reproduces the new one") {
    val feed = Reconcile.changeFeed(toDf(oldRows), toDf(newRows),
      Seq("id"), Seq("g", "v"))
    // apply: drop D keys, add I rows
    val applied = toDf(oldRows)
      .join(feed.filter($"op" === "D").select("id"), Seq("id"), "left_anti")
      .unionByName(feed.filter($"op" === "I").drop("op"))
    assert(applied.orderBy("id", "g", "v").collect().toSeq ===
      toDf(newRows).orderBy("id", "g", "v").collect().toSeq)
    // updates lowered to D+I: both versions present for %7 keys
    val ops = feed.filter($"id" === 7L).select("op").as[String].collect().toSet
    assert(ops === Set("D", "I"))
  }

  test("changeFeed folds through IncrementalAgg to the recompute state") {
    val feed = Reconcile.changeFeed(toDf(oldRows), toDf(newRows),
      Seq("id"), Seq("g", "v"))
    val folded = IncrementalAgg.foldCdc(
      IncrementalAgg.init(toDf(oldRows), Seq("g"), $"v"),
      feed, Seq("g"), $"v", $"op")
      .select($"g", $"n_rows", $"total".cast("double"))
      .orderBy("g").collect().toSeq
    val direct = IncrementalAgg.init(toDf(newRows), Seq("g"), $"v")
      .select($"g", $"n_rows", $"total".cast("double"))
      .orderBy("g").collect().toSeq
    assert(folded === direct)
  }

  test("identical snapshots produce an empty feed and an empty diff") {
    assert(Reconcile.diffKeys(toDf(oldRows), toDf(oldRows),
      Seq("id"), Seq("g", "v")).isEmpty)
    assert(Reconcile.changeFeed(toDf(oldRows), toDf(oldRows),
      Seq("id"), Seq("g", "v")).isEmpty)
  }

  test("Drift.psi: zero on identical snapshots, loud on a planted value shift") {
    import graft.operators.Drift
    val bounds = Seq(100.0, 200.0, 300.0)
    val base = (1 to 4000).map(i => (i.toLong, (i % 400).toDouble)).toDF("id", "v")
    // identical snapshots: every bucket term is exactly 0 ppm
    val same = Drift.psi(base, base, $"v", bounds)
      .select("psi_ppm").as[Long].collect()
    assert(same.forall(_ == 0L), same.toSeq.toString)
    // a 2× value re-scale (the unit bug a checksum of the KEY columns
    // would miss): mass moves up-bucket, PSI crosses the 0.25 alarm
    val shifted = Drift.psi(base, base.withColumn("v", $"v" * 2), $"v", bounds)
    val rows = shifted.orderBy("bucket")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L)) // all buckets present
    // counts are exact: old splits 1000/1000/1000/1000, new 500/500/500/2500
    assert(rows.map(_._2).toSeq === Seq(1000L, 1000L, 1000L, 1000L))
    assert(rows.map(_._3).toSeq === Seq(500L, 500L, 500L, 2500L))
    val totalPsi = rows.map(_._4).sum / 1e6
    assert(totalPsi > 0.25, s"planted shift must alarm: $totalPsi")
    // one-sided-empty bucket stays finite (smoothing), never NaN/∞
    val empt = Drift.psi(base.filter($"v" < 100), base, $"v", bounds)
      .select("psi_ppm").as[Long].collect()
    assert(empt.length === 4 && empt.forall(v => v > Long.MinValue))
    // nulls are EXCLUDED, not piled into the top bucket: adding null
    // values to one side changes nothing
    val withNulls = base.select($"id",
      when($"id" % 7 === 0, lit(null)).otherwise($"v").as("v"))
    val denulled = Drift.psi(base.filter($"id" % 7 =!= 0), base, $"v", bounds)
      .orderBy("bucket").as[(Long, Long, Long, Long)].collect().toSeq
    val nulled = Drift.psi(withNulls, base, $"v", bounds)
      .orderBy("bucket").as[(Long, Long, Long, Long)].collect().toSeq
    assert(nulled === denulled)
  }

  test("ks: zero on identical snapshots, exact on a planted mass move, safe on empty sides") {
    import graft.operators.Drift
    val bounds = Seq(100.0, 200.0, 300.0)
    val base = (1 to 4000).map(i => (i.toLong, (i % 400).toDouble)).toDF("id", "v")
    val same = Drift.ks(base, base, $"v", bounds)
    assert(same.select("diff_bp").as[Long].collect().forall(_ === 0L))
    // move ALL bucket-0 mass (v < 100) up past 300: CDF displacement at
    // buckets 0..2 is exactly 1000/4000 = 2500 bp, 0 at the top bucket
    val shifted = base.withColumn("v", when($"v" < 100, $"v" + 300).otherwise($"v"))
    val ks = Drift.ks(base, shifted, $"v", bounds)
      .orderBy("bucket").select("bucket", "diff_bp").as[(Long, Long)].collect()
    assert(ks.toSeq === Seq((0L, 2500L), (1L, 2500L), (2L, 2500L), (3L, 0L)))
    // KS reads the same counts PSI folds — and an empty side yields the
    // other side's CDF (no NaN/null rows), max = 10000 bp
    val empt = Drift.ks(base.filter($"v" < 0), base, $"v", bounds)
      .select("diff_bp").as[Long].collect()
    assert(empt.nonEmpty && empt.max === 10000L && empt.forall(_ >= 0L))
  }

  test("psiProfile: per-column rows equal single-column psi; one aggregate per snapshot") {
    import graft.operators.Drift
    val oldSnap = (1 to 3000)
      .map(i => (i.toLong, (i % 400).toDouble, (i % 37).toDouble,
        if (i % 11 == 0) null else java.lang.Double.valueOf((i % 9).toDouble)))
      .toDF("id", "price", "qty", "disc")
    val newSnap = (1 to 3000)
      .map(i => (i.toLong, (i % 400) * 2.0, (i % 37).toDouble,
        if (i % 5 == 0) null else java.lang.Double.valueOf((i % 9).toDouble)))
      .toDF("id", "price", "qty", "disc")
    val specs = Seq(
      "price" -> Seq(100.0, 200.0, 300.0),
      "qty" -> Seq(10.0, 20.0),
      "disc" -> Seq(3.0, 6.0))
    val prof = Drift.psiProfile(oldSnap, newSnap, specs)
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select($"bucket", $"n_old", $"n_new", $"psi_ppm")
        .orderBy("bucket").collect().toSeq
    specs.foreach { case (c, bounds) =>
      assert(canon(prof.filter($"col_name" === c)) ===
        canon(Drift.psi(oldSnap, newSnap, col(c), bounds)), c)
    }
    // one-pass shape: 3 columns, still exactly ONE aggregate per
    // snapshot side for the counts (2 count scans of the input total;
    // the totals re-derive from the joined counts, not a rescan)
    val plan = prof.queryExecution.optimizedPlan.toString
    val aggs = plan.split("Aggregate").length - 1
    // counts: 2 sides × (partial+final collapse to one Aggregate node
    // each in the optimized logical plan) + 1 totals groupBy — anything
    // per-column would show ~2×cols aggregates
    assert(aggs <= 2 * 2 + 1, s"expected ≤5 aggregates, got $aggs\n$plan")
  }

  test("psiCategorical: quiet on identical mixes, loud on a mix shift, tail folds to OTHER") {
    import graft.operators.Drift
    val statuses = Seq("OPEN", "SHIPPED", "DONE")
    val base = (1 to 3000).map(i =>
      (i.toLong, if (i % 100 == 0) s"RARE_${i % 7}" else statuses(i % 3)))
      .toDF("id", "status")
    // identical snapshots: every category term is 0 ppm
    val same = Drift.psiCategorical(base, base, $"status", maxCategories = 3)
    assert(same.select("psi_ppm").as[Long].collect().forall(_ === 0L))
    // the 7 rare statuses fold into ONE OTHER row: ≤ maxCategories+1 rows
    val rows = same.select("category").as[String].collect().toSet
    assert(rows === Set("OPEN", "SHIPPED", "DONE", "__OTHER__"))
    // mix shift: most DONE rows become OPEN — row-complete, key-stable,
    // numeric-bucket-invisible, but the category mix moved
    val shifted = base.withColumn("status",
      when($"status" === "DONE" && $"id" % 4 =!= 0, "OPEN").otherwise($"status"))
    val psi = Drift.psiCategorical(base, shifted, $"status", maxCategories = 3)
      .agg(sum("psi_ppm")).head.getLong(0)
    assert(psi >= 250000L, s"mix shift must score as shifted, got $psi ppm")
    // nulls excluded, not folded into OTHER
    val withNulls = base.withColumn("status",
      when($"id" % 5 === 0, lit(null)).otherwise($"status"))
    val denulled = Drift.psiCategorical(
      base.filter($"id" % 5 =!= 0), base, $"status", maxCategories = 3)
      .orderBy("category").collect().toSeq
    assert(Drift.psiCategorical(withNulls, base, $"status", maxCategories = 3)
      .orderBy("category").collect().toSeq === denulled)
  }

  test("incrementally maintained bucket counts score the same PSI as a rescan") {
    import graft.operators.{Drift, IncrementalAgg}
    // bucket counts are plain grouped counts, so a CDC feed keeps them
    // current through foldCdc (state = nBuckets rows, fold = delta-sized)
    // and drift scores against a frozen baseline with NO snapshot rescan
    val bounds = Seq(100.0, 200.0, 300.0)
    val oldSnap = (1 to 3000).map(i => (i.toLong, (i % 373).toDouble))
    val deleted = oldSnap.take(500)
    val inserts = (10001 to 10800).map(i => (i.toLong, 250.0 + (i % 150)))
    val newSnap = oldSnap.drop(500) ++ inserts
    val feed = (deleted.map { case (id, v) => (id, v, "D") } ++
      inserts.map { case (id, v) => (id, v, "I") }).toDF("id", "v", "op")

    val bucketV = Drift.bucketOf($"v", bounds)
    val state0 = IncrementalAgg.init(
      oldSnap.toDF("id", "v").select(bucketV.as("bucket")), Seq("bucket"), lit(0))
    val state1 = IncrementalAgg.foldCdc(state0,
      feed.select(bucketV.as("bucket"), $"op"), Seq("bucket"), lit(0), $"op")
    val maintained = Drift.psiFromCounts(
      state0.select($"bucket", $"n_rows".as("n_old")),
      state1.select($"bucket", $"n_rows".as("n_new")), bounds.size + 1)
      .orderBy("bucket").as[(Long, Long, Long, Long)].collect().toSeq
    val rescanned = Drift.psi(oldSnap.toDF("id", "v"), newSnap.toDF("id", "v"),
      $"v", bounds).orderBy("bucket").as[(Long, Long, Long, Long)].collect().toSeq
    assert(maintained === rescanned)
    assert(maintained.map(_._4).sum > 0, "the planted high-value drift must score")
  }

  test("maintained counts serve the same quantiles as a rescan — zero-rescans percentiles") {
    import graft.operators.{Drift, IncrementalAgg}
    val bounds = (1 until 20).map(_ * 20.0)
    val oldSnap = (1 to 3000).map(i => (i.toLong, (i % 373).toDouble))
    val inserts = (10001 to 10800).map(i => (i.toLong, 250.0 + (i % 150)))
    val newSnap = oldSnap.drop(500) ++ inserts
    val feed = (oldSnap.take(500).map { case (id, v) => (id, v, "D") } ++
      inserts.map { case (id, v) => (id, v, "I") }).toDF("id", "v", "op")
    val bucketV = Drift.bucketOf($"v", bounds)
    val state0 = IncrementalAgg.init(
      oldSnap.toDF("id", "v").select(bucketV.as("bucket")), Seq("bucket"), lit(0))
    val state1 = IncrementalAgg.foldCdc(state0,
      feed.select(bucketV.as("bucket"), $"op"), Seq("bucket"), lit(0), $"op")
    val qs = Seq(2500, 5000, 9000)
    val maintained = Drift.quantilesFromCounts(
      state1.select($"bucket", $"n_rows".as("n")), bounds, qs)
      .orderBy("q_bp").as[(Int, Long, Double)].collect().toSeq
    val rescanned = Drift.quantilesFromCounts(
      Drift.bucketCounts(newSnap.toDF("id", "v"), $"v", bounds, "n"), bounds, qs)
      .orderBy("q_bp").as[(Int, Long, Double)].collect().toSeq
    assert(maintained === rescanned)
    // and the estimates bracket the exact quantiles at bucket resolution
    val sorted = newSnap.map(_._2).sorted
    maintained.foreach { case (q, _, est) =>
      val exact = sorted(((q / 10000.0) * sorted.size).toInt min (sorted.size - 1))
      assert(math.abs(est - exact) <= 20.0 + 1e-9, s"q=$q est=$est exact=$exact")
    }
  }

  test("quantilesFromCounts interpolates inside the covering bucket; edges clamp") {
    import graft.operators.Drift
    // boundaries 10/20/30: bucket 1 = [10,20) with 8 rows, bucket 2 =
    // [20,30) with 2 rows; plus 2 rows below and 2 above the edges
    val vals = Seq.fill(2)(5.0) ++ (1 to 8).map(i => 10.0 + i) ++
      Seq(21.0, 22.0) ++ Seq.fill(2)(99.0) // N = 14
    val bounds = Seq(10.0, 20.0, 30.0)
    val counts = Drift.bucketCounts(vals.toDF("v"), $"v", bounds, "n")
    val out = Drift.quantilesFromCounts(counts, bounds, Seq(1000, 5000, 9999))
      .orderBy($"q_bp").as[(Int, Long, Double)].collect().toSeq
    // q=1000: target 1.4 → bucket 0 (cum 2) → clamps to lo=hi=10.0
    // q=5000: target 7.0 → bucket 1 (cum_before 2, n 8, cum 10):
    //         10 + 10*(7-2)/8 = 16.25
    // q=9999: target 13.9986 → bucket 3 (≥30): clamps to 30.0
    assert(out === Seq((1000, 0L, 10.0), (5000, 1L, 16.25), (9999, 3L, 30.0)))
  }

  test("quantilesFromCounts brackets the exact quantiles at bucket resolution") {
    import graft.operators.Drift
    val rnd = new scala.util.Random(5)
    val vals = Seq.fill(5000)(rnd.nextDouble() * 100)
    val bounds = (1 until 20).map(_ * 5.0) // 5,10,...,95
    val counts = Drift.bucketCounts(vals.toDF("v"), $"v", bounds, "n")
    val qs = Seq(2500, 5000, 7500)
    val out = Drift.quantilesFromCounts(counts, bounds, qs)
      .as[(Int, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    val sorted = vals.sorted
    for (q <- qs) {
      val exact = sorted((q / 10000.0 * vals.size).toInt min (vals.size - 1))
      assert(math.abs(out(q) - exact) <= 5.0 + 1e-9,
        s"q=$q est=${out(q)} exact=$exact") // within one bucket width
    }
  }

  test("psiSeries: only the shifted day alarms; quiet days stay low") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // days 0..5, 400 events each, uniform values — day 5 re-scaled x4
    val rows = for (d <- 0 to 5; i <- 0 until 400) yield {
      val v = (i % 100).toDouble + 1.0
      (d.toLong * 86400L + i, if (d == 5) v * 4 else v)
    }
    val ev = rows.toDF("epoch_s", "value")
    val out = graft.operators.Drift.psiSeries(ev, col("value"),
      Seq(25.0, 50.0, 75.0, 100.0), expr("epoch_s div 86400"))
      .orderBy("period")
      .select("period", "psi_ppm").as[(Long, Long)].collect()
    // periods 1..5 scored (0 has no predecessor)
    assert(out.map(_._1) === Array(1L, 2L, 3L, 4L, 5L))
    out.init.foreach { case (_, ppm) => assert(ppm < 250000, s"quiet day: $ppm") }
    assert(out.last._2 > 250000, s"shifted day must alarm: ${out.last._2}")
    // an empty day between two live ones is simply not scored
    val gappy = rows.filter { case (e, _) => e / 86400 != 2 }.toDF("epoch_s", "value")
    val p2 = graft.operators.Drift.psiSeries(gappy, col("value"),
      Seq(25.0, 50.0, 75.0, 100.0), expr("epoch_s div 86400"))
      .select("period").as[Long].collect().sorted
    assert(!p2.contains(2L) && !p2.contains(3L)) // neither side of the hole
  }
}
