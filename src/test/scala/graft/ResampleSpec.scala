package graft

import org.apache.spark.sql.functions._
import graft.operators.Resample

class ResampleSpec extends SparkSuite {
  import spark.implicits._

  /** Naive reference: for each key, for each aligned grid point in
    * [ceil(mn), floor(mx)], the max value among observations at the
    * latest observed ts ≤ grid point.
    */
  private def naive(obs: Seq[(Long, Long, Double)], step: Long): Seq[(Long, Long, Double)] =
    obs.groupBy(_._1).toSeq.flatMap { case (k, rows) =>
      val byTs = rows.groupBy(_._2).map { case (t, rs) => t -> rs.map(_._3).max }
      val ts = byTs.keys.toSeq.sorted
      val (mn, mx) = (ts.head, ts.last)
      val start = mn + (step - mn % step) % step
      val end = mx - mx % step
      (start to end by step).map { g =>
        val t = ts.filter(_ <= g).last
        (k, g, byTs(t))
      }
    }.sortBy(r => (r._1, r._2))

  test("forward fill equals the naive per-grid-point definition") {
    val obs = Seq(
      (1L, 100L, 1.0), (1L, 130L, 2.0), (1L, 305L, 3.0),
      (2L, 60L, 9.0), (2L, 61L, 8.0),
      (3L, 50L, 4.0), (3L, 50L, 7.0), // same-ts tie → max
      (3L, 240L, 5.0))
    val out = Resample.forwardFill(obs.toDF("k", "t", "v"), "k", "t", "v",
        stepSeconds = 60L)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(out === naive(obs, 60L))
    assert(out.nonEmpty)
  }

  test("forward fill matches naive on random irregular series") {
    val rnd = new scala.util.Random(7)
    val obs = Seq.fill(800)(
      (rnd.nextInt(5).toLong, rnd.nextInt(100000).toLong, rnd.nextInt(100).toDouble))
    val out = Resample.forwardFill(obs.toDF("k", "t", "v"), "k", "t", "v",
        stepSeconds = 3600L)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(out === naive(obs, 3600L))
  }

  test("grid points are aligned epoch multiples and values are never null") {
    val obs = Seq((1L, 1001L, 1.0), (1L, 9999L, 2.0))
    val out = Resample.forwardFill(obs.toDF("k", "t", "v"), "k", "t", "v", 500L)
    val rows = out.collect()
    assert(rows.forall(r => r.getLong(1) % 500L == 0))
    assert(rows.forall(!_.isNullAt(2)))
    assert(rows.map(_.getLong(1)).min == 1500L) // ceil(1001)
    assert(rows.map(_.getLong(1)).max == 9500L) // floor(9999)
  }

  test("a key whose span holds no aligned grid point emits nothing") {
    val obs = Seq((1L, 1001L, 1.0), (1L, 1400L, 2.0), // no multiple of 500 inside
      (2L, 500L, 3.0)) // exactly on the grid: one point
    val out = Resample.forwardFill(obs.toDF("k", "t", "v"), "k", "t", "v", 500L)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out === Seq((2L, 500L, 3.0)))
  }

  test("a pathological span raises a named error instead of exploding the grid") {
    val obs = Seq((1L, 0L, 1.0), (1L, Long.MaxValue / 4, 2.0))
    val e = intercept[Exception] {
      Resample.forwardFill(obs.toDF("k", "t", "v"), "k", "t", "v", 60L,
        maxGridPoints = 1000000L).count()
    }
    assert(e.getMessage.contains("resample") || e.getCause != null)
  }

  test("interpolate draws the line between surrounding observations") {
    val obs = Seq(
      (1L, 100L, 10.0), (1L, 200L, 30.0), // grid 150 → 20.0
      (1L, 500L, 30.0),                   // 300,400 on the 100..500 line? no:
      // segments are between CONSECUTIVE obs: [200,500] spans 250..450
      (2L, 50L, 5.0), (2L, 50L, 7.0))     // single instant (tie→max), 1 grid pt
    val out = Resample.interpolate(obs.toDF("k", "t", "v"), "k", "t", "v", 50L)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(r => (r._1, r._2))
    val expected = Seq(
      (1L, 100L, 10.0), (1L, 150L, 20.0), (1L, 200L, 30.0),
      (1L, 250L, 30.0), (1L, 300L, 30.0), (1L, 350L, 30.0),
      (1L, 400L, 30.0), (1L, 450L, 30.0), (1L, 500L, 30.0),
      (2L, 50L, 7.0))
    assert(out === expected)
  }

  test("interpolate equals the naive two-neighbour formula on random series") {
    val rnd = new scala.util.Random(13)
    val obs = Seq.fill(600)(
      (rnd.nextInt(4).toLong, rnd.nextInt(50000).toLong, rnd.nextInt(100).toDouble))
    val step = 1800L
    val out = Resample.interpolate(obs.toDF("k", "t", "v"), "k", "t", "v", step)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(r => (r._1, r._2))
    val naive = obs.groupBy(_._1).toSeq.flatMap { case (k, rows) =>
      val byTs = rows.groupBy(_._2).map { case (t, rs) => t -> rs.map(_._3).max }
      val ts = byTs.keys.toSeq.sorted
      val (mn, mx) = (ts.head, ts.last)
      val start = mn + (step - mn % step) % step
      val end = mx - mx % step
      (start to end by step).map { g =>
        val t0 = ts.filter(_ <= g).last
        val t1 = ts.filter(_ >= g).head
        val v = if (t1 == t0) byTs(t0)
          else byTs(t0) + (byTs(t1) - byTs(t0)) * (g - t0).toDouble / (t1 - t0).toDouble
        (k, g, v)
      }
    }.sortBy(r => (r._1, r._2))
    assert(out === naive)
  }

  test("timestamp columns cast to truncated epoch seconds") {
    val obs = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:30.9"), 1.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 02:10:00.0"), 2.0))
    val out = Resample.forwardFill(obs.toDF("k", "t", "v"), "k", "t", "v", 3600L)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._2)
    // two aligned hours inside the span; epoch alignment is tz-independent
    assert(out.map(_._3) === Seq(1.0, 1.0))
    assert(out.size == 2)
  }

  test("timeWeightedAvg: sample-and-hold weighting, singletons excluded") {
    // key 1: 100 for 10s then 200 for 30s -> (1000+6000)/40 = 175
    // key 2: single observation -> no extent -> absent
    // key 3: same-second tie holds the later-id value for the whole span
    val rows = Seq(
      (1L, 100L, 1L, 100L), (1L, 110L, 2L, 200L), (1L, 140L, 3L, 999L),
      (2L, 100L, 4L, 50L),
      (3L, 100L, 5L, 10L), (3L, 100L, 6L, 30L), (3L, 200L, 7L, 70L))
    val df = rows.toDF("k", "ep", "id", "v")
    val out = Resample.timeWeightedAvg(df, "k", "ep", "id", "v")
      .collect().map(r => r.getAs[Long]("k") ->
        (r.getAs[Long]("n_obs"), r.getAs[Long]("span_s"), r.getAs[Long]("twa")))
      .toMap
    assert(out(1L) == (3L, 40L, 175L))
    assert(!out.contains(2L))
    // id5 holds 0s, id6 holds 100s: twa = 30
    assert(out(3L) == (3L, 100L, 30L))
  }
}
