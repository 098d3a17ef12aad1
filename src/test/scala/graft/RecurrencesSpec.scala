package graft

import org.apache.spark.sql.functions._
import graft.operators.Recurrences

class RecurrencesSpec extends SparkSuite {
  import spark.implicits._

  // (key, seq, x) rows; seq doubles as the sort column
  private def feed(rows: (String, Long, Long)*) =
    rows.toDF("k", "seq", "x")

  /** Reference sequential EWMA, the definition the operator must match. */
  private def ewmaRef(xs: Seq[Long], num: Long, den: Long): Seq[Long] =
    xs.tail.scanLeft(xs.head) { (y, x) => Math.floorDiv(num * x + (den - num) * y, den) }

  test("ewma matches the sequential definition per key") {
    val rows = feed(
      ("a", 1L, 100L), ("a", 2L, 200L), ("a", 3L, 50L), ("a", 4L, 1000L),
      ("b", 1L, 7L), ("b", 2L, 9L))
    val out = Recurrences.ewma(rows, Seq("k"), Seq("seq"), "x", 1L, 4L)
      .orderBy("k", "seq").select("k", "ewma_q").as[(String, Long)].collect()
    assert(out.filter(_._1 == "a").map(_._2).toSeq ===
      ewmaRef(Seq(100L, 200L, 50L, 1000L), 1L, 4L))
    assert(out.filter(_._1 == "b").map(_._2).toSeq === ewmaRef(Seq(7L, 9L), 1L, 4L))
  }

  test("ewma floor division is exact for negative states too") {
    // -1/4 floor-divides to -1 (not 0): Math.floorDiv semantics
    val rows = feed(("a", 1L, -1L), ("a", 2L, -1L))
    val out = Recurrences.ewma(rows, Seq("k"), Seq("seq"), "x", 1L, 4L)
      .orderBy("seq").select("ewma_q").as[Long].collect()
    // y1 = -1; y2 = floorDiv(1*(-1) + 3*(-1), 4) = floorDiv(-4, 4) = -1
    assert(out === Array(-1L, -1L))
    val rows2 = feed(("a", 1L, 0L), ("a", 2L, -1L))
    val out2 = Recurrences.ewma(rows2, Seq("k"), Seq("seq"), "x", 1L, 4L)
      .orderBy("seq").select("ewma_q").as[Long].collect()
    // y2 = floorDiv(-1, 4) = -1, where truncating division would give 0
    assert(out2 === Array(0L, -1L))
  }

  test("cusumAlarms fires at threshold and resets") {
    // target 10, threshold 25: x=20 adds +10 each step
    val rows = feed(
      ("a", 1L, 20L), ("a", 2L, 20L), ("a", 3L, 20L), // s = 10, 20, 30 -> fire, reset
      ("a", 4L, 20L), ("a", 5L, 20L), ("a", 6L, 20L), // s = 10, 20, 30 -> fire
      ("a", 7L, 0L))                                  // s = max(0, 30-10)... post-reset 0+0-10 -> 0
    val out = Recurrences.cusumAlarms(rows, Seq("k"), Seq("seq"), "x", 10L, 25L)
      .orderBy("seq").select("seq", "cusum_q").as[(Long, Long)].collect()
    assert(out === Array((3L, 30L), (6L, 30L)))
  }

  test("cusum state clamps at zero (quiet periods do not build credit)") {
    // big negative x first: state stays 0, then two +20 steps reach 20
    val rows = feed(("a", 1L, -1000L), ("a", 2L, 30L), ("a", 3L, 30L))
    val out = Recurrences.cusumAlarms(rows, Seq("k"), Seq("seq"), "x", 10L, 40L)
      .orderBy("seq").select("seq", "cusum_q").as[(Long, Long)].collect()
    assert(out === Array((3L, 40L))) // 0 -> 20 -> 40, fires exactly at threshold
  }

  test("clampedBalance floors at zero and counts moves") {
    val rows = feed(
      ("p1", 1L, -100L), ("p1", 2L, 30L), ("p1", 3L, -10L),
      ("p2", 1L, 5L))
    val out = Recurrences.clampedBalance(rows, Seq("k"), Seq("seq"), "x", init = 50L)
      .orderBy("k").select("k", "n_moves", "balance_q")
      .as[(String, Long, Long)].collect()
    // p1: 50 -> max(0,-50)=0 -> 30 -> 20 ; p2: 55
    assert(out === Array(("p1", 3L, 20L), ("p2", 1L, 55L)))
  }

  test("ordering is by the sort columns, not input order") {
    val rows = feed(("a", 3L, 1L), ("a", 1L, 100L), ("a", 2L, 0L))
    val out = Recurrences.ewma(rows, Seq("k"), Seq("seq"), "x", 1L, 2L)
      .orderBy("seq").select("ewma_q").as[Long].collect()
    // sorted x: 100, 0, 1 -> 100, 50, 25
    assert(out === Array(100L, 50L, 25L))
  }

  test("randomized equality with a driver-side reference fold") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 2000).map { i =>
      (s"k${rnd.nextInt(7)}", i.toLong, rnd.nextLong() % 10000)
    }
    val df = rows.toDF("k", "seq", "x").repartition(13)
    val got = Recurrences.ewma(df, Seq("k"), Seq("seq"), "x", 2L, 7L)
      .select("k", "seq", "ewma_q").as[(String, Long, Long)].collect()
      .groupBy(_._1).map { case (k, a) => k -> a.sortBy(_._2).map(_._3).toSeq }
    val want = rows.groupBy(_._1).map { case (k, a) =>
      k -> ewmaRef(a.sortBy(_._2).map(_._3), 2L, 7L)
    }
    assert(got === want)
  }

  test("plan has exactly one exchange (keyed shuffle with secondary sort)") {
    val rows = feed(("a", 1L, 1L), ("b", 2L, 2L))
    val plan = Recurrences.ewma(rows, Seq("k"), Seq("seq"), "x", 1L, 4L)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size <= 2, plan) // local rel + 1 keyed
  }
}
