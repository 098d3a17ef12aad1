package graft

import org.apache.spark.sql.functions._
import graft.operators.Causal

class CausalSpec extends SparkSuite {
  import spark.implicits._

  // (id, stratum, score, treated, outcome)
  private def pop(rows: (Long, String, Long, Boolean, Long)*) =
    rows.toDF("id", "st", "s", "tr", "y")

  test("nearest control per stratum; at-or-below wins exact distance ties") {
    val df = pop(
      (1L, "a", 100L, true, 500L),  // controls at 90 and 110: tie -> 90
      (2L, "a", 90L, false, 400L),
      (3L, "a", 110L, false, 450L),
      (4L, "a", 300L, true, 900L),  // nearest is 110 (dist 190)
      (5L, "b", 50L, true, 100L),   // only control in b is 58
      (6L, "b", 58L, false, 80L))
    val m = Causal.propensityMatch(df, "id", "st", "s", "tr", "y", caliper = 1000L)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("match_id"), r.getAs[Long]("effect"))).toMap
    assert(m(1L) == (2L, 100L)) // backward preferred on the tie
    assert(m(4L) == (3L, 450L)) // with replacement: 3 could match twice
    assert(m(5L) == (6L, 20L))
  }

  test("caliper drops far matches; strata never mix; controls dedup to min id") {
    val df = pop(
      (1L, "a", 100L, true, 500L),  // only a-control is 800 away -> dropped
      (2L, "b", 101L, false, 1L),   // 1 away but in stratum b: invisible
      (3L, "a", 900L, false, 2L),
      (4L, "c", 100L, true, 700L),  // exact-score controls dedup to min id
      (5L, "c", 105L, false, 10L),
      (6L, "c", 105L, false, 20L))
    val out = Causal.propensityMatch(df, "id", "st", "s", "tr", "y", caliper = 50L)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("match_id")).toMap
    assert(!out.contains(1L)) // caliper drop; stratum b's near control ignored
    assert(out(4L) == 5L)     // min-id winner among equal-score controls
    assert(out.size == 1)
  }

  test("brute-force parity on a randomized population") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 400L).map { i =>
      (i, s"s${rnd.nextInt(4)}", rnd.nextInt(1000).toLong,
        rnd.nextBoolean(), rnd.nextInt(100000).toLong)
    }
    val df = rows.toDF("id", "st", "s", "tr", "y")
    val got = Causal.propensityMatch(df, "id", "st", "s", "tr", "y", caliper = 120L)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("match_id")).toMap
    // naive: controls dedup to min id per (st, s); nearest by |d| with
    // at-or-below preference
    val ctl = rows.filter(!_._4).groupBy(r => (r._2, r._3))
      .map { case (k, v) => (k._1, k._2, v.map(_._1).min) }.toSeq
    val expected = rows.filter(_._4).flatMap { case (id, st, s, _, _) =>
      val cands = ctl.filter(_._1 == st)
      if (cands.isEmpty) None
      else {
        val best = cands.minBy { case (_, cs, cid) =>
          (math.abs(cs - s), if (cs <= s) 0 else 1, cid) }
        if (math.abs(best._2 - s) <= 120L) Some(id -> best._3) else None
      }
    }.toMap
    assert(got == expected)
  }
}
