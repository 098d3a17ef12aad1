package graft

import org.apache.spark.sql.functions._
import graft.operators.RunningTotals

class RunningTotalsSpec extends SparkSuite {
  import spark.implicits._

  test("globalRunningSum equals the single-window form across partitions") {
    val rnd = new scala.util.Random(5)
    val rows = (1L to 5000L).map(i => (i, rnd.nextInt(100).toLong))
    val df = rows.toDF("id", "v").repartition(17)
    val got = RunningTotals.globalRunningSum(df, Seq(col("v").desc, col("id").asc), "v", "cum")
      .select("id", "cum").as[(Long, Long)].collect().toMap
    val want = rows.sortBy { case (id, v) => (-v, id) }
      .scanLeft((0L, 0L)) { case ((_, acc), (id, v)) => (id, acc + v) }.tail.toMap
    assert(got === want)
  }

  test("globalRank is the exact 1..n row_number in the total order") {
    val df = Seq((3L, "c"), (1L, "a"), (2L, "b"), (10L, "z")).toDF("v", "s")
      .repartition(3)
    val got = RunningTotals.globalRank(df, Seq(col("v").asc), "rnk")
      .orderBy("rnk").select("s", "rnk").as[(String, Long)].collect()
    assert(got === Array(("a", 1L), ("b", 2L), ("c", 3L), ("z", 4L)))
  }

  test("globalRunningMaxExclusive: strict-predecessor max, null for the first row") {
    val rnd = new scala.util.Random(9)
    val rows = (1L to 3000L).map(i => (i, rnd.nextInt(500).toLong))
    val df = rows.toDF("id", "v").repartition(11)
    val got = RunningTotals.globalRunningMaxExclusive(df, Seq(col("id").asc), "v", "mx")
      .select("id", "mx").as[(Long, Option[Long])].collect().toMap
    var m = Option.empty[Long]
    rows.foreach { case (id, v) =>
      assert(got(id) === m, s"id $id")
      m = Some(m.fold(v)(math.max(_, v)))
    }
  }

  test("groupedRunningSum equals the per-group window form, hot group included") {
    val rnd = new scala.util.Random(31)
    // one dominant group (g0 holds 80% of rows) + two small ones
    val rows = (1L to 4000L).map { i =>
      val g = if (i % 5 != 0) "g0" else s"g${i % 3 + 1}"
      (g, i, rnd.nextInt(50).toLong)
    }
    val got = RunningTotals.groupedRunningSum(
        rows.toDF("g", "seq", "v").repartition(13),
        Seq("g"), Seq(col("seq").asc), "v", "cum")
      .select("g", "seq", "cum").as[(String, Long, Long)].collect()
      .map { case (g, s, c) => (g, s) -> c }.toMap
    val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.sortBy(_._2).scanLeft(("", 0L, 0L)) { case ((_, _, acc), (_, s, v)) =>
        (g, s, acc + v) }.tail.map { case (_, s, c) => (g, s) -> c }
    }
    assert(got === want)
  }

  test("groupedRank equals per-group row_number, hot group spanning partitions") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 4000L).map { i =>
      val g = if (i % 4 != 0) "g0" else s"g${i % 3 + 1}"
      (g, i, rnd.nextInt(90).toLong)
    }
    val got = RunningTotals.groupedRank(
        rows.toDF("g", "id", "v").repartition(13),
        Seq("g"), Seq(col("v").asc, col("id").asc), "rk")
      .select("g", "id", "rk").as[(String, Long, Long)].collect()
      .map { case (g, id, r) => (g, id) -> r }.toMap
    val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.sortBy { case (_, id, v) => (v, id) }.zipWithIndex
        .map { case ((_, id, _), i) => (g, id) -> (i + 1L) }
    }
    assert(got === want)
  }

  test("groupedSumAndRank matches the two stacked machines it fuses") {
    val rnd = new scala.util.Random(17)
    val rows = (1L to 3000L).map { i =>
      (s"a${i % 2}", i, rnd.nextInt(2).toLong)
    }
    val df = rows.toDF("arm", "seq", "x").repartition(9)
    val fused = RunningTotals.groupedSumAndRank(df, Seq("arm"),
        Seq(col("seq").asc), "x", "cx", "cn")
      .select("arm", "seq", "cx", "cn").as[(String, Long, Long, Long)]
      .collect().map { case (a, s, cx, cn) => (a, s) -> ((cx, cn)) }.toMap
    val want = rows.groupBy(_._1).flatMap { case (a, rs) =>
      rs.sortBy(_._2).scanLeft(("", 0L, 0L, 0L)) {
        case ((_, _, cx, cn), (_, s, x)) => (a, s, cx + x, cn + 1) }.tail
        .map { case (_, s, cx, cn) => (a, s) -> ((cx, cn)) }
    }
    assert(fused === want)
  }

  test("chained calls append independent rank columns") {
    val df = Seq((1L, 9L), (2L, 5L), (3L, 7L)).toDF("id", "v")
    val out = RunningTotals.globalRank(
        RunningTotals.globalRank(df, Seq(col("v").desc), "by_v"),
        Seq(col("id").asc), "by_id")
      .orderBy("id").select("by_v", "by_id").as[(Long, Long)].collect()
    // v ranks: 9 -> 1, 5 -> 3, 7 -> 2; id ranks: 1, 2, 3
    assert(out === Array((1L, 1L), (3L, 2L), (2L, 3L)))
  }
}
