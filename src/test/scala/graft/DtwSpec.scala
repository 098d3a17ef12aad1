package graft

import org.apache.spark.sql.functions._
import graft.operators.Dtw

class DtwSpec extends SparkSuite {
  import spark.implicits._

  private def series(rows: (String, Long, Long)*) =
    rows.toDF("k", "i", "v")

  test("hand-computed alignment and the elastic-vs-euclidean case") {
    // a=[1,2,3] vs b=[1,3]: optimal path cost 1 (2 matches to either end)
    val df = series(
      ("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L),
      ("b", 1L, 1L), ("b", 2L, 3L))
    val r = Dtw.pairDistances(df, "k", "i", "v", band = 10).head()
    assert(r.getAs[Long]("dtw") == 1L)
    assert((r.getAs[Long]("len1"), r.getAs[Long]("len2")) == (3L, 2L))

    // a shifted copy: DTW forgives the lag a pointwise distance cannot
    val shift = series(
      (Seq(10L, 50L, 10L, 10L).zipWithIndex.map { case (v, i) => ("x", i.toLong, v) } ++
        Seq(10L, 10L, 50L, 10L).zipWithIndex.map { case (v, i) => ("y", i.toLong, v) }): _*)
    val d = Dtw.pairDistances(shift, "k", "i", "v", band = 3).head()
    assert(d.getAs[Long]("dtw") == 0L) // perfect elastic alignment
  }

  test("banded DP equals the full matrix when the band covers it; sentinel when not") {
    val rnd = new scala.util.Random(17)
    val a = Seq.fill(40)(rnd.nextInt(100).toLong)
    val b = Seq.fill(35)(rnd.nextInt(100).toLong)
    def full(x: Seq[Long], y: Seq[Long]): Long = {
      val n = x.length; val m = y.length
      val dp = Array.fill(n + 1, m + 1)(Long.MaxValue / 4)
      dp(0)(0) = 0
      for (i <- 1 to n; j <- 1 to m)
        dp(i)(j) = math.abs(x(i - 1) - y(j - 1)) +
          Seq(dp(i - 1)(j), dp(i)(j - 1), dp(i - 1)(j - 1)).min
      dp(n)(m)
    }
    assert(Dtw.banded(a, b, band = 40) == full(a, b))
    // narrower bands only ever raise the cost (fewer paths allowed)
    val wide = Dtw.banded(a, b, band = 40)
    val mid = Dtw.banded(a, b, band = 10)
    assert(mid >= wide)
    // |len diff| > band: no in-band alignment exists
    assert(Dtw.banded(a, b.take(10), band = 5) == -1L)
  }

  test("series over maxLen raise a named error") {
    val big = (1 to 50).map(i => ("k1", i.toLong, 1L)) ++
      (1 to 3).map(i => ("k2", i.toLong, 1L))
    val e = intercept[Exception] {
      Dtw.pairDistances(series(big: _*), "k", "i", "v", band = 5,
        maxLen = 10).collect()
    }
    assert(e.getMessage.contains("maxLen"))
  }
}
