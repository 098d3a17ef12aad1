package graft

import graft.operators.ChangePoints

class ChangePointsSpec extends SparkSuite {
  import spark.implicits._

  private def series(xs: Seq[Long]) =
    xs.zipWithIndex.map { case (x, i) => (i.toLong + 1, x) }.toDF("rn", "x")

  test("planted mean shifts are recovered at the exact indices") {
    // three regimes with deterministic +-1 jitter; shifts at rn 41, 81
    val xs = (0 until 40).map(i => 1000L + (i % 3) - 1) ++
      (0 until 40).map(i => 5000L + (i % 3) - 1) ++
      (0 until 40).map(i => 2000L + (i % 3) - 1)
    val out = ChangePoints.binarySegmentation(series(xs), "rn", "x",
        minSeg = 5, maxPoints = 5, minGainPermille = 100L)
      .orderBy("cp_ord").collect()
    val cps = out.filter(_.getAs[Boolean]("significant")).map(_.getAs[Long]("cp_ord"))
    assert(cps.toSeq == Seq(41L, 81L))
    val first = out.find(_.getAs[Long]("cp_ord") == 41L).get
    // 40 = 13·3+1 jitter cycles: sum = 13·3000 + 999 = 39999 -> 999.975
    assert(first.getAs[Long]("left_mean_q") == 99997L)
    assert(first.getAs[Long]("right_mean_q") > 300000L)   // mixed 5000/2000 right side
  }

  test("a stationary series yields one insignificant candidate, never zero rows") {
    val out = ChangePoints.binarySegmentation(
      series((0 until 60).map(i => 500L + (i % 2))), "rn", "x",
      minSeg = 5, maxPoints = 5, minGainPermille = 100L).collect()
    assert(out.length == 1)
    assert(!out.head.getAs[Boolean]("significant"))
  }

  test("constant series: zero SSE everywhere, candidate has zero gain") {
    val out = ChangePoints.binarySegmentation(
      series(Seq.fill(30)(42L)), "rn", "x",
      minSeg = 5, maxPoints = 3, minGainPermille = 10L).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("gain_permille") == 0L)
    assert(!out.head.getAs[Boolean]("significant"))
  }

  test("deterministic under input row order") {
    val xs = (0 until 30).map(_ => 100L) ++ (0 until 30).map(_ => 900L)
    val df = series(xs)
    val a = ChangePoints.binarySegmentation(df, "rn", "x", 5, 5, 100L).collect().toSeq
    val b = ChangePoints.binarySegmentation(df.orderBy(org.apache.spark.sql.functions.rand(3)),
      "rn", "x", 5, 5, 100L).collect().toSeq
    assert(a == b)
    assert(a.head.getAs[Long]("cp_ord") == 31L)
  }

  test("maxLen guard fails loudly on an over-long series, naming the fix") {
    val xs = (0 until 50).map(_.toLong)
    val e = intercept[IllegalArgumentException] {
      ChangePoints.binarySegmentation(series(xs), "rn", "x",
        minSeg = 5, maxPoints = 5, minGainPermille = 100L, maxLen = 49)
    }
    assert(e.getMessage.contains("maxLen=49"))
    assert(e.getMessage.contains("coarser period"))
    // at the bound it still runs (the limit cap collects maxLen+1 to
    // DETECT overflow, not to truncate silently)
    val ok = ChangePoints.binarySegmentation(series(xs), "rn", "x",
      minSeg = 5, maxPoints = 5, minGainPermille = 100L, maxLen = 50)
    assert(ok.count() >= 1)
  }
}
