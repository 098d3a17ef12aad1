package graft

import graft.operators.Binning

class VOptimalSpec extends SparkSuite {
  import spark.implicits._

  test("two well-separated clusters split exactly at the gap, zero SSE") {
    val xs = Seq.fill(20)(10L) ++ Seq.fill(30)(1000L)
    val out = Binning.vOptimal(xs.toDF("x"), "x", nBuckets = 2)
      .orderBy("bucket").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("lo") == 10L && out(0).getAs[Long]("hi") == 10L)
    assert(out(1).getAs[Long]("lo") == 1000L && out(1).getAs[Long]("hi") == 1000L)
    assert(out.map(_.getAs[Long]("sse_q")).sum == 0L)
    assert(out.map(_.getAs[Long]("n_rows")).toSeq == Seq(20L, 30L))
  }

  test("DP matches brute-force enumeration of all 3-bucket partitions") {
    val rnd = new scala.util.Random(21)
    val xs = Seq.fill(60)(rnd.nextInt(40).toLong)
    val got = Binning.vOptimal(xs.toDF("x"), "x", nBuckets = 3)
      .collect().map(_.getAs[Long]("sse_q")).sum
    // brute force over the distinct-value levels
    val levels = xs.groupBy(identity).toSeq.sortBy(_._1)
      .map { case (v, g) => (v, g.size.toLong) }
    val m = levels.size
    def cost(lo: Int, hi: Int): BigInt = {
      val seg = levels.slice(lo, hi)
      val n = BigInt(seg.map(_._2).sum)
      val s1 = seg.map { case (v, c) => BigInt(v) * c }.sum
      val s2 = seg.map { case (v, c) => BigInt(v) * v * c }.sum
      if (n == 0) BigInt(0) else (n * s2 - s1 * s1) / n
    }
    val best = (for {
      i <- 1 until m; j <- i + 1 until m
    } yield cost(0, i) + cost(i, j) + cost(j, m)).min
    assert(BigInt(got) == best)
  }

  test("bucket count collapses gracefully when values are fewer than buckets") {
    val out = Binning.vOptimal(Seq(5L, 5L, 7L).toDF("x"), "x", nBuckets = 8)
      .collect()
    assert(out.length == 2) // only two distinct values
    assert(out.map(_.getAs[Long]("sse_q")).sum == 0L)
  }

  test("maxValues guard names the fix") {
    val e = intercept[IllegalArgumentException](
      Binning.vOptimal((1L to 100L).toDF("x"), "x", 4, maxValues = 50))
    assert(e.getMessage.contains("pre-quantize"))
  }
}
