package graft

import org.apache.spark.sql.functions._
import graft.similarity.Whitening

class WhiteningSpec extends SparkSuite {
  import spark.implicits._

  /** Correlated 4-d cloud: x0 ~ base, x1 = 0.9·x0 + noise, x2/x3 small. */
  private def corpus(n: Int, seed: Int = 3) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val b = rnd.nextGaussian()
      (i.toLong, Seq(
        (b * 2.0).toFloat,
        (b * 1.8 + rnd.nextGaussian() * 0.3).toFloat,
        (rnd.nextGaussian() * 0.5).toFloat,
        (rnd.nextGaussian() * 0.1 + 7.0).toFloat)) // nonzero mean
    }.toDF("vec_id", "embedding")
  }

  test("moments equals the naive mean/covariance within the 2^-20 grain") {
    val df = corpus(500)
    val rows = df.as[(Long, Seq[Float])].collect().map(_._2.map(_.toDouble))
    val n = rows.length
    val naiveMean = (0 until 4).map(d => rows.map(_(d)).sum / n)
    val (cnt, mean, cov) = Whitening.moments(df, "embedding")
    assert(cnt === n.toLong)
    // fixed-point accumulation perturbs each raw moment by <= 2^-20;
    // means by the same bound, covariances by ~3x it (three quantized
    // terms enter) — far below whitening precision
    (0 until 4).foreach(d => assert(math.abs(mean(d) - naiveMean(d)) < 2e-6))
    for (i <- 0 until 4; j <- 0 until 4) {
      val naive = rows.map(r => (r(i) - naiveMean(i)) * (r(j) - naiveMean(j))).sum / n
      assert(math.abs(cov(i)(j) - naive) < 1e-4, s"cov($i,$j)")
    }
  }

  test("moments are bit-identical across partitionings") {
    // the quantized-Lloyd contract extended to the moments pass: exact
    // long sums make the covariance — and the basis trained from it —
    // independent of partition count and task order
    val df = corpus(500)
    val (_, m1, c1) = Whitening.moments(df.repartition(1), "embedding")
    val (_, m17, c17) = Whitening.moments(df.repartition(17), "embedding")
    assert(m1.map(java.lang.Double.doubleToLongBits).toSeq ===
      m17.map(java.lang.Double.doubleToLongBits).toSeq)
    assert(c1.flatten.map(java.lang.Double.doubleToLongBits).toSeq ===
      c17.flatten.map(java.lang.Double.doubleToLongBits).toSeq)
  }

  test("eigenSym reconstructs the matrix and returns an orthonormal basis") {
    val rnd = new scala.util.Random(9)
    val m0 = Array.fill(6, 6)(rnd.nextGaussian())
    val sym = Array.tabulate(6, 6)((i, j) => (m0(i)(j) + m0(j)(i)) / 2)
    val (vals, vecs) = Whitening.eigenSym(sym)
    // descending eigenvalues
    assert(vals.zip(vals.drop(1)).forall { case (a, b) => a >= b - 1e-12 })
    // rows orthonormal
    for (i <- 0 until 6; j <- 0 until 6) {
      val dot = (0 until 6).map(k => vecs(i)(k) * vecs(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9, s"v$i . v$j = $dot")
    }
    // A·vᵢ = λᵢ·vᵢ
    for (i <- 0 until 6; r <- 0 until 6) {
      val av = (0 until 6).map(k => sym(r)(k) * vecs(i)(k)).sum
      assert(math.abs(av - vals(i) * vecs(i)(r)) < 1e-8, s"eig $i row $r")
    }
  }

  test("whitening yields an identity covariance; projection is shuffle-free") {
    val df = corpus(2000)
    val t = Whitening.fit(df, "embedding", k = 4)
    val out = df.select(col("vec_id"), t(col("embedding")).as("w"))
    // plan: pure map — no exchange anywhere
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    val w = out.as[(Long, Seq[Double])].collect().map(_._2)
    val n = w.length
    for (i <- 0 until 4; j <- 0 until 4) {
      val mi = w.map(_(i)).sum / n
      val c = w.map(r => (r(i) - mi) * (r(j) - mi)).sum / n
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(c - want) < 0.05, s"whitened cov($i,$j)=$c")
    }
  }

  test("top-1 PCA captures the dominant direction; transform is deterministic") {
    val df = corpus(1000)
    val t1 = Whitening.fit(df, "embedding", k = 1)
    val t2 = Whitening.fit(df, "embedding", k = 1)
    assert(t1.components.head.toSeq === t2.components.head.toSeq)
    assert(t1.eigenvalues.head === t2.eigenvalues.head)
    // the dominant direction is the correlated (x0, x1) plane
    val c = t1.components.head
    assert(math.abs(c(0)) > 0.5 && math.abs(c(1)) > 0.5, c.toSeq.toString)
    assert(math.abs(c(2)) < 0.2 && math.abs(c(3)) < 0.2, c.toSeq.toString)
    // explained variance dominates the trace
    val (_, _, cov) = Whitening.moments(df, "embedding")
    val trace = (0 until 4).map(i => cov(i)(i)).sum
    assert(t1.eigenvalues.head / trace > 0.8)
  }
}
