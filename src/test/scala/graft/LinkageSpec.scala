package graft

import org.apache.spark.sql.functions._
import graft.operators.{Diagnostics, RunningTotals}

class LinkageSpec extends SparkSuite {
  import spark.implicits._

  test("sorted-neighborhood pairs == quadratic rank-window formulation") {
    val df = Seq("alpha", "alphq", "beta", "betas", "betaz", "gamma", "gamna")
      .zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("id", "name")
    val ranked = RunningTotals.globalRank(df,
      Seq(col("name").asc, col("id").asc), "rk")
    val left = ranked.select(col("id").as("a"), col("rk").as("ra"))
      .withColumn("__i", explode(lit(Array(1L, 2L, 3L))))
      .withColumn("rk", col("ra") + col("__i"))
    val got = left.join(ranked.select(col("id").as("b"), col("rk")), Seq("rk"))
      .select(col("a"), col("b")).as[(Long, Long)].collect().toSet
    // quadratic reference: every ordered pair within rank distance 1..3
    val r = ranked.select(col("id"), col("rk")).as[(Long, Long)].collect().toSeq
    val want = (for {
      (a, ra) <- r; (b, rb) <- r
      if rb - ra >= 1 && rb - ra <= 3
    } yield (a, b)).toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("linear attribution credits sum to exactly 10000 per conversion") {
    val out = SparkEntry.queries("q_attribution_linear")(spark, sf)
    val sums = out.groupBy(col("purchase_id"))
      .agg(sum(col("credit_bp")).as("total"),
        max(col("credit_bp")).as("mx"), min(col("credit_bp")).as("mn"))
      .collect()
    assert(sums.nonEmpty)
    sums.foreach { row =>
      assert(row.getAs[Long]("total") == 10000L)
      // equal split: credits differ by at most the remainder unit
      assert(row.getAs[Long]("mx") - row.getAs[Long]("mn") <= 1L)
    }
  }

  test("lDiversityViolations flags homogeneous classes and only those") {
    // class (1): sensitive {a, a, a} -> 1 distinct, violates l=2
    // class (2): sensitive {a, b}    -> 2 distinct, passes
    val df = Seq((1L, "a"), (1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"))
      .toDF("q", "s")
    val out = Diagnostics.lDiversityViolations(df, Seq("q"), "s", l = 2)
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("q") == 1L)
    assert(out.head.getAs[Long]("class_size") == 3L)
    assert(out.head.getAs[Long]("n_sensitive_values") == 1L)
  }
}
