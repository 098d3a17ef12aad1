package graft

import org.apache.spark.sql.functions._

/** ScalaTest oracle for q_distinct_approx (HLL estimates are
  * engine-specific, so no DuckDB hash compare): the estimate must land
  * within the configured relative error of the exact count, and the
  * aggregate must stay partial→final (mergeable sketch, no value
  * shuffle) — the property that makes it the hot-key-immune path.
  */
class DistinctApproxSpec extends SparkSuite {
  import spark.implicits._

  test("estimate within rsd of exact; plan keeps partial aggregation") {
    val df = SparkEntry.queries("q_distinct_approx")(spark, sf)
    val exact = graft.sources.Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag").agg(countDistinct(col("l_partkey")).as("n"))
      .as[(String, Long)].collect().toMap
    val rows = df.select("l_returnflag", "n_parts_approx").as[(String, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (flag, est) =>
      val ex = exact(flag).toDouble
      assert(math.abs(est - ex) / ex < 0.06, s"$flag: est $est vs exact $ex")
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_approx_count_distinct"), plan)
  }
}
