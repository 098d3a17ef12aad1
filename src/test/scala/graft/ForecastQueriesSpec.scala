package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the composed forecasting queries (the §6
  * replay-vs-semantics rule: the oracle proves both engines agree, these
  * prove they agree on the right thing).
  */
class ForecastQueriesSpec extends SparkSuite {
  import spark.implicits._

  test("croston reduces to plain ewma when demand is continuous") {
    val out = SparkEntry.queries("q_croston")(spark, sf)
      .select("l_partkey", "n_periods", "p_q", "z_q", "rate_bp")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    val maxPeriods = out.map(_._2).max
    val continuous = out.filter(_._2 == maxPeriods)
    assert(continuous.nonEmpty, "some part should order every month")
    // monthly demand with no gaps: every interval is 1, so the interval
    // smoother is pinned at 1 and the rate IS the size level
    continuous.foreach { case (pk, _, p, z, rate) =>
      assert(p == 1L, s"part $pk continuous but p_q=$p")
      assert(rate == z * 10000L, s"part $pk rate != z")
    }
    // intermittent parts exist and their rates discount by the interval
    assert(out.exists(r => r._3 > 1L && r._5 < r._4 * 10000L))
  }

  test("newsvendor: the rank-selected level covers >= 80% of months") {
    val q = SparkEntry.queries("q_newsvendor")(spark, sf)
      .select("p_brand", "q_star").as[(String, Long)].collect().toMap
    // recompute coverage from the raw per-brand monthly demand
    val dm = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(spark.read.parquet(s"$sf/part.parquet"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"),
        (year(col("l_shipdate")) * 12 + month(col("l_shipdate"))).as("mn"))
      .agg(sum(floor(col("l_quantity") + 0.5).cast("long")).as("q"))
      .select("p_brand", "q").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2))
    dm.foreach { case (b, qs) =>
      val cover = qs.count(_ <= q(b)).toDouble / qs.size
      assert(cover >= 0.8, s"brand $b covers only $cover")
      // and the NEXT-smaller level would not suffice (minimality)
      val below = qs.filter(_ < q(b))
      if (below.nonEmpty)
        assert(below.count(_ <= below.max).toDouble / qs.size < 0.8 ||
          qs.count(_ <= below.max).toDouble / qs.size < 0.8,
          s"brand $b level not minimal")
    }
  }

  test("retention fit: decay slope is negative on this corpus") {
    val r = SparkEntry.queries("q_retention_fit")(spark, sf).head()
    assert(r.getAs[Long]("slope_bp") < 0L)
    assert(r.getAs[Long]("n_points") > 100L)
  }

  test("forecast reconciliation: regions add up exactly; weights respected") {
    val out = SparkEntry.queries("q_forecast_reconcile")(spark, sf)
      .select("region", "base_fc", "region_fc", "reconciled_fc")
      .as[(Int, Long, Long, Long)].collect()
    out.groupBy(_._1).foreach { case (region, rows) =>
      assert(rows.map(_._4).sum == rows.head._3,
        s"region $region reconciled sum != region forecast")
    }
    // proportionality: within a region, a larger base forecast never
    // receives a smaller reconciled share
    out.groupBy(_._1).foreach { case (_, rows) =>
      rows.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) => assert(a._4 <= b._4 + 1)
        case _ =>
      }
    }
  }
}
