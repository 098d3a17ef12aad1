package graft

import org.apache.spark.sql.functions._
import graft.operators.Robust

class RobustSpec extends SparkSuite {
  import spark.implicits._

  test("winsorize clamps to the discrete p10/p90 cuts, nulls pass through") {
    // group g: values 1..10 → p10 cut = 1st smallest (1.0), p90 = 9th (9.0)
    val rows = (1 to 10).map(i => ("g", i.toLong, Some(i.toDouble))) :+
      (("g", 11L, Option.empty[Double]))
    val out = Robust.winsorize(
      rows.toDF("k", "id", "v"), Seq("k"), "v", loBp = 1000, hiBp = 9000)
      .orderBy("id")
      .select("id", "v_w", "clamped_lo", "clamped_hi")
      .as[(Long, Option[Double], Boolean, Boolean)].collect()
    assert(out(9) === ((10L, Some(9.0), false, true)))  // 10 clamps down
    assert(out(0) === ((1L, Some(1.0), false, false)))  // p10 rank 1 → no-op
    assert(out(4) === ((5L, Some(5.0), false, false)))
    assert(out(10) === ((11L, None, false, false)))     // null untouched
  }

  test("imputeGroupMedian fills with the in-group lower median") {
    val rows = Seq(
      ("a", 1L, Some(10.0)), ("a", 2L, Some(20.0)), ("a", 3L, Some(30.0)),
      ("a", 4L, Some(40.0)), ("a", 5L, None),
      ("b", 6L, None)) // all-null group keeps its null
    val out = Robust.imputeGroupMedian(
      rows.toDF("k", "id", "v"), Seq("k"), "v")
      .orderBy("id").select("id", "v_f", "imputed")
      .as[(Long, Option[Double], Boolean)].collect()
    // lower median of {10,20,30,40} = (4+1) div 2 = 2nd smallest = 20
    assert(out(4) === ((5L, Some(20.0), true)))
    assert(out(0) === ((1L, Some(10.0), false)))
    assert(out(5) === ((6L, None, false)))
  }

  test("winsorize: every output value existed in the group (rank-selected)") {
    val rnd = new scala.util.Random(3)
    val rows = (1L to 500L).map(i => ("g" + (i % 3), i, rnd.nextGaussian()))
    val df = rows.toDF("k", "id", "v")
    val out = Robust.winsorize(df, Seq("k"), "v").select("k", "v_w")
      .as[(String, Double)].collect()
    val byGroup = rows.groupBy(_._1).map { case (k, rs) => k -> rs.map(_._3).toSet }
    out.foreach { case (k, w) => assert(byGroup(k).contains(w)) }
  }
}
