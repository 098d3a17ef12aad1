package graft

import org.apache.spark.sql.functions._
import graft.operators.ShapleyAttribution

class ShapleySpec extends SparkSuite {
  import spark.implicits._

  // (journey, type, ts, id)
  private def ev(rows: (String, String, Long, Long)*) =
    rows.toDF("j", "t", "ts", "id")

  test("hand-computed two-channel lattice") {
    // converting journeys: {A}x2, {B}x1, {A,B}x1  =>
    // v(A)=2 v(B)=1 v(AB)=4
    // phi_A = (v(A)-v(0))/2 + (v(AB)-v(B))/2 = 1 + 1.5 = 2.5
    // phi_B = (v(B)-v(0))/2 + (v(AB)-v(A))/2 = 0.5 + 1 = 1.5
    val rows =
      Seq(("j1", "A", 1L, 1L), ("j1", "buy", 2L, 2L),
        ("j2", "A", 1L, 1L), ("j2", "buy", 2L, 2L),
        ("j3", "B", 1L, 1L), ("j3", "buy", 2L, 2L),
        ("j4", "A", 1L, 1L), ("j4", "B", 2L, 2L), ("j4", "buy", 3L, 3L),
        ("j5", "A", 1L, 1L)) // non-converting: contributes nothing to v
    val out = ShapleyAttribution.shapley(ev(rows: _*), "j", "t", "ts", "id",
      "buy", Seq("A", "B")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("phi_e6")).toMap
    assert(out("A") == 2500000L)
    assert(out("B") == 1500000L)
  }

  test("efficiency: floored credits sum to v(C) - v(empty) within k floors") {
    val rnd = new scala.util.Random(3)
    val chs = Seq("a", "b", "c")
    val rows = (1 to 300).flatMap { j =>
      val exposed = chs.filter(_ => rnd.nextBoolean())
      val conv = rnd.nextInt(3) == 0
      exposed.zipWithIndex.map { case (c, i) => (s"j$j", c, i.toLong + 1, i.toLong + 1) } ++
        (if (conv) Seq((s"j$j", "buy", 99L, 99L)) else Nil)
    }
    val out = ShapleyAttribution.shapley(ev(rows: _*), "j", "t", "ts", "id",
      "buy", chs).collect()
    val attributable = {
      // conversions with >=1 exposure, recomputed naively
      val byJ = rows.groupBy(_._1)
      byJ.count { case (_, es) =>
        es.exists(_._2 == "buy") && es.exists(e => chs.contains(e._2))
      }
    }
    val phiSum = out.map(_.getAs[Long]("phi_e6")).sum
    assert(phiSum <= attributable * 1000000L)
    assert(phiSum > attributable * 1000000L - chs.size) // k floor losses max
    assert(out.head.getAs[Long]("total_conv") ==
      rows.groupBy(_._1).count(_._2.exists(_._2 == "buy")))
  }

  test("exposures after the first conversion are not causes") {
    val rows = Seq(
      ("j1", "buy", 1L, 1L), ("j1", "A", 2L, 2L), // A after conv: ignored
      ("j2", "A", 1L, 1L), ("j2", "buy", 2L, 2L))
    val out = ShapleyAttribution.shapley(ev(rows: _*), "j", "t", "ts", "id",
      "buy", Seq("A", "B")).collect()
      .map(r => r.getString(0) -> r).toMap
    // only j2 attributes to A: phi_A = 1, j1 is an empty-mask conversion
    assert(out("A").getAs[Long]("phi_e6") == 1000000L)
    assert(out("A").getAs[Long]("n_conv_touching") == 1L)
    assert(out("B").getAs[Long]("phi_e6") == 0L)
    assert(out("A").getAs[Long]("total_conv") == 2L)
  }

  test("journeyMasks: mask bits follow the sorted universe; repeats collapse") {
    val rows = Seq(
      ("j1", "x", 1L, 1L), ("j1", "x", 2L, 2L), ("j1", "z", 3L, 3L),
      ("j1", "buy", 4L, 4L))
    val m = ShapleyAttribution.journeyMasks(ev(rows: _*), "j", "t", "ts", "id",
      "buy", Seq("x", "y", "z")).head()
    assert(m.getAs[Long]("mask") == 5L) // x=bit0, z=bit2
    assert(m.getAs[Long]("converted") == 1L)
  }
}
