package graft

import org.apache.spark.sql.functions._
import graft.operators.Raking

class RakingSpec extends SparkSuite {
  import spark.implicits._

  test("one hand-stepped IPF round; weighted margins approach targets") {
    // sample cells: (r1,c1)=1, (r1,c2)=1, (r2,c2)=2
    // row targets r1=20, r2=20; col targets c1=10, c2=30
    val sample = Seq(("r1", "c1"), ("r1", "c2"), ("r2", "c2"), ("r2", "c2"))
      .toDF("r", "c")
    val rowT = Seq(("r1", 20L), ("r2", 20L)).toDF("r", "t")
    val colT = Seq(("c1", 10L), ("c2", 30L)).toDF("c", "t")
    val w1 = Raking.rake(sample, "r", "c", rowT, colT, iters = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Long]("weight_e6"))).toMap
    // row pass: m(r1)=2e6 -> w=1e6*20*1e6/2e6=10e6 ; m(r2)=2e6 -> 10e6
    // col pass: m(c1)=10e6 -> w(r1,c1)=10e6*10*1e6/10e6=10e6
    //           m(c2)=10e6+2*10e6=30e6 -> w*30*1e6/30e6 = 10e6 each
    assert(w1(("r1", "c1")) == (1L, 10000000L))
    assert(w1(("r1", "c2")) == (1L, 10000000L))
    assert(w1(("r2", "c2")) == (2L, 10000000L))

    // randomized frame: after 5 rounds the weighted ROW margins sit
    // within quantization error of the targets (the last update is the
    // column pass, so columns are exact and rows near-converged)
    val rnd = new scala.util.Random(13)
    val s2 = (1 to 500).map { _ =>
      (s"r${rnd.nextInt(3)}", s"c${rnd.nextInt(4)}") }.toDF("r", "c")
    val rt2 = Seq(("r0", 1000L), ("r1", 2000L), ("r2", 3000L)).toDF("r", "t")
    val ct2 = Seq(("c0", 1500L), ("c1", 1500L), ("c2", 1500L), ("c3", 1500L))
      .toDF("c", "t")
    val w5 = Raking.rake(s2, "r", "c", rt2, ct2, iters = 5).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n"),
        r.getAs[Long]("weight_e6")))
    val colM = w5.groupBy(_._2).view.mapValues(_.map(x => x._3 * x._4).sum)
    colM.foreach { case (c, m) =>
      assert(math.abs(m - 1500L * 1000000L) <= 1000000L, s"col $c margin $m") }
    val rowM = w5.groupBy(_._1).view.mapValues(_.map(x => x._3 * x._4).sum)
    rowM.foreach { case (r, m) =>
      val t = Map("r0" -> 1000L, "r1" -> 2000L, "r2" -> 3000L)(r) * 1000000L
      assert(math.abs(m - t) < t / 100, s"row $r margin $m vs $t") }
  }

  test("a sample key missing from the targets raises a named error") {
    val sample = Seq(("rX", "c1")).toDF("r", "c")
    val rowT = Seq(("r1", 10L)).toDF("r", "t")
    val colT = Seq(("c1", 10L)).toDF("c", "t")
    val e = intercept[IllegalArgumentException] {
      Raking.rake(sample, "r", "c", rowT, colT) }
    assert(e.getMessage.contains("rX"))
  }
}
