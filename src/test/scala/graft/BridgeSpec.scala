package graft

import org.apache.spark.sql.functions._
import graft.operators.Bridge

class BridgeSpec extends SparkSuite {
  import spark.implicits._

  // (group, item, period, rev, qty)
  private def rows(r: (String, Long, Int, Long, Long)*) =
    r.toDF("g", "it", "p", "rev", "qty")

  test("hand-computed effects; the bridge identity holds to the cent") {
    // item 1: p0 = 10x10=100 ; p1 = 12x11=132 (price 10->12, qty 10->11)
    //   price = (132*10 - 100*11)/11 = 220/11 = 20 (= (12-10)*10)
    //   vol   = 100*(11-10)/10 = 10 (= 10*(11-10))
    //   cross = 32 - 20 - 10 = 2 (= (12-10)*(11-10))
    // item 2: only 1997 -> new = 50 ; item 3: only 1996 -> disc = 30
    val df = rows(
      ("b", 1L, 0, 100L, 10L), ("b", 1L, 1, 132L, 11L),
      ("b", 2L, 1, 50L, 5L),
      ("b", 3L, 0, 30L, 3L))
    val r = Bridge.revenueBridge(df, "g", "it", "p", "rev", "qty").head()
    assert(r.getAs[Long]("rev0") == 130L && r.getAs[Long]("rev1") == 182L)
    assert(r.getAs[Long]("price_eff") == 20L)
    assert(r.getAs[Long]("vol_eff") == 10L)
    assert(r.getAs[Long]("cross_eff") == 2L)
    assert(r.getAs[Long]("new_eff") == 50L)
    assert(r.getAs[Long]("disc_eff") == 30L)
    assert(r.getAs[Long]("delta") ==
      20L + 10L + 2L + 50L - 30L)

    // price CUT: negative price effect, exact floor on negatives
    val cut = rows(("c", 1L, 0, 100L, 10L), ("c", 1L, 1, 70L, 10L))
    val c = Bridge.revenueBridge(cut, "g", "it", "p", "rev", "qty").head()
    assert(c.getAs[Long]("price_eff") == -30L)
    assert(c.getAs[Long]("vol_eff") == 0L)
    assert(c.getAs[Long]("cross_eff") == 0L)
  }

  test("identity holds on a randomized frame at every group") {
    val rnd = new scala.util.Random(31)
    val data = (1 to 800).map { _ =>
      (s"g${rnd.nextInt(6)}", rnd.nextInt(60).toLong, rnd.nextInt(2),
        (rnd.nextInt(10000) + 1).toLong, (rnd.nextInt(20) + 1).toLong)
    }
    val out = Bridge.revenueBridge(rows(data: _*), "g", "it", "p", "rev", "qty")
      .collect()
    out.foreach { r =>
      assert(r.getAs[Long]("delta") ==
        r.getAs[Long]("price_eff") + r.getAs[Long]("vol_eff") +
          r.getAs[Long]("cross_eff") + r.getAs[Long]("new_eff") -
          r.getAs[Long]("disc_eff"),
        s"bridge identity broken at ${r.getString(0)}")
      assert(r.getAs[Long]("delta") ==
        r.getAs[Long]("rev1") - r.getAs[Long]("rev0"))
    }
  }
}
