package graft

import org.apache.spark.sql.functions._
import graft.operators.Ledger

class LedgerSpec extends SparkSuite {
  import spark.implicits._

  // (key, seq, qty, isReceipt)
  private def mv(rows: (String, Long, Long, Boolean)*) =
    rows.toDF("k", "t", "q", "rc")

  private def matchAll(df: org.apache.spark.sql.DataFrame) =
    Ledger.fifoMatch(df, Seq("k"), Seq("t"), "q", "rc")
      .orderBy("k", "r_seq", "i_seq")
      .select("k", "r_seq", "i_seq", "matched_q")
      .as[(String, Long, Long, Long)].collect()

  test("layers: receipts split across issues in FIFO order") {
    // receipts 10, 5; issues 4, 8, 6 -> shortage of 3 on the last issue
    val out = matchAll(mv(
      ("a", 1L, 10L, true), ("a", 2L, 5L, true),
      ("a", 3L, 4L, false), ("a", 4L, 8L, false), ("a", 5L, 6L, false)))
    assert(out === Array(
      ("a", 1L, 1L, 4L), ("a", 1L, 2L, 6L),
      ("a", 2L, 2L, 2L), ("a", 2L, 3L, 3L)))
  }

  test("ending stock: unconsumed receipt tail has no rows") {
    val out = matchAll(mv(
      ("a", 1L, 10L, true), ("a", 2L, 3L, false)))
    assert(out === Array(("a", 1L, 1L, 3L)))
  }

  test("zero-quantity movements never match") {
    val out = matchAll(mv(
      ("a", 1L, 0L, true), ("a", 2L, 5L, true),
      ("a", 3L, 0L, false), ("a", 4L, 5L, false)))
    // the zero receipt is seq 1 but supplies nothing
    assert(out === Array(("a", 2L, 2L, 5L)))
  }

  test("negative quantities fail loudly") {
    val e = intercept[Exception] {
      matchAll(mv(("a", 1L, -5L, true), ("a", 2L, 3L, false)))
    }
    assert(e.getMessage.contains("negative quantity"))
  }

  test("randomized: matches a sequential FIFO simulation, conserves quantity") {
    val rnd = new scala.util.Random(23)
    val rows = for (k <- Seq("x", "y", "z"); t <- 1L to 60L)
      yield (k, t, rnd.nextInt(20).toLong + 1L, rnd.nextBoolean())
    val got = matchAll(rows.toDF("k", "t", "q", "rc"))
    // driver-side simulation: queue of receipt layers per key
    val want = rows.groupBy(_._1).toSeq.flatMap { case (k, ms) =>
      val receipts = ms.filter(_._4).sortBy(_._2).zipWithIndex
        .map { case ((_, _, q, _), idx) => Array(idx + 1L, q) } // (seq, remaining)
      val issues = ms.filterNot(_._4).sortBy(_._2).zipWithIndex
      val out = Seq.newBuilder[(String, Long, Long, Long)]
      var ri = 0
      issues.foreach { case ((_, _, q0, _), iIdx) =>
        var need = q0
        while (need > 0 && ri < receipts.length) {
          val layer = receipts(ri)
          val take = math.min(need, layer(1))
          if (take > 0) out += ((k, layer(0), iIdx + 1L, take))
          layer(1) -= take; need -= take
          if (layer(1) == 0) ri += 1
        }
      }
      out.result()
    }.sortBy(r => (r._1, r._2, r._3))
    assert(got.toSeq === want)
    // conservation: total matched == min(total receipts, total issues) per key
    val byKey = rows.groupBy(_._1)
    got.groupBy(_._1).foreach { case (k, layers) =>
      val tr = byKey(k).filter(_._4).map(_._3).sum
      val ti = byKey(k).filterNot(_._4).map(_._3).sum
      assert(layers.map(_._4).sum === math.min(tr, ti), s"key $k")
    }
  }
}
