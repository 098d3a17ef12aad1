package graft

import org.apache.spark.sql.functions._
import graft.operators.{IncrementalAgg, Reconcile}

class ReconcileSpec extends SparkSuite {
  import spark.implicits._

  private lazy val oldRows = (1 to 200).map(i => (i.toLong, s"g${i % 5}", i * 1.5))
  private lazy val newRows =
    oldRows.filter(_._1 % 11 != 0) // deletes
      .map { case (id, g, v) => if (id % 7 == 0) (id, g, v + 100.0) else (id, g, v) } ++
      (301 to 330).map(i => (i.toLong, s"g${i % 5}", i * 2.0)) // inserts
  private def toDf(s: Seq[(Long, String, Double)]) = s.toDF("id", "g", "v")

  test("changeFeed applied to the old snapshot reproduces the new one") {
    val feed = Reconcile.changeFeed(toDf(oldRows), toDf(newRows),
      Seq("id"), Seq("g", "v"))
    // apply: drop D keys, add I rows
    val applied = toDf(oldRows)
      .join(feed.filter($"op" === "D").select("id"), Seq("id"), "left_anti")
      .unionByName(feed.filter($"op" === "I").drop("op"))
    assert(applied.orderBy("id", "g", "v").collect().toSeq ===
      toDf(newRows).orderBy("id", "g", "v").collect().toSeq)
    // updates lowered to D+I: both versions present for %7 keys
    val ops = feed.filter($"id" === 7L).select("op").as[String].collect().toSet
    assert(ops === Set("D", "I"))
  }

  test("changeFeed folds through IncrementalAgg to the recompute state") {
    val feed = Reconcile.changeFeed(toDf(oldRows), toDf(newRows),
      Seq("id"), Seq("g", "v"))
    val folded = IncrementalAgg.foldCdc(
      IncrementalAgg.init(toDf(oldRows), Seq("g"), $"v"),
      feed, Seq("g"), $"v", $"op")
      .select($"g", $"n_rows", $"total".cast("double"))
      .orderBy("g").collect().toSeq
    val direct = IncrementalAgg.init(toDf(newRows), Seq("g"), $"v")
      .select($"g", $"n_rows", $"total".cast("double"))
      .orderBy("g").collect().toSeq
    assert(folded === direct)
  }

  test("identical snapshots produce an empty feed and an empty diff") {
    assert(Reconcile.diffKeys(toDf(oldRows), toDf(oldRows),
      Seq("id"), Seq("g", "v")).isEmpty)
    assert(Reconcile.changeFeed(toDf(oldRows), toDf(oldRows),
      Seq("id"), Seq("g", "v")).isEmpty)
  }
}
