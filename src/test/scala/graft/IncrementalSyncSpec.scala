package graft

import org.apache.spark.sql.functions._
import graft.operators.IncrementalJoin
import graft.pipelines.IncrementalSync

class IncrementalSyncSpec extends SparkSuite {
  import spark.implicits._

  test("one snapshot diff refreshes agg, checksum and join to their recompute forms") {
    val dim = Seq(("g0", "d0"), ("g1", "d1"), ("g2", "d2"), ("g3", "d3"))
      .toDF("g", "dv")
    val oldRows = (1 to 300).map(i => (i.toLong, s"g${i % 4}", (i * 13 % 500) / 10.0))
    // drift: deletes, value changes, GROUP-moving changes, inserts
    val newRows = oldRows.filter(_._1 % 11 != 0)
      .map { case (id, g, v) =>
        if (id % 7 == 0) (id, g, v + 50.0)
        else if (id % 13 == 0) (id, s"g${(id + 1) % 4}", v)
        else (id, g, v) } ++
      (401 to 430).map(i => (i.toLong, s"g${i % 4}", i / 10.0))
    def df(s: Seq[(Long, String, Double)]) = s.toDF("id", "g", "v")

    val s0 = IncrementalSync.init(df(oldRows), dim, "id", Seq("g"), Seq("g"),
      $"v", Seq("g", "v"))
    val s1 = IncrementalSync.refresh(s0, df(oldRows), df(newRows), dim,
      "id", Seq("g"), Seq("g"), $"v", Seq("g", "v"))
    val direct = IncrementalSync.init(df(newRows), dim, "id", Seq("g"), Seq("g"),
      $"v", Seq("g", "v"))

    def canonAgg(d: org.apache.spark.sql.DataFrame) =
      d.select($"g", $"n_rows", $"total".cast("double")).orderBy("g")
        .collect().toSeq
    assert(canonAgg(s1.agg) === canonAgg(direct.agg))
    assert(canonAgg(s1.checksum) === canonAgg(direct.checksum))
    def canonJoin(d: org.apache.spark.sql.DataFrame) =
      d.orderBy(d.columns.map(col): _*).collect().toSeq
    assert(canonJoin(s1.joined) ===
      canonJoin(IncrementalJoin.joinOf(df(newRows), dim, Seq("g"))))
  }
}
