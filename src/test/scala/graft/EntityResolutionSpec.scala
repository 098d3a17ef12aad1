package graft

import org.apache.spark.sql.functions._
import graft.pipelines.EntityResolution

class EntityResolutionSpec extends SparkSuite {
  import spark.implicits._

  // (id, name, segment, balance, src_rank)
  private def dirty = Seq(
    (1L, "alphabet", Option("S1"), Option(10.0), 1),
    (2L, "alphabex", None, Option(20.0), 2),        // dist 1 from A
    (3L, "alzhabex", Option("S3"), None, 1),        // dist 1 from B, 2 from A
    (4L, "different", Option("S4"), Option(40.0), 1),
    (5L, "a", Option("S5"), Option(50.0), 1),       // below the segment floor
    (6L, "a", None, Option(60.0), 2))               // exact dup of 5
    .toDF("ent_id", "name", "segment", "balance", "src_rank")

  private def resolved = EntityResolution.resolve(dirty, "ent_id", "name",
    maxDist = 1, prefCols = Seq(col("src_rank"), col("ent_id")),
    valueCols = Seq("name", "segment", "balance"))

  test("transitive chains merge; attributes survive per column independently") {
    val out = resolved.orderBy($"canonical_id")
      .as[(Long, String, Option[String], Option[Double], Long)].collect().toSeq
    // chain 1≈2≈3 merges even though 1 and 3 are distance 2 apart
    assert(out.map(_._1) === Seq(1L, 4L, 5L))
    val g1 = out.head
    assert(g1._5 === 3L) // n_members
    // name: src_rank 2 row (id 2) is most preferred among non-null
    assert(g1._2 === "alphabex")
    // segment: id 2 is null there → falls to (src 1, id 3) = "S3"
    assert(g1._3 === Some("S3"))
    // balance: id 3 is null there → src 2 row wins = 20.0
    assert(g1._4 === Some(20.0))
  }

  test("exact duplicates below the segment-length floor still merge") {
    val out = resolved.filter($"canonical_id" === 5L)
      .as[(Long, String, Option[String], Option[Double], Long)].head()
    assert(out._5 === 2L) // ids 5 and 6 merged via the exact path
    assert(out._4 === Some(60.0)) // src 2 balance survives
    assert(out._3 === Some("S5")) // null-segment src 2 falls back to src 1
  }

  test("singletons survive as themselves") {
    val out = resolved.filter($"canonical_id" === 4L)
      .as[(Long, String, Option[String], Option[Double], Long)].head()
    assert(out === ((4L, "different", Some("S4"), Some(40.0), 1L)))
  }
}
