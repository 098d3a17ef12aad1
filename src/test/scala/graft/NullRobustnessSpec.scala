package graft

import org.apache.spark.sql.functions._
import graft.dedup.NearDup
import graft.functions.{Fingerprint, SimHash, TextFunctions}

class NullRobustnessSpec extends SparkSuite {
  import spark.implicits._

  private def docsWithNull = Seq(
    (1L, Some("alpha beta gamma delta")),
    (2L, Some("alpha beta gamma delta")),
    (3L, None),
    (4L, Some(""))
  ).toDF("doc_id", "text")

  test("minhashPairs survives null and empty text, still pairs the dup") {
    val pairs = NearDup.minhashPairs(docsWithNull, "doc_id", "text", threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.toSet === Set((1L, 2L)))
  }

  test("simhashPairs survives null and empty text") {
    val pairs = NearDup.simhashPairs(docsWithNull, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    // null/empty docs must not pair with real content
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("text functions return null/zero on null input, not exceptions") {
    val out = docsWithNull.select(
      TextFunctions.tokenCount(col("text")).as("tc"),
      TextFunctions.qualityScore(col("text")).as("q"),
      TextFunctions.langId(col("text")).as("l"),
      Fingerprint.fingerprint(col("text")).as("fp"),
      SimHash.simhash(col("text")).as("sh"))
    val rows = out.collect()
    assert(rows.length === 4)
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(3) && rows(2).isNullAt(4))
  }
}
