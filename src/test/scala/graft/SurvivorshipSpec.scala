package graft

import org.apache.spark.sql.functions._
import graft.operators.Survivorship

class SurvivorshipSpec extends SparkSuite {
  import spark.implicits._

  private val feed = Seq(
    // (key, priority, name, phone)
    (1L, 3, Some("crm-name"), None: Option[String]),
    (1L, 2, Some("erp-name"), Some("erp-phone")),
    (1L, 1, Some("web-name"), Some("web-phone")),
    (2L, 3, None: Option[String], None: Option[String]),
    (2L, 1, Some("web-only"), None: Option[String]),
    (3L, 2, None: Option[String], None: Option[String]))
    .toDF("k", "pri", "name", "phone")

  test("each attribute survives independently from the best non-null source") {
    val out = Survivorship.goldenRecord(feed, Seq("k"), Seq(col("pri")),
      Seq("name", "phone"))
      .orderBy("k").as[(Long, Option[String], Option[String])].collect().toSeq
    assert(out === Seq(
      // key 1: name from pri-3 crm, phone from pri-2 erp — DIFFERENT rows
      (1L, Some("crm-name"), Some("erp-phone")),
      // key 2: pri-3 row is all-null, name falls through to pri-1
      (2L, Some("web-only"), None),
      // key 3: single all-null source → all-null golden record
      (3L, None, None)))
  }

  test("result is stable under repartitioning (one aggregate, total order)") {
    val base = Survivorship.goldenRecord(feed, Seq("k"), Seq(col("pri")),
      Seq("name", "phone")).orderBy("k").collect().toSeq
    val shuffled = Survivorship.goldenRecord(feed.repartition(13), Seq("k"),
      Seq(col("pri")), Seq("name", "phone")).orderBy("k").collect().toSeq
    assert(base === shuffled)
  }

  test("plans as ONE keyed aggregate — no join cascade") {
    val plan = Survivorship.goldenRecord(feed, Seq("k"), Seq(col("pri")),
      Seq("name", "phone")).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"survivorship must not join:\n$plan")
  }
}
