package graft

import org.apache.spark.sql.functions._
import graft.pipelines.Curriculum

class CurriculumSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("anneal tail holds only positive-evidence docs; boundary is exact") {
    val out = Curriculum.annealSchedule(docs, "doc_id", "text",
        col("source") === "src0", annealBp = 1000)
      .as[(Long, Long, Long, String, Long)].collect()
    assert(out.nonEmpty)
    // the boundary derives from the UNFILTERED timeline total — the
    // filtered output may have dropped the last doc, so recompute it
    val total = docs
      .select(graft.functions.TextFunctions.tokenCount(col("text"))
        .cast("long").as("n"))
      .filter(col("n") > 0).agg(sum(col("n"))).head().getLong(0)
    val mainB = 9000L * total / 10000L
    out.foreach { case (id, n, score, phase, off) =>
      assert((off < mainB) == (phase == "main"), s"doc $id boundary")
      if (phase == "anneal") assert(score > 0, s"doc $id in anneal with $score")
    }
    // the window must actually drop low-evidence docs (non-degenerate)
    val windowDocs = out.count(_._5 >= mainB)
    val annealed = out.count(_._4 == "anneal")
    assert(annealed >= 1, "anneal phase is empty — degenerate schedule")
    assert(annealed == windowDocs, "kept window docs must all be anneal")
  }

  test("timeline offsets are consistent: offsets + lengths tile without overlap") {
    val out = Curriculum.annealSchedule(docs, "doc_id", "text",
        col("source") === "src0")
      .select("tok_offset", "n_tokens").as[(Long, Long)].collect()
      .sortBy(_._1)
    // the UNFILTERED timeline tiles exactly; after the anneal filter
    // gaps may exist but overlaps never
    out.sliding(2).foreach {
      case Array((o1, n1), (o2, _)) => assert(o1 + n1 <= o2)
      case _ =>
    }
  }

  test("schedule is repartition-stable") {
    def run(d: org.apache.spark.sql.DataFrame) =
      Curriculum.annealSchedule(d, "doc_id", "text", col("source") === "src0")
        .as[(Long, Long, Long, String, Long)].collect().toSet
    assert(run(docs) === run(docs.repartition(13)))
  }
}
