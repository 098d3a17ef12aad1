package graft

import org.apache.spark.sql.functions._
import graft.pipelines.CorpusClean
import graft.multimodal.Multimodal
import graft.sources.Tables

class CorpusCleanSpec extends SparkSuite {
  import spark.implicits._

  test("pipeline drops low-quality, exact dups (normalized) and near-dups") {
    val good = (0 until 30).map(j => s"w${(j * 13) % 97}").mkString(" ") +
      " the a of and in to is the a of"
    val docs = Seq(
      (1L, good),
      (2L, good.toUpperCase), // normalized exact dup of 1 (case only)... uppercase tokens differ
      (3L, good + " EXTRA"), // near-dup of 1
      (4L, "short"), // low quality
      (5L, (0 until 40).map(j => s"z$j the a of and").mkString(" ")) // distinct keeper
    ).toDF("doc_id", "text")
    val out = CorpusClean.run(docs,
      CorpusClean.Config(minQualityBp = 2000, jaccardThreshold = 0.7))
      .select("doc_id").as[Long].collect().sorted
    // 1 survives; 2 dropped as normalized dup; 3 dropped as near-dup;
    // 4 dropped on quality; 5 survives
    assert(out === Array(1L, 5L))
  }

  test("real corpus shrinks but keeps the bulk") {
    val docs = Tables.load(spark, sf, "documents")
    val cleaned = CorpusClean.run(docs)
    val (n0, n1) = (docs.count(), cleaned.count())
    assert(n1 > 0 && n1 <= n0)
    assert(cleaned.columns.contains("quality_bp") && cleaned.columns.contains("pred_lang"))
  }

  test("frame sampling chunks payloads deterministically") {
    val docs = Tables.load(spark, sf, "documents").limit(10)
    val frames = Multimodal.sampleFrames(Multimodal.withPayload(docs),
      frameBytes = 16, stride = 2, maxFrames = 4)
    val rows = frames.select("doc_id", "frame_idx", "frame")
      .as[(Long, Int, Array[Byte])].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._3.length <= 16))
    assert(rows.groupBy(_._1).values.forall(_.length <= 4))
  }
}
