package graft

import org.apache.spark.sql.functions._
import graft.pipelines.QualityClassifier

/** Semantic contract for the trained quality filter (the q_eb_rates
  * lesson: oracle replay equality is not method correctness — the
  * CLASSIFIER must actually separate the classes it was trained on).
  */
class QualityClassifierSpec extends SparkSuite {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("a planted target-like doc outscores an off-target doc") {
    val pos = docs(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "beta gamma alpha delta alpha",
      3L -> "gamma delta epsilon alpha beta")
    val neg = docs(
      11L -> "zork quux blorp fnord wibble",
      12L -> "quux blorp zork wibble fnord",
      13L -> "blorp fnord wibble zork quux")
    // held-out docs, one per style — neither was trained on
    val held = docs(21L -> "alpha gamma beta epsilon",
                    22L -> "fnord wibble quux blorp")
    val scored = QualityClassifier.scores(held, pos, neg, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val (posScore, posFlag) = scored(21L)
    val (negScore, negFlag) = scored(22L)
    assert(posScore > negScore,
      s"target-like $posScore must beat off-target $negScore")
    assert(posFlag && !negFlag, "MAP decision must follow the sign")
    assert(posScore > 0 && negScore < 0)
  }

  test("the prior shifts every score by the same quantized log-odds") {
    val pos = docs(1L -> "alpha beta", 2L -> "beta alpha", 3L -> "alpha alpha",
      4L -> "beta beta")
    val neg = docs(11L -> "zork quux", 12L -> "quux zork")
    val held = docs(21L -> "alpha zork")
    def score(p: org.apache.spark.sql.DataFrame,
              n: org.apache.spark.sql.DataFrame): Long =
      QualityClassifier.scores(held, p, n, "doc_id", "text")
        .collect()(0).getLong(1)
    val balancedPos = docs(1L -> "alpha beta", 2L -> "beta alpha")
    // same tokens-per-class distribution shape, different doc counts:
    // 4v2 carries prior ln(2), 2v2 carries ln(1)=0
    val sBal = score(balancedPos, neg)
    val s42 = score(pos, neg)
    // the 4-doc positive class differs in its token distribution too, so
    // only assert the DIRECTION: more positive mass -> higher score
    assert(s42 > sBal)
  }

  test("scoresByFlag equals the two-frame form (single-pass training)") {
    val corpus = docs(
      1L -> "alpha beta gamma", 2L -> "beta alpha alpha", 3L -> "gamma beta",
      11L -> "zork quux", 12L -> "quux blorp zork", 13L -> "blorp blorp")
    val flag = col("doc_id") < 10L
    val a = QualityClassifier.scoresByFlag(corpus, flag, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val b = QualityClassifier.scores(corpus, corpus.filter(flag),
        corpus.filter(!flag), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(a === b)
  }

  test("count-table scoring == direct form; CDC fold == rescan") {
    import graft.pipelines.Dsir
    val pos0 = docs(1L -> "alpha beta", 2L -> "beta gamma alpha")
    val neg = docs(11L -> "zork quux", 12L -> "quux blorp")
    val held = docs(21L -> "alpha zork beta")
    // a CDC feed lands one more positive doc: fold = counts(old) + counts(delta)
    val delta = docs(3L -> "gamma gamma alpha")
    val pos1 = pos0.unionByName(delta)
    val folded = Dsir.tokenBucketCounts(pos0, "text")
      .unionByName(Dsir.tokenBucketCounts(delta, "text"))
      .groupBy("b").agg(sum("n").as("n"))
    val direct = QualityClassifier.scores(held, pos1, neg, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val fromCounts = QualityClassifier.scoresFromCounts(held, folded,
        Dsir.tokenBucketCounts(neg, "text"), nPosDocs = 3, nNegDocs = 2,
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(fromCounts === direct)
  }

  test("blank and null docs drop out of scoring") {
    val pos = docs(1L -> "alpha beta gamma")
    val neg = docs(11L -> "zork quux blorp")
    val held = Seq((21L, Some("alpha")), (22L, None), (23L, Some("  ")))
      .toDF("doc_id", "text")
    val ids = QualityClassifier.scores(held, pos, neg, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(ids === Set(21L))
  }
}
