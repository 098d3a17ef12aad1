package graft

import org.apache.spark.sql.functions._
import graft.dedup.{Decontaminate, SpanDedup}

class SpanDedupSpec extends SparkSuite {
  import spark.implicits._

  private def dedup(rows: Seq[(Long, String)], n: Int) =
    SpanDedup.dedupSpans(rows.toDF("doc_id", "text"), "doc_id", "text", n)
      .orderBy("doc_id")
      .select("doc_id", "n_spans", "n_kept", "clean_text")
      .as[(Long, Long, Long, String)].collect()

  test("duplicated span keeps exactly the first (doc, position) copy") {
    // span length 2: doc 1 = [a b][c d], doc 2 = [x y][a b], doc 3 = [a b]
    val out = dedup(Seq(
      1L -> "a b c d",
      2L -> "x y a b",
      3L -> "a b"), n = 2)
    assert(out(0) === ((1L, 2L, 2L, "a b c d"))) // winner of "a b" at idx 0
    assert(out(1) === ((2L, 2L, 1L, "x y")))     // its "a b" copy removed
    assert(out(2) === ((3L, 1L, 0L, "")))        // entirely duplicated
  }

  test("within-doc repeated span dedups too, reassembly preserves order") {
    val out = dedup(Seq(1L -> "p q r s p q t u"), n = 2)
    // spans: [p q][r s][p q][t u] — second "p q" loses the idx tie
    assert(out(0) === ((1L, 4L, 3L, "p q r s t u")))
  }

  test("partial tail span matches only equal-length tails") {
    val out = dedup(Seq(1L -> "a b c", 2L -> "z z c"), n = 2)
    // tails "c" == "c": doc 1 (winner) keeps, doc 2 drops it
    assert(out(0) === ((1L, 2L, 2L, "a b c")))
    assert(out(1) === ((2L, 2L, 1L, "z z")))
  }

  test("blank document passes through with zero spans") {
    val out = dedup(Seq(1L -> "hello world", 2L -> "   "), n = 2)
    assert(out(1) === ((2L, 0L, 0L, "")))
  }

  test("no duplicates = identity reassembly (modulo whitespace collapse)") {
    val out = dedup(Seq(1L -> "one two three four five",
      2L -> "six seven eight"), n = 3)
    assert(out(0)._4 === "one two three four five")
    assert(out(1)._4 === "six seven eight")
  }

  test("incremental span dedup: sequential batches == one-shot corpus run") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val b1 = docs.filter(col("doc_id") < 250)
    val b2 = docs.filter(col("doc_id") >= 250)
    val (c1, s1) = SpanDedup.dedupSpansAgainstHistory(
      b1, s1Empty(), "doc_id", "text", n = 10, expectedSpans = 100000L)
    val reg1 = s1.persist(); reg1.count()
    val (c2, s2) = SpanDedup.dedupSpansAgainstHistory(
      b2, reg1, "doc_id", "text", n = 10, expectedSpans = 100000L)
    val seq = c1.unionByName(c2)
    val oneShot = SpanDedup.dedupSpans(docs, "doc_id", "text", n = 10)
    assert(seq.exceptAll(oneShot).isEmpty && oneShot.exceptAll(seq).isEmpty)
    // the registry is append-only: batch-2 novelties never overlap it
    assert(s2.join(reg1, Seq("span"), "left_semi").count() === 0)
    reg1.unpersist()
  }

  test("incremental span dedup: a registry span removes every batch copy") {
    import spark.implicits._
    val reg = Seq("a b").toDF("span")
    val batch = Seq((5L, "a b c d"), (6L, "a b")).toDF("doc_id", "text")
    val (cleaned, newSpans) = SpanDedup.dedupSpansAgainstHistory(
      batch, reg, "doc_id", "text", n = 2, expectedSpans = 10L)
    val out = cleaned.orderBy("doc_id")
      .select("doc_id", "n_spans", "n_kept", "clean_text")
      .as[(Long, Long, Long, String)].collect()
    // even the would-be winner copy of "a b" dies — history owns it
    assert(out(0) === ((5L, 2L, 1L, "c d")))
    assert(out(1) === ((6L, 1L, 0L, "")))
    assert(newSpans.as[String].collect().sorted === Array("c d"))
  }

  private def s1Empty() = {
    import spark.implicits._
    Seq.empty[String].toDF("span")
  }

  test("bloom-gated decontamination equals the broadcast-join form exactly") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)
    val plain = Decontaminate.overlaps(corpus, bench, "doc_id", "text", n = 8)
    val gated = Decontaminate.overlapsBloomGated(
      corpus, bench, "doc_id", "text", n = 8,
      expectedGrams = 100000L, fpp = 0.01)
    assert(plain.count() > 0) // the check must bite
    assert(gated.exceptAll(plain).isEmpty && plain.exceptAll(gated).isEmpty)
  }

  test("bloom-gated decontamination: empty benchmark yields no pairs") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = Decontaminate.overlapsBloomGated(
      docs, docs.limit(0), "doc_id", "text", n = 8, expectedGrams = 10L)
    assert(out.count() === 0)
  }
}
