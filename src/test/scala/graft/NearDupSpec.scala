package graft

import org.apache.spark.sql.functions._
import graft.dedup.NearDup

class NearDupSpec extends SparkSuite {
  import spark.implicits._

  /** Synthetic corpus with planted exact + near duplicates. */
  private def corpus = {
    val base = (0 until 20).map { i =>
      (i.toLong, (0 until 40).map(j => s"w${(i * 7 + j * 13) % 97}").mkString(" "))
    }
    val exactDup = Seq((100L, base(3)._2))
    val nearDup = Seq((101L, base(5)._2.replace("w68 ", "w68 EXTRA ")))
    val unrelated = Seq((102L, (0 until 40).map(j => s"z$j").mkString(" ")))
    (base ++ exactDup ++ nearDup ++ unrelated).toDF("doc_id", "text")
  }

  test("minhashPairs finds planted exact and near duplicates, not unrelated") {
    val pairs = NearDup.minhashPairs(corpus, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((3L, 100L)))
    assert(keys.contains((5L, 101L)))
    assert(!pairs.map(_._1).contains(102L) && !pairs.map(_._2).contains(102L))
    val exact = pairs.find(p => (p._1, p._2) == ((3L, 100L))).get
    assert(exact._3 === 1.0)
  }

  test("minhash est_jaccard approximates exact jaccard on found pairs") {
    val pairs = NearDup.minhashPairs(corpus, "doc_id", "text", threshold = 0.5)
      .select("est_jaccard", "jaccard").as[(Double, Double)].collect()
    pairs.foreach { case (est, exact) => assert(math.abs(est - exact) < 0.35) }
  }

  test("simhashPairs finds exact dup at hamming 0") {
    val pairs = NearDup.simhashPairs(corpus, "doc_id", "text", maxHamming = 3)
      .as[(Long, Long, Int)].collect()
    assert(pairs.exists(p => p._1 == 3L && p._2 == 100L && p._3 == 0))
  }

  test("ngramJaccard: identical 1.0, disjoint 0.0") {
    val pairs = Seq((3L, 100L), (3L, 102L)).toDF("id_a", "id_b")
    val out = NearDup.ngramJaccard(corpus, pairs, "doc_id", "text")
      .orderBy("id_b").as[(Long, Long, Double)].collect()
    assert(out(0)._3 === 1.0)
    assert(out(1)._3 === 0.0)
  }

  test("Decontaminate flags corpus docs sharing long n-grams with a benchmark") {
    import graft.dedup.Decontaminate
    val trainBase = (0 until 30).map(i => s"t$i").mkString(" ")
    val benchText = (0 until 30).map(i => s"b$i").mkString(" ")
    val corpus = Seq(
      (1L, trainBase),
      (2L, s"prefix $benchText suffix"), // contains the benchmark verbatim
      (3L, (0 until 30).map(i => s"c$i").mkString(" "))
    ).toDF("doc_id", "text")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val hits = Decontaminate.overlaps(corpus, bench, "doc_id", "text", n = 13)
      .as[(Long, Long, Long)].collect()
    assert(hits.map(h => (h._1, h._2)).toSet === Set((2L, 100L)))
    assert(hits.head._3 === (30 - 13 + 1)) // every benchmark 13-gram present
    val drops = Decontaminate.contaminatedIds(corpus, bench, "doc_id", "text", n = 13)
      .as[Long].collect()
    assert(drops === Array(2L))
  }

  test("selfOverlaps finds the planted shared passage, counts its grams") {
    import graft.dedup.Decontaminate
    val passage = (0 until 20).map(i => s"p$i").mkString(" ")
    val corpus = Seq(
      (1L, s"intro ${passage} outro"),
      (2L, s"different start ${passage} different end"),
      (3L, (0 until 30).map(i => s"q$i").mkString(" ")))
      .toDF("doc_id", "text")
    val pairs = Decontaminate.selfOverlaps(corpus, "doc_id", "text", n = 13)
      .as[(Long, Long, Long)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    // a 20-token passage carries 20-13+1 = 8 shared 13-grams
    assert(pairs.head._3 === 8L)
  }

  test("selfOverlapsChar matches passages across case/whitespace, counts grams") {
    import graft.dedup.Decontaminate
    val passage = "The Quick Brown Fox Jumps Over The Extremely Lazy Dog Tonight"
    val corpus = Seq(
      (1L, s"intro   ${passage}   outro"),
      // same passage, different case and whitespace — token-exact dedup
      // misses this without normalization; char grams normalize inline
      (2L, s"prefix ${passage.toUpperCase.replace(" ", "  ")} suffix"),
      (3L, "completely unrelated filler text that shares nothing at all here"))
      .toDF("doc_id", "text")
    val pairs = Decontaminate.selfOverlapsChar(corpus, "doc_id", "text", n = 40)
      .as[(Long, Long, Long)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    // the normalized passage is 61 chars → at least 61-40+1 = 22 shared
    // 40-grams (doc 1's surrounding spaces normalize into the span, so
    // boundary grams can add a few more)
    assert(pairs.head._3 >= 22L)
    // short texts yield no grams, no crash
    val empty = Decontaminate.selfOverlapsChar(
      Seq((1L, "tiny"), (2L, "tiny")).toDF("doc_id", "text"), "doc_id", "text", n = 40)
    assert(empty.count() === 0L)
  }

  test("embeddingPairs finds planted near-identical vectors") {
    val vecs = Seq(
      (0L, Array.tabulate(16)(i => math.sin(i * 1.7).toFloat)),
      (1L, Array.tabulate(16)(i => math.sin(i * 1.7).toFloat + (if (i == 0) 0.01f else 0f))),
      (2L, Array.tabulate(16)(i => math.cos(i * 3.1).toFloat))
    ).toDF("vec_id", "embedding")
    val pairs = NearDup.embeddingPairs(vecs, "vec_id", "embedding",
      minCosine = 0.99, nBits = 16)
      .as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((0L, 1L)))
  }
}
