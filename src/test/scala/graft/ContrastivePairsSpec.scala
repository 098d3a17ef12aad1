package graft

import org.apache.spark.sql.functions._
import graft.pipelines.ContrastivePairs

class ContrastivePairsSpec extends SparkSuite {
  import spark.implicits._

  // planted families: docs 1/2 near-dup (one word differs), 3/4 near-dup,
  // the rest unrelated filler
  private def corpus = (Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "alpha beta gamma delta epsilon zeta eta iota"),
    (3L, "one two three four five six seven eight"),
    (4L, "one two three four five six seven nine")) ++
    (5L to 40L).map(i => (i,
      s"filler${i}a filler${i}b filler${i}c filler${i}d filler${i}e " +
        s"filler${i}f filler${i}g filler${i}h")))
    .toDF("doc_id", "text")

  test("triplets anchor planted near-dups; negatives are proven non-dups") {
    val trips = ContrastivePairs.mine(corpus, "doc_id", "text",
      minJbp = 3000, maxJbp = 9900, negBuckets = 8).collect()
    assert(trips.nonEmpty)
    val anchorsWithPos = trips.map(r => (r.getLong(0), r.getLong(1))).toSet
    // both orientations of the planted pairs appear (unless the negative
    // exclusion dropped one — check at least one orientation per family)
    assert(anchorsWithPos.exists(p => Set((1L, 2L), (2L, 1L)).contains(p)))
    assert(anchorsWithPos.exists(p => Set((3L, 4L), (4L, 3L)).contains(p)))
    trips.foreach { r =>
      val (a, p, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(n != a && n != p)
      // negative never from the anchor's near-dup family
      assert(!Set((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L)).contains((a, n)))
    }
  }

  test("deterministic across partitionings") {
    val a = ContrastivePairs.mine(corpus.repartition(7), "doc_id", "text",
      minJbp = 3000, negBuckets = 8)
      .orderBy("anchor_id", "positive_id").collect()
    val b = ContrastivePairs.mine(corpus.coalesce(1), "doc_id", "text",
      minJbp = 3000, negBuckets = 8)
      .orderBy("anchor_id", "positive_id").collect()
    assert(a === b)
  }

  test("identical duplicates fall outside the positive band") {
    val dup = corpus.unionByName(
      Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"))
        .toDF("doc_id", "text"))
    val trips = ContrastivePairs.mine(dup, "doc_id", "text",
      minJbp = 3000, maxJbp = 9900, negBuckets = 8)
      .select("anchor_id", "positive_id").as[(Long, Long)].collect()
    // the exact copy (1, 100) has jaccard 1.0 > maxJbp — never a positive
    assert(!trips.contains((1L, 100L)) && !trips.contains((100L, 1L)))
  }
}
