package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

class PageRankSpec extends SparkSuite {
  import spark.implicits._

  /** Local replay of the pinned integer recurrence. */
  private def replay(edges: Seq[(Long, Long, Long)], iters: Int,
                     scale: Long = 1000000L): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val outW = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val base = scale - scale * 85L / 100L
    var pr = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val inflow = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _, w) => pr(s) * w / outW(s) * 85L / 100L }.sum
      }
      pr = nodes.map(n => n -> (base + inflow.getOrElse(n, 0L))).toMap
    }
    pr
  }

  test("ranks equal the pinned integer recurrence on a hand graph") {
    // hub-and-spoke with a weighted cycle and a dangling node (4)
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 2L),
      (3L, 1L, 1L), (2L, 4L, 1L))
    val got = PageRank.rank(edges.toDF("src", "dst", "weight"), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got === replay(edges, 3))
    // dangling node 4 only ever receives — it must still be present
    assert(got.contains(4L))
    // node 3 has two in-edges and should outrank the leaf 4
    assert(got(3L) > got(4L))
  }

  test("deterministic under repartitioning") {
    val edges = (1L to 200L).map(i => (i, i % 37 + 1L, i % 5 + 1L))
    val df = edges.toDF("src", "dst", "weight")
    val a = PageRank.rank(df.repartition(13), iters = 3)
      .orderBy("node").as[(Long, Long)].collect()
    val b = PageRank.rank(df.repartition(1), iters = 3)
      .orderBy("node").as[(Long, Long)].collect()
    assert(a === b)
    assert(a.toMap === replay(edges, 3))
  }

  test("one iteration from a flat start is the damped in-weight share") {
    val edges = Seq((1L, 3L, 1L), (2L, 3L, 1L))
    val got = PageRank.rank(edges.toDF("src", "dst", "weight"), iters = 1)
      .as[(Long, Long)].collect().toMap
    // node 3: 150000 + two full contributions of 850000
    assert(got(3L) === 150000L + 2L * 850000L)
    assert(got(1L) === 150000L && got(2L) === 150000L)
  }
}
