package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Sequencing

class SequencingSpec extends SparkSuite {
  import spark.implicits._

  private def naiveGaps(keys: Seq[Long]): Seq[(Long, Long, Long)] = {
    val sorted = keys.distinct.sorted
    sorted.zip(sorted.drop(1)).collect {
      case (a, b) if b > a + 1 => (a + 1, b - 1, b - a - 1)
    }
  }

  test("gaps match the naive definition, including cross-bucket and empty-bucket holes") {
    // nBuckets = 4 over [0, 1005] → width 252: keys 0..9 land in bucket 0,
    // 300 in bucket 1, buckets 2-3 only hold 1000..1005 — the 10..299 and
    // 301..999 holes cross bucket boundaries and span EMPTY buckets.
    val keys = Seq[Long](0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 300, 1000, 1001, 1002, 1003, 1004, 1005)
    val out = Sequencing.gaps(keys.toDF("k"), "k", nBuckets = 4)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((10L, 299L, 290L), (301L, 999L, 699L)))
    assert(out === naiveGaps(keys))
  }

  test("gaps equal the naive single-window formulation on random sparse data") {
    val rnd = new scala.util.Random(42)
    val keys = Seq.fill(2000)(rnd.nextInt(5000).toLong).distinct
    for (nBuckets <- Seq(1, 7, 64, 100000)) {
      val out = Sequencing.gaps(keys.toDF("k"), "k", nBuckets)
        .as[(Long, Long, Long)].collect().toSeq
      assert(out === naiveGaps(keys), s"nBuckets=$nBuckets")
    }
  }

  test("gaps ignore nulls and duplicates; empty and single-key inputs yield none") {
    val dup = Seq(Some(5L), Some(5L), Some(7L), None, Some(7L)).toDF("k")
    assert(Sequencing.gaps(dup, "k").as[(Long, Long, Long)].collect().toSeq ===
      Seq((6L, 6L, 1L)))
    assert(Sequencing.gaps(Seq.empty[Long].toDF("k"), "k").count() === 0)
    assert(Sequencing.gaps(Seq(42L).toDF("k"), "k").count() === 0)
  }

  test("islands are the exact dual of gaps and count distinct keys") {
    val keys = Seq[Long](0, 1, 2, 2, 5, 6, 10, 1000, 1001)
    val out = Sequencing.islands(keys.toDF("k"), "k", nBuckets = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((0L, 2L, 3L), (5L, 6L, 2L), (10L, 10L, 1L), (1000L, 1001L, 2L)))
    // islands ∪ gaps tile the domain exactly
    val gaps = Sequencing.gaps(keys.toDF("k"), "k", nBuckets = 3)
      .as[(Long, Long, Long)].collect().toSeq
    val tiles = (out.map(i => (i._1, i._2)) ++ gaps.map(g => (g._1, g._2))).sorted
    assert(tiles.head._1 === 0L && tiles.last._2 === 1001L)
    assert(tiles.zip(tiles.drop(1)).forall { case (a, b) => a._2 + 1 == b._1 })
  }

  test("the full-data window is partitioned by bucket — no single-partition data window") {
    // the only unpartitioned window may run over the nBuckets-row summary
    // frame; the data-sized lag must be partitioned by bucket. AQE wraps
    // materialized stages as leaves, so inspect the non-adaptive plan.
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val keys = (0L until 10000L by 3).toDF("k")
      val plan = Sequencing.gaps(keys, "k", nBuckets = 64).queryExecution.executedPlan
      val windows = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.nonEmpty)
      val unpartitioned = windows.filter(_.partitionSpec.isEmpty)
      assert(unpartitioned.size < windows.size,
        "the data-sized lag window must carry a partition spec")
      // the cross-bucket stitch window is allowed; it must sit above the
      // per-bucket HashAggregate (≤ nBuckets rows), which means an
      // aggregate appears in its subtree
      unpartitioned.foreach { w =>
        val hasAgg = w.collectFirst {
          case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
        }.isDefined
        assert(hasAgg, "unpartitioned window must only see the bucket summary")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }
}
