package graft

import org.apache.spark.sql.functions._
import graft.operators.{HeavyHitters, TopK}

class TopKFrequencySpec extends SparkSuite {
  import spark.implicits._

  test("TopK.perGroup equals naive per-group sort-take") {
    val rows = (1 to 200).map { i =>
      (s"g${i % 7}", (i * 131) % 97, i.toLong) // ties in v broken by id
    }
    val df = rows.toDF("g", "v", "id")
    val got = TopK.perGroup(df, Seq("g"), Seq($"v".desc, $"id".asc), k = 3)
      .select("g", "v", "id", "rank_in_group")
      .as[(String, Int, Long, Int)].collect().toSet
    val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.sortBy { case (_, v, id) => (-v, id) }.take(3).zipWithIndex
        .map { case ((_, v, id), r) => (g, v, id, r + 1) }
    }.toSet
    assert(got === want)
  }

  test("TopK.perGroup plans a partial WindowGroupLimit before the shuffle") {
    val df = (1 to 100).map(i => (i % 5, i)).toDF("g", "v")
    val plan = TopK.perGroup(df, Seq("g"), Seq($"v".desc, $"g".asc), k = 2)
      .queryExecution.executedPlan.toString
    // rank-limit pushdown: a Partial group-limit on the map side keeps
    // k rows per group per task; Final re-limits after the exchange
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(plan.contains("Partial"), plan)
    assert(plan.contains("Final"), plan)
  }

  test("HeavyHitters.frequentKeys is exact under forced eviction") {
    // skewed stream: 3 hot keys with ~25% / 15% / 10% of rows, 400 cold
    // keys sharing the rest. capacity=19 (< distinct keys) forces
    // Misra–Gries eviction; phi=0.06 needs capacity+1 > 16.7 — holds.
    val n = 4000
    val rows = (0 until n).map { i =>
      val u = (i * 2654435761L) % 100
      val k =
        if (u < 25) "hotA" else if (u < 40) "hotB" else if (u < 50) "hotC"
        else s"cold${(i * 48271) % 400}"
      Tuple1(k)
    }
    val df = rows.toDF("k").repartition(8) // many partitions → per-partition MG
    val phi = 0.06
    val got = HeavyHitters.frequentKeys(df, $"k", phi, capacity = 19)
      .as[(String, Long)].collect().toMap
    val thr = math.ceil(phi * n).toLong
    val want = rows.groupBy(_._1).view.mapValues(_.size.toLong)
      .filter(_._2 >= thr).toMap
    assert(got === want)
    assert(got.keySet === Set("hotA", "hotB", "hotC"))
  }

  test("HeavyHitters: weighted MG merge stays exact across 200+ simulated partitions") {
    // the mergeable-summaries claim treeAggregate's reduction rests on:
    // 250 per-partition summaries, weighted-merged through an
    // intermediate tree level, never lose a heavy key (Agarwal PODS'12)
    val nParts = 250
    val rng = new scala.util.Random(7)
    val partitions = (0 until nParts).map { p =>
      (0 until 200).map { _ =>
        val u = rng.nextInt(100)
        if (u < 30) "hot1" else if (u < 45) "hot2" else s"cold${rng.nextInt(300)}"
      }
    }
    val capacity = 19
    val perPart = partitions.map(rows =>
      HeavyHitters.mgFold(rows.iterator.map((_, 1L)), capacity).toList)
    // 32-way intermediate merges, then one driver merge — the tree shape
    val level1 = perPart.grouped(32).map(group =>
      HeavyHitters.mgFold(group.flatten.iterator, capacity).toList).toList
    val candidates = HeavyHitters.mgFold(level1.flatten.iterator, capacity)
      .map(_._1).toSet
    val n = nParts * 200
    val exact = partitions.flatten.groupBy(identity).view.mapValues(_.size.toLong)
    val phi = 0.1 // requires capacity+1 > 10 — holds
    val heavy = exact.filter(_._2 >= math.ceil(phi * n).toLong).keySet
    // no false negatives at any tree level: every truly heavy key survives
    assert(heavy.subsetOf(candidates), s"lost heavy keys: ${heavy -- candidates}")
    assert(heavy === Set("hot1", "hot2"))
  }

  test("HeavyHitters: small inputs skip the intermediate merge exchange") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted}
    val df = Seq.fill(100)("a").toDF("k").repartition(4)
    df.count() // materialize the input exchange outside the window
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        stages.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // phase 1 (summaries + driver merge) runs eagerly inside this call
      val out = HeavyHitters.frequentKeys(df, $"k", phi = 0.5, capacity = 8)
      org.apache.spark.sql.graftbridge.bridge.waitListenerBusEmpty(spark.sparkContext)
      // 4 scan partitions: input exchange map + one treeAggregate result
      // stage — an intermediate merge level would add a third stage
      assert(stages.get === 2, s"expected scan+result stages only, got ${stages.get}")
      assert(out.as[(String, Long)].collect().toMap === Map("a" -> 100L))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("HeavyHitters ignores null keys and rejects an unsafe capacity") {
    val df = Seq(Some("a"), Some("a"), Some("a"), None, Some("b")).toDF("k")
    val got = HeavyHitters.frequentKeys(df, $"k", phi = 0.5, capacity = 8)
      .as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 3L)) // n=4 non-null, threshold 2; b has 1
    intercept[IllegalArgumentException] {
      HeavyHitters.frequentKeys(df, $"k", phi = 0.001, capacity = 10)
    }
  }
}
