package graft

import org.apache.spark.sql.functions._
import graft.operators.Allocate

class AllocateSpec extends SparkSuite {
  import spark.implicits._

  private def lines(rows: (Long, Long, Long, Long)*) = // (key, line, weight, amount)
    rows.toDF("k", "ln", "w", "amt")

  test("parts sum exactly to the amount and follow proportions") {
    // amount 100 over weights 1,1,1: floor shares 33 each, 1 leftover
    // to the largest remainder (all tie -> first line)
    val out = Allocate.largestRemainder(
        lines((1L, 1L, 1L, 100L), (1L, 2L, 1L, 100L), (1L, 3L, 1L, 100L)),
        Seq("k"), "w", "amt", Seq("ln"))
      .orderBy("ln").select("alloc_q").as[Long].collect()
    assert(out === Array(34L, 33L, 33L))
    assert(out.sum === 100L)
  }

  test("largest remainders get the leftover units") {
    // amount 10, weights 1,2,4 (T=7): bases 1,2,5; remainders 3,6,5
    // deficit 2 -> +1 to remainders 6 and 5
    val out = Allocate.largestRemainder(
        lines((1L, 1L, 1L, 10L), (1L, 2L, 2L, 10L), (1L, 3L, 4L, 10L)),
        Seq("k"), "w", "amt", Seq("ln"))
      .orderBy("ln").select("alloc_q").as[Long].collect()
    assert(out === Array(1L, 3L, 6L))
  }

  test("all-zero weights degrade to an equal split") {
    val out = Allocate.largestRemainder(
        lines((1L, 1L, 0L, 7L), (1L, 2L, 0L, 7L), (1L, 3L, 0L, 7L)),
        Seq("k"), "w", "amt", Seq("ln"))
      .orderBy("ln").select("alloc_q").as[Long].collect()
    assert(out === Array(3L, 2L, 2L))
  }

  test("negative amounts (refunds) floor-divide and still sum exactly") {
    val out = Allocate.largestRemainder(
        lines((1L, 1L, 1L, -10L), (1L, 2L, 2L, -10L), (1L, 3L, 4L, -10L)),
        Seq("k"), "w", "amt", Seq("ln"))
      .orderBy("ln").select("alloc_q").as[Long].collect()
    assert(out.sum === -10L)
    // proportions hold within one unit of the exact -10*w/7
    assert(out.zip(Seq(1L, 2L, 4L)).forall { case (a, w) =>
      math.abs(a - (-10.0 * w / 7)) <= 1.0 })
  }

  test("a key with an inconsistent amount fails loudly") {
    val e = intercept[Exception] {
      Allocate.largestRemainder(
        Seq((1L, 1L, 1L, 10L), (1L, 2L, 2L, 11L)).toDF("k", "ln", "w", "amt"),
        Seq("k"), "w", "amt", Seq("ln")).collect()
    }
    assert(e.getMessage.contains("not constant within a key"))
  }

  test("negative weights fail loudly") {
    val e = intercept[Exception] {
      Allocate.largestRemainder(
        lines((1L, 1L, -1L, 10L), (1L, 2L, 2L, 10L)),
        Seq("k"), "w", "amt", Seq("ln")).collect()
    }
    assert(e.getMessage.contains("negative weight"))
  }

  test("randomized: every key's parts sum exactly to its amount") {
    val rnd = new scala.util.Random(7)
    val rows = for (k <- 1L to 50L; ln <- 1L to (1 + rnd.nextInt(8)).toLong)
      yield (k, ln, rnd.nextInt(1000).toLong, k * 13L)
    val out = Allocate.largestRemainder(rows.toDF("k", "ln", "w", "amt"),
        Seq("k"), "w", "amt", Seq("ln"))
      .groupBy("k").agg(sum("alloc_q").as("s"), first("amt").as("a"))
      .filter(col("s") =!= col("a")).count()
    assert(out === 0L)
  }

  test("plan shape: one exchange feeds both windows") {
    val df = Allocate.largestRemainder(
      lines((1L, 1L, 1L, 10L), (1L, 2L, 2L, 10L)), Seq("k"), "w", "amt", Seq("ln"))
    val shuffles = "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).size
    assert(shuffles === 1, df.queryExecution.executedPlan.toString)
  }

  test("100 TB regime: amount x weight beyond 2^63 allocates exactly") {
    // 10^11-cent amount split over 10^10-scale weights: the product is
    // 10^21 — the old pure-BIGINT path overflowed here (caught by the
    // forecast-reconciliation sf0.1 gate); the decimal product is exact
    val amt = 100000000000L // 10^11
    val w = Seq(10000000000L, 20000000000L, 30000000001L)
    val df = lines(
      (1L, 1L, w(0), amt), (1L, 2L, w(1), amt), (1L, 3L, w(2), amt))
    val out = Allocate.largestRemainder(df, Seq("k"), "w", "amt", Seq("ln"))
      .select("ln", "alloc_q").as[(Long, Long)].collect().toMap
    assert(out.values.sum == amt, "allocation must sum to the amount")
    // shares track weights to within the 1-unit remainder adjustment
    val tot = w.sum.toDouble
    w.zipWithIndex.foreach { case (wi, i) =>
      val expect = amt * (wi / tot)
      assert(math.abs(out(i + 1L) - expect) <= 1.0, s"line ${i + 1}")
    }
  }
}
