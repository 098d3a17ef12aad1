package graft

import org.apache.spark.sql.functions._
import graft.operators.Diagnostics

class DiagnosticsSpec extends SparkSuite {
  import spark.implicits._

  test("keySkew names the hot key with exact count and a sane skew multiplier") {
    // 5000 rows on one key, 5000 spread over 5000 keys
    val df = ((1 to 5000).map(_ => "hot") ++ (1 to 5000).map(i => s"k$i"))
      .toDF("k")
    val report = Diagnostics.keySkew(df, $"k", phi = 0.01)
      .as[(String, Long, Long, Double)].collect()
    assert(report.map(_._1).toSeq === Seq("hot"))
    val (_, n, shareBp, skew) = report.head
    assert(n === 5000L)
    assert(shareBp === 5000L) // half the rows
    // mean key load = 10000 / ~5001 ≈ 2; hot key ≈ 2500× the mean
    assert(skew > 2000 && skew < 3000, s"skew_x $skew")
  }

  test("joinExplosionBound flags the hot-key product, stays quiet when balanced") {
    val hotA = ((1 to 2000).map(_ => 7L) ++ (10001L to 12000L)).toDF("k")
    val hotB = ((1 to 3000).map(_ => 7L) ++ (20001L to 22000L)).toDF("k")
    val bound = Diagnostics.joinExplosionBound(hotA, $"k", hotB, $"k", phi = 0.01)
      .as[(Long, Long, Long, Long)].head()
    // key 7 on both sides: 2000 × 3000 = 6M pair rows from ONE key
    assert(bound === ((6000000L, 1L, 4000L, 5000L)))

    val flatA = (1L to 4000L).toDF("k")
    val flatB = (1L to 4000L).toDF("k")
    val quiet = Diagnostics.joinExplosionBound(flatA, $"k", flatB, $"k", phi = 0.01)
      .as[(Long, Long, Long, Long)].head()
    assert(quiet._1 === 0L && quiet._2 === 0L)
  }
}
