package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.HeavyHitters
import graft.streaming.StreamingFrequency

class StreamingFrequencySpec extends SparkSuite {
  import spark.implicits._

  test("streaming MG candidates cover the heavy set and verify exactly") {
    implicit val sqlCtx = spark.sqlContext
    // same skew profile as the batch spec: 3 hot keys + 400 cold
    val n = 4000
    val rows = (0 until n).map { i =>
      val u = (i * 2654435761L) % 100
      if (u < 25) "hotA" else if (u < 40) "hotB" else if (u < 50) "hotC"
      else s"cold${(i * 48271) % 400}"
    }
    val stream = MemoryStream[String]
    val q = StreamingFrequency.candidates(stream.toDF().toDF("k"), "k",
      shards = 8, capacity = 19)
      .writeStream.outputMode("update").format("memory")
      .queryName("freq_out").start()
    try {
      stream.addData(rows.take(n / 2)); q.processAllAvailable()
      stream.addData(null.asInstanceOf[String]) // ignored, like the batch op
      q.processAllAvailable()
      stream.addData(rows.drop(n / 2)); q.processAllAvailable()
      // latest snapshot per shard = rows carrying that shard's max total
      val emitted = spark.table("freq_out")
        .withColumn("__max", max("shard_total")
          .over(org.apache.spark.sql.expressions.Window.partitionBy("shard")))
        .filter($"shard_total" === $"__max")
      val candidates = emitted.select("key").as[String].collect().toSet
      assert(!candidates.contains(null)) // null keys never become candidates

      val phi = 0.06
      val thr = math.ceil(phi * n).toLong
      val trueHeavy = rows.groupBy(identity).view.mapValues(_.size.toLong)
        .filter(_._2 >= thr).keySet.toSet
      assert(trueHeavy === Set("hotA", "hotB", "hotC"))
      assert(trueHeavy.subsetOf(candidates), // streaming MG: no false negatives
        s"missing: ${trueHeavy -- candidates}")
      // state stays bounded: each shard's snapshot carries ≤ capacity keys
      val perShard = emitted.groupBy("shard").count().as[(Int, Long)].collect()
      assert(perShard.forall(_._2 <= 19), perShard.toSeq)

      // exact verify over the stream's candidates == the batch operator
      val exact = rows.toDF("k")
        .join(candidates.toSeq.toDF("k"), Seq("k"), "left_semi")
        .groupBy("k").count().filter($"count" >= thr)
        .as[(String, Long)].collect().toMap
      val batch = HeavyHitters.frequentKeys(rows.toDF("k"), $"k", phi,
        capacity = 19).as[(String, Long)].collect().toMap
      assert(exact === batch)
    } finally q.stop()
  }
}
