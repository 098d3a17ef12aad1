package graft

/** Benchmark main: runs every SparkEntry query at SPARK_GRAFT_SF_DIR,
  * prints ONE JSON line with per-query wall-clock seconds.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.create(cpus)
    // warm the JVM + parquet footers once so per-query numbers measure the
    // queries, not first-touch class loading / footer reads.
    SparkEntry.queries.get("q1_agg").foreach(fn => fn(spark, sfDir).count())
    graft.sources.Tables.All.foreach(t =>
      graft.sources.Tables.load(spark, sfDir, t).count())
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // queries are independent: drop their persisted intermediates so 50
      // queries' caches don't accumulate into storage-eviction churn
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
