package graft

/** Benchmark main: runs every SparkEntry query at SPARK_GRAFT_SF_DIR,
  * prints ONE JSON line with per-query wall-clock seconds.
  *
  * Each query runs once cold, then three warm passes, and the MEDIAN warm
  * time is reported: ambient load on a shared box dominates single-shots
  * (observed 10x phantom "regressions" on identical code round-over-round),
  * and the median of three warm passes is robust to one contended pass in
  * either direction. Cold times ride along in `queries_cold`, the raw
  * warm passes in `queries_warm_runs`, and per-query GC seconds /
  * peak retained block-manager MB in `queries_gc_sec` /
  * `queries_retained_mb`, so both a noisy host AND in-JVM pressure
  * (GC, block accumulation) are visible in the artifact itself. A query
  * that throws is recorded as -1 in all maps and listed in `failed` — a
  * regression must be visible in the JSON, not a suspiciously fast total.
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

    // r12 sweep signature under adjudication: late-sweep queries inflated
    // (q_kneser_ney 41x sweep-vs-isolated) and warm runs ESCALATING within
    // one query (q_triangle_count 7.4->17.4->57.8 s). clearCache() only
    // drops CacheManager entries — localCheckpoint RDD blocks and
    // not-yet-GC'd broadcasts survive it, and over a 297-query sweep the
    // retained blocks turn into eviction churn + GC pressure. So: free
    // EVERY persisted RDD still registered with the context after each
    // timed run (queries are independent by contract), and carry a
    // per-query GC-time and leftover-storage profile in the artifact so
    // the next inflation is attributable from the JSON alone.
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcMs: Long = {
      var s = 0L
      gcBeans.forEach(b => s += math.max(0L, b.getCollectionTime))
      s
    }
    def retainedBytes: Long =
      spark.sparkContext.getRDDStorageInfo.map(i => i.memSize + i.diskSize).sum
    val peakRetained = new java.util.concurrent.atomic.AtomicLong(0L)
    def freeRetained(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def timeOne(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case _: Throwable => -1.0 }
      finally {
        val left = retainedBytes
        peakRetained.getAndUpdate(cur => math.max(cur, left))
        freeRetained() // queries are independent: no cross-query
        // persisted/checkpointed blocks accumulating into eviction churn
      }
    }

    // optional args: query names — bench only those (targeted A/B timing
    // in a fresh JVM, the tool for separating host noise and in-run JVM
    // pressure from real regressions)
    val only = if (args.isEmpty) None else Some(args.toSet)

    // Outlier guard (r13 adjudication: the driver's kept artifact was a
    // contaminated host window — q_corpus_clean warm 188 s vs cold
    // 17.5 s at 1.1 s GC, i.e. external contention, not code). Warm ≫
    // own cold is that signature: the warm passes re-run the identical
    // plan on identical data, so absent in-JVM pressure they can only
    // read much slower than cold if the HOST was dirty during them.
    // Rule: warm median > 2× own cold AND > 3× the previous sweep's
    // median (when one exists) AND > 1 s absolute → re-run the whole
    // cold+warm cycle once and keep the cycle with the lower median;
    // flagged queries carry their first-cycle median in `rerun_guard`
    // so the artifact itself shows what was re-measured.
    val prevMedians: Map[String, Double] = {
      val path = sys.env.getOrElse("SPARK_GRAFT_BENCH_PREV",
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench/full_latest.json"))
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(path)), "UTF-8")
        """"queries":\{([^}]*)\}""".r.findFirstMatchIn(txt)
          .map(_.group(1)).getOrElse("").split(",").iterator
          .flatMap { kv => kv.split(":") match {
            case Array(k, v) =>
              try Some(k.replace("\"", "") -> v.toDouble)
              catch { case _: Throwable => None }
            case _ => None
          } }.toMap
      } catch { case _: Throwable => Map.empty }
    }
    val queryIdx = new java.util.concurrent.atomic.AtomicInteger(0)
    // q_noop: the measured per-query session floor (planning + codegen +
    // job scheduling for a 1-row local frame, no table reads). Ratios vs
    // the single-process oracle engine are only meaningful above this
    // floor — merge_bench.py prints (spark − floor)/oracle next to the
    // raw ratio. Bench-only: not a registry query, not an operator.
    val noop: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
      (s, _) => s.range(1).select(org.apache.spark.sql.functions.lit(1).as("one"))
    val results = (SparkEntry.queries.toSeq :+ ("q_noop" -> noop)).sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
      // flush the context cleaner's weak-ref backlog periodically: over
      // 150+ queries in one JVM, unreclaimed shuffle/broadcast state
      // inflates the LATE-alphabet queries (measured: q_table_order
      // 0.07 s fresh-JVM vs 0.75 s at position ~140 without this)
      queryIdx.getAndIncrement()
      def cycle(): (Double, Double, Seq[Double], Double, Double) = {
        System.gc()
        val gc0 = gcMs
        peakRetained.set(0L)
        val cold = timeOne(fn)
        val warmRuns =
          if (cold >= 0) Seq.fill(3)(timeOne(fn)).map(t => if (t < 0) -1.0 else t)
          else Seq(-1.0, -1.0, -1.0)
        val median =
          if (warmRuns.exists(_ < 0)) -1.0 else warmRuns.sorted.apply(1)
        val gcSec = (gcMs - gc0) / 1e3
        val peakMb = peakRetained.get / 1048576.0
        (cold, median, warmRuns, gcSec, peakMb)
      }
      val first = cycle()
      val dirty = first._2 > 1.0 && first._1 > 0 &&
        first._2 > 2 * first._1 &&
        prevMedians.get(name).forall(p => first._2 > 3 * p)
      val (kept, flagged) =
        if (dirty) {
          System.err.println(f"bench: outlier guard re-running $name " +
            f"(warm median ${first._2}%.2f s vs cold ${first._1}%.2f s)")
          val second = cycle()
          (if (second._2 >= 0 && second._2 < first._2) second else first,
            Some(name -> first._2))
        } else (first, None)
      (name, kept._1, kept._2, kept._3, kept._4, kept._5, flagged)
    }
    def jmap(xs: Seq[(String, Double)]): String =
      xs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = jmap(results.map(r => r._1 -> r._3))
    val cold = jmap(results.map(r => r._1 -> r._2))
    val runs = results
      .map(r => "\"" + r._1 + "\":[" + r._4.mkString(",") + "]")
      .mkString("{", ",", "}")
    val failed = results.filter(_._3 < 0).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val gc = jmap(results.map(r => r._1 -> (math.rint(r._5 * 1000) / 1000)))
    val left = jmap(results.map(r => r._1 -> (math.rint(r._6 * 10) / 10)))
    val rerun = jmap(results.flatMap(_._7.toSeq))
    // the floor instrument rides in `queries` but not in the headline
    // total (round-over-round totals stay comparable)
    val total = results.filter(_._1 != "q_noop").map(_._3).filter(_ >= 0).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_cold":$cold,"queries_warm_runs":$runs,"queries_gc_sec":$gc,"queries_retained_mb":$left,"rerun_guard":$rerun,"failed":$failed,"sf":"$sfDir"}"""
    println(json)
    // The stdout line gets tail-truncated by capture tooling once the
    // suite exceeds ~30 queries, which makes per-query numbers
    // unauditable round-over-round. Persist the FULL table to a repo
    // file as well (override with SPARK_GRAFT_BENCH_OUT) so every
    // per-query median is machine-diffable against the previous round.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench/full_latest.json")
    try {
      val p = java.nio.file.Paths.get(outPath)
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(p, json.getBytes("UTF-8"))
      System.err.println(s"bench: full per-query table written to $outPath")
    } catch { case e: Throwable =>
      System.err.println(s"bench: could not write $outPath: ${e.getMessage}")
    }
    spark.stop()
  }
}
