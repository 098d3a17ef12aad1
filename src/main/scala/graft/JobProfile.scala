package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Per-ACTION floor decomposition for one registry query: runs the named
  * query (args: <query> [sfDir]) once cold and once warm under a
  * listener, then prints every Spark JOB the warm run scheduled — id,
  * wall ms, stage count, task count, and the callsite description.
  *
  * This is the adjudication tool for the "correct but >2× DuckDB" weak
  * list: a single-process engine pays one setup per QUERY, Spark pays a
  * scheduling floor per ACTION — so a 15-action composed pipeline can be
  * floor-bound at sf0.1 with a perfectly sound plan. The printed table
  * names every action so the SURVEY row can record which are fusable and
  * which are load-bearing (driver-bounded lookups, gates, checkpoints).
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobProfile <query> [sfDir]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.create(cpus)
    val fn = SparkEntry.queries.getOrElse(name,
      throw new IllegalArgumentException(s"unknown query: $name"))

    // cold pass: JIT + footer reads out of the way, like Bench
    fn(spark, sfDir).count()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))

    final case class Job(id: Int, var start: Long = 0L, var end: Long = 0L,
                         var stages: Int = 0, var tasks: Int = 0,
                         var desc: String = "")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = Job(e.jobId, start = e.time)
        j.stages = e.stageIds.length
        j.desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        jobs.put(e.jobId, j)
        e.stageIds.foreach(s => stageToJob.put(s, e.jobId))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        Option(jobs.get(e.jobId)).foreach(_.end = e.time)
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        Option(stageToJob.get(e.stageInfo.stageId))
          .flatMap(j => Option(jobs.get(j)))
          .foreach(_.tasks += e.stageInfo.numTasks)
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    org.apache.spark.sql.graftbridge.bridge
      .waitListenerBusEmpty(spark.sparkContext)
    spark.sparkContext.removeSparkListener(listener)

    val rows = jobs.values().toArray(Array.empty[Job]).sortBy(_.id)
    println(f"== $name warm: ${wall}%.3f s, ${rows.length} jobs ==")
    rows.foreach { j =>
      val ms = if (j.end > 0) j.end - j.start else -1L
      println(f"job ${j.id}%3d  ${ms}%6d ms  stages=${j.stages}%2d " +
        f"tasks=${j.tasks}%4d  ${j.desc.take(100)}")
    }
    val sum = rows.map(j => math.max(0L, j.end - j.start)).sum / 1e3
    println(f"sum(job wall) = ${sum}%.3f s of ${wall}%.3f s " +
      f"(driver-side between jobs: ${wall - sum}%.3f s)")
    spark.stop()
  }
}
