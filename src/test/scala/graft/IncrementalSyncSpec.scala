package graft

import org.apache.spark.sql.functions._
import graft.operators.IncrementalJoin
import graft.pipelines.IncrementalSync

class IncrementalSyncSpec extends SparkSuite {
  import spark.implicits._

  test("one snapshot diff refreshes agg, checksum and join to their recompute forms") {
    val dim = Seq(("g0", "d0"), ("g1", "d1"), ("g2", "d2"), ("g3", "d3"))
      .toDF("g", "dv")
    val oldRows = (1 to 300).map(i => (i.toLong, s"g${i % 4}", (i * 13 % 500) / 10.0))
    // drift: deletes, value changes, GROUP-moving changes, inserts
    val newRows = oldRows.filter(_._1 % 11 != 0)
      .map { case (id, g, v) =>
        if (id % 7 == 0) (id, g, v + 50.0)
        else if (id % 13 == 0) (id, s"g${(id + 1) % 4}", v)
        else (id, g, v) } ++
      (401 to 430).map(i => (i.toLong, s"g${i % 4}", i / 10.0))
    def df(s: Seq[(Long, String, Double)]) = s.toDF("id", "g", "v")

    val s0 = IncrementalSync.init(df(oldRows), dim, "id", Seq("g"), Seq("g"),
      $"v", Seq("g", "v"))
    val s1 = IncrementalSync.refresh(s0, df(oldRows), df(newRows), dim,
      "id", Seq("g"), Seq("g"), $"v", Seq("g", "v"))
    val direct = IncrementalSync.init(df(newRows), dim, "id", Seq("g"), Seq("g"),
      $"v", Seq("g", "v"))

    def canonAgg(d: org.apache.spark.sql.DataFrame) =
      d.select($"g", $"n_rows", $"total".cast("double")).orderBy("g")
        .collect().toSeq
    assert(canonAgg(s1.agg) === canonAgg(direct.agg))
    assert(canonAgg(s1.checksum) === canonAgg(direct.checksum))
    def canonJoin(d: org.apache.spark.sql.DataFrame) =
      d.orderBy(d.columns.map(col): _*).collect().toSeq
    assert(canonJoin(s1.joined) ===
      canonJoin(IncrementalJoin.joinOf(df(newRows), dim, Seq("g"))))
  }

  test("a planted re-scale fires the drift alarm through maintained counts, no rescan") {
    import graft.pipelines.IncrementalSync.DriftSpec
    val dim = Seq(("g0", "d0"), ("g1", "d1")).toDF("g", "dv")
    val oldRows = (1 to 2000).map(i => (i.toLong, s"g${i % 2}", (i % 400).toDouble))
    // the adversarial sync: every key survives, every row is a legitimate
    // update — counts and key sets are clean; only the DISTRIBUTION moved
    val newRows = oldRows.map { case (id, g, v) => (id, g, v * 3.0) }
    def df(s: Seq[(Long, String, Double)]) = s.toDF("id", "g", "v")
    val spec = DriftSpec.numeric($"v", Seq(100.0, 200.0, 300.0), alarmPpm = 250000L)

    val s0 = IncrementalSync.init(df(oldRows), dim, "id", Seq("g"), Seq("g"),
      $"v", Seq("g", "v"), Some(spec))
    assert(IncrementalSync.driftAlarmed(s0) === Some(false)) // baseline == counts

    // persist the state the way a real sync would (state tables live in
    // the warehouse between syncs), then score FROM the persisted form:
    // the scoring plan must scan only the two bucket-count tables
    val dir = java.nio.file.Files.createTempDirectory("drift_state").toString
    s0.drift.get.counts.write.mode("overwrite").parquet(s"$dir/baseline")
    val s1 = IncrementalSync.refresh(s0, df(oldRows), df(newRows), dim,
      "id", Seq("g"), Seq("g"), $"v", Seq("g", "v"))
    s1.drift.get.counts.write.mode("overwrite").parquet(s"$dir/counts")
    val persisted = s0.copy(drift = Some(s1.drift.get.copy(
      baseline = spark.read.parquet(s"$dir/baseline"),
      counts = spark.read.parquet(s"$dir/counts"))))
    assert(IncrementalSync.driftAlarmed(persisted) === Some(true))
    val plan = IncrementalSync.driftScore(persisted).get
      .queryExecution.executedPlan.toString
    // every scan reads a bucket-count table (the totals branch re-reads
    // the joined counts, so each tiny table scans twice); NOTHING reads
    // a snapshot — no LocalTableScan, no path outside the state dir
    val scans = plan.split("Scan parquet").length - 1
    val stateScans = plan.split(java.util.regex.Pattern.quote(dir)).length - 1
    assert(scans === 4 && stateScans === 4, plan)
    assert(!plan.contains("LocalTableScan"), plan)

    // maintained counts == a from-scratch init on the new snapshot
    val directCounts = IncrementalSync.init(df(newRows), dim, "id", Seq("g"),
      Seq("g"), $"v", Seq("g", "v"), Some(spec)).drift.get.counts
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select($"bucket", $"n_rows").orderBy("bucket").collect().toSeq
    assert(canon(s1.drift.get.counts) === canon(directCounts))

    // an in-band refresh (values wiggle inside their buckets) stays quiet
    val quiet = oldRows.map { case (id, g, v) => (id, g, v + 0.25) }
    val sQuiet = IncrementalSync.refresh(s0, df(oldRows), df(quiet), dim,
      "id", Seq("g"), Seq("g"), $"v", Seq("g", "v"))
    assert(IncrementalSync.driftAlarmed(sQuiet) === Some(false))
  }

  test("the drift baseline is frozen at init, not a live view of the snapshot source") {
    import graft.pipelines.IncrementalSync.DriftSpec
    val dim = Seq(("g0", "d0")).toDF("g", "dv")
    val dir = java.nio.file.Files.createTempDirectory("drift_frozen").toString
    val oldRows = (1 to 2000).map(i => (i.toLong, "g0", (i % 400).toDouble))
    oldRows.toDF("id", "g", "v").write.parquet(s"$dir/snap")
    val snap = spark.read.parquet(s"$dir/snap")
    val spec = DriftSpec.numeric($"v", Seq(100.0, 200.0, 300.0))
    val s0 = IncrementalSync.init(snap, dim, "id", Seq("g"), Seq("g"),
      $"v", Seq("g", "v"), Some(spec))
    // the warehouse pattern: the NEXT sync overwrites the snapshot path
    // in place — a lazy baseline would silently track the new data and
    // the alarm could never fire
    val newRows = oldRows.map { case (id, g, v) => (id, g, v * 3.0) }
    newRows.toDF("id", "g", "v").write.mode("overwrite").parquet(s"$dir/snap2")
    val s1 = IncrementalSync.refresh(s0, oldRows.toDF("id", "g", "v"),
      spark.read.parquet(s"$dir/snap2"), dim, "id", Seq("g"), Seq("g"),
      $"v", Seq("g", "v"))
    // overwrite the ORIGINAL baseline source after the refresh
    newRows.toDF("id", "g", "v").write.mode("overwrite").parquet(s"$dir/snap")
    // frozen baseline still scores the re-scale loudly
    assert(IncrementalSync.driftAlarmed(s1) === Some(true))
  }

  test("a categorical mix shift fires the same maintained-counts alarm") {
    import graft.pipelines.IncrementalSync.DriftSpec
    val dim = Seq(("g0", "d0")).toDF("g", "dv")
    val statuses = Seq("OPEN", "SHIPPED", "DONE")
    val oldRows = (1 to 3000).map(i => (i.toLong, "g0",
      if (i % 150 == 0) s"RARE_${i % 4}" else statuses(i % 3)))
    // every key survives; only the status MIX moves (DONE mostly → OPEN)
    val newRows = oldRows.map { case (id, g, s) =>
      (id, g, if (s == "DONE" && id % 4 != 0) "OPEN" else s) }
    def df(s: Seq[(Long, String, String)]) = s.toDF("id", "g", "status")
    // frozen identity list: the three real statuses; RARE_* folds to OTHER
    val spec = DriftSpec.categorical($"status", statuses, alarmPpm = 250000L)

    val s0 = IncrementalSync.init(df(oldRows), dim, "id", Seq("g"), Seq("g"),
      lit(0), Seq("g", "status"), Some(spec))
    assert(IncrementalSync.driftAlarmed(s0) === Some(false))
    val s1 = IncrementalSync.refresh(s0, df(oldRows), df(newRows), dim,
      "id", Seq("g"), Seq("g"), lit(0), Seq("g", "status"))
    assert(IncrementalSync.driftAlarmed(s1) === Some(true))
    // maintained category counts == a from-scratch init on the new snapshot
    val direct = IncrementalSync.init(df(newRows), dim, "id", Seq("g"),
      Seq("g"), lit(0), Seq("g", "status"), Some(spec)).drift.get.counts
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select($"bucket", $"n_rows").orderBy("bucket").collect().toSeq
    assert(canon(s1.drift.get.counts) === canon(direct))
    // the state is ≤ nBuckets rows: 3 identities + OTHER
    assert(canon(s1.drift.get.counts).size <= 4)
  }
}
