package graft

import org.apache.spark.sql.SparkSession

/** Tuned session factory for the graft engine.
  *
  * Centralizes the conf the engine relies on so every entry point (Verify,
  * Bench, tests, user code) runs the same way:
  * - AQE on: runtime coalescing of shuffle partitions, skew-join
  *   splitting, and dynamic broadcast conversion — the knobs that keep
  *   the same plans healthy from sf0.001 to 100 TB.
  * - shuffle.partitions sized to the machine locally; on a real cluster
  *   AQE's coalescing makes the static value a ceiling, not a tuning
  *   problem.
  * - UTC session timezone (oracle parity + sane timestamp semantics).
  */
object GraftSession {

  def builder(cpus: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft")
      // SQL surface for the custom sketch expressions (graft_minhash,
      // graft_simhash, graft_fingerprint, graft_gram_hashes,
      // graft_cosine) — registered via SparkSessionExtensions
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // 256 MB scan splits: on a 100 TB corpus the default 128 MB doubles
      // the task count for sequential parquet scans; AQE still coalesces
      // small post-shuffle partitions independently of this.
      .config("spark.sql.files.maxPartitionBytes", "256m")
      // testdata events.ts is TIMESTAMP(NANOS) parquet, which the
      // vectorized reader rejects; read nanos as long session-wide (set
      // HERE, once — Tables.load mutating it per-call was a side effect
      // on unrelated reads)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def create(cpus: Int): SparkSession = {
    val s = builder(cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // Silence WindowExec's "No Partition Defined" warning: every
    // unpartitioned window in this library sits on a BOUNDED summary
    // frame by construction (bucket/centroid/stat rows — audited per
    // round; see Drift/RunningTotals/Sequencing comments), so the
    // warning is pure noise here and drowning the log in hundreds of
    // copies trains readers to ignore the one warning that matters.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    s
  }
}
