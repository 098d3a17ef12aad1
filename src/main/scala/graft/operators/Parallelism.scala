package graft.operators

import org.apache.spark.sql.DataFrame

/** Scan-parallelism guard for CPU-bound passes.
  *
  * A parquet file with one row group is ONE scan task regardless of
  * `spark.sql.files.maxPartitionBytes` (a row group cannot split), so a
  * small single-file table serializes a tokenize- or vector-math-heavy
  * pass onto one core of a 32-core box — measured on
  * q_quality_classifier (792 ms single-task train scan of a 0.6 MB
  * documents file) and q_ann_ivfpq (1.09 s single-task code
  * assignment). The same AQE-adjacent failure as the q_lsh_curve
  * byte-targeted coalescing lesson: byte-sized heuristics starve
  * CPU-bound stages.
  *
  * `spread` repartitions ONLY when the frame has fewer partitions than
  * the session's default parallelism — at 100 TB the scan already
  * carries thousands of splits and the guard makes this a no-op, so a
  * blanket repartition can never COALESCE a big scan. Safe only for
  * passes whose results are partition/order independent (exact integer
  * sums, per-row projections — the engine's cross-engine contract
  * already requires that).
  */
object Parallelism {

  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
