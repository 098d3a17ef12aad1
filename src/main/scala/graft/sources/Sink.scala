package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Output-side helpers: layout-aware writes.
  *
  * The reference's destination is SQL tables; in a lake engine the
  * equivalent contract is "write so the NEXT job prunes": hive-style
  * partition directories for low-cardinality filter columns (partition
  * pruning skips whole directories) and bucketing for the high-cardinality
  * join/agg keys (co-located joins skip the shuffle). At 100 TB the
  * partition/bucket layout IS the index.
  *
  * All directory maintenance (compact/expire) goes through the Hadoop
  * FileSystem API, so the same calls work against HDFS/S3A destinations,
  * not just local disk — the filesystems a 100 TB table actually lives on.
  */
object Sink {

  /** Partitioned parquet write: one directory level per partition column. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed managed table (bucket pruning + shuffle-free joins between
    * tables bucketed on the same key/count).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int, sortCol: Option[String] = None,
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode).bucketBy(nBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).format("parquet").saveAsTable(table)
  }

  /** Size-targeted repartition before write so output files land near
    * `targetRows` rows each (the small-files antidote; AQE coalescing
    * handles the read side, this handles the write side).
    */
  def repartitionForWrite(df: DataFrame, totalRows: Long, targetRows: Long): DataFrame =
    df.repartition(math.max(1, math.ceil(totalRows.toDouble / targetRows).toInt))

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def ls(fs: FileSystem, dir: Path): Array[org.apache.hadoop.fs.FileStatus] =
    if (fs.exists(dir)) fs.listStatus(dir) else Array.empty

  private def parquetFiles(fs: FileSystem, dir: Path): Array[Path] =
    ls(fs, dir).filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath)

  /** Compact a FLAT parquet directory's accumulated small files (the
    * steady-state debris of micro-batch appends) into ~`targetBytes`
    * outputs. `coalesce` (narrow, no shuffle) merges read-splits; the
    * rewrite lands in a sibling temp dir first, then swaps in via two
    * renames. NOT transactional: a reader racing the swap can hit a
    * brief path-not-found between the renames, and a crash in that
    * window leaves the data at `<path>__compact_old` (recover by
    * renaming it back); a failed second rename is rolled back
    * automatically. A lake table format makes this atomic via
    * manifests, which is out of scope here — and on S3A the "renames"
    * are copies, widening the window. Partitioned layouts should
    * compact per partition directory. Returns (filesBefore, filesAfter).
    */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L << 20): (Int, Int) = {
    val dfs = fs(spark, path)
    val dir = new Path(path)
    require(dfs.exists(dir) && dfs.getFileStatus(dir).isDirectory,
      s"not a directory: $path")
    require(!ls(dfs, dir).exists(s => s.isDirectory && s.getPath.getName.contains("=")),
      s"$path is hive-partitioned; compact each partition directory")
    val before = ls(dfs, dir).filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val totalBytes = before.map(_.getLen).sum
    val parts = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = new Path(path + "__compact_tmp")
    spark.read.parquet(path).coalesce(parts)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val old = new Path(path + "__compact_old")
    if (dfs.exists(old)) dfs.delete(old, true)
    require(dfs.rename(dir, old),
      s"compaction swap failed for $path; original left in place, rewrite at $tmp")
    if (!dfs.rename(tmp, dir)) {
      val rolledBack = dfs.rename(old, dir) // try to restore the original
      throw new IllegalStateException(
        s"compaction swap-in failed for $path; original " +
          (if (rolledBack) "restored" else s"at $old") + s", rewrite at $tmp")
    }
    dfs.delete(old, true)
    (before.length, parquetFiles(dfs, dir).length)
  }

  /** Retention/vacuum for hive-partitioned layouts: drop partitions
    * whose VALUE sorts strictly below `cutoff` (ingest-day / month
    * layouts — exactly the values Hive-style dirs encode as strings, so
    * lexicographic compare on zero-padded dates is chronological).
    * Directory-level deletes only: no file is ever opened, the cost is
    * one listing — the operation a 100 TB day-partitioned destination
    * runs nightly (against HDFS/S3A via the Hadoop FS API, same as the
    * streaming path probes). Values are unescaped through Spark's own
    * partition-path rules before comparing (a space-bearing value
    * compares as itself, not its escaped form). Returns the dropped
    * values.
    */
  def expirePartitions(spark: SparkSession, path: String,
                       partCol: String, cutoff: String): Seq[String] = {
    val dfs = fs(spark, path)
    val root = new Path(path)
    require(dfs.exists(root) && dfs.getFileStatus(root).isDirectory,
      s"not a directory: $path")
    val prefix = s"$partCol="
    val parts = ls(dfs, root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
    require(parts.nonEmpty, s"$path has no $prefix partition directories")
    val dropped = parts.flatMap { d =>
      val value = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .unescapePathName(d.getPath.getName.stripPrefix(prefix))
      if (value < cutoff) {
        dfs.delete(d.getPath, true)
        Some(value)
      } else None
    }
    dropped.toSeq.sorted
  }

  /** Per-partition compaction over a hive-partitioned layout: each leaf
    * partition directory compacts independently through [[compact]], so
    * the unit of work (and of the non-transactional swap window) stays
    * one partition — never the whole table. Partitions already at
    * `maxFiles` or fewer are skipped without reading data (steady-state
    * micro-batch destinations have mostly-clean partitions; only the
    * hot ones pay). Returns (partitionsCompacted, filesBefore,
    * filesAfter) summed over compacted partitions.
    */
  def compactPartitioned(spark: SparkSession, path: String,
                         targetBytes: Long = 128L << 20,
                         maxFiles: Int = 4): (Int, Int, Int) = {
    val dfs = fs(spark, path)
    val root = new Path(path)
    require(dfs.exists(root) && dfs.getFileStatus(root).isDirectory,
      s"not a directory: $path")
    def leaves(d: Path): Seq[Path] = {
      val subs = ls(dfs, d)
        .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      if (subs.isEmpty) Seq(d) else subs.toSeq.flatMap(s => leaves(s.getPath))
    }
    val parts = leaves(root).filter(_ != root)
    require(parts.nonEmpty, s"$path has no partition directories; use compact")
    var done = 0; var before = 0; var after = 0
    parts.foreach { p =>
      if (parquetFiles(dfs, p).length > maxFiles) {
        val (b, a) = compact(spark, p.toString, targetBytes)
        done += 1; before += b; after += a
      }
    }
    (done, before, after)
  }
}
