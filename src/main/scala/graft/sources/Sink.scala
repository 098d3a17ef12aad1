package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SaveMode}
import org.apache.spark.sql.functions._

/** Output-side helpers: layout-aware writes.
  *
  * The reference's destination is SQL tables; in a lake engine the
  * equivalent contract is "write so the NEXT job prunes": hive-style
  * partition directories for low-cardinality filter columns (partition
  * pruning skips whole directories) and bucketing for the high-cardinality
  * join/agg keys (co-located joins skip the shuffle). At 100 TB the
  * partition/bucket layout IS the index.
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

  /** Compact a FLAT parquet directory's accumulated small files (the
    * steady-state debris of micro-batch appends) into ~`targetBytes`
    * outputs. `coalesce` (narrow, no shuffle) merges read-splits; the
    * rewrite lands in a sibling temp dir first, then swaps in via two
    * renames. NOT transactional: a reader racing the swap can hit a
    * brief path-not-found between the renames, and a crash in that
    * window leaves the data at `<path>__compact_old` (recover by
    * renaming it back); a failed second rename is rolled back
    * automatically. A lake table format makes this atomic via
    * manifests, which is out of scope here. Partitioned layouts should
    * compact per partition directory. Returns (filesBefore, filesAfter).
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetBytes: Long = 128L << 20): (Int, Int) = {
    def parquetFiles(d: java.io.File): Array[java.io.File] =
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    val dir = new java.io.File(path)
    require(dir.isDirectory, s"not a directory: $path")
    require(!Option(dir.listFiles()).getOrElse(Array.empty)
        .exists(f => f.isDirectory && f.getName.contains("=")),
      s"$path is hive-partitioned; compact each partition directory")
    val before = parquetFiles(dir)
    val totalBytes = before.map(_.length()).sum
    val parts = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = new java.io.File(path + "__compact_tmp")
    spark.read.parquet(path).coalesce(parts)
      .write.mode(SaveMode.Overwrite).parquet(tmp.getPath)
    val old = new java.io.File(path + "__compact_old")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    if (old.exists()) rm(old)
    require(dir.renameTo(old),
      s"compaction swap failed for $path; original left in place, rewrite at ${tmp.getPath}")
    if (!tmp.renameTo(dir)) {
      val rolledBack = old.renameTo(dir) // try to restore the original
      throw new IllegalStateException(
        s"compaction swap-in failed for $path; original " +
          (if (rolledBack) "restored" else s"at ${old.getPath}") +
          s", rewrite at ${tmp.getPath}")
    }
    rm(old)
    (before.length, parquetFiles(dir).length)
  }

  /** Retention/vacuum for hive-partitioned layouts: drop partitions
    * whose VALUE sorts strictly below `cutoff` (ingest-day / month
    * layouts — exactly the values Hive-style dirs encode as strings, so
    * lexicographic compare on zero-padded dates is chronological).
    * Directory-level deletes only: no file is ever opened, the cost is
    * one listing — the operation a 100 TB day-partitioned destination
    * runs nightly. Values are unescaped through Spark's own partition
    *-path rules before comparing (a space-bearing value compares as
    * itself, not its escaped form). Returns the dropped values.
    */
  def expirePartitions(spark: org.apache.spark.sql.SparkSession, path: String,
                       partCol: String, cutoff: String): Seq[String] = {
    val root = new java.io.File(path)
    require(root.isDirectory, s"not a directory: $path")
    val prefix = s"$partCol="
    val parts = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(prefix))
    require(parts.nonEmpty, s"$path has no $prefix partition directories")
    val dropped = parts.flatMap { d =>
      val value = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .unescapePathName(d.getName.stripPrefix(prefix))
      if (value < cutoff) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(d)
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
  def compactPartitioned(spark: org.apache.spark.sql.SparkSession, path: String,
                         targetBytes: Long = 128L << 20,
                         maxFiles: Int = 4): (Int, Int, Int) = {
    val root = new java.io.File(path)
    require(root.isDirectory, s"not a directory: $path")
    def leaves(d: java.io.File): Seq[java.io.File] = {
      val subs = Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.contains("="))
      if (subs.isEmpty) Seq(d) else subs.toSeq.flatMap(leaves)
    }
    val parts = leaves(root).filter(_ != root)
    require(parts.nonEmpty, s"$path has no partition directories; use compact")
    var done = 0; var before = 0; var after = 0
    parts.foreach { p =>
      val nFiles = Option(p.listFiles()).getOrElse(Array.empty)
        .count(f => f.isFile && f.getName.endsWith(".parquet"))
      if (nFiles > maxFiles) {
        val (b, a) = compact(spark, p.getPath, targetBytes)
        done += 1; before += b; after += a
      }
    }
    (done, before, after)
  }
}
