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
}
