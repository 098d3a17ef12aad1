package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC-backed source, completing provider parity with the reference's
  * SQL source reader (EcomSourceReader.cs:151 `LoadReaderFromDatabase`
  * builds `SELECT <mapped cols> FROM <table> WHERE <conditionals>`
  * against SQL Server).
  *
  * Spark-first equivalent: expose the table as a JDBC relation and keep
  * the plan declarative — Catalyst compiles `.select(...)` into the
  * remote SELECT list (column pruning) and `.filter(...)` into the remote
  * WHERE clause (predicate pushdown, on by default for JDBC), so the
  * database ships only the mapped columns and matching rows, exactly like
  * the reference's generated SQL. No query-string building here at all.
  *
  * Scale: a single-connection JDBC read is one partition — a bottleneck
  * the reference shares (one SqlDataReader). [[loadPartitioned]] is the
  * scale path: N executors each read one split (`partCol` range-split by
  * Spark into WHERE clauses), giving parallel extraction from any
  * database that can stand N concurrent cursors.
  */
object JdbcSource {

  /** One-partition read (small dims, dev). */
  def load(spark: SparkSession, url: String, table: String,
           props: Map[String, String] = Map.empty): DataFrame =
    props.foldLeft(
      spark.read.format("jdbc").option("url", url).option("dbtable", table)
    ) { case (r, (k, v)) => r.option(k, v) }.load()

  /** Range-partitioned parallel read: Spark issues `numPartitions`
    * concurrent queries, each scoped by a `partCol` range predicate.
    */
  def loadPartitioned(spark: SparkSession, url: String, table: String,
                      partCol: String, lower: Long, upper: Long,
                      numPartitions: Int,
                      props: Map[String, String] = Map.empty): DataFrame =
    props.foldLeft(
      spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", partCol)
        .option("lowerBound", lower.toString)
        .option("upperBound", upper.toString)
        .option("numPartitions", numPartitions.toString)
    ) { case (r, (k, v)) => r.option(k, v) }.load()
}
