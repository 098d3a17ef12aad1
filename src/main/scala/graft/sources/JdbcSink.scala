package graft.sources

import java.sql.{Connection, DriverManager}
import java.util.Properties
import org.apache.spark.sql.{DataFrame, SaveMode}

/** JDBC destination with the reference's staging-table merge protocol.
  *
  * The reference writer buffers incoming rows into temp tables
  * (`CreateTempTables`, EcomDestinationWriter.cs:234) and then moves them
  * into the live tables as UPDATE-matched + INSERT-unmatched
  * (`MoveDataToMainTables` :3165, `MoveDataToMainTable` :3220). Same
  * protocol here: Spark bulk-loads a staging table over N parallel JDBC
  * connections (the distributed part — executors never touch the live
  * table), then ONE ANSI `MERGE` statement promotes the stage
  * atomically (the database-local part — set-based, transactional, no
  * row-at-a-time driver loop).
  *
  * Scale: the Spark-side write is `numPartitions` concurrent inserts of
  * `batchSize`-row batches; the merge cost is the database's problem and
  * is exactly what the reference pays. All identifiers from `df.columns`
  * are double-quoted, matching how Spark's JDBC writer creates the
  * staging columns.
  */
object JdbcSink {

  private def q(name: String): String = "\"" + name + "\""

  private def withConnection[A](url: String, props: Map[String, String])(f: Connection => A): A = {
    val p = new Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    val conn = DriverManager.getConnection(url, p)
    try f(conn) finally conn.close()
  }

  private def tableExists(conn: Connection, table: String): Boolean = {
    // unquoted identifiers fold per-database (Derby/Oracle upper,
    // Postgres lower) — probe each folding rather than assuming one
    val md = conn.getMetaData
    Seq(table, table.toUpperCase, table.toLowerCase).distinct.exists { t =>
      val rs = md.getTables(null, null, t, null)
      try rs.next() finally rs.close()
    }
  }

  /** Stage + merge `df` into `table` on `keys`: matched rows get the
    * incoming values, unmatched rows are inserted. Creates the table on
    * first load. The staging table lives only for the call.
    */
  def upsert(df: DataFrame, url: String, table: String, keys: Seq[String],
             numPartitions: Int = 8, batchSize: Int = 10000,
             maxVarchar: Int = 1024,
             props: Map[String, String] = Map.empty): Unit = {
    require(keys.nonEmpty, "jdbc upsert needs key columns")
    val cols = df.columns.toSeq
    require(keys.forall(cols.contains), s"keys ${keys.diff(cols)} not in frame")
    val stage = s"${table}_STAGE"

    // string columns default to LOB types on some dialects (Derby: CLOB),
    // which are not comparable in a MERGE ON clause — declare them VARCHAR
    val stringCols = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
      .map(f => s"${f.name} VARCHAR($maxVarchar)")
    val writer0 = df.repartition(numPartitions).write
      .mode(SaveMode.Overwrite)
      .format("jdbc")
      .option("url", url)
      .option("dbtable", stage)
      .option("batchsize", batchSize.toString)
    val writer =
      if (stringCols.isEmpty || props.contains("createTableColumnTypes")) writer0
      else writer0.option("createTableColumnTypes", stringCols.mkString(", "))
    props.foldLeft(writer) { case (w, (k, v)) => w.option(k, v) }.save()

    withConnection(url, props) { conn =>
      val st = conn.createStatement()
      try {
        if (!tableExists(conn, table)) {
          st.executeUpdate(
            s"CREATE TABLE $table AS SELECT * FROM $stage WITH NO DATA")
          st.executeUpdate(
            s"INSERT INTO $table (${cols.map(q).mkString(", ")}) " +
              s"SELECT ${cols.map(q).mkString(", ")} FROM $stage")
        } else {
          val on = keys.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
          val nonKeys = cols.filterNot(keys.contains)
          val matched =
            if (nonKeys.isEmpty) ""
            else "WHEN MATCHED THEN UPDATE SET " +
              nonKeys.map(c => s"${q(c)} = s.${q(c)}").mkString(", ") + " "
          st.executeUpdate(
            s"MERGE INTO $table t USING $stage s ON ($on) " +
              matched +
              s"WHEN NOT MATCHED THEN INSERT (${cols.map(q).mkString(", ")}) " +
              s"VALUES (${cols.map(c => s"s.${q(c)}").mkString(", ")})")
        }
        st.executeUpdate(s"DROP TABLE $stage")
      } finally st.close()
    }
  }
}
