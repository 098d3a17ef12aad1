package graft.sources

import java.sql.{Connection, DriverManager}
import java.util.Properties
import org.apache.spark.sql.{DataFrame, SaveMode}

/** Per-database SQL generation for the staging+merge protocol: the
  * pieces that legitimately differ between targets — identifier
  * quoting, catalog folding of UNQUOTED identifiers (Derby/Oracle
  * upper, Postgres lower, SQL Server as-written), the create-like
  * statement, and the MERGE promotion syntax. Everything else
  * (parallel staging load, atomicity, drop) is dialect-independent.
  *
  * Environment note: only Derby ships in this environment, so
  * [[JdbcDialects.derby]] is integration-tested end-to-end while the
  * lowercase-folding and SQL Server dialects are exercised at the
  * SQL-generation + folding level (JdbcSinkSpec) — the statements they
  * emit are the documented syntax of their targets.
  */
trait JdbcSinkDialect extends Serializable {
  def name: String
  /** Catalog folding applied to unquoted identifiers. */
  def fold(id: String): String
  def quote(id: String): String = "\"" + id + "\""
  /** Create `table` with `stage`'s structure and no rows. */
  def createLikeSql(table: String, stage: String): String =
    s"CREATE TABLE $table AS SELECT * FROM $stage WITH NO DATA"
  /** UPDATE-matched + INSERT-unmatched promotion (the reference's
    * MoveDataToMainTable, EcomDestinationWriter.cs:3220).
    */
  def mergeSql(table: String, stage: String, cols: Seq[String],
               keys: Seq[String]): String = {
    val on = keys.map(k => s"t.${quote(k)} = s.${quote(k)}").mkString(" AND ")
    val nonKeys = cols.filterNot(keys.contains)
    val matched =
      if (nonKeys.isEmpty) ""
      else "WHEN MATCHED THEN UPDATE SET " +
        nonKeys.map(c => s"${quote(c)} = s.${quote(c)}").mkString(", ") + " "
    s"MERGE INTO $table t USING $stage s ON ($on) " +
      matched +
      s"WHEN NOT MATCHED THEN INSERT (${cols.map(quote).mkString(", ")}) " +
      s"VALUES (${cols.map(c => s"s.${quote(c)}").mkString(", ")})"
  }
}

object JdbcDialects {
  /** Derby (and Oracle-style uppercase folding) — the integration-tested
    * dialect in this environment.
    */
  object derby extends JdbcSinkDialect {
    val name = "derby"
    def fold(id: String): String = id.toUpperCase
  }

  /** Postgres-style: unquoted identifiers fold to LOWERCASE — the
    * folding that breaks uppercase-assuming probes on day one. ANSI
    * MERGE (PostgreSQL 15+) with the shared syntax.
    */
  object postgresStyle extends JdbcSinkDialect {
    val name = "postgres"
    def fold(id: String): String = id.toLowerCase
    override def createLikeSql(table: String, stage: String): String =
      s"CREATE TABLE $table (LIKE $stage)"
  }

  /** SQL Server-style — the reference's actual target
    * (EcomDestinationWriter.cs:234 temp tables, :3165 MERGE): bracket
    * quoting, as-written folding, SELECT-INTO create, MERGE requires a
    * terminating semicolon.
    */
  object sqlServerStyle extends JdbcSinkDialect {
    val name = "sqlserver"
    def fold(id: String): String = id
    override def quote(id: String): String = s"[$id]"
    override def createLikeSql(table: String, stage: String): String =
      s"SELECT * INTO $table FROM $stage WHERE 1 = 0"
    override def mergeSql(table: String, stage: String, cols: Seq[String],
                          keys: Seq[String]): String =
      super.mergeSql(table, stage, cols, keys) + ";"
  }

  /** Pick a dialect from the JDBC URL; Derby semantics are the ANSI
    * fallback (uppercase folding + standard MERGE).
    */
  def forUrl(url: String): JdbcSinkDialect =
    if (url.startsWith("jdbc:postgresql")) postgresStyle
    else if (url.startsWith("jdbc:sqlserver")) sqlServerStyle
    else derby
}

/** JDBC destination with the reference's staging-table merge protocol.
  *
  * The reference writer buffers incoming rows into temp tables
  * (`CreateTempTables`, EcomDestinationWriter.cs:234) and then moves them
  * into the live tables as UPDATE-matched + INSERT-unmatched
  * (`MoveDataToMainTables` :3165, `MoveDataToMainTable` :3220). Same
  * protocol here: Spark bulk-loads a staging table over N parallel JDBC
  * connections (the distributed part — executors never touch the live
  * table), then ONE `MERGE` statement promotes the stage
  * atomically (the database-local part — set-based, transactional, no
  * row-at-a-time driver loop). Dialect-specific SQL comes from
  * [[JdbcSinkDialect]], auto-picked from the URL.
  *
  * Scale: the Spark-side write is `numPartitions` concurrent inserts of
  * `batchSize`-row batches; the merge cost is the database's problem and
  * is exactly what the reference pays. All identifiers from `df.columns`
  * are quoted per dialect, matching how Spark's JDBC writer creates the
  * staging columns.
  */
object JdbcSink {

  private def withConnection[A](url: String, props: Map[String, String])(f: Connection => A): A = {
    val p = new Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    val conn = DriverManager.getConnection(url, p)
    try f(conn) finally conn.close()
  }

  /** Probe for `table` under the dialect's folding first, then the other
    * foldings (a pre-existing table may have been created quoted).
    */
  private[graft] def tableExists(conn: Connection, table: String,
                                 dialect: JdbcSinkDialect): Boolean = {
    val md = conn.getMetaData
    Seq(dialect.fold(table), table, table.toUpperCase, table.toLowerCase)
      .distinct.exists { t =>
        val rs = md.getTables(null, null, t, null)
        try rs.next() finally rs.close()
      }
  }

  /** The COMPLETE database-side statement sequence of one staged sync,
    * in execution order: first load = create-like + promote-insert +
    * stage drop; subsequent loads = MERGE + stage drop. This is the
    * single source of truth — [[upsert]] executes exactly this list, and
    * JdbcDialectGoldenSpec pins the rendered text per dialect verbatim,
    * so every dialect's protocol is snapshot-verified even where the
    * target engine itself is not installable in this environment.
    */
  private[graft] def protocolSql(d: JdbcSinkDialect, table: String,
                                 stage: String, cols: Seq[String],
                                 keys: Seq[String],
                                 firstLoad: Boolean): Seq[String] = {
    val body =
      if (firstLoad) Seq(
        d.createLikeSql(table, stage),
        s"INSERT INTO $table (${cols.map(d.quote).mkString(", ")}) " +
          s"SELECT ${cols.map(d.quote).mkString(", ")} FROM $stage")
      else Seq(d.mergeSql(table, stage, cols, keys))
    body :+ s"DROP TABLE $stage"
  }

  /** Stage + merge `df` into `table` on `keys`: matched rows get the
    * incoming values, unmatched rows are inserted. Creates the table on
    * first load. The staging table lives only for the call.
    */
  def upsert(df: DataFrame, url: String, table: String, keys: Seq[String],
             numPartitions: Int = 8, batchSize: Int = 10000,
             maxVarchar: Int = 1024,
             props: Map[String, String] = Map.empty,
             dialect: JdbcSinkDialect = null): Unit = {
    require(keys.nonEmpty, "jdbc upsert needs key columns")
    val d = Option(dialect).getOrElse(JdbcDialects.forUrl(url))
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
      try protocolSql(d, table, stage, cols, keys,
          firstLoad = !tableExists(conn, table, d))
        .foreach(st.executeUpdate)
      finally st.close()
    }
  }
}
