package graft

import java.sql.DriverManager
import graft.sources.{JdbcSink, JdbcSource}

/** Staged upsert round-trip against embedded Derby — the merge protocol
  * the reference runs against SQL Server (temp table → MoveDataToMainTable).
  */
class JdbcSinkSpec extends SparkSuite {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftsink;create=true"

  test("upsert creates on first load, then updates matched and inserts new") {
    val seed = Seq((1L, "a", 10), (2L, "b", 20)).toDF("id", "name", "qty")
    JdbcSink.upsert(seed, url, "DEST", Seq("id"), numPartitions = 2)

    val after1 = JdbcSource.load(spark, url, "DEST")
      .as[(Long, String, Int)].collect().sortBy(_._1)
    assert(after1 === Array((1L, "a", 10), (2L, "b", 20)))

    // second batch: id=2 updated, id=3 inserted, id=1 untouched
    val batch = Seq((2L, "B2", 99), (3L, "c", 30)).toDF("id", "name", "qty")
    JdbcSink.upsert(batch, url, "DEST", Seq("id"), numPartitions = 2)

    val after2 = JdbcSource.load(spark, url, "DEST")
      .as[(Long, String, Int)].collect().sortBy(_._1)
    assert(after2 === Array((1L, "a", 10), (2L, "B2", 99), (3L, "c", 30)))

    // the staging table is transient — dropped after the merge
    val conn = DriverManager.getConnection(url)
    val rs = conn.getMetaData.getTables(null, null, "DEST_STAGE", null)
    try assert(!rs.next()) finally { rs.close(); conn.close() }
  }

  test("upsert merges on composite keys") {
    val seed = Seq((1L, "en", "one"), (1L, "fr", "un")).toDF("id", "lang", "v")
    JdbcSink.upsert(seed, url, "DEST2", Seq("id", "lang"))
    val batch = Seq((1L, "fr", "UN!"), (2L, "en", "two")).toDF("id", "lang", "v")
    JdbcSink.upsert(batch, url, "DEST2", Seq("id", "lang"))
    val out = JdbcSource.load(spark, url, "DEST2")
      .as[(Long, String, String)].collect().sortBy(r => (r._1, r._2))
    assert(out === Array((1L, "en", "one"), (1L, "fr", "UN!"), (2L, "en", "two")))
  }

  // ── dialect matrix: only Derby is installable here (verified: no H2/
  // HSQLDB jars in the image), so the other dialects are pinned at the
  // SQL-generation + folding level — the layer where lowercase-folding
  // and bracket-quoting bugs live ──

  import graft.sources.JdbcDialects

  test("dialects fold identifiers per their catalogs and pick by URL") {
    assert(JdbcDialects.derby.fold("Dest") === "DEST")
    assert(JdbcDialects.postgresStyle.fold("Dest") === "dest")
    assert(JdbcDialects.sqlServerStyle.fold("Dest") === "Dest")
    assert(JdbcDialects.forUrl("jdbc:postgresql://h/db") === JdbcDialects.postgresStyle)
    assert(JdbcDialects.forUrl("jdbc:sqlserver://h;db") === JdbcDialects.sqlServerStyle)
    assert(JdbcDialects.forUrl(url) === JdbcDialects.derby)
  }

  test("tableExists probes the dialect's folding (lowercase catalogs included)") {
    // Derby folds unquoted CREATEs to UPPER; a created-lowercase-QUOTED
    // table simulates what a lowercase-folding catalog stores, and the
    // probe must still find it when asked for the mixed-case name
    val conn = DriverManager.getConnection(url)
    try {
      conn.createStatement().executeUpdate("CREATE TABLE \"folded_probe\" (i INT)")
      assert(JdbcSink.tableExists(conn, "folded_probe", JdbcDialects.postgresStyle))
      // a mixed-case name still resolves through the cross-folding fallback
      assert(JdbcSink.tableExists(conn, "Folded_Probe", JdbcDialects.derby))
      assert(!JdbcSink.tableExists(conn, "no_such_table", JdbcDialects.derby))
    } finally conn.close()
  }

  test("postgres-style dialect emits LIKE-create and ANSI MERGE with lowercase-safe quoting") {
    val d = JdbcDialects.postgresStyle
    assert(d.createLikeSql("dest", "dest_STAGE") === "CREATE TABLE dest (LIKE dest_STAGE)")
    val m = d.mergeSql("dest", "stage", Seq("Id", "Name"), Seq("Id"))
    assert(m === """MERGE INTO dest t USING stage s ON (t."Id" = s."Id") """ +
      """WHEN MATCHED THEN UPDATE SET "Name" = s."Name" """ +
      """WHEN NOT MATCHED THEN INSERT ("Id", "Name") VALUES (s."Id", s."Name")""")
  }

  test("sqlserver-style dialect (the reference's target) emits bracket quoting and SELECT INTO") {
    val d = JdbcDialects.sqlServerStyle
    assert(d.createLikeSql("Dest", "Dest_STAGE") ===
      "SELECT * INTO Dest FROM Dest_STAGE WHERE 1 = 0")
    val m = d.mergeSql("Dest", "Stage", Seq("Id", "Qty"), Seq("Id"))
    assert(m === "MERGE INTO Dest t USING Stage s ON (t.[Id] = s.[Id]) " +
      "WHEN MATCHED THEN UPDATE SET [Qty] = s.[Qty] " +
      "WHEN NOT MATCHED THEN INSERT ([Id], [Qty]) VALUES (s.[Id], s.[Qty]);")
  }

  test("explicit dialect override runs the full protocol (derby semantics)") {
    val seed = Seq((1L, 5)).toDF("id", "n")
    JdbcSink.upsert(seed, url, "DEST3", Seq("id"), dialect = JdbcDialects.derby)
    JdbcSink.upsert(Seq((1L, 6), (2L, 7)).toDF("id", "n"), url, "DEST3", Seq("id"),
      dialect = JdbcDialects.derby)
    val out = JdbcSource.load(spark, url, "DEST3")
      .as[(Long, Int)].collect().sortBy(_._1)
    assert(out === Array((1L, 6), (2L, 7)))
  }
}
