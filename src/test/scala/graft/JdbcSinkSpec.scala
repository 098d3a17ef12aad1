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
}
