package graft

import java.sql.DriverManager
import org.apache.spark.sql.functions._
import graft.sources.JdbcSource

/** JDBC source against an embedded Derby database (in /opt/spark/jars —
  * the standard Spark-distribution test database).
  */
class JdbcSourceSpec extends SparkSuite {

  private lazy val url = {
    val u = "jdbc:derby:memory:grafttest;create=true"
    val conn = DriverManager.getConnection(u)
    val st = conn.createStatement()
    st.execute("CREATE TABLE items (id BIGINT NOT NULL, name VARCHAR(32), qty INT)")
    (1 to 100).foreach(i =>
      st.execute(s"INSERT INTO items VALUES ($i, 'item$i', ${i % 10})"))
    st.close(); conn.close()
    u
  }

  test("load reads the table through JDBC") {
    import spark.implicits._
    val df = JdbcSource.load(spark, url, "items")
    assert(df.count() === 100)
    assert(df.columns.map(_.toLowerCase).toSeq === Seq("id", "name", "qty"))
    val row = df.filter(col("ID") === 7).select("NAME").as[String].head()
    assert(row === "item7")
  }

  test("filters and projection push down into the remote query") {
    val df = JdbcSource.load(spark, url, "items")
      .filter(col("QTY") > 5)
      .select("ID", "QTY")
    // the JDBC scan itself must carry the filter + pruned columns
    val scan = df.queryExecution.executedPlan.toString()
    assert(scan.contains("PushedFilters:") && scan.contains("QTY"),
      s"expected pushed filter in:\n$scan")
    assert(!scan.contains("NAME"), s"expected NAME pruned from scan:\n$scan")
    assert(df.count() === 40) // qty in 6..9 → 4 values × 10 rows
  }

  test("loadPartitioned splits the read into parallel range queries") {
    val df = JdbcSource.loadPartitioned(spark, url, "items",
      partCol = "ID", lower = 1L, upper = 101L, numPartitions = 4)
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 100) // range split is exhaustive, no row lost
  }
}
