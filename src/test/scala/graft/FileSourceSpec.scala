package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.FileSource

class FileSourceSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("amount", DoubleType)))

  private def write(suffix: String, lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft_filesrc").toString
    Files.write(Paths.get(dir, s"data.$suffix"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir
  }

  test("csvWithQuarantine: clean rows pass, malformed rows carry raw text") {
    val dir = write("csv", Seq(
      "id,name,amount",
      "1,alpha,10.5",
      "2,beta,not_a_number", // bad double
      "3,gamma,30.0",
      "4,delta"))            // missing column
    val (good, bad) = FileSource.csvWithQuarantine(spark, dir, schema, header = true)
    assert(good.schema.fieldNames.toSeq === Seq("id", "name", "amount"))
    assert(good.select("id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted === Array(1L, 3L))
    val raw = bad.select("raw_record").collect().map(_.getString(0)).sorted
    assert(raw === Array("2,beta,not_a_number", "4,delta"))
    // quarantine keeps the parseable columns as context
    assert(bad.filter(col("name") === "beta").count() === 1)
  }

  test("jsonWithQuarantine: bad syntax and wrong types quarantined") {
    val dir = write("json", Seq(
      """{"id": 1, "name": "alpha", "amount": 10.5}""",
      """{"id": "x", "name": "bad-type", "amount": 1.0}""",
      """not json at all""",
      """{"id": 3, "name": "gamma", "amount": 30.0}"""))
    val (good, bad) = FileSource.jsonWithQuarantine(spark, dir, schema)
    assert(good.count() === 2)
    assert(bad.count() === 2)
    assert(bad.filter(col("raw_record").contains("not json")).count() === 1)
  }

  test("headerPerFile: a data row equal to the header survives, one header dropped per file") {
    // schema whose header line is also a plausible data row
    val s = StructType(Seq(StructField("1", LongType), StructField("x", StringType)))
    val dir = Files.createTempDirectory("graft_filesrc_hdr").toString
    // file A: header + a DATA row byte-identical to the header + normal rows
    Files.write(Paths.get(dir, "a.csv"),
      Seq("1,x", "1,x", "2,y").mkString("\n").getBytes("UTF-8"))
    // file B: header + normal row (headers appear mid-stream when files
    // concatenate — per-file mode must drop each file's own)
    Files.write(Paths.get(dir, "b.csv"),
      Seq("1,x", "3,z").mkString("\n").getBytes("UTF-8"))
    // default mode loses the lookalike row: 3 data rows survive of 4
    val (goodAll, _) = FileSource.csvWithQuarantine(spark, dir, s, header = true)
    assert(goodAll.count() === 2) // "2,y" and "3,z" only
    // per-file mode: exactly one header-equal line dropped per file
    val (good, bad) = FileSource.csvWithQuarantine(spark, dir, s,
      header = true, headerPerFile = true)
    assert(bad.count() === 0)
    assert(good.orderBy("1").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq === Seq((1L, "x"), (2L, "y"), (3L, "z")))
  }

  test("schema collision with the corrupt column is rejected") {
    val s = StructType(Seq(StructField("__corrupt_record", StringType)))
    intercept[IllegalArgumentException] {
      FileSource.csvWithQuarantine(spark, "/tmp/nope", s, header = false)
    }
  }
}
