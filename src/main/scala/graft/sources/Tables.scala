package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Table registry over the driver-generated parquet star schema.
  *
  * Mirrors the reference provider's notion of a fixed schema universe
  * (EcomProvider.cs:293-430 builds its schema from a known table set);
  * here the universe is the testdata star schema. Reads are plain
  * `spark.read.parquet` so Catalyst keeps column pruning and filter
  * pushdown (EcomSourceReader.cs:151 builds SELECT <mapped cols> WHERE
  * <conditionals> — the Spark-native equivalent is just a declarative
  * plan; the optimizer pushes both into the scan).
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(All.contains(name), s"unknown table: $name")
    // events.ts is TIMESTAMP(NANOS) parquet; GraftSession sets
    // spark.sql.legacy.parquet.nanosAsLong once so the nanos column
    // arrives as long — converted to micros timestamp here.
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
