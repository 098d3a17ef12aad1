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

  /** Load one star-schema table. NOTE: the `events` table's `ts` column
    * is TIMESTAMP(NANOS) parquet, readable only when
    * `spark.sql.legacy.parquet.nanosAsLong=true` — `GraftSession.builder`
    * sets it at session build (it is a static conf, not settable
    * per-call on a live session). An externally-built session without it
    * fails in the vectorized reader, so fail fast here with the cause.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(All.contains(name), s"unknown table: $name")
    if (name == "events")
      require(spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
        "events.parquet stores TIMESTAMP(NANOS): build the session with " +
          "graft.GraftSession.builder (sets spark.sql.legacy.parquet.nanosAsLong=true, " +
          "a static conf that cannot be set on a live session)")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
