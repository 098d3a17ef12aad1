package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** Load one star-schema table, normalizing `events.ts` to a session-tz
    * TIMESTAMP regardless of how the generator wrote it — the physical
    * encoding has changed across testdata generations and the engine must
    * read every vintage identically:
    *  - TIMESTAMP(NANOS) parquet reads as LongType under
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (a static conf
    *    `GraftSession.builder` sets; it is harmless when unused) →
    *    truncate to micros and rebuild the timestamp;
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) reads as TIMESTAMP_NTZ →
    *    cast to TIMESTAMP (the session is pinned UTC, so wall-clock and
    *    instant agree and `cast(ts as long)` epoch arithmetic — which
    *    Spark forbids on NTZ — works downstream);
    *  - TIMESTAMP(MICROS, adjusted) already reads as TIMESTAMP.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    require(All.contains(name), s"unknown table: $name")
    if (name == "events") df.schema("ts").dataType match {
      case LongType => // nanos-as-long vintage
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    } else df
  }
}
