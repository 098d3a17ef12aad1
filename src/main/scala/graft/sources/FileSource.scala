package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** File-format ingestion with corrupt-row quarantine.
  *
  * The reference family ships file-based providers next to the SQL one,
  * and the provider contract is "bad rows must not kill the job, and must
  * not vanish either" (SkipFailingRows, EcomProvider.cs:247 — the same
  * semantics Quarantine.split gives rule failures).
  *
  * Spark-native shape: read the file as TEXT and parse with
  * `from_csv`/`from_json` carrying a corrupt-record column. Parsing a
  * string column is whole-stage-codegen'd exactly like the raw-file
  * reader's, but sidesteps Spark's raw-file restriction (filtering on the
  * corrupt column of an un-cached PERMISSIVE file read throws
  * `queryFromRawFilesIncludeCorruptRecordColumnError`; the documented
  * workaround is `cache()`, which is a memory cliff at corpus scale).
  * Good and quarantine are two scans of the source, no cache.
  *
  * Scale notes:
  *  - The schema is REQUIRED, not inferred: inference is a full extra
  *    pass over 100 TB and non-deterministic under sampling. Pin it.
  *  - The quarantine frame keeps every parseable column as context plus
  *    `raw_record`, the verbatim line.
  *  - CSV `header=true` drops every line equal to the constructed header
  *    (schema names joined by the delimiter) — a data row identical to
  *    the header is indistinguishable from one, and header lines can
  *    appear mid-stream when many files concatenate. Pass
  *    `headerPerFile = true` to drop at most ONE header-equal line per
  *    input file instead (`input_file_name` + per-file rank): data rows
  *    equal to the header then survive. That mode assumes every file
  *    actually carries a header (a headerless file whose data contains a
  *    header-lookalike loses that one row — the two cases are
  *    byte-identical, no reader can split them) and costs one shuffle on
  *    the file name, which the default scan-only filter avoids.
  */
object FileSource {

  private val Corrupt = "__corrupt_record"

  private def splitParsed(lines: DataFrame, schema: StructType,
                          parse: Column => Column): (DataFrame, DataFrame) = {
    val parsed = lines.select(col("value"), parse(col("value")).as("p"))
    val fields = schema.fieldNames.map(f => col(s"p.$f").as(f))
    (parsed.filter(col(s"p.$Corrupt").isNull).select(fields.toSeq: _*),
      parsed.filter(col(s"p.$Corrupt").isNotNull)
        .select(fields.toSeq :+ col("value").as("raw_record"): _*))
  }

  private def withCorrupt(schema: StructType): StructType = {
    require(!schema.fieldNames.contains(Corrupt), s"$Corrupt is reserved")
    schema.add(Corrupt, StringType)
  }

  /** (good, quarantine) from delimited text. `options` passes through to
    * the CSV parser (`sep`, `quote`, `timestampFormat`, ...).
    */
  def csvWithQuarantine(spark: SparkSession, path: String, schema: StructType,
                        header: Boolean = true,
                        options: Map[String, String] = Map.empty,
                        headerPerFile: Boolean = false)
      : (DataFrame, DataFrame) = {
    val opts = options ++ Map(
      "mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> Corrupt)
    val full = withCorrupt(schema)
    val headerLine = schema.fieldNames.mkString(
      options.getOrElse("sep", options.getOrElse("delimiter", ",")))
    val lines = spark.read.text(path)
    val data =
      if (header && headerPerFile) {
        // one header-equal line dropped PER FILE: header-equal lines are
        // byte-identical, so ranking them arbitrarily within their file
        // and dropping rank 1 removes exactly the file's header while
        // sparing data rows that merely look like it
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(input_file_name(), col("value") === headerLine)
          .orderBy(col("value"))
        lines.withColumn("__hdr_rn",
            when(col("value") === headerLine, row_number().over(w)).otherwise(0))
          .filter(col("__hdr_rn") =!= 1)
          .drop("__hdr_rn")
      }
      else if (header) lines.filter(col("value") =!= headerLine)
      else lines
    splitParsed(data, schema, v => from_csv(v, full, opts))
  }

  /** (good, quarantine) from newline-delimited JSON. */
  def jsonWithQuarantine(spark: SparkSession, path: String, schema: StructType,
                         options: Map[String, String] = Map.empty)
      : (DataFrame, DataFrame) = {
    val opts = options ++ Map(
      "mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> Corrupt)
    splitParsed(spark.read.text(path), schema,
      v => from_json(v, withCorrupt(schema), opts))
  }
}
