package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

/** Serializable job settings + schema round-trip.
  *
  * The reference serializes its provider settings to XML inside the job
  * file (`EcomProvider.cs:772` Serialize / `:481` constructor-from-node)
  * and snapshots the destination schema so a later run can detect and
  * undo source-schema drift (`GetOriginalDestinationSchema` :293-430,
  * `OverwriteSourceSchemaToOriginal` :459). Spark-native equivalent: a
  * JSON-round-trippable [[JobConfig]] that lowers to
  * [[ImportJob.TableSpec]]s, plus a schema snapshot (Spark's own
  * `StructType.json`), a drift report, and a conform-to-original
  * projection.
  *
  * Only the declarative subset is serialized: `rowRules` / `post` hooks
  * are code, not configuration (the reference's equivalents live in the
  * provider assembly, not the settings XML either).
  */
/** Declarative form of [[ImportJob.DriftCheck]] — drift gates are
  * configuration, not code, so they serialize with the job (the
  * reference keeps its per-table validation switches in the settings
  * XML the same way).
  */
case class DriftCheckConfig(
    column: String,
    boundaries: Seq[Double],
    alarmPpm: Long = 250000L,
    failOnAlarm: Boolean = false) {
  def toCheck: ImportJob.DriftCheck =
    ImportJob.DriftCheck(column, boundaries, alarmPpm, failOnAlarm)
}

/** Declarative form of [[ImportJob.FkGate]] — the strict-FK switch is
  * configuration like the reference's CreateMissingGroups toggle (a
  * settings-XML field deciding whether unresolved groups create or
  * FAIL, EcomProvider.cs:1004), so it serializes with the job.
  * `policy` is "fail" (abort with the violating rows) or "quarantine"
  * (divert to `<table>__quarantined`).
  */
case class FkGateConfig(
    columns: Seq[String],
    policy: String = "fail",
    maxLogRows: Int = 20) {
  def toGate: ImportJob.FkGate = ImportJob.FkGate(
    columns,
    policy match {
      case "fail" => ImportJob.FkFail
      case "quarantine" => ImportJob.FkQuarantine
      case other => throw new IllegalArgumentException(
        s"unknown fk policy: $other (want fail|quarantine)")
    },
    maxLogRows)
}

/** Declarative form of [[ImportJob.FkLadder]]. `rungs`/`take` are
  * (from, to) pairs serialized as 2-element arrays.
  */
case class FkLadderConfig(
    dim: String,
    rungs: Seq[Seq[String]],
    take: Seq[String]) {
  def toLadder: ImportJob.FkLadder = {
    require(rungs.forall(_.length == 2) && take.length == 2,
      "FkLadderConfig rungs/take must be [from, to] pairs")
    ImportJob.FkLadder(dim, rungs.map(r => r(0) -> r(1)), take(0) -> take(1))
  }
}

/** Declarative form of [[ImportJob.ParentScope]] — the reference's
  * `PartialUpdate` is a settings-XML switch (EcomProvider.cs:264), so
  * it serializes with the job.
  */
case class ParentScopeConfig(
    parentTable: String,
    childCols: Seq[String],
    parentKeys: Seq[String]) {
  def toScope: ImportJob.ParentScope =
    ImportJob.ParentScope(parentTable, childCols, parentKeys)
}

case class TableConfig(
    table: String,
    keys: Seq[String],
    mode: String = "upsert",
    dedupKeys: Seq[String] = Nil,
    dedupOrder: Seq[String] = Nil,
    deleteExcess: Boolean = false,
    deleteExcessScope: Seq[String] = Nil,
    flagMissing: Option[String] = None,
    constants: Map[String, String] = Map.empty,
    expectSchema: Option[String] = None, // StructType.json snapshot
    driftChecks: Seq[DriftCheckConfig] = Nil,
    fkGate: Option[FkGateConfig] = None,
    // several mappings may target one destination table (the reference's
    // multi-language feeds, EcomProvider.cs:1095) — sourceName names the
    // mapping's own source when it differs from the table
    sourceName: Option[String] = None,
    // declarative lookup ladders + the reference's two mode switches
    // (UseStrictPrimaryKeyMatching EcomProvider.cs:180 — settings-XML
    // field :604/:720 — and PartialUpdate :264), all configuration
    resolve: Seq[FkLadderConfig] = Nil,
    strictKeyMatching: Boolean = true,
    partialUpdate: Option[ParentScopeConfig] = None,
    // IgnoreEmptyCategoryFieldValues (EcomProvider.cs:257) — a
    // settings-XML switch in the reference (:670/:729), so it
    // serializes with the job: rows whose value in any listed column
    // is null/empty are not written
    ignoreEmptyIn: Seq[String] = Nil) {

  def toSpec: ImportJob.TableSpec = ImportJob.TableSpec(
    table = table,
    keys = keys,
    mode = mode match {
      case "upsert" => ImportJob.Upsert
      case "updateOnly" => ImportJob.UpdateOnly
      case "insertOnly" => ImportJob.InsertOnly
      case "deleteIncoming" => ImportJob.DeleteIncoming
      case other => throw new IllegalArgumentException(s"unknown mode: $other")
    },
    dedupKeys = dedupKeys,
    dedupOrder = dedupOrder,
    deleteExcess = deleteExcess,
    deleteExcessScope = deleteExcessScope,
    flagMissing = flagMissing,
    expectSchema = expectSchema.map(DataType.fromJson(_).asInstanceOf[StructType]),
    constants = constants,
    driftChecks = driftChecks.map(_.toCheck),
    fkGate = fkGate.map(_.toGate),
    sourceName = sourceName,
    resolve = resolve.map(_.toLadder),
    strictKeyMatching = strictKeyMatching,
    partialUpdate = partialUpdate.map(_.toScope),
    ignoreEmptyIn = ignoreEmptyIn)
}

/** @param removeMissing defer every table's delete-excess until the whole
  *                      job has staged, then anti-join each table against
  *                      the union of ALL its mappings' batches, children
  *                      before parents (RemoveMissingRowsAcrossAllTables,
  *                      EcomProvider.cs:1090) — a job-level switch in the
  *                      reference's settings XML, so it serializes here
  */
case class JobConfig(tables: Seq[TableConfig], removeMissing: Boolean = false)

object JobConfig {

  private implicit val formats: Formats = DefaultFormats

  def toJson(cfg: JobConfig): String = Serialization.writePretty(cfg)

  def fromJson(json: String): JobConfig = Serialization.read[JobConfig](json)

  def toSpecs(cfg: JobConfig): Seq[ImportJob.TableSpec] = cfg.tables.map(_.toSpec)

  /** Schema drift between a snapshotted original and the current frame:
    * what a re-run would see changed (the check the reference runs before
    * offering OverwriteSourceSchemaToOriginal). Names compared
    * case-insensitively like the rest of the engine.
    */
  case class SchemaDrift(added: Seq[String], removed: Seq[String],
                         retyped: Seq[(String, String, String)]) {
    def isEmpty: Boolean = added.isEmpty && removed.isEmpty && retyped.isEmpty
    def describe: String =
      (added.map(c => s"added '$c'") ++
        removed.map(c => s"removed '$c'") ++
        retyped.map { case (c, o, n) => s"'$c' retyped $o -> $n" }).mkString("; ")
  }

  def drift(original: StructType, current: StructType): SchemaDrift = {
    val orig = original.fields.map(f => f.name.toLowerCase -> f).toMap
    val cur = current.fields.map(f => f.name.toLowerCase -> f).toMap
    SchemaDrift(
      added = current.fields.toSeq.collect {
        case f if !orig.contains(f.name.toLowerCase) => f.name },
      removed = original.fields.toSeq.collect {
        case f if !cur.contains(f.name.toLowerCase) => f.name },
      retyped = original.fields.toSeq.flatMap { f =>
        cur.get(f.name.toLowerCase).collect {
          case c if c.dataType != f.dataType =>
            (f.name, f.dataType.simpleString, c.dataType.simpleString)
        }
      })
  }

  /** Conform a drifted frame back to the original schema
    * (OverwriteSourceSchemaToOriginal, EcomProvider.cs:459): original
    * column order, original types (cast), dropped columns restored as
    * typed nulls, added columns discarded.
    */
  def overwriteToOriginal(df: DataFrame, original: StructType): DataFrame = {
    val present = df.columns.map(_.toLowerCase).toSet
    df.select(original.fields.toSeq.map { f =>
      if (present.contains(f.name.toLowerCase)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }
}
