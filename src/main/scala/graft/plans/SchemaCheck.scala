package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{DataType, StructType}

/** Incoming-schema validation with actionable errors.
  *
  * The reference validates mappings and destination settings before a job
  * runs (`EcomProvider.ValidateDestinationSettings` EcomProvider.cs:680,
  * `ValidateSourceSettings` :689, and the writer's column checks
  * EcomDestinationWriter.cs:3563 `EnsureMapping`). Spark-native analog:
  * check a DataFrame against an expected StructType up front and fail
  * with the full problem list, instead of dying mid-job on the first
  * AnalysisException.
  */
object SchemaCheck {

  sealed trait Problem { def describe: String }
  case class MissingColumn(name: String, expected: DataType) extends Problem {
    def describe = s"missing column '$name' (expected ${expected.simpleString})"
  }
  case class TypeMismatch(name: String, expected: DataType, actual: DataType) extends Problem {
    def describe = s"column '$name' is ${actual.simpleString}, expected ${expected.simpleString}"
  }
  case class UnexpectedColumn(name: String) extends Problem {
    def describe = s"unexpected column '$name'"
  }

  /** All problems between `df` and `expected` (empty = compatible).
    * Names are case-insensitive like the reference's column matching
    * (EcomDestinationWriter's dictionaries use OrdinalIgnoreCase).
    */
  def problems(df: DataFrame, expected: StructType,
               allowExtra: Boolean = true): Seq[Problem] = {
    val actual = df.schema.fields.map(f => f.name.toLowerCase -> f).toMap
    val expectedNames = expected.fields.map(_.name.toLowerCase).toSet
    val missingOrWrong = expected.fields.toSeq.flatMap { f =>
      actual.get(f.name.toLowerCase) match {
        case None => Some(MissingColumn(f.name, f.dataType))
        case Some(a) if a.dataType != f.dataType =>
          Some(TypeMismatch(f.name, f.dataType, a.dataType))
        case _ => None
      }
    }
    val extra = if (allowExtra) Nil
      else df.schema.fields.toSeq.collect {
        case f if !expectedNames.contains(f.name.toLowerCase) => UnexpectedColumn(f.name)
      }
    missingOrWrong ++ extra
  }

  /** Throw with every problem listed, or return the frame unchanged. */
  def validate(df: DataFrame, expected: StructType, allowExtra: Boolean = true): DataFrame = {
    val ps = problems(df, expected, allowExtra)
    require(ps.isEmpty, s"schema validation failed:\n  ${ps.map(_.describe).mkString("\n  ")}")
    df
  }
}
