package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.functions._

/** Fused |A∩B| / |A∪B| over two `array<bigint>` set columns.
  *
  * Exact-Jaccard verification is the inner loop of every LSH near-dup
  * pipeline: each candidate pair computes `size(array_intersect)` AND
  * `size(array_union)` — two hash-set builds plus two result-array
  * materializations per pair, only to read their lengths. This
  * expression returns both counts from ONE sorted-merge pass
  * ([[SketchKernels.overlapCounts]]), packed into a single long
  * (`inter << 32 | union` — counts are array sizes, far below 2³²), and
  * stays inside WholeStageCodegen via the static kernel call. Null
  * input → null, matching the builtin composition on null arrays.
  */
case class SetOverlapCounts(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (t: DataType) => t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"set_overlap requires array<bigint>, got ${left.dataType} / ${right.dataType}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(SketchKernels.overlapCounts(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SketchKernels.overlapCounts($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SetOverlapCounts =
    copy(left = newLeft, right = newRight)
}

object SetOverlap {
  /** Packed (inter << 32 | union) counts — unpack with [[interCount]] /
    * [[unionCount]] (codegen'd bit ops).
    */
  def packedCounts(a: Column, b: Column): Column =
    exprs.toColumn(SetOverlapCounts(exprs.toExpr(a), exprs.toExpr(b)))

  def interCount(packed: Column): Column = shiftrightunsigned(packed, 32)
  def unionCount(packed: Column): Column = packed.bitwiseAND(lit(0xFFFFFFFFL))
}
