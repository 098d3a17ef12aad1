package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Intersection of two SORTED, duplicate-free `array<bigint>` columns
  * as one merge pass — the triangle-closure inner loop (round 14).
  *
  * `array_intersect` builds a hash set per ROW evaluation and boxes
  * through generic ArrayData; over the oriented adjacency arrays of a
  * co-purchase graph that is the per-edge hot path (1.2M edges × ≤
  * √(2m)-long arrays at sf0.1). The inputs there are
  * `sort_array(collect_list(...))` over DISTINCT edges — sorted and
  * duplicate-free BY CONSTRUCTION — so a primitive two-pointer merge
  * returns the identical multiset with no per-call hash set, and the
  * static kernel call stays inside WholeStageCodegen.
  *
  * CONTRACT: both inputs sorted ascending, no duplicate elements, no
  * null elements (collect_list never emits null). On unsorted input
  * the result is undefined — this is a kernel for builder-controlled
  * frames, not a general replacement (GraphsSpec covers the triangle
  * users; FunctionsSpec pins equality with array_intersect on random
  * sorted sets).
  */
case class SortedIntersect(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (t: DataType) => t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect requires array<bigint>, got ${left.dataType} / ${right.dataType}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SketchKernels.intersectSortedDistinct(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SketchKernels.intersectSortedDistinct($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersect =
    copy(left = newLeft, right = newRight)
}

object SortedIntersect {
  def of(a: Column, b: Column): Column =
    exprs.toColumn(SortedIntersect(exprs.toExpr(a), exprs.toExpr(b)))
}
