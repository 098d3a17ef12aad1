package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native cosine similarity over two `array<float>` columns.
  *
  * The HOF formulation (`aggregate(zip_with(...))` three times) is the
  * inner kernel of every ANN / embedding-near-dup pair loop, and each
  * call allocates a zipped intermediate array and runs an interpreted
  * fold. This expression fuses all three accumulations into one
  * allocation-free pass ([[VectorKernels.cosine]]) and stays inside
  * WholeStageCodegen via a static kernel call.
  *
  * Null/edge semantics: null input array → null; a null ELEMENT →
  * null; mismatched lengths → null (the HOF version's zip_with pads
  * with null and poisons the sum the same way); zero-norm input →
  * null — deliberately SAFER than the HOF
  * formulation it replaced, whose division THROWS
  * SparkArithmeticException under Spark 4's default ANSI mode when a
  * zero vector appears (a single all-zero embedding would kill a
  * whole-corpus job).
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (t: DataType) => t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine requires array<float>, got ${left.dataType} / ${right.dataType}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val c = VectorKernels.cosine(x, y)
      if (java.lang.Double.isNaN(c) || java.lang.Double.isInfinite(c)) null
      else java.lang.Double.valueOf(c)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.VectorKernels.cosine($a, $b);
        if (Double.isNaN(${ev.value}) || Double.isInfinite(${ev.value})) {
          ${ev.isNull} = true;
        }
      }""")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  def apply(a: Column, b: Column): Column =
    exprs.toColumn(CosineSim(exprs.toExpr(a), exprs.toExpr(b)))
}
