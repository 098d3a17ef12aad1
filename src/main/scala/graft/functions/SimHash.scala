package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over whitespace tokens (Charikar similarity hash, as
  * used by public web-dedup pipelines): each token's 64-bit hash votes
  * ±1 per bit position, the sign of each tally becomes the output bit.
  * Near-identical documents land within a small Hamming distance.
  *
  * Same one-pass, no-explode design as [[MinHashSignature]]; codegen
  * calls the static [[SketchKernels]] kernel.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"simhash requires string, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SketchKernels.simhash(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SketchKernels.simhash($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash {
  def simhash(text: Column): Column = exprs.toColumn(SimHash64(exprs.toExpr(text)))
}
