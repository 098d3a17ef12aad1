package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit rolling-hash document fingerprint.
  *
  * Training-data pipelines want a cheap per-document content fingerprint
  * for exact dedup and change detection (the reference dedups on key
  * columns only — EcomDestinationWriter.cs:1042; at 100 TB content
  * fingerprints replace key equality). Polynomial rolling hash (base 31,
  * FNV-ish offset) over the UTF-8 bytes — one pass, no allocation.
  *
  * Native Catalyst expression WITH codegen: stays inside
  * WholeStageCodegen, unlike a Scala UDF which would break the pipeline
  * into iterator stages and serialize every row.
  */
case class RollingFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"fingerprint requires string input, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) { h = 31L * h + bytes(i); i += 1 }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 1125899906842597L;
         |for (int $i = 0; $i < $bytes.length; $i++) { $h = 31L * $h + $bytes[$i]; }
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

object Fingerprint {
  /** Column API: 64-bit content fingerprint of a string column. */
  def fingerprint(c: Column): Column = exprs.toColumn(RollingFingerprint(exprs.toExpr(c)))
}
