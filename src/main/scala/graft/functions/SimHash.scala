package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over whitespace tokens (Charikar similarity hash, as
  * used by public web-dedup pipelines): each token's 64-bit hash votes
  * ±1 per bit position, the sign of each tally becomes the output bit.
  * Near-identical documents land within a small Hamming distance.
  *
  * Same one-pass, no-explode design as [[MinHashSignature]].
  */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"simhash requires string, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any = {
    val toks = Hash64.tokenize(input.asInstanceOf[UTF8String])
    val tally = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val bytes = toks(t).getBytes("UTF-8")
      val h = Hash64.mix(Hash64.fnv1a(bytes, 0, bytes.length))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) tally(b) += 1 else tally(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (tally(b) > 0) out |= (1L << b); b += 1 }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash {
  def simhash(text: Column): Column = exprs.toColumn(SimHash64(exprs.toExpr(text)))
}
