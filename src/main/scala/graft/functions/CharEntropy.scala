package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character-level Shannon entropy, in basis points of
  * bits — the cheap "is this text or noise" quality signal next to the
  * stopword/punctuation ratios (published filter recipes cut both the
  * near-zero tail: repeated-char padding, and the near-max tail:
  * base64/hex blobs and binary spill). One pass per row, no shuffle —
  * the 100 TB shape; an explode-to-chars formulation would shuffle a
  * row per CHARACTER.
  *
  * Counted over Unicode code points (what the DuckDB oracle's
  * `string_split(text, '')` also yields). Entropy is
  * `log2(n) − Σ c·log2(c) / n` over the code-point counts, emitted as
  * `floor(H·10000 + 0.5)` — the cross-engine float rule (SURVEY §6);
  * both engines compute log2 as ln/ln(2) so the term values agree to
  * the ulp. Empty string → 0; null → null.
  */
case class CharEntropyBp(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_entropy requires string input, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(CharEntropy.entropyBp(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharEntropy.entropyBp($c);")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyBp =
    copy(child = newChild)
}

object CharEntropy {

  def charEntropyBp(c: Column): Column =
    exprs.toColumn(CharEntropyBp(exprs.toExpr(c)))

  private val Log2 = Math.log(2.0)

  /** Static kernel (generated code calls this directly). */
  def entropyBp(us: UTF8String): Long = {
    val s = us.toString
    if (s.isEmpty) return 0L
    val counts = new java.util.HashMap[Integer, Long]()
    var n = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      n += 1
      i += Character.charCount(cp)
    }
    var sum = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      sum += c * (Math.log(c.toDouble) / Log2)
    }
    val h = Math.log(n.toDouble) / Log2 - sum / n
    Math.floor(h * 10000.0 + 0.5).toLong
  }
}
