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
  * `floor(H·10000 + 0.5)` — the cross-engine float rule (SURVEY §6).
  * Both engines compute log2 as ln/ln(2), but each ln is only ~1-ulp
  * accurate and the Σ summation order differs across engines, so a
  * document whose entropy lands within a few ulp of a half-bp boundary
  * COULD round differently — agreement is near-certain per document,
  * not guaranteed; the tested corpora (both SFs) hash-match. Empty
  * string → 0; null → null.
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

  /** Static kernel (generated code calls this directly).
    *
    * ASCII documents (the overwhelming share of a web corpus) count
    * straight off the UTF8 bytes into a stack `int[128]` — no string
    * materialization, no boxing, nothing for the GC in the codegen hot
    * path. Any byte ≥ 0x80 falls back to the code-point map.
    */
  def entropyBp(us: UTF8String): Long = {
    val nb = us.numBytes()
    if (nb == 0) return 0L
    val counts = new Array[Int](128)
    var i = 0
    var ascii = true
    while (ascii && i < nb) {
      val b = us.getByte(i)
      if (b >= 0) { counts(b) += 1; i += 1 } else ascii = false
    }
    if (!ascii) return entropyBpGeneric(us)
    var sum = 0.0
    var j = 0
    while (j < 128) {
      val c = counts(j)
      if (c > 0) sum += c * (Math.log(c.toDouble) / Log2)
      j += 1
    }
    val h = Math.log(nb.toDouble) / Log2 - sum / nb
    Math.floor(h * 10000.0 + 0.5).toLong
  }

  /** Non-ASCII path: per-code-point counts via a map. Summation runs in
    * HashMap iteration order — same formula, different float order than
    * the ASCII path is possible only for counts that differ, and both
    * paths agree exactly on pure-ASCII input (the fast path is just the
    * map specialized to dense keys).
    */
  private def entropyBpGeneric(us: UTF8String): Long = {
    val s = us.toString
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
