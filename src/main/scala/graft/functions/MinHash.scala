package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared deterministic 64-bit hashing for the sketch expressions. */
private[functions] object Hash64 {
  /** FNV-1a over UTF-8 bytes. */
  def fnv1a(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) { h = (h ^ (bytes(i) & 0xff)) * 0x100000001b3L; i += 1 }
    h
  }
  /** splitmix64 finalizer — decorrelates the per-function seeds. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  /** Whitespace tokenizer shared by the sketches (must match
    * TextFunctions.tokens semantics: trim + split on runs of whitespace).
    */
  def tokenize(s: UTF8String): Array[String] = {
    val t = s.toString.trim
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }
}

/** One-pass MinHash signature: `numHashes` minima over the document's
  * `shingleLen`-word shingles.
  *
  * The scale-critical design point (SURVEY.md §5): the signature is
  * computed per-row in a single expression — NO shingle explode, so a
  * 100 TB corpus never materializes the ~tokens×shingleLen intermediate
  * that a compose-from-builtins version (explode → groupBy doc → 64
  * min aggs) would shuffle. Each shingle is FNV-hashed once, then the i-th
  * hash function is `mix(base ^ seed_i)` — the standard one-permutation
  * family used by public MinHash implementations.
  *
  * Documents with fewer than `shingleLen` tokens contribute one shingle
  * (the whole document); empty documents yield `Long.MaxValue` everywhere
  * (never collide with real content).
  *
  * Codegen emits a call to the static [[SketchKernels]] kernel, so the
  * projection stays inside WholeStageCodegen.
  */
case class MinHashSignature(child: Expression, numHashes: Int, shingleLen: Int)
    extends UnaryExpression {
  require(numHashes > 0 && shingleLen > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"minhash requires string, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    SketchKernels.minhash(input.asInstanceOf[UTF8String], numHashes, shingleLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SketchKernels.minhash($c, $numHashes, $shingleLen);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHash {
  def minhashSignature(text: Column, numHashes: Int = 64, shingleLen: Int = 3): Column =
    exprs.toColumn(MinHashSignature(exprs.toExpr(text), numHashes, shingleLen))
}
