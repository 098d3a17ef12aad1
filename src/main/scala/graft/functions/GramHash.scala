package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass hashed word n-gram keys via a TRUE rolling polynomial hash.
  *
  * Decontamination (the GPT-3/LLaMA benchmark-hygiene step) joins corpus
  * and benchmark on hashed n-gram keys. A compose-from-builtins version
  * re-folds an n-token hash window per gram position — O(tokens × n) hash
  * work plus a per-position slice allocation, which at n=13 is 13× the
  * necessary cost on every document of a 100 TB corpus. Here each token
  * is hashed once and each successive gram key is derived from the
  * previous in O(1):
  *
  *   H(i+1) = (H(i) − h[i]·B^(n−1))·B + h[i+n]   (mod 2^64, B odd)
  *
  * so the whole document costs O(tokens). Keys are splitmix64-finalized
  * so the natural-overflow polynomial stays well-spread for the join.
  * Documents with fewer than n tokens yield an empty array.
  *
  * Codegen calls the static [[SketchKernels]] kernel — the projection
  * stays inside WholeStageCodegen like the other sketch expressions.
  */
case class GramHashKeys(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"gram_hashes requires string, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    SketchKernels.gramHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SketchKernels.gramHashes($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): GramHashKeys =
    copy(child = newChild)
}

/** Character-granular rolling n-gram keys: the same O(1)-per-position
  * polynomial as [[GramHashKeys]] over NORMALIZED code units (lowercase,
  * collapsed whitespace) instead of word tokens — shared-passage
  * detection below token granularity, without a suffix array. Texts
  * shorter than n normalized chars yield an empty array.
  */
case class CharGramHashKeys(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"char_gram_hashes requires string, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    SketchKernels.charGramHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SketchKernels.charGramHashes($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharGramHashKeys =
    copy(child = newChild)
}

object GramHash {
  /** Column API: array of 64-bit keys, one per word n-gram (with
    * repeats — wrap in `array_distinct` for set semantics).
    */
  def gramHashes(text: Column, n: Int): Column =
    exprs.toColumn(GramHashKeys(exprs.toExpr(text), n))

  /** Column API: array of 64-bit keys, one per normalized char n-gram. */
  def charGramHashes(text: Column, n: Int): Column =
    exprs.toColumn(CharGramHashKeys(exprs.toExpr(text), n))
}
