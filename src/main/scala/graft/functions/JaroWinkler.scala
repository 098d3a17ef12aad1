package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity as a codegen'd Catalyst expression — the
  * record-linkage scorer for NAME matching (Winkler's census work):
  * char-level like Levenshtein but tolerant of transpositions and
  * biased toward shared prefixes, which is what human-entered names
  * need (the reference resolves products/manufacturers BY NAME,
  * EcomDestinationWriter.cs:4146 — this is the fuzzy tier of that
  * ladder next to [[graft.operators.FuzzyJoin]]'s exact edit distance).
  *
  * Standard definition: matches within a ⌊max(|a|,|b|)/2⌋−1 window,
  * half-transposition penalty, prefix boost p=0.1 capped at 4 chars and
  * applied only when the Jaro score exceeds 0.7 — Winkler's boost
  * threshold, which rapidfuzz (and therefore DuckDB's
  * jaro_winkler_similarity, the q_name_match oracle) also applies;
  * dissimilar pairs keep their raw Jaro score.
  * Null input → null; two empty strings → 1.0; one empty → 0.0.
  * Stays inside WholeStageCodegen via the static kernel call.
  */
case class JaroWinklerSim(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler requires (string, string), got ${left.dataType} / ${right.dataType}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.sim($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  def jaroWinkler(a: Column, b: Column): Column =
    exprs.toColumn(JaroWinklerSim(exprs.toExpr(a), exprs.toExpr(b)))

  /** Static kernel (generated code calls this directly). */
  def sim(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val window = math.max(math.max(a.length, b.length) / 2 - 1, 0)
    val aMatch = new Array[Boolean](a.length)
    val bMatch = new Array[Boolean](b.length)
    var m = 0
    var i = 0
    while (i < a.length) {
      val lo = math.max(0, i - window)
      val hi = math.min(b.length - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars out of order, in pairs
    var t = 0
    var j = 0
    i = 0
    while (i < a.length) {
      if (aMatch(i)) {
        while (!bMatch(j)) j += 1
        if (a.charAt(i) != b.charAt(j)) t += 1
        j += 1
      }
      i += 1
    }
    val jaro = (m.toDouble / a.length + m.toDouble / b.length +
      (m - t / 2.0) / m) / 3.0
    if (jaro <= 0.7) return jaro // Winkler boost threshold
    var prefix = 0
    while (prefix < math.min(4, math.min(a.length, b.length)) &&
      a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}
