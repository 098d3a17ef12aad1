package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns.
  *
  * Pure higher-order-function compositions (`zip_with` + `aggregate`) —
  * codegen'd, no UDF serialization, safe inside WholeStageCodegen. All
  * accumulation in double.
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity — native fused expression ([[CosineSim]]): one
    * allocation-free pass for a·b, ‖a‖², ‖b‖² instead of three
    * zip_with+aggregate folds (the ANN/near-dup inner kernel). Null on
    * null/mismatched/zero-norm inputs, matching the HOF formulation.
    */
  def cosine(a: Column, b: Column): Column = CosineSim(a, b)

  /** Bind a per-row SCALAR once and use it inside element-wise lambdas.
    *
    * Higher-order-function lambda bodies are re-evaluated PER ELEMENT,
    * including any whole-array aggregate referenced inside — embedding
    * `norm(a)` directly in a `transform` lambda makes the pass O(dim²)
    * per row (each of dim elements re-folds the dim-element reduction).
    * SQL has no let-expression, but a one-element outer `transform`
    * IS one: the scalar is evaluated once building the outer array, the
    * lambda sees it as a bound VARIABLE (O(1) per reference), and
    * `element_at(..., 1)` unwraps the result. Cost: one 1-element array
    * per row; the pass is back to O(dim).
    */
  private def letBound(scalar: Column)(body: Column => Column): Column =
    element_at(transform(array(scalar), body), 1)

  /** Unit-normalize (L2); zero vectors pass through unchanged. */
  def l2Normalize(a: Column): Column =
    letBound(norm(a)) { n =>
      when(n === 0.0, a)
        .otherwise(transform(a, x => (x.cast("double") / n).cast("float")))
    }

  /** Symmetric int8 quantization against the vector's own max-abs scale —
    * the storage shape ANN indexes ship at scale (4× smaller than float32).
    * Returns struct(scale, q: array<tinyint>); dequantize with q*scale.
    * Levels are `floor(x/scale + 0.5)` (half toward +inf) rather than
    * decimal `round`: pure IEEE ops, so any engine replaying the formula
    * reproduces the codes bit-identically — decimal rounding of a double
    * is engine-dependent on half boundaries. Range stays in [-127, 127]
    * (the minimum −|max| maps to floor(−126.5) = −127).
    */
  def quantizeInt8(a: Column): Column =
    letBound(aggregate(a, lit(0.0),
      (acc, x) => greatest(acc, abs(x.cast("double"))))) { maxAbs =>
      // scale derives from the bound variable: O(1) per reference, so
      // it can appear inside the per-element lambda freely
      val scale = when(maxAbs === 0.0, lit(1.0)).otherwise(maxAbs / 127.0)
      struct(scale.as("scale"),
        transform(a, x => floor(x.cast("double") / scale + 0.5).cast("tinyint")).as("q"))
    }

  def dequantizeInt8(qs: Column): Column =
    transform(qs.getField("q"), q => (q.cast("double") * qs.getField("scale")).cast("float"))
}
