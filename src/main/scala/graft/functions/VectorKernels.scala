package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** JVM kernel behind the vector expressions (static forwarders for
  * generated code, like [[SketchKernels]]).
  */
object VectorKernels {

  /** Fused cosine: one pass accumulating a·b, a·a, b·b — no intermediate
    * zip array, no three separate folds. Accumulation order matches the
    * left-to-right `aggregate` fold it replaces, so results are
    * bit-identical to the HOF formulation. A null ELEMENT returns NaN
    * (the expression wrapper maps it to null) — the HOF form's zip_with
    * poisons the sum to null the same way; reading the slot blindly
    * would silently treat it as 0.
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var ab = 0.0d
    var aa = 0.0d
    var bb = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return Double.NaN
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      ab += x * y
      aa += x * x
      bb += y * y
      i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }
}
