package graft.operators

/** Exact rational arithmetic on BigInt — the shared driver-side finish
  * for operators whose statistics must be bit-deterministic
  * (MarkovAttribution's absorption solve, ChangePoints' SSE compares).
  */
/** Always gcd-normalized, den > 0. */
private[graft] final case class Frac(num: BigInt, den: BigInt) {
  def +(o: Frac): Frac = Frac.mk(num * o.den + o.num * den, den * o.den)
  def -(o: Frac): Frac = Frac.mk(num * o.den - o.num * den, den * o.den)
  def *(o: Frac): Frac = Frac.mk(num * o.num, den * o.den)
  def /(o: Frac): Frac = { require(o.num != 0, "div by zero"); Frac.mk(num * o.den, den * o.num) }
  def isZero: Boolean = num == 0
  /** floor(this · scale) as Long — exact integer quantization. */
  def floorScaled(scale: Long): Long =
    ((num * scale) / den - (if (num * scale % den != 0 && num < 0) 1 else 0)).toLong
}
private[graft] object Frac {
  val Zero = Frac(0, 1); val One = Frac(1, 1)
  def mk(n: BigInt, d: BigInt): Frac = {
    require(d != 0)
    val s = if (d < 0) -1 else 1
    val g = n.gcd(d)
    if (g == 0) Frac(0, 1) else Frac(s * n / g, s * d / g)
  }
}
