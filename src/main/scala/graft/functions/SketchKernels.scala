package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels behind the sketch expressions. Kept as an `object` so the
  * Scala compiler emits static forwarders — generated (janino) code calls
  * these directly, which keeps the sketch projections inside
  * WholeStageCodegen without inlining the loops into generated Java.
  */
object SketchKernels {

  /** One-pass MinHash signature — see MinHashSignature for the contract. */
  def minhash(input: UTF8String, numHashes: Int, shingleLen: Int): ArrayData = {
    val toks = Hash64.tokenize(input)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    if (toks.nonEmpty) {
      val seeds = Array.tabulate(numHashes)(i => Hash64.mix(i.toLong))
      val nShingles = math.max(1, toks.length - shingleLen + 1)
      var s = 0
      while (s < nShingles) {
        val shingle = toks.slice(s, math.min(s + shingleLen, toks.length)).mkString(" ")
        val bytes = shingle.getBytes("UTF-8")
        val base = Hash64.fnv1a(bytes, 0, bytes.length)
        var i = 0
        while (i < numHashes) {
          val h = Hash64.mix(base ^ seeds(i))
          if (h < sig(i)) sig(i) = h
          i += 1
        }
        s += 1
      }
    }
    new GenericArrayData(sig)
  }

  /** 64-bit SimHash — see SimHash64 for the contract. */
  def simhash(input: UTF8String): Long = {
    val toks = Hash64.tokenize(input)
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
    out
  }
}
