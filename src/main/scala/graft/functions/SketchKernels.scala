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

  /** Rolling polynomial n-gram keys — see GramHashKeys for the contract.
    * O(tokens) total: each token hashed once, each gram key derived from
    * the previous in O(1) via H(i+1) = (H(i) − h[i]·B^(n−1))·B + h[i+n].
    */
  def gramHashes(input: UTF8String, n: Int): ArrayData = {
    val toks = Hash64.tokenize(input)
    if (toks.length < n) return new GenericArrayData(Array.empty[Long])
    val h = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      val b = toks(i).getBytes("UTF-8")
      h(i) = Hash64.mix(Hash64.fnv1a(b, 0, b.length))
      i += 1
    }
    val B = 0x9e3779b97f4a7c15L // odd => multiplication by B is a bijection mod 2^64
    var bn1 = 1L // B^(n-1)
    i = 0
    while (i < n - 1) { bn1 *= B; i += 1 }
    val out = new Array[Long](toks.length - n + 1)
    var acc = 0L
    i = 0
    while (i < n) { acc = acc * B + h(i); i += 1 }
    out(0) = Hash64.mix(acc)
    var s = 1
    while (s <= toks.length - n) {
      acc = (acc - h(s - 1) * bn1) * B + h(s + n - 1)
      out(s) = Hash64.mix(acc)
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Rolling polynomial CHARACTER n-gram keys — the char-granular twin of
    * [[gramHashes]] (see CharGramHashKeys). Normalizes as it scans
    * (lowercase, whitespace runs collapse to one space, leading/trailing
    * trimmed) so a shared passage matches across case and formatting
    * differences, then rolls the same O(1)-per-position polynomial over
    * the normalized code units. O(chars) total, one output key per
    * normalized position.
    */
  def charGramHashes(input: UTF8String, n: Int): ArrayData = {
    val raw = input.toString
    val sb = new java.lang.StringBuilder(raw.length)
    var i = 0
    var pendingSpace = false
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (Character.isWhitespace(c)) { if (sb.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(Character.toLowerCase(c))
      }
      i += 1
    }
    val len = sb.length
    if (len < n) return new GenericArrayData(Array.empty[Long])
    val B = 0x9e3779b97f4a7c15L
    var bn1 = 1L
    i = 0
    while (i < n - 1) { bn1 *= B; i += 1 }
    val out = new Array[Long](len - n + 1)
    var acc = 0L
    i = 0
    while (i < n) { acc = acc * B + Hash64.mix(sb.charAt(i).toLong); i += 1 }
    out(0) = Hash64.mix(acc)
    var s = 1
    while (s <= len - n) {
      acc = (acc - Hash64.mix(sb.charAt(s - 1).toLong) * bn1) * B +
        Hash64.mix(sb.charAt(s + n - 1).toLong)
      out(s) = Hash64.mix(acc)
      s += 1
    }
    new GenericArrayData(out)
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

  /** Distinct-set |A∩B| and |A∪B| of two long-array SETS in ONE sorted
    * merge pass, packed as (nInter << 32) | nUnion — the LSH-verify
    * inner kernel ([[SetOverlapCounts]]). The compose-from-builtins form
    * (`array_intersect` + `array_union`) builds two hash sets AND two
    * result arrays per pair just to take their sizes; this allocates
    * two primitive copies, sorts, and counts. Duplicate elements within
    * a side are counted once (set semantics, same as the builtins).
    */
  def overlapCounts(a: ArrayData, b: ArrayData): Long = {
    val x = a.toLongArray()
    val y = b.toLongArray()
    java.util.Arrays.sort(x)
    java.util.Arrays.sort(y)
    var i = 0; var j = 0; var inter = 0; var union = 0
    while (i < x.length || j < y.length) {
      if (i < x.length && i > 0 && x(i) == x(i - 1)) i += 1 // in-side dup
      else if (j < y.length && j > 0 && y(j) == y(j - 1)) j += 1
      else if (j >= y.length || (i < x.length && x(i) < y(j))) { union += 1; i += 1 }
      else if (i >= x.length || y(j) < x(i)) { union += 1; j += 1 }
      else { inter += 1; union += 1; i += 1; j += 1 }
    }
    (inter.toLong << 32) | union.toLong
  }

  /** Merge-intersection of two ALREADY-SORTED duplicate-free long
    * arrays ([[graft.functions.SortedIntersect]]'s kernel): one
    * two-pointer pass over primitive accessors, result packed as
    * UnsafeArrayData — no per-call hash set, no boxing.
    */
  def intersectSortedDistinct(a: ArrayData, b: ArrayData): ArrayData = {
    val na = a.numElements(); val nb = b.numElements()
    val out = new Array[Long](math.min(na, nb))
    var i = 0; var j = 0; var k = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { out(k) = x; k += 1; i += 1; j += 1 }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(if (k == out.length) out
        else java.util.Arrays.copyOf(out, k))
  }
}
