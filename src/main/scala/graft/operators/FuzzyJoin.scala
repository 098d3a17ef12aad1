package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact edit-distance join with bounded blow-up — fuzzy business-key
  * resolution (the reference resolves manufacturers/groups by NAME;
  * real feeds misspell those names, and the naive fix is an |L|·|R|
  * levenshtein cross join that cannot run at scale).
  *
  * Segment blocking (the PassJoin scheme, Li et al., VLDB 2011): split
  * each right-side string into d+1 contiguous segments. Any string
  * within edit distance d of it must contain at least one segment
  * VERBATIM (pigeonhole: d edits cannot touch all d+1 segments), at a
  * position shifted by at most d. So candidates come from an equi-join
  * on (right-length, segment-index, segment-text) against the left
  * side's extracted substrings over a ±d position window — a bounded
  * explode of ≤ (2d+1)²·(d+1) keys per left row — and only candidates
  * pay the levenshtein verify. No false negatives; false positives die
  * in the verify. Both sides shuffle once on the segment key.
  *
  * Strings shorter than d+1 characters cannot be segmented into d+1
  * non-empty parts and are excluded from matching (documented contract —
  * fuzzy keys that short are noise in practice).
  */
object FuzzyJoin {

  /** Pairs (left.*, right.*, edit_dist) with
    * levenshtein(leftCol, rightCol) <= maxDist. Output column names are
    * the input frames' columns plus `edit_dist`; callers project/alias.
    */
  def byEditDistance(left: DataFrame, right: DataFrame,
                     leftCol: String, rightCol: String,
                     maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 4, s"maxDist in [1,4], got $maxDist")
    val k = maxDist + 1 // number of segments

    // right side: k segments per string; PassJoin length split — the
    // first (k - L%k) segments get floor(L/k) chars, the rest one more.
    // Row identities (__lrow/__rrow) make the candidate dedup collapse
    // multi-segment matches of the SAME row pair without also collapsing
    // genuinely duplicate input rows (whole-row distinct would).
    val r = right
      .withColumn("__rrow", monotonically_increasing_id())
      .filter(length(col(rightCol)) >= k)
      .withColumn("__rlen", length(col(rightCol)))
      .withColumn("__seg", explode(expr(
        s"""transform(sequence(0, $maxDist), i -> named_struct(
           |  'i', i,
           |  'txt', substring($rightCol,
           |    1 + i * (__rlen div $k) +
           |      greatest(0, i - ($k - __rlen % $k)),
           |    (__rlen div $k) +
           |      if(i >= $k - __rlen % $k, 1, 0))))""".stripMargin)))
      .withColumn("__i", col("__seg.i"))
      .withColumn("__txt", col("__seg.txt"))
      .drop("__seg")

    // left side: for every plausible right length L in [len±d], compute
    // where right's segment i would sit and extract left substrings of
    // that segment's length over a ±d position window
    // position window [start-d, start+d] clamped at 0 only: the window is
    // always ascending (sequence() would silently REVERSE on an empty
    // descending range), and out-of-range substrings come back truncated,
    // which can only fail the segment equality — never a false negative,
    // since a TRUE match's segment lies fully inside the left string
    val l = left
      .withColumn("__lrow", monotonically_increasing_id())
      .filter(length(col(leftCol)) >= k)
      .withColumn("__llen", length(col(leftCol)))
      .withColumn("__cand", explode(expr(
        s"""filter(flatten(transform(
           |  sequence(greatest($k, __llen - $maxDist), __llen + $maxDist),
           |  L -> flatten(transform(sequence(0, $maxDist), i ->
           |    transform(
           |      sequence(
           |        greatest(0, i * (L div $k) +
           |          greatest(0, i - ($k - L % $k)) - $maxDist),
           |        i * (L div $k) +
           |          greatest(0, i - ($k - L % $k)) + $maxDist),
           |      p -> named_struct('L', L, 'i', i,
           |        'txt', substring($leftCol, p + 1,
           |          (L div $k) + if(i >= $k - L % $k, 1, 0)))))))),
           |  c -> length(c.txt) > 0)""".stripMargin)))
      .withColumn("__L", col("__cand.L"))
      .withColumn("__i", col("__cand.i"))
      .withColumn("__txt", col("__cand.txt"))
      .drop("__cand")

    l.join(r, l("__L") === r("__rlen") && l("__i") === r("__i") &&
        l("__txt") === r("__txt"))
      .drop("__L", "__i", "__txt", "__llen", "__rlen")
      .dropDuplicates("__lrow", "__rrow") // several segments, same pair
      .drop("__lrow", "__rrow")
      .withColumn("edit_dist", levenshtein(col(leftCol), col(rightCol)))
      .filter(col("edit_dist") <= maxDist)
  }

  /** Resolution form: each left row gets its single BEST right match
    * (lowest edit distance, ties broken by `tieBreak` for determinism) —
    * the semantic a key-resolution ladder needs, composed from the
    * segment join + a rank-limit window over the (small) candidate set.
    */
  def resolveBest(left: DataFrame, right: DataFrame,
                  leftCol: String, rightCol: String, maxDist: Int,
                  leftKeys: Seq[String], tieBreak: String): DataFrame =
    TopK.perGroup(byEditDistance(left, right, leftCol, rightCol, maxDist),
      leftKeys, Seq(col("edit_dist").asc, col(tieBreak).asc), k = 1)
      .drop("rank_in_group")
}
