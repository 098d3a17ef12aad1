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
  * VERBATIM (pigeonhole: d edits cannot touch all d+1 segments). So
  * candidates come from an equi-join on (right-length, segment-index,
  * segment-text) against the left side's extracted substrings, and only
  * candidates pay the levenshtein verify. No false negatives; false
  * positives die in the verify. Both sides shuffle once on the segment
  * key.
  *
  * Substring positions use the paper's MULTI-MATCH-AWARE tight windows
  * (§4): for segment i (0-based) at start p in a right string of length
  * L, a left string of length l only needs substrings starting at
  *   q ∈ [max(0, p−i, p+Δ−(d−i)), min(l−len_i, p+i, p+Δ+(d−i))],
  * Δ = l−L — the prefix side can absorb at most i edits before segment
  * i, and the suffix side at most d−i after it, so the window width is
  * ~min(2i, 2(d−i))+1 instead of a loose ±d (2d+1). Roughly half the
  * candidate keys at the same zero-false-negative guarantee.
  *
  * Strings shorter than d+1 characters cannot be segmented into d+1
  * non-empty parts and are excluded from matching (documented contract —
  * fuzzy keys that short are noise in practice).
  */
object FuzzyJoin {

  /** Left-side candidate substrings: one row per (plausible right length
    * L, segment index i, tight-window position p). Package-visible so
    * the spec can count candidate keys against the loose-window count.
    */
  private[graft] def leftCandidates(left: DataFrame, leftCol: String,
                                    maxDist: Int): DataFrame = {
    val k = maxDist + 1
    // nested single-element transforms are the SQL let-binding idiom:
    // 's' binds (segment start, segment length), 'w' binds (lo, hi)
    left
      .filter(length(col(leftCol)) >= k)
      .withColumn("__llen", length(col(leftCol)))
      .withColumn("__cand", explode(expr(
        s"""flatten(transform(
           |  sequence(greatest($k, __llen - $maxDist), __llen + $maxDist),
           |  L -> flatten(transform(sequence(0, $maxDist), i ->
           |    flatten(transform(
           |      array(named_struct(
           |        'st', i * (L div $k) + greatest(0, i - ($k - L % $k)),
           |        'sl', (L div $k) + if(i >= $k - L % $k, 1, 0))),
           |      s -> flatten(transform(
           |        array(named_struct(
           |          'lo', greatest(0, s.st - i,
           |                  s.st + (__llen - L) - ($maxDist - i)),
           |          'hi', least(__llen - s.sl, s.st + i,
           |                  s.st + (__llen - L) + ($maxDist - i)))),
           |        w -> transform(
           |          if(w.lo <= w.hi, sequence(w.lo, w.hi),
           |             cast(array() as array<int>)),
           |          p -> named_struct('L', L, 'i', i,
           |            'txt', substring($leftCol, p + 1, s.sl)))))))))))""".stripMargin)))
      .withColumn("__L", col("__cand.L"))
      .withColumn("__i", col("__cand.i"))
      .withColumn("__txt", col("__cand.txt"))
      .drop("__cand")
  }

  /** Pairs (left.*, right.*, edit_dist) with
    * levenshtein(leftCol, rightCol) <= maxDist. Output column names are
    * the input frames' columns plus `edit_dist`; callers project/alias.
    *
    * ROW IDENTITY: multi-segment matches of the same row pair collapse
    * through a per-row identity (whole-row distinct would also collapse
    * genuinely duplicate input rows). Pass `leftRowId`/`rightRowId`
    * (columns unique per row, e.g. the business key) to make that
    * identity deterministic under ANY re-planning. Without them the
    * identity is `monotonically_increasing_id`, which is only stable
    * when the input's partitioning and intra-partition order are
    * deterministic — a task retry over a nondeterministic upstream
    * (round-robin repartition, unordered shuffle reads) could re-number
    * rows between the id stamping and the dedup. Deterministic inputs
    * (file scans, keyed shuffles) are safe.
    */
  def byEditDistance(left: DataFrame, right: DataFrame,
                     leftCol: String, rightCol: String,
                     maxDist: Int,
                     leftRowId: Option[String] = None,
                     rightRowId: Option[String] = None): DataFrame = {
    require(maxDist >= 1 && maxDist <= 4, s"maxDist in [1,4], got $maxDist")
    val k = maxDist + 1 // number of segments

    def stamped(df: DataFrame, idCol: Option[String], as: String) =
      idCol.map(c => df.withColumn(as, col(c)))
        .getOrElse(df.withColumn(as, monotonically_increasing_id()))

    // right side: k segments per string; PassJoin length split — the
    // first (k - L%k) segments get floor(L/k) chars, the rest one more.
    val r = stamped(right, rightRowId, "__rrow")
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

    val l = leftCandidates(stamped(left, leftRowId, "__lrow"), leftCol, maxDist)

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
