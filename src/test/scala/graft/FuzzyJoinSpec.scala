package graft

import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoin

class FuzzyJoinSpec extends SparkSuite {
  import spark.implicits._

  private def naive(left: Seq[(Long, String)], right: Seq[(Long, String)],
                    d: Int): Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val t = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      dp(a.length)
    }
    (for {
      (li, ls) <- left; (ri, rs) <- right
      dist = lev(ls, rs) if dist <= d && ls.length > d && rs.length > d
    } yield (li, ri, dist)).toSet
  }

  test("byEditDistance equals the naive cross join on random-ish strings") {
    val alphabet = "abcde"
    def word(seed: Long, len: Int): String =
      (0 until len).map(i => alphabet(((seed * 31 + i * 17) % 5).toInt.abs)).mkString
    val rightRows = (1L to 60L).map(i => (i, word(i, 6 + (i % 5).toInt)))
    val leftRows = (1L to 80L).map { i =>
      val base = word(i % 60 + 1, 6 + ((i % 60 + 1) % 5).toInt)
      // mutate: drop a char / substitute / keep verbatim / unrelated
      val s = (i % 4) match {
        case 0 => base.patch((i % base.length).toInt, "", 1) // deletion
        case 1 => base.updated((i % base.length).toInt, 'z') // substitution
        case 2 => base
        case _ => word(i + 1000, 7)
      }
      (i, s)
    }
    for (d <- Seq(1, 2)) {
      val got = FuzzyJoin.byEditDistance(
        leftRows.toDF("lid", "lname"), rightRows.toDF("rid", "rname"),
        "lname", "rname", d)
        .select("lid", "rid", "edit_dist")
        .as[(Long, Long, Int)].collect().toSet
      val want = naive(leftRows, rightRows, d)
      assert(got === want, s"d=$d: missing=${want -- got} extra=${got -- want}")
      assert(want.nonEmpty)
    }
  }

  test("resolveBest keeps one lowest-distance match per left row") {
    val l = Seq((1L, "parris"), (2L, "londn")).toDF("lid", "lname")
    val r = Seq((10L, "paris"), (11L, "parrish"), (20L, "london"))
      .toDF("rid", "rname")
    val got = FuzzyJoin.resolveBest(l, r, "lname", "rname", maxDist = 2,
      Seq("lid"), tieBreak = "rid")
      .select("lid", "rid", "edit_dist").as[(Long, Long, Int)].collect().toSet
    // "parris" → paris(1) beats parrish(1)? both dist 1 → tie broken by rid
    assert(got === Set((1L, 10L, 1), (2L, 20L, 1)))
  }

  test("candidate join is an equi join, never a nested loop") {
    val l = Seq((1L, "abcdef")).toDF("lid", "lname")
    val r = Seq((2L, "abcdxf")).toDF("rid", "rname")
    val plan = FuzzyJoin.byEditDistance(l, r, "lname", "rname", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
    assert(plan.contains("Join"), plan)
  }

  test("duplicate input rows each produce their own match (naive parity)") {
    val l = Seq("acme corp", "acme corp").toDF("lname") // no distinguishing id
    val r = Seq("acme corp.").toDF("rname")
    val got = FuzzyJoin.byEditDistance(l, r, "lname", "rname", maxDist = 1)
    assert(got.count() === 2L) // whole-row distinct would collapse to 1
  }

  test("tight multi-match-aware windows cut candidate keys vs loose ±d windows") {
    val alphabet = "abcde"
    def word(seed: Long, len: Int): String =
      (0 until len).map(i => alphabet(((seed * 31 + i * 17) % 5).toInt.abs)).mkString
    val words = (1L to 50L).map(i => (i, word(i, 6 + (i % 7).toInt)))
    val d = 2
    val k = d + 1
    // the round-3 loose window: p ∈ [max(0, st−d), st+d], truncated-overhang
    // positions (p ≥ l) dropped by the length filter
    def looseCount(l: Int): Long =
      (math.max(k, l - d) to (l + d)).map { L =>
        (0 to d).map { i =>
          val st = i * (L / k) + math.max(0, i - (k - L % k))
          (math.max(0, st - d) to (st + d)).count(p => p < l).toLong
        }.sum
      }.sum
    val loose = words.map(w => looseCount(w._2.length)).sum
    val tight = graft.operators.FuzzyJoin
      .leftCandidates(words.toDF("lid", "lname"), "lname", d).count()
    // the paper's window is ~min(2i, 2(d−i))+1 wide vs 2d+1: expect well
    // under 60% of the loose key volume (exactness is proven separately)
    assert(tight < loose * 6 / 10, s"tight=$tight loose=$loose")
  }

  test("caller row ids keep results exact under forced nondeterministic repartition") {
    val alphabet = "abcde"
    def word(seed: Long, len: Int): String =
      (0 until len).map(i => alphabet(((seed * 31 + i * 17) % 5).toInt.abs)).mkString
    val rightRows = (1L to 40L).map(i => (i, word(i, 6 + (i % 5).toInt)))
    val leftRows = (1L to 60L).map { i =>
      val base = word(i % 40 + 1, 6 + ((i % 40 + 1) % 5).toInt)
      val s = (i % 3) match {
        case 0 => base.patch((i % base.length).toInt, "", 1)
        case 1 => base.updated((i % base.length).toInt, 'z')
        case _ => base
      }
      (i, s)
    }
    // round-robin repartition is the canonical nondeterministic upstream;
    // caller-supplied unique ids make pair identity independent of it
    val got = FuzzyJoin.byEditDistance(
      leftRows.toDF("lid", "lname").repartition(7),
      rightRows.toDF("rid", "rname").repartition(5),
      "lname", "rname", maxDist = 2,
      leftRowId = Some("lid"), rightRowId = Some("rid"))
      .select("lid", "rid", "edit_dist")
      .as[(Long, Long, Int)].collect().toSet
    assert(got === naive(leftRows, rightRows, 2))
    assert(got.nonEmpty)
  }

  test("forward/nearest as-of give null payloads for null-ts left rows") {
    import graft.operators.AsOf
    val l = Seq((1L, Some(10)), (2L, None)).toDF("k", "t")
      .select($"k", $"t".cast("int").as("t"))
    val r = Seq((1L, 5, 1.0), (1L, 15, 2.0), (2L, 7, 9.0)).toDF("k", "t", "price")
    for (d <- Seq("forward", "nearest")) {
      val out = AsOf.joinAsOf(l, r, Seq("k"), "t", Seq("price"), direction = d)
        .select("k", "asof_price").as[(Long, Option[Double])].collect().toMap
      assert(out(2L).isEmpty, s"direction=$d must not match a null-ts left row")
      assert(out(1L).nonEmpty)
    }
  }

  test("short strings are excluded per contract; identical strings match at 0") {
    val l = Seq((1L, "ab"), (2L, "paris")).toDF("lid", "lname")
    val r = Seq((10L, "ab"), (20L, "paris")).toDF("rid", "rname")
    val got = FuzzyJoin.byEditDistance(l, r, "lname", "rname", maxDist = 2)
      .select("lid", "rid", "edit_dist").as[(Long, Long, Int)].collect().toSet
    assert(got === Set((2L, 20L, 0))) // "ab" shorter than d+1=3 → excluded
  }
}
