package graft

import org.apache.spark.sql.functions._
import graft.operators.Diagnostics

class DiagnosticsSpec extends SparkSuite {
  import spark.implicits._

  test("keySkew names the hot key with exact count and a sane skew multiplier") {
    // 5000 rows on one key, 5000 spread over 5000 keys
    val df = ((1 to 5000).map(_ => "hot") ++ (1 to 5000).map(i => s"k$i"))
      .toDF("k")
    val report = Diagnostics.keySkew(df, $"k", phi = 0.01)
      .as[(String, Long, Long, Double)].collect()
    assert(report.map(_._1).toSeq === Seq("hot"))
    val (_, n, shareBp, skew) = report.head
    assert(n === 5000L)
    assert(shareBp === 5000L) // half the rows
    // mean key load = 10000 / ~5001 ≈ 2; hot key ≈ 2500× the mean
    assert(skew > 2000 && skew < 3000, s"skew_x $skew")
  }

  test("benford counts leading digits with pinned expectations; absent digits report 0") {
    // 30 values starting with 1, 10 with 2, none with 3..9
    val vals = (1 to 30).map(i => 100.0 + i) ++ (1 to 10).map(i => 200.0 + i)
    val rep = Diagnostics.benford(vals.toDF("v"), $"v")
      .orderBy($"digit")
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(rep.map(_._1).toSeq === (1 to 9))
    val byDigit = rep.map(r => r._1 -> r).toMap
    assert(byDigit(1)._2 === 30L && byDigit(1)._3 === 7500L)
    assert(byDigit(2)._2 === 10L && byDigit(2)._3 === 2500L)
    assert(byDigit(3)._2 === 0L && byDigit(3)._3 === 0L)
    // delta = share - expected, e.g. digit 1: 7500 - 3010
    assert(byDigit(1)._5 === 7500L - 3010L)
    assert(byDigit(9)._5 === 0L - 458L)
    // non-positive values are excluded entirely
    val empty = Diagnostics.benford(Seq(-5.0, 0.0).toDF("v"), $"v")
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(empty.forall(r => r._2 === 0L && r._3 === 0L))
  }

  test("fkOrphans counts dangling fact keys per FK; null FKs are not orphans") {
    val fact = Seq(
      (1L, Some(10L)), (2L, Some(11L)), (3L, Some(99L)), // 99 dangling
      (4L, None), (5L, Some(98L))).toDF("ok", "pk") // null not an orphan
    val dimO = Seq(1L, 2L, 3L, 4L).toDF("o") // 5 dangling on ok
    val dimP = Seq(10L, 11L).toDF("p")
    val rep = Diagnostics.fkOrphans(fact, Seq(
      ("orders", "ok", dimO, "o"), ("part", "pk", dimP, "p")))
      .orderBy($"fk_name")
      .as[(String, Long, Long, Long)].collect()
    assert(rep.toSeq === Seq(
      ("orders", 1L, 5L, 2000L), // key 5 dangling
      ("part", 2L, 5L, 4000L))) // 99 and 98 dangling; the null row is not
  }

  test("kAnonymity violations and stats match the naive definition") {
    // classes: (a,1)×5 safe at k=5, (a,2)×3 violating, (b,1)×1 violating
    val rows = Seq.fill(5)(("a", 1)) ++ Seq.fill(3)(("a", 2)) ++ Seq(("b", 1))
    val df = rows.toDF("seg", "band")
    val viol = Diagnostics.kAnonymityViolations(df, Seq("seg", "band"), k = 5)
      .orderBy($"seg", $"band").as[(String, Int, Long)].collect().toSeq
    assert(viol === Seq(("a", 2, 3L), ("b", 1, 1L)))

    val stats = Diagnostics.kAnonymityStats(df, Seq("seg", "band"), k = 5)
      .as[(Long, Long, Long, Long)].head()
    // 3 classes, 2 violating, 4 rows at risk of 9 → 4444 bp
    assert(stats === ((3L, 2L, 4L, 4444L)))
  }

  test("kAnonymity is clean when every class reaches k") {
    val df = (Seq.fill(4)(("a", 1)) ++ Seq.fill(4)(("b", 2))).toDF("seg", "band")
    assert(Diagnostics.kAnonymityViolations(df, Seq("seg", "band"), k = 4).count() === 0L)
    val stats = Diagnostics.kAnonymityStats(df, Seq("seg", "band"), k = 4)
      .as[(Long, Long, Long, Long)].head()
    assert(stats === ((2L, 0L, 0L, 0L)))
  }

  test("joinExplosionBound flags the hot-key product, stays quiet when balanced") {
    val hotA = ((1 to 2000).map(_ => 7L) ++ (10001L to 12000L)).toDF("k")
    val hotB = ((1 to 3000).map(_ => 7L) ++ (20001L to 22000L)).toDF("k")
    val bound = Diagnostics.joinExplosionBound(hotA, $"k", hotB, $"k", phi = 0.01)
      .as[(Long, Long, Long, Long)].head()
    // key 7 on both sides: 2000 × 3000 = 6M pair rows from ONE key
    assert(bound === ((6000000L, 1L, 4000L, 5000L)))

    val flatA = (1L to 4000L).toDF("k")
    val flatB = (1L to 4000L).toDF("k")
    val quiet = Diagnostics.joinExplosionBound(flatA, $"k", flatB, $"k", phi = 0.01)
      .as[(Long, Long, Long, Long)].head()
    assert(quiet._1 === 0L && quiet._2 === 0L)
  }

  test("tCloseness: zero for global-mirroring classes, max for a point mass") {
    // two classes, two buckets; class A mirrors the global 50/50 ->
    // t = 0; class B is a point mass in bucket 0 ->
    // cum_0 = |1/2 - 0/2... hand: EMD over m=2 buckets, divide by m-1=1
    val df = Seq(
      ("A", 0L), ("A", 1L), ("B", 0L), ("B", 0L))
      .toDF("cls", "b")
    val out = Diagnostics.tCloseness(df, Seq("cls"), "b", nBuckets = 2)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("t_bp")).toMap
    // global: bucket0=3, bucket1=1 (N=4)
    // A (n=2): cum0 = |1*4 - 3*2| = 2 -> plus cum1 = 0; t = 2/(2*4*1) = .25
    // B (n=2): cum0 = |2*4 - 3*2| = 2 -> t = .25... recompute:
    // A: c0=1: C0 = 1*4 - 3*2 = -2; |C0|=2; t = 2*1e4 / (2*4*1) = 2500
    // B: c0=2: C0 = 8-6 = 2; t = 2500
    assert(out == Map("A" -> 2500L, "B" -> 2500L))

    // a class identical to the global distribution scores exactly 0
    val mirror = Seq(
      ("M", 0L), ("M", 0L), ("M", 1L),
      ("O", 0L), ("O", 0L), ("O", 1L))
      .toDF("cls", "b")
    val m = Diagnostics.tCloseness(mirror, Seq("cls"), "b", nBuckets = 2)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("t_bp")).toMap
    assert(m == Map("M" -> 0L, "O" -> 0L))

    // extreme separation: each class a point mass in its own bucket
    val split = Seq(("P", 0L), ("P", 0L), ("Q", 1L), ("Q", 1L))
      .toDF("cls", "b")
    val s2 = Diagnostics.tCloseness(split, Seq("cls"), "b", nBuckets = 2)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("t_bp")).toMap
    // P: C0 = 2*4 - 2*2 = 4 -> t = 4e4/(2*4) = 5000 (= 0.5, the true EMD)
    assert(s2 == Map("P" -> 5000L, "Q" -> 5000L))
  }

  test("fdProfile: exact g3, held FDs certified, null semantics pinned") {
    // lhs=1 -> rhs always "a" (holds); lhs=2 -> {a:3, b:1} (g3=1);
    // lhs=3 -> {a:1, b:1} (g3=1); null lhs dropped; null rhs is a value
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), Some("a")),
      (Some(2L), Some("a")), (Some(2L), Some("a")), (Some(2L), Some("a")),
      (Some(2L), Some("b")),
      (Some(3L), Some("a")), (Some(3L), Some("b")),
      (None: Option[Long], Some("zzz")),
      (Some(4L), None: Option[String]), (Some(4L), None: Option[String]))
      .toDF("l", "r")
    val out = Diagnostics.fdProfile(df, Seq("l" -> "r")).head()
    assert(out.getAs[Long]("n_lhs") == 4L)        // 1,2,3,4 (null dropped)
    assert(out.getAs[Long]("n_violating") == 2L)  // 2 and 3
    assert(out.getAs[Long]("n_rows") == 10L)      // null-lhs row gone
    assert(out.getAs[Long]("g3_remove") == 2L)
    assert(!out.getAs[Boolean]("fd_holds"))

    // a real FD over two candidates unions to two rows, one certified
    val df2 = Seq((1L, "x", "p"), (2L, "x", "p"), (3L, "y", "q"))
      .toDF("id", "a", "b")
    val rows = Diagnostics.fdProfile(df2, Seq("a" -> "b", "b" -> "a"))
      .collect().map(r => (r.getString(0), r.getAs[Boolean]("fd_holds"),
        r.getAs[Long]("g3_remove"))).toSet
    assert(rows == Set(("a", true, 0L), ("b", true, 0L)))
  }
}
