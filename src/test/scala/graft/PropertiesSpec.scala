package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.{Dedup, Merge}
import graft.plans.TableOrder

/** Property-based checks over the algebraic operator laws. */
class PropertiesSpec extends AnyFunSuite {

  // seeded scalacheck sampling (the scalatest bridge isn't on the
  // classpath; deterministic seeds keep runs reproducible)
  private def samples[T](g: Gen[T], n: Int): Seq[T] = {
    val params = Gen.Parameters.default
    Iterator.iterate(Seed(42L))(_.next).take(n)
      .flatMap(seed => g.apply(params, seed)).toSeq
  }
  private lazy val spark = SparkSuite.session
  import spark.implicits._

  private val rowsGen: Gen[List[(Long, String, Double)]] =
    Gen.listOfN(12, for {
      id <- Gen.chooseNum(0L, 6L)
      name <- Gen.alphaStr.map(_.take(4))
      amt <- Gen.chooseNum(0, 1000).map(_.toDouble)
    } yield (id, name, amt))

  test("bounded_distinct(struct) == slice(array_sort(collect_set)) on random data with null fields") {
    // the struct-element bounded aggregate must agree with the classic
    // formulation under the cap — including null FIELD ordering (both
    // sort nulls first, ascending) and string fields — for any limit
    val gen = Gen.listOfN(40, for {
      g <- Gen.chooseNum(0, 2)
      a <- Gen.option(Gen.chooseNum(0L, 9L))
      b <- Gen.option(Gen.alphaStr.map(_.take(3)))
    } yield (g, a, b))
    for ((rows, limit) <- samples(gen, 5).zip(Seq(1, 2, 5, 100, 3))) {
      val df = rows.toDF("g", "a", "b")
      val bounded = df.groupBy("g").agg(
        graft.functions.BoundedDistinct.boundedDistinct(
          struct($"a", $"b"), limit).as("m"))
        .select($"g", $"m".cast("string")).as[(Int, String)].collect().sorted.toSeq
      val classic = df.groupBy("g").agg(
        slice(array_sort(collect_set(struct($"a", $"b"))), 1, limit).as("m"))
        .select($"g", $"m".cast("string")).as[(Int, String)].collect().sorted.toSeq
      assert(bounded === classic, s"limit=$limit rows=$rows")
    }
  }

  test("upsert is idempotent: applying the same batch twice changes nothing") {
    for ((destRows, inRows) <- samples(rowsGen, 5).zip(samples(rowsGen, 5).reverse)) {
      {
        val dest = Dedup.keepFirst(
          destRows.toDF("id", "name", "amount"), Seq("id"), Seq(col("name"), col("amount")))
        val in = Dedup.keepFirst(
          inRows.toDF("id", "name", "amount"), Seq("id"), Seq(col("name"), col("amount")))
        val once = Merge.upsert(dest, in, Seq("id"))
        val twice = Merge.upsert(once, in, Seq("id"))
        assert(once.orderBy("id", "name", "amount").collect().toSeq ===
          twice.orderBy("id", "name", "amount").collect().toSeq)
      }
    }
  }

  test("upsert row set = dest keys ∪ incoming keys") {
    for ((destRows, inRows) <- samples(rowsGen, 5).zip(samples(rowsGen, 5).reverse)) {
      val dest = Dedup.keepFirst(
        destRows.toDF("id", "name", "amount"), Seq("id"), Seq(col("name"), col("amount")))
      val in = Dedup.keepFirst(
        inRows.toDF("id", "name", "amount"), Seq("id"), Seq(col("name"), col("amount")))
      val out = Merge.upsert(dest, in, Seq("id"))
      val expect = (destRows.map(_._1) ++ inRows.map(_._1)).toSet
      assert(out.select("id").as[Long].collect().toSet === expect)
      assert(out.count() === expect.size)
    }
  }

  test("keepFirst is idempotent and never grows") {
    for (rows <- samples(rowsGen, 5)) {
      val df = rows.toDF("id", "name", "amount")
      val d1 = Dedup.keepFirst(df, Seq("id"), Seq(col("name"), col("amount")))
      val d2 = Dedup.keepFirst(d1, Seq("id"), Seq(col("name"), col("amount")))
      assert(d1.count() <= rows.size)
      assert(d1.orderBy("id").collect().toSeq === d2.orderBy("id").collect().toSeq)
    }
  }

  test("againstHistory equals plain left_anti on random batch/history splits") {
    val gen = Gen.listOfN(120, Gen.zip(Gen.choose(0L, 40L), Gen.choose(0, 3)))
    for ((pairs, i) <- samples(gen, 4).zipWithIndex) {
      // keys collide heavily on purpose; route ~half the rows to history
      val all = pairs.zipWithIndex.map { case ((k, r), j) => (j.toLong, s"key$k$r") }
      val batch = all.filter(_._1 % 2 == 0).toDF("row_id", "k")
      val history = all.filter(_._1 % 2 == 1).map(_._2).toDF("k")
      // tiny bloom for sample i=0 forces a high fpp — the exact join must
      // still correct every false positive
      val expected = if (i == 0) 2L else 1000L
      val got = Dedup.againstHistory(batch, history, Seq("k"), expected)
        .select("row_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
        .collect().sorted
      val want = batch.join(history, Seq("k"), "left_anti")
        .select("row_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
        .collect().sorted
      assert(got === want)
    }
  }

  test("asof join equals the naive per-row latest-at-or-before on random data") {
    import graft.operators.AsOf
    val leftGen = Gen.listOfN(15, for {
      k <- Gen.chooseNum(0L, 3L); t <- Gen.chooseNum(0, 50)
    } yield (k, t))
    val rightGen = Gen.listOfN(10, for {
      k <- Gen.chooseNum(0L, 3L); t <- Gen.chooseNum(0, 50)
    } yield (k, t))
    for ((lRows, rRows0) <- samples(leftGen, 4).zip(samples(rightGen, 4).reverse)) {
      // right must be unique per (k, t): keep max payload as tiebreak
      val rRows = rRows0.groupBy(identity).keys.toList
        .map { case (k, t) => (k, t, k * 1000.0 + t) }
      val l = lRows.toDF("k", "t")
      val r = rRows.toDF("k", "t", "price")
      val got = AsOf.joinAsOf(l, r, Seq("k"), "t", Seq("price"))
        .select("k", "t", "asof_price")
        .as[(Long, Int, Option[Double])].collect().sorted
      val naive = lRows.map { case (k, t) =>
        val cands = rRows.filter(rr => rr._1 == k && rr._2 <= t)
        (k, t, if (cands.isEmpty) None else Some(cands.maxBy(_._2)._3))
      }.sorted
      assert(got.toSeq === naive)

      // forward: earliest at-or-after
      val gotF = AsOf.joinAsOf(l, r, Seq("k"), "t", Seq("price"),
        direction = "forward")
        .select("k", "t", "asof_price")
        .as[(Long, Int, Option[Double])].collect().sorted
      val naiveF = lRows.map { case (k, t) =>
        val cands = rRows.filter(rr => rr._1 == k && rr._2 >= t)
        (k, t, if (cands.isEmpty) None else Some(cands.minBy(_._2)._3))
      }.sorted
      assert(gotF.toSeq === naiveF)

      // nearest: closer of the two, exact ties prefer backward
      val gotN = AsOf.joinAsOf(l, r, Seq("k"), "t", Seq("price"),
        direction = "nearest")
        .select("k", "t", "asof_price")
        .as[(Long, Int, Option[Double])].collect().sorted
      val naiveN = lRows.map { case (k, t) =>
        val back = rRows.filter(rr => rr._1 == k && rr._2 <= t)
          .sortBy(_._2).lastOption
        val fwd = rRows.filter(rr => rr._1 == k && rr._2 >= t)
          .sortBy(_._2).headOption
        val pick = (back, fwd) match {
          case (Some(b), Some(f)) =>
            if (f._2 - t < t - b._2) Some(f) else Some(b)
          case (b, f) => b.orElse(f)
        }
        (k, t, pick.map(_._3))
      }.sorted
      assert(gotN.toSeq === naiveN)
    }
  }

  test("range join equals the naive cross-filter on random data") {
    import graft.operators.RangeJoin
    val valGen = Gen.listOfN(20, Gen.chooseNum(0L, 100L))
    val bandGen = Gen.listOfN(6, for {
      lo <- Gen.chooseNum(0L, 90L); span <- Gen.chooseNum(0L, 40L)
    } yield (lo, lo + span))
    for ((vals, bands0) <- samples(valGen, 4).zip(samples(bandGen, 4).reverse)) {
      val bands = bands0.zipWithIndex.map { case ((lo, hi), i) => (lo, hi, s"b$i") }
      val l = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val r = bands.toDF("lo", "hi", "band")
      for (w <- Seq(3L, 17L, 100L)) { // bucket width must not affect results
        val got = RangeJoin.byBucket(l, r, "v", "lo", "hi", w)
          .select("id", "band").as[(Long, String)].collect().toSet
        val naive = (for {
          (v, i) <- vals.zipWithIndex
          (lo, hi, b) <- bands if v >= lo && v <= hi
        } yield (i.toLong, b)).toSet
        assert(got === naive, s"width $w")
      }
    }
  }

  test("hierarchy closure equals naive BFS reachability on random forests") {
    import graft.operators.Hierarchy
    val edgeGen = Gen.listOfN(12, for {
      c <- Gen.chooseNum(2L, 20L); p <- Gen.chooseNum(1L, 19L) if p < c
    } yield (c, p))
    for (edges0 <- samples(edgeGen, 4)) {
      // one parent per child (tree/forest), like the reference group tree
      val edges = edges0.groupBy(_._1).map(_._2.head).toList
      val cl = Hierarchy.closure(edges.toDF("c", "p"), "c", "p")
      val got = cl.as[(Long, Long, Int)].collect().toSet
      cl.unpersist()
      val parent = edges.toMap
      val naive = parent.keys.flatMap { start =>
        Iterator.iterate(Option(start))(_.flatMap(parent.get))
          .drop(1).takeWhile(_.isDefined).zipWithIndex
          .map { case (anc, d) => (start, anc.get, d + 1) }.toList
      }.toSet
      assert(got === naive)
    }
  }

  test("applyCdc is idempotent: re-applying the same feed changes nothing") {
    import graft.operators.Merge
    for ((destRows, chRows) <- samples(rowsGen, 4).zip(samples(rowsGen, 4).reverse)) {
      val dest = Dedup.keepFirst(
        destRows.toDF("id", "name", "amount"), Seq("id"), Seq(col("name"), col("amount")))
      val changes = Dedup.keepFirst(
        chRows.toDF("id", "name", "amount"), Seq("id"), Seq(col("name"), col("amount")))
        .withColumn("ver", lit(1))
        .withColumn("op", when(col("id") % 4 === 0, lit("D")).otherwise(lit("U")))
      val once = Merge.applyCdc(dest, changes, Seq("id"), "ver", "op")
      val twice = Merge.applyCdc(once, changes, Seq("id"), "ver", "op")
      assert(once.orderBy("id", "name", "amount").collect().toSeq ===
        twice.orderBy("id", "name", "amount").collect().toSeq)
    }
  }

  test("changeFeed: apply(old, feed) reproduces new on random snapshot pairs") {
    import graft.operators.Reconcile
    // mutation plan: drop ids, perturb values, add fresh ids — all from
    // seeded generators so failures replay
    val mutGen = for {
      rows <- Gen.listOfN(40, for {
        id <- Gen.chooseNum(1L, 60L)
        v <- Gen.chooseNum(0, 500).map(_.toDouble)
      } yield (id, v))
      dropMod <- Gen.chooseNum(2, 6)
      bumpMod <- Gen.chooseNum(2, 6)
    } yield (rows.distinctBy(_._1), dropMod, bumpMod)
    for ((rows, dropMod, bumpMod) <- samples(mutGen, 8)) {
      val oldDf = rows.toDF("id", "v")
      val newRows = rows.filter(_._1 % dropMod != 0)
        .map { case (id, v) => if (id % bumpMod == 0) (id, v + 1000) else (id, v) } ++
        (101L to 110L).map(i => (i, i.toDouble))
      val newDf = newRows.toDF("id", "v")
      val feed = Reconcile.changeFeed(oldDf, newDf, Seq("id"), Seq("v"))
      val applied = oldDf
        .join(feed.filter($"op" === "D").select("id"), Seq("id"), "left_anti")
        .unionByName(feed.filter($"op" === "I").drop("op"))
      assert(applied.orderBy("id", "v").collect().toSeq ===
        newDf.orderBy("id", "v").collect().toSeq,
        s"dropMod=$dropMod bumpMod=$bumpMod")
    }
  }

  test("TableOrder output is a permutation respecting every dependency") {
    val tablesGen = Gen.someOf(graft.sources.Tables.All).map(_.toList)
    for (tables <- samples(tablesGen, 20)) {
      val order = TableOrder.order(tables)
      assert(order.sorted === tables.sorted)
      for (t <- tables; dep <- TableOrder.StarSchemaDeps.getOrElse(t, Set.empty)
           if tables.contains(dep))
        assert(order.indexOf(dep) < order.indexOf(t), s"$dep must precede $t")
    }
  }
}
