package graft

import org.apache.spark.sql.functions._
import graft.operators.{IncrementalAgg, Profile}

class IncrementalProfileSpec extends SparkSuite {
  import spark.implicits._

  test("foldCdc(state, feed) == init(final table) on a random-ish feed") {
    val base = (1 to 300).map(i => (s"k${i % 11}", (i * 37 % 500) / 100.0))
    // feed: delete 40 existing rows (exact old values), insert 60 new
    val deletes = base.take(40).map { case (k, v) => (k, v, "D") }
    val inserts = (1 to 60).map(i => (s"k${i % 13}", (i * 91 % 700) / 100.0, "I"))
    val finalRows = base.drop(40) ++ inserts.map { case (k, v, _) => (k, v) }

    val state = IncrementalAgg.init(base.toDF("k", "v"), Seq("k"), $"v")
    val folded = IncrementalAgg.foldCdc(state,
      (deletes ++ inserts).toDF("k", "v", "op"), Seq("k"), $"v", $"op")
      .select($"k", $"n_rows", $"total".cast("double"))
      .as[(String, Long, Double)].collect().map { case (k, n, t) => k -> ((n, t)) }.toMap
    val direct = IncrementalAgg.init(finalRows.toDF("k", "v"), Seq("k"), $"v")
      .select($"k", $"n_rows", $"total".cast("double"))
      .as[(String, Long, Double)].collect().map { case (k, n, t) => k -> ((n, t)) }.toMap
    assert(folded === direct)
  }

  test("foldCdc removes fully-deleted keys and is idempotent over empty feeds") {
    val state = IncrementalAgg.init(
      Seq(("a", 1.0), ("a", 2.0), ("b", 5.0)).toDF("k", "v"), Seq("k"), $"v")
    val afterDelete = IncrementalAgg.foldCdc(state,
      Seq(("a", 1.0, "D"), ("a", 2.0, "D")).toDF("k", "v", "op"),
      Seq("k"), $"v", $"op")
    assert(afterDelete.select("k").as[String].collect().toSeq === Seq("b"))
    // second fold of an empty feed changes nothing (schema is stable too)
    val again = IncrementalAgg.foldCdc(afterDelete,
      Seq.empty[(String, Double, String)].toDF("k", "v", "op"),
      Seq("k"), $"v", $"op")
    assert(again.schema === afterDelete.schema)
    assert(again.as[(String, Long, java.math.BigDecimal)].collect().toSet ===
      afterDelete.as[(String, Long, java.math.BigDecimal)].collect().toSet)
  }

  test("foldCdcTopK: exact max under deletes, rebuild flagged only when exhausted") {
    val k = 8
    val base = for { g <- 0 until 4; i <- 1 to 50 }
      yield (s"g$g", ((i * 17 + g) % 97).toDouble)
    val df = base.toDF("g", "v")
    val state = IncrementalAgg.initTopK(df, Seq("g"), $"v", k)

    // g0: delete its entire kept top-k (exhausts the array -> rebuild);
    // g1: delete 5 arbitrary rows + insert a new maximum;
    // g2: untouched; g3: deletes below the kept range only
    val g0 = base.filter(_._1 == "g0").map(_._2).sorted.reverse
    val keptG0 = state.filter($"g" === "g0").select(explode($"topk"))
      .as[Double].collect().toSeq
    val g1 = base.filter(_._1 == "g1").map(_._2)
    val g3Low = base.filter(_._1 == "g3").map(_._2).sorted.take(5)
    val feed = (
      keptG0.map(v => ("g0", v, "D")) ++
      g1.take(5).map(v => ("g1", v, "D")) ++
      Seq(("g1", 500.0, "I")) ++
      g3Low.map(v => ("g3", v, "D"))
    ).toDF("g", "v", "op")

    val folded = IncrementalAgg.foldCdcTopK(state, feed, Seq("g"), $"v", $"op", k)
      .select($"g", $"n_rows", $"topk", $"needs_rebuild")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.getSeq[Double](2)).getOrElse(Seq.empty),
          r.getBoolean(3)))).toMap

    // final truth per group
    val finalRows = base.filterNot { case (g, v) =>
      (g == "g0" && keptG0.contains(v)) || // note: contains-by-value is
        (g == "g1" && g1.take(5).contains(v)) || // how the feed was built
        (g == "g3" && g3Low.contains(v))
    } :+ (("g1", 500.0))
    // value-equality deletion is ambiguous row-wise but max only needs
    // the multiset, and the feed deleted exact existing values
    assert(folded("g0")._3, "g0 exhausted its kept range")
    assert(!folded("g1")._3 && !folded("g2")._3 && !folded("g3")._3)
    for (g <- Seq("g1", "g2", "g3")) {
      val expectMax = finalRows.filter(_._1 == g).map(_._2).max
      assert(folded(g)._2.head === expectMax, s"$g max")
      assert(folded(g)._2 === folded(g)._2.sorted.reverse, s"$g sorted desc")
    }
    // rebuild path: re-derive the flagged key from the final table
    val rebuilt = IncrementalAgg.initTopK(
      finalRows.toDF("g", "v").filter($"g" === "g0"), Seq("g"), $"v", k)
      .select(explode($"topk")).as[Double].collect()
    assert(rebuilt.head === finalRows.filter(_._1 == "g0").map(_._2).max)
  }

  test("foldCdcTopK property: maintained max == truth on random feeds (rebuilds honored)") {
    def rng(seed: Long): Iterator[Long] =
      Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L).drop(1)
    for (seed <- Seq(3L, 19L, 77L)) {
      val r = rng(seed)
      val base = (1 to 240).map { i =>
        (s"g${r.next().abs % 6}", (r.next().abs % 1000).toDouble) }
      // delete a random 40% (exact existing rows), insert 60 fresh
      val (deleted, kept) = base.partition(_ => r.next().abs % 5 < 2)
      val inserts = (1 to 60).map { _ =>
        (s"g${r.next().abs % 6}", (r.next().abs % 1000).toDouble) }
      val finalRows = kept ++ inserts
      val feed = (deleted.map { case (g, v) => (g, v, "D") } ++
        inserts.map { case (g, v) => (g, v, "I") }).toDF("g", "v", "op")

      val k = 4 // small k so rebuilds actually trigger
      val folded = IncrementalAgg.foldCdcTopK(
        IncrementalAgg.initTopK(base.toDF("g", "v"), Seq("g"), $"v", k),
        feed, Seq("g"), $"v", $"op", k)
        .collect().map(row => row.getString(0) ->
          ((Option(row.getSeq[Double](2)).getOrElse(Seq.empty),
            row.getBoolean(3)))).toMap
      val truth = finalRows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      for ((g, maxV) <- truth) {
        val (topk, rebuild) = folded(g)
        if (!rebuild) assert(topk.head === maxV, s"seed $seed group $g")
        else assert(truth.contains(g), s"seed $seed rebuild flag on live key $g")
      }
      // fully-deleted keys leave the state; live keys all present
      assert(folded.keySet === truth.keySet, s"seed $seed key sets diverge")
    }
  }

  test("BoundedTopKMultiset: buffer never exceeds k copies through a 1M-row hot key") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.DoubleType
    import graft.functions.BoundedTopKMultiset
    val k = 8
    val agg = BoundedTopKMultiset(
      BoundReference(0, DoubleType, nullable = true), Literal(1L), k)
    val buf = agg.createAggregationBuffer()
    // one million rows of one key through ONE buffer: peak state is the
    // cap, not the row count (the collect_list failure mode, removed)
    var i = 0
    while (i < 1000000) {
      agg.update(buf, InternalRow((i % 997).toDouble))
      assert(buf.total <= k)
      i += 1
    }
    // partial-serialize stays capped too: ≤ k entries of 16 bytes
    assert(agg.serialize(buf).length <= 4 + 16 * k)
    // survivors are the k largest WITH multiplicity (996 recurs ~1003×)
    def arr(b: graft.functions.TopKMultisetBuffer): Seq[Double] =
      agg.eval(b).asInstanceOf[GenericArrayData].toDoubleArray().toSeq
    assert(arr(buf) === Seq.fill(k)(996.0))
    // merge of two capped buffers re-caps to the global top-k
    val other = agg.createAggregationBuffer()
    Seq(2000.0, 1500.0, 997.5).foreach(v => agg.update(other, InternalRow(v)))
    val merged = agg.merge(agg.deserialize(agg.serialize(buf)), other)
    assert(merged.total === k)
    assert(arr(merged) === Seq(2000.0, 1500.0, 997.5) ++ Seq.fill(k - 3)(996.0))
  }

  test("initTopK runs on the bounded aggregate and matches the classic formula") {
    val base = (1 to 400).map(i => (s"g${i % 5}", ((i * 31 + 7) % 113).toDouble))
    val df = base.toDF("g", "v")
    val k = 6
    val bounded = IncrementalAgg.initTopK(df, Seq("g"), $"v", k)
    // plan shape: no collect_list anywhere — a hot key can't buffer its history
    val plan = bounded.queryExecution.executedPlan.toString
    assert(plan.contains("bounded_topk"), plan)
    assert(!plan.contains("collect_list"), plan)
    val got = bounded.select($"g", $"topk").as[(String, Seq[Double])]
      .collect().toMap
    val classic = df.groupBy("g")
      .agg(slice(sort_array(collect_list($"v"), asc = false), 1, k).as("topk"))
      .as[(String, Seq[Double])].collect().toMap
    assert(got === classic)
    // weighted path: pre-counted (value, net) rows == expanded multiset
    val weighted = Seq(("a", 5.0, 3L), ("a", 9.0, 1L), ("a", 1.0, 10L))
      .toDF("g", "v", "n")
      .groupBy("g")
      .agg(graft.functions.BoundedTopK.topKDescWeighted($"v", $"n", 5).as("topk"))
      .select("topk").as[Seq[Double]].head()
    assert(weighted === Seq(9.0, 5.0, 5.0, 5.0, 1.0))
  }

  test("Profile.summarize counts rows, nulls, distincts per column") {
    val df = Seq(
      (Some(1), Some("x")), (Some(1), None), (Some(2), Some("y")), (None, Some("y"))
    ).toDF("a", "b")
    val got = Profile.summarize(df, Seq("a", "b"), approxDistinct = false)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === Map("a" -> ((4L, 1L, 2L)), "b" -> ((4L, 1L, 2L))))
    // approx path: exact null/row counts, sketched distincts within 2%
    val approx = Profile.summarize(df, Seq("a", "b"), approxDistinct = true)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(approx === Map("a" -> ((4L, 1L)), "b" -> ((4L, 1L))))
  }

  test("quantileBins splits into near-equal buckets with floored boundaries") {
    import graft.operators.Binning
    val df = (1 to 1000).map(i => i.toDouble + 0.5).toDF("v")
    val (binned, bounds) = Binning.quantileBins(df, $"v", Seq(0.25, 0.5, 0.75))
    // interpolated quartiles of 1.5..1000.5 are 251.25 / 501.0 / 750.75
    assert(bounds === Seq(251L, 501L, 750L))
    // the bounded-state approx path lands on the same floored boundaries
    // for this well-separated data (its summary state merges map-side —
    // the 100 TB path; exact percentile state is the full multiset)
    val (_, approxBounds) = Binning.quantileBins(df, $"v",
      Seq(0.25, 0.5, 0.75), approx = true)
    approxBounds.zip(bounds).foreach { case (a, e) =>
      assert(math.abs(a - e) <= 1L, s"$a vs $e")
    }
    // degenerate inputs fail with actionable messages, not NPEs
    val empty = Seq.empty[Double].toDF("v")
    val err = intercept[IllegalArgumentException](
      Binning.quantileBins(empty, $"v", Seq(0.5)))
    assert(err.getMessage.contains("no non-null values"))
    intercept[IllegalArgumentException](
      Binning.quantileBins(df, $"v", Seq(0.5, 0.5)))
    // collapsed floored boundaries are LOUD by default (a silent empty
    // bucket is a data bug), recoverable by opting in to stable indexes
    val narrow = (1 to 100).map(_ => 5.3).toDF("v") // all mass at one value
    val collide = intercept[IllegalArgumentException](
      Binning.quantileBins(narrow, $"v", Seq(0.25, 0.75)))
    assert(collide.getMessage.contains("collide"))
    val (collapsedDf, collapsedBounds) =
      Binning.quantileBins(narrow, $"v", Seq(0.25, 0.75), allowCollapsed = true)
    assert(collapsedBounds === Seq(5L, 5L)) // duplicates kept, indexes stable
    // every 5.3 lands in the LAST bucket (v >= both boundaries); the
    // middle bucket [5, 5) is empty by construction
    assert(collapsedDf.groupBy("bucket").count()
      .as[(Long, Long)].collect().toMap === Map(2L -> 100L))
    val sizes = binned.groupBy("bucket").count()
      .as[(Long, Long)].collect().toMap
    assert(sizes.keySet === Set(0L, 1L, 2L, 3L))
    assert(sizes.values.forall(n => n >= 245 && n <= 255), sizes)
  }

  test("Profile exact pass is ONE aggregate, approx pass has no Expand") {
    val df = (1 to 50).map(i => (i % 7, s"s${i % 5}")).toDF("a", "b")
    val exactPlan = Profile.summarize(df, Seq("a", "b"), approxDistinct = false)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"), exactPlan) // documented cost of exact
    val approxPlan = Profile.summarize(df, Seq("a", "b"), approxDistinct = true)
      .queryExecution.executedPlan.toString
    assert(!approxPlan.contains("Expand"), approxPlan) // single mergeable pass
    // no default: the exact→approx semantic choice is compile-enforced
    // on every caller (round 7, after the round-6 default flip)
  }

  test("incrementally maintained checksum == recompute after a CDC feed") {
    // sync validation at streaming speed: the digest is a plain decimal
    // sum, so IncrementalAgg keeps (n_rows, digest total) current under
    // inserts/deletes — no rescan of the fact table
    val base = (1 to 150).map(i => (s"g${i % 4}", i.toLong, s"v$i"))
    val deletes = base.take(30).map { case (g, id, v) => (g, id, v, "D") }
    val inserts = (151 to 190).map(i => (s"g${i % 4}", i.toLong, s"v$i", "I"))
    val finalRows = base.drop(30) ++ inserts.map { case (g, id, v, _) => (g, id, v) }

    val digest = Profile.rowDigest(Seq("id", "v"))
    val state0 = IncrementalAgg.init(base.toDF("g", "id", "v"), Seq("g"), digest)
    val state1 = IncrementalAgg.foldCdc(state0,
      (deletes ++ inserts).toDF("g", "id", "v", "op"), Seq("g"), digest, col("op"))
    val maintained = state1.select(col("g"), col("n_rows"),
      (col("total").cast("decimal(38,0)") % lit(4611686018427387904L))
        .cast("long").as("content_checksum"))
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    val recomputed = Profile.groupChecksum(
      finalRows.toDF("g", "id", "v"), Seq("g"), Seq("id", "v"))
      .orderBy("g").as[(String, Long, Long)].collect().toSeq
    assert(maintained === recomputed)
  }

  test("groupChecksum: order/partitioning-independent, any row change moves it") {
    val rows = (1 to 200).map(i => (s"g${i % 3}", i.toLong, s"v$i"))
    def sums(df: org.apache.spark.sql.DataFrame) =
      Profile.groupChecksum(df, Seq("g"), Seq("id", "v"))
        .orderBy("g").as[(String, Long, Long)].collect().toSeq
    val base = sums(rows.toDF("g", "id", "v"))
    // same rows, reversed arrival order, different partitioning
    assert(sums(rows.reverse.toDF("g", "id", "v").repartition(7)) === base)
    // one changed value in one group moves ONLY that group's checksum
    val mutated = sums(rows.updated(17, ("g0", 18L, "vX")).toDF("g", "id", "v"))
    assert(mutated.map(_._1) === base.map(_._1))
    assert(mutated.zip(base).count { case (m, b) => m._3 != b._3 } === 1)
    // null and the empty string digest differently
    val a = Profile.groupChecksum(Seq(("g", Option.empty[String])).toDF("g", "v"),
      Seq("g"), Seq("v")).select("content_checksum").as[Long].head()
    val b = Profile.groupChecksum(Seq(("g", Option(""))).toDF("g", "v"),
      Seq("g"), Seq("v")).select("content_checksum").as[Long].head()
    assert(a !== b)
  }
}
