package graft

import org.apache.spark.sql.functions._
import graft.operators._

class OperatorsSpec extends SparkSuite {
  import spark.implicits._

  private def dest = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("id", "name", "amount")

  private def incoming = Seq(
    (2L, "B2", 22.0), (4L, "d", 40.0)
  ).toDF("id", "name", "amount")

  test("Merge.upsert updates matched, inserts unmatched, keeps rest") {
    val out = Merge.upsert(dest, incoming, Seq("id"))
      .orderBy("id").as[(Long, String, Double)].collect()
    assert(out === Array((1L, "a", 10.0), (2L, "B2", 22.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("Merge.updateExisting discards unmatched incoming") {
    val out = Merge.updateExisting(dest, incoming, Seq("id"))
      .orderBy("id").as[(Long, String, Double)].collect()
    assert(out === Array((1L, "a", 10.0), (2L, "B2", 22.0), (3L, "c", 30.0)))
  }

  test("Merge.insertMissing returns only new keys") {
    val out = Merge.insertMissing(dest, incoming, Seq("id"))
      .as[(Long, String, Double)].collect()
    assert(out === Array((4L, "d", 40.0)))
  }

  test("Merge.deleteExcess finds dest rows absent from incoming") {
    val out = Merge.deleteExcess(dest, incoming, Seq("id"))
      .orderBy("id").as[(Long, String, Double)].collect()
    assert(out.map(_._1) === Array(1L, 3L))
  }

  test("Merge.deleteExcessScoped deletes only inside the batch's scopes") {
    // dest rows in 3 scopes; the batch touches scopes "en" and "de" only
    val d = Seq((1L, "en"), (2L, "en"), (3L, "de"), (4L, "fr"), (5L, "fr"))
      .toDF("id", "lang")
    val in = Seq((1L, "en"), (6L, "de")).toDF("id", "lang")
    val del = Merge.deleteExcessScoped(d, in, Seq("id"), Seq("lang"))
      .select("id").as[Long].collect().sorted
    // id 2 (en, not in batch) and 3 (de, not in batch) die;
    // fr rows 4 and 5 SURVIVE — their scope was never imported
    assert(del === Array(2L, 3L))
    // unscoped deleteExcess would also have wiped the fr rows
    val unscoped = Merge.deleteExcess(d, in, Seq("id"))
      .select("id").as[Long].collect().sorted
    assert(unscoped === Array(2L, 3L, 4L, 5L))
  }

  test("Assortments.rebuildWithFlag activates rebuilt rows, deactivates stale") {
    val users = Seq((10L, "A"), (11L, "A"), (12L, "B"))
      .toDF("user_id", "seg")
    val prods = Seq(("A", 100L), ("A", 101L), ("B", 200L))
      .toDF("seg", "part_key")
    val existing = Seq((10L, 100L), (10L, 999L)) // 999 is stale
      .toDF("user_id", "part_key")
    val out = Assortments.rebuildWithFlag(existing, users, prods, "seg",
      Seq("user_id", "part_key"), "active")
      .orderBy("user_id", "part_key")
      .as[(Long, Long, Boolean)].collect()
    assert(out === Array(
      (10L, 100L, true), (10L, 101L, true), (10L, 999L, false),
      (11L, 100L, true), (11L, 101L, true), (12L, 200L, true)))
  }

  test("Salt.saltedCountDistinct equals plain countDistinct") {
    val df = Seq((1, 10), (1, 10), (1, 11), (1, 12), (2, 10), (2, 10))
      .toDF("k", "v")
    val salted = Salt.saltedCountDistinct(df, Seq("k"), col("v"), "n", buckets = 4)
      .orderBy("k").as[(Int, Long)].collect()
    val plain = df.groupBy("k").agg(countDistinct(col("v")).as("n"))
      .orderBy("k").as[(Int, Long)].collect()
    assert(salted === plain)
    assert(salted === Array((1, 3L), (2, 1L)))
  }

  test("RangeJoin.byBucket: inclusive bounds, overlaps multi-match, wide intervals span buckets") {
    val l = Seq((1L, 0L), (2L, 10L), (3L, 25L), (4L, 99L)).toDF("id", "v")
    val r = Seq((0L, 10L, "a"), (10L, 30L, "b"), (0L, 100L, "wide"))
      .toDF("lo", "hi", "band")
    val out = RangeJoin.byBucket(l, r, "v", "lo", "hi", bucketWidth = 7L)
      .select("id", "band").as[(Long, String)].collect().toSet
    assert(out === Set(
      (1L, "a"), (1L, "wide"),
      (2L, "a"), (2L, "b"), (2L, "wide"), // v=10 on both inclusive bounds
      (3L, "b"), (3L, "wide"),
      (4L, "wide")))
  }

  test("Scd.applyType2: changed keys close+reopen, history rows untouched") {
    val dest = Seq(
      (1, "a", "2019-01-01", Some("2020-01-01"), false), // history row
      (1, "a2", "2020-01-01", None, true),
      (2, "b", "2020-01-01", None, true),
      (3, "c", "2020-01-01", None, true))
      .toDF("id", "v", "valid_from", "valid_to", "is_current")
    val incoming = Seq((1, "a3"), (2, "b"), (4, "d")).toDF("id", "v")
    val out = Scd.applyType2(dest, incoming, Seq("id"), Seq("v"), "2024-06-01")
      .orderBy("id", "valid_from")
      .as[(Int, String, String, Option[String], Boolean)].collect()
    assert(out === Array(
      (1, "a", "2019-01-01", Some("2020-01-01"), false), // untouched history
      (1, "a2", "2020-01-01", Some("2024-06-01"), false), // closed
      (1, "a3", "2024-06-01", None, true),                // reopened
      (2, "b", "2020-01-01", None, true),                 // unchanged
      (3, "c", "2020-01-01", None, true),                 // absent from batch
      (4, "d", "2024-06-01", None, true)))                // new key
  }

  test("Scd.applyType2Feed: multi-version chains, delete leaves no current row") {
    val dest = Seq((1, "a", "t0", None: Option[String], true),
      (2, "b", "t0", None: Option[String], true))
      .toDF("id", "v", "valid_from", "valid_to", "is_current")
    val changes = Seq(
      (1, Option("a1"), "t1", "U"), (1, Option("a2"), "t2", "U"),
      (1, None: Option[String], "t3", "D"), // trailing delete
      (3, Option("c1"), "t1", "U"))         // new key
      .toDF("id", "v", "ts", "op")
    val out = Scd.applyType2Feed(dest, changes, Seq("id"), "ts", "op")
      .orderBy("id", "valid_from")
      .as[(Int, String, String, Option[String], Boolean)].collect()
    assert(out === Array(
      (1, "a", "t0", Some("t1"), false),  // open row closed at first change
      (1, "a1", "t1", Some("t2"), false),
      (1, "a2", "t2", Some("t3"), false), // closed by the delete, no current
      (2, "b", "t0", None, true),         // untouched key
      (3, "c1", "t1", None, true)))       // new key current
  }

  test("Scd.pitJoin: each fact row gets its own instant's version; retired keys null") {
    // key 1: v1 [0,10), v2 [10,20), retired at 20. key 2: v1 [0,∞).
    val dim = Seq(
      (1, 0, Option(10), "v1"), (1, 10, Option(20), "v2"),
      (2, 0, None: Option[Int], "w1"))
      .toDF("id", "valid_from", "valid_to", "seg")
    val fact = Seq((1, 5), (1, 10), (1, 19), (1, 25), (2, 99), (3, 1))
      .toDF("id", "t")
    val out = Scd.pitJoin(fact, dim, Seq("id"), "t", Seq("seg"))
      .orderBy("id", "t")
      .as[(Int, Int, Option[String])].collect()
    assert(out === Array(
      (1, 5, Some("v1")),
      (1, 10, Some("v2")),  // boundary: vf == t is inclusive, v1 excluded
      (1, 19, Some("v2")),
      (1, 25, None),        // retired before t → stale version nulled
      (2, 99, Some("w1")),  // open-ended version
      (3, 1, None)))        // key never in the dimension
  }

  test("Scd.pitJoin equals the interval-containment join on random histories") {
    val rnd = new scala.util.Random(11)
    // per key: versions at sorted cut points (non-overlapping by
    // construction), last one open for half the keys
    val dims = (1 to 40).flatMap { k =>
      val cuts = Seq.fill(rnd.nextInt(4) + 1)(rnd.nextInt(100)).distinct.sorted
      val open = k % 2 == 0
      cuts.zipWithIndex.map { case (c, i) =>
        val to = if (i + 1 < cuts.length) Option(cuts(i + 1))
          else if (open) None else Option(c + rnd.nextInt(10) + 1)
        (k, c, to, s"k$k-v$i")
      }
    }
    val dim = dims.toDF("id", "valid_from", "valid_to", "seg")
    val fact = Seq.fill(500)((rnd.nextInt(45) + 1, rnd.nextInt(120))).toDF("id", "t")
    val got = Scd.pitJoin(fact, dim, Seq("id"), "t", Seq("seg"))
      .orderBy("id", "t", "dim_seg")
      .as[(Int, Int, Option[String])].collect().toSeq
    val want = fact.join(dim,
        fact("id") === dim("id") && dim("valid_from") <= fact("t") &&
          (dim("valid_to").isNull || dim("valid_to") > fact("t")), "left")
      .select(fact("id"), col("t"), col("seg").as("dim_seg"))
      .orderBy("id", "t", "dim_seg")
      .as[(Int, Int, Option[String])].collect().toSeq
    assert(got === want)
  }

  test("AsOf.joinAsOf: inclusive latest-at-or-before per key, null before first") {
    val l = Seq((1L, 5, "e1"), (1L, 10, "e2"), (1L, 20, "e3"), (2L, 7, "e4"))
      .toDF("k", "t", "name")
    val r = Seq((1L, 10, 100.0), (1L, 15, 150.0), (2L, 9, 900.0))
      .toDF("k", "t", "price")
    val out = AsOf.joinAsOf(l, r, Seq("k"), "t", Seq("price"))
      .orderBy("k", "t")
      .select("k", "t", "name", "asof_price")
      .as[(Long, Int, String, Option[Double])].collect()
    assert(out === Array(
      (1L, 5, "e1", None),           // before any right row
      (1L, 10, "e2", Some(100.0)),   // equal ts is INCLUSIVE
      (1L, 20, "e3", Some(150.0)),   // latest at-or-before wins
      (2L, 7, "e4", None)))          // other key unaffected
  }

  test("Merge.applyCdc: latest change per key wins, tombstones delete") {
    val dest = Seq((1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)).toDF("id", "v", "x")
    val changes = Seq(
      (1, Option("a1"), Option(10.0), 1, "U"),
      (1, Option("a2"), Option(20.0), 2, "U"), // higher version wins
      (2, None: Option[String], None: Option[Double], 5, "D"), // tombstone
      (4, Option("d"), Option(4.0), 1, "I"))   // insert
      .toDF("id", "v", "x", "ver", "op")
    val out = Merge.applyCdc(dest, changes, Seq("id"), "ver", "op")
      .orderBy("id").as[(Int, String, Double)].collect()
    assert(out === Array((1, "a2", 20.0), (3, "c", 3.0), (4, "d", 4.0)))
  }

  test("Merge.flagMissing flags presence without dropping rows") {
    val out = Merge.flagMissing(dest, incoming, Seq("id"), "present")
      .orderBy("id").select("id", "present").as[(Long, Boolean)].collect()
    assert(out === Array((1L, false), (2L, true), (3L, false)))
  }

  test("Merge.upsert with partial incoming columns keeps dest values") {
    val slim = Seq((2L, "B2")).toDF("id", "name")
    val out = Merge.upsert(dest, slim, Seq("id"))
      .orderBy("id").as[(Long, String, Double)].collect()
    assert(out(1) === ((2L, "B2", 20.0))) // amount untouched
  }

  test("Dedup.keepFirst keeps deterministic first per key") {
    val df = Seq((1L, 2, "x"), (1L, 1, "y"), (2L, 5, "z")).toDF("k", "ord", "v")
    val out = Dedup.keepFirst(df, Seq("k"), Seq(col("ord")))
      .orderBy("k").as[(Long, Int, String)].collect()
    assert(out === Array((1L, 1, "y"), (2L, 5, "z")))
  }

  test("ListColumns pack → unpackWithPos round-trips") {
    val df = Seq((1, "b"), (1, "a"), (2, "c")).toDF("k", "v")
    val packed = ListColumns.pack(df, Seq("k"), col("v"), "vs")
    val p = packed.orderBy("k").as[(Int, String)].collect()
    assert(p === Array((1, "\"a\",\"b\""), (2, "\"c\"")))
    val unpacked = ListColumns.unpackWithPos(packed, col("vs"), ",", "pos", "item")
      .select(col("k"), col("pos"), translate(col("item"), "\"", "").as("item"))
      .orderBy("k", "pos").as[(Int, Int, String)].collect()
    assert(unpacked === Array((1, 0, "a"), (1, 1, "b"), (2, 0, "c")))
  }

  test("pack's hot-key state is output-inherent: the cell grows one-for-one with the key") {
    // a planted hot key with 200k relation rows next to normal keys —
    // the packed cell must carry every element (the list IS the declared
    // output, so no bounded aggregate could hold less), and keySkew
    // flags the key pre-flight as the doc contract prescribes
    val hot = (0 until 200000).map(i => ("hot", f"v$i%06d"))
    val cold = (0 until 50).map(i => (s"k${i % 5}", f"c$i%06d"))
    val df = (hot ++ cold).toDF("k", "v").repartition(8)
    val packed = ListColumns.pack(df, Seq("k"), col("v"), "vs")
      .withColumn("n_elems", size(split(col("vs"), ",")))
      .withColumn("cell_len", length(col("vs")))
    val rows = packed.select("k", "n_elems", "cell_len")
      .as[(String, Int, Int)].collect()
      .map { case (k, n, l) => k -> ((n, l)) }.toMap
    val (hn, hl) = rows("hot")
    assert(hn === 200000)
    // every element is "vNNNNNN" = 9 chars quoted + comma: exact size
    assert(hl === 200000 * 10 - 1)
    (0 until 5).foreach(i => assert(rows(s"k$i")._1 === 10))
    // the pre-flight contract: keySkew surfaces the hot key loudly
    val skew = graft.operators.Diagnostics.keySkew(df, col("k"), phi = 0.01)
      .filter(col("key") === "hot").select("share_bp").as[Long].collect()
    assert(skew.length === 1 && skew.head > 9900L) // >99% of all rows
  }

  test("packOrdered aligns parallel lists by the shared sort column") {
    val df = Seq((1, "g2", 20), (1, "g1", 10), (2, "g9", 5)).toDF("k", "g", "sortv")
    val names = ListColumns.packOrdered(df, Seq("k"), col("g"), col("sortv"), "groups")
    val sorts = ListColumns.packOrdered(df, Seq("k"), col("sortv"), col("sortv"), "sorting")
    val joined = names.join(sorts, Seq("k")).orderBy("k")
      .as[(Int, String, String)].collect()
    assert(joined === Array(
      (1, "\"g1\",\"g2\"", "\"10\",\"20\""),
      (2, "\"g9\"", "\"5\"")))
  }

  test("PivotOps.toLong drops null cells and inverts toWide") {
    val kv = Seq((1, "x", 5.0), (1, "y", 6.0), (2, "x", 7.0)).toDF("k", "f", "v")
    val wide = PivotOps.toWide(kv, Seq("k"), "f", first(col("v")), Seq("x", "y"))
    val long = PivotOps.toLong(wide, Seq("k"), Seq("x", "y"), "f", "v")
      .orderBy("k", "f").as[(Int, String, Double)].collect()
    assert(long === Array((1, "x", 5.0), (1, "y", 6.0), (2, "x", 7.0)))
  }

  test("PivotOps.toLong dropEmpty treats empty-string cells as absent " +
    "(IgnoreEmptyCategoryFieldValues ON, EcomDestinationWriter.cs:1494)") {
    val wide = Seq((1, "red", ""), (2, "", "large"), (3, null, "small"))
      .toDF("k", "color", "size")
    val off = PivotOps.toLong(wide, Seq("k"), Seq("color", "size"), "f", "v")
      .orderBy("k", "f").as[(Int, String, String)].collect()
    // OFF: empty strings ARE emitted (only nulls drop)
    assert(off === Array((1, "color", "red"), (1, "size", ""),
      (2, "color", ""), (2, "size", "large"), (3, "size", "small")))
    val on = PivotOps.toLong(wide, Seq("k"), Seq("color", "size"), "f", "v",
      dropEmpty = true).orderBy("k", "f").as[(Int, String, String)].collect()
    assert(on === Array((1, "color", "red"), (2, "size", "large"),
      (3, "size", "small")))
    // non-string values are unaffected by the toggle
    val num = Seq((1, 0.0)).toDF("k", "x")
    assert(PivotOps.toLong(num, Seq("k"), Seq("x"), "f", "v",
      dropEmpty = true).count() === 1L)
  }

  test("PivotOps.toWideDynamic discovers columns, ignores null keys, enforces cap") {
    val kv = Seq((1, Some("x"), 5.0), (1, Some("y"), 6.0), (2, Some("x"), 7.0),
      (2, None, 9.0)).toDF("k", "f", "v")
    val wide = PivotOps.toWideDynamic(kv, Seq("k"), "f", first(col("v")))
    assert(wide.columns.toSeq === Seq("k", "x", "y")) // sorted, no null column
    val rows = wide.orderBy("k").as[(Int, Option[Double], Option[Double])].collect()
    assert(rows === Array((1, Some(5.0), Some(6.0)), (2, Some(7.0), None)))
    val err = intercept[IllegalArgumentException] {
      PivotOps.toWideDynamic(kv, Seq("k"), "f", first(col("v")), maxColumns = 1)
    }
    assert(err.getMessage.contains("more than 1"))
  }

  test("Propagate.fillFromParent inherits parent values on null children") {
    val df = Seq(
      (1L, 1, Some("P")), (1L, 2, None), (1L, 3, Some("own")),
      (2L, 1, None), (2L, 2, None)
    ).toDF("k", "line", "note")
    val out = Propagate.fillFromParent(df, Seq("k"), col("line") === 1, Seq("note"))
      .orderBy("k", "line").as[(Long, Int, Option[String])].collect()
    assert(out === Array(
      (1L, 1, Some("P")), (1L, 2, Some("P")), (1L, 3, Some("own")),
      (2L, 1, None), (2L, 2, None)))
  }

  test("SurrogateKeys.assign is dense, ordered, deterministic") {
    val df = Seq(("c", 3), ("a", 1), ("b", 2)).toDF("name", "x")
    val out = SurrogateKeys.assign(df, Seq(col("name")), "id", startAt = 100L)
      .select("name", "id").orderBy("id").as[(String, Long)].collect()
    assert(out === Array(("a", 100L), ("b", 101L), ("c", 102L)))
  }

  test("ColumnRules: mergedValue concatenates in order, defaults fill blanks") {
    val df = Seq((Some("a"), Some("b")), (None, Some("x")), (None, None))
      .toDF("c1", "c2")
    val out = df.select(
      ColumnRules.mergedValue(Seq(col("c1"), col("c2"))).as("m"),
      ColumnRules.withDefault(col("c1"), "DEF").as("d"),
      ColumnRules.prefixedId("ImportedPRICE", lit(7)).as("p"))
      .as[(String, String, String)].collect()
    assert(out === Array(("ab", "a", "ImportedPRICE7"), ("x", "DEF", "ImportedPRICE7"),
      ("", "DEF", "ImportedPRICE7")))
  }

  test("Denormalize.resolve broadcasts and missingRefs finds gaps") {
    val facts = Seq((1, "US"), (2, "DE"), (3, "XX")).toDF("id", "cc")
    val dim = Seq(("US", "United States"), ("DE", "Germany")).toDF("code", "cname")
    val resolved = Denormalize.resolve(facts, dim, Seq("cc" -> "code"), Seq("cname" -> "country"))
      .orderBy("id").select("id", "country").as[(Int, Option[String])].collect()
    assert(resolved === Array((1, Some("United States")), (2, Some("Germany")), (3, None)))
    val missing = Denormalize.missingRefs(facts, "cc", dim, "code").as[String].collect()
    assert(missing === Array("XX"))
  }

  test("Dedup.againstHistory == plain left_anti; nulls survive; gate in plan") {
    val batch = ((0 until 400).map(i => (i.toLong, s"key${i % 150}")) :+
      (9999L, null.asInstanceOf[String])).toDF("row_id", "k")
    val history = (0 until 150).filter(_ % 3 == 0).map(i => s"key$i").toDF("k")
    val got = Dedup.againstHistory(batch, history, Seq("k"), expectedItems = 1000)
    val want = batch.join(history, Seq("k"), "left_anti")
    assert(got.select("row_id").as[Long].collect().sorted ===
      want.select("row_id").as[Long].collect().sorted)
    // the null-keyed row is never a duplicate under SQL equality
    assert(got.filter(col("row_id") === 9999L).count() === 1)
    // the bloom gate is actually in the plan (local relations above get
    // constant-folded, so assert on a range-derived frame): the misses
    // branch is a JOIN-FREE filter on !might_contain — only bloom hits
    // reach the anti join
    val big = spark.range(1000).select(col("id"),
      concat(lit("key"), col("id") % 150).as("k"))
    val gated = Dedup.againstHistory(big, history, Seq("k"), expectedItems = 1000)
    val plan = gated.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(2000))
    assert(gated.count() === big.join(history, Seq("k"), "left_anti").count())
  }

  test("Dedup.againstHistory: empty history is identity, full history empties") {
    val batch = Seq((1L, "a"), (2L, "b")).toDF("row_id", "k")
    val empty = Seq.empty[String].toDF("k")
    assert(Dedup.againstHistory(batch, empty, Seq("k"), 100).count() === 2)
    assert(Dedup.againstHistory(batch, batch.select("k"), Seq("k"), 100).count() === 0)
  }

  test("saltedJoin == plain join exactly, duplicates included, hot key spread") {
    import graft.operators.Salt
    // hot key 7 with duplicate rows on BOTH sides (multiset semantics)
    val big = ((1 to 500).map(_ => (7L, "hot")) ++
      (1L to 300L).map(i => (i, s"b$i")) :+ ((8L, "dupA")) :+ ((8L, "dupA")))
      .toDF("k", "bv")
    val small = (Seq((7L, "s7"), (7L, "s7x"), (8L, "s8")) ++
      (1L to 100L).map(i => (i, s"s$i"))).toDF("k", "sv")
    val salted = Salt.saltedJoin(big, small, Seq("k"), buckets = 8)
    val plain = big.join(small, Seq("k"))
      .select((big.columns ++ Seq("sv")).map(col): _*)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(df.columns.map(col): _*).collect().toSeq
    assert(canon(salted) === canon(plain))
    // the hot key's IDENTICAL rows actually spread (the rand salt —
    // a content hash would pin all 500 copies to one bucket)
    val spread = big.filter($"k" === 7L)
      .withColumn("__salt", (rand(7) * 8).cast("int"))
      .select("__salt").distinct().count()
    assert(spread >= 4, s"hot key spread over $spread buckets")
  }

  test("Debounce.suppress: reset-on-keep semantics, not gap-sessionization") {
    import graft.operators.Debounce
    // minutes 0, 5, 9, 14 with a 10-min gap: debounce keeps {0, 14}
    // (14 is ≥10 past the last KEPT at 0); gap-sessions would merge all
    // four (every adjacent gap < 10) and keep only {0}
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    val df = Seq((1L, "u1", ts(0)), (2L, "u1", ts(5)), (3L, "u1", ts(9)),
      (4L, "u1", ts(14)), (5L, "u2", ts(3)))
      .toDF("event_id", "user_id", "ts")
    val kept = Debounce.suppress(df, Seq("user_id"), "ts",
      minGapMicros = 10L * 60 * 1000000, tiebreak = Seq("event_id"))
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(1L, 4L, 5L))
    // exactly-at-gap boundary keeps (>= semantics)
    val edge = Seq((1L, "u", ts(0)), (2L, "u", ts(10)))
      .toDF("event_id", "user_id", "ts")
    assert(Debounce.suppress(edge, Seq("user_id"), "ts",
      10L * 60 * 1000000).count() === 2)
  }

  test("Debounce.suppressChunked == suppress on a bursty hot key, scanned in parallel") {
    import graft.operators.Debounce
    def rng(seed: Long): Iterator[Long] =
      Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L).drop(1)
    val r = rng(41L)
    val gap = 60L * 1000000 // 1 minute
    val base = 1700000000000000L
    // hot key u0: 60 bursts separated by ≥ gap quiet spans, each burst a
    // dense run of sub-gap steps (incl. exact-boundary steps inside and
    // between bursts); plus normal keys
    var t = base
    val hot = (0 until 60).flatMap { _ =>
      t += gap + (r.next().abs % (3 * gap)) // quiet span ≥ gap
      (0 until (1 + (r.next().abs % 20)).toInt).map { _ =>
        t += r.next().abs % gap // dense step < gap (0 allowed: ties)
        ("u0", t)
      }
    }
    val cold = (1 to 200).map(i =>
      (s"u${1 + i % 7}", base + (r.next().abs % (500 * gap))))
    val df = (hot ++ cold).zipWithIndex.map { case ((u, micros), i) =>
      val ts = new java.sql.Timestamp(micros / 1000)
      ts.setNanos((micros % 1000000).toInt * 1000)
      (i.toLong, u, ts)
    }.toDF("event_id", "user_id", "ts")
    def ids(out: org.apache.spark.sql.DataFrame) =
      out.select("event_id").as[Long].collect().sorted.toSeq
    val plain = ids(Debounce.suppress(df, Seq("user_id"), "ts", gap,
      tiebreak = Seq("event_id")))
    val chunked = ids(Debounce.suppressChunked(df, Seq("user_id"), "ts", gap,
      tiebreak = Seq("event_id")))
    assert(chunked === plain)
    // the hot key really splits: its scan runs as many independent
    // groups as bursts, not one (the wall-clock fix being claimed)
    import org.apache.spark.sql.functions.{col => c, floor => fl, unix_micros, min => mn, max => mx, lag, sum => sm}
    val cells = df.filter(c("user_id") === "u0")
      .groupBy(fl(unix_micros(c("ts")) / gap).as("cell"))
      .agg(mn(unix_micros(c("ts"))).as("lo"), mx(unix_micros(c("ts"))).as("hi"))
      .orderBy("cell").as[(Long, Long, Long)].collect()
    val nChunks = cells.sliding(2).count {
      case Array((pc, _, phi), (cc, clo, _)) => cc > pc + 1 || clo - phi >= gap
      case _ => false
    } + 1
    assert(nChunks > 10, s"bursty key should split into many chunks, got $nChunks")
  }
}
