package graft

import org.apache.spark.sql.functions._
import graft.dedup.NearDup

class NearDupSpec extends SparkSuite {
  import spark.implicits._

  /** Synthetic corpus with planted exact + near duplicates. */
  private def corpus = {
    val base = (0 until 20).map { i =>
      (i.toLong, (0 until 40).map(j => s"w${(i * 7 + j * 13) % 97}").mkString(" "))
    }
    val exactDup = Seq((100L, base(3)._2))
    val nearDup = Seq((101L, base(5)._2.replace("w68 ", "w68 EXTRA ")))
    val unrelated = Seq((102L, (0 until 40).map(j => s"z$j").mkString(" ")))
    (base ++ exactDup ++ nearDup ++ unrelated).toDF("doc_id", "text")
  }

  test("minhashPairs finds planted exact and near duplicates, not unrelated") {
    val pairs = NearDup.minhashPairs(corpus, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
    val keys = pairs.map(p => (p._1, p._2)).toSet
    assert(keys.contains((3L, 100L)))
    assert(keys.contains((5L, 101L)))
    assert(!pairs.map(_._1).contains(102L) && !pairs.map(_._2).contains(102L))
    val exact = pairs.find(p => (p._1, p._2) == ((3L, 100L))).get
    assert(exact._3 === 1.0)
  }

  test("minhash est_jaccard approximates exact jaccard on found pairs") {
    val pairs = NearDup.minhashPairs(corpus, "doc_id", "text", threshold = 0.5)
      .select("est_jaccard", "jaccard").as[(Double, Double)].collect()
    pairs.foreach { case (est, exact) => assert(math.abs(est - exact) < 0.35) }
  }

  test("simhashPairs finds exact dup at hamming 0") {
    val pairs = NearDup.simhashPairs(corpus, "doc_id", "text", maxHamming = 3)
      .as[(Long, Long, Int)].collect()
    assert(pairs.exists(p => p._1 == 3L && p._2 == 100L && p._3 == 0))
  }

  test("ngramJaccard: identical 1.0, disjoint 0.0") {
    val pairs = Seq((3L, 100L), (3L, 102L)).toDF("id_a", "id_b")
    val out = NearDup.ngramJaccard(corpus, pairs, "doc_id", "text")
      .orderBy("id_b").select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect()
    assert(out(0)._3 === 1.0)
    assert(out(1)._3 === 0.0)
  }

  test("Decontaminate flags corpus docs sharing long n-grams with a benchmark") {
    import graft.dedup.Decontaminate
    val trainBase = (0 until 30).map(i => s"t$i").mkString(" ")
    val benchText = (0 until 30).map(i => s"b$i").mkString(" ")
    val corpus = Seq(
      (1L, trainBase),
      (2L, s"prefix $benchText suffix"), // contains the benchmark verbatim
      (3L, (0 until 30).map(i => s"c$i").mkString(" "))
    ).toDF("doc_id", "text")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val hits = Decontaminate.overlaps(corpus, bench, "doc_id", "text", n = 13)
      .as[(Long, Long, Long)].collect()
    assert(hits.map(h => (h._1, h._2)).toSet === Set((2L, 100L)))
    assert(hits.head._3 === (30 - 13 + 1)) // every benchmark 13-gram present
    val drops = Decontaminate.contaminatedIds(corpus, bench, "doc_id", "text", n = 13)
      .as[Long].collect()
    assert(drops === Array(2L))
  }

  test("selfOverlaps finds the planted shared passage, counts its grams") {
    import graft.dedup.Decontaminate
    val passage = (0 until 20).map(i => s"p$i").mkString(" ")
    val corpus = Seq(
      (1L, s"intro ${passage} outro"),
      (2L, s"different start ${passage} different end"),
      (3L, (0 until 30).map(i => s"q$i").mkString(" ")))
      .toDF("doc_id", "text")
    val pairs = Decontaminate.selfOverlaps(corpus, "doc_id", "text", n = 13)
      .as[(Long, Long, Long)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    // a 20-token passage carries 20-13+1 = 8 shared 13-grams
    assert(pairs.head._3 === 8L)
  }

  test("selfOverlapsChar matches passages across case/whitespace, counts grams") {
    import graft.dedup.Decontaminate
    val passage = "The Quick Brown Fox Jumps Over The Extremely Lazy Dog Tonight"
    val corpus = Seq(
      (1L, s"intro   ${passage}   outro"),
      // same passage, different case and whitespace — token-exact dedup
      // misses this without normalization; char grams normalize inline
      (2L, s"prefix ${passage.toUpperCase.replace(" ", "  ")} suffix"),
      (3L, "completely unrelated filler text that shares nothing at all here"))
      .toDF("doc_id", "text")
    val pairs = Decontaminate.selfOverlapsChar(corpus, "doc_id", "text", n = 40)
      .as[(Long, Long, Long)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    // the normalized passage is 61 chars → at least 61-40+1 = 22 shared
    // 40-grams (doc 1's surrounding spaces normalize into the span, so
    // boundary grams can add a few more)
    assert(pairs.head._3 >= 22L)
    // short texts yield no grams, no crash
    val empty = Decontaminate.selfOverlapsChar(
      Seq((1L, "tiny"), (2L, "tiny")).toDF("doc_id", "text"), "doc_id", "text", n = 40)
    assert(empty.count() === 0L)
  }

  test("selfOverlaps drops boilerplate grams; aggregation state stays bounded") {
    import graft.dedup.Decontaminate
    // 200 docs share a boilerplate footer (license-header analogue); its
    // gram buckets hold 200 members — over maxBucket=50, so the grams are
    // boilerplate by definition and must be dropped WITHOUT ever building
    // a 200-member aggregation buffer. Two docs share a unique passage.
    val footer = (0 until 15).map(i => s"f$i").mkString(" ")
    val passage = (0 until 20).map(i => s"p$i").mkString(" ")
    val boiler = (0 until 200).map(i => (i.toLong, s"doc $i body ${(0 until 13).map(j => s"u${i}x$j").mkString(" ")} $footer"))
    val pair = Seq((500L, s"alpha $passage omega"), (501L, s"beta $passage gamma"))
    val corpus = (boiler ++ pair).toDF("doc_id", "text")
    val out = Decontaminate.selfOverlaps(corpus, "doc_id", "text", n = 13, maxBucket = 50)
    val plan = out.queryExecution.executedPlan.toString
    // the bucket builder is the bounded aggregate, not collect_set
    assert(plan.contains("bounded_distinct"), plan)
    assert(!plan.contains("collect_set"), plan)
    val pairs = out.as[(Long, Long, Long)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((500L, 501L)))
    assert(pairs.head._3 === 8L) // 20-13+1 grams of the unique passage
  }

  test("BoundedDistinctSet: buffer never exceeds limit; matches collect_set under cap") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.LongType
    import graft.functions.BoundedDistinctSet
    val agg = BoundedDistinctSet(BoundReference(0, LongType, nullable = true), limit = 11)
    val buf = agg.createAggregationBuffer()
    // 50k distinct values through one buffer: peak state is the cap, not
    // the distinct count (this is the collect_set failure mode, removed)
    var i = 49999L
    while (i >= 0) {
      agg.update(buf, InternalRow(i))
      assert(buf.size <= 11)
      i -= 1
    }
    assert(buf.size === 11)
    // keep-smallest: the survivors are exactly 0..10
    assert(agg.deserialize(agg.serialize(buf)).toArray === (0L to 10L).toArray)
    // merge two capped buffers re-caps: still the global smallest
    val other = agg.createAggregationBuffer()
    (100000L to 100020L).foreach(v => agg.update(other, InternalRow(v)))
    val merged = agg.merge(buf, other)
    assert(merged.size === 11)
    assert(merged.toArray === (0L to 10L).toArray)
    // under the cap, result == slice(array_sort(collect_set(...)))
    val df = Seq(3L, 1L, 2L, 3L, 1L).toDF("id")
    val bounded = df.agg(graft.functions.BoundedDistinct.boundedDistinct($"id", 11))
      .head.getSeq[Long](0)
    val classic = df.agg(slice(array_sort(collect_set($"id")), 1, 11)).head.getSeq[Long](0)
    assert(bounded === classic && bounded === Seq(1L, 2L, 3L))
  }

  test("minhash/simhash bucket builders run on the bounded aggregate, not collect_set") {
    val mh = NearDup.minhashCandidates(corpus, "doc_id", "text")
    val mhPlan = mh.queryExecution.executedPlan.toString
    assert(mhPlan.contains("bounded_distinct"), mhPlan)
    assert(!mhPlan.contains("collect_set"), mhPlan)
    val sh = NearDup.simhashPairs(corpus, "doc_id", "text")
    val shPlan = sh.queryExecution.executedPlan.toString
    assert(shPlan.contains("bounded_distinct"), shPlan)
    assert(!shPlan.contains("collect_set"), shPlan)
  }

  test("simhashPairs pair set equals the uncapped collect_set formulation under the cap") {
    // reference formulation: what the builder computed before the bound —
    // output must be identical whenever no bucket exceeds maxBucket
    import graft.functions.SimHash
    val withHash = corpus.select($"doc_id".as("id"), SimHash.simhash($"text").as("sh"))
    val chunked = withHash.select(col("id"), col("sh"),
      posexplode(expr("transform(sequence(0, 3), c -> (shiftright(sh, c * 16) & 65535))"))
        .as(Seq("chunk", "key")))
    val classic = chunked.groupBy(col("chunk"), col("key"))
      .agg(slice(array_sort(collect_set(struct(col("id"), col("sh")))), 1, 2000).as("members"))
      .filter(size(col("members")) > 1)
      .select(explode(expr(
        "flatten(transform(members, (a, i) -> " +
          "transform(slice(members, i + 2, size(members)), " +
          "b -> named_struct('id_a', a.id, 'id_b', b.id, " +
          "'hamming', bit_count(a.sh ^ b.sh)))))")).as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.hamming"))
      .filter(col("hamming") <= 3).dropDuplicates("id_a", "id_b")
      .as[(Long, Long, Int)].collect().toSet
    val bounded = NearDup.simhashPairs(corpus, "doc_id", "text", maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(bounded === classic)
    assert(bounded.nonEmpty)
  }

  test("BoundedDistinctSet struct elements: 1M-row hot bucket never exceeds the cap") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    import graft.functions.BoundedDistinctSet
    val st = StructType(Seq(StructField("id", LongType), StructField("sh", LongType)))
    val limit = 50
    val agg = BoundedDistinctSet(BoundReference(0, st, nullable = true), limit)
    val buf = agg.createAggregationBuffer()
    // one million member rows of ONE (band, bucket) key — the degenerate
    // corpus shape (millions of identical docs in one LSH bucket). Peak
    // aggregation state is the cap at every moment, not the bucket size.
    var i = 999999L
    while (i >= 0) {
      agg.update(buf, InternalRow(new GenericInternalRow(Array[Any](i, i * 31L))))
      assert(buf.size <= limit)
      i -= 1
    }
    assert(buf.size === limit)
    // partial serialize carries ≤ limit entries: 4-byte count + per row
    // two (flag + long) fields = 18 bytes
    val bytes = agg.serialize(buf)
    assert(bytes.length <= 4 + limit * 18)
    // survivors are the limit smallest (id, sh) pairs: ids 0..limit-1
    val revived = agg.deserialize(bytes)
    val ids = revived.toArray.map(_.asInstanceOf[InternalRow].getLong(0))
    assert(ids.toSeq === (0L until limit.toLong))
    // merge of two capped buffers re-caps to the global smallest
    val other = agg.createAggregationBuffer()
    agg.update(other, InternalRow(new GenericInternalRow(Array[Any](-1L, 7L))))
    val merged = agg.merge(revived, other)
    assert(merged.size === limit)
    assert(merged.first().asInstanceOf[InternalRow].getLong(0) === -1L)
    // equality with the classic formulation under the cap (dataframe path)
    val df = Seq((3L, 30L), (1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "sh")
    val b = df.agg(graft.functions.BoundedDistinct.boundedDistinct(
        struct($"id", $"sh"), 10).as("m"))
      .selectExpr("transform(m, x -> x.id) AS ids").head.getSeq[Long](0)
    val c = df.agg(slice(array_sort(collect_set(struct($"id", $"sh"))), 1, 10).as("m"))
      .selectExpr("transform(m, x -> x.id) AS ids").head.getSeq[Long](0)
    assert(b === c && b === Seq(1L, 2L, 3L))
  }

  test("selfOverlapExtents reports ONE maximal span with exact boundaries") {
    import graft.dedup.Decontaminate
    val passage = (0 until 40).map(i => s"p$i").mkString(" ")
    val corpus = Seq(
      (1L, s"i0 i1 i2 i3 i4 $passage o0 o1 o2 o3 o4"), // passage at token 5
      (2L, s"${(0 until 10).map(i => s"j$i").mkString(" ")} $passage k0 k1"), // at token 10
      (3L, (0 until 50).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    val ext = Decontaminate.selfOverlapExtents(corpus, "doc_id", "text", n = 13)
      .as[(Long, Long, Int, Int, Int)].collect()
    // a 40-token passage = 28 consecutive shared 13-grams = ONE island
    assert(ext.length === 1)
    assert(ext.head === ((1L, 2L, 5, 10, 40)))
  }

  test("selfOverlapExtents separates discontiguous spans and within-doc repeats") {
    import graft.dedup.Decontaminate
    val span1 = (0 until 15).map(i => s"a$i").mkString(" ")
    val span2 = (0 until 15).map(i => s"b$i").mkString(" ")
    val corpus = Seq(
      (1L, s"$span1 x0 x1 x2 $span2"),                 // spans at 0 and 18
      (2L, s"y0 $span2 y1 y2 y3 y4 $span1"))           // span2 at 1, span1 at 20
      .toDF("doc_id", "text")
    val ext = Decontaminate.selfOverlapExtents(corpus, "doc_id", "text", n = 13)
      .as[(Long, Long, Int, Int, Int)].collect().sortBy(_._3)
    // two separate maximal extents, never merged across the gap
    assert(ext.length === 2)
    assert(ext(0) === ((1L, 2L, 0, 20, 15))) // span1
    assert(ext(1) === ((1L, 2L, 18, 1, 15))) // span2
  }

  test("embeddingPairs finds planted near-identical vectors") {
    val vecs = Seq(
      (0L, Array.tabulate(16)(i => math.sin(i * 1.7).toFloat)),
      (1L, Array.tabulate(16)(i => math.sin(i * 1.7).toFloat + (if (i == 0) 0.01f else 0f))),
      (2L, Array.tabulate(16)(i => math.cos(i * 3.1).toFloat))
    ).toDF("vec_id", "embedding")
    val pairs = NearDup.embeddingPairs(vecs, "vec_id", "embedding",
      minCosine = 0.99, nBits = 16)
      .as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((0L, 1L)))
  }

  test("collisionCurve matches the theoretical S-curve 1-(1-s^r)^b per arm") {
    // controlled similarity: 600 docs of 64 distinct random tokens each
    // (vocab huge, so cross-doc overlap ~ 0); each doc gets a variant
    // with every stride-th token replaced — within an arm the shingle
    // survival (and so the Jaccard) is essentially constant, so the
    // binomial check against the closed form is tight. This pins the
    // MEASUREMENT the q_lsh_curve registration ships: a banding or
    // slice-equality regression moves whole arms off the curve.
    val rnd = new scala.util.Random(47)
    val docs = (0 until 600).map { d =>
      (d.toLong, Array.fill(64)("w" + rnd.nextInt(100000000)).mkString(" "))
    }.toDF("doc_id", "text")
    val strideOf = Map(0 -> 0, 1 -> 16, 2 -> 9, 3 -> 6, 4 -> 4)
    val toks = split(col("text"), " ")
    val strideCol = col("doc_id") % 5
    val stride = strideOf.foldLeft(lit(0)) { case (acc, (arm, st)) =>
      when(strideCol === arm, lit(st)).otherwise(acc)
    }
    val vtoks = transform(sequence(lit(1), size(toks)), i =>
      when(stride > 0 && pmod(i, stride) === 0,
        concat(lit("zzq"), col("doc_id").cast("string"), lit("x"),
          i.cast("string"))).otherwise(element_at(toks, i)))
    val corpus = docs.unionByName(docs.select(
      (col("doc_id") + 100000L).as("doc_id"), array_join(vtoks, " ").as("text")))
    val evalPairs = docs.select(col("doc_id").as("id_a"),
      (col("doc_id") + 100000L).as("id_b"))
    val settings = Seq((16, 4), (8, 8), (4, 16))
    // per-pair observation (jac_bp + collided) via a 1-bucket-per-pair
    // trick is unnecessary: the arms land in distinct deciles by
    // construction, so the decile aggregate IS the per-arm aggregate
    val curve = NearDup.collisionCurve(corpus, evalPairs, "doc_id", "text",
      settings).collect()
    assert(curve.nonEmpty)
    var checked = 0
    curve.foreach { row =>
      val (b, r) = (row.getInt(0), row.getInt(1))
      val n = row.getLong(3); val coll = row.getLong(4)
      val sBar = row.getLong(5).toDouble / n / 10000.0
      if (n >= 50) {
        val p = 1.0 - math.pow(1.0 - math.pow(sBar, r.toDouble), b.toDouble)
        val obs = coll.toDouble / n
        // binomial 5 sigma + curve-evaluation slack for the within-arm
        // Jaccard spread (token counts are fixed, so the spread is just
        // the stride/boundary jitter)
        val tol = 5.0 * math.sqrt(math.max(p * (1 - p), 0.002) / n) + 0.05
        assert(math.abs(obs - p) <= tol,
          s"(b=$b,r=$r) bucket s~$sBar: observed $obs vs theory $p (tol $tol)")
        checked += 1
      }
    }
    assert(checked >= 9, s"expected >= 9 populated buckets, checked $checked")
    // the s=1 arm must collide everywhere at every setting (the
    // q_lsh_recall identity, re-derived through the curve path)
    settings.foreach { case (b, _) =>
      val top = curve.find(r => r.getInt(0) == b && r.getLong(2) == 10L).get
      assert(top.getLong(3) === top.getLong(4),
        s"identical pairs must all collide at bands=$b")
    }
  }
}
