package graft

import org.apache.spark.sql.functions._
import graft.dedup.NearDup
import graft.functions.{Fingerprint, SimHash, TextFunctions}

class NullRobustnessSpec extends SparkSuite {
  import spark.implicits._

  private def docsWithNull = Seq(
    (1L, Some("alpha beta gamma delta")),
    (2L, Some("alpha beta gamma delta")),
    (3L, None),
    (4L, Some(""))
  ).toDF("doc_id", "text")

  test("minhashPairs survives null and empty text, still pairs the dup") {
    val pairs = NearDup.minhashPairs(docsWithNull, "doc_id", "text", threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.toSet === Set((1L, 2L)))
  }

  test("simhashPairs survives null and empty text") {
    val pairs = NearDup.simhashPairs(docsWithNull, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    // null/empty docs must not pair with real content
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("asof join: null-ts right rows never match, null-ts left rows get null payload") {
    import graft.operators.AsOf
    val l = Seq((1L, Option(10), "e1"), (1L, None: Option[Int], "e0"))
      .toDF("k", "t", "name")
    val r = Seq((1L, Option(5), 50.0), (1L, None: Option[Int], 999.0))
      .toDF("k", "t", "price")
    val out = AsOf.joinAsOf(l, r, Seq("k"), "t", Seq("price"))
      .select("name", "asof_price").as[(String, Option[Double])].collect().toMap
    assert(out("e1") === Some(50.0)) // real right row wins, not the null-ts one
    assert(out("e0") === None)       // null-ts left row has no "before"
  }

  test("applyCdc: null version sorts last, real versions win") {
    import graft.operators.Merge
    val dest = Seq((1, "a")).toDF("id", "v")
    val changes = Seq((1, Option("new"), Option(2)), (1, Option("ghost"), None: Option[Int]))
      .toDF("id", "v", "ver").withColumn("op", org.apache.spark.sql.functions.lit("U"))
    val out = Merge.applyCdc(dest, changes, Seq("id"), "ver", "op")
      .as[(Int, String)].collect()
    assert(out === Array((1, "new"))) // version 2 beats the null-version row
  }

  test("runningCountDistinct: nulls not counted, equals naive running set size") {
    import graft.operators.RunningDistinct
    val rows = Seq[(String, Option[Long], Long)](
      ("a", Some(1L), 1), ("a", None, 2), ("a", Some(2L), 3), ("a", Some(1L), 4),
      ("a", None, 5), ("a", Some(3L), 6),
      ("b", None, 1), ("b", None, 2), ("b", Some(9L), 3))
    val got = RunningDistinct.countDistinct(
      rows.toDF("g", "u", "t"), Seq("g"), "u", Seq(col("t")))
      .orderBy("g", "t").select("g", "t", "n_distinct")
      .as[(String, Long, Long)].collect().toSeq
    val want = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      val sorted = rs.sortBy(_._3)
      sorted.indices.map { i =>
        (g, sorted(i)._3, sorted.take(i + 1).flatMap(_._2).distinct.size.toLong)
      }
    }.sortBy(r => (r._1, r._2))
    assert(got === want)
  }

  test("resample ignores null keys/timestamps; null values carry as null") {
    import graft.operators.Resample
    val obs = Seq(
      (Option(1L), Option(100L), Option(1.0)),
      (Option(1L), Option(300L), None), // a null OBSERVATION at 300
      (Option(1L), Option(500L), Option(5.0)),
      (None, Option(200L), Option(9.0)),      // null key: dropped
      (Option(2L), None, Option(9.0)))        // null ts: dropped
      .toDF("k", "t", "v")
    val out = Resample.forwardFill(obs, "k", "t", "v", 100L)
      .as[(Long, Long, Option[Double])].collect().toSeq.sortBy(r => (r._1, r._2))
    // key 2 vanishes (no valid obs); key 1's slots 300/400 carry the
    // NULL observation (it is the latest at-or-before), 500 recovers
    assert(out === Seq((1L, 100L, Some(1.0)), (1L, 200L, Some(1.0)),
      (1L, 300L, None), (1L, 400L, None), (1L, 500L, Some(5.0))))
  }

  test("pitJoin: null fact timestamps and unknown keys get null payloads") {
    import graft.operators.Scd
    val dim = Seq((1L, 0, Option(100), "v1")).toDF("k", "valid_from", "valid_to", "seg")
    val fact = Seq((Option(1L), Option(50)), (Option(1L), None), (Option(9L), Option(50)))
      .toDF("k", "t")
    val out = Scd.pitJoin(fact, dim, Seq("k"), "t", Seq("seg"))
      .as[(Option[Long], Option[Int], Option[String])].collect().toSeq
      .sortBy(r => (r._1, r._2.map(_.toLong)))
    assert(out === Seq((Some(1L), None, None), (Some(1L), Some(50), Some("v1")),
      (Some(9L), Some(50), None)))
  }

  test("kneserNeyLogloss: null/empty/short docs drop out, long docs still score") {
    import graft.pipelines.Lexical
    val docs = Seq(
      (1L, Some("alpha beta gamma alpha beta gamma")),
      (2L, Some("alpha beta gamma")),
      (3L, None),          // null text
      (4L, Some("")),      // empty
      (5L, Some("one two")) // < 3 tokens
    ).toDF("doc_id", "text")
    val out = Lexical.kneserNeyLogloss(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(out === Set(1L, 2L))
  }

  test("PQ index excludes null embeddings instead of minting garbage codes") {
    import graft.similarity.{Knn, Pq}
    val rnd = new scala.util.Random(7)
    val rows: Seq[(Long, Option[Seq[Float]])] =
      (0L until 40L).map(i => (i, Some(Seq.fill(8)(rnd.nextFloat())))) :+
        (99L, Option.empty[Seq[Float]])
    val df = rows.toDF("vec_id", "embedding")
    val co = Knn.trainCentroids(df.filter(col("embedding").isNotNull), 2, 1)
    val bk = Pq.trainCodebooks(Pq.residualFrame(df, co), 2, 4, 4, 1)
    // unfixed, the null row was silently assigned bucket 1 with codes
    // [1, 1] — an index row that can surface as a bogus ADC neighbor
    assert(Pq.encodeCorpus(df, co, bk, 4).filter(col("vec_id") === 99L).count() === 0)
    assert(Knn.assign(df, co).filter(col("vec_id") === 99L).count() === 0)
    val neighbors = Pq.ivfpqTopK(df, df.filter(col("vec_id") < 2), co, bk,
      subDim = 4, k = 50, nProbe = 2)
      .select("neighbor_id").as[Long].collect()
    assert(!neighbors.contains(99L))
  }

  test("ivfTopK excludes null embeddings on the unbucketed path too") {
    import graft.similarity.Knn
    val rnd = new scala.util.Random(11)
    val rows: Seq[(Long, Option[Seq[Float]])] =
      (0L until 40L).map(i => (i, Some(Seq.fill(8)(rnd.nextFloat())))) :+
        (99L, Option.empty[Seq[Float]])
    val df = rows.toDF("vec_id", "embedding")
    val co = Knn.trainCentroids(df, 2, 1)
    // unfixed, preBucketed=false inlined nearestCentroid unfiltered: the
    // null row got bucket 1 and surfaced as a null-cos_sim neighbor
    val neighbors = Knn.ivfTopK(df, df.filter(col("vec_id") < 2), co,
      k = 50, nProbe = 2).select("neighbor_id").as[Long].collect()
    assert(!neighbors.contains(99L))
  }

  test("PQ fails loudly when m*subDim does not match the embedding width") {
    import graft.similarity.{Knn, Pq}
    val rnd = new scala.util.Random(13)
    val df = (0L until 20L).map(i => (i, Seq.fill(8)(rnd.nextFloat())))
      .toDF("vec_id", "embedding")
    val co = Knn.trainCentroids(df, 2, 1)
    // m=2, subDim=3 covers 6 of 8 dims — silently truncated before, now
    // a per-row raise_error (SparkRuntimeException / SparkException)
    def failsLoudly(body: => Any): Unit = {
      val e = intercept[Exception](body)
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("must equal the embedding dimension")),
        s"unexpected failure: $e")
    }
    failsLoudly(Pq.trainCodebooks(df, m = 2, subDim = 3, k = 4))
    val books = Pq.trainCodebooks(Pq.residualFrame(df, co), 2, 4, 4, 1)
    failsLoudly(Pq.encodeCorpus(df, co, books, subDim = 3).collect())
  }

  test("PQ writeIndex refuses codebook ids that overflow a byte") {
    import graft.similarity.Pq
    val big: Pq.Codebooks = Array(Array((1, Array(0f)), (128, Array(1f))))
    val df = Seq((1L, Seq(0.5f))).toDF("vec_id", "embedding")
    assertThrows[IllegalArgumentException] {
      Pq.writeIndex(df, Array((1, Array(0f))), big, subDim = 1, "/tmp/never")
    }
  }

  test("text functions return null/zero on null input, not exceptions") {
    val out = docsWithNull.select(
      TextFunctions.tokenCount(col("text")).as("tc"),
      TextFunctions.qualityScore(col("text")).as("q"),
      TextFunctions.langId(col("text")).as("l"),
      Fingerprint.fingerprint(col("text")).as("fp"),
      SimHash.simhash(col("text")).as("sh"))
    val rows = out.collect()
    assert(rows.length === 4)
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(3) && rows(2).isNullAt(4))
  }
}
