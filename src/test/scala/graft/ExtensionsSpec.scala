package graft

import org.apache.spark.sql.functions._
import graft.functions.{Fingerprint, MinHash, SimHash, VectorFunctions}

/** The SQL surface registered via SparkSessionExtensions must agree
  * exactly with the Column API over the same expressions.
  */
class ExtensionsSpec extends SparkSuite {
  import spark.implicits._

  test("sql sketch functions equal the column api") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon"),
      (2L, "zeta eta theta iota kappa")).toDF("id", "text")
    docs.createOrReplaceTempView("ext_docs")

    val viaSql = spark.sql(
      """SELECT id, graft_minhash(text, 16, 2) AS mh, graft_simhash(text) AS sh,
        |  graft_fingerprint(text) AS fp, graft_gram_hashes(text, 2) AS gh,
        |  graft_char_gram_hashes(text, 8) AS cgh
        |FROM ext_docs ORDER BY id""".stripMargin).collect()
    val viaApi = docs.select(col("id"),
      MinHash.minhashSignature(col("text"), 16, 2).as("mh"),
      SimHash.simhash(col("text")).as("sh"),
      Fingerprint.fingerprint(col("text")).as("fp"),
      graft.functions.GramHash.gramHashes(col("text"), 2).as("gh"),
      graft.functions.GramHash.charGramHashes(col("text"), 8).as("cgh"))
      .orderBy("id").collect()
    assert(viaSql.map(_.toString).toSeq === viaApi.map(_.toString).toSeq)
  }

  test("graft_cosine in sql equals the column api incl. null edges") {
    val vecs = Seq(
      (1L, Array(1f, 2f, 3f), Array(1f, 2f, 3f)),
      (2L, Array(0f, 0f), Array(1f, 2f))).toDF("id", "a", "b")
    vecs.createOrReplaceTempView("ext_vecs")
    val viaSql = spark.sql(
      "SELECT id, graft_cosine(a, b) AS c FROM ext_vecs ORDER BY id")
      .as[(Long, Option[Double])].collect()
    val viaApi = vecs.select(col("id"), VectorFunctions.cosine(col("a"), col("b")))
      .orderBy("id").as[(Long, Option[Double])].collect()
    assert(viaSql === viaApi)
    assert(viaSql(0)._2.exists(c => math.abs(c - 1.0) < 1e-12))
    assert(viaSql(1)._2.isEmpty)
  }

  test("graft_set_overlap in sql equals the column api and the builtin composition") {
    val sets = Seq(
      (1L, Array(1L, 2L, 3L), Array(2L, 3L, 4L)),
      (2L, Array.empty[Long], Array(7L, 7L)),
      (3L, Array(5L, 5L, 6L), Array(5L, 6L))).toDF("id", "a", "b")
    sets.createOrReplaceTempView("ext_sets")
    val viaSql = spark.sql(
      """SELECT id, graft_set_overlap(a, b) >> 32 AS inter,
        |  graft_set_overlap(a, b) & 4294967295 AS uni
        |FROM ext_sets ORDER BY id""".stripMargin)
      .as[(Long, Long, Long)].collect().toSeq
    val packed = graft.functions.SetOverlap.packedCounts(col("a"), col("b"))
    val viaApi = sets.select(col("id"),
      graft.functions.SetOverlap.interCount(packed).as("inter"),
      graft.functions.SetOverlap.unionCount(packed).as("uni"))
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    val viaBuiltin = sets.select(col("id"),
      size(array_intersect(col("a"), col("b"))).cast("long"),
      size(array_union(col("a"), col("b"))).cast("long"))
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    assert(viaSql === viaApi)
    assert(viaSql === viaBuiltin)
  }

  test("the bounded aggregates work from sql and match the column api") {
    val rows = (1 to 300).map(i => (s"g${i % 3}", ((i * 13) % 41).toDouble))
      .toDF("g", "v")
    rows.createOrReplaceTempView("ext_agg")
    val viaSql = spark.sql(
      """SELECT g, graft_bounded_topk(v, 4) AS topk,
        |  graft_bounded_distinct(CAST(v AS BIGINT), 5) AS dst
        |FROM ext_agg GROUP BY g ORDER BY g""".stripMargin)
      .as[(String, Seq[Double], Seq[Long])].collect().toSeq
    val viaApi = rows.groupBy("g").agg(
      graft.functions.BoundedTopK.topKDesc(col("v"), 4).as("topk"),
      graft.functions.BoundedDistinct.boundedDistinct(
        col("v").cast("long"), 5).as("dst"))
      .orderBy("g").as[(String, Seq[Double], Seq[Long])].collect().toSeq
    assert(viaSql === viaApi)
    // and both equal the unbounded builtins under the cap
    val classic = rows.groupBy("g").agg(
      slice(sort_array(collect_list(col("v")), asc = false), 1, 4).as("topk"),
      slice(array_sort(collect_set(col("v").cast("long"))), 1, 5).as("dst"))
      .orderBy("g").as[(String, Seq[Double], Seq[Long])].collect().toSeq
    assert(viaSql === classic)
  }

  test("non-literal parameters fail with an actionable message") {
    val err = intercept[Exception] {
      spark.sql("SELECT graft_minhash('x', CAST(rand()*10 AS INT), 3)").collect()
    }
    assert(err.getMessage.contains("integer literal"))
  }
}
