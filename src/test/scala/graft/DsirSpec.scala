package graft

import org.apache.spark.sql.functions._
import graft.pipelines.Dsir

class DsirSpec extends SparkSuite {
  import spark.implicits._

  private val WS = "[ \\t\\n\\r\\f]+"
  private val B = 64

  test("scores equal an independent explode-and-join replay on real docs") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val got = Dsir.importanceScores(
      docs, docs.filter(col("source") === "src0"), "doc_id", "text", B)

    // independent formulation: token explode + grouped counts + weight
    // join (vs the operator's row-local folds) — same pinned formula
    val toks = docs.filter(trim(col("text")) =!= "")
      .select(col("doc_id"), col("source"),
        explode(split(trim(col("text")), WS)).as("t"))
      .withColumn("b", pmod(
        conv(substring(md5(col("t")), 1, 6), 16, 10).cast("long"), lit(B)))
    val cq = toks.groupBy("b").agg(count(lit(1)).as("cq"))
    val ct = toks.filter(col("source") === "src0")
      .groupBy("b").agg(count(lit(1)).as("ct"))
    val nq = toks.count()
    val nt = toks.filter(col("source") === "src0").count()
    val w = spark.range(B).withColumnRenamed("id", "b")
      .join(cq, Seq("b"), "left").join(ct, Seq("b"), "left")
      .select(col("b"), floor(lit(10000.0) *
        log(((coalesce(col("ct"), lit(0L)) + 1L) * (nq + B)).cast("double") /
            ((coalesce(col("cq"), lit(0L)) + 1L) * (nt + B)).cast("double")) +
        lit(0.5)).cast("long").as("w"))
    val want = toks.groupBy(col("doc_id"), col("b"))
      .agg(count(lit(1)).as("c"))
      .join(w, Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c") * col("w")).as("dsir_score"))

    assert(got.count() === docs.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("importanceScoresByFlag equals the two-frame form on real docs") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val twoFrame = Dsir.importanceScores(
        docs, docs.filter(col("source") === "src0"), "doc_id", "text", B)
      .as[(Long, Long)].collect().toSet
    val byFlag = Dsir.importanceScoresByFlag(
        docs, col("source") === "src0", "doc_id", "text", B)
      .as[(Long, Long)].collect().toSet
    assert(byFlag === twoFrame)
  }

  test("target-like documents outscore off-target ones") {
    val common = (1L to 60L).map(i => (i, "the quick brown fox jumps over dog"))
    val rare = (61L to 70L).map(i =>
      (i, "quasar neutrino tokamak perihelion entropy"))
    val corpus = (common ++ rare).toDF("doc_id", "text")
    val target = rare.toDF("doc_id", "text")
    val scores = Dsir.importanceScores(corpus, target, "doc_id", "text", B)
      .as[(Long, Long)].collect().toMap
    val rareMin = rare.map(r => scores(r._1)).min
    val commonMax = common.map(c => scores(c._1)).max
    assert(rareMin > commonMax)
  }

  test("count-table scoring == scan form; CDC fold == rescan") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val t0 = docs.filter(col("source") === "src0")
    val cq = Dsir.tokenBucketCounts(docs, "text", B)
    val ct = Dsir.tokenBucketCounts(t0, "text", B)
    val fromCounts = Dsir.importanceScoresFromCounts(
      docs, ct, cq, "doc_id", "text", B)
    val fromScans = Dsir.importanceScores(docs, t0, "doc_id", "text", B)
    assert(fromCounts.exceptAll(fromScans).isEmpty &&
      fromScans.exceptAll(fromCounts).isEmpty)

    // a document CDC feed folds the distribution: + inserts, − deletes
    val removed = docs.filter(col("doc_id") % 7 === 0)
    val added = removed
      .withColumn("doc_id", col("doc_id") + 100000L)
      .withColumn("text", concat(col("text"), lit(" zyzzyx kwyjibo")))
    val newCorpus = docs.filter(col("doc_id") % 7 =!= 0).unionByName(added)
    val folded = cq
      .unionByName(Dsir.tokenBucketCounts(added, "text", B))
      .unionByName(Dsir.tokenBucketCounts(removed, "text", B)
        .withColumn("n", -col("n")))
      .groupBy("b").agg(sum("n").as("n")).filter(col("n") =!= 0)
    val rescan = Dsir.tokenBucketCounts(newCorpus, "text", B)
      .filter(col("n") =!= 0)
    assert(folded.exceptAll(rescan).isEmpty && rescan.exceptAll(folded).isEmpty)
  }

  test("stable under repartitioning") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val t0 = docs.filter(col("source") === "src0")
    val a = Dsir.importanceScores(docs.repartition(7), t0, "doc_id", "text", B)
      .orderBy("doc_id").as[(Long, Long)].collect()
    val b = Dsir.importanceScores(docs.coalesce(1), t0, "doc_id", "text", B)
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(a === b)
  }
}
