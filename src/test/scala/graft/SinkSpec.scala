package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{Sink, Tables}

class SinkSpec extends SparkSuite {
  import spark.implicits._

  test("writePartitioned lays out hive-style dirs and reads prune") {
    val dir = Files.createTempDirectory("graft_sink").toString
    val docs = Tables.load(spark, sf, "documents")
    Sink.writePartitioned(docs, s"$dir/docs", Seq("lang"))
    val langs = new java.io.File(s"$dir/docs").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("lang=")).sorted
    assert(langs.nonEmpty && langs.forall(_.startsWith("lang=")))
    val back = spark.read.parquet(s"$dir/docs").filter(col("lang") === "en")
    assert(back.count() === docs.filter(col("lang") === "en").count())
  }

  test("co-bucketed tables join without a shuffle exchange") {
    import org.apache.spark.sql.functions.col
    val o = Tables.load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    val l = Tables.load(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    for (t <- Seq("b_orders", "b_lineitem")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(loc)
      }
    }
    Sink.writeBucketed(o, "b_orders", "o_orderkey", 4, Some("o_orderkey"))
    Sink.writeBucketed(l.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "o_orderkey", 4, Some("o_orderkey"))
    // force sort-merge (tiny tables would broadcast) and check the
    // bucketed layout removes the shuffle
    val joined = spark.table("b_orders").hint("merge")
      .join(spark.table("b_lineitem").hint("merge"), "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected shuffle-free bucketed join:\n$plan")
    assert(joined.count() === l.count())
  }

  test("compact merges small files and preserves the data") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")
    docs.repartition(40).write.parquet(dir) // simulate micro-batch debris
    val (before, after) = Sink.compact(spark, dir)
    assert(before === 40 && after < before, s"$before -> $after")
    val back = spark.read.parquet(dir)
    assert(back.count() === docs.count())
    assert(back.agg(sum("doc_id")).head.getLong(0) ===
      docs.agg(sum("doc_id")).head.getLong(0))
    // partitioned layouts are refused with an actionable message
    val pdir = Files.createTempDirectory("graft_compact_p").toString + "/p"
    Sink.writePartitioned(Tables.load(spark, sf, "documents"), pdir, Seq("lang"))
    val err = intercept[IllegalArgumentException](Sink.compact(spark, pdir))
    assert(err.getMessage.contains("partition"))
  }

  test("compactPartitioned collapses only the debris-heavy partitions") {
    val dir = Files.createTempDirectory("graft_compact_hv").toString + "/t"
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "lang", "text")
    // one hot partition with 20-file debris, the rest written clean
    val hot = docs.filter(col("lang") === "en").repartition(20)
    val clean = docs.filter(col("lang") =!= "en").coalesce(1)
    hot.write.partitionBy("lang").parquet(dir)
    clean.write.mode("append").partitionBy("lang").parquet(dir)
    def files(lang: String) =
      new java.io.File(s"$dir/lang=$lang").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    val cleanLang = clean.select("lang").distinct()
      .as[String].collect().head
    val cleanBefore = files(cleanLang)
    val (nParts, before, after) = Sink.compactPartitioned(spark, dir)
    assert(nParts === 1 && before === 20 && after < before,
      s"$nParts parts, $before -> $after")
    assert(files(cleanLang) === cleanBefore, "clean partition untouched")
    val back = spark.read.parquet(dir)
    assert(back.count() === docs.count())
    assert(back.agg(sum("doc_id")).head.getLong(0) ===
      docs.agg(sum("doc_id")).head.getLong(0))
  }

  test("expirePartitions drops only below-cutoff partition dirs, never opens files") {
    val dir = Files.createTempDirectory("graft_expire").toString + "/t"
    val rows = Seq(
      (1L, "2024-01-01"), (2L, "2024-01-15"), (3L, "2024-02-01"),
      (4L, "2024-03-01")).toDF("id", "day")
    Sink.writePartitioned(rows, dir, Seq("day"))
    val dropped = Sink.expirePartitions(spark, dir, "day", "2024-02-01")
    assert(dropped === Seq("2024-01-01", "2024-01-15"))
    val back = spark.read.parquet(dir)
    assert(back.select("id").as[Long].collect().sorted.toSeq === Seq(3L, 4L))
    // second run: nothing left to expire
    assert(Sink.expirePartitions(spark, dir, "day", "2024-02-01").isEmpty)
  }

  test("schema evolution: mergeSchema read + conform recovers a stable frame") {
    // a source adds a column mid-feed (the drift JobConfig.drift reports);
    // mergeSchema unions the file schemas, overwriteToOriginal conforms
    val dir = Files.createTempDirectory("graft_evolve").toString + "/t"
    Seq((1L, "a")).toDF("id", "name").write.parquet(dir)
    Seq((2L, "b", 99)).toDF("id", "name", "extra")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("id", "name", "extra"))
    assert(merged.count() === 2)
    val original = Seq((0L, "")).toDF("id", "name").schema
    val drift = graft.plans.JobConfig.drift(original, merged.schema)
    assert(drift.added === Seq("extra"))
    val conformed = graft.plans.JobConfig.overwriteToOriginal(merged, original)
    assert(conformed.columns.toSeq === Seq("id", "name"))
    assert(conformed.count() === 2)
  }

  test("repartitionForWrite sizes output partitions") {
    val df = spark.range(1000).toDF("id")
    assert(Sink.repartitionForWrite(df, 1000, 100).rdd.getNumPartitions === 10)
    assert(Sink.repartitionForWrite(df, 10, 100).rdd.getNumPartitions === 1)
  }

  test("vector normalize and int8 quantize round-trip") {
    import graft.functions.VectorFunctions._
    val df = Seq(
      Tuple1(Array(3.0f, 4.0f)),
      Tuple1(Array(0.0f, 0.0f))
    ).toDF("v")
    val n = df.select(l2Normalize(col("v"))).as[Seq[Float]].collect()
    assert(math.abs(n(0)(0) - 0.6f) < 1e-6 && math.abs(n(0)(1) - 0.8f) < 1e-6)
    assert(n(1) === Seq(0.0f, 0.0f))
    val rt = df.select(dequantizeInt8(quantizeInt8(col("v")))).as[Seq[Float]].collect()
    rt(0).zip(Seq(3.0f, 4.0f)).foreach { case (got, want) =>
      assert(math.abs(got - want) < 0.05f)
    }
  }
}
