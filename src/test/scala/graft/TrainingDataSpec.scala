package graft

import org.apache.spark.sql.functions._
import graft.pipelines.TrainingData
import graft.sources.Tables

class TrainingDataSpec extends SparkSuite {
  import spark.implicits._

  test("end-to-end prepare: stages monotone, contamination gone, packing bounded") {
    val docs = Tables.load(spark, sf, "documents")
    // benchmark = a slice of the corpus itself → those docs MUST be
    // dropped by decontamination (verbatim 13-gram overlap)
    val bench = docs.filter($"doc_id" % 25 === 0)
      .select($"doc_id", $"text")
    // sources are src0..src19; upweight src0, downweight src1, keep rest
    val rates = Map("src0" -> 1.5, "src1" -> 0.5) ++
      (2 until 20).map(i => s"src$i" -> 1.0)
    val cfg = TrainingData.Config(rates = rates, packBudget = 128)
    val (out, m) = TrainingData.prepare(docs, bench, cfg)
    try {
      // stage counts monotone where stages only drop
      assert(m.input >= m.cleaned && m.cleaned >= m.decontaminated, m)
      assert(m.cleaned > 0 && m.decontaminated > 0 && m.sampled > 0, m)

      // no contaminated doc survives
      val benchIds = bench.select("doc_id").as[Long].collect().toSet
      val outIds = out.select("doc_id").as[Long].collect().toSet
      assert(outIds.intersect(benchIds).isEmpty)

      // split labels well-formed; only train rows carry packing coords
      val bySplit = out.groupBy("split").count().as[(String, Long)].collect().toMap
      assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
      assert(out.filter($"split" =!= "train" && $"seq_id".isNotNull).count() === 0)
      assert(m.trainPacked === out.filter($"split" === "train").count())

      // packing coordinates bounded by the budget
      val maxPos = out.filter($"seq_pos".isNotNull)
        .agg(max("seq_pos")).head.getInt(0)
      assert(maxPos >= 0 && maxPos < 128)

      // replication: rate-1.5 source has epoch-1 rows, rate-0.5 has none
      assert(out.filter($"source" === "src0" && $"epoch" === 1).count() > 0)
      assert(out.filter($"source" === "src1" && $"epoch" === 1).count() === 0)
    } finally out.unpersist()

    // determinism: a second full run produces the identical frame
    val (out2, m2) = TrainingData.prepare(docs, bench, cfg)
    try {
      assert(m2 === m)
      assert(out2.exceptAll(out).count() === 0 && out.exceptAll(out2).count() === 0)
    } finally out2.unpersist()

    // shuffled packing: same doc set and budgets, different neighbors —
    // and itself deterministic across runs
    val shuffledCfg = cfg.copy(packShuffleSalt = Some(11L))
    val (s1, _) = TrainingData.prepare(docs, bench, shuffledCfg)
    val (s2, _) = TrainingData.prepare(docs, bench, shuffledCfg)
    try {
      assert(s1.select("doc_id", "epoch").exceptAll(
        out.select("doc_id", "epoch")).count() === 0) // same rows survive
      assert(s1.exceptAll(s2).count() === 0 && s2.exceptAll(s1).count() === 0)
      val maxPos = s1.filter($"seq_pos".isNotNull)
        .agg(max("seq_pos")).head.getInt(0)
      assert(maxPos >= 0 && maxPos < 128) // budget still bounds positions
    } finally { s1.unpersist(); s2.unpersist() }
  }
}
