package graft

import org.apache.spark.sql.functions._
import graft.pipelines.{Mixture, Pack}

class PackSpec extends SparkSuite {
  import spark.implicits._

  private def docs(lens: Seq[Long]) =
    lens.zipWithIndex.map { case (n, i) => (i.toLong, "g", n) }
      .toDF("doc_id", "grp", "len")

  test("bins never exceed the budget and every doc is placed exactly once") {
    val rnd = new scala.util.Random(5)
    val df = docs(Seq.fill(200)(1L + rnd.nextInt(256)))
    val out = Pack.bestFit(df, Seq("grp"), "len", Seq(col("doc_id")), 256L)
    val rows = out.select("doc_id", "len", "bin_id", "bin_pos")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length === 200)
    assert(rows.map(_._1).distinct.length === 200)
    val byBin = rows.groupBy(_._3)
    byBin.foreach { case (b, rs) =>
      assert(rs.map(_._2).sum <= 256L, s"bin $b over budget")
    }
  }

  test("no two bins of a group could be merged (the best-fit utilization invariant)") {
    val rnd = new scala.util.Random(7)
    val df = docs(Seq.fill(300)(1L + rnd.nextInt(200)))
    val used = Pack.bestFit(df, Seq("grp"), "len", Seq(col("doc_id")), 256L)
      .groupBy("bin_id").agg(sum("len").as("used"))
      .as[(Long, Long)].collect().map(_._2)
    for (i <- used.indices; j <- used.indices if i < j)
      assert(used(i) + used(j) > 256L,
        s"bins with ${used(i)} and ${used(j)} tokens could have been merged")
  }

  test("best-fit splits no doc where concat-and-chop splits many") {
    // 150-token docs, budget 256: concat-chop straddles every other doc
    val df = docs(Seq.fill(40)(150L)).withColumnRenamed("grp", "source")
    val chopped = Mixture.packSequences(df, "source", "doc_id", "len", 256)
      .filter(col("seq_pos") + col("len") > 256)
    assert(chopped.count() > 10, "the chop baseline must actually split docs")
    // best-fit places each 150-token doc whole (one per bin here)
    val bf = Pack.bestFit(df, Seq("source"), "len", Seq(col("doc_id")), 256L)
    assert(bf.filter(col("bin_pos") + col("len") > 256).count() === 0)
  }

  test("placement is repartition-stable and matches a reference fold") {
    val lens = Seq(200L, 100L, 56L, 56L, 200L, 30L, 26L, 250L, 6L)
    val df = docs(lens)
    def run(d: org.apache.spark.sql.DataFrame) =
      Pack.bestFit(d, Seq("grp"), "len", Seq(col("doc_id")), 256L)
        .select("doc_id", "bin_id", "bin_pos")
        .as[(Long, Long, Long)].collect().toSet
    val got = run(df)
    assert(got === run(df.repartition(7)))
    // hand-walked BFD: order by len desc, id asc =
    //   250(d7)->bin0; 200(d0)->bin1; 200(d4)->bin2; 100(d1)->bin1(pos200? no:
    //   bin1 cap 56, no fit; bin2 cap 56 no; bin0 cap 6 no -> bin3);
    //   56(d2)->bin1(cap56 exact); 56(d3)->bin2; 30(d5)->bin3(cap156? best is
    //   smallest cap >= 30: bin0 cap6 no, bin3 cap156 -> yes? bin1/2 cap 0) ;
    //   26(d6)->bin3; 6(d8)->bin0
    val want = Set(
      (7L, 0L, 0L), (0L, 1L, 0L), (4L, 2L, 0L), (1L, 3L, 0L),
      (2L, 1L, 200L), (3L, 2L, 200L), (5L, 3L, 100L), (6L, 3L, 130L),
      (8L, 0L, 250L))
    assert(got === want)
  }

  test("docs over the budget are rejected loudly") {
    val e = intercept[org.apache.spark.SparkException] {
      Pack.bestFit(docs(Seq(300L)), Seq("grp"), "len",
        Seq(col("doc_id")), 256L).collect()
    }
    assert(e.getMessage.contains("pre-chop") ||
      e.getCause != null && e.getCause.getMessage.contains("pre-chop"))
  }
}
