package graft

import graft.pipelines.Collocations

class CollocationsSpec extends SparkSuite {
  import spark.implicits._

  test("pmi counts adjacent pairs and scores against independence") {
    // "new york" always adjacent; "the cat"/"the dog" dilute "the"
    val docs = Seq(
      "new york is big", "new york is old", "the cat saw the dog",
      "the dog saw the cat", "a").toDF("text")
    val out = Collocations.pmi(docs, "text", minPairCount = 2L)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // tokens: 18 total from the 4 multi-token docs ("a" is dropped)
    val n = 18.0
    assert(out(("new", "york"))._1 === 2L)
    // p(ab)/(p(a)p(b)) = (2/18)/((2/18)*(2/18)) = 18/2 = 9.0
    assert(out(("new", "york"))._2 === 9.0)
    // "the cat": n_ab=2, n_the=4, n_cat=2 → 2*18/(4*2) = 4.5
    assert(out(("the", "cat"))._2 === 4.5)
    // pairs below minPairCount are absent
    assert(!out.contains(("is", "big")))
    // single-token docs contribute nothing and nothing crashes
    assert(out.keys.forall { case (a, b) => a.nonEmpty && b.nonEmpty })
  }

  test("approx percentile stays within tolerance of exact at sf0.001") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val joined = docs.groupBy(col("source"))
      .agg(expr("percentile(CAST(n_chars AS DOUBLE), 0.5)").as("exact"),
        approx_percentile(col("n_chars").cast("double"), lit(0.5), lit(2500))
          .as("approx"))
      .select(abs(col("exact") - col("approx")) / col("exact"))
      .as[Double].collect()
    assert(joined.nonEmpty && joined.forall(_ <= 0.05), joined.toSeq)
  }
}
