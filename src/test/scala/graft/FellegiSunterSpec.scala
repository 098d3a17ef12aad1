package graft

import org.apache.spark.sql.functions._
import graft.pipelines.FellegiSunter

class FellegiSunterSpec extends SparkSuite {
  import spark.implicits._

  // controlled mixture: 200 true-match pairs agree on name+phone and
  // mostly on city; 800 non-match pairs agree only occasionally on city
  // (a low-cardinality field) and never on name/phone. Deterministic
  // pseudo-random city agreement via residues.
  private def pairTable = {
    val matches = (0 until 200).map { i =>
      (i.toLong, i + 100000L, true, true, i % 10 != 0) // 90% city agree
    }
    val decoys = (0 until 800).map { i =>
      (i + 1000L, i + 200000L, false, false, i % 5 == 0) // 20% city agree
    }
    (matches ++ decoys).toDF("id_a", "id_b", "a_name", "a_phone", "a_city")
  }

  test("EM learns per-field evidence and separates matches from decoys") {
    val cols = Seq("a_name", "a_phone", "a_city")
    val p = FellegiSunter.train(pairTable, cols, iters = 5)
    // mixture weight near the true match fraction (0.2), never degenerate
    assert(p.lambda > 0.05 && p.lambda < 0.5, s"lambda ${p.lambda}")
    // name/phone: near-certain under match, near-impossible under
    // non-match; city: informative but weak
    assert(p.m(0) > 0.9 && p.u(0) < 0.1, s"name m=${p.m(0)} u=${p.u(0)}")
    assert(p.m(1) > 0.9 && p.u(1) < 0.1, s"phone m=${p.m(1)} u=${p.u(1)}")
    assert(p.m(2) > p.u(2), s"city m=${p.m(2)} u=${p.u(2)}")
    // smoothing keeps every parameter strictly inside (0, 1)
    (p.m ++ p.u).foreach(x => assert(x > 0.0 && x < 1.0))
    // agreement on a discriminative field earns a positive weight,
    // disagreement a negative one
    assert(p.agreeWeights(0) > 0 && p.disagreeWeights(0) < 0)

    val scored = FellegiSunter.score(pairTable, cols, p)
    val byClass = scored
      .withColumn("truth", col("id_b") < 150000L)
      .groupBy("truth").agg(
        min(col("fs_score")).as("lo"), max(col("fs_score")).as("hi"),
        sum(col("is_match").cast("long")).as("n_match"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getBoolean(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (tLo, _, tMatch, tN) = byClass(true)
    val (_, dHi, dMatch, dN) = byClass(false)
    // full separation on this clean mixture: every planted match above
    // every decoy, MAP decision perfect
    assert(tLo > dHi, s"match min $tLo <= decoy max $dHi")
    assert(tMatch === tN, "every planted match classified as match")
    assert(dMatch === 0L, "no decoy classified as match")
  }

  test("training and scores are identical across partitionings") {
    val cols = Seq("a_name", "a_phone", "a_city")
    val p1 = FellegiSunter.train(pairTable.repartition(1), cols)
    val p17 = FellegiSunter.train(pairTable.repartition(17, col("id_a")), cols)
    assert(p1.lambda === p17.lambda)
    assert(p1.m.toSeq === p17.m.toSeq)
    assert(p1.u.toSeq === p17.u.toSeq)
    val s1 = FellegiSunter.link(pairTable.repartition(1), cols)
      .orderBy("id_a", "id_b").select("id_a", "id_b", "fs_score")
      .as[(Long, Long, Long)].collect()
    val s17 = FellegiSunter.link(pairTable.repartition(17, col("id_a")), cols)
      .orderBy("id_a", "id_b").select("id_a", "id_b", "fs_score")
      .as[(Long, Long, Long)].collect()
    assert(s1 === s17)
  }

  test("loud guards: empty pair table, no agreement columns") {
    val empty = pairTable.filter(col("id_a") < 0)
    intercept[IllegalArgumentException](
      FellegiSunter.train(empty, Seq("a_name")))
    intercept[IllegalArgumentException](
      FellegiSunter.train(pairTable, Seq.empty))
  }
}
