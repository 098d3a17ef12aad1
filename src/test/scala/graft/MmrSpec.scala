package graft

import org.apache.spark.sql.functions._
import graft.similarity.Mmr

class MmrSpec extends SparkSuite {
  import spark.implicits._

  private def df(rows: Seq[(Long, Long, Array[Float])]) =
    rows.toDF("id", "rank", "vec")

  test("a near-duplicate of the top hit is displaced by diverse evidence") {
    val a = Array(1f, 0f, 0f)
    val b = Array(0f, 1f, 0f)
    val out = Mmr.rerank(
      df(Seq((10L, 1L, a), (11L, 2L, a), (12L, 3L, b))),
      "id", "rank", "vec", k = 2)
      .orderBy("mmr_rank").select("id").as[Long].collect()
    // plain top-2 = {10, 11}; MMR must pick the orthogonal 12 second
    assert(out === Array(10L, 12L))
  }

  test("lambda = 10000 degenerates to pure relevance order") {
    val a = Array(1f, 0f); val rows =
      Seq((1L, 3L, a), (2L, 1L, a), (3L, 2L, a))
    val out = Mmr.rerank(df(rows), "id", "rank", "vec", k = 3,
      lambdaBp = 10000)
      .orderBy("mmr_rank").select("id").as[Long].collect()
    assert(out === Array(2L, 3L, 1L))
  }

  test("equals an independent greedy replay on random candidates") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 40L).map(i =>
      (i, i, Array.fill(8)(rnd.nextFloat() - 0.5f)))
    val got = Mmr.rerank(df(rows), "id", "rank", "vec", k = 10)
      .orderBy("mmr_rank").select("id").as[Long].collect()

    // independent formulation: no incremental maxSim cache — rescore
    // every remaining candidate against the full selected set each round
    def relQ(r: Long) = 10000L / (60L + r)
    def simBp(a: Array[Float], b: Array[Float]): Long = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      if (na == 0 || nb == 0) 0L else math.floor(dot / (na * nb) * 10000.0 + 0.5).toLong
    }
    val byId = rows.map(r => r._1 -> r).toMap
    var sel = Vector.empty[Long]
    while (sel.length < 10) {
      val pick = rows.filterNot(r => sel.contains(r._1)).map { case (id, r, v) =>
        val pen = if (sel.isEmpty) 0L else sel.map(s => simBp(v, byId(s)._3)).max
        (id, r, 7000L * relQ(r) - 3000L * pen)
      }.minBy { case (id, r, s) => (-s, r, id) }
      sel :+= pick._1
    }
    assert(got.toVector === sel)
  }

  test("input order and partitioning do not change the selection") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 30L).map(i => (i, i, Array.fill(6)(rnd.nextFloat())))
    val a = Mmr.rerank(df(rows), "id", "rank", "vec", k = 8)
      .orderBy("mmr_rank").select("id").as[Long].collect()
    val b = Mmr.rerank(df(rnd.shuffle(rows)).repartition(7), "id", "rank", "vec", k = 8)
      .orderBy("mmr_rank").select("id").as[Long].collect()
    assert(a === b)
  }

  test("k beyond the candidate count returns everything once") {
    val rows = Seq((1L, 1L, Array(1f, 0f)), (2L, 2L, Array(0f, 1f)))
    val out = Mmr.rerank(df(rows), "id", "rank", "vec", k = 10)
    assert(out.count() === 2)
  }

  test("oversized candidate sets are refused loudly") {
    val rows = (1L to 50L).map(i => (i, i, Array(1f)))
    val e = intercept[IllegalArgumentException] {
      Mmr.rerank(df(rows), "id", "rank", "vec", k = 5, maxCandidates = 10)
    }
    assert(e.getMessage.contains("maxCandidates"))
  }
}
