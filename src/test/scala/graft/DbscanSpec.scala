package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dbscan

class DbscanSpec extends SparkSuite {
  import spark.implicits._

  // planted structure in a 64-dim space (signs of the leading 32 dims
  // all positive, so every point shares all four sign chunks and the
  // neighbor graph is exactly the cosine-thresholded graph):
  //  - ids 0..5: a tight family around a base direction (dense cluster)
  //  - id 10: close to id 0 only (border candidate)
  //  - ids 20..24: mutually-far one-offs (noise)
  private def planted = {
    val rnd = new scala.util.Random(71)
    val base = Array.fill(64)(rnd.nextFloat() * 0.5f + 0.5f)
    def jitter(eps: Float) = base.map(x => x + (rnd.nextFloat() - 0.5f) * eps)
    val fam = (0 until 6).map(i => (i.toLong, jitter(0.02f)))
    // border: strongly aligned with base but we verify via roles below
    val border = Seq((10L, base.map(_ * 0.9f)))
    // noise: each dominated by a DIFFERENT single axis (positive signs,
    // low mutual cosine)
    val noise = (0 until 5).map { i =>
      val v = Array.fill(64)(0.01f)
      v(i * 7 + 2) = 50f
      ((20 + i).toLong, v)
    }
    (fam ++ border ++ noise).toDF("vec_id", "embedding")
  }

  test("textbook roles: dense family is core, one-offs are noise") {
    val out = Dbscan.cluster(planted, "vec_id", "embedding",
      minCosine = 0.9, minPts = 4).collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    (0L until 6L).foreach { id =>
      assert(out(id)._1 === "core", s"id $id")
      assert(out(id)._2 === 0L, s"family label of $id")
    }
    (20L until 25L).foreach { id =>
      assert(out(id)._1 === "noise", s"id $id")
      assert(out(id)._2 === -1L, s"noise has no cluster: $id")
    }
    // the scaled copy of base is within cosine 0.9 of the family but
    // has at most the family as neighbors — with minPts = 4 its own
    // degree makes it core or border depending on chunk agreement;
    // DBSCAN invariant either way: it belongs to the family's cluster
    assert(Set("core", "border").contains(out(10L)._1))
    assert(out(10L)._2 === 0L)
  }

  test("density gating: a chain is NOT glued the way components glue it") {
    // a path a-b-c-d of pairwise-adjacent points where only interior
    // points could reach minPts: with minPts = 3, endpoints (degree 1)
    // are never core — they attach as borders. With plain transitive
    // closure all four would be one undifferentiated component
    // DISJOINT rotation planes (dims 40+2i, 41+2i — past the sign
    // window, so all four points share every sign chunk): k steps
    // apart means k planes rotated by θ=0.9, cos = (64−2k+2k·cosθ)/64
    // → 1-step 0.9882 ≥ 0.98, 2-step 0.9764 < 0.98
    val a = Array.fill(64)(1.0f)
    def rot(v: Array[Float], i: Int) = {
      val out = v.clone()
      val c = math.cos(0.9).toFloat; val s = math.sin(0.9).toFloat
      val x = v(40 + 2 * i); val y = v(41 + 2 * i)
      out(40 + 2 * i) = x * c - y * s; out(41 + 2 * i) = x * s + y * c
      out
    }
    val p1 = rot(a, 0); val p2 = rot(p1, 1); val p3 = rot(p2, 2)
    val chain = Seq((0L, a), (1L, p1), (2L, p2), (3L, p3))
      .toDF("vec_id", "embedding")
    val out = Dbscan.cluster(chain, "vec_id", "embedding",
      minCosine = 0.98, minPts = 3).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // interior points (degree 2) are core, endpoints (degree 1) are
    // only borders — where transitive closure would make one
    // undifferentiated 4-component with no distinction
    assert(out(1L) === "core" && out(2L) === "core", s"roles: $out")
    assert(out(0L) === "border" && out(3L) === "border", s"roles: $out")
  }

  test("deterministic and partition-invariant") {
    val d = planted
    val x = Dbscan.cluster(d.repartition(1), "vec_id", "embedding", 0.9, 4)
      .orderBy("id").collect().toSeq
    val y = Dbscan.cluster(d.repartition(13), "vec_id", "embedding", 0.9, 4)
      .orderBy("id").collect().toSeq
    assert(x === y)
  }

  test("border takes the smallest adjacent cluster label; minPts guard") {
    intercept[IllegalArgumentException] {
      Dbscan.cluster(planted, "vec_id", "embedding", 0.9, minPts = 1)
    }
    // invariants over the real table shape at sf: every border's label
    // is one of its core neighbors' labels is covered by the oracle
    // compare; here pin the role partition: every id appears exactly
    // once with a role
    val out = Dbscan.cluster(planted, "vec_id", "embedding", 0.9, 4)
    assert(out.groupBy("id").count().filter(col("count") > 1).isEmpty)
    assert(out.filter(col("role") === "noise" && col("cluster_id").isNotNull).isEmpty)
    assert(out.filter(col("role") =!= "noise" && col("cluster_id").isNull).isEmpty)
  }
}
