package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.similarity.{Knn, Prune}
import graft.sources.Tables

class PruneSpec extends SparkSuite {
  import spark.implicits._

  /** Two hand-placed cells in R²: a tight cluster around (1,0) plus one
    * planted outlier, and a second cluster around (0,1). Hand-made
    * centroids pin the assignment so every rank is computable by hand.
    */
  private val cents: Knn.Centroids = Array(
    1 -> Array(1f, 0f), 2 -> Array(0f, 1f))

  private def planted: DataFrame = Seq(
    // cell 1: four prototypical members + one far outlier (id 5)
    (1L, Seq(1.00f, 0.01f)), (2L, Seq(0.99f, 0.02f)),
    (3L, Seq(1.01f, 0.00f)), (4L, Seq(0.98f, 0.01f)),
    (5L, Seq(0.50f, 0.50f)), // outlier: still nearer (1,0) than (0,1)? equidistant -> id tie
    // cell 2: three members
    (6L, Seq(0.00f, 1.00f)), (7L, Seq(0.02f, 0.99f)), (8L, Seq(0.01f, 1.01f))
  ).toDF("vec_id", "embedding")

  test("keepHardest keeps the planted outlier; prototypical mode drops it") {
    // (0.5,0.5) is equidistant from both centroids; the struct min
    // tie-breaks to the LOWER cid, so it lands in cell 1 as its
    // farthest member.
    val hard = Prune.byPrototypicality(planted, "embedding", cents,
      keepBp = 2000, keepHardest = true)
    val hardKept = hard.filter(col("kept")).select("vec_id")
      .as[Long].collect().toSet
    // cell 1: n=5 -> keep 1 (5*2000 DIV 10000 = 1): the outlier
    // cell 2: n=3 -> keep max(1, 0) = 1: farthest by (dist2 desc, id)
    assert(hardKept.contains(5L))
    assert(hard.filter(col("kept") && col("centroid_id") === 1L).count() === 1)
    assert(hard.filter(col("kept") && col("centroid_id") === 2L).count() === 1)

    val proto = Prune.byPrototypicality(planted, "embedding", cents,
      keepBp = 2000, keepHardest = false)
    val protoKept = proto.filter(col("kept")).select("vec_id")
      .as[Long].collect().toSet
    assert(!protoKept.contains(5L), "prototypical mode must drop the outlier")
  }

  test("every row appears once; kept == (drank <= max(1, n*bp div 1e4))") {
    val emb = Tables.load(spark, sf, "embeddings")
    val out = Prune.byPrototypicality(emb, "embedding",
      Knn.trainCentroids(emb, nCentroids = 4, iters = 1),
      keepBp = 3000, keepHardest = true).cache()
    assert(out.count() === emb.count())
    assert(out.select("vec_id").distinct().count() === emb.count())
    val bad = out.filter(
      col("kept") =!= (col("drank") <= greatest(lit(1L),
        expr("cell_n * 3000 DIV 10000")))).count()
    assert(bad === 0L)
    // the keep floor: at least one row survives per cell
    val cells = out.groupBy("centroid_id")
      .agg(count(lit(1)).as("n"), sum(col("kept").cast("long")).as("k"))
      .as[(Long, Long, Long)].collect()
    cells.foreach { case (c, n, k) =>
      assert(k === math.max(1L, n * 3000 / 10000),
        s"cell $c: n=$n kept=$k")
    }
    out.unpersist()
  }

  test("kept set is exactly the per-cell top-n by (dist2 desc, id)") {
    val emb = Tables.load(spark, sf, "embeddings")
    val out = Prune.byPrototypicality(emb, "embedding",
      Knn.trainCentroids(emb, nCentroids = 4, iters = 1),
      keepBp = 1000, keepHardest = true)
      .select("centroid_id", "vec_id", "dist2", "drank", "kept")
      .as[(Long, Long, Double, Long, Boolean)].collect()
    out.groupBy(_._1).foreach { case (_, rows) =>
      val byRank = rows.sortBy(r => (-r._3, r._2)) // dist2 desc, id asc
      byRank.zipWithIndex.foreach { case (r, i) =>
        assert(r._4 === i + 1L, s"rank mismatch for ${r._2}")
      }
      val nKeep = math.max(1L, rows.length * 1000L / 10000L)
      assert(rows.count(_._5) === nKeep)
      assert(byRank.take(nKeep.toInt).forall(_._5))
    }
  }
}
