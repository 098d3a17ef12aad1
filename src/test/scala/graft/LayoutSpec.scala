package graft

import org.apache.spark.sql.functions._
import graft.sources.Layout

class LayoutSpec extends SparkSuite {
  import spark.implicits._

  // two independent uniform dims, deterministic (multiplicative hashes)
  private lazy val data = (1 to 40000).map { i =>
    (i.toLong,
      (i * 2654435761L % 1000003L).toDouble / 1000003.0,
      (i * 1099087573L % 999983L).toDouble / 999983.0)
  }

  private def spans(path: String) = {
    val byFile = spark.read.parquet(path)
      .groupBy(input_file_name())
      .agg((max($"x") - min($"x")).as("sx"), (max($"y") - min($"y")).as("sy"))
    byFile.agg(avg($"sx"), avg($"sy")).as[(Double, Double)].head()
  }

  test("z-order shrinks EVERY dimension's per-file span; linear sort only the leading one") {
    val df = data.toDF("id", "x", "y")
    val dir = java.nio.file.Files.createTempDirectory("layout").toString

    // linear layout: the classic sorted write, clustered on x only
    df.repartitionByRange(16, $"x").sortWithinPartitions("x")
      .write.mode("overwrite").parquet(s"$dir/linear")
    val (linX, linY) = spans(s"$dir/linear")
    assert(linX < 0.15, s"leading dim clusters: $linX")
    assert(linY > 0.9, s"non-leading dim spans the domain: $linY")

    // z-order layout: both dims narrow at once
    Layout.writeZOrdered(df, s"$dir/zorder", Seq("x", "y"), nFiles = 16)
    val (zX, zY) = spans(s"$dir/zorder")
    assert(zX < 0.5 && zY < 0.5,
      s"16 files over 2 dims ≈ 4x4 grid, spans ~0.25: got $zX / $zY")

    // layout changed, data did not
    val back = spark.read.parquet(s"$dir/zorder")
    assert(back.count() === df.count())
    assert(back.agg(sum(crc32(concat_ws("|", $"id", $"x", $"y")))).head() ===
      df.agg(sum(crc32(concat_ws("|", $"id", $"x", $"y")))).head())
  }

  test("equi-depth ranks stay balanced under heavy skew") {
    // 90% of rows in [0, 0.001), the rest uniform — min-max scaling
    // would put 90% of the data in one cell; equi-depth does not
    val skewed = (1 to 20000).map { i =>
      val u = (i * 2654435761L % 1000003L).toDouble / 1000003.0
      (i.toLong, if (i % 10 != 0) u / 1000.0 else u)
    }.toDF("id", "v")
    val rank = Layout.equiDepthRanks(skewed, Seq("v"), bits = 4).head
    val cells = skewed.withColumn("r", rank).groupBy("r").count()
      .as[(Long, Long)].collect().toMap
    assert(cells.size >= 12, s"most of the 16 cells populated: ${cells.size}")
    assert(cells.values.max <= 20000 / 16 * 4,
      s"no cell hoards the skewed mass: ${cells.values.max}")
  }

  test("zOrderKey interleaves bits of both dimensions") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (255L, 255L))
      .toDF("a", "b")
    val key = Layout.zOrderKey(Seq(col("a"), col("b")), bits = 8)
    val got = df.withColumn("z", key).select("z").as[Long].collect().toSeq
    // bit b of dim i lands at position b*2+i: (1,0)->1, (0,1)->2, (3,3)->15
    assert(got === Seq(0L, 1L, 2L, 15L, 65535L))
  }
}
