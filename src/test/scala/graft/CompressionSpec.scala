package graft

import graft.functions.Compression

class CompressionSpec extends SparkSuite {
  import spark.implicits._

  test("repetition compresses hardest, noise barely; empty convention; determinism") {
    val rnd = new scala.util.Random(41)
    val rep = "spam " * 400
    val prose = (1 to 400).map(i => s"w${(i * 37) % 211}").mkString(" ")
    val noise = (1 to 2000).map(_ => (rnd.nextInt(94) + 33).toChar).mkString
    val df = Seq((1L, rep), (2L, prose), (3L, noise), (4L, ""),
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Compression.ratios(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("raw_len"), r.getAs[Long]("ratio_bp"))).toMap
    assert(out(1L)._2 < out(2L)._2, "repetition < prose")
    assert(out(2L)._2 < out(3L)._2, "prose < noise")
    assert(out(1L)._2 < 500L, "template spam compresses >20x")
    assert(out(3L)._2 > 7000L, "noise barely compresses")
    assert(out(4L) == (0L, 10000L) && out(5L) == (0L, 10000L))
    assert(out(2L)._1 == prose.getBytes("UTF-8").length.toLong)

    val out2 = Compression.ratios(df.repartition(7), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("ratio_bp")).toMap
    assert(out.map { case (k, v) => k -> v._2 } == out2)
  }
}
