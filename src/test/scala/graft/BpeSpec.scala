package graft

import org.apache.spark.sql.functions._
import graft.pipelines.Bpe

class BpeSpec extends SparkSuite {
  import spark.implicits._

  /** Independent local reference of the published algorithm. */
  private def referenceBpe(words: Map[String, Long], numMerges: Int,
                           minCount: Long = 2L): Seq[(String, String, Long)] = {
    var syms: Map[Vector[String], Long] =
      words.map { case (w, c) => (w.map(_.toString).toVector :+ "</w>") -> c }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    while (out.length < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      syms.foreach { case (s, c) =>
        s.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), n) = counts.toSeq.minBy { case ((l, r), n) => (-n, l, r) }
        if (n < minCount) done = true
        else {
          out += ((l, r, n))
          syms = syms.map { case (s, c) =>
            val b = Vector.newBuilder[String]
            var i = 0
            while (i < s.length) {
              if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
                b += (l + r); i += 2
              } else { b += s(i); i += 1 }
            }
            b.result() -> c
          }
        }
      }
    }
    out.toSeq
  }

  private def corpusOf(words: Map[String, Long]) =
    Seq(words.flatMap { case (w, c) => Seq.fill(c.toInt)(w) }.mkString(" "))
      .toDF("text").withColumn("doc_id", lit(1L))

  test("merge sequence equals the published algorithm on the classic corpus") {
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val got = Bpe.train(corpusOf(words), "text", numMerges = 10)
      .orderBy("rank").as[(Int, String, String, Long)].collect()
      .map(m => (m._2, m._3, m._4)).toSeq
    assert(got === referenceBpe(words, 10))
    // the canonical first merges: (e,s) then (es,t) then (est,</w>)
    assert(got.take(3).map(m => (m._1, m._2)) ===
      Seq(("e", "s"), ("es", "t"), ("est", "</w>")))
  }

  test("merge sequence equals the reference on a randomized vocabulary") {
    val rnd = new scala.util.Random(5)
    val words = (1 to 60).map { _ =>
      val len = 2 + rnd.nextInt(6)
      (1 to len).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString ->
        (1L + rnd.nextInt(20))
    }.toMap
    val got = Bpe.train(corpusOf(words), "text", numMerges = 25)
      .orderBy("rank").as[(Int, String, String, Long)].collect()
      .map(m => (m._2, m._3, m._4)).toSeq
    assert(got === referenceBpe(words, 25))
  }

  test("segmenting the training corpus reproduces training's final state") {
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = Bpe.train(corpusOf(words), "text", numMerges = 8)
      .orderBy("rank").as[(Int, String, String, Long)].collect()
      .map(m => (m._2, m._3)).toSeq
    // local replay of training's end state
    var syms: Map[Vector[String], Long] =
      words.map { case (w, c) => (w.map(_.toString).toVector :+ "</w>") -> c }
    merges.foreach { case (l, r) =>
      syms = syms.map { case (s, c) =>
        val b = Vector.newBuilder[String]; var i = 0
        while (i < s.length) {
          if (i + 1 < s.length && s(i) == l && s(i + 1) == r) { b += (l + r); i += 2 }
          else { b += s(i); i += 1 }
        }
        b.result() -> c
      }
    }
    val want = syms.keys.map(v => v.mkString("|")).toSet
    val got = words.keys.toSeq.toDF("w")
      .select(Bpe.segmentExpr(col("w"), merges).as("segs"))
      .select(element_at(col("segs"), 1).as("s"))
      .as[Seq[String]].collect().map(_.mkString("|")).toSet
    assert(got === want)
  }

  test("subword token counts shrink as merges apply") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(50)
    val merges = Bpe.train(docs, "text", numMerges = 10)
      .orderBy("rank").as[(Int, String, String, Long)].collect()
      .map(m => (m._2, m._3)).toSeq
    assert(merges.nonEmpty)
    val before = Bpe.tokenCount(docs, "doc_id", "text", Seq.empty)
      .agg(sum("n_subwords")).as[Long].head()
    val after = Bpe.tokenCount(docs, "doc_id", "text", merges)
      .agg(sum("n_subwords")).as[Long].head()
    assert(after < before)
  }
}
