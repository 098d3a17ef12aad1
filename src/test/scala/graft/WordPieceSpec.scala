package graft

import org.apache.spark.sql.functions._
import graft.pipelines.{Bpe, WordPiece}

class WordPieceSpec extends SparkSuite {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("merge selection maximizes the likelihood-ratio score, not raw frequency") {
    // pair (a, ##b) is more FREQUENT (10 vs 9) but its left symbol is
    // diluted by 100 standalone "a" words: score 10/(110·10) —
    // WordPiece must pick (c, ##d) with score 9/(9·9) instead. BPE
    // (frequency argmax) picks the most frequent pair on the same
    // corpus — here (a, </w>) at count 100.
    val d = docs((Seq.fill(10)("ab") ++ Seq.fill(9)("cd") ++
      Seq.fill(100)("a")).mkString(" "))
    val m = WordPiece.fit(d, "text", numMerges = 1)
    assert(m.merges.length === 1)
    assert((m.merges(0).left, m.merges(0).right) === (("c", "##d")))
    assert(m.merges(0).pairCount === 9L)
    assert(m.merges(0).leftCount === 9L && m.merges(0).rightCount === 9L)
    val bpe = Bpe.train(d, "text", numMerges = 1).collect()
    assert((bpe(0).getString(1), bpe(0).getString(2)) === (("a", "</w>")))
  }

  test("merged tokens strip the continuation prefix and join the vocabulary") {
    val d = docs(Seq.fill(10)("abc").mkString(" "))
    val m = WordPiece.fit(d, "text", numMerges = 2)
    // alphabet: a, ##b, ##c; merges fuse the whole word
    assert(m.vocab.toSet.intersect(Set("a", "##b", "##c")) === Set("a", "##b", "##c"))
    assert(m.merges.forall(x => x.right.startsWith("##")))
    // every merge output is left + right-minus-prefix
    m.merges.foreach { x =>
      val tok = x.left + x.right.substring(2)
      assert(m.vocab.contains(tok), s"merged token $tok in vocab")
    }
    // after 2 merges the full word is a single vocab token
    assert(m.vocab.contains("abc"))
  }

  test("counts in the merge table replay against an independent state simulation") {
    val d = docs("banana bandana ban banana", "ban ban bandana")
    val m = WordPiece.fit(d, "text", numMerges = 5)
    // independent replay: rebuild states, apply merges in rank order,
    // recomputing the counts each round from scratch
    val words = d.as[(Long, String)].collect().flatMap(_._2.split("\\s+"))
      .groupBy(identity).map { case (w, g) => (w, g.length.toLong) }
    var states = words.toSeq.map { case (w, c) =>
      (w.toCharArray.zipWithIndex.map { case (ch, i) =>
        if (i == 0) ch.toString else "##" + ch
      }.toSeq, c)
    }
    m.merges.foreach { x =>
      var p = 0L; var nl = 0L; var nr = 0L
      states.foreach { case (s, c) =>
        s.indices.foreach { i =>
          if (s(i) == x.left) nl += c
          if (s(i) == x.right) nr += c
          if (i < s.length - 1 && s(i) == x.left && s(i + 1) == x.right) p += c
        }
      }
      assert(p === x.pairCount, s"pair count at rank ${x.rank}")
      assert(nl === x.leftCount, s"left count at rank ${x.rank}")
      assert(nr === x.rightCount, s"right count at rank ${x.rank}")
      val tok = x.left + x.right.substring(2)
      states = states.map { case (s, c) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        s.foreach { y =>
          if (out.nonEmpty && out.last == x.left && y == x.right)
            out(out.length - 1) = tok
          else out += y
        }
        (out.toSeq, c)
      }
    }
  }

  test("greedy encode is maximal munch over the trained vocabulary") {
    val d = docs(Seq.fill(20)("unhappy un happy").mkString(" "))
    val m = WordPiece.fit(d, "text", numMerges = 12)
    // the full word trains to a single token; encode must take it whole
    if (m.vocab.contains("unhappy"))
      assert(WordPiece.encodeWord("unhappy", m) === ((1L, false)))
    // a word whose first char was seen word-initial and whose rest were
    // seen as continuations always encodes (positional alphabet
    // coverage — note bare 'n' is NOT in this vocab: 'n' never starts
    // a training word, exactly BERT's position-aware alphabet)
    val (n, unk) = WordPiece.encodeWord("uppy", m)
    assert(!unk && n >= 1L)
    assert(WordPiece.encodeWord("nappy", m) === ((1L, true)))
  }

  test("a character outside the training alphabet makes the whole word UNK") {
    val d = docs("abc abd abe")
    val m = WordPiece.fit(d, "text", numMerges = 2)
    assert(WordPiece.encodeWord("abz", m) === ((1L, true)))
    assert(WordPiece.encodeWord("zzz", m) === ((1L, true)))
    // and the UNK word contributes exactly one token via the frame
    val wp = WordPiece.wordPieceCounts(spark, m)
    assert(wp.columns.toSeq === Seq("word", "n_toks", "is_unk"))
  }

  test("training is deterministic and fold == rescan") {
    val base = docs("spark park spark", "the park of spark")
    val delta = docs("sparkly parking spark", "park the spark")
    val all = docs(
      "spark park spark", "the park of spark",
      "sparkly parking spark", "park the spark")
    val folded = Bpe.wordCounts(base, "text")
      .unionAll(Bpe.wordCounts(delta, "text"))
      .groupBy(col("word")).agg(sum(col("cnt")).as("cnt"))
    val m1 = WordPiece.fitFromCounts(folded, numMerges = 8)
    val m2 = WordPiece.fit(all, "text", numMerges = 8)
    assert(m1.merges.toSeq === m2.merges.toSeq)
    assert(m1.vocab.toSeq === m2.vocab.toSeq)
    val m3 = WordPiece.fit(all, "text", numMerges = 8)
    assert(m2.merges.toSeq === m3.merges.toSeq)
  }

  test("empty corpus yields an empty model; encode of empty word is zero tokens") {
    val m = WordPiece.fit(docs(), "text", numMerges = 3)
    assert(m.merges.isEmpty && m.vocab.isEmpty && m.words.isEmpty)
    assert(WordPiece.encodeWord("", m) === ((0L, false)))
  }
}
