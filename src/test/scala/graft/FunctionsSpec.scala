package graft

import org.apache.spark.sql.functions._
import graft.functions._
import graft.plans.TableOrder

class FunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("SortedIntersect equals array_intersect on sorted distinct sets") {
    val rnd = new scala.util.Random(41)
    val rows = Seq.fill(200)((
      rnd.shuffle((0L to 60L).toList).take(rnd.nextInt(20)).sorted,
      rnd.shuffle((0L to 60L).toList).take(rnd.nextInt(20)).sorted))
    val df = rows.toDF("a", "b")
    val got = df.select(SortedIntersect.of(col("a"), col("b")))
      .as[Seq[Long]].collect()
    val want = df.select(array_intersect(col("a"), col("b")))
      .as[Seq[Long]].collect()
    // array_intersect keeps left order; both inputs sorted -> equal
    assert(got.toSeq === want.toSeq)
    // empty-result and full-overlap edges
    val e = Seq((Seq(1L, 2L), Seq(3L, 4L)), (Seq(1L, 2L), Seq(1L, 2L)))
      .toDF("a", "b")
      .select(SortedIntersect.of(col("a"), col("b"))).as[Seq[Long]].collect()
    assert(e(0) === Seq.empty[Long] && e(1) === Seq(1L, 2L))
  }

  test("tokens handles empty / whitespace-only / multi-space text") {
    val df = Seq("", "   ", "a  b\tc", " x ").toDF("t")
    val out = df.select(TextFunctions.tokenCount(col("t"))).as[Int].collect()
    assert(out === Array(0, 0, 3, 1))
  }

  test("tokenizer whitespace class matches RE2, not Java \\s (vertical tab)") {
    // Java \s includes \x0B, RE2's (the DuckDB oracle engine) does not —
    // the pinned class must treat \x0B as a TOKEN character in Spark so
    // both engines tokenize identically
    val df = Seq("a\u000Bb c").toDF("t")
    val toks = df.select(TextFunctions.tokens(col("t"))).as[Seq[String]].head
    assert(toks === Seq("a\u000Bb", "c")) // VT stays inside its token
    // and the BPE pattern counts \x0B as punctuation in BOTH engines
    val bpe = df.select(TextFunctions.bpeTokenCount(col("t"))).as[Int].head
    assert(bpe === 4) // a, \x0B, b, c
  }

  test("vocabHits and stopwordRatio count exact token matches") {
    val df = Seq("the cat the hat", "thecat").toDF("t")
    val hits = df.select(TextFunctions.vocabHits(col("t"), Seq("the"))).as[Int].collect()
    assert(hits === Array(2, 0))
  }

  test("langId picks marker-majority language, unknown on no hits") {
    val df = Seq("the cat and the dog", "el perro y la casa", "zzz qqq").toDF("t")
    val out = df.select(TextFunctions.langId(col("t"))).as[String].collect()
    assert(out === Array("en", "es", "unknown"))
  }

  test("qualityScore stays in [0,10000] basis points") {
    val df = Seq("", "the " * 300, "word").toDF("t")
    val out = df.select(TextFunctions.qualityScore(col("t"))).as[Int].collect()
    assert(out.forall(q => q >= 0 && q <= 10000))
    assert(out(0) === 0)
  }

  test("fingerprint: equal strings equal, different differ, codegen path works") {
    val df = Seq("hello world", "hello world", "hello worlds").toDF("t")
    val out = df.select(Fingerprint.fingerprint(col("t"))).as[Long].collect()
    assert(out(0) === out(1))
    assert(out(0) !== out(2))
  }

  test("minhash signature: identical texts identical, near texts mostly agree") {
    val a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16 w17 w18 w19 w20"
    val b = a.replace("w10", "CHANGED")
    val df = Seq(("a1", a), ("a2", a), ("b", b)).toDF("id", "t")
    val sigs = df.select(col("id"), MinHash.minhashSignature(col("t"), 64, 3))
      .as[(String, Seq[Long])].collect().toMap
    assert(sigs("a1") === sigs("a2"))
    val agree = sigs("a1").zip(sigs("b")).count { case (x, y) => x == y } / 64.0
    assert(agree > 0.5 && agree < 1.0) // ~jaccard of the two shingle sets
  }

  test("gramHashes: rolling recurrence matches direct per-gram recompute") {
    val text = (1 to 30).map(i => s"tok$i").mkString(" ")
    val n = 8
    val df = Seq(text, "too short", "").toDF("t")
    val out = df.select(GramHash.gramHashes(col("t"), n)).as[Seq[Long]].collect()
    assert(out(0).length === 30 - n + 1)
    assert(out(1).isEmpty && out(2).isEmpty) // < n tokens → no grams
    // equal n-grams hash equal regardless of position in the document:
    // repeat the first n tokens at the end and the keys must collide
    val toks = text.split(" ")
    val cyclic = (toks ++ toks.take(n)).mkString(" ")
    val c = Seq(cyclic).toDF("t")
      .select(GramHash.gramHashes(col("t"), n)).as[Seq[Long]].head()
    assert(c.head === c(30)) // gram at position 0 == gram starting at 30
    // distinct n-grams get distinct keys (no degenerate constant hash)
    assert(out(0).distinct.length === out(0).length)
  }

  test("simhash: identical = hamming 0, near texts within small hamming") {
    val a = (1 to 50).map(i => s"tok$i").mkString(" ")
    val b = a.replace("tok25", "other")
    val df = Seq(("a", a), ("b", b)).toDF("id", "t")
    val out = df.select(col("id"), SimHash.simhash(col("t"))).as[(String, Long)].collect().toMap
    assert(java.lang.Long.bitCount(out("a") ^ out("b")) <= 8)
  }

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f))
    ).toDF("a", "b")
    val out = df.select(round(VectorFunctions.cosine(col("a"), col("b")), 6)).as[Double].collect()
    assert(out === Array(1.0, 0.0))
  }

  test("redactPii scrubs emails, IPv4s, and phone shapes; leaves clean text alone") {
    import org.apache.spark.sql.functions.col
    val out = Seq(
      "mail me at jo.doe+x@sub.example.org today",
      "server 192.168.1.254 port 80",
      "call 555-123-4567 or 555 1234 5678",
      "nothing sensitive here 12345")
      .toDF("t").select(TextFunctions.redactPii(col("t"))).as[String].collect()
    assert(out(0) === "mail me at <EMAIL> today")
    assert(out(1) === "server <IP> port 80")
    assert(out(2) === "call <PHONE> or <PHONE>")
    assert(out(3) === "nothing sensitive here 12345")
  }

  test("topBigramFractionBp: uniform text low, looping text high, short text null") {
    import org.apache.spark.sql.functions.col
    val out = Seq(
      "a b c d e",          // 4 distinct bigrams of 4 -> 2500 bp
      "spam ham spam ham spam ham spam", // 'spam ham' 3 of 6 -> 5000 bp
      "one")                // <2 tokens -> null
      .toDF("t").select(TextFunctions.topBigramFractionBp(col("t")))
      .as[Option[Long]].collect()
    assert(out === Array(Some(2500L), Some(5000L), None))
  }

  test("dupNgramStats: run-length fold matches hand counts, short text null") {
    import org.apache.spark.sql.functions.col
    val st = TextFunctions.dupNgramStats(col("t"), 3)
    val out = Seq(
      // "a b c a b c a b" 3-grams: [a b c, b c a, c a b, a b c, b c a, c a b]
      // every gram count = 2 → n=6, dup_occ=6, dup_chars=6*5=30
      "a b c a b c a b",
      "x y z w",  // 2 distinct grams, none duplicated → (2, 0, 0)
      "p q")      // <3 tokens → null struct
      .toDF("t")
      .select(st.getField("n_grams"), st.getField("dup_occ"), st.getField("dup_chars"))
      .as[(Option[Long], Option[Long], Option[Long])].collect()
    assert(out(0) === ((Some(6L), Some(6L), Some(30L))))
    assert(out(1) === ((Some(2L), Some(0L), Some(0L))))
    assert(out(2) === ((None, None, None)))
  }

  test("dupNgramStats equals the explode-and-count formulation on random text") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("aa", "bb", "cc", "dd")
    val docs = (0 until 50).map(i =>
      (i.toLong, Seq.fill(3 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      .toDF("id", "t")
    val st = TextFunctions.dupNgramStats(col("t"), 3)
    val fold = docs.select(col("id"), st.getField("n_grams").as("n"),
      st.getField("dup_occ").as("o"), st.getField("dup_chars").as("c"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val naive = docs.select(col("id"), explode(transform(
        sequence(lit(0), size(TextFunctions.tokens(col("t"))) - 3),
        i => concat_ws(" ", element_at(TextFunctions.tokens(col("t")), i + 1),
          element_at(TextFunctions.tokens(col("t")), i + 2),
          element_at(TextFunctions.tokens(col("t")), i + 3)))).as("g"))
      .groupBy("id", "g").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(sum("c").as("n"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("o"),
        sum(when(col("c") > 1, col("c") * length(col("g"))).otherwise(0L)).as("cc"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(fold === naive)
  }

  test("gopherFlags: every rule is an exact integer comparison with the stated bounds") {
    import org.apache.spark.sql.functions.col
    val g = TextFunctions.gopherFlags(col("t"))
    def flags(t: String): (Long, Long, Long, Long, Long, Int, Int, Int, Int, Int, Int) =
      Seq(t).toDF("t").select(
        g.getField("n_words"), g.getField("word_chars"), g.getField("alpha_words"),
        g.getField("stop_hits"), g.getField("sym_hits"),
        g.getField("f_words"), g.getField("f_mean_len"), g.getField("f_alpha"),
        g.getField("f_stop"), g.getField("f_sym"), g.getField("keep"))
        .as[(Long, Long, Long, Long, Long, Int, Int, Int, Int, Int, Int)].head()

    // 50 words (boundary), all 4-char alpha, stopword "the" twice, no symbols
    val good = (Seq.fill(48)("word") ++ Seq("the", "the")).mkString(" ")
    val fg = flags(good)
    assert(fg === ((50L, 198L, 50L, 2L, 0L, 1, 1, 1, 1, 1, 1)))

    // too short, mean word length 2, digits only → several rules fail
    val bad = flags("12 34 56")
    assert(bad._6 === 0)        // f_words: 3 < 50
    assert(bad._7 === 0)        // f_mean_len: 2 < 3
    assert(bad._8 === 0)        // f_alpha: 0 alpha words
    assert(bad._11 === 0)       // keep

    // symbol rule: '###...' in a 10-char text → 3 hashes + 1 ellipsis = 4
    // sym hits, 40 > 10 → fail
    val sym = flags("###...abcd")
    assert(sym._5 === 4L && sym._10 === 0)

    // empty text: zero everything, short rules fail, symbol rule passes
    val e = flags("")
    assert(e._1 === 0L && e._6 === 0 && e._10 === 1 && e._11 === 0)
  }

  test("native cosine matches the HOF formulation incl. null/mismatch/zero edges") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions
    val hofCosine = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      VectorFunctions.dot(a, b) / (VectorFunctions.norm(a) * VectorFunctions.norm(b))
    val normal = Seq(
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f)),         // identical -> 1
      (Array(1f, 0f), Array(0f, 1f)),                 // orthogonal -> 0
      (Array(0.3f, -1.7f, 2.2f), Array(1.1f, 0.4f, -0.6f)))
      .toDF("a", "b")
    val both = normal.select(
      VectorFunctions.cosine(col("a"), col("b")).as("native"),
      hofCosine(col("a"), col("b")).as("hof"))
      .as[(Double, Double)].collect()
    both.foreach { case (n, h) => assert(n === h) } // bit-identical fold order
    assert(math.abs(both(0)._1 - 1.0) < 1e-12)

    val edges = Seq(
      (Array[java.lang.Float](0f, 0f), Array[java.lang.Float](1f, 2f)),   // zero norm
      (Array[java.lang.Float](1f, 2f, 3f), Array[java.lang.Float](1f, 2f)), // length mismatch
      (null.asInstanceOf[Array[java.lang.Float]], Array[java.lang.Float](1f)), // null input
      (Array[java.lang.Float](1f, null, 3f), Array[java.lang.Float](1f, 2f, 3f))) // null ELEMENT
      .toDF("a", "b")
    val nat = edges.select(VectorFunctions.cosine(col("a"), col("b")))
      .as[Option[Double]].collect()
    assert(nat.forall(_.isEmpty)) // all null, no exception
    // the replaced HOF formulation DIES on the zero-norm row under
    // Spark 4 ANSI mode — the native expression returning null is the fix
    val thrown = intercept[Exception] {
      edges.limit(1).select(hofCosine(col("a"), col("b"))).collect()
    }
    assert(thrown.getMessage.contains("DIVIDE_BY_ZERO"))
  }

  test("SetOverlapCounts == array_intersect/array_union sizes on random sets") {
    import graft.functions.SetOverlap
    val rnd = new scala.util.Random(7)
    val rows = (0 until 60).map { _ =>
      // overlapping ranges + in-side duplicates: set semantics must hold
      val a = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong)
      val b = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong)
      (a, b)
    } :+ ((Seq.empty[Long], Seq.empty[Long])) :+ ((Seq(1L, 1L, 1L), Seq.empty[Long]))
    val df = rows.toDF("a", "b")
      .withColumn("p", SetOverlap.packedCounts(col("a"), col("b")))
      .select(
        SetOverlap.interCount(col("p")).as("ki"),
        SetOverlap.unionCount(col("p")).as("ku"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("bi"),
        size(array_union(col("a"), col("b"))).cast("long").as("bu"))
    assert(df.filter(col("ki") =!= col("bi") || col("ku") =!= col("bu")).count() === 0)
    // null input → null, like the builtins
    val n = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
      .select(SetOverlap.packedCounts(col("a"), col("b")).as("p"))
    assert(n.filter(col("p").isNull).count() === 1)
  }

  test("jaro-winkler matches the published reference vectors") {
    import graft.functions.JaroWinkler
    // Winkler's canonical census pairs + structural edges
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.9611), ("DIXON", "DICKSONX", 0.8133),
      ("JELLYFISH", "SMELLYFISH", 0.8963), ("DWAYNE", "DUANE", 0.84),
      ("same", "same", 1.0), ("", "", 1.0), ("abc", "", 0.0),
      ("abc", "xyz", 0.0),
      // boost gate: shared prefix but jaro ≤ 0.7 keeps the RAW jaro
      // (Winkler threshold — DuckDB/rapidfuzz values, checked directly)
      ("AB", "ABXXXXXXXXXXXXXXXXXXXX", 0.6970), ("abcdef", "abzzzz", 0.5556),
      ("prefix", "przzzzzzzzzz", 0.5))
    val df = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(JaroWinkler.jaroWinkler(col("a"), col("b")).as("s"))
    val got = df.as[Double].collect()
    cases.map(_._3).zip(got).foreach { case (want, g) =>
      assert(math.abs(g - want) < 5e-4, s"$g vs $want")
    }
    // symmetric
    val sym = cases.map { case (a, b, _) => (b, a) }.toDF("a", "b")
      .select(JaroWinkler.jaroWinkler(col("a"), col("b")).as("s"))
      .as[Double].collect()
    assert(sym.zip(got).forall { case (x, y) => math.abs(x - y) < 1e-12 })
    // null propagates; SQL registration agrees with the column API
    val viaSql = spark.sql("SELECT graft_jaro_winkler('MARTHA', 'MARHTA')")
      .as[Double].head()
    assert(math.abs(viaSql - 0.9611) < 5e-4)
    val n = Seq((Some("x"), Option.empty[String])).toDF("a", "b")
      .select(JaroWinkler.jaroWinkler(col("a"), col("b")).as("s"))
    assert(n.filter(col("s").isNull).count() === 1)
  }

  test("char entropy matches closed forms, counts code points, codegen path works") {
    import graft.functions.CharEntropy
    val cases = Seq(
      ("aaaa", 0L),              // one symbol → 0 bits
      ("ab", 10000L),            // two equal symbols → 1 bit
      ("abcd", 20000L),          // four equal symbols → 2 bits
      ("aab", 9183L),            // log2(3) − 2/3 = 0.91830
      ("𝄞𝄞a", 9183L), // U+1D11E twice + 'a': 3 CODE POINTS, not 5 UTF-16 units
      ("", 0L))
    val df = cases.map(_._1).toDF("t")
      .select(CharEntropy.charEntropyBp(col("t")).as("e"))
    assert(df.as[Long].collect().toSeq === cases.map(_._2))
    // null propagates; whole-stage codegen keeps the expression fused
    val n = Seq(Option.empty[String]).toDF("t")
      .select(CharEntropy.charEntropyBp(col("t")).as("e"))
    assert(n.collect().head.isNullAt(0))
    // over a real scan (a literal local table short-circuits planning)
    // the expression stays inside whole-stage codegen: the projection
    // carries the *(n) codegen-stage marker
    val plan = spark.range(10)
      .select(CharEntropy.charEntropyBp(col("id").cast("string")).as("e"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }

  test("TableOrder: parents precede children, deterministic, cycles throw") {
    val order = TableOrder.order(graft.sources.Tables.All)
    def idx(t: String) = order.indexOf(t)
    assert(idx("region") < idx("nation"))
    assert(idx("nation") < idx("customer") && idx("nation") < idx("supplier"))
    assert(idx("orders") < idx("lineitem") && idx("customer") < idx("orders"))
    assert(order === TableOrder.order(graft.sources.Tables.All))
    intercept[IllegalArgumentException] {
      TableOrder.order(Seq("a", "b"), Map("a" -> Set("b"), "b" -> Set("a")))
    }
  }
}
