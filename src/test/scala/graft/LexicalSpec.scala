package graft

import org.apache.spark.sql.functions._
import graft.pipelines.Lexical

class LexicalSpec extends SparkSuite {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple banana apple cherry"),
    (2L, "banana cherry cherry"),
    (3L, "apple apple apple durian"),
    (4L, "cherry"),
    (5L, ""), // empty doc: no tf rows, not counted in N
    (6L, "banana unique")).toDF("doc_id", "text")

  test("termFrequencies matches hand counts") {
    val tf = Lexical.termFrequencies(corpus, "doc_id", "text")
      .as[(Long, String, Long)].collect().toSet
    assert(tf.contains((1L, "apple", 2L)))
    assert(tf.contains((3L, "apple", 3L)))
    assert(tf.contains((4L, "cherry", 1L)))
    assert(!tf.exists(_._1 == 5L)) // empty doc absent
  }

  test("tfIdfTopK scores with the quantized ratio and ranks deterministically") {
    // N = 5 docs with tokens. df: apple 2, banana 3, cherry 3, durian 1,
    // unique 1. score = tf * 10000 * N DIV df.
    val out = Lexical.tfIdfTopK(corpus, "doc_id", "text", k = 2)
      .select("doc_id", "term", "tfidf_q", "rank_in_group")
      .as[(Long, String, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4)).toMap
    // doc 3: apple tf=3 df=2 → 3*10000*5/2 = 75000; durian 1*10000*5/1 = 50000
    assert(out(3L).map(r => (r._2, r._3)) ===
      Seq(("apple", 75000L), ("durian", 50000L)))
    // doc 1: apple 2*10000*5 DIV 2 = 50000; banana and cherry tie at
    // 1*10000*5 DIV 3 = 16666 → term-asc tiebreak picks banana
    assert(out(1L).map(r => (r._2, r._3)) ===
      Seq(("apple", 50000L), ("banana", 16666L)))
    // tie in doc 6: banana 1*10000*5 DIV 3 = 16666, unique 50000 — unique first
    assert(out(6L).head._2 === "unique")
  }

  test("invertedIndex bands df BEFORE collecting postings") {
    // band [1, 2]: cherry (df 3) and banana (df 3) are excluded — the
    // posting collect never sees them
    val asMap = Lexical.invertedIndex(corpus, "doc_id", "text", minDf = 1, maxDf = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(asMap("apple") === ((2L, "1,3")))
    assert(asMap("durian") === ((1L, "3")))
    assert(!asMap.contains("cherry") && !asMap.contains("banana"))
  }

  test("invertedIndex postings sort numerically, not lexically") {
    val wide = (Seq((2L, "zz"), (10L, "zz"), (9L, "zz"))).toDF("doc_id", "text")
    val m = Lexical.invertedIndex(wide, "doc_id", "text", 1, 10)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(m("zz") === "2,9,10") // lexical sort would give "10,2,9"
  }

  test("searchTopK equals brute-force scoring and breaks ties by id") {
    val out = Lexical.searchTopK(corpus, "doc_id", "text",
      Seq("apple", "cherry"), k = 10)
      .select("doc_id", "score_q", "rank").as[(Long, Long, Int)].collect()
    // N=5. apple df 2, cherry df 3.
    // doc1: 2*10000*5/2 + 1*10000*5/3 = 50000+16666 = 66666
    // doc2: cherry 2*...*5/3 = 33333; doc3: apple 75000; doc4: cherry 16666
    assert(out.map(r => (r._1, r._2)).toSeq ===
      Seq((3L, 75000L), (1L, 66666L), (2L, 33333L), (4L, 16666L)))
    assert(out.map(_._3).toSeq === Seq(1, 2, 3, 4))
  }

  test("searchTopK plans a TakeOrderedAndProject, not a global sort") {
    val plan = Lexical.searchTopK(corpus, "doc_id", "text", Seq("apple"), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-k should be TakeOrderedAndProject:\n$plan")
  }

  test("bm25TopK matches the cleared-denominator integer formula") {
    // naive reference computed straight from the docstring formula
    val docs = Seq(
      (1L, "apple banana apple cherry"), (2L, "banana cherry cherry"),
      (3L, "apple apple apple durian"), (4L, "cherry"),
      (6L, "banana unique")).map { case (id, s) => (id, s.split(" ").toSeq) }
    val tf = docs.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, g) => (id, t, g.size.toLong) } }
    val dl = docs.map { case (id, ts) => id -> ts.size.toLong }.toMap
    val bigT = dl.values.sum
    val n = docs.size.toLong
    val terms = Seq("apple", "cherry")
    val df = terms.map(t => t -> tf.count(_._2 == t).toLong).toMap
    val want = tf.filter(r => terms.contains(r._2))
      .groupBy(_._1).map { case (id, rows) =>
        val score = rows.map { case (_, t, f) =>
          val idf = (2 * n - 2 * df(t) + 1) * 1000L / (2 * df(t) + 1)
          val tfp = 22L * bigT * f * 10000L /
            (10L * bigT * f + 3L * bigT + 9L * dl(id) * n)
          idf * tfp
        }.sum
        (id, rows.size.toLong, score)
      }.toSeq.sortBy(r => (-r._3, r._1))
    val got = Lexical.bm25TopK(corpus, "doc_id", "text", terms, k = 10)
      .select("doc_id", "n_hit_terms", "score_q")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === want)
  }

  test("bm25 length normalization outranks the padded doc raw TF-IDF prefers") {
    // same single query-term hit, one focused doc vs one long padded doc
    val c = Seq(
      (1L, "target"),
      (2L, "target " + Seq.fill(60)("pad").mkString(" "))).toDF("doc_id", "text")
    val bm = Lexical.bm25TopK(c, "doc_id", "text", Seq("target"), k = 2)
      .select("doc_id", "rank").as[(Long, Int)].collect().toMap
    assert(bm(1L) === 1 && bm(2L) === 2) // short doc wins under BM25
    val tfidf = Lexical.searchTopK(c, "doc_id", "text", Seq("target"), k = 2)
      .select("doc_id", "score_q").as[(Long, Long)].collect().toMap
    assert(tfidf(1L) === tfidf(2L)) // raw TF-IDF can't tell them apart
  }

  test("bm25TopK plans a TakeOrderedAndProject, not a global sort") {
    val plan = Lexical.bm25TopK(corpus, "doc_id", "text", Seq("apple"), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-k should be TakeOrderedAndProject:\n$plan")
  }

  test("rrfFuse sums quantized reciprocal ranks across branches") {
    // branch A ranks: d1=1, d2=2, d3=3; branch B ranks: d2=1, d4=2
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rank")
    val b = Seq((2L, 1), (4L, 2)).toDF("doc_id", "rank")
    val out = Lexical.rrfFuse(Seq(a, b), "doc_id", rrfK = 60, topK = 10)
      .as[(Long, Long, Long, Int)].collect().toSeq
    // contributions: rank1 → 10000/61=163, rank2 → 161, rank3 → 158
    // d2: 161+163=324 (both lists), d1: 163, d3: 158, d4: 161
    assert(out === Seq(
      (2L, 2L, 324L, 1), (1L, 1L, 163L, 2), (4L, 1L, 161L, 3), (3L, 1L, 158L, 4)))
  }

  test("rrfFuse truncates to topK and breaks score ties by id") {
    // two docs at identical rank in different branches tie → id order
    val a = Seq((9L, 1), (5L, 2)).toDF("doc_id", "rank")
    val b = Seq((7L, 1)).toDF("doc_id", "rank")
    val out = Lexical.rrfFuse(Seq(a, b), "doc_id", rrfK = 60, topK = 2)
      .as[(Long, Long, Long, Int)].collect().toSeq
    assert(out === Seq((7L, 1L, 163L, 1), (9L, 1L, 163L, 2)))

    val plan = Lexical.rrfFuse(Seq(a, b), "doc_id", topK = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"fused top-k should be TakeOrderedAndProject:\n$plan")
  }

  test("vocabCoverage: oov mass is exactly the non-top-V token mass") {
    import spark.implicits._
    // freqs: a=5, b=3, c=2, d=1 -> vocab(2) = {a, b}
    val docs = Seq(
      (1L, "a a a b b c"),     // 6 tokens, oov c -> 1
      (2L, "a a b c d"),       // 5 tokens, oov c d -> 2
      (3L, "")).toDF("doc_id", "text")
    val out = graft.pipelines.Lexical.vocabCoverage(docs, "doc_id", "text", 2)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_oov", "oov_bp")
      .as[(Long, Long, Long, Long)].collect()
    assert(out === Array((1L, 6L, 1L, 1666L), (2L, 5L, 2L, 4000L)))
  }

  test("vocabCoverage tiebreak: equal counts resolve by term order") {
    import spark.implicits._
    // x and y both occur twice; vocab(1) must pick 'x' (term asc)
    val docs = Seq((1L, "x y"), (2L, "y x")).toDF("doc_id", "text")
    val out = graft.pipelines.Lexical.vocabCoverage(docs, "doc_id", "text", 1)
      .orderBy("doc_id").select("n_oov").as[Long].collect()
    assert(out === Array(1L, 1L)) // each doc's 'y' is OOV
  }

  test("unigramLogloss: closed-form surprisal on a hand corpus") {
    import spark.implicits._
    // corpus: c(a)=2, c(b)=1, c(c)=1; N=4, D=3
    val docs = Seq((1L, "a a b"), (2L, "c")).toDF("doc_id", "text")
    def l(c: Long) =
      math.floor(10000.0 * StrictMath.log(7.0 / (c + 1.0)) + 0.5).toLong
    val out = graft.pipelines.Lexical.unigramLogloss(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "surprisal_q", "mean_surprisal_q")
      .as[(Long, Long, Long, Long)].collect()
    val d1 = 2L * l(2) + l(1)
    assert(out === Array((1L, 3L, d1, d1 / 3L), (2L, 1L, l(1), l(1))))
    // the common-token doc carries LOWER mean surprisal than the rare one
    assert(out(0)._4 < out(1)._4)
  }

  test("bigramLogloss: closed-form conditional surprisal on a hand corpus") {
    import spark.implicits._
    // corpus bigrams: (a,b):2 [doc1x1, doc2x1], (b,a):1, (a,c):1
    // contexts: a -> c1=3, s1=2 ; b -> c1=1, s1=1
    val docs = Seq((1L, "a b a c"), (2L, "a b")).toDF("doc_id", "text")
    def l(c1: Long, s1: Long, c12: Long) =
      math.floor(10000.0 * StrictMath.log((c1 + s1).toDouble / (c12 + 1.0)) + 0.5).toLong
    val lab = l(3, 2, 2); val lba = l(1, 1, 1); val lac = l(3, 2, 1)
    val out = graft.pipelines.Lexical.bigramLogloss(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_bigrams", "surprisal2_q", "mean_surprisal2_q")
      .as[(Long, Long, Long, Long)].collect()
    val d1 = lab + lba + lac // doc1 pairs: (a,b),(b,a),(a,c)
    assert(out === Array((1L, 3L, d1, d1 / 3L), (2L, 1L, lab, lab)))
  }

  test("bigramLogloss: scrambled word order scores higher than natural order") {
    import spark.implicits._
    val natural = (1L to 30L).map(i => (i, "the cat sat on the mat"))
    // one doc with the same words, implausible order
    val docs = (natural :+ ((31L, "mat the on sat cat the"))).toDF("doc_id", "text")
    val out = graft.pipelines.Lexical.bigramLogloss(docs, "doc_id", "text")
      .select("doc_id", "mean_surprisal2_q").as[(Long, Long)].collect().toMap
    assert(out(31L) > out(1L))
  }

  test("kneserNeyLogloss: closed-form interpolated chain on a hand corpus") {
    import spark.implicits._
    // trigrams (a,b,c):1 and (a,b,d):1 — every statistic is tiny enough
    // to chase through the three-order interpolation by hand:
    //   p1(c) = N1+(.c)/N1+(..) = 1/2
    //   p2(b,c) = (max(1-.75,0) + .75*N1+(b.)*p1)/N1+(.b.) = (0.25+0.75)/2 = 0.5
    //   p3(a,b,c) = (max(1-.75,0) + .75*N1+(ab.)*p2)/c(ab.) = (0.25+0.75)/2 = 0.5
    //   l = floor(-1e4*ln(0.5)+0.5) = 6931, symmetric for d
    val docs = Seq((1L, "a b c"), (2L, "a b d")).toDF("doc_id", "text")
    val out = graft.pipelines.Lexical.kneserNeyLogloss(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_trigrams", "surprisal3_q", "mean_surprisal3_q")
      .as[(Long, Long, Long, Long)].collect()
    assert(out === Array((1L, 1L, 6931L, 6931L), (2L, 1L, 6931L, 6931L)))
  }

  test("kneserNeyLogloss separates scrambled-but-locally-plausible text the bigram misses") {
    import spark.implicits._
    // every bigram of the probe is corpus-common ((red,fish) and
    // (fish,jump) both appear 30+ times), so the BIGRAM filter scores it
    // exactly like the natural probe — but the trigram continuation
    // (red fish JUMP) is novel, and only the order-3 model sees that
    val docsA = (1L to 30L).map(i => (i, "red fish swim"))
    val docsB = (31L to 60L).map(i => (i, "big fish jump"))
    val probes = Seq((61L, "red fish swim"), (62L, "red fish jump"))
    val docs = (docsA ++ docsB ++ probes).toDF("doc_id", "text")
    val bi = graft.pipelines.Lexical.bigramLogloss(docs, "doc_id", "text")
      .select("doc_id", "mean_surprisal2_q").as[(Long, Long)].collect().toMap
    assert(bi(62L) === bi(61L),
      s"bigram should read the recombined probe as normal: ${bi(62L)} vs ${bi(61L)}")
    val kn = graft.pipelines.Lexical.kneserNeyLogloss(docs, "doc_id", "text")
      .select("doc_id", "mean_surprisal3_q").as[(Long, Long)].collect().toMap
    assert(kn(62L) > 2L * kn(61L),
      s"KN should flag the novel continuation: ${kn(62L)} vs ${kn(61L)}")
  }

  test("rakeKeywords: hand-computed degree/frequency scoring") {
    import spark.implicits._
    // doc: "red apple the red apple pie a pie"
    // phrases: [red apple], [red apple pie], [pie]
    // freq: red 2, apple 2, pie 2 ; deg: red 2+3=5, apple 5, pie 3+1=4
    // scores_e4: red 25000, apple 25000, pie 20000
    // phrase scores: "red apple" 50000 (1 occ), "red apple pie" 70000,
    // "pie" 20000
    val docs = Seq((1L, "red apple the red apple pie a pie"))
      .toDF("doc_id", "text")
    val out = graft.pipelines.Lexical.rakeKeywords(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("score_e4"), r.getAs[Long]("n_occurrences"),
          r.getAs[Long]("rank"))).toMap
    assert(out("red apple pie") == (70000L, 1L, 1L))
    assert(out("red apple") == (50000L, 1L, 2L))
    assert(out("pie") == (20000L, 1L, 3L))

    // phrases over maxPhraseLen are dropped entirely
    val long = Seq((1L, "w1 w2 w3 w4 w5 the ok"))
      .toDF("doc_id", "text")
    val o2 = graft.pipelines.Lexical.rakeKeywords(long, "doc_id", "text",
      maxPhraseLen = 4).collect().map(_.getString(0)).toSet
    assert(o2 == Set("ok"))

    // identical phrase texts across docs merge, occurrences counted
    val multi = Seq((1L, "big data"), (2L, "big data"))
      .toDF("doc_id", "text")
    val o3 = graft.pipelines.Lexical.rakeKeywords(multi, "doc_id", "text")
      .head()
    assert(o3.getString(0) == "big data")
    assert(o3.getAs[Long]("n_occurrences") == 2L)
  }

  test("ndcgAtK: method invariants — perfect ranking scores 10000 bp, " +
    "displacing a high-gain doc lowers it, labels are graded") {
    import spark.implicits._
    // Corpus where BM25's ranking IS the ideal ranking: one query term,
    // higher tf ⇒ higher bm25 AND higher gain (doc length constant, so
    // score is monotone in tf).
    val aligned = Seq(
      (1L, "hit hit hit pad pad pad pad pad"),   // tf 3 → gain 7
      (2L, "hit hit pad pad pad pad pad pad"),   // tf 2 → gain 3
      (3L, "hit pad pad pad pad pad pad pad"),   // tf 1 → gain 1
      (4L, "pad pad pad pad pad pad pad pad"))   // irrelevant
      .toDF("doc_id", "text")
    val perfect = graft.pipelines.Lexical.ndcgAtK(
      aligned, "doc_id", "text", Seq("hit"), k = 3).head()
    assert(perfect.getAs[Long]("n_rel_docs") == 3L)
    assert(perfect.getAs[Long]("ndcg_bp") == 10000L,
      "a ranking identical to the ideal ordering must score exactly 1.0")
    // dcg uses the pinned discounts: 7·1000000 + 3·630929 + 1·500000
    assert(perfect.getAs[Long]("dcg_q") == 7L*1000000L + 3L*630929L + 500000L)

    // Break the alignment: the gain-7 doc is PADDED so long that bm25's
    // length normalization ranks it below the short gain-1 doc — the
    // metric must punish the displacement (ndcg strictly < 10000).
    val displaced = Seq(
      (1L, ("hit hit hit " + "pad " * 60).trim),
      (2L, "hit pad"),
      (3L, "pad pad"))
      .toDF("doc_id", "text")
    val worse = graft.pipelines.Lexical.ndcgAtK(
      displaced, "doc_id", "text", Seq("hit"), k = 2).head()
    assert(worse.getAs[Long]("ndcg_bp") < 10000L,
      "ranking a low-gain doc above a high-gain one must cost ndcg")
    assert(worse.getAs[Long]("idcg_q") > worse.getAs[Long]("dcg_q"))

    // gain caps at rel 3: tf 50 and tf 3 carry the same gain
    val capped = Seq((1L, ("hit " * 50).trim), (2L, "hit hit hit"))
      .toDF("doc_id", "text")
    val c = graft.pipelines.Lexical.ndcgAtK(
      capped, "doc_id", "text", Seq("hit"), k = 2).head()
    assert(c.getAs[Long]("idcg_q") == 7L*1000000L + 7L*630929L)
  }

  test("ndcgAtK: no-relevant-docs degenerate contract is the pinned " +
    "(0, NULL, NULL, NULL) row") {
    import spark.implicits._
    // no document contains the query term: the relevance frame is
    // empty, both discounted sums are NULL (sum over nothing), and
    // ndcg_bp inherits the NULL — the q_ndcg oracle produces the same
    // single row, so a corpus/query mismatch can't flip the gate
    val none = Seq((1L, "pad pad"), (2L, "pad")).toDF("doc_id", "text")
    val r = graft.pipelines.Lexical.ndcgAtK(
      none, "doc_id", "text", Seq("absent"), k = 3).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_rel_docs") == 0L)
    assert(r(0).isNullAt(r(0).fieldIndex("dcg_q")))
    assert(r(0).isNullAt(r(0).fieldIndex("idcg_q")))
    assert(r(0).isNullAt(r(0).fieldIndex("ndcg_bp")))
  }

  test("ccnet terciles: exact rank split per language, buckets ordered by surprisal") {
    // METHOD invariants of the CCNet head/middle/tail split (the
    // replay-equality rule: the gate proves both engines agree, this
    // proves the SPLIT is a tercile at all): with n scored docs per
    // lang, head gets floor(n/3), middle floor(2n/3)−floor(n/3), tail
    // the rest; and the surprisal ranges are ordered head ≤ middle ≤
    // tail with no overlap beyond ties
    val docs = (0 until 30).map { i =>
      val lang = if (i % 2 == 0) "aa" else "bb"
      // vary repetition so KN surprisal differs across docs
      val w = Seq("x", "y", "z", "p", "q")(i % 5)
      (i.toLong, s"$w $w the quick brown fox jumps over the lazy dog " * (1 + i % 4), lang)
    }.toDF("doc_id", "text", "lang")
    val kn = Lexical.kneserNeyLogloss(docs, "doc_id", "text", discountBp = 7500)
    val scored = docs.select(col("doc_id"), col("lang")).join(kn, Seq("doc_id"))
      .withColumn("__one", lit(1L))
    val ranked = graft.operators.RunningTotals.groupedRunningSum(scored,
      Seq("lang"), Seq(col("mean_surprisal3_q").asc, col("doc_id").asc),
      "__one", "__rk")
    val n = ranked.groupBy(col("lang")).agg(count(lit(1)).as("__n"))
    val rows = ranked.join(broadcast(n), Seq("lang"))
      .withColumn("bucket",
        when(col("__rk") * 3 <= col("__n"), lit("head"))
          .when(col("__rk") * 3 <= col("__n") * 2, lit("middle"))
          .otherwise(lit("tail")))
      .select("lang", "bucket", "mean_surprisal3_q")
      .as[(String, String, Long)].collect()
    Seq("aa", "bb").foreach { lang =>
      val byB = rows.filter(_._1 == lang).groupBy(_._2)
      val total = rows.count(_._1 == lang)
      assert(byB("head").length === total / 3)
      assert(byB("middle").length === 2 * total / 3 - total / 3)
      assert(byB("tail").length === total - 2 * total / 3)
      assert(byB("head").map(_._3).max <= byB("middle").map(_._3).min)
      assert(byB("middle").map(_._3).max <= byB("tail").map(_._3).min)
    }
  }

  test("reuse-shaping filters are value-preserving on null/empty-token corpora") {
    // The round-14 plan-shaping filters (isnotnull on the n-gram keys +
    // trivially-true count guards) exist ONLY to keep shared-subtree
    // copies canonically identical for AQE exchange reuse. This pins
    // the value-preservation contract on the nastiest token inputs:
    // null text, empty text, whitespace-only text, sub-n-gram docs —
    // a future consumer that wants null-token rows must fail HERE, not
    // silently downstream (round-14 verdict, item 7).
    val nasty = Seq(
      (1L, null.asInstanceOf[String]), (2L, ""), (3L, " \t "),
      (4L, "a b a"), (5L, "x"), (6L, "a b c a b c")).toDF("doc_id", "text")
    // termFrequencies == its unshaped twin: the filter drops NOTHING
    val unshaped = nasty
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .as[(Long, String, Long)].collect().toSet
    val shaped = Lexical.termFrequencies(nasty, "doc_id", "text")
      .as[(Long, String, Long)].collect().toSet
    assert(shaped === unshaped)
    // the logloss pipelines: null/empty/sub-n-gram docs contribute no
    // n-grams and emit no rows, so the shaped pipeline on the nasty
    // corpus must equal the same pipeline on the token-bearing subset.
    // Doc 3 IS token-bearing: Spark `trim` strips only spaces, so
    // " \t " trims to "\t" and splits into two EMPTY-STRING tokens —
    // one ("","") bigram. Pre-existing tokenizer semantics replayed
    // identically by the DuckDB oracle (hash-green at three SFs), and
    // empty strings are not null, so the shaping filters pass them
    // through — exactly the value-preservation this spec pins.
    val clean = nasty.filter(col("doc_id").isin(3L, 4L, 6L))
    assert(Lexical.bigramLogloss(nasty, "doc_id", "text")
        .collect().map(_.toSeq).toSet ===
      Lexical.bigramLogloss(clean, "doc_id", "text")
        .collect().map(_.toSeq).toSet)
    assert(Lexical.kneserNeyLogloss(nasty, "doc_id", "text", discountBp = 7500)
        .collect().map(_.toSeq).toSet ===
      Lexical.kneserNeyLogloss(clean, "doc_id", "text", discountBp = 7500)
        .collect().map(_.toSeq).toSet)
  }
}
