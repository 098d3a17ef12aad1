package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.TopK

/** Lexical indexing + retrieval over a document corpus — the sparse
  * (term-based) complement to the dense embedding family in
  * `graft.similarity.Knn`. A training-data pipeline needs both: embedding
  * ANN finds semantic near-duplicates, lexical TF-IDF finds the
  * keyword-anchored view (topic audit, targeted corpus slicing, "which
  * documents are about X" retrieval without an encoder pass).
  *
  * Reference tie-in: the provider family resolves rows by NAME tokens
  * (EcomDestinationWriter.cs:4146, 4524 resolve-by-name ladders); at corpus
  * scale the same need becomes term-indexed retrieval.
  *
  * Scoring is EXACT INTEGER arithmetic end to end: the classic idf uses
  * `ln(N/df)`, but `ln` is libm-dependent and cross-engine hazardous
  * (SURVEY §6), so scores here are the quantized ratio form
  * `tf * 10000 * N DIV df` — a BIGINT expression both engines evaluate
  * bit-identically, monotone in tf and in N/df (the two axes idf weighting
  * cares about). Overflow bound: tf ≤ doc tokens (~1e4), N ≤ ~1e12 docs
  * would be needed to approach 2^63 — document counts at 100 TB (~1e11
  * docs of 1 KB) stay 100× under the edge.
  *
  * Shuffle shape (the 100 TB story):
  *  - `termFrequencies`: one keyed aggregate on (id, term) — partial
  *    map-side combine applies, state per key is one long.
  *  - df: one aggregate on term over the ALREADY (id, term)-distinct tf
  *    frame (never the raw token stream), so hot terms cost one long of
  *    state, not a buffered posting list.
  *  - scoring join tf ⨝ df on term: both sides keyed by term; the df side
  *    is vocabulary-sized (orders of magnitude under the corpus) and AQE
  *    broadcasts it when it fits.
  *  - top-k per doc rides `TopK.perGroup`, so `WindowGroupLimit` keeps k
  *    rows per doc per map task ahead of the final shuffle.
  */
object Lexical {

  /** Exact (id, term, tf) term frequencies — whitespace tokens via the
    * pinned cross-engine class (TextFunctions.WhitespaceClass).
    */
  def termFrequencies(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
      // Reuse-shaping (round 14, the kneserNeyLogloss note): consumers
      // that derive document frequencies need only this frame's KEYS,
      // so column pruning used to strip the count aggregate from their
      // copy of this subtree and AQE exchange reuse never fired — the
      // df branch re-tokenized the corpus. The trivially-true filters
      // pin both the key nullability and the aggregate into every copy,
      // making the copies canonically identical (one tokenize per run).
      .filter(col("term").isNotNull && col("tf") >= 1)

  /** Per-document top-`k` terms by quantized TF-IDF.
    *
    * Output: (id, term, tf, df, tfidf_q, rank_in_group) with
    * `tfidf_q = tf * 10000 * N DIV df` (N = docs with ≥1 token) and a
    * deterministic (score desc, term asc) rank.
    *
    * Plan note (re-audited round 14): the df branch now reuses the tf
    * exchange — [[termFrequencies]]'s reuse-shaping filters keep the
    * two subtree copies canonically identical, so AQE exchange reuse
    * tokenizes once (it previously never fired and this form paid two
    * corpus scans). The alternative (df as `count() OVER (PARTITION BY
    * term)`) is one scan but funnels a stopword-tier term's billions of
    * rows into ONE window task — skew-fatal at corpus scale, while the
    * agg+join form keeps every step partially aggregated and mergeable.
    * A production pipeline can still materialize `termFrequencies` once
    * as its own table and feed [[tfIdfTopKFromTf]].
    */
  def tfIdfTopK(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val tf = termFrequencies(docs, idCol, textCol)
    val nDocs = docs
      .filter(TextFunctions.tokenCount(col(textCol)) > 0)
      .agg(count(lit(1)).as("n_docs"))
    tfIdfTopKFromTf(tf, nDocs, idCol, k)
  }

  /** The production path: score from a PRE-MATERIALIZED (id, term, tf)
    * table (one corpus tokenization, persisted once, feeding tf-idf,
    * search, and the inverted index alike) and a 1-row `n_docs` frame.
    */
  def tfIdfTopKFromTf(tf: DataFrame, nDocs: DataFrame, idCol: String,
                      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf
      .join(df, "term")
      .crossJoin(broadcast(nDocs)) // 1-row totals frame, Drift-style
      .withColumn("tfidf_q", expr("tf * 10000 * n_docs DIV df"))
      .drop("n_docs")
    TopK.perGroup(scored, Seq(idCol),
      Seq(col("tfidf_q").desc, col("term").asc), k)
      .select(col(idCol), col("term"), col("tf"), col("df"),
        col("tfidf_q"), col("rank_in_group"))
  }

  /** Posting lists for terms inside a document-frequency band.
    *
    * The band is the STRUCTURAL state bound: df is counted first (one
    * long per term), only banded terms join back, so the
    * `collect_list` that builds a posting buffers at most `maxDf` ids —
    * a stopword-tier term ("the", df ≈ corpus) never materializes a
    * corpus-sized list. The join back to the (id, term) frame reuses the
    * term partitioning of the df aggregate.
    *
    * Output: (term, df, postings) — postings a comma-joined numerically
    * sorted id list, deterministic for the oracle.
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    minDf: Long, maxDf: Long): DataFrame = {
    require(minDf >= 1 && maxDf >= minDf, s"bad df band [$minDf, $maxDf]")
    val termDoc = docs
      .select(col(idCol),
        explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("term"))
    val banded = termDoc
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .filter(col("df").between(minDf, maxDf))
    termDoc.join(banded, "term")
      .groupBy(col("term"), col("df"))
      .agg(array_join(
        transform(array_sort(collect_list(col(idCol))), _.cast("string")),
        ",").as("postings"))
  }

  /** Top-`k` documents for a bag of query terms, ranked by the summed
    * quantized TF-IDF of the matching terms. The query terms are a tiny
    * literal set, so the corpus token stream filters to query-term hits
    * FIRST (predicate on the exploded term — everything else drops before
    * any aggregation) and df is computed for the query terms only.
    *
    * Output: (id, n_hit_terms, score_q, rank) — deterministic
    * (score desc, id asc) order.
    */
  def searchTopK(docs: DataFrame, idCol: String, textCol: String,
                 queryTerms: Seq[String], k: Int): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k > 0, s"k must be positive, got $k")
    val tf = termFrequencies(docs, idCol, textCol)
      .filter(col("term").isin(queryTerms: _*))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs
      .filter(TextFunctions.tokenCount(col(textCol)) > 0)
      .agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(df, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("term_score", expr("tf * 10000 * n_docs DIV df"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hit_terms"), sum(col("term_score")).as("score_q"))
    // global top-k = orderBy + limit → TakeOrderedAndProject (per-partition
    // partial top-k, no global sort, no single-partition window); the rank
    // window then runs over k rows only.
    val top = scored.orderBy(col("score_q").desc, col(idCol).asc).limit(k)
    top.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score_q").desc, col(idCol).asc)))
      .select(col(idCol), col("n_hit_terms"), col("score_q"), col("rank"))
  }

  /** Top-`k` documents for a bag of query terms under BM25 (Robertson &
    * Walker '94) — the standard lexical ranking, with doc-length
    * normalization [[searchTopK]]'s raw TF-IDF lacks (a 10k-token page
    * mentioning the query once no longer outranks a focused paragraph).
    *
    * EXACT INTEGER arithmetic throughout, k1 = 1.2 and b = 0.75 as exact
    * rationals (6/5, 3/4) cleared of denominators:
    *
    *   tf_part  = 22·T·tf·10000  DIV  (10·T·tf + 3·T + 9·dl·n)
    *     [= 10⁴ · tf(k1+1) / (tf + k1(1−b+b·dl/avgdl)), avgdl = T/n]
    *   idf_q    = ((2n − 2df + 1)·1000)  DIV  (2df + 1)
    *     [= 10³ · (n − df + ½)/(df + ½), the BM25+ idf ratio — monotone
    *      in n/df like the tfidf quantization; ln is libm-hazardous]
    *   score_q  = Σ_terms idf_q · tf_part
    *
    * with T = total corpus tokens, n = docs, dl = doc tokens. Overflow:
    * 22·T·tf·10⁴ needs T·tf ≲ 4·10¹⁴ — T ≈ 10¹³ tokens (100 TB of text)
    * with tf ≤ 40 fits; beyond that pre-divide T by its gcd with 10⁴ or
    * drop to DECIMAL(38). The per-doc work is one join against the
    * query-filtered tf frame + the (dl, totals) frames — same shuffle
    * shape as [[searchTopK]] plus one dl aggregate reusing the (id, term)
    * exchange's input scan.
    *
    * Output: (id, n_hit_terms, score_q, rank), deterministic
    * (score desc, id asc).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k > 0, s"k must be positive, got $k")
    val tfAll = termFrequencies(docs, idCol, textCol)
    val dl = tfAll.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
    val totals = dl.agg(sum(col("dl")).as("t_tokens"),
      count(lit(1)).as("n_docs"))
    val tf = tfAll.filter(col("term").isin(queryTerms: _*))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf
      .join(df, "term")
      .join(dl, idCol)
      .crossJoin(broadcast(totals))
      .withColumn("term_score",
        expr("((2L * n_docs - 2L * df + 1L) * 1000L div (2L * df + 1L)) * " +
          "(22L * t_tokens * tf * 10000L div " +
          "(10L * t_tokens * tf + 3L * t_tokens + 9L * dl * n_docs))"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hit_terms"), sum(col("term_score")).as("score_q"))
    val top = scored.orderBy(col("score_q").desc, col(idCol).asc).limit(k)
    top.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score_q").desc, col(idCol).asc)))
      .select(col(idCol), col("n_hit_terms"), col("score_q"), col("rank"))
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09) of ranked lists —
    * the standard hybrid-retrieval combiner (sparse [[searchTopK]] +
    * dense [[graft.similarity.Knn]] top-k feed it their rank columns).
    * RRF needs only RANKS, so branch scores on incomparable scales
    * (quantized TF-IDF vs cosine) fuse without calibration.
    *
    * Scoring is the QUANTIZED integer form `Σ 10000 DIV (rrfK + rank)` —
    * the classic `Σ 1/(k+rank)` in fixed-point, bit-identical across
    * engines (SURVEY §6: no float accumulation order to diverge) and
    * monotone-equivalent for any plausible list length (10000 DIV
    * (60+rank) stays distinct per rank until rank ≈ 40, and ties break
    * deterministically by id anyway).
    *
    * Each branch is already top-k-sized (k rows, not corpus rows), so the
    * union is tiny by construction; the fuse is one keyed aggregate and a
    * `TakeOrderedAndProject` global top-k. Output:
    * (id, n_lists, rrf_q, rank) — deterministic (rrf_q desc, id asc).
    */
  def rrfFuse(branches: Seq[DataFrame], idCol: String, rrfK: Int = 60,
              topK: Int = 10): DataFrame = {
    require(branches.nonEmpty, "rrfFuse needs at least one ranked branch")
    require(rrfK >= 1 && topK >= 1, s"bad rrfK=$rrfK / topK=$topK")
    val u = branches
      .map(_.select(col(idCol), col("rank").cast("long").as("rank")))
      .reduce(_ unionByName _)
    val scored = u
      .withColumn("__contrib", expr(s"10000L div (${rrfK}L + rank)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lists"), sum(col("__contrib")).as("rrf_q"))
    val top = scored.orderBy(col("rrf_q").desc, col(idCol).asc).limit(topK)
    top.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("rrf_q").desc, col(idCol).asc)))
      .select(col(idCol), col("n_lists"), col("rrf_q"), col("rank"))
  }

  /** Pinned integer position discounts floor(10⁶ / log2(i+1)) for
    * nDCG@10 — literals on BOTH engines, so the discounted sum is a
    * pure BIGINT aggregate with no float log anywhere near the data.
    */
  private[graft] val NdcgDiscounts: Seq[Long] = Seq(
    1000000L, 630929L, 500000L, 430676L, 386852L,
    356207L, 333333L, 315464L, 301029L, 289064L)

  /** nDCG@k of the [[bm25TopK]] ranking against deterministic graded
    * relevance labels — the retrieval-quality readout every search /
    * RAG pipeline reports (Järvelin & Kekäläinen, TOIS 2002).
    *
    * Labels are a pure function of the corpus (no human judgments in
    * a library test): rel(doc) = min(3, Σ tf over the query terms),
    * gain = 2^rel − 1 ∈ {1, 3, 7}. Discounts are the PINNED integer
    * literals [[NdcgDiscounts]] (floor(10⁶/log2(i+1))), so DCG and
    * ideal-DCG are exact BIGINT sums — order-independent, no float
    * accumulation to diverge cross-engine — and
    * `ndcg_bp = (dcg·10⁴) div idcg`.
    *
    * Scale shape: ONE token explode feeds tf; the ranking reuses the
    * bm25 integer scoring; both top-k selections are
    * `TakeOrderedAndProject` (per-partition partial top-k, never a
    * single-task global sort); the final join is k rows against k
    * rows. Output: one row — (n_rel_docs, dcg_q, idcg_q, ndcg_bp).
    *
    * Degenerate contract (pinned by LexicalSpec and matched by the
    * q_ndcg oracle): when NO document contains any query term, the
    * output is the single row (0, NULL, NULL, NULL) — sums over the
    * empty relevance frame are NULL, and ndcg_bp inherits the NULL
    * rather than inventing a 0 score for an undefined ideal ranking.
    */
  def ndcgAtK(docs: DataFrame, idCol: String, textCol: String,
              queryTerms: Seq[String], k: Int): DataFrame = {
    require(k >= 1 && k <= NdcgDiscounts.length,
      s"k must be in [1, ${NdcgDiscounts.length}], got $k")
    val ranked = bm25TopK(docs, idCol, textCol, queryTerms, k)
    val rel = termFrequencies(docs, idCol, textCol)
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col(idCol))
      .agg(least(sum(col("tf")), lit(3L)).as("rel"))
      .withColumn("gain", expr("shiftleft(1L, CAST(rel AS INT)) - 1L"))
    val disc = (r: Column) =>
      element_at(typedlit(NdcgDiscounts), r.cast("int"))
    val dcg = ranked.join(rel, Seq(idCol), "left")
      .agg(sum(coalesce(col("gain"), lit(0L)) * disc(col("rank")))
        .as("dcg_q"))
    val idealW = org.apache.spark.sql.expressions.Window
      .orderBy(col("rel").desc, col(idCol).asc)
    val ideal = rel.orderBy(col("rel").desc, col(idCol).asc).limit(k)
      .withColumn("__pos", row_number().over(idealW))
      .agg(sum(col("gain") * disc(col("__pos"))).as("idcg_q"))
    val nRel = rel.agg(count(lit(1)).as("n_rel_docs"))
    nRel.crossJoin(broadcast(dcg)).crossJoin(broadcast(ideal))
      .select(col("n_rel_docs"), col("dcg_q"), col("idcg_q"),
        expr("dcg_q * 10000L div idcg_q").as("ndcg_bp"))
  }

  /** Vocabulary coverage / OOV audit — the tokenizer-and-corpus QA pass
    * (a vocabulary trained on last month's crawl applied to this month's:
    * how much of each document falls outside the top-`vocabSize` terms?).
    *
    * Vocabulary = the `vocabSize` most frequent terms (count desc, term
    * asc tiebreak — a total order, so the vocab set is deterministic
    * cross-engine). Output per doc: (id, n_tokens, n_oov, oov_bp) with
    * `oov_bp = (n_oov·10⁴) div n_tokens` — exact integers end to end.
    *
    * Shape: term totals from the (id, term)-distinct tf frame (hot terms
    * cost one long of state), global top-V via orderBy+limit
    * (`TakeOrderedAndProject` — per-partition partial top-k, never a
    * single-partition window), then tf ⨝ vocab LEFT join (vocab side is
    * V rows — broadcast) + one doc aggregate. Blank docs are absent from
    * the tf frame and so from the output (no 0/0 division row).
    */
  def vocabCoverage(docs: DataFrame, idCol: String, textCol: String,
                    vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, "vocabSize must be >= 1")
    val tf = termFrequencies(docs, idCol, textCol)
    val vocab = tf.groupBy(col("term")).agg(sum(col("tf")).as("__n"))
      .orderBy(col("__n").desc, col("term").asc).limit(vocabSize)
      .select(col("term"), lit(1).as("__in_vocab"))
    tf.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(when(col("__in_vocab").isNull, col("tf")).otherwise(0L)).as("n_oov"))
      .withColumn("oov_bp", expr("(n_oov * 10000) div n_tokens"))
  }

  /** Unigram cross-entropy quality proxy — the CCNet/RedPajama-style
    * "perplexity filter" in its engine-portable unigram form: score each
    * document by its mean token surprisal under the CORPUS unigram model
    * (gibberish and keyword-stuffed pages score high-surprisal or
    * degenerate-low; the published pipelines bucket the corpus by the
    * score and keep the sane middle).
    *
    * Cross-engine determinism (SURVEY §6): per-term surprisal is
    * quantized ONCE — `l(w) = floor(10⁴·ln((N+D)/(c(w)+1)) + 0.5)` over
    * exact integer N (total tokens), D (distinct terms, the add-one
    * normalizer), c(w) — and the doc score is the exact BIGINT sum
    * Σ tf·l(w) with `mean_q = total div n_tokens`; one ln per DISTINCT
    * term at the PSI family's ppm floor-risk.
    *
    * Shape: corpus counts from the tf frame (one term aggregate — hot
    * terms one long of state), two scalar totals off it, the scoring
    * join tf ⨝ counts shares the term partitioning, one doc aggregate.
    */
  /** Order-2 twin of [[unigramLogloss]]: mean BIGRAM-conditional
    * surprisal — `P(w₂|w₁)` smoothed add-one over the context's observed
    * successor set, `l(w₁,w₂) = floor(10⁴·ln((c(w₁·)+S(w₁))/(c(w₁w₂)+1))
    * + 0.5)` quantized once per DISTINCT bigram, doc score the exact
    * BIGINT Σ tf·l. Catches locally-incoherent text (plausible words in
    * implausible order) that unigram surprisal scores as normal — the
    * next rung toward the KenLM n-gram filters the published pipelines
    * run. Docs with fewer than two tokens carry no bigrams and are
    * absent.
    *
    * Shape: doc bigram tf from one keyed aggregate; corpus bigram counts
    * reduce FROM the tf frame (hot bigrams cost one long of state);
    * context totals from the bigram frame (vocabulary²-bounded); scoring
    * join shares the (w1, w2) partitioning; one doc aggregate.
    */
  def bigramLogloss(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      TextFunctions.tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= 2)
    val tf = toks.select(col(idCol),
      explode(transform(sequence(lit(0), size(col("__t")) - 2),
        i => struct(element_at(col("__t"), i.cast("int") + 1).as("w1"),
          element_at(col("__t"), i.cast("int") + 2).as("w2")))).as("__p"))
      .groupBy(col(idCol), col("__p.w1"), col("__p.w2"))
      .agg(count(lit(1)).as("tf"))
      // unify the isnotnull sets the two joins below would push into
      // their copies of this subtree, so AQE stage-reuse tokenizes once
      // (the kneserNeyLogloss plan-shaping note)
      .filter(col("w1").isNotNull && col("w2").isNotNull)
    val c12 = tf.groupBy(col("w1"), col("w2")).agg(sum(col("tf")).as("__c12"))
    val ctx = c12.groupBy(col("w1"))
      .agg(sum(col("__c12")).as("__c1"), count(lit(1)).as("__s1"))
    val l = c12.join(ctx, Seq("w1"))
      .withColumn("__l", floor(lit(10000.0) *
        log((col("__c1") + col("__s1")).cast("double") /
            (col("__c12") + 1L).cast("double")) + lit(0.5)).cast("long"))
    tf.join(l, Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_bigrams"),
        sum(col("tf") * col("__l")).as("surprisal2_q"))
      .withColumn("mean_surprisal2_q", expr("surprisal2_q div n_bigrams"))
  }

  /** Order-3 interpolated Kneser-Ney surprisal — the published
    * CCNet/KenLM-style perplexity filter the logloss pair approximates
    * (Kneser & Ney 1995; Chen & Goodman 1998 — public knowledge).
    * Absolute discounting with a fixed discount `D = discountBp/10⁴`
    * interpolating three orders, every count derived from the corpus
    * trigram table:
    *
    *   P(w₃|w₁w₂) = (max(c(w₁w₂w₃)−D,0) + D·N₁₊(w₁w₂·)·P(w₃|w₂)) / c(w₁w₂·)
    *   P(w₃|w₂)   = (max(N₁₊(·w₂w₃)−D,0) + D·N₁₊(w₂·)·P(w₃)) / N₁₊(·w₂·)
    *   P(w₃)      = N₁₊(·w₃) / N₁₊(··)          (continuation unigram)
    *
    * Catches scrambled-but-locally-plausible text: a document whose
    * bigrams are each common but whose trigram continuations are novel
    * scores high, where [[bigramLogloss]] reads it as normal (spec'd in
    * LexicalSpec).
    *
    * Cross-engine determinism (SURVEY §6): every count is an exact
    * BIGINT from plain grouped counts over the distinct-trigram frame
    * (continuation counts = counts of distinct rows — no
    * count_distinct); the probability chain is pinned doubles in ONE
    * written order (greatest/+/·/÷ are correctly-rounded IEEE ops both
    * engines replay bit-identically), quantized ONCE per DISTINCT
    * trigram — `l = floor(−10⁴·ln(P) + 0.5)` at the psi family's ppm
    * floor-risk (a single ln, like the unigram/bigram rungs); the doc
    * score is the exact BIGINT Σ tf·l with `mean = total div n`.
    *
    * Shape: doc trigram tf from one keyed aggregate; the corpus trigram
    * table reduces FROM tf (hot trigrams one long of state); all five
    * smoothing statistics are grouped counts over that table
    * (vocabulary-bounded); the scoring joins key on subsets of the
    * trigram key; one doc aggregate. The 1-row N₁₊(··) total rides a
    * broadcast scalar join.
    */
  def kneserNeyLogloss(docs: DataFrame, idCol: String, textCol: String,
                       discountBp: Int = 7500): DataFrame = {
    require(discountBp > 0 && discountBp < 10000,
      s"kneserNeyLogloss: discountBp must be in (0, 10000), got $discountBp")
    val d = discountBp / 10000.0
    val toks = docs.select(col(idCol),
      TextFunctions.tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= 3)
    val tf = toks.select(col(idCol),
      explode(transform(sequence(lit(0), size(col("__t")) - 3),
        i => struct(element_at(col("__t"), i.cast("int") + 1).as("w1"),
          element_at(col("__t"), i.cast("int") + 2).as("w2"),
          element_at(col("__t"), i.cast("int") + 3).as("w3")))).as("__g"))
      .groupBy(col(idCol), col("__g.w1"), col("__g.w2"), col("__g.w3"))
      .agg(count(lit(1)).as("tf"))
      // Plan-shaping, value-preserving filters (round 14): this frame
      // is referenced by EIGHT subtrees below, and AQE stage-reuse only
      // dedupes canonically IDENTICAL exchanges. Two optimizer rewrites
      // were fragmenting the copies: (a) each join pushes its own
      // isnotnull set into its copy — stated once here they unify; (b)
      // branches that need only the KEYS (the N₁₊ continuation counts)
      // get the count/sum AGGREGATE pruned from their copy, so the
      // `>= 1` filters (trivially true for counts) force every branch
      // to keep the aggregate expression. Before: 8 full
      // scan+tokenize+explode pipelines per run; after: tf/c3/cont23
      // each compute once behind ReusedExchange.
      .filter(col("w1").isNotNull && col("w2").isNotNull &&
        col("w3").isNotNull && col("tf") >= 1)
    val c3 = tf.groupBy(col("w1"), col("w2"), col("w3"))
      .agg(sum(col("tf")).as("__c3"))
      .filter(col("__c3") >= 1)
    // c(w₁w₂·) and N₁₊(w₁w₂·): total and distinct successors per context
    val c12 = c3.groupBy(col("w1"), col("w2"))
      .agg(sum(col("__c3")).as("__c12"), count(lit(1)).as("__n12dot"))
    // N₁₊(·w₂w₃): distinct predecessors — c3 is distinct per triple
    val cont23 = c3.groupBy(col("w2"), col("w3")).agg(count(lit(1)).as("__n23"))
      .filter(col("__n23") >= 1) // same reuse-shaping as tf/c3 above
    // N₁₊(·w₂·): distinct (w₁,w₃) around w₂;  N₁₊(w₂·): distinct w₃ after w₂
    val mid = c3.groupBy(col("w2")).agg(count(lit(1)).as("__nmid"))
    val w2dot = cont23.groupBy(col("w2")).agg(count(lit(1)).as("__nw2dot"))
    // continuation unigram: N₁₊(·w₃) per word, N₁₊(··) total
    val cont3 = cont23.groupBy(col("w3")).agg(count(lit(1)).as("__n3"))
    val nAll = cont23.agg(count(lit(1)).as("__nall"))
    val l = c3.join(c12, Seq("w1", "w2")).join(cont23, Seq("w2", "w3"))
      .join(mid, Seq("w2")).join(w2dot, Seq("w2")).join(cont3, Seq("w3"))
      .crossJoin(broadcast(nAll))
      .withColumn("__p1", col("__n3").cast("double") / col("__nall").cast("double"))
      .withColumn("__p2",
        (greatest(col("__n23").cast("double") - lit(d), lit(0.0))
          + lit(d) * col("__nw2dot").cast("double") * col("__p1"))
          / col("__nmid").cast("double"))
      .withColumn("__p3",
        (greatest(col("__c3").cast("double") - lit(d), lit(0.0))
          + lit(d) * col("__n12dot").cast("double") * col("__p2"))
          / col("__c12").cast("double"))
      .withColumn("__l",
        floor(lit(-10000.0) * log(col("__p3")) + lit(0.5)).cast("long"))
      .select(col("w1"), col("w2"), col("w3"), col("__l"))
    tf.join(l, Seq("w1", "w2", "w3"))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_trigrams"),
        sum(col("tf") * col("__l")).as("surprisal3_q"))
      .withColumn("mean_surprisal3_q", expr("surprisal3_q div n_trigrams"))
  }

  def unigramLogloss(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol)
    val counts = tf.groupBy(col("term")).agg(sum(col("tf")).as("__c"))
    // corpus totals ride a broadcast instead of a driver head(): the
    // old two-action form tokenized the corpus once per action (round
    // 14); an empty corpus now falls through lazily to an empty frame
    // (join over zero tf rows), same schema, no special case
    val tot = counts.agg(sum(col("__c")).as("__N"),
      count(lit(1)).as("__D"))
    val scored = tf.join(counts, Seq("term"))
      .crossJoin(broadcast(tot))
      .withColumn("__l", floor(lit(10000.0) *
        log((col("__N") + col("__D")).cast("double") /
          (col("__c") + 1L).cast("double")) +
        lit(0.5)).cast("long"))
    scored.groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * col("__l")).as("surprisal_q"))
      .withColumn("mean_surprisal_q", expr("surprisal_q div n_tokens"))
  }

  /** RAKE keyword extraction (Rose et al. 2010) over the corpus:
    * candidate phrases are maximal stopword-free token runs (capped at
    * `maxPhraseLen` — longer runs are degenerate in keyword terms and
    * dropped); a word's score is its co-occurrence degree over its
    * frequency, a phrase's score the sum of its words'. Returns the
    * corpus-level top-`k`: (phrase, n_words, n_occurrences, score_e4).
    *
    * Exactness: deg(w) = Σ_{phrase occurrences ∋ w} len(phrase) and
    * freq(w) are integers; score_e4(w) = deg·10⁴ DIV freq (floor), the
    * phrase score sums member scores — integer end to end, so the
    * oracle replays it verbatim. Deterministic top-k order:
    * (score desc, phrase asc).
    *
    * Shape: tokenize → per-doc island ids (one doc-keyed window) →
    * phrase rows; word stats are ONE grouped agg over phrase-word rows
    * (map-side combinable, state two longs per word); the phrase score
    * join is word-keyed with the word-stats side vocabulary-sized;
    * identical phrase texts merge in a final grouped count. Top-k via
    * rank over the (small) distinct-phrase frame.
    */
  def rakeKeywords(docs: DataFrame, idCol: String, textCol: String,
                   stopwords: Seq[String] = TextFunctions.Stopwords,
                   maxPhraseLen: Int = 4, k: Int = 20): DataFrame = {
    require(maxPhraseLen >= 1 && k >= 1)
    val toks = docs.filter(trim(col(textCol)) =!= "")
      .select(col(idCol).as("__id"),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("__p", "__w")))
    val stop = col("__w").isInCollection(stopwords)
    val w = Window.partitionBy(col("__id")).orderBy(col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val islands = toks
      .withColumn("__ph", sum(when(stop, 1L).otherwise(0L)).over(w))
      .filter(!stop)
    // drop over-long runs BEFORE any aggregation buffers them: a
    // pathological stopword-free document is ONE island — collect_list
    // over it would buffer the whole document; the run-length window
    // shares the (id, ph) exchange with the phrase aggregate, so the
    // guard costs no extra shuffle
    val runLen = Window.partitionBy(col("__id"), col("__ph"))
    val phrases = islands
      .withColumn("__len", count(lit(1)).over(runLen))
      .filter(col("__len") <= maxPhraseLen)
      .groupBy(col("__id"), col("__ph"))
      // explicit (position, word) sort — collect_list order is an
      // implementation accident of the preceding window sort, not a
      // contract
      .agg(sort_array(collect_list(struct(col("__p"), col("__w"))))
        .as("__sw"), first(col("__len")).as("__len"))
      .withColumn("phrase",
        array_join(col("__sw").getField("__w"), " "))
      .drop("__sw")
    // phrase-word rows re-derive from the phrase text (split on the
    // single space the join put there) so word stats see EXACTLY the
    // kept phrases
    val pw = phrases.select(col("phrase"), col("__len"),
      explode(split(col("phrase"), " ")).as("__w"))
    val wordStats = pw.groupBy(col("__w"))
      .agg(sum(col("__len")).as("__deg"), count(lit(1)).as("__freq"))
      .withColumn("__score",
        ((col("__deg") * 10000L - pmod(col("__deg") * 10000L, col("__freq"))) /
          col("__freq")).cast("long"))
    val phraseScores = pw.join(wordStats.select(col("__w"), col("__score")), Seq("__w"))
      .groupBy(col("phrase"))
      .agg(first(col("__len")).as("n_words"), sum(col("__score")).as("__ps"))
    // __ps summed PER OCCURRENCE row set of one phrase text: each
    // occurrence contributes its words once — normalize by occurrences
    val occ = phrases.groupBy(col("phrase")).agg(count(lit(1)).as("n_occurrences"))
    val scored = phraseScores.join(occ, Seq("phrase"))
      .withColumn("score_e4", {
        val d = col("n_occurrences")
        ((col("__ps") - pmod(col("__ps"), d)) / d).cast("long")
      })
    // global top-k via orderBy+limit => TakeOrderedAndProject (per-
    // partition heaps, never a single-partition rank window over the
    // full distinct-phrase frame); the rank window then runs on k rows
    val top = scored.orderBy(col("score_e4").desc, col("phrase")).limit(k)
    val rk = Window.partitionBy(lit(1))
      .orderBy(col("score_e4").desc, col("phrase"))
    top.withColumn("rank", row_number().over(rk).cast("long"))
      .select(col("phrase"), col("n_words"), col("n_occurrences"),
        col("score_e4"), col("rank"))
  }
}
