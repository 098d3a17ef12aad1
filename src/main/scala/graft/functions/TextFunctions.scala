package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for training-data pipelines.
  *
  * All pure `org.apache.spark.sql.functions` compositions (incl. SQL
  * higher-order functions) — fully codegen'd, no UDFs, so they stay inside
  * WholeStageCodegen at 100 TB.
  */
object TextFunctions {

  /** Whitespace tokenization; empty string → empty array.
    *
    * The split class is PINNED to `[ \t\n\r\f]` rather than `\s`:
    * Java regex `\s` includes vertical tab (\x0B), RE2 — which the
    * DuckDB oracles use — does not, so a `\s+` here would tokenize a
    * \x0B-bearing document differently in the two engines and break
    * every token-derived oracle downstream. The explicit class means
    * the same characters split in both.
    */
  val WhitespaceClass = "[ \t\n\r\f]"

  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), WhitespaceClass + "+"))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Canonical form for normalization-insensitive dedup: lowercase,
    * strip non-alphanumerics, collapse whitespace. Catches duplicates
    * that differ only in casing/punctuation/spacing — the first rung of
    * an LLM-corpus dedup ladder, before MinHash handles real edits.
    */
  def normalizeForDedup(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** BPE-style subword-ish segmentation: letter runs, digit runs, and
    * individual punctuation each count as one token — the pre-tokenizer
    * split most BPE vocabularies apply before merges, which makes this a
    * deterministic, regex-only LLM token-count estimate.
    */
  // \s pinned to the explicit class for the same cross-engine reason
  // as [[tokens]] (\x0B is "not whitespace" in RE2): without it a
  // vertical tab counts as punctuation in DuckDB but not in Spark
  val BpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r\\f]"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenPattern), lit(0)))

  /** Count of tokens found in `vocab` (stopword hits, language markers). */
  def vocabHits(text: Column, vocab: Seq[String]): Column =
    vocabHitsT(tokens(text), vocab)

  /** Tokens-column variant: callers that need several vocab counts (the
    * quality + language annotate pass) tokenize ONCE and reuse — each
    * `tokens()` call is a regex split of the whole document, and the
    * naive compose re-splits per metric.
    */
  def vocabHitsT(toks: Column, vocab: Seq[String]): Column = {
    val set = array(vocab.map(lit): _*)
    size(filter(toks, t => array_contains(set, t)))
  }

  /** 4-dp stopword ratio as floor(hits·10⁴/tokens + 0.5)/10⁴ — the same
    * arithmetic DuckDB's oracle runs. round(double, 4) is NOT used here:
    * Spark rounds the shortest decimal string while DuckDB rounds the
    * binary value, and ratios like 1/800 land exactly on the half
    * boundary where they disagree.
    */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    floor(vocabHits(text, stopwords).cast("double") * 10000.0 /
      greatest(tokenCount(text), lit(1)).cast("double") + 0.5) / 10000.0

  /** Default English-ish stopword list used by quality scoring. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "in", "to", "is")

  /** Composite quality score in basis points [0,10000]: rewards
    * reasonable length and natural stopword density. Integer-exact by
    * construction — the fractional form of this score lands on
    * round-half boundaries (its components step in 1/400ths), where
    * Spark's BigDecimal-of-shortest-string rounding and DuckDB's
    * binary-double rounding disagree; basis points sidestep rounding
    * entirely (floor of an exact integer-valued double division is
    * bit-identical cross-engine).
    */
  def qualityScore(text: Column): Column = qualityScoreT(tokens(text), text)

  /** Tokens-column variant of [[qualityScore]] — same arithmetic, shared
    * tokenization.
    */
  def qualityScoreT(toks: Column, text: Column): Column = {
    val nTok = size(toks)
    val hits = vocabHitsT(toks, Stopwords)
    val lenBp = least(nTok, lit(200)) * 25
    val stopBp = least(floor(hits.cast("double") * 15000.0 /
      greatest(nTok, lit(1)).cast("double")), lit(3000.0))
    val charBp = when(length(text).between(100, 2000), lit(2000)).otherwise(lit(0))
    (lenBp.cast("double") + stopBp + charBp.cast("double")).cast("int").as("quality")
  }

  /** Context-window chunking: fixed-size token windows with overlap —
    * the packing step that turns documents into training sequences.
    * Chunk i covers tokens [i·(size−overlap), i·(size−overlap)+size);
    * documents shorter than `size` yield one chunk.
    */
  def chunkTokens(text: Column, size: Int, overlap: Int): Column = {
    require(size > overlap && overlap >= 0)
    val step = size - overlap
    val toks = tokens(text)
    val n = org.apache.spark.sql.functions.size(toks)
    val nc = when(n <= size, lit(1))
      .otherwise(ceil((n - size).cast("double") / step) + 1).cast("int")
    transform(sequence(lit(0), nc - 1),
      i => array_join(slice(toks, i * step + 1, lit(size)), " "))
  }

  /** PII redaction patterns (email, IPv4, simple phone shapes) — kept to
    * the regex subset valid in BOTH Java regex and RE2 so the DuckDB
    * oracle can run the identical patterns. The published corpus-hygiene
    * recipe (C4/RefinedWeb-style scrubbing) is regex substitution: it
    * stays codegen'd `regexp_replace`, no UDF.
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
    "\\b\\d{3}[- ]\\d{3,4}[- ]\\d{4}\\b" -> "<PHONE>")

  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** Top-bigram fraction in basis points: the share of a document's
    * bigrams taken by its single most frequent bigram — the repetition
    * signal from the published Gopher/RefinedWeb quality rules (high =
    * boilerplate/looping text). Computed per-array with higher-order
    * functions (no explode, no shuffle): sort the bigrams, then one
    * `aggregate` fold finds the longest equal run — O(n log n) per row
    * (NOT the naive O(distinct·n) count-per-distinct), so long documents
    * stay cheap. Documents with <2 tokens yield NULL.
    */
  def topBigramFractionBp(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks)
    val bigrams = transform(sequence(lit(0), n - 2),
      i => concat(element_at(toks, i + 1), lit(" "), element_at(toks, i + 2)))
    val maxRun = aggregate(array_sort(bigrams),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(run, acc.getField("best")).as("best"))
      },
      acc => acc.getField("best"))
    when(n < 2, lit(null).cast("long")).otherwise(
      floor(maxRun.cast("double") * 10000.0 / (n - 1).cast("double") + 0.5)
        .cast("long"))
  }

  /** Duplicate word-n-gram statistics — the Gopher/RefinedWeb "fraction
    * of (characters in) duplicated n-grams" repetition rule, shipped as
    * EXACT INTEGERS so the thresholding caller (and the DuckDB oracle)
    * never touches a cross-engine float: for a document's word n-grams,
    *   n_grams    = total n-gram occurrences,
    *   dup_occ    = occurrences whose gram appears ≥2 times (Σ_{c>1} c),
    *   dup_chars  = characters across those occurrences (Σ_{c>1} c·len(g)).
    *
    * Same per-row shape as [[topBigramFractionBp]]: sort the gram array,
    * then ONE `aggregate` run-length fold — O(n log n) per row, zero
    * explode/shuffle (exploding grams would shuffle n× the corpus), and
    * the array expression is evaluated once inside the fold (no HOF
    * re-evaluation blow-up). Documents with < n tokens yield NULL.
    */
  def dupNgramStats(text: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    val toks = tokens(text)
    val cnt = size(toks)
    val grams = transform(sequence(lit(0), cnt - n),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))
    // run-length fold over the sorted grams: a finished run of length r>1
    // contributes r duplicate occurrences and r·len(gram) duplicate chars;
    // the finish lambda flushes the final run.
    val folded = aggregate(array_sort(grams),
      struct(lit("").as("prev"), lit(0L).as("run"),
        lit(0L).as("occ"), lit(0L).as("chars")),
      (acc, x) => {
        val same = x === acc.getField("prev")
        val run = when(same, acc.getField("run") + 1).otherwise(lit(1L))
        val occ = when(!same && acc.getField("run") > 1,
          acc.getField("occ") + acc.getField("run")).otherwise(acc.getField("occ"))
        val chars = when(!same && acc.getField("run") > 1,
          acc.getField("chars") + acc.getField("run") * length(acc.getField("prev")))
          .otherwise(acc.getField("chars"))
        struct(x.as("prev"), run.as("run"), occ.as("occ"), chars.as("chars"))
      },
      acc => struct(
        when(acc.getField("run") > 1, acc.getField("occ") + acc.getField("run"))
          .otherwise(acc.getField("occ")).as("dup_occ"),
        when(acc.getField("run") > 1,
          acc.getField("chars") + acc.getField("run") * length(acc.getField("prev")))
          .otherwise(acc.getField("chars")).as("dup_chars")))
    when(cnt < n, lit(null))
      .otherwise(struct((cnt - n + 1).cast("long").as("n_grams"),
        folded.getField("dup_occ").as("dup_occ"),
        folded.getField("dup_chars").as("dup_chars")))
  }

  /** Published-rules document filter (the Gopher paper's heuristics, C4's
    * symbol rule) as per-rule flags + an overall keep bit — the filter
    * report a corpus-curation pass materializes before deciding drop
    * thresholds. Every rule is an EXACT INTEGER comparison (ratios are
    * cross-multiplied, never divided), so the oracle replays each flag
    * bit-for-bit:
    *   f_words:    50 ≤ words ≤ 100000
    *   f_mean_len: 3 ≤ mean word length ≤ 10   (3n ≤ chars ≤ 10n)
    *   f_alpha:    ≥80% of words contain an ASCII letter (10a ≥ 8n)
    *   f_stop:     ≥2 stopword hits
    *   f_sym:      '#'/'…'-style symbol chars ≤10% of chars (10s ≤ c)
    * One narrow pass per row, zero shuffle.
    */
  def gopherFlags(text: Column): Column = {
    val toks = tokens(text)
    val nW = size(toks).cast("long")
    val wChars = coalesce(aggregate(transform(toks, t => length(t).cast("long")),
      lit(0L), (a, x) => a + x), lit(0L))
    val alphaW = size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long")
    val stopHits = vocabHitsT(toks, Stopwords).cast("long")
    val nChars = length(text).cast("long")
    // occurrence counts via the replace trick (len delta), exact in both
    // engines; '...' deltas are always multiples of 3 (non-overlapping
    // greedy replace), so the division result is an exact small integer.
    val hashHits = nChars - length(replace(text, lit("#"), lit(""))).cast("long")
    val dotHits = ((nChars - length(replace(text, lit("..."), lit(""))).cast("long"))
      / lit(3)).cast("long")
    val symHits = (hashHits + dotHits).as("sym_hits")
    val fWords = (nW >= 50 && nW <= 100000).cast("int")
    val fMean = (wChars >= nW * 3 && wChars <= nW * 10).cast("int")
    val fAlpha = (alphaW * 10 >= nW * 8).cast("int")
    val fStop = (stopHits >= 2).cast("int")
    val fSym = (symHits * 10 <= nChars).cast("int")
    struct(nW.as("n_words"), wChars.as("word_chars"), alphaW.as("alpha_words"),
      stopHits.as("stop_hits"), symHits.cast("long").as("sym_hits"),
      fWords.as("f_words"), fMean.as("f_mean_len"), fAlpha.as("f_alpha"),
      fStop.as("f_stop"), fSym.as("f_sym"),
      (fWords === 1 && fMean === 1 && fAlpha === 1 && fStop === 1 && fSym === 1)
        .cast("int").as("keep"))
  }

  /** Language-marker sets for the n-gram/stopword-overlap language-ID
    * heuristic.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "is"),
    "es" -> Seq("el", "la", "los", "de", "y"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"))

  /** Predicted language = marker set with the most hits; ties break in
    * `LangMarkers` declaration order; zero hits everywhere → "unknown".
    */
  def langId(text: Column): Column = langIdT(tokens(text))

  /** Tokens-column variant of [[langId]] — shared tokenization. */
  def langIdT(toks: Column): Column = {
    val hits = LangMarkers.map { case (lang, markers) => lang -> vocabHitsT(toks, markers) }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    hits.foldLeft[Option[Column]](None) { case (acc, (lang, h)) =>
      Some(acc match {
        case None => when(h === best && best > 0, lit(lang))
        case Some(c) => c.when(h === best && best > 0, lit(lang))
      })
    }.get.otherwise(lit("unknown"))
  }
}
