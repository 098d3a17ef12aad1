package graft

/** DuckDB oracle SQL for the SURVEY §2C LLM-training-data queries.
  *
  * Mechanically split out of SparkEntry.oracleSql (round 11) so the
  * registry file stays navigable — same entries, same gate, zero
  * behavior change. Every key here pairs with a SparkEntry.queries
  * registration; the driver compares both on rows+schema+hash.
  */
private[graft] object OracleTextSql {

  /** Shared WordPiece training replay (q_wordpiece_train/encode/
    * fertility): word table → ##-prefixed symbol states → 30 merge
    * rounds in one recursive CTE. Each round derives weighted PAIR
    * counts (window over (l, r2)) and SYMBOL counts (window over l;
    * the right symbol's count fetched as lead(nl) within the word —
    * position i+1's own symbol IS the pair's right side), then picks
    * the argmax of p/(n_l·n_r) as a min over the struct key
    * (−floor(p·2^100/(n_l·n_r)), l, r) — the floor key provably equals
    * the trainer's exact BigInt cross-multiplication order whenever
    * every symbol count ≤ 2^25−1 (distinct rationals with denominators
    * ≤ C² differ by ≥ C⁻⁴ > 2⁻¹⁰⁰), which bound_gate CHECKS against
    * the corpus (total weighted chars bounds any symbol count) instead
    * of assuming. Merge application is the BPE oracle's TAB/NL-wrapped
    * replace (left-to-right non-overlapping == the trainer's greedy
    * fold); the merged symbol strips the right side's ## prefix.
    * Ends after the recursive CTE (no trailing comma).
    */
  private val wpReplaySql: String =
    """wc AS (
      |  SELECT word, count(*) AS cnt FROM (
      |    SELECT unnest(str_split_regex(trim(text), '[ \t\n\r\f]+')) AS word
      |    FROM documents WHERE text IS NOT NULL AND trim(text) <> '')
      |  GROUP BY word HAVING length(word) <= 200),
      |bound_gate AS (
      |  SELECT count(*) AS bad FROM (
      |    SELECT sum(cnt * length(word)) AS c FROM wc) t
      |  WHERE t.c > 33554431),
      |st(r, word, s, cnt, ml, mr, mn, mnl, mnr) AS (
      |  SELECT 0, word,
      |    chr(9) || substr(word, 1, 1) || chr(10) ||
      |    CASE WHEN length(word) > 1 THEN
      |      chr(9) || '##' || array_to_string(
      |        list_transform(range(2, length(word) + 1), i -> substr(word, i, 1)),
      |        chr(10) || chr(9) || '##') || chr(10)
      |    ELSE '' END,
      |    cnt, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
      |    CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
      |  FROM wc
      |  UNION ALL
      |  SELECT r + 1, word,
      |    replace(s, chr(9) || bl || chr(10) || chr(9) || br || chr(10),
      |               chr(9) || bl || substr(br, 3) || chr(10)),
      |    cnt, bl, br, bp, bnl, bnr
      |  FROM (
      |    SELECT r, word, s, cnt,
      |      bw['l'] AS bl, bw['r'] AS br, CAST(bw['p'] AS BIGINT) AS bp,
      |      CAST(bw['nl'] AS BIGINT) AS bnl, CAST(bw['nr'] AS BIGINT) AS bnr
      |    FROM (
      |      SELECT r, word, s, cnt,
      |        min(CASE WHEN r2 IS NOT NULL AND p >= 2 THEN
      |          {'k': -((CAST(p AS HUGEINT) * 1267650600228229401496703205376)
      |                  // (CAST(nl AS HUGEINT) * CAST(nr AS HUGEINT))),
      |           'l': l, 'r': r2, 'p': p, 'nl': nl, 'nr': nr} END)
      |          OVER () AS bw
      |      FROM (
      |        SELECT word, r, s, cnt, i, l, r2, nl,
      |          lead(nl) OVER (PARTITION BY word ORDER BY i) AS nr,
      |          sum(CASE WHEN r2 IS NOT NULL THEN cnt END)
      |            OVER (PARTITION BY l, r2) AS p
      |        FROM (
      |          SELECT word, r, s, cnt, i, l, r2,
      |            sum(cnt) OVER (PARTITION BY l) AS nl
      |          FROM (
      |            SELECT word, r, s, cnt, i,
      |              syms[CAST(i AS INTEGER)] AS l,
      |              CASE WHEN i < len THEN syms[CAST(i AS INTEGER) + 1] END AS r2
      |            FROM (
      |              SELECT word, r, s, cnt, syms, len(syms) AS len,
      |                unnest(range(1, len(syms) + 1)) AS i
      |              FROM (
      |                SELECT word, r, s, cnt,
      |                  list_transform(
      |                    str_split(rtrim(s, chr(10)), chr(10)),
      |                    x -> ltrim(x, chr(9))) AS syms
      |                FROM st WHERE r < 30)))))
      |    ) QUALIFY row_number() OVER (PARTITION BY word) = 1
      |  ) WHERE bp IS NOT NULL
      |)""".stripMargin

  /** Vocabulary (alphabet + merge outputs) and the maximal-munch walk
    * as a second recursive CTE over the SAME word table: per word, the
    * longest vocab match at each position advances the cursor; no
    * match → the whole word terminates as one UNK token. Ends after
    * `wtok` (word, n_toks, is_unk) — no trailing comma.
    */
  private val wpEncodeSql: String =
    """alpha AS (
      |  SELECT DISTINCT substr(word, 1, 1) AS tok FROM wc
      |  UNION
      |  SELECT DISTINCT '##' || substr(word, CAST(i AS INTEGER), 1) AS tok
      |  FROM wc, LATERAL unnest(range(2, length(word) + 1)) AS t(i)),
      |vocab AS (
      |  SELECT tok FROM alpha
      |  UNION
      |  SELECT DISTINCT ml || substr(mr, 3) AS tok FROM st WHERE r >= 1),
      |vset AS (SELECT list(tok) AS toks,
      |                max(length(tok)) AS maxl FROM vocab),
      |ge(word, pos, ntok, ok) AS (
      |  SELECT word, 1, CAST(0 AS BIGINT), true FROM wc
      |  UNION ALL
      |  SELECT word,
      |    CASE WHEN m IS NULL THEN length(word) + 1 ELSE pos + m END,
      |    CASE WHEN m IS NULL THEN CAST(1 AS BIGINT) ELSE ntok + 1 END,
      |    m IS NOT NULL AND ok
      |  FROM (
      |    SELECT word, pos, ntok, ok,
      |      list_max([CAST(L AS INTEGER)
      |        FOR L IN range(1, least(CAST(vset.maxl AS BIGINT),
      |                         CAST(length(word) - pos + 1 AS BIGINT)) + 1)
      |        IF list_contains(vset.toks,
      |             CASE WHEN pos = 1 THEN substr(word, pos, CAST(L AS INTEGER))
      |                  ELSE '##' || substr(word, pos, CAST(L AS INTEGER)) END)]) AS m
      |    FROM ge, vset WHERE pos <= length(word))),
      |wtok AS (
      |  SELECT word, ntok AS n_toks, NOT ok AS is_unk FROM ge
      |  WHERE pos = length(word) + 1)""".stripMargin

  /** Quantized squared distance — the floor(2¹⁶·Σ(aᵢ−bᵢ)²) BIGINT the
    * whole ANN tier shares; summation order = list order, matching the
    * Spark `aggregate(zip_with(...))` fold exactly.
    */
  private def kmQd(a: String, b: String): String =
    s"""CAST(floor(65536.0 * list_aggregate(list_apply(list_zip($a, $b),
       |    x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
       |       * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))), 'sum')) AS BIGINT)""".stripMargin

  /** One k-means|| sampling round (q_kmeanspar_seed): min quantized d²
    * against the previous candidate frame, the corpus potential φ, the
    * exact integer selection inequality, and the candidate union.
    */
  private def kmeansParRound(r: Int): String =
    s"""qd$r AS (
       |  SELECT b.vec_id, b.h, min(${kmQd("b.embedding", "c.embedding")}) AS qd
       |  FROM base b CROSS JOIN cand${r - 1} c GROUP BY b.vec_id, b.h),
       |phi$r AS (SELECT sum(qd) AS phi FROM qd$r),
       |sel$r AS (
       |  SELECT q.vec_id FROM qd$r q, phi$r
       |  WHERE q.qd > 0
       |    AND CAST(q.h AS HUGEINT) * phi$r.phi < 16 * CAST(q.qd AS HUGEINT) * 1048576),
       |cand$r AS (
       |  SELECT * FROM cand${r - 1}
       |  UNION
       |  SELECT b.vec_id, b.embedding FROM base b JOIN sel$r USING (vec_id))""".stripMargin

  /** One NN-descent round (q_nn_descent): deterministic reverse top-k,
    * symmetrized neighborhood, the B∘B hop join, round-4 cosine, and
    * the per-node top-k (both the edge set `ee` and the scored form
    * `sce` for the final round's output).
    */
  /** The full 3-round NN-descent graph replay (n, ring init, rounds
    * 1..3 ending at `sce3`) — shared verbatim by q_nn_descent and
    * q_graph_search so the two oracles cannot drift. No trailing comma.
    */
  private def nnDescentGraphSql: String =
    s"""n AS (SELECT count(*) AS cnt FROM embeddings WHERE embedding IS NOT NULL),
      |ee0 AS (
      |  SELECT DISTINCT s.vec_id AS v,
      |    (s.vec_id * 1048573 + t.j * 40503) % 999983 % n.cnt AS w
      |  FROM embeddings s, n, LATERAL unnest(range(1, 6)) AS t(j)
      |  WHERE s.embedding IS NOT NULL
      |    AND s.vec_id <> (s.vec_id * 1048573 + t.j * 40503) % 999983 % n.cnt
      |    AND EXISTS (SELECT 1 FROM embeddings e2
      |      WHERE e2.vec_id = (s.vec_id * 1048573 + t.j * 40503) % 999983 % n.cnt
      |        AND e2.embedding IS NOT NULL)),
      |${nnDescentRound(1)},
      |${nnDescentRound(2)},
      |${nnDescentRound(3)}""".stripMargin

  /** q_graph_search's oracle: the shared graph replay, then the beam
    * search unrolled — symmetrized edges, 4 smallest-(portable hash,
    * id) entries, per round candidates = beam ∪ neighbors(beam),
    * round-4 cosine scores excluding the query node, beams = top-4 by
    * (cos DESC, id); output = top-3 of the final round's scored pool
    * (== top-3 of the final beam, k <= beamWidth).
    */
  /** The GNNS beam-search CTE chain (symmetrized `g`, hash-order
    * entries, qq, gsb0, `rounds` expand/score/beam rounds at width
    * `beamWidth`) — shared by q_graph_search and q_ann_frontier's gnns
    * arm so the two replays cannot drift. Assumes [[nnDescentGraphSql]]
    * (ending at `sce3`) precedes it in the WITH list. No trailing comma.
    */
  private def gnnsSearchCtes(beamWidth: Int, rounds: Int): String = {
    val qcos = """round(
      |      list_aggregate(list_apply(list_zip(q.qe, ev.embedding),
      |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
      |      / (sqrt(list_aggregate(list_apply(q.qe,
      |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
      |       * sqrt(list_aggregate(list_apply(ev.embedding,
      |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))), 4)"""
      .stripMargin
    def searchRound(r: Int): String =
      s"""gcand$r AS (
        |  SELECT query_id, node FROM gsb${r - 1}
        |  UNION
        |  SELECT s.query_id, g.w AS node FROM gsb${r - 1} s JOIN g ON g.v = s.node),
        |gsc$r AS (
        |  SELECT c.query_id, c.node,
        |    $qcos AS cos
        |  FROM gcand$r c
        |  JOIN embeddings ev ON ev.vec_id = c.node AND ev.embedding IS NOT NULL
        |  JOIN qq q ON q.query_id = c.query_id
        |  WHERE c.node <> c.query_id),
        |gsb$r AS (
        |  SELECT query_id, node FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, node) AS rn
        |    FROM gsc$r) WHERE rn <= $beamWidth)"""
    s"""g AS MATERIALIZED (SELECT v, w FROM sce3 UNION SELECT w, v FROM sce3),
      |entry AS (
      |  SELECT vec_id AS node FROM embeddings
      |  WHERE embedding IS NOT NULL
      |  ORDER BY vec_id % 1048573 * 2654435761 % 1048576, vec_id LIMIT 4),
      |qq AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
      |       WHERE vec_id < 10 AND embedding IS NOT NULL),
      |gsb0 AS (SELECT q.query_id, e.node FROM qq q CROSS JOIN entry e),
      |${(1 to rounds).map(searchRound).mkString(",\n")}""".stripMargin
  }

  private def graphSearchOracle: String =
    s"""WITH $nnDescentGraphSql,
      |${gnnsSearchCtes(beamWidth = 4, rounds = 3)}
      |SELECT query_id, node AS neighbor_id, cos AS cos_sim FROM (
      |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, node) AS rn
      |  FROM gsc3) WHERE rn <= 3
      |ORDER BY query_id, neighbor_id""".stripMargin

  private def nnDescentRound(r: Int): String = {
    val cos = """round(
      |    list_aggregate(list_apply(list_zip(va.embedding, vb.embedding),
      |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
      |    / (sqrt(list_aggregate(list_apply(va.embedding,
      |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
      |     * sqrt(list_aggregate(list_apply(vb.embedding,
      |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))), 4)""".stripMargin
    s"""rev$r AS (
       |  SELECT w AS v, v AS w FROM (
       |    SELECT v, w, row_number() OVER (PARTITION BY w ORDER BY v) AS rn
       |    FROM ee${r - 1}) WHERE rn <= 5),
       |b$r AS (SELECT v, w FROM ee${r - 1} UNION SELECT v, w FROM rev$r),
       |hop$r AS (
       |  SELECT DISTINCT x.v, y.w FROM b$r x JOIN b$r y ON x.w = y.v
       |  WHERE x.v <> y.w),
       |cand$r AS (SELECT v, w FROM b$r UNION SELECT v, w FROM hop$r),
       |sc$r AS (
       |  SELECT c.v, c.w, $cos AS cos
       |  FROM cand$r c JOIN embeddings va ON va.vec_id = c.v
       |  JOIN embeddings vb ON vb.vec_id = c.w),
       |ee$r AS (
       |  SELECT v, w FROM (
       |    SELECT v, w, row_number() OVER (PARTITION BY v ORDER BY cos DESC, w) AS rn
       |    FROM sc$r) WHERE rn <= 5),
       |sce$r AS (
       |  SELECT v, w, cos FROM (
       |    SELECT v, w, cos, row_number() OVER (PARTITION BY v ORDER BY cos DESC, w) AS rn
       |    FROM sc$r) WHERE rn <= 5)""".stripMargin
  }

  def sql: Map[String, String] = Map(

    "q_stratified_sample" ->
      """WITH h AS (SELECT doc_id, source,
        |  doc_id % 1048573 * 2654435761 % 1000000 AS hh FROM documents),
        |r AS (SELECT source, doc_id,
        |  ROW_NUMBER() OVER (PARTITION BY source ORDER BY hh, doc_id)
        |    AS rank_in_group
        |  FROM h)
        |SELECT source, doc_id, rank_in_group FROM r
        |WHERE rank_in_group <= 10
        |ORDER BY source, rank_in_group""".stripMargin,

    "q_dedup_exact_docs" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM documents
        |GROUP BY text
        |ORDER BY doc_id""".stripMargin,

    "q_chunk_docs" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |           FROM documents),
        |c AS (SELECT doc_id,
        |  unnest(list_transform(
        |    range(CAST(CASE WHEN len(toks) <= 64 THEN 1
        |      ELSE ceil((len(toks) - 64) / 48.0) + 1 END AS BIGINT)),
        |    i -> array_to_string(list_slice(toks, i * 48 + 1, i * 48 + 64), ' '))) AS chunk
        |  FROM t)
        |SELECT doc_id, chunk,
        |  CAST(CASE WHEN len(trim(chunk)) = 0 THEN 0
        |    ELSE len(string_split_regex(trim(chunk), '\s+')) END AS INTEGER) AS n_chunk_tokens
        |FROM c
        |ORDER BY doc_id, chunk""".stripMargin,

    "q_dedup_normalized" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM documents
        |GROUP BY trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |  ' +', ' ', 'g'))
        |ORDER BY doc_id""".stripMargin,

    "q_corpus_clean" ->
      // the COMPOSED cleaning pipeline replayed end to end: quality +
      // langid signals (integer-exact, same derivations as
      // q_text_quality/q_lang_id), the >=3000 quality floor, normalized
      // exact dedup (min doc_id per canonical form), then near-dup
      // cluster canonicals. The cluster stage replays as the
      // EXACT-Jaccard pair set + recursive-CTE components (canonical =
      // min id): equality with the Spark side's LSH-verified pairs
      // holds because this corpus has NO pair with Jaccard in
      // (0.30, 0.80) - measured at all three SFs - so every qualifying
      // pair is >= 0.80 where 16x4 banding recall is >= 1 - 2.3e-4 per
      // pair, and the hash gate itself verifies no pair was missed.
      // Threshold compare is the integer form of round(j,4) >= 0.8
      // (100000*inter >= 79995*union).
      """WITH RECURSIVE base AS (
        |  SELECT doc_id, text,
        |    CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(text), '\s+') END AS tk
        |  FROM documents),
        |sig AS (
        |  SELECT doc_id, text, tk,
        |    CAST(least(len(tk), 200) * 25
        |      + least(floor(CAST(len(list_filter(tk,
        |          x -> x IN ('the','a','of','and','in','to','is'))) AS DOUBLE)
        |          * 15000.0 / greatest(CAST(len(tk) AS DOUBLE), 1.0)), 3000.0)
        |      + (CASE WHEN len(text) BETWEEN 100 AND 2000 THEN 2000 ELSE 0 END)
        |      AS INTEGER) AS quality_bp,
        |    CASE WHEN greatest(
        |           len(list_filter(tk, x -> x IN ('the','a','and','of','is'))),
        |           len(list_filter(tk, x -> x IN ('el','la','los','de','y'))),
        |           len(list_filter(tk, x -> x IN ('der','die','das','und','ist'))),
        |           len(list_filter(tk, x -> x IN ('le','la','les','et','est')))) = 0
        |         THEN 'unknown'
        |         WHEN len(list_filter(tk, x -> x IN ('the','a','and','of','is'))) = greatest(
        |           len(list_filter(tk, x -> x IN ('the','a','and','of','is'))),
        |           len(list_filter(tk, x -> x IN ('el','la','los','de','y'))),
        |           len(list_filter(tk, x -> x IN ('der','die','das','und','ist'))),
        |           len(list_filter(tk, x -> x IN ('le','la','les','et','est')))) THEN 'en'
        |         WHEN len(list_filter(tk, x -> x IN ('el','la','los','de','y'))) = greatest(
        |           len(list_filter(tk, x -> x IN ('the','a','and','of','is'))),
        |           len(list_filter(tk, x -> x IN ('el','la','los','de','y'))),
        |           len(list_filter(tk, x -> x IN ('der','die','das','und','ist'))),
        |           len(list_filter(tk, x -> x IN ('le','la','les','et','est')))) THEN 'es'
        |         WHEN len(list_filter(tk, x -> x IN ('der','die','das','und','ist'))) = greatest(
        |           len(list_filter(tk, x -> x IN ('the','a','and','of','is'))),
        |           len(list_filter(tk, x -> x IN ('el','la','los','de','y'))),
        |           len(list_filter(tk, x -> x IN ('der','die','das','und','ist'))),
        |           len(list_filter(tk, x -> x IN ('le','la','les','et','est')))) THEN 'de'
        |         ELSE 'fr' END AS pred_lang
        |  FROM base),
        |keep1 AS (SELECT * FROM sig WHERE quality_bp >= 3000),
        |surv AS (
        |  SELECT doc_id, quality_bp, pred_lang, tk
        |  FROM keep1
        |  QUALIFY row_number() OVER (
        |    PARTITION BY trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))
        |    ORDER BY doc_id) = 1),
        |sets AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
        |      ELSE list_transform(range(1, greatest(len(tk) - 2, 1) + 1),
        |        i -> array_to_string(tk[i:i+2], ' ')) END) AS s
        |  FROM surv),
        |sh AS (SELECT doc_id, unnest(s) AS g FROM sets),
        |sz AS (SELECT doc_id, len(s) AS n FROM sets),
        |edges0 AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |edges1 AS (
        |  SELECT id_a, id_b
        |  FROM edges0
        |  JOIN sz sa ON sa.doc_id = id_a
        |  JOIN sz sb ON sb.doc_id = id_b
        |  WHERE 100000 * inter >= 79995 * (sa.n + sb.n - inter)),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM edges1
        |  UNION SELECT id_b, id_a FROM edges1),
        |reach AS (
        |  SELECT a AS id, b AS r FROM edges
        |  UNION
        |  SELECT re.id, e.b AS r FROM reach re JOIN edges e ON re.r = e.a
        |),
        |canon AS (
        |  SELECT s.doc_id
        |  FROM surv s LEFT JOIN reach r ON r.id = s.doc_id
        |  GROUP BY s.doc_id
        |  HAVING s.doc_id <= coalesce(min(r.r), s.doc_id))
        |SELECT s.doc_id, s.quality_bp, s.pred_lang
        |FROM surv s JOIN canon USING (doc_id)
        |ORDER BY s.doc_id""".stripMargin,

    "q_contrastive_pairs" ->
      // full triplet replay: positives = exact-Jaccard pair set in the
      // (round(j,4) >= 0.5, round(j,4) <= 0.99) band (integer compares;
      // equality with the LSH pipeline per the q_corpus_clean corpus
      // argument - no pair lives in (0.30, 0.80)); negatives = the
      // injected PORTABLE hash ((id % 1000003)*2654435761 + salt*40503
      // mod 1e9+7), bucket representative = min (secondary hash, id);
      // exclusion = anti-join against the FULL >= 0.5 pair set, both
      // orientations. jaccard_bp = exact-rational HALF_UP basis points.
      """WITH base AS (
        |  SELECT doc_id,
        |    CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(text), '\s+') END AS tk
        |  FROM documents),
        |sets AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
        |      ELSE list_transform(range(1, greatest(len(tk) - 2, 1) + 1),
        |        i -> array_to_string(tk[i:i+2], ' ')) END) AS s
        |  FROM base),
        |sh AS (SELECT doc_id, unnest(s) AS g FROM sets),
        |sz AS (SELECT doc_id, len(s) AS n FROM sets),
        |cand AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |jp AS (
        |  SELECT id_a, id_b, inter, sa.n + sb.n - inter AS u
        |  FROM cand
        |  JOIN sz sa ON sa.doc_id = id_a
        |  JOIN sz sb ON sb.doc_id = id_b
        |  WHERE 100000 * inter >= 49995 * (sa.n + sb.n - inter)),
        |banded AS (
        |  SELECT id_a, id_b, (20000 * inter + u) // (2 * u) AS jbp
        |  FROM jp WHERE 100000 * inter < 99005 * u),
        |anchors AS (
        |  SELECT id_a AS anchor_id, id_b AS positive_id, jbp FROM banded
        |  UNION ALL
        |  SELECT id_b, id_a, jbp FROM banded),
        |negcand AS (
        |  SELECT ((doc_id % 1000003) * 2654435761 + 7 * 40503)
        |           % 1000000007 % 64 AS nb,
        |         doc_id AS negative_id
        |  FROM documents
        |  QUALIFY row_number() OVER (
        |    PARTITION BY nb
        |    ORDER BY ((doc_id % 1000003) * 2654435761 + 8 * 40503)
        |      % 1000000007, doc_id) = 1),
        |trip AS (
        |  SELECT a.anchor_id, a.positive_id, n.negative_id, a.jbp
        |  FROM anchors a JOIN negcand n
        |    ON n.nb = (((a.anchor_id % 1000003) * 2654435761 + 7 * 40503)
        |                 % 1000000007 + 1) % 64
        |  WHERE n.negative_id <> a.anchor_id
        |    AND n.negative_id <> a.positive_id),
        |excl AS (
        |  SELECT id_a AS x, id_b AS y FROM jp
        |  UNION ALL SELECT id_b, id_a FROM jp)
        |SELECT t.anchor_id, t.positive_id, t.negative_id,
        |  CAST(t.jbp AS BIGINT) AS jaccard_bp
        |FROM trip t
        |LEFT JOIN excl e ON e.x = t.anchor_id AND e.y = t.negative_id
        |WHERE e.x IS NULL
        |ORDER BY anchor_id, positive_id""".stripMargin,

    "q_multimodal_features" ->
      // the stub codec replayed byte for byte: checksum = the unsigned
      // 31-polynomial rolling hash mod 2^64 (two's-complement signed at
      // the end - same HUGEINT machinery as q_doc_fingerprint, but
      // UNSIGNED bytes: decodeStub reads b & 0xff), histogram bins =
      // b // 32 counts, features = IEEE float32 division REAL/REAL (==
      // the JVM's Float/Int, converts to double exactly). Sentinel rows
      // (null/zero-byte payload) carry checksum 0 and NULL bins.
      """WITH RECURSIVE mx AS (
        |  SELECT coalesce(max(octet_length(encode(text))), 0) AS n FROM documents),
        |pw(k, v) AS (
        |  SELECT 0, CAST(1 AS HUGEINT)
        |  UNION ALL
        |  SELECT k + 1, (v * 31) % 18446744073709551616
        |  FROM pw, mx WHERE k < mx.n),
        |hx AS (
        |  SELECT doc_id, hex(encode(text)) AS h,
        |    octet_length(encode(text)) AS n
        |  FROM documents),
        |bytes AS (
        |  SELECT doc_id, n, i,
        |    (strpos('0123456789ABCDEF', substr(h, 2*i - 1, 1)) - 1) * 16
        |      + strpos('0123456789ABCDEF', substr(h, 2*i, 1)) - 1 AS b
        |  FROM hx, LATERAL unnest(generate_series(1, CAST(n AS BIGINT))) AS t(i)),
        |acc AS (
        |  SELECT b.doc_id, sum(CAST(b.b AS HUGEINT) * p.v) AS bsum
        |  FROM bytes b JOIN pw p ON p.k = b.n - b.i
        |  GROUP BY b.doc_id),
        |chk AS (
        |  SELECT x.doc_id,
        |    (CAST(1125899906842597 AS HUGEINT) * p.v + a.bsum)
        |      % 18446744073709551616 AS u
        |  FROM hx x JOIN pw p ON p.k = x.n JOIN acc a ON a.doc_id = x.doc_id
        |  WHERE x.n >= 1),
        |hist AS (
        |  SELECT doc_id, b // 32 AS bin, count(*) AS c
        |  FROM bytes GROUP BY 1, 2),
        |hw AS (
        |  SELECT doc_id,
        |    coalesce(sum(CASE WHEN bin = 0 THEN c END), 0) AS h0,
        |    coalesce(sum(CASE WHEN bin = 1 THEN c END), 0) AS h1,
        |    coalesce(sum(CASE WHEN bin = 2 THEN c END), 0) AS h2,
        |    coalesce(sum(CASE WHEN bin = 3 THEN c END), 0) AS h3,
        |    coalesce(sum(CASE WHEN bin = 4 THEN c END), 0) AS h4,
        |    coalesce(sum(CASE WHEN bin = 5 THEN c END), 0) AS h5,
        |    coalesce(sum(CASE WHEN bin = 6 THEN c END), 0) AS h6,
        |    coalesce(sum(CASE WHEN bin = 7 THEN c END), 0) AS h7
        |  FROM hist GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(coalesce(CASE WHEN c.u >= 9223372036854775808
        |       THEN c.u - 18446744073709551616 ELSE c.u END, 0) AS BIGINT)
        |    AS checksum,
        |  CAST(hw.h0 AS BIGINT) AS h0, CAST(hw.h1 AS BIGINT) AS h1,
        |  CAST(hw.h2 AS BIGINT) AS h2, CAST(hw.h3 AS BIGINT) AS h3,
        |  CAST(hw.h4 AS BIGINT) AS h4, CAST(hw.h5 AS BIGINT) AS h5,
        |  CAST(hw.h6 AS BIGINT) AS h6, CAST(hw.h7 AS BIGINT) AS h7,
        |  CAST(CAST(hw.h0 AS REAL) / CAST(x.n AS REAL) AS DOUBLE) AS f0,
        |  CAST(CAST(hw.h1 AS REAL) / CAST(x.n AS REAL) AS DOUBLE) AS f1,
        |  CAST(CAST(hw.h2 AS REAL) / CAST(x.n AS REAL) AS DOUBLE) AS f2,
        |  CAST(CAST(hw.h3 AS REAL) / CAST(x.n AS REAL) AS DOUBLE) AS f3,
        |  CAST(CAST(hw.h4 AS REAL) / CAST(x.n AS REAL) AS DOUBLE) AS f4,
        |  CAST(CAST(hw.h5 AS REAL) / CAST(x.n AS REAL) AS DOUBLE) AS f5,
        |  CAST(CAST(hw.h6 AS REAL) / CAST(x.n AS REAL) AS DOUBLE) AS f6,
        |  CAST(CAST(hw.h7 AS REAL) / CAST(x.n AS REAL) AS DOUBLE) AS f7
        |FROM documents d
        |LEFT JOIN hx x ON x.doc_id = d.doc_id AND x.n >= 1
        |LEFT JOIN chk c ON c.doc_id = d.doc_id
        |LEFT JOIN hw ON hw.doc_id = d.doc_id AND x.n >= 1
        |ORDER BY d.doc_id""".stripMargin,

    "q_dedup_clusters" ->
      // minhash-LSH near-dup components replayed as the exact-Jaccard pair
      // set (threshold 0.6 in its integer round(j,4) form: 100000*i >=
      // 59995*u) + recursive-CTE closure with min-id canonicals — the
      // q_corpus_clean corpus-gap argument (no pair in (0.30, 0.80) at any
      // SF) makes LSH == exact here too; singletons map to themselves
      """WITH RECURSIVE base AS (
        |  SELECT doc_id,
        |    CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(text), '\s+') END AS tk
        |  FROM documents),
        |sets AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
        |      ELSE list_transform(range(1, greatest(len(tk) - 2, 1) + 1),
        |        i -> array_to_string(tk[i:i+2], ' ')) END) AS s
        |  FROM base),
        |sh AS (SELECT doc_id, unnest(s) AS g FROM sets),
        |sz AS (SELECT doc_id, len(s) AS n FROM sets),
        |edges0 AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |edges1 AS (
        |  SELECT id_a, id_b
        |  FROM edges0
        |  JOIN sz sa ON sa.doc_id = id_a
        |  JOIN sz sb ON sb.doc_id = id_b
        |  WHERE 100000 * inter >= 59995 * (sa.n + sb.n - inter)),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM edges1
        |  UNION SELECT id_b, id_a FROM edges1),
        |reach AS (
        |  SELECT a AS id, b AS r FROM edges
        |  UNION
        |  SELECT re.id, e.b AS r FROM reach re JOIN edges e ON re.r = e.a
        |)
        |SELECT d.doc_id AS id,
        |  least(d.doc_id, coalesce(min(r.r), d.doc_id)) AS canonical_id
        |FROM documents d LEFT JOIN reach r ON r.id = d.doc_id
        |GROUP BY d.doc_id
        |ORDER BY id""".stripMargin,

    "q_training_pipeline" ->
      // the CAPSTONE composition replayed end to end as one CTE chain:
      // clean (quality floor, normalized dedup, exact-Jaccard cluster
      // canonicals per the corpus-gap argument) -> decontaminate (distinct
      // 13-gram-string joins vs the %25 benchmark slice, the q_decontaminate
      // equivalence) -> epoch-0 token counts -> split by the INJECTED
      // portable hash (u = h % 1e6 / 1e6, boundaries 0.9/0.95 as exact
      // doubles both engines) -> per-source running-sum packing at budget
      // 2048 (the q_pack_sequences replay); val/test rows carry NULL seq
      """WITH RECURSIVE base AS (
        |  SELECT doc_id, source, text,
        |    CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(text), '\s+') END AS tk
        |  FROM documents),
        |sig AS (
        |  SELECT doc_id, source, text, tk,
        |    CAST(least(len(tk), 200) * 25
        |      + least(floor(CAST(len(list_filter(tk,
        |          x -> x IN ('the','a','of','and','in','to','is'))) AS DOUBLE)
        |          * 15000.0 / greatest(CAST(len(tk) AS DOUBLE), 1.0)), 3000.0)
        |      + (CASE WHEN len(text) BETWEEN 100 AND 2000 THEN 2000 ELSE 0 END)
        |      AS INTEGER) AS quality_bp
        |  FROM base),
        |keep1 AS (SELECT * FROM sig WHERE quality_bp >= 3000),
        |surv AS (
        |  SELECT doc_id, source, text, tk
        |  FROM keep1
        |  QUALIFY row_number() OVER (
        |    PARTITION BY trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))
        |    ORDER BY doc_id) = 1),
        |sets AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
        |      ELSE list_transform(range(1, greatest(len(tk) - 2, 1) + 1),
        |        i -> array_to_string(tk[i:i+2], ' ')) END) AS s
        |  FROM surv),
        |sh AS (SELECT doc_id, unnest(s) AS g FROM sets),
        |sz AS (SELECT doc_id, len(s) AS n FROM sets),
        |edges0 AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
        |  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |edges1 AS (
        |  SELECT id_a, id_b
        |  FROM edges0
        |  JOIN sz sa ON sa.doc_id = id_a
        |  JOIN sz sb ON sb.doc_id = id_b
        |  WHERE 100000 * inter >= 79995 * (sa.n + sb.n - inter)),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM edges1
        |  UNION SELECT id_b, id_a FROM edges1),
        |reach AS (
        |  SELECT a AS id, b AS r FROM edges
        |  UNION
        |  SELECT re.id, e.b AS r FROM reach re JOIN edges e ON re.r = e.a
        |),
        |canon AS (
        |  SELECT s.doc_id
        |  FROM surv s LEFT JOIN reach r ON r.id = s.doc_id
        |  GROUP BY s.doc_id
        |  HAVING s.doc_id <= coalesce(min(r.r), s.doc_id)),
        |cleaned AS (
        |  SELECT s.doc_id, s.source, s.tk
        |  FROM surv s JOIN canon USING (doc_id)),
        |bgrams AS (
        |  SELECT DISTINCT unnest(list_transform(range(1, len(tk) - 11),
        |    i -> array_to_string(tk[i:i+12], ' '))) AS g
        |  FROM base WHERE doc_id % 25 = 0 AND len(tk) >= 13),
        |cgrams AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(tk) - 11),
        |    i -> array_to_string(tk[i:i+12], ' ')))) AS g
        |  FROM cleaned WHERE len(tk) >= 13),
        |dirty AS (SELECT DISTINCT c.doc_id FROM cgrams c JOIN bgrams b ON c.g = b.g),
        |decon AS (
        |  SELECT c.doc_id, c.source, CAST(0 AS INTEGER) AS epoch,
        |    CAST(len(c.tk) AS BIGINT) AS n_tokens,
        |    ((c.doc_id % 1000003) * 2654435761 + 7 * 40503)
        |      % 1000000007 % 1000000 / 1000000.0 AS u
        |  FROM cleaned c LEFT JOIN dirty d ON d.doc_id = c.doc_id
        |  WHERE d.doc_id IS NULL),
        |spl AS (
        |  SELECT doc_id, source, epoch, n_tokens,
        |    CASE WHEN u < 0.9 THEN 'train'
        |         WHEN u < 0.95 THEN 'val' ELSE 'test' END AS split
        |  FROM decon),
        |packtrain AS (
        |  SELECT doc_id, source, epoch, n_tokens, split,
        |    coalesce(sum(n_tokens) OVER (PARTITION BY source
        |      ORDER BY doc_id * 16 + epoch
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_before
        |  FROM spl WHERE split = 'train')
        |SELECT doc_id, source, epoch, n_tokens, split,
        |  CAST(floor(tok_before / 2048) AS INTEGER) AS seq_id,
        |  CAST(tok_before % 2048 AS INTEGER) AS seq_pos
        |FROM packtrain
        |UNION ALL
        |SELECT doc_id, source, epoch, n_tokens, split,
        |  CAST(NULL AS INTEGER), CAST(NULL AS INTEGER)
        |FROM spl WHERE split <> 'train'
        |ORDER BY doc_id, epoch""".stripMargin,

    "q_percentiles" ->
      """SELECT source,
        |  round(quantile_cont(CAST(n_chars AS DOUBLE), 0.5), 2) AS median_chars,
        |  round(quantile_cont(CAST(n_chars AS DOUBLE), 0.9), 2) AS p90_chars,
        |  count(*) AS n_docs
        |FROM documents
        |GROUP BY source
        |ORDER BY source""".stripMargin,

    "q_token_histogram" ->
      """WITH t AS (SELECT source,
        |  CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |       ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n
        |  FROM documents)
        |SELECT source, CAST(floor(n / 10) AS BIGINT) AS bucket,
        |       count(*) AS n_docs
        |FROM t GROUP BY source, bucket
        |ORDER BY source, bucket""".stripMargin,

    "q_token_budget" ->
      """WITH t AS (SELECT doc_id, source,
        |  CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |       ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens
        |  FROM documents),
        |w AS (SELECT doc_id, source, n_tokens,
        |  sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT doc_id, source, n_tokens FROM w
        |WHERE cum <= 500
        |ORDER BY doc_id""".stripMargin,

    "q_cooccurrence" ->
      """WITH t AS (SELECT string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents WHERE len(trim(text)) > 0),
        |tt AS (SELECT toks FROM t WHERE len(toks) >= 2),
        |uni AS (SELECT w, count(*) AS n_w
        |  FROM (SELECT unnest(toks) AS w FROM tt) GROUP BY w),
        |n AS (SELECT sum(n_w) AS n_total FROM uni),
        |bi AS (SELECT unnest(list_transform(range(len(toks) - 1),
        |    i -> toks[i + 1] || ' ' || toks[i + 2])) AS bg FROM tt),
        |bic AS (SELECT split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2,
        |    count(*) AS n_ab
        |  FROM bi GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT b.w1, b.w2, b.n_ab,
        |  floor(CAST(b.n_ab AS DOUBLE) * CAST(n.n_total AS DOUBLE) /
        |    (CAST(a.n_w AS DOUBLE) * CAST(c.n_w AS DOUBLE)) * 10000.0
        |    + 0.5) / 10000.0 AS pmi_ratio
        |FROM bic b
        |JOIN uni a ON b.w1 = a.w
        |JOIN uni c ON b.w2 = c.w
        |CROSS JOIN n
        |ORDER BY b.w1, b.w2""".stripMargin,

    "q_pack_sequences" ->
      """WITH t AS (SELECT doc_id, source,
        |  CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |       ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens
        |  FROM documents),
        |w AS (SELECT doc_id, source, n_tokens,
        |  coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_before
        |  FROM t)
        |SELECT doc_id, source, n_tokens,
        |  CAST(floor(tok_before / 256) AS INT) AS seq_id,
        |  CAST(tok_before % 256 AS INT) AS seq_pos
        |FROM w ORDER BY doc_id""".stripMargin,

    "q_pack_bestfit" ->
      // sequential best-fit-decreasing replay: one placement per
      // recursive step per (source, shard) chunk. State rows: 'sent'
      // (one per group, drives the step), 'bin' (open bins with
      // remaining cap), 'assign' (emitted once, not propagated). The
      // chosen bin is min{'cap','bin'} over bins with cap >= len —
      // exactly the engine's TreeMap ceiling probe with lowest-id ties
      """WITH RECURSIVE base AS (
        |  SELECT doc_id, source,
        |    CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n
        |  FROM documents),
        |pieces AS (
        |  SELECT doc_id, source, doc_id // 2000 AS shard, t.i AS piece,
        |    CASE WHEN n - (t.i - 1) * 256 > 256 THEN 256
        |         ELSE n - (t.i - 1) * 256 END AS len
        |  FROM base, LATERAL unnest(generate_series(1, ((n - 1) // 256) + 1)) AS t(i)
        |  WHERE n > 0),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY source, shard
        |      ORDER BY len DESC, doc_id, piece) AS rk
        |  FROM pieces),
        |st(r, source, shard, kind, bin, cap, doc_id, piece, len, pos) AS (
        |  SELECT DISTINCT 0, source, shard, 'sent', CAST(-1 AS BIGINT),
        |    CAST(-1 AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
        |    CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
        |  FROM ranked
        |  UNION ALL
        |  SELECT p.r + 1, p.source, p.shard,
        |    CASE WHEN role.j = 1 THEN p.kind
        |         WHEN role.j = 2 THEN 'bin' ELSE 'assign' END,
        |    CASE WHEN role.j = 1 THEN p.bin
        |         WHEN role.j = 2 THEN p.maxbin + 1
        |         ELSE coalesce(p.best['bin'], p.maxbin + 1) END,
        |    CASE WHEN role.j = 1 THEN
        |           CASE WHEN p.kind = 'bin' AND p.best IS NOT NULL
        |                 AND p.bin = p.best['bin'] AND p.cap = p.best['cap']
        |             THEN p.cap - p.dlen ELSE p.cap END
        |         WHEN role.j = 2 THEN 256 - p.dlen
        |         ELSE CAST(NULL AS BIGINT) END,
        |    CASE WHEN role.j = 3 THEN p.ddoc END,
        |    CASE WHEN role.j = 3 THEN p.dpiece END,
        |    CASE WHEN role.j = 3 THEN p.dlen END,
        |    CASE WHEN role.j = 3 THEN
        |      CASE WHEN p.best IS NOT NULL THEN 256 - p.best['cap']
        |           ELSE CAST(0 AS BIGINT) END END
        |  FROM (
        |    SELECT st.*, d.doc_id AS ddoc, d.piece AS dpiece, d.len AS dlen,
        |      min(CASE WHEN st.kind = 'bin' AND st.cap >= d.len
        |            THEN {'cap': st.cap, 'bin': st.bin} END)
        |        OVER (PARTITION BY st.source, st.shard) AS best,
        |      coalesce(max(CASE WHEN st.kind = 'bin' THEN st.bin END)
        |        OVER (PARTITION BY st.source, st.shard), -1) AS maxbin
        |    FROM st JOIN ranked d
        |      ON d.source = st.source AND d.shard = st.shard AND d.rk = st.r + 1
        |    WHERE st.kind <> 'assign'
        |  ) p, LATERAL unnest(generate_series(1, 3)) AS role(j)
        |  WHERE role.j = 1
        |     OR (role.j = 2 AND p.kind = 'sent' AND p.best IS NULL)
        |     OR (role.j = 3 AND p.kind = 'sent'))
        |SELECT a.doc_id, a.piece, a.source, a.len AS n_tokens,
        |  a.source || '#' || CAST(a.shard AS VARCHAR) || '#'
        |    || CAST(a.bin AS VARCHAR) AS seq_key,
        |  a.pos AS seq_pos
        |FROM st a WHERE a.kind = 'assign'
        |ORDER BY a.doc_id, a.piece""".stripMargin,

    // INTENTIONALLY the q_pack_sequences / q_token_budget SQL verbatim:
    // the ranged twins must hash-match the window forms' own oracles

    "q_pack_ranged" ->
      """WITH t AS (SELECT doc_id, source,
        |  CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |       ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens
        |  FROM documents),
        |w AS (SELECT doc_id, source, n_tokens,
        |  coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_before
        |  FROM t)
        |SELECT doc_id, source, n_tokens,
        |  CAST(floor(tok_before / 256) AS INT) AS seq_id,
        |  CAST(tok_before % 256 AS INT) AS seq_pos
        |FROM w ORDER BY doc_id""".stripMargin,

    "q_token_budget_ranged" ->
      """WITH t AS (SELECT doc_id, source,
        |  CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |       ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens
        |  FROM documents),
        |w AS (SELECT doc_id, source, n_tokens,
        |  sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT doc_id, source, n_tokens FROM w
        |WHERE cum <= 500
        |ORDER BY doc_id""".stripMargin,

    "q_dataset_split" ->
      """WITH d AS (SELECT doc_id,
        |  (((doc_id % 1048573) * 2654435761) % 1000000) / 1000000.0 AS u
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN u < 0.8 THEN 'train'
        |       WHEN u < 0.9 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM d ORDER BY doc_id""".stripMargin,

    "q_mixture_sample" ->
      """WITH d AS (SELECT doc_id, source,
        |  (((doc_id % 1048573) * 2654435761) % 1000000) / 1000000.0 AS u,
        |  CAST(CASE source WHEN 'src0' THEN 2.25 WHEN 'src1' THEN 0.5
        |       WHEN 'src2' THEN 1.0 WHEN 'src3' THEN 0.25 ELSE 0.0 END AS DOUBLE) AS rate
        |  FROM documents),
        |e AS (SELECT doc_id, source, u, rate, CAST(floor(rate) AS INT) AS nfull FROM d),
        |x AS (SELECT doc_id, source, nfull, u, rate,
        |        unnest(range(0, nfull + 1)) AS epoch FROM e)
        |SELECT doc_id, source, CAST(epoch AS INT) AS epoch
        |FROM x WHERE epoch < nfull OR u < rate - nfull
        |ORDER BY doc_id, epoch""".stripMargin,

    "q_repetition" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents),
        |b AS (SELECT doc_id, len(toks) AS n,
        |        unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bg
        |      FROM t WHERE len(toks) >= 2),
        |c AS (SELECT doc_id, n, bg, count(*) AS cnt FROM b GROUP BY 1, 2, 3),
        |a AS (SELECT doc_id,
        |        CAST(floor(max(cnt) * 10000.0 / (max(n) - 1) + 0.5) AS BIGINT) AS top_bigram_bp
        |      FROM c GROUP BY 1)
        |SELECT doc_id, top_bigram_bp
        |FROM documents LEFT JOIN a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q_token_gini" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents WHERE trim(text) <> ''),
        |c AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |  CAST(sum(c * c) AS BIGINT) AS ssq_tokens
        |FROM c GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "q_token_count" ->
      """SELECT doc_id,
        |  CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |    ELSE len(string_split_regex(trim(text), '\s+')) END AS INTEGER) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\f]'))
        |    AS INTEGER) AS n_bpe_tokens
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "q_word_stats" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    CASE WHEN len(trim(text)) = 0 THEN []
        |      ELSE string_split_regex(trim(text), '\s+') END AS tk
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(tk) AS INTEGER) AS n_words,
        |  CAST(coalesce(list_aggregate(list_apply(tk, t -> len(t)), 'sum'), 0)
        |    AS INTEGER) AS word_chars,
        |  CAST(len(list_filter(tk, t -> regexp_matches(t, '[A-Za-z]')))
        |    AS INTEGER) AS alpha_words
        |FROM toks ORDER BY doc_id""".stripMargin,

    "q_char_entropy" ->
      """WITH chars AS (
        |  SELECT doc_id, unnest(string_split(text, '')) AS ch
        |  FROM documents WHERE length(text) > 0),
        |counts AS (
        |  SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY doc_id, ch),
        |tot AS (
        |  SELECT doc_id, sum(c) AS n, sum(c * (ln(c) / ln(2))) AS s
        |  FROM counts GROUP BY doc_id)
        |SELECT doc_id,
        |  CAST(floor((ln(n) / ln(2) - s / n) * 10000 + 0.5) AS BIGINT) AS entropy_bp
        |FROM tot ORDER BY doc_id""".stripMargin,

    "q_text_quality" ->
      """WITH base AS (
        |  SELECT doc_id, text,
        |    CASE WHEN len(trim(text)) = 0 THEN 0
        |      ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
        |    CASE WHEN len(trim(text)) = 0 THEN 0
        |      ELSE len(list_filter(string_split_regex(trim(text), '\s+'),
        |        x -> x IN ('the','a','of','and','in','to','is'))) END AS stop_hits
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(n_tokens AS INTEGER) AS n_tokens,
        |  CAST(stop_hits AS INTEGER) AS stop_hits,
        |  floor(CAST(stop_hits AS DOUBLE) * 10000.0 / greatest(CAST(n_tokens AS DOUBLE), 1.0) + 0.5) / 10000.0 AS stop_ratio,
        |  CAST(least(n_tokens, 200) * 25
        |    + least(floor(CAST(stop_hits AS DOUBLE) * 15000.0
        |        / greatest(CAST(n_tokens AS DOUBLE), 1.0)), 3000.0)
        |    + (CASE WHEN len(text) BETWEEN 100 AND 2000 THEN 2000 ELSE 0 END)
        |    AS INTEGER) AS quality
        |FROM base
        |ORDER BY doc_id""".stripMargin,

    "q_lang_id" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS tk FROM documents),
        |hits AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(tk, x -> x IN ('the','a','and','of','is'))) AS h_en,
        |    len(list_filter(tk, x -> x IN ('el','la','los','de','y'))) AS h_es,
        |    len(list_filter(tk, x -> x IN ('der','die','das','und','ist'))) AS h_de,
        |    len(list_filter(tk, x -> x IN ('le','la','les','et','est'))) AS h_fr
        |  FROM toks),
        |pred AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN greatest(h_en, h_es, h_de, h_fr) = 0 THEN 'unknown'
        |      WHEN h_en = greatest(h_en, h_es, h_de, h_fr) THEN 'en'
        |      WHEN h_es = greatest(h_en, h_es, h_de, h_fr) THEN 'es'
        |      WHEN h_de = greatest(h_en, h_es, h_de, h_fr) THEN 'de'
        |      ELSE 'fr' END AS pred_lang
        |  FROM hits)
        |SELECT doc_id, pred_lang,
        |  CAST(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END AS INTEGER) AS is_match
        |FROM pred
        |ORDER BY doc_id""".stripMargin,

    "q_embed_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 10),
        |pairs AS (
        |  SELECT q.query_id, e.vec_id,
        |    round(
        |      list_aggregate(list_apply(list_zip(q.q_emb, e.embedding),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
        |      / (sqrt(list_aggregate(list_apply(q.q_emb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
        |         * sqrt(list_aggregate(list_apply(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))),
        |      4) AS cos_sim
        |  FROM embeddings e CROSS JOIN q
        |  WHERE e.vec_id <> q.query_id),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos_sim DESC, vec_id) AS rk FROM pairs)
        |SELECT query_id, vec_id AS neighbor_id, cos_sim
        |FROM ranked WHERE rk <= 5
        |ORDER BY query_id, neighbor_id""".stripMargin,

    "q_ann_recall" ->
      """WITH n AS (SELECT count(*) AS cnt FROM embeddings WHERE embedding IS NOT NULL),
        |cents AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) AS cid,
        |         embedding AS c_emb
        |  FROM embeddings, n
        |  WHERE embedding IS NOT NULL
        |    AND vec_id % greatest(1, cnt // 8) = 0
        |  ORDER BY vec_id LIMIT 8),
        |scores AS (
        |  SELECT e.vec_id, e.embedding, c.cid,
        |    -2 * list_aggregate(list_apply(list_zip(e.embedding, c.c_emb),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
        |      + list_aggregate(list_apply(c.c_emb,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS score
        |  FROM embeddings e CROSS JOIN cents c
        |  WHERE e.embedding IS NOT NULL),
        |assign AS (
        |  SELECT vec_id, embedding, cid AS centroid_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score, cid) AS rk
        |    FROM scores) WHERE rk = 1),
        |probes AS (
        |  SELECT vec_id AS query_id, embedding AS q_emb, cid AS centroid_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score, cid) AS rk
        |    FROM scores WHERE vec_id < 10) WHERE rk <= 2),
        |ivf AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |      row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rk
        |    FROM (
        |      SELECT p.query_id, a.vec_id AS neighbor_id,
        |        round(
        |          list_aggregate(list_apply(list_zip(p.q_emb, a.embedding),
        |            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
        |          / (sqrt(list_aggregate(list_apply(p.q_emb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
        |             * sqrt(list_aggregate(list_apply(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))),
        |          4) AS cos_sim
        |      FROM assign a JOIN probes p ON a.centroid_id = p.centroid_id
        |      WHERE a.vec_id <> p.query_id)) WHERE rk <= 5),
        |brute AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id,
        |      row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rk
        |    FROM (
        |      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
        |        round(
        |          list_aggregate(list_apply(list_zip(q.embedding, e.embedding),
        |            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
        |          / (sqrt(list_aggregate(list_apply(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
        |             * sqrt(list_aggregate(list_apply(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))),
        |          4) AS cos_sim
        |      FROM embeddings e
        |      CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10) q
        |      WHERE e.vec_id <> q.vec_id)) WHERE rk <= 5)
        |SELECT b.query_id,
        |  CAST(count(i.neighbor_id) * 10000 / 5 AS BIGINT) AS recall_bp
        |FROM brute b LEFT JOIN ivf i USING (query_id, neighbor_id)
        |GROUP BY b.query_id
        |ORDER BY query_id""".stripMargin,

    "q_ann_ivf" ->
      // the TRAINED-centroid IVF pipeline replayed end to end: seeds →
      // seed assignment → ONE quantized-Lloyd round (floor(v·2^16)
      // BIGINT sums are order-free; the centroid dim is one IEEE
      // division narrowed to REAL — exactly Knn.trainCentroids) →
      // trained assignment → 2-probe routing → per-query top-5 cosine
      """WITH n AS (SELECT count(*) AS cnt FROM embeddings WHERE embedding IS NOT NULL),
        |cents0 AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) AS cid,
        |         embedding AS c_emb
        |  FROM embeddings, n
        |  WHERE embedding IS NOT NULL
        |    AND vec_id % greatest(1, cnt // 8) = 0
        |  ORDER BY vec_id LIMIT 8),
        |scores0 AS (
        |  SELECT e.vec_id, e.embedding, c.cid,
        |    -2 * list_aggregate(list_apply(list_zip(e.embedding, c.c_emb),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
        |      + list_aggregate(list_apply(c.c_emb,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS score
        |  FROM embeddings e CROSS JOIN cents0 c
        |  WHERE e.embedding IS NOT NULL),
        |assign0 AS (
        |  SELECT vec_id, embedding, cid FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score, cid) AS rk
        |    FROM scores0) WHERE rk = 1),
        |expl1 AS (
        |  SELECT cid, unnest(range(1, len(embedding) + 1)) AS d,
        |         unnest(embedding) AS v
        |  FROM assign0),
        |sums1 AS (
        |  SELECT cid, d, sum(CAST(floor(CAST(v AS DOUBLE) * 65536.0) AS BIGINT)) AS sq,
        |         count(*) AS nv
        |  FROM expl1 GROUP BY cid, d),
        |cents AS (
        |  SELECT cid,
        |    list(CAST(CAST(sq AS DOUBLE) / (65536.0 * nv) AS REAL) ORDER BY d) AS c_emb
        |  FROM sums1 GROUP BY cid),
        |scores AS (
        |  SELECT e.vec_id, e.embedding, c.cid,
        |    -2 * list_aggregate(list_apply(list_zip(e.embedding, c.c_emb),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
        |      + list_aggregate(list_apply(c.c_emb,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS score
        |  FROM embeddings e CROSS JOIN cents c
        |  WHERE e.embedding IS NOT NULL),
        |assign AS (
        |  SELECT vec_id, embedding, cid AS centroid_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score, cid) AS rk
        |    FROM scores) WHERE rk = 1),
        |probes AS (
        |  SELECT vec_id AS query_id, embedding AS q_emb, cid AS centroid_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score, cid) AS rk
        |    FROM scores WHERE vec_id < 10) WHERE rk <= 2)
        |SELECT query_id, neighbor_id, cos_sim FROM (
        |  SELECT query_id, neighbor_id, cos_sim,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rk
        |  FROM (
        |    SELECT p.query_id, a.vec_id AS neighbor_id,
        |      round(
        |        list_aggregate(list_apply(list_zip(p.q_emb, a.embedding),
        |          x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
        |        / (sqrt(list_aggregate(list_apply(p.q_emb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
        |           * sqrt(list_aggregate(list_apply(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))),
        |        4) AS cos_sim
        |    FROM assign a JOIN probes p ON a.centroid_id = p.centroid_id
        |    WHERE a.vec_id <> p.query_id))
        |WHERE rk <= 5
        |ORDER BY query_id, neighbor_id""".stripMargin,

    "q_ann_ivfpq" ->
      // IVFADC replayed end to end: the q_ann_ivf coarse replay (seeds →
      // one quantized-Lloyd round → trained assignment → 2-probe routing)
      // extended with exact-float residuals, per-subspace codebook
      // training (the SAME fixed-point Lloyd on 16-dim slices, the same
      // seed vec_ids by construction), PQ code assignment, the
      // floor(2^16·d²) BIGINT lookup table per (query, probed bucket),
      // and the exact-integer ADC top-5.
      """WITH n AS (SELECT count(*) AS cnt FROM embeddings WHERE embedding IS NOT NULL),
        |cents0 AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) AS cid,
        |         embedding AS c_emb
        |  FROM embeddings, n
        |  WHERE embedding IS NOT NULL
        |    AND vec_id % greatest(1, cnt // 8) = 0
        |  ORDER BY vec_id LIMIT 8),
        |scores0 AS (
        |  SELECT e.vec_id, e.embedding, c.cid,
        |    -2 * list_aggregate(list_apply(list_zip(e.embedding, c.c_emb),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
        |      + list_aggregate(list_apply(c.c_emb,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS score
        |  FROM embeddings e CROSS JOIN cents0 c
        |  WHERE e.embedding IS NOT NULL),
        |assign0 AS (
        |  SELECT vec_id, embedding, cid FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score, cid) AS rk
        |    FROM scores0) WHERE rk = 1),
        |expl1 AS (
        |  SELECT cid, unnest(range(1, len(embedding) + 1)) AS d,
        |         unnest(embedding) AS v
        |  FROM assign0),
        |sums1 AS (
        |  SELECT cid, d, sum(CAST(floor(CAST(v AS DOUBLE) * 65536.0) AS BIGINT)) AS sq,
        |         count(*) AS nv
        |  FROM expl1 GROUP BY cid, d),
        |cents AS (
        |  SELECT cid,
        |    list(CAST(CAST(sq AS DOUBLE) / (65536.0 * nv) AS REAL) ORDER BY d) AS c_emb
        |  FROM sums1 GROUP BY cid),
        |scores AS (
        |  SELECT e.vec_id, e.embedding, c.cid,
        |    -2 * list_aggregate(list_apply(list_zip(e.embedding, c.c_emb),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
        |      + list_aggregate(list_apply(c.c_emb,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS score
        |  FROM embeddings e CROSS JOIN cents c
        |  WHERE e.embedding IS NOT NULL),
        |assign AS (
        |  SELECT vec_id, embedding, cid AS centroid_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score, cid) AS rk
        |    FROM scores) WHERE rk = 1),
        |resid AS (
        |  SELECT a.vec_id, a.centroid_id,
        |    list_apply(list_zip(a.embedding, c.c_emb),
        |      x -> CAST(CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE) AS REAL)) AS r_emb
        |  FROM assign a JOIN cents c ON a.centroid_id = c.cid),
        |ms AS (SELECT unnest(range(1, 5)) AS m),
        |rsub AS (
        |  SELECT r.vec_id, r.centroid_id, ms.m,
        |    list_slice(r.r_emb, (ms.m - 1) * 16 + 1, ms.m * 16) AS sv
        |  FROM resid r CROSS JOIN ms),
        |bseed_ids AS (
        |  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) AS bid
        |  FROM (SELECT vec_id FROM resid, n WHERE vec_id % greatest(1, cnt // 8) = 0
        |        ORDER BY vec_id LIMIT 8)),
        |bseeds AS (
        |  SELECT s.bid, r.m, r.sv AS b_emb
        |  FROM bseed_ids s JOIN rsub r ON r.vec_id = s.vec_id),
        |bscores0 AS (
        |  SELECT r.vec_id, r.m, r.sv, b.bid,
        |    -2 * list_aggregate(list_apply(list_zip(r.sv, b.b_emb),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
        |      + list_aggregate(list_apply(b.b_emb,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS score
        |  FROM rsub r JOIN bseeds b ON b.m = r.m),
        |bassign0 AS (
        |  SELECT vec_id, m, sv, bid FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY score, bid) AS rk
        |    FROM bscores0) WHERE rk = 1),
        |bexpl AS (
        |  SELECT m, bid, unnest(range(1, len(sv) + 1)) AS d, unnest(sv) AS v
        |  FROM bassign0),
        |bsums AS (
        |  SELECT m, bid, d, sum(CAST(floor(CAST(v AS DOUBLE) * 65536.0) AS BIGINT)) AS sq,
        |         count(*) AS nv
        |  FROM bexpl GROUP BY m, bid, d),
        |books AS (
        |  SELECT m, bid,
        |    list(CAST(CAST(sq AS DOUBLE) / (65536.0 * nv) AS REAL) ORDER BY d) AS b_emb
        |  FROM bsums GROUP BY m, bid),
        |bscores AS (
        |  SELECT r.vec_id, r.centroid_id, r.m, b.bid,
        |    -2 * list_aggregate(list_apply(list_zip(r.sv, b.b_emb),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
        |      + list_aggregate(list_apply(b.b_emb,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS score
        |  FROM rsub r JOIN books b ON b.m = r.m),
        |codes AS (
        |  SELECT vec_id, centroid_id, m, bid FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY score, bid) AS rk
        |    FROM bscores) WHERE rk = 1),
        |probes AS (
        |  SELECT vec_id AS query_id, embedding AS q_emb, cid AS centroid_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score, cid) AS rk
        |    FROM scores WHERE vec_id < 10) WHERE rk <= 2),
        |qres AS (
        |  SELECT p.query_id, p.centroid_id,
        |    list_apply(list_zip(p.q_emb, c.c_emb),
        |      x -> CAST(CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE) AS REAL)) AS qr
        |  FROM probes p JOIN cents c ON p.centroid_id = c.cid),
        |lut AS (
        |  SELECT q.query_id, q.centroid_id, b.m, b.bid,
        |    CAST(floor(65536.0 * list_aggregate(
        |      list_apply(list_zip(list_slice(q.qr, (b.m - 1) * 16 + 1, b.m * 16), b.b_emb),
        |        x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
        |           * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))), 'sum')) AS BIGINT) AS d_q
        |  FROM qres q CROSS JOIN books b),
        |scored AS (
        |  SELECT l.query_id, c.vec_id AS neighbor_id,
        |    CAST(sum(l.d_q) AS BIGINT) AS adc_dist
        |  FROM codes c
        |  JOIN lut l ON l.centroid_id = c.centroid_id AND l.m = c.m AND l.bid = c.bid
        |  WHERE c.vec_id <> l.query_id
        |  GROUP BY 1, 2)
        |SELECT query_id, neighbor_id, adc_dist FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rk
        |  FROM scored) WHERE rk <= 5
        |ORDER BY query_id, neighbor_id""".stripMargin,

    // the recall-vs-bytes frontier: the ivfpq coarse replay shared once,
    // then the per-budget codebook Lloyd / codes / LUT / ADC top-5 for
    // m ∈ {2,4,8}, scored against the exact quantized-L2 top-5
    "q_ann_frontier" -> annFrontierOracle,

    "q_kmeanspar_seed" ->
      // k-means|| replayed end to end: first center = argmin (portable
      // hash, vec_id); three unrolled rounds of (min quantized d² vs
      // the candidate frame → corpus sum φ → the exact HUGEINT
      // selection inequality h·φ < 16·qd·2^20 → candidate union);
      // weights = nearest-candidate counts (min-struct (qd, cid) ties
      // to the smaller id); greedy weighted re-cluster as a recursive
      // CTE — step 1 takes max weight (tie min cid), each next step
      // the correlated argmax of weight · min-qd-to-chosen over the
      // candidate pair table. Every comparison is an exact integer
      s"""WITH RECURSIVE base AS (
        |  SELECT vec_id, embedding, vec_id % 1048573 * 2654435761 % 1048576 AS h
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |cand0 AS (
        |  SELECT vec_id, embedding FROM base ORDER BY h, vec_id LIMIT 1),
        |${kmeansParRound(1)},
        |${kmeansParRound(2)},
        |${kmeansParRound(3)},
        |near AS (
        |  SELECT b.vec_id,
        |    min({'qd': ${kmQd("b.embedding", "c.embedding")}, 'cid': c.vec_id}) AS m
        |  FROM base b CROSS JOIN cand3 c GROUP BY b.vec_id),
        |wall AS (
        |  SELECT c.vec_id AS cid, coalesce(w.w, 0) AS w
        |  FROM cand3 c LEFT JOIN
        |    (SELECT m['cid'] AS cid, count(*) AS w FROM near GROUP BY 1) w
        |  ON w.cid = c.vec_id),
        |pairs AS (
        |  SELECT a.vec_id AS ida, b.vec_id AS idb,
        |    ${kmQd("a.embedding", "b.embedding")} AS qd
        |  FROM cand3 a CROSS JOIN cand3 b),
        |g(step, chosen) AS (
        |  SELECT 1, [cid] FROM (SELECT cid FROM wall ORDER BY w DESC, cid LIMIT 1)
        |  UNION ALL
        |  SELECT step + 1, list_append(chosen,
        |    (SELECT x.cid FROM (
        |       SELECT w2.cid AS cid,
        |         CAST(w2.w AS HUGEINT) * CAST(min(p.qd) AS HUGEINT) AS score
        |       FROM wall w2 JOIN pairs p ON p.ida = w2.cid
        |       WHERE NOT list_contains(g.chosen, w2.cid)
        |         AND list_contains(g.chosen, p.idb)
        |       GROUP BY w2.cid, w2.w) x
        |     ORDER BY x.score DESC, x.cid LIMIT 1))
        |  FROM g WHERE step < 8)
        |SELECT CAST(t.i AS INTEGER) AS rank,
        |  fin.chosen[CAST(t.i AS INTEGER)] AS vec_id, wall.w AS weight
        |FROM (SELECT chosen FROM g WHERE step = 8) fin,
        |  LATERAL unnest(generate_series(1, 8)) AS t(i)
        |  JOIN wall ON wall.cid = fin.chosen[CAST(t.i AS INTEGER)]
        |ORDER BY rank""".stripMargin,

    "q_ann_rq" ->
      // residual quantization replayed end to end: the q_ann_ivfpq
      // coarse replay (seeds → one quantized-Lloyd round → trained
      // assignment → exact-float residuals) continued with a FULL-DIM
      // stage-2 Lloyd on the residuals (same seed stride, same
      // fixed-point sums), code assignment, the per-(query, probed
      // bucket) floor(2^16·‖qr − c₂‖²) BIGINT table over the 8
      // stage-2 entries, and ONE lookup per candidate for the
      // exact-integer top-5
      """WITH n AS (SELECT count(*) AS cnt FROM embeddings WHERE embedding IS NOT NULL),
        |cents0 AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) AS cid,
        |         embedding AS c_emb
        |  FROM embeddings, n
        |  WHERE embedding IS NOT NULL
        |    AND vec_id % greatest(1, cnt // 8) = 0
        |  ORDER BY vec_id LIMIT 8),
        |scores0 AS (
        |  SELECT e.vec_id, e.embedding, c.cid,
        |    -2 * list_aggregate(list_apply(list_zip(e.embedding, c.c_emb),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
        |      + list_aggregate(list_apply(c.c_emb,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS score
        |  FROM embeddings e CROSS JOIN cents0 c
        |  WHERE e.embedding IS NOT NULL),
        |assign0 AS (
        |  SELECT vec_id, embedding, cid FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score, cid) AS rk
        |    FROM scores0) WHERE rk = 1),
        |expl1 AS (
        |  SELECT cid, unnest(range(1, len(embedding) + 1)) AS d,
        |         unnest(embedding) AS v
        |  FROM assign0),
        |sums1 AS (
        |  SELECT cid, d, sum(CAST(floor(CAST(v AS DOUBLE) * 65536.0) AS BIGINT)) AS sq,
        |         count(*) AS nv
        |  FROM expl1 GROUP BY cid, d),
        |cents AS (
        |  SELECT cid,
        |    list(CAST(CAST(sq AS DOUBLE) / (65536.0 * nv) AS REAL) ORDER BY d) AS c_emb
        |  FROM sums1 GROUP BY cid),
        |scores AS (
        |  SELECT e.vec_id, e.embedding, c.cid,
        |    -2 * list_aggregate(list_apply(list_zip(e.embedding, c.c_emb),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
        |      + list_aggregate(list_apply(c.c_emb,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS score
        |  FROM embeddings e CROSS JOIN cents c
        |  WHERE e.embedding IS NOT NULL),
        |assign AS (
        |  SELECT vec_id, embedding, cid AS centroid_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score, cid) AS rk
        |    FROM scores) WHERE rk = 1),
        |resid AS (
        |  SELECT a.vec_id, a.centroid_id,
        |    list_apply(list_zip(a.embedding, c.c_emb),
        |      x -> CAST(CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE) AS REAL)) AS r_emb
        |  FROM assign a JOIN cents c ON a.centroid_id = c.cid),
        |rseeds AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) AS bid,
        |         r_emb AS b_emb
        |  FROM resid, n
        |  WHERE vec_id % greatest(1, cnt // 8) = 0
        |  ORDER BY vec_id LIMIT 8),
        |rscores0 AS (
        |  SELECT r.vec_id, r.r_emb, b.bid,
        |    -2 * list_aggregate(list_apply(list_zip(r.r_emb, b.b_emb),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
        |      + list_aggregate(list_apply(b.b_emb,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS score
        |  FROM resid r CROSS JOIN rseeds b),
        |rassign0 AS (
        |  SELECT vec_id, r_emb, bid FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score, bid) AS rk
        |    FROM rscores0) WHERE rk = 1),
        |rexpl AS (
        |  SELECT bid, unnest(range(1, len(r_emb) + 1)) AS d, unnest(r_emb) AS v
        |  FROM rassign0),
        |rsums AS (
        |  SELECT bid, d, sum(CAST(floor(CAST(v AS DOUBLE) * 65536.0) AS BIGINT)) AS sq,
        |         count(*) AS nv
        |  FROM rexpl GROUP BY bid, d),
        |book AS (
        |  SELECT bid,
        |    list(CAST(CAST(sq AS DOUBLE) / (65536.0 * nv) AS REAL) ORDER BY d) AS b_emb
        |  FROM rsums GROUP BY bid),
        |rscores AS (
        |  SELECT r.vec_id, r.centroid_id, b.bid,
        |    -2 * list_aggregate(list_apply(list_zip(r.r_emb, b.b_emb),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
        |      + list_aggregate(list_apply(b.b_emb,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS score
        |  FROM resid r CROSS JOIN book b),
        |codes AS (
        |  SELECT vec_id, centroid_id, bid FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score, bid) AS rk
        |    FROM rscores) WHERE rk = 1),
        |probes AS (
        |  SELECT vec_id AS query_id, embedding AS q_emb, cid AS centroid_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score, cid) AS rk
        |    FROM scores WHERE vec_id < 10) WHERE rk <= 2),
        |qres AS (
        |  SELECT p.query_id, p.centroid_id,
        |    list_apply(list_zip(p.q_emb, c.c_emb),
        |      x -> CAST(CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE) AS REAL)) AS qr
        |  FROM probes p JOIN cents c ON p.centroid_id = c.cid),
        |lut AS (
        |  SELECT q.query_id, q.centroid_id, b.bid,
        |    CAST(floor(65536.0 * list_aggregate(
        |      list_apply(list_zip(q.qr, b.b_emb),
        |        x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
        |           * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))), 'sum')) AS BIGINT) AS d_q
        |  FROM qres q CROSS JOIN book b),
        |scored AS (
        |  SELECT l.query_id, c.vec_id AS neighbor_id, l.d_q AS rq_dist
        |  FROM codes c
        |  JOIN lut l ON l.centroid_id = c.centroid_id AND l.bid = c.bid
        |  WHERE c.vec_id <> l.query_id)
        |SELECT query_id, neighbor_id, rq_dist FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rq_dist, neighbor_id) AS rk
        |  FROM scored) WHERE rk <= 5
        |ORDER BY query_id, neighbor_id""".stripMargin,

    "q_semantic_dedup" ->
      // the full SemDeDup recipe replayed: quantized-Lloyd trained cells
      // (the q_ann_ivf replay), within-cell round-4 cosine pairs at
      // >= 0.25, symmetric-edge recursive closure with min-id canonicals
      // (the q_dedup_clusters pattern); singletons map to themselves
      """WITH RECURSIVE n AS (SELECT count(*) AS cnt FROM embeddings WHERE embedding IS NOT NULL),
        |cents0 AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) AS cid,
        |         embedding AS c_emb
        |  FROM embeddings, n
        |  WHERE embedding IS NOT NULL
        |    AND vec_id % greatest(1, cnt // 8) = 0
        |  ORDER BY vec_id LIMIT 8),
        |scores0 AS (
        |  SELECT e.vec_id, e.embedding, c.cid,
        |    -2 * list_aggregate(list_apply(list_zip(e.embedding, c.c_emb),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
        |      + list_aggregate(list_apply(c.c_emb,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS score
        |  FROM embeddings e CROSS JOIN cents0 c
        |  WHERE e.embedding IS NOT NULL),
        |assign0 AS (
        |  SELECT vec_id, embedding, cid FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score, cid) AS rk
        |    FROM scores0) WHERE rk = 1),
        |expl1 AS (
        |  SELECT cid, unnest(range(1, len(embedding) + 1)) AS d,
        |         unnest(embedding) AS v
        |  FROM assign0),
        |sums1 AS (
        |  SELECT cid, d, sum(CAST(floor(CAST(v AS DOUBLE) * 65536.0) AS BIGINT)) AS sq,
        |         count(*) AS nv
        |  FROM expl1 GROUP BY cid, d),
        |cents AS (
        |  SELECT cid,
        |    list(CAST(CAST(sq AS DOUBLE) / (65536.0 * nv) AS REAL) ORDER BY d) AS c_emb
        |  FROM sums1 GROUP BY cid),
        |scores AS (
        |  SELECT e.vec_id, e.embedding, c.cid,
        |    -2 * list_aggregate(list_apply(list_zip(e.embedding, c.c_emb),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
        |      + list_aggregate(list_apply(c.c_emb,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS score
        |  FROM embeddings e CROSS JOIN cents c
        |  WHERE e.embedding IS NOT NULL),
        |assign AS (
        |  SELECT vec_id, embedding, cid AS centroid_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score, cid) AS rk
        |    FROM scores) WHERE rk = 1),
        |pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM assign a JOIN assign b
        |    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
        |  WHERE round(
        |      list_aggregate(list_apply(list_zip(a.embedding, b.embedding),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
        |      / (sqrt(list_aggregate(list_apply(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
        |         * sqrt(list_aggregate(list_apply(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))),
        |      4) >= 0.25),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach AS (
        |  SELECT a AS id, b AS r FROM edges
        |  UNION
        |  SELECT re.id, e.b AS r FROM reach re JOIN edges e ON re.r = e.a
        |)
        |SELECT v.vec_id AS id,
        |  least(v.vec_id, coalesce(min(r.r), v.vec_id)) AS canonical_id
        |FROM embeddings v LEFT JOIN reach r ON r.id = v.vec_id
        |GROUP BY v.vec_id
        |ORDER BY id""".stripMargin,

    "q_temperature_sample" ->
      // α=0.5 temperature quotas replayed exactly: fixed-point sqrt
      // weights, HUGEINT largest-remainder apportionment (remainder
      // ties by lang), per-lang portable-hash ranks
      """WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |w AS (
        |  SELECT lang, n,
        |    CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1048576.0) AS BIGINT) AS wq
        |  FROM counts),
        |tot AS (SELECT CAST(sum(wq) AS HUGEINT) AS tw FROM w),
        |q0 AS (
        |  SELECT lang, wq,
        |    CAST(200 AS HUGEINT) * wq // tw AS base,
        |    CAST(200 AS HUGEINT) * wq % tw AS rem
        |  FROM w, tot),
        |d AS (SELECT 200 - CAST(sum(base) AS BIGINT) AS deficit FROM q0),
        |quota AS (
        |  SELECT lang, CAST(base AS BIGINT) +
        |    CASE WHEN row_number() OVER (ORDER BY rem DESC, lang) <= deficit
        |         THEN 1 ELSE 0 END AS quota
        |  FROM q0, d),
        |ranked AS (
        |  SELECT doc_id, lang,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY (doc_id % 1048573) * 2654435761 % 1000000, doc_id)
        |      AS BIGINT) AS srank
        |  FROM documents)
        |SELECT r.doc_id, r.lang, r.srank, q.quota, r.srank <= q.quota AS kept
        |FROM ranked r JOIN quota q USING (lang)
        |ORDER BY doc_id""".stripMargin,

    "q_prototype_prune" ->
      // the Sorscher et al. pruning rule replayed end to end: quantized-
      // Lloyd trained cells (the q_ann_ivf replay), dist² = ‖v‖² + score
      // via the proven sequential folds, per-cell (dist² DESC, id) ranks,
      // keep floor n·3000 DIV 10⁴ (min 1)
      """WITH n AS (SELECT count(*) AS cnt FROM embeddings WHERE embedding IS NOT NULL),
        |cents0 AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) AS cid,
        |         embedding AS c_emb
        |  FROM embeddings, n
        |  WHERE embedding IS NOT NULL
        |    AND vec_id % greatest(1, cnt // 8) = 0
        |  ORDER BY vec_id LIMIT 8),
        |scores0 AS (
        |  SELECT e.vec_id, e.embedding, c.cid,
        |    -2 * list_aggregate(list_apply(list_zip(e.embedding, c.c_emb),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
        |      + list_aggregate(list_apply(c.c_emb,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS score
        |  FROM embeddings e CROSS JOIN cents0 c
        |  WHERE e.embedding IS NOT NULL),
        |assign0 AS (
        |  SELECT vec_id, embedding, cid FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score, cid) AS rk
        |    FROM scores0) WHERE rk = 1),
        |expl1 AS (
        |  SELECT cid, unnest(range(1, len(embedding) + 1)) AS d,
        |         unnest(embedding) AS v
        |  FROM assign0),
        |sums1 AS (
        |  SELECT cid, d, sum(CAST(floor(CAST(v AS DOUBLE) * 65536.0) AS BIGINT)) AS sq,
        |         count(*) AS nv
        |  FROM expl1 GROUP BY cid, d),
        |cents AS (
        |  SELECT cid,
        |    list(CAST(CAST(sq AS DOUBLE) / (65536.0 * nv) AS REAL) ORDER BY d) AS c_emb
        |  FROM sums1 GROUP BY cid),
        |scores AS (
        |  SELECT e.vec_id, e.embedding, c.cid,
        |    -2 * list_aggregate(list_apply(list_zip(e.embedding, c.c_emb),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
        |      + list_aggregate(list_apply(c.c_emb,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS score
        |  FROM embeddings e CROSS JOIN cents c
        |  WHERE e.embedding IS NOT NULL),
        |assign AS (
        |  SELECT vec_id, embedding, cid, score FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score, cid) AS rk
        |    FROM scores) WHERE rk = 1),
        |d AS (
        |  SELECT vec_id, cid,
        |    list_aggregate(list_apply(embedding,
        |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') + score AS dist2
        |  FROM assign),
        |r AS (
        |  SELECT vec_id, cid, dist2,
        |    count(*) OVER (PARTITION BY cid) AS cell_n,
        |    CAST(row_number() OVER (PARTITION BY cid ORDER BY dist2 DESC, vec_id)
        |      AS BIGINT) AS drank
        |  FROM d)
        |SELECT vec_id, CAST(cid AS BIGINT) AS centroid_id,
        |  CAST(floor(dist2 * 10000 + 0.5) AS BIGINT) AS dist2_bp,
        |  cell_n, drank,
        |  drank <= greatest(1, cell_n * 3000 // 10000) AS kept
        |FROM r ORDER BY vec_id""".stripMargin,

    "q_dedup_incremental" ->
      """SELECT d.doc_id, d.source, d.n_chars
        |FROM documents d
        |WHERE NOT EXISTS (SELECT 1 FROM documents h
        |  WHERE h.doc_id % 2 = 0 AND h.text = d.text)
        |ORDER BY d.doc_id""".stripMargin,

    "q_vector_quantize" ->
      """WITH s AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id,
        |    CASE WHEN maxabs = 0 THEN 1.0 ELSE maxabs / 127.0 END AS scale,
        |    list_transform(embedding, x -> CAST(floor(
        |      CAST(x AS DOUBLE) / (CASE WHEN maxabs = 0 THEN 1.0 ELSE maxabs / 127.0 END)
        |      + 0.5) AS BIGINT)) AS qv
        |  FROM s)
        |SELECT vec_id,
        |  CAST(floor(scale * 10000.0 + 0.5) AS BIGINT) AS scale_e4,
        |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
        |  CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS q_norm2
        |FROM q ORDER BY vec_id""".stripMargin,

    "q_ngram_jaccard" ->
      // shingle STRINGS here vs 64-bit shingle hashes on the Spark side:
      // set sizes agree modulo negligible hash collisions
      """WITH toks AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(text), '\s+') END AS t
        |  FROM documents),
        |sets AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[])
        |      ELSE list_transform(range(1, greatest(len(t) - 2, 1) + 1),
        |        i -> array_to_string(t[i:i+2], ' ')) END) AS s
        |  FROM toks)
        |SELECT a.doc_id AS id_a, a.doc_id + 1 AS id_b,
        |  CAST(len(list_intersect(sa.s, sb.s)) AS BIGINT) AS n_inter,
        |  CAST(len(list_distinct(list_concat(sa.s, sb.s))) AS BIGINT) AS n_union
        |FROM documents a
        |JOIN documents b ON b.doc_id = a.doc_id + 1
        |JOIN sets sa ON sa.doc_id = a.doc_id
        |JOIN sets sb ON sb.doc_id = b.doc_id
        |WHERE a.doc_id % 2 = 0
        |ORDER BY id_a, id_b""".stripMargin,

    "q_simhash" ->
      // the sketch replays exactly: FNV-1a (64-bit wrapping multiply via
      // the same HUGEINT mod-2^64 machinery as q_doc_fingerprint, with
      // the CONSTANT multiplier split into 32-bit halves so no product
      // leaves INT128) + splitmix64 finalizer + per-bit sign tally; the
      // 4x16-bit chunk pigeonhole is COMPLETE for hamming <= 3, so the
      // output is all pairs within the radius — no LSH recall caveat.
      // Corpus contract (measured, all SFs): ASCII single-space text, so
      // ord(char) == the UTF-8 byte and string_split(' ') == the pinned
      // whitespace tokenizer; the tok <> '' guard keeps multi-space text
      // aligned with the kernel should the corpus ever gain it.
      """WITH tw AS (
        |  SELECT doc_id, t.tok, count(*) AS w
        |  FROM documents, LATERAL unnest(string_split(trim(text), ' ')) AS t(tok)
        |  WHERE text IS NOT NULL AND t.tok <> ''
        |  GROUP BY doc_id, t.tok),
        |gt AS (SELECT DISTINCT tok FROM tw),
        |fv AS (
        |  SELECT tok,
        |    list_reduce(
        |      list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |        list_transform(range(1, length(tok)+1),
        |          i -> CAST(ord(substr(tok, CAST(i AS INT), 1)) AS HUGEINT))),
        |      (h, b) -> ((CAST(xor(CAST(h AS UBIGINT), CAST(b AS UBIGINT)) AS HUGEINT))*435 + ((((CAST(xor(CAST(h AS UBIGINT), CAST(b AS UBIGINT)) AS HUGEINT))%4294967296)*256) % 4294967296) * 4294967296) % 18446744073709551616) AS base
        |  FROM gt),
        |m1 AS (SELECT tok, (base + 11400714819323198485) % 18446744073709551616 AS z FROM fv),
        |m2 AS (SELECT tok, ((CAST(xor(CAST(z AS UBIGINT), CAST(CAST(CAST(z AS UBIGINT) >> 30 AS HUGEINT) AS UBIGINT)) AS HUGEINT))*484763065 + ((((CAST(xor(CAST(z AS UBIGINT), CAST(CAST(CAST(z AS UBIGINT) >> 30 AS HUGEINT) AS UBIGINT)) AS HUGEINT))%4294967296)*3210233709) % 4294967296) * 4294967296) % 18446744073709551616 AS z FROM m1),
        |m3 AS (SELECT tok, ((CAST(xor(CAST(z AS UBIGINT), CAST(CAST(CAST(z AS UBIGINT) >> 27 AS HUGEINT) AS UBIGINT)) AS HUGEINT))*321982955 + ((((CAST(xor(CAST(z AS UBIGINT), CAST(CAST(CAST(z AS UBIGINT) >> 27 AS HUGEINT) AS UBIGINT)) AS HUGEINT))%4294967296)*2496678331) % 4294967296) * 4294967296) % 18446744073709551616 AS z FROM m2),
        |th AS (SELECT tok, CAST(CAST(xor(CAST(z AS UBIGINT), CAST(CAST(CAST(z AS UBIGINT) >> 31 AS HUGEINT) AS UBIGINT)) AS HUGEINT) AS UBIGINT) AS h FROM m3),
        |bits AS (
        |  SELECT tw.doc_id, g.b,
        |    sum(tw.w * (CASE WHEN (th.h >> CAST(g.b AS INT)) & 1 = 1 THEN 1 ELSE -1 END)) AS tally
        |  FROM tw JOIN th ON th.tok = tw.tok,
        |    LATERAL unnest(generate_series(0, 63)) AS g(b)
        |  GROUP BY tw.doc_id, g.b),
        |shu AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN tally > 0 THEN CAST(CAST(1 AS UBIGINT) << CAST(b AS INT) AS HUGEINT)
        |        ELSE CAST(0 AS HUGEINT) END) AS u
        |  FROM bits GROUP BY doc_id),
        |sh AS (
        |  SELECT d.doc_id,
        |    CAST(coalesce(CASE WHEN s.u >= 9223372036854775808
        |                       THEN s.u - 18446744073709551616 ELSE s.u END, 0) AS BIGINT) AS sh
        |  FROM documents d LEFT JOIN shu s ON s.doc_id = d.doc_id
        |  WHERE d.text IS NOT NULL)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sh, b.sh)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    "q_minhash_lsh" ->
      // full-sketch replay, same machinery: per-shingle FNV-1a base
      // (hashed once per GLOBALLY distinct shingle — the corpus is
      // template-heavy, a 10x saving), 64 per-function minima over
      // mix(base ^ mix(i)) taken over SIGNED two's-complement longs
      // (the kernel compares Scala Longs — an unsigned min diverges),
      // band candidates = equal 4-slot signature slices (equal slices
      // imply equal murmur buckets; a murmur COLLISION could only add
      // a pair the exact-Jaccard filter then keeps, ~2^-32/pair and
      // gate-checked — the q_embed_neardup argument), exact Jaccard
      // over distinct shingle STRINGS (== hashed-shingle Jaccard modulo
      // negligible collisions, the q_ngram_jaccard argument). The
      // jaccard >= 0.6 filter replays as the exact-rational inequality
      // 20000*ni >= 11999*nu (round4(r) >= 0.6 iff r >= 0.59995); est/
      // jaccard project as exact-rational HALF_UP basis points.
      s"""WITH docs AS (
        |  SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
        |  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
        |${minhashSigReplay("docs")},
        |bands AS (
        |  SELECT doc_id, b, sig[b*4+1 : b*4+4] AS bslice
        |  FROM sig, LATERAL unnest(generate_series(0, 15)) AS t(b)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM bands a JOIN bands b ON a.b = b.b AND a.bslice = b.bslice AND a.doc_id < b.doc_id),
        |nsh AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT c.id_a, c.id_b, count(*) AS n_inter
        |  FROM cand c JOIN sh a ON a.doc_id = c.id_a
        |  JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
        |  GROUP BY c.id_a, c.id_b),
        |jac AS (
        |  SELECT c.id_a, c.id_b, coalesce(i.n_inter, 0) AS ni,
        |    na.n + nb.n - coalesce(i.n_inter, 0) AS nu
        |  FROM cand c
        |  LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
        |  JOIN nsh na ON na.doc_id = c.id_a JOIN nsh nb ON nb.doc_id = c.id_b),
        |est AS (
        |  SELECT c.id_a, c.id_b,
        |    len(list_filter(list_zip(sa.sig, sb.sig), p -> p[1] = p[2])) AS n_match
        |  FROM cand c JOIN sig sa ON sa.doc_id = c.id_a JOIN sig sb ON sb.doc_id = c.id_b)
        |SELECT j.id_a, j.id_b,
        |  CAST((625 * e.n_match + 2) // 4 AS BIGINT) AS est_bp,
        |  CAST((20000 * j.ni + j.nu) // (2 * j.nu) AS BIGINT) AS jaccard_bp
        |FROM jac j JOIN est e ON e.id_a = j.id_a AND e.id_b = j.id_b
        |WHERE 20000 * j.ni >= 11999 * j.nu
        |ORDER BY j.id_a, j.id_b""".stripMargin,

    // the S-curve measurement: variant corpus + shared sketch replay +
    // slice-equality collisions per (bands, rows) + exact-Jaccard deciles
    "q_lsh_curve" -> lshCurveOracle,

    "q_lsh_recall" ->
      // the canary replays END-TO-END: the q_minhash_lsh signature/band/
      // exact-Jaccard machinery runs over the tracer-doubled corpus
      // (documents UNION copies at doc_id+1e7 for doc_id % 17 = 0), the
      // verified pair set is semi-joined against the known tracer pairs,
      // and the recall quotient is integer-exact — so the oracle derives
      // recall = 10000 the same way the engine does instead of assuming
      // it (identical text => identical signature => same bands), and a
      // capped bucket or sketch regression flips the gate on BOTH sides.
      s"""WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000000, text FROM documents
        |  WHERE doc_id % 17 = 0 AND trim(coalesce(text,'')) <> ''),
        |docs AS (
        |  SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
        |  FROM corpus WHERE text IS NOT NULL AND trim(text) <> ''),
        |${minhashSigReplay("docs")},
        |bands AS (
        |  SELECT doc_id, b, sig[b*4+1 : b*4+4] AS bslice
        |  FROM sig, LATERAL unnest(generate_series(0, 15)) AS t(b)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM bands a JOIN bands b ON a.b = b.b AND a.bslice = b.bslice AND a.doc_id < b.doc_id),
        |nsh AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT c.id_a, c.id_b, count(*) AS n_inter
        |  FROM cand c JOIN sh a ON a.doc_id = c.id_a
        |  JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
        |  GROUP BY c.id_a, c.id_b),
        |jac AS (
        |  SELECT c.id_a, c.id_b, coalesce(i.n_inter, 0) AS ni,
        |    na.n + nb.n - coalesce(i.n_inter, 0) AS nu
        |  FROM cand c
        |  LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
        |  JOIN nsh na ON na.doc_id = c.id_a JOIN nsh nb ON nb.doc_id = c.id_b),
        |pairs AS (
        |  SELECT j.id_a, j.id_b FROM jac j WHERE 20000 * j.ni >= 11999 * j.nu),
        |truth AS (
        |  SELECT doc_id AS lo, doc_id + 10000000 AS hi FROM documents
        |  WHERE doc_id % 17 = 0 AND text IS NOT NULL AND trim(text) <> ''),
        |hit AS (SELECT t.lo FROM truth t JOIN pairs p ON p.id_a = t.lo AND p.id_b = t.hi),
        |c AS (SELECT (SELECT count(*) FROM truth) AS nt, (SELECT count(*) FROM hit) AS nh)
        |SELECT CAST(nt AS BIGINT) AS n_truth_pairs, CAST(nh AS BIGINT) AS n_found,
        |  CAST(CASE WHEN nt = 0 THEN 10000 ELSE (10000 * nh) // nt END AS BIGINT) AS recall_bp
        |FROM c""".stripMargin,

    "q_decontaminate" ->
      // 8-token gram STRINGS vs the Spark side's rolling 64-bit gram
      // hashes; distinct-gram join semantics are identical
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents WHERE trim(text) <> ''),
        |grams AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(range(1, len(t) - 6),
        |      i -> array_to_string(t[i:i+7], ' ')))) AS g
        |  FROM toks WHERE len(t) >= 8)
        |SELECT c.doc_id AS corpus_id, b.doc_id AS bench_id,
        |  count(*) AS n_shared_grams
        |FROM grams c JOIN grams b ON c.g = b.g
        |WHERE c.doc_id % 50 <> 0 AND b.doc_id % 50 = 0
        |GROUP BY corpus_id, bench_id
        |ORDER BY corpus_id, bench_id""".stripMargin,

    "q_gram_novelty" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents WHERE trim(text) <> ''),
        |grams AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(range(1, len(t) - 6),
        |      i -> array_to_string(t[i:i+7], ' ')))) AS g
        |  FROM toks WHERE len(t) >= 8),
        |df AS (SELECT g, count(*) AS gram_df FROM grams GROUP BY g)
        |SELECT doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN gram_df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
        |FROM grams JOIN df USING (g)
        |GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "q_shared_passages_char" ->
      // the char-granular twin: DuckDB normalizes the same way the
      // kernel does (lowercase, whitespace runs → one space, trimmed)
      // and joins 40-char gram STRINGS vs the kernel's rolling hashes
      """WITH norm AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS s
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(range(1, len(s) - 38), i -> substr(s, i, 40)))) AS g
        |  FROM norm WHERE len(s) >= 40)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared_grams
        |FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
        |GROUP BY id_a, id_b
        |HAVING count(*) >= 2
        |ORDER BY id_a, id_b""".stripMargin,

    "q_shared_extents" ->
      // positional 8-token gram self-join + the SAME gaps-and-islands
      // merge (pos_a - row_number() constant within an aligned run),
      // written over gram strings and explicit positions
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents WHERE trim(text) <> ''),
        |pg AS (
        |  SELECT doc_id, unnest(range(1, len(t) - 6)) AS i, t
        |  FROM toks WHERE len(t) >= 8),
        |grams AS (
        |  SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+7], ' ') AS g FROM pg),
        |hits AS (
        |  SELECT a.doc_id AS id_a, a.pos AS pos_a, b.doc_id AS id_b, b.pos AS pos_b
        |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id),
        |runs AS (
        |  SELECT id_a, id_b, pos_b - pos_a AS delta, pos_a, pos_b,
        |    pos_a - row_number() OVER (PARTITION BY id_a, id_b, pos_b - pos_a
        |      ORDER BY pos_a) AS island
        |  FROM hits),
        |ext AS (
        |  SELECT id_a, id_b,
        |    CAST(min(pos_a) AS INTEGER) AS start_a,
        |    CAST(min(pos_b) AS INTEGER) AS start_b,
        |    CAST(max(pos_a) - min(pos_a) + 8 AS INTEGER) AS length
        |  FROM runs GROUP BY id_a, id_b, delta, island)
        |SELECT id_a, id_b, start_a, start_b, length
        |FROM ext WHERE length >= 10
        |ORDER BY id_a, id_b, start_a, start_b""".stripMargin,

    "q_shared_passages" ->
      // maxBucket = 1000 cannot bind at oracle scale (500 docs), so the
      // capped Spark output equals this uncapped self-join exactly
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents WHERE trim(text) <> ''),
        |grams AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(range(1, len(t) - 6),
        |      i -> array_to_string(t[i:i+7], ' ')))) AS g
        |  FROM toks WHERE len(t) >= 8)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared_grams
        |FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
        |GROUP BY id_a, id_b
        |HAVING count(*) >= 2
        |ORDER BY id_a, id_b""".stripMargin,

    "q_tfidf" ->
      // identical quantized-ratio scoring: tf·10⁴·N DIV df over BIGINTs —
      // no ln(), so both engines agree bit-for-bit
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM documents WHERE trim(text) <> ''),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents WHERE trim(text) <> ''),
        |scored AS (
        |  SELECT t.doc_id, t.term, t.tf, d.df,
        |    (t.tf * 10000 * n.n_docs) // d.df AS tfidf_q
        |  FROM tf t JOIN dfc d USING (term) CROSS JOIN n),
        |r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY tfidf_q DESC, term) AS rk
        |  FROM scored)
        |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
        |  CAST(tfidf_q AS BIGINT) AS tfidf_q, CAST(rk AS INTEGER) AS rank_in_group
        |FROM r WHERE rk <= 3
        |ORDER BY doc_id, rank_in_group""".stripMargin,

    "q_inverted_index" ->
      // 10·df ≤ 8·N is the integer form of df ≤ 0.8N (the Spark side's
      // n*8/10 band — equivalent for integer df)
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(string_split_regex(trim(text), '\s+'))) AS term
        |  FROM documents WHERE trim(text) <> ''),
        |dfc AS (SELECT term, count(*) AS df FROM toks GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents WHERE trim(text) <> ''),
        |banded AS (
        |  SELECT t.doc_id, t.term, d.df
        |  FROM toks t JOIN dfc d USING (term) CROSS JOIN n
        |  WHERE d.df >= 1 AND 10 * d.df <= 8 * n.n_docs)
        |SELECT term, CAST(df AS BIGINT) AS df,
        |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
        |FROM banded GROUP BY term, df
        |ORDER BY term""".stripMargin,

    "q_lexical_search" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM documents WHERE trim(text) <> ''),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks
        |  WHERE term IN ('spark', 'merge', 'vector', 'dup')
        |  GROUP BY 1, 2),
        |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents WHERE trim(text) <> ''),
        |sc AS (
        |  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_hit_terms,
        |    CAST(sum((t.tf * 10000 * n.n_docs) // d.df) AS BIGINT) AS score_q
        |  FROM tf t JOIN dfc d USING (term) CROSS JOIN n
        |  GROUP BY t.doc_id),
        |r AS (
        |  SELECT doc_id, n_hit_terms, score_q,
        |    row_number() OVER (ORDER BY score_q DESC, doc_id) AS rnk
        |  FROM sc)
        |SELECT doc_id, n_hit_terms, score_q, CAST(rnk AS INTEGER) AS "rank"
        |FROM r WHERE rnk <= 20
        |ORDER BY "rank"""".stripMargin,

    "q_langmix" ->
      // marker sets and CASE order mirror TextFunctions.LangMarkers (the
      // q_lang_id oracle's heuristic) applied per 25-token chunk
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents WHERE trim(text) <> ''),
        |nc AS (
        |  SELECT doc_id, tk,
        |    CASE WHEN len(tk) <= 25 THEN 1
        |         ELSE CAST(ceil((len(tk) - 25) / 25.0) AS INT) + 1 END AS n
        |  FROM toks),
        |ix AS (
        |  SELECT doc_id, tk, unnest(range(0, n)) AS chunk_idx FROM nc),
        |ch AS (
        |  SELECT doc_id, chunk_idx,
        |    tk[(chunk_idx*25+1):(chunk_idx*25+25)] AS c
        |  FROM ix),
        |hits AS (
        |  SELECT doc_id, chunk_idx,
        |    len(list_filter(c, x -> x IN ('the','a','and','of','is'))) AS h_en,
        |    len(list_filter(c, x -> x IN ('el','la','los','de','y'))) AS h_es,
        |    len(list_filter(c, x -> x IN ('der','die','das','und','ist'))) AS h_de,
        |    len(list_filter(c, x -> x IN ('le','la','les','et','est'))) AS h_fr
        |  FROM ch),
        |pred AS (
        |  SELECT doc_id, chunk_idx,
        |    CASE WHEN greatest(h_en, h_es, h_de, h_fr) = 0 THEN 'unknown'
        |      WHEN h_en = greatest(h_en, h_es, h_de, h_fr) THEN 'en'
        |      WHEN h_es = greatest(h_en, h_es, h_de, h_fr) THEN 'es'
        |      WHEN h_de = greatest(h_en, h_es, h_de, h_fr) THEN 'de'
        |      ELSE 'fr' END AS cl
        |  FROM hits),
        |lagged AS (
        |  SELECT doc_id, cl,
        |    lag(cl) OVER (PARTITION BY doc_id ORDER BY chunk_idx) AS prev
        |  FROM pred)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(CASE WHEN prev IS NOT NULL AND cl <> prev THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_switches,
        |  CAST(count(DISTINCT cl) AS BIGINT) AS n_langs
        |FROM lagged GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "q_dup_ngrams" ->
      // gram STRINGS + a per-gram count here vs the Spark side's sorted-
      // array run-length fold; Σc, Σ_{c>1}c and Σ_{c>1}c·len(g) agree
      // exactly (same join-with-spaces gram text both sides)
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents WHERE trim(text) <> ''),
        |grams AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
        |    i -> array_to_string(t[i:i+2], ' '))) AS g
        |  FROM toks WHERE len(t) >= 3),
        |c AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
        |  CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_occ,
        |  CAST(sum(CASE WHEN c > 1 THEN c * length(g) ELSE 0 END) AS BIGINT) AS dup_chars
        |FROM c GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin,

    "q_gopher_filter" ->
      // every flag is an exact integer comparison (ratios cross-multiplied)
      """WITH toks AS (
        |  SELECT doc_id, text,
        |    CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |      ELSE string_split_regex(trim(text), '\s+') END AS tk
        |  FROM documents),
        |base AS (
        |  SELECT doc_id,
        |    CAST(len(tk) AS BIGINT) AS n_words,
        |    CAST(coalesce(list_aggregate(list_apply(tk, t -> len(t)), 'sum'), 0)
        |      AS BIGINT) AS word_chars,
        |    CAST(len(list_filter(tk, t -> regexp_matches(t, '[A-Za-z]')))
        |      AS BIGINT) AS alpha_words,
        |    CAST(len(list_filter(tk, x -> x IN ('the','a','of','and','in','to','is')))
        |      AS BIGINT) AS stop_hits,
        |    CAST(length(text) - length(replace(text, '#', ''))
        |      + (length(text) - length(replace(text, '...', ''))) // 3
        |      AS BIGINT) AS sym_hits,
        |    CAST(length(text) AS BIGINT) AS n_chars
        |  FROM toks),
        |f AS (
        |  SELECT *,
        |    CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS f_words,
        |    CASE WHEN word_chars >= n_words * 3 AND word_chars <= n_words * 10
        |      THEN 1 ELSE 0 END AS f_mean_len,
        |    CASE WHEN alpha_words * 10 >= n_words * 8 THEN 1 ELSE 0 END AS f_alpha,
        |    CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END AS f_stop,
        |    CASE WHEN sym_hits * 10 <= n_chars THEN 1 ELSE 0 END AS f_sym
        |  FROM base)
        |SELECT doc_id, n_words, word_chars, alpha_words, stop_hits, sym_hits,
        |  CAST(f_words AS INTEGER) AS f_words,
        |  CAST(f_mean_len AS INTEGER) AS f_mean_len,
        |  CAST(f_alpha AS INTEGER) AS f_alpha,
        |  CAST(f_stop AS INTEGER) AS f_stop,
        |  CAST(f_sym AS INTEGER) AS f_sym,
        |  CAST(CASE WHEN f_words + f_mean_len + f_alpha + f_stop + f_sym = 5
        |    THEN 1 ELSE 0 END AS INTEGER) AS keep
        |FROM f
        |ORDER BY doc_id""".stripMargin,

    "q_hybrid_search" ->
      // both branches replay their own oracle-green formulations
      // (q_lexical_search / q_embed_cosine_topk) and fuse in integer
      // RRF; integer sums cast to BIGINT per SURVEY §6
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM documents WHERE trim(text) <> ''),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks
        |  WHERE term IN ('spark', 'merge', 'vector', 'dup') GROUP BY 1, 2),
        |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents WHERE trim(text) <> ''),
        |sc AS (
        |  SELECT t.doc_id, sum((t.tf * 10000 * n.n_docs) // d.df) AS score_q
        |  FROM tf t JOIN dfc d USING (term) CROSS JOIN n GROUP BY t.doc_id),
        |lex AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY score_q DESC, doc_id) AS rk
        |  FROM sc ORDER BY score_q DESC, doc_id LIMIT 20),
        |q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
        |pairs AS (
        |  SELECT e.vec_id,
        |    round(
        |      list_aggregate(list_apply(list_zip(q.q_emb, e.embedding),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
        |      / (sqrt(list_aggregate(list_apply(q.q_emb, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
        |         * sqrt(list_aggregate(list_apply(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))),
        |      4) AS cos_sim
        |  FROM embeddings e CROSS JOIN q
        |  WHERE e.vec_id <> 0),
        |dense AS (
        |  SELECT vec_id AS doc_id,
        |    row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rk
        |  FROM pairs ORDER BY cos_sim DESC, vec_id LIMIT 20),
        |u AS (SELECT doc_id, rk FROM lex UNION ALL SELECT doc_id, rk FROM dense),
        |f AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lists,
        |    CAST(sum(10000 // (60 + rk)) AS BIGINT) AS rrf_q
        |  FROM u GROUP BY doc_id),
        |r AS (
        |  SELECT doc_id, n_lists, rrf_q,
        |    row_number() OVER (ORDER BY rrf_q DESC, doc_id) AS rnk
        |  FROM f ORDER BY rrf_q DESC, doc_id LIMIT 10)
        |SELECT doc_id, n_lists, rrf_q, CAST(rnk AS INTEGER) AS "rank"
        |FROM r ORDER BY "rank"""".stripMargin,

    "q_bm25_search" ->
      // same cleared-denominator integers: DuckDB's intermediates go
      // HUGEINT, the final sum casts to BIGINT per §6
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM documents WHERE trim(text) <> ''),
        |tfall AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dl AS (SELECT doc_id, sum(tf) AS dl FROM tfall GROUP BY 1),
        |tot AS (SELECT sum(dl) AS t_tokens, count(*) AS n_docs FROM dl),
        |tf AS (SELECT * FROM tfall
        |  WHERE term IN ('spark', 'merge', 'vector', 'dup')),
        |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |sc AS (
        |  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_hit_terms,
        |    CAST(sum(
        |      ((2 * tot.n_docs - 2 * d.df + 1) * 1000 // (2 * d.df + 1)) *
        |      (22 * tot.t_tokens * t.tf * 10000 //
        |       (10 * tot.t_tokens * t.tf + 3 * tot.t_tokens
        |        + 9 * l.dl * tot.n_docs))
        |    ) AS BIGINT) AS score_q
        |  FROM tf t JOIN dfc d USING (term) JOIN dl l USING (doc_id)
        |  CROSS JOIN tot
        |  GROUP BY t.doc_id),
        |r AS (
        |  SELECT doc_id, n_hit_terms, score_q,
        |    row_number() OVER (ORDER BY score_q DESC, doc_id) AS rnk
        |  FROM sc ORDER BY score_q DESC, doc_id LIMIT 20)
        |SELECT doc_id, n_hit_terms, score_q, CAST(rnk AS INTEGER) AS "rank"
        |FROM r ORDER BY "rank"""".stripMargin,

    "q_ndcg" ->
      // same cleared-denominator BM25 integers as q_bm25_search; the
      // discount table is the identical pinned-literal list, indexed
      // 1-based on both engines
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM documents WHERE trim(text) <> ''),
        |tfall AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dl AS (SELECT doc_id, sum(tf) AS dl FROM tfall GROUP BY 1),
        |tot AS (SELECT sum(dl) AS t_tokens, count(*) AS n_docs FROM dl),
        |tf AS (SELECT * FROM tfall
        |  WHERE term IN ('spark', 'merge', 'vector', 'dup')),
        |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |sc AS (
        |  SELECT t.doc_id,
        |    CAST(sum(
        |      ((2 * tot.n_docs - 2 * d.df + 1) * 1000 // (2 * d.df + 1)) *
        |      (22 * tot.t_tokens * t.tf * 10000 //
        |       (10 * tot.t_tokens * t.tf + 3 * tot.t_tokens
        |        + 9 * l.dl * tot.n_docs))
        |    ) AS BIGINT) AS score_q
        |  FROM tf t JOIN dfc d USING (term) JOIN dl l USING (doc_id)
        |  CROSS JOIN tot
        |  GROUP BY t.doc_id),
        |ranked AS (
        |  SELECT doc_id, row_number() OVER (ORDER BY score_q DESC, doc_id) AS rnk
        |  FROM sc ORDER BY score_q DESC, doc_id LIMIT 10),
        |disc AS (
        |  SELECT * FROM (VALUES (1, 1000000), (2, 630929), (3, 500000),
        |    (4, 430676), (5, 386852), (6, 356207), (7, 333333),
        |    (8, 315464), (9, 301029), (10, 289064)) v(pos, d)),
        |rel AS (
        |  SELECT doc_id, least(sum(tf), 3) AS rel,
        |    CAST(2 ** least(sum(tf), 3) - 1 AS BIGINT) AS gain
        |  FROM tf GROUP BY doc_id),
        |dcg AS (
        |  SELECT CAST(sum(coalesce(rl.gain, 0) * dc.d) AS BIGINT) AS dcg_q
        |  FROM ranked r LEFT JOIN rel rl USING (doc_id)
        |  JOIN disc dc ON dc.pos = r.rnk),
        |ideal AS (
        |  SELECT CAST(sum(gain * dc.d) AS BIGINT) AS idcg_q FROM (
        |    SELECT gain, row_number() OVER (ORDER BY rel DESC, doc_id) AS pos
        |    FROM rel ORDER BY rel DESC, doc_id LIMIT 10) i
        |  JOIN disc dc ON dc.pos = i.pos),
        |nr AS (SELECT CAST(count(*) AS BIGINT) AS n_rel_docs FROM rel)
        |SELECT nr.n_rel_docs, dcg.dcg_q, ideal.idcg_q,
        |  CAST(dcg.dcg_q * 10000 // ideal.idcg_q AS BIGINT) AS ndcg_bp
        |FROM nr, dcg, ideal""".stripMargin,

    "q_span_dedup" ->
      // independent replay: window row_number picks the corpus-wide
      // winner per span text, string_agg reassembles in position order
      """WITH toks AS (
        |  SELECT doc_id, CASE WHEN trim(text) = '' THEN []
        |    ELSE string_split_regex(trim(text), '[ \t\n\r\f]+') END AS t
        |  FROM documents),
        |spans AS (
        |  SELECT doc_id, unnest(list_transform(
        |    range(0, CAST(ceil(len(t)/10.0) AS BIGINT)),
        |    i -> {'idx': i, 'span': array_to_string(t[(i*10+1):(i*10+10)], ' ')})) AS sp
        |  FROM toks),
        |flagged AS (
        |  SELECT doc_id, CAST(sp.idx AS BIGINT) AS idx, sp.span AS span,
        |    row_number() OVER (PARTITION BY sp.span ORDER BY doc_id, sp.idx) = 1 AS kept
        |  FROM spans),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_spans,
        |    CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |    coalesce(string_agg(CASE WHEN kept THEN span END, ' ' ORDER BY idx), '') AS clean_text
        |  FROM flagged GROUP BY doc_id)
        |SELECT d.doc_id, CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans,
        |  CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
        |  coalesce(a.clean_text, '') AS clean_text
        |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "q_decontaminate_bloom" ->
      // VERBATIM the q_decontaminate oracle: the bloom gate must not
      // change the answer, only the shuffle shape
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents WHERE trim(text) <> ''),
        |grams AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(range(1, len(t) - 6),
        |      i -> array_to_string(t[i:i+7], ' ')))) AS g
        |  FROM toks WHERE len(t) >= 8)
        |SELECT c.doc_id AS corpus_id, b.doc_id AS bench_id,
        |  count(*) AS n_shared_grams
        |FROM grams c JOIN grams b ON c.g = b.g
        |WHERE c.doc_id % 50 <> 0 AND b.doc_id % 50 = 0
        |GROUP BY corpus_id, bench_id
        |ORDER BY corpus_id, bench_id""".stripMargin,

    "q_dsir_weights" ->
      // hashed-unigram DSIR replay: portable md5-prefix buckets, add-one
      // smoothed log-ratio weights floor-quantized at 10^4, exact BIGINT
      // per-doc dot product (SURVEY §6: single ln per bucket, psi-family
      // floor rule)
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    unnest(string_split_regex(trim(text), '[ \t\n\r\f]+')) AS tk
        |  FROM documents WHERE trim(text) <> ''),
        |tb AS (SELECT doc_id, source,
        |    ('0x' || substr(md5(tk), 1, 6))::BIGINT % 64 AS b FROM toks),
        |cq AS (SELECT b, count(*) AS cq FROM tb GROUP BY b),
        |ct AS (SELECT b, count(*) AS ct FROM tb WHERE source = 'src0' GROUP BY b),
        |tot AS (SELECT CAST((SELECT count(*) FROM tb) AS BIGINT) AS nq,
        |               CAST((SELECT count(*) FROM tb WHERE source = 'src0') AS BIGINT) AS nt),
        |w AS (SELECT cq.b,
        |        CAST(floor(10000.0 * ln(
        |          CAST((coalesce(ct.ct, 0) + 1) * (tot.nq + 64) AS DOUBLE) /
        |          CAST((coalesce(cq.cq, 0) + 1) * (tot.nt + 64) AS DOUBLE)) + 0.5) AS BIGINT) AS w
        |      FROM cq LEFT JOIN ct ON cq.b = ct.b, tot),
        |dc AS (SELECT doc_id, b, count(*) AS c FROM tb GROUP BY doc_id, b)
        |SELECT dc.doc_id, CAST(sum(dc.c * w.w) AS BIGINT) AS dsir_score
        |FROM dc JOIN w ON dc.b = w.b
        |GROUP BY dc.doc_id ORDER BY dc.doc_id""".stripMargin,

    "q_anneal_schedule" ->
      // the DSIR oracle's training CTEs verbatim (prior-free evidence
      // scores), then the token timeline: portable-hash order, window
      // cumsum, exact integer 90% boundary, anneal tail kept only where
      // the trained log-ratio evidence is positive
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    unnest(string_split_regex(trim(text), '[ \t\n\r\f]+')) AS tk
        |  FROM documents WHERE trim(text) <> ''),
        |tb AS (SELECT doc_id, source,
        |    ('0x' || substr(md5(tk), 1, 6))::BIGINT % 64 AS b FROM toks),
        |cq AS (SELECT b, count(*) AS cq FROM tb GROUP BY b),
        |ct AS (SELECT b, count(*) AS ct FROM tb WHERE source = 'src0' GROUP BY b),
        |tot AS (SELECT CAST((SELECT count(*) FROM tb) AS BIGINT) AS nq,
        |               CAST((SELECT count(*) FROM tb WHERE source = 'src0') AS BIGINT) AS nt),
        |w AS (SELECT cq.b,
        |        CAST(floor(10000.0 * ln(
        |          CAST((coalesce(ct.ct, 0) + 1) * (tot.nq + 64) AS DOUBLE) /
        |          CAST((coalesce(cq.cq, 0) + 1) * (tot.nt + 64) AS DOUBLE)) + 0.5) AS BIGINT) AS w
        |      FROM cq LEFT JOIN ct ON cq.b = ct.b, tot),
        |dc AS (SELECT doc_id, b, count(*) AS c FROM tb GROUP BY doc_id, b),
        |ds AS (
        |  SELECT dc.doc_id, CAST(sum(dc.c * w.w) AS BIGINT) AS dsir_score
        |  FROM dc JOIN w ON dc.b = w.b GROUP BY dc.doc_id),
        |tk AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens
        |  FROM documents WHERE text IS NOT NULL),
        |base AS (
        |  SELECT t.doc_id, t.n_tokens, ds.dsir_score,
        |    ('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 12))::BIGINT AS h
        |  FROM tk t JOIN ds USING (doc_id) WHERE t.n_tokens > 0),
        |cum AS (
        |  SELECT *, coalesce(sum(n_tokens) OVER (ORDER BY h, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_offset
        |  FROM base),
        |ttl AS (SELECT (10000 - 1000) * max(tok_offset + n_tokens) // 10000 AS mainb FROM cum)
        |SELECT doc_id, n_tokens, dsir_score,
        |  CASE WHEN tok_offset < ttl.mainb THEN 'main' ELSE 'anneal' END AS phase,
        |  CAST(tok_offset AS BIGINT) AS tok_offset
        |FROM cum, ttl
        |WHERE tok_offset < ttl.mainb OR dsir_score > 0
        |ORDER BY doc_id""".stripMargin,

    "q_quality_classifier" ->
      // 2-class NB posterior replay: the DSIR bucket machinery with
      // (positive, negative) class models plus the quantized doc-count
      // prior — training (both class distributions, smoothing, ln
      // quantization) and scoring both recomputed in SQL
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    unnest(string_split_regex(trim(text), '[ \t\n\r\f]+')) AS tk
        |  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
        |tb AS (SELECT doc_id, source,
        |    ('0x' || substr(md5(tk), 1, 6))::BIGINT % 64 AS b FROM toks),
        |cp AS (SELECT b, count(*) AS cp FROM tb WHERE source = 'src0' GROUP BY b),
        |cn AS (SELECT b, count(*) AS cn FROM tb WHERE source <> 'src0' GROUP BY b),
        |tot AS (SELECT
        |    CAST((SELECT count(*) FROM tb WHERE source = 'src0') AS BIGINT) AS np,
        |    CAST((SELECT count(*) FROM tb WHERE source <> 'src0') AS BIGINT) AS nn),
        |dn AS (SELECT
        |    CAST((SELECT count(*) FROM documents
        |          WHERE text IS NOT NULL AND trim(text) <> '' AND source = 'src0') AS BIGINT) AS dp,
        |    CAST((SELECT count(*) FROM documents
        |          WHERE text IS NOT NULL AND trim(text) <> '' AND source <> 'src0') AS BIGINT) AS dnn),
        |prior AS (SELECT CAST(floor(10000.0 *
        |    ln(CAST(dp AS DOUBLE) / CAST(dnn AS DOUBLE)) + 0.5) AS BIGINT) AS p FROM dn),
        |allb AS (SELECT DISTINCT b FROM tb),
        |w AS (SELECT allb.b,
        |        CAST(floor(10000.0 * ln(
        |          CAST((coalesce(cp.cp, 0) + 1) * (tot.nn + 64) AS DOUBLE) /
        |          CAST((coalesce(cn.cn, 0) + 1) * (tot.np + 64) AS DOUBLE)) + 0.5) AS BIGINT) AS w
        |      FROM allb LEFT JOIN cp ON allb.b = cp.b
        |      LEFT JOIN cn ON allb.b = cn.b, tot),
        |dc AS (SELECT doc_id, b, count(*) AS c FROM tb GROUP BY doc_id, b)
        |SELECT dc.doc_id,
        |  CAST(sum(dc.c * w.w) + any_value(prior.p) AS BIGINT) AS nb_score,
        |  (CAST(sum(dc.c * w.w) + any_value(prior.p) AS BIGINT) > 0) AS is_quality
        |FROM dc JOIN w ON dc.b = w.b, prior
        |GROUP BY dc.doc_id ORDER BY dc.doc_id""".stripMargin,

    "q_bpe_train" ->
      // all 30 merge rounds as ONE recursive CTE. Word state = each
      // symbol wrapped TAB||sym||NL (symbols are whitespace-free, so
      // the wrap is unambiguous): a match of TAB l NL TAB r NL consumes
      // BOTH symbols whole and shares no character with the next
      // match, so plain replace() — left-to-right, non-overlapping —
      // is EXACTLY the trainer's greedy fold (adversarial runs like
      // "aaaa" verified). Best pair per round = min over the STRUCT
      // key (-count, l, r) — positional lexicographic == (count desc,
      // l asc, r asc) with NO delimiter encoding, so symbols that
      // contain control bytes (U+0000/U+0001) order identically to
      // the trainer's tuple orderBy
      """WITH RECURSIVE wc AS (
        |  SELECT word, count(*) AS cnt FROM (
        |    SELECT unnest(str_split_regex(trim(text), '[ \t\n\r\f]+')) AS word
        |    FROM documents WHERE text IS NOT NULL AND trim(text) <> '')
        |  GROUP BY word HAVING length(word) <= 200),
        |st(r, word, s, cnt, ml, mr, mn) AS (
        |  SELECT 0, word,
        |    chr(9) || array_to_string(
        |      list_transform(range(1, length(word) + 1), i -> substr(word, i, 1)),
        |      chr(10) || chr(9)) || chr(10) || chr(9) || '</w>' || chr(10),
        |    cnt, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT)
        |  FROM wc
        |  UNION ALL
        |  SELECT r + 1, word,
        |    replace(s, chr(9) || bl || chr(10) || chr(9) || br || chr(10),
        |               chr(9) || bl || br || chr(10)),
        |    cnt, bl, br, bn
        |  FROM (
        |    SELECT r, word, s, cnt,
        |      bw['l'] AS bl, bw['r'] AS br, CAST(-bw['mn'] AS BIGINT) AS bn
        |    FROM (
        |      SELECT r, word, s, cnt,
        |        min(CASE WHEN l IS NOT NULL THEN
        |              {'mn': -n, 'l': l, 'r': r2} END) OVER () AS bw
        |      FROM (
        |        SELECT word, r, s, cnt, l, r2,
        |          sum(CASE WHEN l IS NOT NULL THEN cnt END)
        |            OVER (PARTITION BY l, r2) AS n
        |        FROM (
        |          SELECT word, r, s, cnt,
        |            CASE WHEN i < len THEN syms[CAST(i AS INTEGER)] END AS l,
        |            CASE WHEN i < len THEN syms[CAST(i AS INTEGER) + 1] END AS r2
        |          FROM (
        |            SELECT word, r, s, cnt, syms, len(syms) AS len,
        |              unnest(range(1, greatest(len(syms), 2))) AS i
        |            FROM (
        |              SELECT word, r, s, cnt,
        |                list_transform(
        |                  str_split(rtrim(s, chr(10)), chr(10)),
        |                  x -> ltrim(x, chr(9))) AS syms
        |              FROM st WHERE r < 30))))
        |    ) QUALIFY row_number() OVER (PARTITION BY word) = 1
        |  ) WHERE bn >= 2
        |)
        |SELECT DISTINCT CAST(r AS INTEGER) AS rank, ml AS "left",
        |  mr AS "right", CAST(mn AS BIGINT) AS pair_count
        |FROM st WHERE r >= 1 ORDER BY rank""".stripMargin,


    "q_bpe_fertility" ->
      // the bpe-encode oracle's CTEs through the final per-word symbol
      // state, then words joined with language and rolled up to the
      // per-lang fertility (basis points, exact BIGINT floor division)
      """WITH RECURSIVE wc AS (
        |  SELECT word, count(*) AS cnt FROM (
        |    SELECT unnest(str_split_regex(trim(text), '[ \t\n\r\f]+')) AS word
        |    FROM documents WHERE text IS NOT NULL AND trim(text) <> '')
        |  GROUP BY word HAVING length(word) <= 200),
        |st(r, word, s, cnt, ml, mr, mn) AS (
        |  SELECT 0, word,
        |    chr(9) || array_to_string(
        |      list_transform(range(1, length(word) + 1), i -> substr(word, i, 1)),
        |      chr(10) || chr(9)) || chr(10) || chr(9) || '</w>' || chr(10),
        |    cnt, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT)
        |  FROM wc
        |  UNION ALL
        |  SELECT r + 1, word,
        |    replace(s, chr(9) || bl || chr(10) || chr(9) || br || chr(10),
        |               chr(9) || bl || br || chr(10)),
        |    cnt, bl, br, bn
        |  FROM (
        |    SELECT r, word, s, cnt,
        |      bw['l'] AS bl, bw['r'] AS br, CAST(-bw['mn'] AS BIGINT) AS bn
        |    FROM (
        |      SELECT r, word, s, cnt,
        |        min(CASE WHEN l IS NOT NULL THEN
        |              {'mn': -n, 'l': l, 'r': r2} END) OVER () AS bw
        |      FROM (
        |        SELECT word, r, s, cnt, l, r2,
        |          sum(CASE WHEN l IS NOT NULL THEN cnt END)
        |            OVER (PARTITION BY l, r2) AS n
        |        FROM (
        |          SELECT word, r, s, cnt,
        |            CASE WHEN i < len THEN syms[CAST(i AS INTEGER)] END AS l,
        |            CASE WHEN i < len THEN syms[CAST(i AS INTEGER) + 1] END AS r2
        |          FROM (
        |            SELECT word, r, s, cnt, syms, len(syms) AS len,
        |              unnest(range(1, greatest(len(syms), 2))) AS i
        |            FROM (
        |              SELECT word, r, s, cnt,
        |                list_transform(
        |                  str_split(rtrim(s, chr(10)), chr(10)),
        |                  x -> ltrim(x, chr(9))) AS syms
        |              FROM st WHERE r < 30))))
        |    ) QUALIFY row_number() OVER (PARTITION BY word) = 1
        |  ) WHERE bn >= 2
        |),
        |fin AS (
        |  SELECT word, s FROM st
        |  QUALIFY row_number() OVER (PARTITION BY word ORDER BY r DESC) = 1),
        |wsym AS (
        |  SELECT word,
        |    CAST(len(s) - len(replace(s, chr(9), '')) AS BIGINT) AS nsym
        |  FROM fin),
        |dw AS (
        |  SELECT doc_id, lang,
        |    unnest(str_split_regex(trim(text), '[ \t\n\r\f]+')) AS word
        |  FROM documents WHERE text IS NOT NULL AND trim(text) <> '')
        |SELECT dw.lang, CAST(count(*) AS BIGINT) AS n_words,
        |  CAST(sum(w.nsym) AS BIGINT) AS n_subwords,
        |  CAST((10000 * sum(w.nsym)) // count(*) AS BIGINT) AS fertility_bp
        |FROM dw JOIN wsym w USING (word)
        |GROUP BY dw.lang ORDER BY dw.lang""".stripMargin,

    "q_bpe_encode" ->
      // the training CTE verbatim through the 30 rounds, then the FINAL
      // per-word symbol state (max r per word) gives each word's subword
      // count as its TAB count; doc words join to it (every corpus word
      // is in the trained table here: trained on the same docs,
      // minWordCount=1, length cap far above the data's max word)
      """WITH RECURSIVE wc AS (
        |  SELECT word, count(*) AS cnt FROM (
        |    SELECT unnest(str_split_regex(trim(text), '[ \t\n\r\f]+')) AS word
        |    FROM documents WHERE text IS NOT NULL AND trim(text) <> '')
        |  GROUP BY word HAVING length(word) <= 200),
        |st(r, word, s, cnt, ml, mr, mn) AS (
        |  SELECT 0, word,
        |    chr(9) || array_to_string(
        |      list_transform(range(1, length(word) + 1), i -> substr(word, i, 1)),
        |      chr(10) || chr(9)) || chr(10) || chr(9) || '</w>' || chr(10),
        |    cnt, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT)
        |  FROM wc
        |  UNION ALL
        |  SELECT r + 1, word,
        |    replace(s, chr(9) || bl || chr(10) || chr(9) || br || chr(10),
        |               chr(9) || bl || br || chr(10)),
        |    cnt, bl, br, bn
        |  FROM (
        |    SELECT r, word, s, cnt,
        |      bw['l'] AS bl, bw['r'] AS br, CAST(-bw['mn'] AS BIGINT) AS bn
        |    FROM (
        |      SELECT r, word, s, cnt,
        |        min(CASE WHEN l IS NOT NULL THEN
        |              {'mn': -n, 'l': l, 'r': r2} END) OVER () AS bw
        |      FROM (
        |        SELECT word, r, s, cnt, l, r2,
        |          sum(CASE WHEN l IS NOT NULL THEN cnt END)
        |            OVER (PARTITION BY l, r2) AS n
        |        FROM (
        |          SELECT word, r, s, cnt,
        |            CASE WHEN i < len THEN syms[CAST(i AS INTEGER)] END AS l,
        |            CASE WHEN i < len THEN syms[CAST(i AS INTEGER) + 1] END AS r2
        |          FROM (
        |            SELECT word, r, s, cnt, syms, len(syms) AS len,
        |              unnest(range(1, greatest(len(syms), 2))) AS i
        |            FROM (
        |              SELECT word, r, s, cnt,
        |                list_transform(
        |                  str_split(rtrim(s, chr(10)), chr(10)),
        |                  x -> ltrim(x, chr(9))) AS syms
        |              FROM st WHERE r < 30))))
        |    ) QUALIFY row_number() OVER (PARTITION BY word) = 1
        |  ) WHERE bn >= 2
        |),
        |fin AS (
        |  SELECT word, s FROM st
        |  QUALIFY row_number() OVER (PARTITION BY word ORDER BY r DESC) = 1),
        |wsym AS (
        |  SELECT word,
        |    CAST(len(s) - len(replace(s, chr(9), '')) AS BIGINT) AS nsym
        |  FROM fin),
        |dw AS (
        |  SELECT doc_id,
        |    unnest(str_split_regex(trim(text), '[ \t\n\r\f]+')) AS word
        |  FROM documents WHERE text IS NOT NULL AND trim(text) <> '')
        |SELECT dw.doc_id, CAST(sum(w.nsym) AS BIGINT) AS n_subwords
        |FROM dw JOIN wsym w USING (word)
        |GROUP BY dw.doc_id ORDER BY dw.doc_id""".stripMargin,

    "q_wordpiece_train" ->
      // WordPiece merge replay (see wpReplaySql): all 30 rounds in one
      // recursive CTE; the likelihood-ratio argmax uses a 2^100-scaled
      // HUGEINT floor key whose agreement with the trainer's exact
      // rational order is GATED on the data (bound_gate), not assumed
      s"""WITH RECURSIVE $wpReplaySql
        |SELECT DISTINCT CAST(r AS INTEGER) AS rank, ml AS "left",
        |  mr AS "right", CAST(mn AS BIGINT) AS pair_count,
        |  CAST(mnl AS BIGINT) AS left_count, CAST(mnr AS BIGINT) AS right_count
        |FROM st, bound_gate
        |WHERE r >= 1 AND bound_gate.bad = 0 ORDER BY rank""".stripMargin,

    "q_wordpiece_encode" ->
      // the replay CTE through the 30 rounds gives the VOCABULARY
      // (initial alphabet + each merge's output); encode is then
      // BERT's maximal munch as a SECOND recursive CTE — per distinct
      // word, longest vocab match at each position (##-prefixed after
      // the word start), whole-word UNK when nothing matches
      s"""WITH RECURSIVE $wpReplaySql,
        |$wpEncodeSql,
        |dw AS (
        |  SELECT doc_id,
        |    unnest(str_split_regex(trim(text), '[ \t\n\r\f]+')) AS word
        |  FROM documents WHERE text IS NOT NULL AND trim(text) <> '')
        |SELECT dw.doc_id, CAST(sum(w.n_toks) AS BIGINT) AS n_subwords,
        |  CAST(sum(CASE WHEN w.is_unk THEN 1 ELSE 0 END) AS BIGINT) AS n_unk
        |FROM dw JOIN wtok w USING (word), bound_gate
        |WHERE bound_gate.bad = 0
        |GROUP BY dw.doc_id ORDER BY dw.doc_id""".stripMargin,

    "q_wordpiece_fertility" ->
      // the same gated maximal-munch walk rolled up per language —
      // the third row of the published BPE/unigram/WordPiece
      // fertility comparison, exact basis points
      s"""WITH RECURSIVE $wpReplaySql,
        |$wpEncodeSql,
        |dw AS (
        |  SELECT doc_id, lang,
        |    unnest(str_split_regex(trim(text), '[ \t\n\r\f]+')) AS word
        |  FROM documents WHERE text IS NOT NULL AND trim(text) <> '')
        |SELECT dw.lang, CAST(count(*) AS BIGINT) AS n_words,
        |  CAST(sum(w.n_toks) AS BIGINT) AS n_subwords,
        |  CAST((10000 * sum(w.n_toks)) // count(*) AS BIGINT) AS fertility_bp
        |FROM dw JOIN wtok w USING (word), bound_gate
        |WHERE bound_gate.bad = 0
        |GROUP BY dw.lang ORDER BY dw.lang""".stripMargin,

    "q_doc_fingerprint" ->
      // polynomial rolling hash in closed form: h = seed·31^n +
      // Σ bᵢ·31^(n-1-i) (mod 2^64). Every term is exact in HUGEINT
      // (|term| < 2^72, sum < 2^83, seed term < 2^114 — all inside
      // the 127-bit range), the single mod comes last, and the final
      // value converts to the JVM's two's-complement signed long.
      // Bytes come from hex(encode(text)) with the >127 → −256 signed
      // cast (Java bytes are signed), so multi-byte UTF-8 would
      // replay correctly too — not just this ASCII corpus
      """WITH RECURSIVE mx AS (
        |  SELECT max(octet_length(encode(text))) AS n FROM documents),
        |pw(k, v) AS (
        |  SELECT 0, CAST(1 AS HUGEINT)
        |  UNION ALL
        |  SELECT k + 1, (v * 31) % 18446744073709551616
        |  FROM pw, mx WHERE k < mx.n),
        |hx AS (
        |  SELECT doc_id, hex(encode(text)) AS h,
        |    octet_length(encode(text)) AS n
        |  FROM documents),
        |bytes AS (
        |  SELECT doc_id, n, i,
        |    CASE WHEN b > 127 THEN b - 256 ELSE b END AS sb
        |  FROM (
        |    SELECT doc_id, n, i,
        |      (strpos('0123456789ABCDEF', substr(h, 2*i - 1, 1)) - 1) * 16
        |        + strpos('0123456789ABCDEF', substr(h, 2*i, 1)) - 1 AS b
        |    FROM hx, LATERAL unnest(generate_series(1, CAST(n AS BIGINT))) AS t(i))),
        |seed AS (
        |  SELECT x.doc_id,
        |    (CAST(1125899906842597 AS HUGEINT) * p.v)
        |      % 18446744073709551616 AS seedterm
        |  FROM hx x JOIN pw p ON p.k = x.n),
        |acc AS (
        |  SELECT b.doc_id, sum(CAST(b.sb AS HUGEINT) * p.v) AS bsum
        |  FROM bytes b JOIN pw p ON p.k = b.n - b.i
        |  GROUP BY b.doc_id),
        |fin AS (
        |  SELECT s.doc_id,
        |    ((s.seedterm + coalesce(a.bsum, 0)) % 18446744073709551616
        |      + 18446744073709551616) % 18446744073709551616 AS u
        |  FROM seed s LEFT JOIN acc a ON a.doc_id = s.doc_id)
        |-- driven from documents so a NULL-text doc (encode(NULL) → no hx
        |-- row) still surfaces as (doc_id, NULL fp), matching the Spark side
        |SELECT d.doc_id,
        |  CAST(CASE WHEN f.u IS NULL THEN NULL
        |       WHEN f.u >= 9223372036854775808
        |       THEN f.u - 18446744073709551616 ELSE f.u END AS BIGINT) AS fp
        |FROM documents d LEFT JOIN fin f ON f.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "q_mmr_rerank" ->
      // the greedy replayed one selection per recursion round: each
      // round a single cross-joined LIMIT-1 subquery picks the argmax
      // of the EXACT-INTEGER objective 7000·(10000//(60+rank)) −
      // 3000·maxsim_bp with the (score desc, rank asc, id asc)
      // tie-break, the winner freezes with its rank, and every
      // remaining candidate folds the floored-cosine-bp similarity to
      // the winner into its running max. maxsim seeds at a deep
      // negative sentinel (cosines can be negative — a diversity
      // REWARD, not a clamp-at-zero) and round one pins the penalty
      // to 0 exactly as the operator's selected-empty branch does
      """WITH RECURSIVE q0 AS (
        |  SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |scored AS (
        |  SELECT e.vec_id AS id, e.embedding AS vec,
        |    round(list_aggregate(list_apply(list_zip(q.qe, e.embedding),
        |       x -> CAST(x[1] AS DOUBLE)*CAST(x[2] AS DOUBLE)),'sum')
        |     / (sqrt(list_aggregate(list_apply(q.qe,
        |          x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)),'sum'))
        |      * sqrt(list_aggregate(list_apply(e.embedding,
        |          x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)),'sum'))), 4) AS cs
        |  FROM embeddings e CROSS JOIN q0 q WHERE e.vec_id <> 0),
        |cands AS (
        |  SELECT id, CAST(row_number() OVER (ORDER BY cs DESC, id) AS BIGINT) AS rank, vec
        |  FROM scored QUALIFY row_number() OVER (ORDER BY cs DESC, id) <= 40),
        |st(step, id, rank, vec, msim, selstep, selscore) AS (
        |  SELECT 0, id, rank, vec, CAST(-4611686018427387904 AS BIGINT),
        |    CAST(NULL AS BIGINT), CAST(NULL AS BIGINT) FROM cands
        |  UNION ALL
        |  SELECT s.step + 1, s.id, s.rank, s.vec,
        |    CASE WHEN s.selstep IS NOT NULL OR s.id = w.wid THEN s.msim
        |         ELSE greatest(s.msim, CASE
        |           WHEN list_aggregate(list_apply(s.vec,
        |                  x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)),'sum') = 0
        |             OR list_aggregate(list_apply(w.wvec,
        |                  x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)),'sum') = 0
        |           THEN 0
        |           ELSE CAST(floor(
        |             list_aggregate(list_apply(list_zip(s.vec, w.wvec),
        |               x -> CAST(x[1] AS DOUBLE)*CAST(x[2] AS DOUBLE)),'sum')
        |             / sqrt(list_aggregate(list_apply(s.vec,
        |                  x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)),'sum')
        |                  * list_aggregate(list_apply(w.wvec,
        |                  x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)),'sum'))
        |             * 10000.0 + 0.5) AS BIGINT) END) END,
        |    CASE WHEN s.id = w.wid AND s.selstep IS NULL
        |         THEN s.step + 1 ELSE s.selstep END,
        |    CASE WHEN s.id = w.wid AND s.selstep IS NULL
        |         THEN w.wscore ELSE s.selscore END
        |  FROM st s CROSS JOIN (
        |    SELECT id AS wid, vec AS wvec,
        |      7000*(10000//(60+rank))
        |        - 3000*(CASE WHEN step = 0 THEN 0 ELSE msim END) AS wscore
        |    FROM st WHERE selstep IS NULL
        |    ORDER BY wscore DESC, rank, id LIMIT 1) w
        |  WHERE s.step < 10)
        |SELECT id AS id, CAST(selstep AS BIGINT) AS mmr_rank,
        |  rank AS rel_rank, selscore AS mmr_q
        |FROM st WHERE selstep IS NOT NULL
        |QUALIFY row_number() OVER (PARTITION BY id ORDER BY step DESC) = 1
        |ORDER BY mmr_rank""".stripMargin,

    "q_boilerplate" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '[ \t\n\r\f]+') AS t
        |  FROM documents WHERE trim(text) <> ''),
        |spans AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(range(1, len(t) - 3),
        |      i -> array_to_string(t[i:i+4], ' ')))) AS span
        |  FROM toks WHERE len(t) >= 5)
        |SELECT span, count(*) AS df
        |FROM spans GROUP BY span
        |ORDER BY df DESC, span ASC LIMIT 20""".stripMargin,

    "q_dataset_card" ->
      """WITH base AS (
        |  SELECT count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |    CAST(sum(CASE WHEN trim(text) = '' THEN 0
        |      ELSE len(string_split_regex(trim(text), '[ \t\n\r\f]+')) END) AS BIGINT) AS total_tokens,
        |    CAST(min(n_chars) AS BIGINT) AS min_chars,
        |    CAST(max(n_chars) AS BIGINT) AS max_chars
        |  FROM documents),
        |cards AS (
        |  SELECT count(DISTINCT source) AS n_sources,
        |    count(DISTINCT lang) AS n_langs FROM documents),
        |uniq AS (
        |  SELECT count(*) AS n_unique FROM (
        |    SELECT DISTINCT trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) FROM documents))
        |SELECT n_docs, total_chars, total_tokens, min_chars, max_chars,
        |  n_sources, n_langs, n_unique,
        |  10000 - (n_unique * 10000) // n_docs AS dup_bp
        |FROM base, cards, uniq""".stripMargin,

    "q_dedup_keep_best" ->
      """WITH g AS (
        |  SELECT doc_id, n_chars,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |      ' +', ' ', 'g')) AS norm
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, n_chars,
        |    count(*) OVER (PARTITION BY norm) AS n_copies,
        |    row_number() OVER (PARTITION BY norm ORDER BY n_chars DESC, doc_id ASC) AS rn
        |  FROM g)
        |SELECT doc_id, n_chars, CAST(n_copies AS BIGINT) AS n_copies
        |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "q_source_overlap" ->
      // same uncapped gram self-join as the q_shared_passages oracle,
      // rolled up to (source, source) cells with least/greatest
      // canonicalization
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents WHERE trim(text) <> ''),
        |grams AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    list_transform(range(1, len(t) - 6),
        |      i -> array_to_string(t[i:i+7], ' ')))) AS g
        |  FROM toks WHERE len(t) >= 8),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ns
        |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |s AS (
        |  SELECT least(da.source, db.source) AS source_x,
        |    greatest(da.source, db.source) AS source_y, p.ns
        |  FROM p JOIN documents da ON p.id_a = da.doc_id
        |         JOIN documents db ON p.id_b = db.doc_id)
        |SELECT source_x, source_y, count(*) AS n_pairs,
        |  CAST(sum(ns) AS BIGINT) AS n_shared_grams
        |FROM s GROUP BY 1, 2 ORDER BY source_x, source_y""".stripMargin,

    "q_winsorize" ->
      // unconditional row_number with NULLS LAST is equivalent to the
      // Spark side's non-null-gated rank: nulls sort past every real
      // row, so they can never occupy a cut rank (cut rank <= n)
      """WITH r AS (
        |  SELECT event_id, event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value NULLS LAST) AS rn,
        |    count(value) OVER (PARTITION BY event_type) AS n
        |  FROM events),
        |c AS (
        |  SELECT *,
        |    max(CASE WHEN rn = greatest((n * 500 + 9999) // 10000, 1) THEN value END)
        |      OVER (PARTITION BY event_type) AS lo,
        |    max(CASE WHEN rn = greatest((n * 9500 + 9999) // 10000, 1) THEN value END)
        |      OVER (PARTITION BY event_type) AS hi
        |  FROM r)
        |SELECT event_id, event_type, value,
        |  CASE WHEN value IS NULL THEN NULL
        |       ELSE least(greatest(value, lo), hi) END AS value_w,
        |  value IS NOT NULL AND value < lo AS clamped_lo,
        |  value IS NOT NULL AND value > hi AS clamped_hi
        |FROM c ORDER BY event_id""".stripMargin,

    "q_impute_median" ->
      """WITH e AS (
        |  SELECT event_id, event_type,
        |    CASE WHEN event_id % 13 = 0 THEN NULL ELSE value END AS value
        |  FROM events),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value NULLS LAST) AS rn,
        |    count(value) OVER (PARTITION BY event_type) AS n
        |  FROM e),
        |m AS (
        |  SELECT *,
        |    max(CASE WHEN rn = (n + 1) // 2 THEN value END)
        |      OVER (PARTITION BY event_type) AS med
        |  FROM r)
        |SELECT event_id, event_type, value,
        |  coalesce(value, med) AS value_f,
        |  value IS NULL AND med IS NOT NULL AS imputed
        |FROM m ORDER BY event_id""".stripMargin,

    "q_bigram_logloss" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '[ \t\n\r\f]+') AS t
        |  FROM documents WHERE trim(text) <> ''),
        |tf AS (
        |  SELECT doc_id, p.w1 AS w1, p.w2 AS w2, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(list_transform(range(1, len(t)),
        |          i -> {'w1': t[i], 'w2': t[i+1]})) AS p
        |        FROM toks WHERE len(t) >= 2) q
        |  GROUP BY 1, 2, 3),
        |c12 AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS c12 FROM tf GROUP BY 1, 2),
        |ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1, count(*) AS s1
        |        FROM c12 GROUP BY 1),
        |l AS (SELECT c12.w1, c12.w2,
        |        CAST(floor(10000.0 * ln(
        |          CAST(ctx.c1 + ctx.s1 AS DOUBLE) / CAST(c12.c12 + 1 AS DOUBLE)) + 0.5) AS BIGINT) AS l
        |      FROM c12 JOIN ctx ON c12.w1 = ctx.w1)
        |SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_bigrams,
        |  CAST(sum(tf.tf * l.l) AS BIGINT) AS surprisal2_q,
        |  CAST(sum(tf.tf * l.l) AS BIGINT) // CAST(sum(tf.tf) AS BIGINT) AS mean_surprisal2_q
        |FROM tf JOIN l ON tf.w1 = l.w1 AND tf.w2 = l.w2
        |GROUP BY tf.doc_id ORDER BY tf.doc_id""".stripMargin,

    "q_kneser_ney" ->
      // interpolated KN replayed verbatim: all five smoothing statistics
      // are grouped counts over the distinct-trigram table; the D=0.75
      // discount chain is written in the SAME operation order as the
      // Spark expression (IEEE +,·,÷,greatest are correctly rounded both
      // engines); one ln per distinct trigram at the 10^4 floor grain.
      // The CTE chain through `l` is shared verbatim with
      // q_ccnet_buckets (knCtesSql) — keep them in lockstep
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '[ \t\n\r\f]+') AS t
        |  FROM documents WHERE trim(text) <> ''),
        |tf AS (
        |  SELECT doc_id, g.w1 AS w1, g.w2 AS w2, g.w3 AS w3, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
        |          i -> {'w1': t[i], 'w2': t[i+1], 'w3': t[i+2]})) AS g
        |        FROM toks WHERE len(t) >= 3) q
        |  GROUP BY 1, 2, 3, 4),
        |c3 AS (SELECT w1, w2, w3, CAST(sum(tf) AS BIGINT) AS c3 FROM tf GROUP BY 1, 2, 3),
        |c12 AS (SELECT w1, w2, CAST(sum(c3) AS BIGINT) AS c12, count(*) AS n12dot
        |        FROM c3 GROUP BY 1, 2),
        |cont23 AS (SELECT w2, w3, count(*) AS n23 FROM c3 GROUP BY 1, 2),
        |mid AS (SELECT w2, count(*) AS nmid FROM c3 GROUP BY 1),
        |w2dot AS (SELECT w2, count(*) AS nw2dot FROM cont23 GROUP BY 1),
        |cont3 AS (SELECT w3, count(*) AS n3 FROM cont23 GROUP BY 1),
        |nall AS (SELECT count(*) AS nall FROM cont23),
        |l AS (
        |  SELECT c3.w1, c3.w2, c3.w3,
        |    CAST(floor(-10000.0 * ln(
        |      (greatest(CAST(c3.c3 AS DOUBLE) - 0.75, 0.0)
        |        + 0.75 * CAST(c12.n12dot AS DOUBLE) *
        |          ((greatest(CAST(cont23.n23 AS DOUBLE) - 0.75, 0.0)
        |            + 0.75 * CAST(w2dot.nw2dot AS DOUBLE) *
        |              (CAST(cont3.n3 AS DOUBLE) / CAST(nall.nall AS DOUBLE)))
        |           / CAST(mid.nmid AS DOUBLE)))
        |      / CAST(c12.c12 AS DOUBLE)) + 0.5) AS BIGINT) AS l
        |  FROM c3 JOIN c12 ON c3.w1 = c12.w1 AND c3.w2 = c12.w2
        |  JOIN cont23 ON c3.w2 = cont23.w2 AND c3.w3 = cont23.w3
        |  JOIN mid ON c3.w2 = mid.w2
        |  JOIN w2dot ON c3.w2 = w2dot.w2
        |  JOIN cont3 ON c3.w3 = cont3.w3
        |  CROSS JOIN nall)
        |SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_trigrams,
        |  CAST(sum(tf.tf * l.l) AS BIGINT) AS surprisal3_q,
        |  CAST(sum(tf.tf * l.l) AS BIGINT) // CAST(sum(tf.tf) AS BIGINT) AS mean_surprisal3_q
        |FROM tf JOIN l ON tf.w1 = l.w1 AND tf.w2 = l.w2 AND tf.w3 = l.w3
        |GROUP BY tf.doc_id ORDER BY tf.doc_id""".stripMargin,

    "q_ccnet_buckets" ->
      // the q_kneser_ney CTE chain verbatim (toks → l → the per-doc
      // aggregate), then CCNet's head/middle/tail split: per-language
      // EXACT tercile ranks over (mean surprisal asc, doc_id) — the
      // oracle can afford the per-lang window; the Spark side runs the
      // ranged two-pass rank machine instead — and the summary rollup
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '[ \t\n\r\f]+') AS t
        |  FROM documents WHERE trim(text) <> ''),
        |tf AS (
        |  SELECT doc_id, g.w1 AS w1, g.w2 AS w2, g.w3 AS w3, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
        |          i -> {'w1': t[i], 'w2': t[i+1], 'w3': t[i+2]})) AS g
        |        FROM toks WHERE len(t) >= 3) q
        |  GROUP BY 1, 2, 3, 4),
        |c3 AS (SELECT w1, w2, w3, CAST(sum(tf) AS BIGINT) AS c3 FROM tf GROUP BY 1, 2, 3),
        |c12 AS (SELECT w1, w2, CAST(sum(c3) AS BIGINT) AS c12, count(*) AS n12dot
        |        FROM c3 GROUP BY 1, 2),
        |cont23 AS (SELECT w2, w3, count(*) AS n23 FROM c3 GROUP BY 1, 2),
        |mid AS (SELECT w2, count(*) AS nmid FROM c3 GROUP BY 1),
        |w2dot AS (SELECT w2, count(*) AS nw2dot FROM cont23 GROUP BY 1),
        |cont3 AS (SELECT w3, count(*) AS n3 FROM cont23 GROUP BY 1),
        |nall AS (SELECT count(*) AS nall FROM cont23),
        |l AS (
        |  SELECT c3.w1, c3.w2, c3.w3,
        |    CAST(floor(-10000.0 * ln(
        |      (greatest(CAST(c3.c3 AS DOUBLE) - 0.75, 0.0)
        |        + 0.75 * CAST(c12.n12dot AS DOUBLE) *
        |          ((greatest(CAST(cont23.n23 AS DOUBLE) - 0.75, 0.0)
        |            + 0.75 * CAST(w2dot.nw2dot AS DOUBLE) *
        |              (CAST(cont3.n3 AS DOUBLE) / CAST(nall.nall AS DOUBLE)))
        |           / CAST(mid.nmid AS DOUBLE)))
        |      / CAST(c12.c12 AS DOUBLE)) + 0.5) AS BIGINT) AS l
        |  FROM c3 JOIN c12 ON c3.w1 = c12.w1 AND c3.w2 = c12.w2
        |  JOIN cont23 ON c3.w2 = cont23.w2 AND c3.w3 = cont23.w3
        |  JOIN mid ON c3.w2 = mid.w2
        |  JOIN w2dot ON c3.w2 = w2dot.w2
        |  JOIN cont3 ON c3.w3 = cont3.w3
        |  CROSS JOIN nall),
        |kn AS (
        |  SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_trigrams,
        |    CAST(sum(tf.tf * l.l) AS BIGINT) // CAST(sum(tf.tf) AS BIGINT) AS msq
        |  FROM tf JOIN l ON tf.w1 = l.w1 AND tf.w2 = l.w2 AND tf.w3 = l.w3
        |  GROUP BY tf.doc_id),
        |r AS (
        |  SELECT d.lang, kn.doc_id, kn.n_trigrams, kn.msq,
        |    row_number() OVER (PARTITION BY d.lang ORDER BY kn.msq, kn.doc_id) AS rk,
        |    count(*) OVER (PARTITION BY d.lang) AS n
        |  FROM kn JOIN documents d USING (doc_id))
        |SELECT lang,
        |  CASE WHEN rk * 3 <= n THEN 'head'
        |       WHEN rk * 3 <= 2 * n THEN 'middle'
        |       ELSE 'tail' END AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_trigrams) AS BIGINT) AS n_trigrams,
        |  CAST(min(msq) AS BIGINT) AS min_msq,
        |  CAST(max(msq) AS BIGINT) AS max_msq
        |FROM r GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin,

    "q_sample_norepl" ->
      // the A-Res priority replayed verbatim: one ln per row at a 10^4
      // floor grain (engine ulp flip risk ~1e-11/row — see Mixture doc)
      """WITH d AS (SELECT doc_id, n_chars,
        |  ((doc_id % 1048573) * 2654435761) % 1000000 AS h,
        |  greatest(n_chars, 1) AS w FROM documents)
        |SELECT doc_id, n_chars,
        |  CAST(floor(ln(1000000.0 / (h + 1.0)) * 10000.0 / w + 0.5) AS BIGINT) AS priority_q
        |FROM d
        |ORDER BY priority_q, doc_id LIMIT 100""".stripMargin,

    "q_vocab_coverage" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '[ \t\n\r\f]+')) AS term
        |  FROM documents WHERE trim(text) <> ''),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |tot AS (SELECT term, CAST(sum(tf) AS BIGINT) AS n FROM tf GROUP BY 1),
        |vocab AS (SELECT term FROM tot ORDER BY n DESC, term ASC LIMIT 30)
        |SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN v.term IS NULL THEN tf.tf ELSE 0 END) AS BIGINT) AS n_oov,
        |  (CAST(sum(CASE WHEN v.term IS NULL THEN tf.tf ELSE 0 END) AS BIGINT) * 10000)
        |    // CAST(sum(tf.tf) AS BIGINT) AS oov_bp
        |FROM tf LEFT JOIN vocab v USING (term)
        |GROUP BY tf.doc_id ORDER BY tf.doc_id""".stripMargin,

    "q_unigram_logloss" ->
      // per-distinct-term surprisal floor-quantized at 10^4 (single ln —
      // SURVEY §6 psi-family floor rule), then exact BIGINT sums
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '[ \t\n\r\f]+')) AS term
        |  FROM documents WHERE trim(text) <> ''),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |c AS (SELECT term, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS d FROM c),
        |l AS (SELECT term, CAST(floor(10000.0 * ln(
        |        CAST(tot.n + tot.d AS DOUBLE) / CAST(c.c + 1 AS DOUBLE)) + 0.5) AS BIGINT) AS l
        |      FROM c, tot)
        |SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
        |  CAST(sum(tf.tf * l.l) AS BIGINT) AS surprisal_q,
        |  CAST(sum(tf.tf * l.l) AS BIGINT) // CAST(sum(tf.tf) AS BIGINT) AS mean_surprisal_q
        |FROM tf JOIN l USING (term)
        |GROUP BY tf.doc_id ORDER BY tf.doc_id""".stripMargin,

    "q_multimodal_frames" ->
      // the frame chunker is pure byte arithmetic over the payload length:
      // every stride-th 64-byte chunk (stride 4 => step 256), capped at 16
      // frames, with a short payload still emitting its single partial
      // frame (the sequence bound clamps at 0, substr truncates at the
      // tail) and a NULL payload emitting nothing; frame_bytes replays as
      // greatest(least(64, n - i*256), 0)
      """WITH d AS (
        |  SELECT doc_id, octet_length(encode(text)) AS n
        |  FROM documents WHERE doc_id < 100),
        |f AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
        |    CAST(greatest(least(64, n - i*256), 0) AS INTEGER) AS frame_bytes
        |  FROM d, LATERAL unnest(generate_series(0,
        |    greatest(least(n // 256, 16) - 1, 0))) AS t(i)
        |  WHERE n IS NOT NULL)
        |SELECT doc_id, frame_idx, frame_bytes FROM f
        |ORDER BY doc_id, frame_idx""".stripMargin,

    "q_multimodal_jpeg" ->
      // closed-form aHash of the LOSSY round trip: cell c of doc_id's
      // pattern is white iff ((c·a + 7) mod 64) < 32 (a = 2·(g mod
      // 16)+1, g = id/3) XOR the per-id flip (c = id mod 64); DCT-block
      // alignment keeps every decoded cell within a couple luma units
      // of 0/255, so hash bit c == white(c). HUGEINT bit sum, then the
      // signed two's-complement conversion to match the JVM long
      """WITH RECURSIVE pw(k, v) AS (
        |  SELECT 0, CAST(1 AS HUGEINT)
        |  UNION ALL SELECT k + 1, v * 2 FROM pw WHERE k < 63),
        |ids AS (SELECT doc_id FROM documents WHERE doc_id < 200),
        |cells AS (
        |  SELECT doc_id, t.c,
        |    ((((t.c * (2 * ((doc_id // 3) % 16) + 1) + 7) % 64) < 32)
        |      <> (t.c = doc_id % 64)) AS white
        |  FROM ids, LATERAL unnest(generate_series(0, 63)) AS t(c)),
        |hv AS (
        |  SELECT cells.doc_id,
        |    sum(CASE WHEN cells.white THEN pw.v ELSE CAST(0 AS HUGEINT) END) AS v
        |  FROM cells JOIN pw ON pw.k = cells.c
        |  GROUP BY cells.doc_id)
        |SELECT doc_id,
        |  CAST(CASE WHEN v >= CAST(9223372036854775808 AS HUGEINT)
        |       THEN v - CAST(18446744073709551616 AS HUGEINT) ELSE v END
        |    AS BIGINT) AS ahash
        |FROM hv ORDER BY doc_id""".stripMargin,

    "q_multimodal_phash" ->
      // closed-form replay of the synthesized-image aHash: PNG is
      // lossless, so decoded luma == the synthesized gray value v (luma
      // of (v,v,v) is exactly v; the planted 4×4 patch is 255), the 8×8
      // cells are exact 4×4 tiles of the 32×32 grid, bit c sets iff
      // cellSum·64 > totalSum, and the signed-64 hash assembles via the
      // q_simhash HUGEINT two's-complement pattern; pairs = ALL pairs
      // within hamming 3 (the chunk pigeonhole is complete there)
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 120),
        |lum AS (
        |  SELECT i.doc_id, gx.x, gy.y,
        |    CASE WHEN gy.y < 4 AND gx.x >= (i.doc_id % 8) * 4
        |              AND gx.x < (i.doc_id % 8) * 4 + 4 THEN 255
        |         ELSE (gx.x * (1 + (i.doc_id // 3) % 5)
        |               + gy.y * ((i.doc_id // 3) % 7)) * 255
        |              // greatest(31 * (1 + (i.doc_id // 3) % 5)
        |                         + 31 * ((i.doc_id // 3) % 7), 1)
        |    END AS v
        |  FROM ids i,
        |    LATERAL unnest(generate_series(0, 31)) AS gx(x),
        |    LATERAL unnest(generate_series(0, 31)) AS gy(y)),
        |cells AS (
        |  SELECT doc_id, (y // 4) * 8 + (x // 4) AS c, sum(v) AS cs
        |  FROM lum GROUP BY 1, 2),
        |tots AS (SELECT doc_id, sum(cs) AS ts FROM cells GROUP BY 1),
        |shu AS (
        |  SELECT c.doc_id,
        |    sum(CASE WHEN c.cs * 64 > t.ts
        |        THEN CAST(CAST(1 AS UBIGINT) << CAST(c.c AS INT) AS HUGEINT)
        |        ELSE CAST(0 AS HUGEINT) END) AS u
        |  FROM cells c JOIN tots t USING (doc_id)
        |  GROUP BY c.doc_id),
        |sh AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN u >= 9223372036854775808
        |              THEN u - 18446744073709551616 ELSE u END AS BIGINT) AS sh
        |  FROM shu)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sh, b.sh)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    "q_audio_segments" ->
      // closed-form replay of the planted WAV layout: per doc the segment
      // plan is silence(2+id%3) → tone(3+id%2) → silence(2) → tone(4) →
      // silence(1), all in 256-sample windows, ±12000 square-wave tone ⇒
      // each tone window carries energy 256·12000² = 36,864,000,000 and
      // every silence window peak 0 — so the two non-silent islands and
      // their exact integer energies derive from doc_id arithmetic alone,
      // independently of the JVM's RIFF encode → javax.sound decode →
      // window-stats → gaps-and-islands chain being verified
      """WITH seg AS (
        |  SELECT doc_id, 2 + doc_id % 3 AS s0, 3 + doc_id % 2 AS t1
        |  FROM documents WHERE doc_id < 60)
        |SELECT doc_id, seg_start, seg_end, n_windows, energy_q FROM (
        |  SELECT doc_id, s0 AS seg_start, s0 + t1 - 1 AS seg_end,
        |    t1 AS n_windows, t1 * 36864000000 AS energy_q FROM seg
        |  UNION ALL
        |  SELECT doc_id, s0 + t1 + 2, s0 + t1 + 5,
        |    CAST(4 AS BIGINT), CAST(4 * 36864000000 AS BIGINT) FROM seg)
        |ORDER BY doc_id, seg_start""".stripMargin,

    "q_multimodal_neardup" ->
      // brute-force replay is EXACT here, not recall-dependent: every stub
      // feature is a nonnegative histogram fraction, so all sign bits are 1,
      // all four sign chunks agree for every doc pair, and the LSH candidate
      // set IS the full pair set (murmur collisions could only ADD pairs the
      // cosine verify already keeps). Features replay per the
      // q_multimodal_features machinery; the cosine finish is the explicit
      // left-associated 8-term chain == the sequential kernel accumulation,
      // with per-doc norms (same order, same doubles)
      """WITH hx AS (
        |  SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n
        |  FROM documents WHERE doc_id < 100),
        |bytes AS (
        |  SELECT doc_id, n, i,
        |    (strpos('0123456789ABCDEF', substr(h, 2*i - 1, 1)) - 1) * 16
        |      + strpos('0123456789ABCDEF', substr(h, 2*i, 1)) - 1 AS b
        |  FROM hx, LATERAL unnest(generate_series(1, CAST(n AS BIGINT))) AS t(i)),
        |hist AS (SELECT doc_id, b // 32 AS bin, count(*) AS c FROM bytes GROUP BY 1, 2),
        |hw AS (
        |  SELECT doc_id,
        |    coalesce(sum(CASE WHEN bin = 0 THEN c END), 0) AS h0,
        |    coalesce(sum(CASE WHEN bin = 1 THEN c END), 0) AS h1,
        |    coalesce(sum(CASE WHEN bin = 2 THEN c END), 0) AS h2,
        |    coalesce(sum(CASE WHEN bin = 3 THEN c END), 0) AS h3,
        |    coalesce(sum(CASE WHEN bin = 4 THEN c END), 0) AS h4,
        |    coalesce(sum(CASE WHEN bin = 5 THEN c END), 0) AS h5,
        |    coalesce(sum(CASE WHEN bin = 6 THEN c END), 0) AS h6,
        |    coalesce(sum(CASE WHEN bin = 7 THEN c END), 0) AS h7
        |  FROM hist GROUP BY doc_id),
        |fe AS (
        |  SELECT x.doc_id,
        |    CAST(CAST(hw.h0 AS REAL) / CAST(x.n AS REAL) AS DOUBLE) AS f0,
        |    CAST(CAST(hw.h1 AS REAL) / CAST(x.n AS REAL) AS DOUBLE) AS f1,
        |    CAST(CAST(hw.h2 AS REAL) / CAST(x.n AS REAL) AS DOUBLE) AS f2,
        |    CAST(CAST(hw.h3 AS REAL) / CAST(x.n AS REAL) AS DOUBLE) AS f3,
        |    CAST(CAST(hw.h4 AS REAL) / CAST(x.n AS REAL) AS DOUBLE) AS f4,
        |    CAST(CAST(hw.h5 AS REAL) / CAST(x.n AS REAL) AS DOUBLE) AS f5,
        |    CAST(CAST(hw.h6 AS REAL) / CAST(x.n AS REAL) AS DOUBLE) AS f6,
        |    CAST(CAST(hw.h7 AS REAL) / CAST(x.n AS REAL) AS DOUBLE) AS f7
        |  FROM hx x JOIN hw ON hw.doc_id = x.doc_id
        |  WHERE x.n >= 1),
        |nm AS (
        |  SELECT doc_id, f0,f1,f2,f3,f4,f5,f6,f7,
        |    f0*f0 + f1*f1 + f2*f2 + f3*f3 + f4*f4 + f5*f5 + f6*f6 + f7*f7 AS nn
        |  FROM fe),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    round((a.f0*b.f0 + a.f1*b.f1 + a.f2*b.f2 + a.f3*b.f3
        |         + a.f4*b.f4 + a.f5*b.f5 + a.f6*b.f6 + a.f7*b.f7)
        |      / (sqrt(a.nn) * sqrt(b.nn)), 4) AS cos_sim
        |  FROM nm a JOIN nm b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b, cos_sim FROM p WHERE cos_sim >= 0.9999
        |ORDER BY id_a, id_b""".stripMargin,

    "q_embed_neardup" ->
      // the sign-bit LSH replays EXACTLY, no hash needed: a pair is a
      // candidate iff some 8-bit sign chunk of the leading 32 dims matches
      // VERBATIM (equal chunks => equal murmur buckets; a murmur COLLISION
      // could only add a pair the cosine verify then keeps, ~2^-32/pair and
      // gate-checked), so the oracle joins on the sign-chunk LIST VALUES and
      // verifies with the q_embed_cosine_topk cosine replay
      """WITH s AS (
        |  SELECT vec_id, embedding,
        |    list_transform(embedding[1:32],
        |      v -> CASE WHEN v >= 0 THEN 1 ELSE 0 END) AS signs
        |  FROM embeddings),
        |ch AS (
        |  SELECT vec_id, embedding, c, signs[c*8+1:c*8+8] AS chunk
        |  FROM s, LATERAL unnest(generate_series(0, 3)) AS t(c)),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
        |    a.embedding AS ea, b.embedding AS eb
        |  FROM ch a JOIN ch b
        |    ON a.c = b.c AND a.chunk = b.chunk AND a.vec_id < b.vec_id),
        |v AS (
        |  SELECT id_a, id_b,
        |    round(
        |      list_aggregate(list_apply(list_zip(ea, eb),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
        |      / (sqrt(list_aggregate(list_apply(ea,
        |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
        |       * sqrt(list_aggregate(list_apply(eb,
        |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))), 4) AS cos_sim
        |  FROM cand)
        |SELECT id_a, id_b, cos_sim FROM v WHERE cos_sim >= 0.25
        |ORDER BY id_a, id_b""".stripMargin,

    "q_nn_descent" ->
      // the three NN-descent rounds unrolled: pseudo-random ring init
      // ((v·1048573 + j·40503) % 999983 % n, drop self/missing), per
      // round the deterministic reverse top-k, the B∘B hop join, the
      // shared round-4 cosine, and the per-node (cos desc, id) top-k.
      // Candidate semantics replay verbatim — same init, same caps,
      // same tie orders — so the graph is value-equal, not just
      // statistically similar
      s"""WITH $nnDescentGraphSql
        |SELECT v AS id, w AS neighbor_id, cos AS cos_sim FROM sce3
        |ORDER BY id, neighbor_id""".stripMargin,

    // the GNNS beam search over the SAME replayed graph: 4 hash-order
    // entries, 3 unrolled beam rounds, final top-3
    "q_graph_search" -> graphSearchOracle,

    "q_embed_dbscan" ->
      // the q_embed_neardup candidate+verify CTEs verbatim, then
      // DBSCAN: degree over the symmetrized edges, core = deg+1 >= 3,
      // components over core-core edges via the reach closure with
      // min-id labels (the q_dedup_clusters pattern), borders take the
      // smallest adjacent core label, everything else is noise
      """WITH RECURSIVE s AS (
        |  SELECT vec_id, embedding,
        |    list_transform(embedding[1:32],
        |      v -> CASE WHEN v >= 0 THEN 1 ELSE 0 END) AS signs
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |ch AS (
        |  SELECT vec_id, embedding, c, signs[c*8+1:c*8+8] AS chunk
        |  FROM s, LATERAL unnest(generate_series(0, 3)) AS t(c)),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
        |    a.embedding AS ea, b.embedding AS eb
        |  FROM ch a JOIN ch b
        |    ON a.c = b.c AND a.chunk = b.chunk AND a.vec_id < b.vec_id),
        |e AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT id_a, id_b,
        |      round(
        |        list_aggregate(list_apply(list_zip(ea, eb),
        |          x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
        |        / (sqrt(list_aggregate(list_apply(ea,
        |             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))
        |         * sqrt(list_aggregate(list_apply(eb,
        |             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))), 4) AS cos_sim
        |    FROM cand) WHERE cos_sim >= 0.25),
        |sym AS (SELECT id_a AS a, id_b AS b FROM e
        |        UNION ALL SELECT id_b, id_a FROM e),
        |core AS (
        |  SELECT a AS id FROM sym GROUP BY a HAVING count(*) + 1 >= 3),
        |ces AS (
        |  SELECT e.id_a AS a, e.id_b AS b FROM e
        |  JOIN core c1 ON c1.id = e.id_a JOIN core c2 ON c2.id = e.id_b
        |  UNION
        |  SELECT e.id_b, e.id_a FROM e
        |  JOIN core c1 ON c1.id = e.id_a JOIN core c2 ON c2.id = e.id_b),
        |reach AS (
        |  SELECT a AS id, b AS r FROM ces
        |  UNION
        |  SELECT re.id, e2.b FROM reach re JOIN ces e2 ON re.r = e2.a),
        |clab AS (
        |  SELECT c.id, least(c.id, coalesce(min(r.r), c.id)) AS cluster_id
        |  FROM core c LEFT JOIN reach r ON r.id = c.id GROUP BY c.id),
        |blab AS (
        |  SELECT sy.a AS id, min(cl.cluster_id) AS cluster_id
        |  FROM sym sy
        |  JOIN clab cl ON cl.id = sy.b
        |  LEFT JOIN core ca ON ca.id = sy.a
        |  WHERE ca.id IS NULL
        |  GROUP BY sy.a)
        |SELECT emb.vec_id AS id,
        |  CASE WHEN cl.id IS NOT NULL THEN 'core'
        |       WHEN bl.id IS NOT NULL THEN 'border'
        |       ELSE 'noise' END AS role,
        |  CAST(coalesce(cl.cluster_id, bl.cluster_id) AS BIGINT) AS cluster_id
        |FROM embeddings emb
        |LEFT JOIN clab cl ON cl.id = emb.vec_id
        |LEFT JOIN blab bl ON bl.id = emb.vec_id
        |WHERE emb.embedding IS NOT NULL
        |ORDER BY id""".stripMargin,

    "q_concordance" ->
      // same pinned whitespace class; DuckDB 1-based list slicing
      // mirrors Spark's 1-based slice(start, length) exactly
      """WITH toks AS (SELECT doc_id,
        |    string_split_regex(trim(text), '[ \t\n\r\f]+') AS l
        |  FROM documents WHERE trim(text) <> ''),
        |occ AS (SELECT doc_id, i, len(l) AS n, l
        |        FROM toks, LATERAL unnest(generate_series(1, len(l))) AS t(i)
        |        WHERE l[i] = 'scan')
        |SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |  COALESCE(array_to_string(l[greatest(i-2, 1): i-1], ' '), '') AS left_ctx,
        |  COALESCE(array_to_string(l[i+1 : least(i+2, n)], ' '), '') AS right_ctx
        |FROM occ ORDER BY doc_id, pos""".stripMargin,
  )

  /** Shared full minhash-sketch replay (the q_minhash_lsh machinery,
    * extracted verbatim in round 13 so q_lsh_curve reuses it in
    * lockstep): distinct word shingles of `docsCte` (doc_id, toks) →
    * FNV-1a base per GLOBALLY distinct shingle → 64 per-function minima
    * over mix(base ^ mix(i)) compared as SIGNED two's-complement longs
    * → per-doc ordered signature list. Emits CTEs `sh`..`sig`; no
    * trailing comma.
    */
  private def minhashSigReplay(docsCte: String): String =
    s"""sh AS (
      |  SELECT DISTINCT doc_id,
      |    array_to_string(toks[s : least(s + 2, len(toks))], ' ') AS shingle
      |  FROM $docsCte, LATERAL unnest(generate_series(1, greatest(1, len(toks) - 2))) AS t(s)),
      |gsh AS (SELECT DISTINCT shingle FROM sh),
      |fv AS (
      |  SELECT shingle,
      |    list_reduce(
      |      list_prepend(CAST(14695981039346656037 AS HUGEINT),
      |        list_transform(range(1, length(shingle)+1),
      |          i -> CAST(ord(substr(shingle, CAST(i AS INT), 1)) AS HUGEINT))),
      |      (h, b) -> ((CAST(xor(CAST(h AS UBIGINT), CAST(b AS UBIGINT)) AS HUGEINT))*435 + ((((CAST(xor(CAST(h AS UBIGINT), CAST(b AS UBIGINT)) AS HUGEINT))%4294967296)*256) % 4294967296) * 4294967296) % 18446744073709551616) AS base
      |  FROM gsh),
      |s0 AS (SELECT i, CAST(i AS HUGEINT) AS z FROM unnest(generate_series(0, 63)) AS t(i)),
      |s1 AS (SELECT i, (z + 11400714819323198485) % 18446744073709551616 AS z FROM s0),
      |s2 AS (SELECT i, ((CAST(xor(CAST(z AS UBIGINT), CAST(CAST(CAST(z AS UBIGINT) >> 30 AS HUGEINT) AS UBIGINT)) AS HUGEINT))*484763065 + ((((CAST(xor(CAST(z AS UBIGINT), CAST(CAST(CAST(z AS UBIGINT) >> 30 AS HUGEINT) AS UBIGINT)) AS HUGEINT))%4294967296)*3210233709) % 4294967296) * 4294967296) % 18446744073709551616 AS z FROM s1),
      |s3 AS (SELECT i, ((CAST(xor(CAST(z AS UBIGINT), CAST(CAST(CAST(z AS UBIGINT) >> 27 AS HUGEINT) AS UBIGINT)) AS HUGEINT))*321982955 + ((((CAST(xor(CAST(z AS UBIGINT), CAST(CAST(CAST(z AS UBIGINT) >> 27 AS HUGEINT) AS UBIGINT)) AS HUGEINT))%4294967296)*2496678331) % 4294967296) * 4294967296) % 18446744073709551616 AS z FROM s2),
      |seeds AS (SELECT i, CAST(xor(CAST(z AS UBIGINT), CAST(CAST(CAST(z AS UBIGINT) >> 31 AS HUGEINT) AS UBIGINT)) AS HUGEINT) AS seed FROM s3),
      |h0 AS (SELECT f.shingle, s.i, CAST(xor(CAST(f.base AS UBIGINT), CAST(s.seed AS UBIGINT)) AS HUGEINT) AS z FROM fv f CROSS JOIN seeds s),
      |h1 AS (SELECT shingle, i, (z + 11400714819323198485) % 18446744073709551616 AS z FROM h0),
      |h2 AS (SELECT shingle, i, ((CAST(xor(CAST(z AS UBIGINT), CAST(CAST(CAST(z AS UBIGINT) >> 30 AS HUGEINT) AS UBIGINT)) AS HUGEINT))*484763065 + ((((CAST(xor(CAST(z AS UBIGINT), CAST(CAST(CAST(z AS UBIGINT) >> 30 AS HUGEINT) AS UBIGINT)) AS HUGEINT))%4294967296)*3210233709) % 4294967296) * 4294967296) % 18446744073709551616 AS z FROM h1),
      |h3 AS (SELECT shingle, i, CAST(xor(CAST(z AS UBIGINT), CAST(CAST(CAST(z AS UBIGINT) >> 31 AS HUGEINT) AS UBIGINT)) AS HUGEINT) AS zu FROM
      |       (SELECT shingle, i, ((CAST(xor(CAST(z AS UBIGINT), CAST(CAST(CAST(z AS UBIGINT) >> 27 AS HUGEINT) AS UBIGINT)) AS HUGEINT))*321982955 + ((((CAST(xor(CAST(z AS UBIGINT), CAST(CAST(CAST(z AS UBIGINT) >> 27 AS HUGEINT) AS UBIGINT)) AS HUGEINT))%4294967296)*2496678331) % 4294967296) * 4294967296) % 18446744073709551616 AS z FROM h2)),
      |hh AS (SELECT shingle, i,
      |    CAST(CASE WHEN zu >= 9223372036854775808 THEN zu - 18446744073709551616 ELSE zu END AS BIGINT) AS hs
      |  FROM h3),
      |hv AS (SELECT s.doc_id, h.i, min(h.hs) AS sig
      |  FROM sh s JOIN hh h ON h.shingle = s.shingle GROUP BY s.doc_id, h.i),
      |sig AS (SELECT doc_id, list(sig ORDER BY i) AS sig FROM hv GROUP BY doc_id)""".stripMargin

  /** q_lsh_curve's oracle: the S-curve measurement replayed end to end —
    * the variant corpus (every stride-th token replaced, stride by
    * doc_id%5 arm), the SHARED minhash sketch replay over originals ∪
    * variants, slice-equality collisions for each (bands, rows)
    * setting, exact shingle-string Jaccard per pair, and the per-decile
    * aggregate. All integers; no float leaves the replay.
    */
  private def lshCurveOracle: String = {
    val settings = Seq((16, 4), (8, 8), (4, 16))
    def collideCte(b: Int, r: Int): String =
      s"""c$b AS (
        |  SELECT s.id_a, s.id_b,
        |    max(CASE WHEN s.sig_a[bb*$r+1 : bb*$r+$r] = s.sig_b[bb*$r+1 : bb*$r+$r]
        |             THEN 1 ELSE 0 END) AS c
        |  FROM sigp s, LATERAL unnest(generate_series(0, ${b - 1})) AS t(bb)
        |  GROUP BY 1, 2)""".stripMargin
    def armSelect(b: Int, r: Int): String =
      s"""SELECT CAST($b AS INTEGER) AS bands, CAST($r AS INTEGER) AS rows_per_band,
        |  j.s_bucket, count(*) AS n_pairs, CAST(sum(c.c) AS BIGINT) AS n_collided,
        |  CAST(sum(j.jac_bp) AS BIGINT) AS sum_jac_bp
        |FROM jac j JOIN c$b c ON c.id_a = j.id_a AND c.id_b = j.id_b
        |GROUP BY j.s_bucket""".stripMargin
    s"""WITH orig AS (
      |  SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
      |  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
      |vtoks AS (
      |  SELECT o.doc_id + 100000000 AS doc_id,
      |    list(CASE WHEN o.stride > 0 AND i % o.stride = 0
      |              THEN 'zzq' || CAST(o.doc_id AS VARCHAR) || 'x' || CAST(i AS VARCHAR)
      |              ELSE o.toks[i] END ORDER BY i) AS toks
      |  FROM (SELECT doc_id, toks,
      |          CASE doc_id % 5 WHEN 1 THEN 16 WHEN 2 THEN 9 WHEN 3 THEN 6
      |               WHEN 4 THEN 4 ELSE 0 END AS stride
      |        FROM orig) o,
      |    LATERAL unnest(generate_series(1, len(o.toks))) AS t(i)
      |  GROUP BY 1),
      |docs2 AS (
      |  SELECT doc_id, toks FROM orig
      |  UNION ALL SELECT doc_id, toks FROM vtoks),
      |${minhashSigReplay("docs2")},
      |pairs AS (SELECT doc_id AS id_a, doc_id + 100000000 AS id_b FROM orig),
      |nsh AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT c.id_a, c.id_b, count(*) AS n_inter
      |  FROM pairs c JOIN sh a ON a.doc_id = c.id_a
      |  JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
      |  GROUP BY 1, 2),
      |jac AS (
      |  SELECT x.id_a, x.id_b,
      |    CAST(CASE WHEN x.nu = 0 THEN 10 ELSE (10 * x.ni) // x.nu END AS BIGINT) AS s_bucket,
      |    CAST(CASE WHEN x.nu = 0 THEN 10000 ELSE (10000 * x.ni) // x.nu END AS BIGINT) AS jac_bp
      |  FROM (
      |    SELECT c.id_a, c.id_b, coalesce(i.n_inter, 0) AS ni,
      |      na.n + nb.n - coalesce(i.n_inter, 0) AS nu
      |    FROM pairs c
      |    LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
      |    JOIN nsh na ON na.doc_id = c.id_a
      |    JOIN nsh nb ON nb.doc_id = c.id_b) x),
      |sigp AS (
      |  SELECT p.id_a, p.id_b, sa.sig AS sig_a, sb.sig AS sig_b
      |  FROM pairs p JOIN sig sa ON sa.doc_id = p.id_a
      |  JOIN sig sb ON sb.doc_id = p.id_b),
      |${settings.map { case (b, r) => collideCte(b, r) }.mkString(",\n")}
      |${settings.map { case (b, r) => armSelect(b, r) }.mkString("\nUNION ALL ")}
      |ORDER BY bands, s_bucket""".stripMargin
  }

  /** q_ann_frontier's oracle: recall-vs-bytes replayed end to end. The
    * q_ann_ivfpq coarse replay is SHARED once (seeds → one
    * quantized-Lloyd round → trained assignment → exact-float residuals
    * → 2-probe routing → query residuals → codebook seed ids), then per
    * budget m ∈ {2,4,8} (subDim 64/m) the per-subspace codebook Lloyd,
    * code assignment, floor(2¹⁶·d²) BIGINT LUT, and the exact-integer
    * ADC top-5 — each budget's CTEs prefixed `b<m>_`. Ground truth =
    * floor(2¹⁶·‖q−v‖²) exact top-5 with (qd, vec_id) tie order (the
    * same sequential fold both engines). recall_bp = 200·hits over the
    * 50 truth pairs, so the quotient is exact in integers. The `gnns`
    * arm adds the graph paradigm on the same corpus/queries/truth: the
    * shared [[nnDescentGraphSql]] replay + [[gnnsSearchCtes]] at beam
    * 5 (top-5 of the final scored pool), 40 B/vec of neighbor ids.
    */
  private def annFrontierOracle: String = {
    def block(m: Int): String = {
      val sub = 64 / m
      val p = s"b$m"
      s"""${p}_ms AS (SELECT unnest(range(1, ${m + 1})) AS m),
        |${p}_rsub AS (
        |  SELECT r.vec_id, r.centroid_id, ${p}_ms.m,
        |    list_slice(r.r_emb, (${p}_ms.m - 1) * $sub + 1, ${p}_ms.m * $sub) AS sv
        |  FROM resid r CROSS JOIN ${p}_ms),
        |${p}_bseeds AS (
        |  SELECT s.bid, r.m, r.sv AS b_emb
        |  FROM bseed_ids s JOIN ${p}_rsub r ON r.vec_id = s.vec_id),
        |${p}_bscores0 AS (
        |  SELECT r.vec_id, r.m, r.sv, b.bid,
        |    -2 * list_aggregate(list_apply(list_zip(r.sv, b.b_emb),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
        |      + list_aggregate(list_apply(b.b_emb,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS score
        |  FROM ${p}_rsub r JOIN ${p}_bseeds b ON b.m = r.m),
        |${p}_bassign0 AS (
        |  SELECT vec_id, m, sv, bid FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY score, bid) AS rk
        |    FROM ${p}_bscores0) WHERE rk = 1),
        |${p}_bexpl AS (
        |  SELECT m, bid, unnest(range(1, len(sv) + 1)) AS d, unnest(sv) AS v
        |  FROM ${p}_bassign0),
        |${p}_bsums AS (
        |  SELECT m, bid, d, sum(CAST(floor(CAST(v AS DOUBLE) * 65536.0) AS BIGINT)) AS sq,
        |         count(*) AS nv
        |  FROM ${p}_bexpl GROUP BY m, bid, d),
        |${p}_books AS (
        |  SELECT m, bid,
        |    list(CAST(CAST(sq AS DOUBLE) / (65536.0 * nv) AS REAL) ORDER BY d) AS b_emb
        |  FROM ${p}_bsums GROUP BY m, bid),
        |${p}_bscores AS (
        |  SELECT r.vec_id, r.centroid_id, r.m, b.bid,
        |    -2 * list_aggregate(list_apply(list_zip(r.sv, b.b_emb),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
        |      + list_aggregate(list_apply(b.b_emb,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS score
        |  FROM ${p}_rsub r JOIN ${p}_books b ON b.m = r.m),
        |${p}_codes AS (
        |  SELECT vec_id, centroid_id, m, bid FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY score, bid) AS rk
        |    FROM ${p}_bscores) WHERE rk = 1),
        |${p}_lut AS (
        |  SELECT q.query_id, q.centroid_id, b.m, b.bid,
        |    CAST(floor(65536.0 * list_aggregate(
        |      list_apply(list_zip(list_slice(q.qr, (b.m - 1) * $sub + 1, b.m * $sub), b.b_emb),
        |        x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
        |           * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))), 'sum')) AS BIGINT) AS d_q
        |  FROM qres q CROSS JOIN ${p}_books b),
        |${p}_scored AS (
        |  SELECT l.query_id, c.vec_id AS neighbor_id,
        |    CAST(sum(l.d_q) AS BIGINT) AS adc_dist
        |  FROM ${p}_codes c
        |  JOIN ${p}_lut l ON l.centroid_id = c.centroid_id AND l.m = c.m AND l.bid = c.bid
        |  WHERE c.vec_id <> l.query_id
        |  GROUP BY 1, 2),
        |${p}_topk AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rk
        |    FROM ${p}_scored) WHERE rk <= 5),
        |${p}_recall AS (
        |  SELECT 'ivfpq' AS method,
        |         CAST($m AS INTEGER) AS m_subspaces,
        |         CAST(${m + 1} AS INTEGER) AS bytes_per_vec,
        |         CAST(count(*) * 200 AS BIGINT) AS recall_bp
        |  FROM brute x JOIN ${p}_topk t
        |    ON t.query_id = x.query_id AND t.neighbor_id = x.neighbor_id)""".stripMargin
    }
    val budgets = Seq(2, 4, 8)
    s"""WITH $nnDescentGraphSql,
      |${gnnsSearchCtes(beamWidth = 5, rounds = 3)},
      |gnns_topk AS (
      |  SELECT query_id, node AS neighbor_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, node) AS rn
      |    FROM gsc3) WHERE rn <= 5),
      |cents0 AS (
      |  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) AS cid,
      |         embedding AS c_emb
      |  FROM embeddings, n
      |  WHERE embedding IS NOT NULL
      |    AND vec_id % greatest(1, cnt // 8) = 0
      |  ORDER BY vec_id LIMIT 8),
      |scores0 AS (
      |  SELECT e.vec_id, e.embedding, c.cid,
      |    -2 * list_aggregate(list_apply(list_zip(e.embedding, c.c_emb),
      |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
      |      + list_aggregate(list_apply(c.c_emb,
      |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS score
      |  FROM embeddings e CROSS JOIN cents0 c
      |  WHERE e.embedding IS NOT NULL),
      |assign0 AS (
      |  SELECT vec_id, embedding, cid FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score, cid) AS rk
      |    FROM scores0) WHERE rk = 1),
      |expl1 AS (
      |  SELECT cid, unnest(range(1, len(embedding) + 1)) AS d,
      |         unnest(embedding) AS v
      |  FROM assign0),
      |sums1 AS (
      |  SELECT cid, d, sum(CAST(floor(CAST(v AS DOUBLE) * 65536.0) AS BIGINT)) AS sq,
      |         count(*) AS nv
      |  FROM expl1 GROUP BY cid, d),
      |cents AS (
      |  SELECT cid,
      |    list(CAST(CAST(sq AS DOUBLE) / (65536.0 * nv) AS REAL) ORDER BY d) AS c_emb
      |  FROM sums1 GROUP BY cid),
      |scores AS (
      |  SELECT e.vec_id, e.embedding, c.cid,
      |    -2 * list_aggregate(list_apply(list_zip(e.embedding, c.c_emb),
      |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
      |      + list_aggregate(list_apply(c.c_emb,
      |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS score
      |  FROM embeddings e CROSS JOIN cents c
      |  WHERE e.embedding IS NOT NULL),
      |assign AS (
      |  SELECT vec_id, embedding, cid AS centroid_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score, cid) AS rk
      |    FROM scores) WHERE rk = 1),
      |resid AS (
      |  SELECT a.vec_id, a.centroid_id,
      |    list_apply(list_zip(a.embedding, c.c_emb),
      |      x -> CAST(CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE) AS REAL)) AS r_emb
      |  FROM assign a JOIN cents c ON a.centroid_id = c.cid),
      |bseed_ids AS (
      |  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) AS bid
      |  FROM (SELECT vec_id FROM resid, n WHERE vec_id % greatest(1, cnt // 8) = 0
      |        ORDER BY vec_id LIMIT 8)),
      |probes AS (
      |  SELECT vec_id AS query_id, embedding AS q_emb, cid AS centroid_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score, cid) AS rk
      |    FROM scores WHERE vec_id < 10) WHERE rk <= 2),
      |qres AS (
      |  SELECT p.query_id, p.centroid_id,
      |    list_apply(list_zip(p.q_emb, c.c_emb),
      |      x -> CAST(CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE) AS REAL)) AS qr
      |  FROM probes p JOIN cents c ON p.centroid_id = c.cid),
      |brute AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT query_id, neighbor_id,
      |      row_number() OVER (PARTITION BY query_id ORDER BY qd, neighbor_id) AS rk
      |    FROM (
      |      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
      |        CAST(floor(65536.0 * list_aggregate(
      |          list_apply(list_zip(q.embedding, e.embedding),
      |            x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
      |               * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))), 'sum')) AS BIGINT) AS qd
      |      FROM embeddings e
      |      CROSS JOIN (SELECT vec_id, embedding FROM embeddings
      |                  WHERE vec_id < 10 AND embedding IS NOT NULL) q
      |      WHERE e.vec_id <> q.vec_id AND e.embedding IS NOT NULL))
      |  WHERE rk <= 5),
      |${budgets.map(block).mkString(",\n")},
      |gnns_recall AS (
      |  SELECT 'gnns' AS method,
      |         CAST(0 AS INTEGER) AS m_subspaces,
      |         CAST(40 AS INTEGER) AS bytes_per_vec,
      |         CAST(count(*) * 200 AS BIGINT) AS recall_bp
      |  FROM brute x JOIN gnns_topk t
      |    ON t.query_id = x.query_id AND t.neighbor_id = x.neighbor_id)
      |${budgets.map(m => s"SELECT * FROM b${m}_recall").mkString("\nUNION ALL ")}
      |UNION ALL SELECT * FROM gnns_recall
      |ORDER BY method, m_subspaces""".stripMargin
  }
}
