package graft

import SparkEntry.sprtC

/** DuckDB oracle SQL for the SURVEY §2B analytics / bench queries.
  *
  * Mechanically split out of SparkEntry.oracleSql (round 11) so the
  * registry file stays navigable — same entries, same gate, zero
  * behavior change. Every key here pairs with a SparkEntry.queries
  * registration; the driver compares both on rows+schema+hash.
  */
private[graft] object OracleAnalyticsSql {

  def sql: Map[String, String] = Map(

    "q_quantile_binning" ->
      """WITH b AS (SELECT
        |  CAST(floor(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.25)) AS BIGINT) AS b1,
        |  CAST(floor(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.50)) AS BIGINT) AS b2,
        |  CAST(floor(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.75)) AS BIGINT) AS b3
        |  FROM orders)
        |SELECT CAST(CASE WHEN o_totalprice < b1 THEN 0
        |            WHEN o_totalprice < b2 THEN 1
        |            WHEN o_totalprice < b3 THEN 2 ELSE 3 END AS BIGINT) AS price_band,
        |  count(*) AS n_orders,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,2))), 2) AS DOUBLE) AS revenue
        |FROM orders, b
        |GROUP BY price_band
        |ORDER BY price_band""".stripMargin,

    "q_moving_window" ->
      """SELECT event_id, user_id,
        |  CAST(round(sum(CAST(value AS DECIMAL(30,6))) OVER w, 2) AS DOUBLE)
        |    AS spend_7d,
        |  count(*) OVER w AS n_7d
        |FROM events
        |WHERE event_type = 'purchase'
        |WINDOW w AS (PARTITION BY user_id
        |  ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        |  RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q_funnel_steps" ->
      """WITH v AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
        |  FROM events GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, v.t_view,
        |    min(CASE WHEN e.event_type = 'click' AND e.ts >= v.t_view
        |      AND e.ts <= v.t_view + INTERVAL 6 HOUR
        |      THEN e.ts END) AS t_click
        |  FROM events e JOIN v USING (user_id)
        |  GROUP BY e.user_id, v.t_view),
        |p AS (
        |  SELECT e.user_id, c.t_view, c.t_click,
        |    min(CASE WHEN e.event_type = 'purchase' AND e.ts >= c.t_click
        |      AND e.ts <= c.t_click + INTERVAL 6 HOUR
        |      THEN e.ts END) AS t_purchase
        |  FROM events e JOIN c USING (user_id)
        |  GROUP BY e.user_id, c.t_view, c.t_click)
        |SELECT CASE WHEN t_purchase IS NOT NULL THEN 'purchased'
        |            WHEN t_click IS NOT NULL THEN 'clicked'
        |            WHEN t_view IS NOT NULL THEN 'viewed'
        |            ELSE 'none' END AS stage,
        |  count(*) AS n_users
        |FROM p
        |GROUP BY stage
        |ORDER BY stage""".stripMargin,

    "q_window_ranks" ->
      """SELECT c_nationkey, c_custkey, c_acctbal,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_nationkey, c_custkey""".stripMargin,

    "q_interval_join" ->
      """SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
        |  p.value AS purchase_value
        |FROM (SELECT * FROM events WHERE event_type = 'view') v
        |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON v.user_id = p.user_id
        |  AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
        |ORDER BY view_id, purchase_id""".stripMargin,

    "q_topk_per_group" ->
      """WITH r AS (SELECT c_nationkey, c_custkey, c_acctbal,
        |  ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |    ORDER BY c_acctbal DESC, c_custkey) AS rank_in_group
        |  FROM customer)
        |SELECT c_nationkey, rank_in_group, c_custkey, c_acctbal FROM r
        |WHERE rank_in_group <= 5
        |ORDER BY c_nationkey, rank_in_group""".stripMargin,

    "q_heavy_hitters" ->
      """WITH k AS (SELECT CAST(CASE WHEN l_orderkey % 10 < 3
        |    THEN l_orderkey % 7 ELSE l_orderkey END AS VARCHAR) AS hh_key
        |  FROM lineitem),
        |n AS (SELECT count(*) AS total FROM k)
        |SELECT hh_key, count(*) AS n_rows
        |FROM k, n
        |GROUP BY hh_key, n.total
        |HAVING count(*) >= ceil(0.001 * n.total)
        |ORDER BY hh_key""".stripMargin,

    "q_event_outliers" ->
      """WITH s AS (
        |  SELECT user_id, count(*) AS n,
        |    sum(CAST(value AS DECIMAL(18,6))) AS sv,
        |    sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS sv2
        |  FROM events GROUP BY user_id),
        |m AS (
        |  SELECT user_id, CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
        |    CAST(sv2 AS DOUBLE) / CAST(n AS DOUBLE)
        |      - (CAST(sv AS DOUBLE) / CAST(n AS DOUBLE))
        |        * (CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)) AS var
        |  FROM s),
        |z AS (
        |  SELECT e.event_id, e.user_id, e.value,
        |    floor((e.value - m.mean) / sqrt(m.var) * 10000.0 + 0.5) / 10000.0 AS z
        |  FROM events e JOIN m USING (user_id)
        |  WHERE m.var > 1e-12)
        |SELECT event_id, user_id, value, z FROM z
        |WHERE abs(z) > 2.0
        |ORDER BY event_id""".stripMargin,

    "q_range_join" ->
      """WITH bands(lo, hi, tier) AS (VALUES
        |  (0, 99999, 'low'), (100000, 299999, 'mid'),
        |  (300000, 999999, 'high'), (250000, 350000, 'promo')),
        |l AS (SELECT o_orderkey, CAST(floor(o_totalprice) AS BIGINT) AS price_l FROM orders)
        |SELECT l.o_orderkey, l.price_l, b.tier
        |FROM l JOIN bands b ON l.price_l BETWEEN b.lo AND b.hi
        |ORDER BY o_orderkey, tier""".stripMargin,

    "q_asof_join" ->
      """WITH r AS (SELECT user_id, ts, max(value) AS pval FROM events
        |           WHERE event_type = 'purchase' GROUP BY 1, 2),
        |l AS (SELECT event_id, user_id, ts, value FROM events)
        |SELECT l.event_id, l.user_id,
        |  strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
        |  CAST(round(CAST(r.pval AS DECIMAL(30,6)), 2) AS DOUBLE) AS last_purchase
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,

    // nearest = the closer of DuckDB's native backward (>=) and forward
    // (<=) ASOF joins; exact ties prefer backward. Distances in epoch
    // seconds (doubles) — ts values carry no sub-microsecond component
    // (verified), so both engines compare identical doubles.

    "q_asof_nearest" ->
      """WITH r AS (SELECT user_id, ts, max(value) AS pval FROM events
        |           WHERE event_type = 'purchase' GROUP BY 1, 2),
        |l AS (SELECT event_id, user_id, ts FROM events),
        |b AS (SELECT l.event_id, r.ts AS bts, r.pval AS bval
        |      FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts),
        |f AS (SELECT l.event_id, r.ts AS fts, r.pval AS fval
        |      FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts)
        |SELECT l.event_id, l.user_id,
        |  CASE WHEN l.ts IS NULL THEN NULL
        |       WHEN b.bts IS NULL THEN f.fval
        |       WHEN f.fts IS NULL THEN b.bval
        |       WHEN (epoch(f.fts) - epoch(l.ts)) < (epoch(l.ts) - epoch(b.bts))
        |         THEN f.fval
        |       ELSE b.bval END AS asof_pval
        |FROM l LEFT JOIN b ON l.event_id = b.event_id
        |       LEFT JOIN f ON l.event_id = f.event_id
        |ORDER BY l.event_id""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(30,2))), 2) AS DOUBLE) AS sum_qty,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(30,2))), 2) AS DOUBLE) AS sum_base_price,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))), 2) AS DOUBLE) AS sum_disc_price,
        |  floor(avg(l_quantity) * 10000.0 + 0.5) / 10000.0 AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_top_orders" ->
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))), 2) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY o_orderkey, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "q5_join5" ->
      """SELECT n_name,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q_basket_affinity" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS (
        |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_ab
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2),
        |supp AS (SELECT l_partkey, count(*) AS n FROM li GROUP BY 1)
        |SELECT part_a, part_b, n_ab, sa.n AS n_a, sb.n AS n_b
        |FROM pairs
        |JOIN supp sa ON part_a = sa.l_partkey
        |JOIN supp sb ON part_b = sb.l_partkey
        |WHERE n_ab >= 2
        |ORDER BY n_ab DESC, part_a, part_b
        |LIMIT 100""".stripMargin,

    "q_cohort_retention" ->
      """WITH o AS (SELECT o_custkey,
        |    year(o_orderdate) * 12 + month(o_orderdate) AS mi,
        |    strftime(date_trunc('month', o_orderdate), '%Y-%m') AS m FROM orders),
        |f AS (SELECT o_custkey, min(mi) AS cmi, min(m) AS cohort
        |      FROM o GROUP BY o_custkey)
        |SELECT cohort, CAST(mi - cmi AS BIGINT) AS month_offset,
        |  count(DISTINCT o.o_custkey) AS n_customers
        |FROM o JOIN f USING (o_custkey)
        |GROUP BY cohort, month_offset
        |ORDER BY cohort, month_offset""".stripMargin,

    "q_growth_mom" ->
      """WITH monthly AS (
        |  SELECT r_name, strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
        |    CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,2))), 2) AS DOUBLE) AS revenue
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2)
        |SELECT r_name, month, revenue,
        |  CAST(CASE WHEN lag(revenue) OVER w IS NULL THEN NULL
        |    ELSE floor((revenue - lag(revenue) OVER w) / lag(revenue) OVER w
        |      * 10000.0 + 0.5) END AS BIGINT) AS growth_bp
        |FROM monthly
        |WINDOW w AS (PARTITION BY r_name ORDER BY month)
        |ORDER BY r_name, month""".stripMargin,

    "q_window_running" ->
      """SELECT l_suppkey,
        |  CAST(row_number() OVER w AS INTEGER) AS rn,
        |  l_orderkey, l_linenumber,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) OVER
        |    (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_rev
        |FROM lineitem
        |WHERE l_suppkey <= 10
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)
        |ORDER BY l_suppkey, rn""".stripMargin,

    "q_window_tumbling" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_bucket,
        |  event_type, count(*) AS n_events,
        |  CAST(round(sum(CAST(value AS DECIMAL(30,6))), 2) AS DOUBLE) AS total_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY hour_bucket, event_type""".stripMargin,

    "q_rate_limit" ->
      """WITH r AS (
        |  SELECT event_id, user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id, event_type,
        |        date_trunc('hour', ts) ORDER BY ts, event_id) AS rn
        |  FROM events)
        |SELECT event_id, user_id, event_type FROM r WHERE rn <= 3
        |ORDER BY event_id""".stripMargin,

    "q_debounce" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, event_type, event_id, ts,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts, event_id) AS rn
        |  FROM events),
        |keep AS (
        |  SELECT user_id, event_type, event_id, ts, rn,
        |    ts AS last_kept, TRUE AS kept
        |  FROM ev WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.event_type, e.event_id, e.ts, e.rn,
        |    CASE WHEN e.ts >= k.last_kept + INTERVAL 30 MINUTE
        |         THEN e.ts ELSE k.last_kept END,
        |    e.ts >= k.last_kept + INTERVAL 30 MINUTE
        |  FROM ev e JOIN keep k
        |    ON e.user_id = k.user_id AND e.event_type = k.event_type
        |   AND e.rn = k.rn + 1)
        |SELECT event_id, user_id, event_type FROM keep WHERE kept
        |ORDER BY event_id""".stripMargin,

    "q_debounce_chunked" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, event_type, event_id, ts,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts, event_id) AS rn
        |  FROM events),
        |keep AS (
        |  SELECT user_id, event_type, event_id, ts, rn,
        |    ts AS last_kept, TRUE AS kept
        |  FROM ev WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.event_type, e.event_id, e.ts, e.rn,
        |    CASE WHEN e.ts >= k.last_kept + INTERVAL 30 MINUTE
        |         THEN e.ts ELSE k.last_kept END,
        |    e.ts >= k.last_kept + INTERVAL 30 MINUTE
        |  FROM ev e JOIN keep k
        |    ON e.user_id = k.user_id AND e.event_type = k.event_type
        |   AND e.rn = k.rn + 1)
        |SELECT event_id, user_id, event_type FROM keep WHERE kept
        |ORDER BY event_id""".stripMargin,

    "q_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch(ts) - epoch(lag(ts) OVER w) > 1800.0 THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
        |FROM sess
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q_session_window" ->
      """WITH flagged AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800.0 THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  count(*) AS n_events
        |FROM sess
        |GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    "q_embedding_drift" ->
      // centroid-histogram PSI with the centroids TRAINED in-oracle: the
      // hash-split ref slice seeds 16 cells, TWO quantized-Lloyd rounds
      // replay exactly (order-free BIGINT sums, one IEEE division per
      // dim), both slices' assignment histograms full-outer join, and
      // psi_ppm is the q_drift_psi floored formula at nBuckets=16
      """WITH eh AS (
        |  SELECT vec_id, embedding,
        |    ((vec_id % 1048573) * 2654435761) % 1000000 AS h
        |  FROM embeddings),
        |ref AS (SELECT vec_id, embedding FROM eh WHERE h < 500000),
        |cur AS (SELECT vec_id, embedding FROM eh WHERE h >= 500000),
        |n AS (SELECT count(*) AS cnt FROM ref),
        |cents0 AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) AS cid,
        |         embedding AS c_emb
        |  FROM ref, n
        |  WHERE vec_id % greatest(1, cnt // 16) = 0
        |  ORDER BY vec_id LIMIT 16),
        |scores0 AS (
        |  SELECT e.vec_id, e.embedding, c.cid,
        |    -2 * list_aggregate(list_apply(list_zip(e.embedding, c.c_emb),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
        |      + list_aggregate(list_apply(c.c_emb,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS score
        |  FROM ref e CROSS JOIN cents0 c),
        |assign0 AS (
        |  SELECT vec_id, embedding, cid FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score, cid) AS rk
        |    FROM scores0) WHERE rk = 1),
        |cents1 AS (
        |  SELECT cid,
        |    list(CAST(CAST(sq AS DOUBLE) / (65536.0 * nv) AS REAL) ORDER BY d) AS c_emb
        |  FROM (
        |    SELECT cid, d, sum(CAST(floor(CAST(v AS DOUBLE) * 65536.0) AS BIGINT)) AS sq,
        |           count(*) AS nv
        |    FROM (SELECT cid, unnest(range(1, len(embedding) + 1)) AS d,
        |                 unnest(embedding) AS v FROM assign0)
        |    GROUP BY cid, d)
        |  GROUP BY cid),
        |scores1 AS (
        |  SELECT e.vec_id, e.embedding, c.cid,
        |    -2 * list_aggregate(list_apply(list_zip(e.embedding, c.c_emb),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
        |      + list_aggregate(list_apply(c.c_emb,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS score
        |  FROM ref e CROSS JOIN cents1 c),
        |assign1 AS (
        |  SELECT vec_id, embedding, cid FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score, cid) AS rk
        |    FROM scores1) WHERE rk = 1),
        |cents AS (
        |  SELECT cid,
        |    list(CAST(CAST(sq AS DOUBLE) / (65536.0 * nv) AS REAL) ORDER BY d) AS c_emb
        |  FROM (
        |    SELECT cid, d, sum(CAST(floor(CAST(v AS DOUBLE) * 65536.0) AS BIGINT)) AS sq,
        |           count(*) AS nv
        |    FROM (SELECT cid, unnest(range(1, len(embedding) + 1)) AS d,
        |                 unnest(embedding) AS v FROM assign1)
        |    GROUP BY cid, d)
        |  GROUP BY cid),
        |oc AS (
        |  SELECT cid AS bucket, count(*) AS n_old FROM (
        |    SELECT vec_id, cid FROM (
        |      SELECT e.vec_id, c.cid,
        |        row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |          -2 * list_aggregate(list_apply(list_zip(e.embedding, c.c_emb),
        |              x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
        |            + list_aggregate(list_apply(c.c_emb,
        |              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), c.cid) AS rk
        |      FROM ref e CROSS JOIN cents c) WHERE rk = 1)
        |  GROUP BY cid),
        |nc AS (
        |  SELECT cid AS bucket, count(*) AS n_new FROM (
        |    SELECT vec_id, cid FROM (
        |      SELECT e.vec_id, c.cid,
        |        row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |          -2 * list_aggregate(list_apply(list_zip(e.embedding, c.c_emb),
        |              x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
        |            + list_aggregate(list_apply(c.c_emb,
        |              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), c.cid) AS rk
        |      FROM cur e CROSS JOIN cents c) WHERE rk = 1)
        |  GROUP BY cid),
        |j AS (
        |  SELECT CAST(coalesce(oc.bucket, nc.bucket) AS BIGINT) AS bucket,
        |    coalesce(n_old, 0) AS n_old, coalesce(n_new, 0) AS n_new
        |  FROM oc FULL OUTER JOIN nc ON oc.bucket = nc.bucket),
        |t AS (SELECT sum(n_old) AS to_, sum(n_new) AS tn FROM j)
        |SELECT bucket, n_old, n_new,
        |  CAST(floor(((n_new + 0.5) / (tn + 8.0) - (n_old + 0.5) / (to_ + 8.0))
        |    * ln(((n_new + 0.5) / (tn + 8.0)) / ((n_old + 0.5) / (to_ + 8.0)))
        |    * 1000000 + 0.5) AS BIGINT) AS psi_ppm
        |FROM j, t ORDER BY bucket""".stripMargin,

    "q_window_count_distinct" ->
      // DuckDB's NATIVE distinct window aggregate — an independent
      // algorithm for the semantics the Spark side composes from a
      // first-occurrence flag + running sum
      """SELECT event_id, event_type,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
        |  count(DISTINCT user_id) OVER (PARTITION BY event_type
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS distinct_users
        |FROM events WHERE user_id % 7 = 0
        |ORDER BY event_type, ts_str, event_id""".stripMargin,

    "q_mixture_alloc" ->
      // largest-remainder quota replayed in plain SQL over the
      // source-count table, then the same portable-hash pick
      """WITH wts AS (
        |  SELECT source, count(*) AS w FROM documents GROUP BY 1),
        |t AS (
        |  SELECT source, w, sum(w) OVER () AS tot FROM wts),
        |b AS (
        |  SELECT source, w,
        |    300 * w // tot AS base, (300 * w) % tot AS rem
        |  FROM t),
        |q AS (
        |  SELECT source,
        |    base + CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
        |      <= 300 - sum(base) OVER () THEN 1 ELSE 0 END AS n_take
        |  FROM b),
        |r AS (
        |  SELECT doc_id, source, row_number() OVER (PARTITION BY source
        |    ORDER BY (doc_id % 1048573) * 2654435761 % 1000000, doc_id) AS rn
        |  FROM documents)
        |SELECT r.doc_id, r.source
        |FROM r JOIN q ON r.source = q.source
        |WHERE r.rn <= q.n_take
        |ORDER BY r.doc_id""".stripMargin,

    "q_skyline" ->
      // INDEPENDENT formulation: the quadratic dominance anti-join
      // (DuckDB's IEJoin makes it feasible at oracle scale) vs the
      // sort-based level scan on the Spark side
      """WITH p AS (
        |  SELECT p_partkey, CAST(floor(p_retailprice*100 + 0.5) AS BIGINT)
        |      AS price_q,
        |    CAST(p_size AS BIGINT) AS p_size
        |  FROM part)
        |SELECT p_partkey, price_q, p_size FROM p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM p o
        |  WHERE o.price_q <= p.price_q AND o.p_size >= p.p_size
        |    AND (o.price_q < p.price_q OR o.p_size > p.p_size))
        |ORDER BY p_partkey""".stripMargin,

    "q_fifo_layers" ->
      """WITH r AS (
        |  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q,
        |    sum(CAST(l_quantity AS BIGINT)) OVER w AS hi,
        |    row_number() OVER w AS seq
        |  FROM lineitem WHERE l_returnflag = 'R'
        |  WINDOW w AS (PARTITION BY l_partkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS UNBOUNDED PRECEDING)),
        |i AS (
        |  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q,
        |    sum(CAST(l_quantity AS BIGINT)) OVER w AS hi,
        |    row_number() OVER w AS seq
        |  FROM lineitem WHERE l_returnflag <> 'R'
        |  WINDOW w AS (PARTITION BY l_partkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS UNBOUNDED PRECEDING))
        |SELECT r.l_partkey, CAST(r.seq AS BIGINT) AS r_seq,
        |  CAST(i.seq AS BIGINT) AS i_seq,
        |  CAST(least(r.hi, i.hi) - greatest(r.hi - r.q, i.hi - i.q) AS BIGINT)
        |    AS matched_q
        |FROM r JOIN i ON r.l_partkey = i.l_partkey
        | AND r.hi > i.hi - i.q AND i.hi > r.hi - r.q
        |ORDER BY r.l_partkey, r_seq, i_seq""".stripMargin,

    "q_rfm" ->
      // scores by the arithmetic bin rule floor((rank-1)*5/n)+1 in BOTH
      // engines — SQL ntile's uneven-bucket convention differs and is
      // deliberately not used; plain window ranks here vs the ranged
      // two-pass rank machine on the Spark side
      """WITH base AS (
        |  SELECT o_custkey, max(o_orderdate) AS last_o,
        |    CAST(count(*) AS BIGINT) AS frequency,
        |    CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS monetary_q
        |  FROM orders GROUP BY 1),
        |ref AS (SELECT max(last_o) AS ref_d, count(*) AS n FROM base),
        |b2 AS (
        |  SELECT o_custkey, frequency, monetary_q, n,
        |    CAST(date_diff('day', CAST(last_o AS DATE), CAST(ref_d AS DATE))
        |      AS BIGINT) AS recency_days
        |  FROM base, ref),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (ORDER BY recency_days ASC, o_custkey) AS rr,
        |    row_number() OVER (ORDER BY frequency DESC, o_custkey) AS rf,
        |    row_number() OVER (ORDER BY monetary_q DESC, o_custkey) AS rm
        |  FROM b2),
        |s AS (
        |  SELECT o_custkey, recency_days, frequency, monetary_q,
        |    CAST(5 - ((rr-1)*5) // n AS INTEGER) AS r_score,
        |    CAST(5 - ((rf-1)*5) // n AS INTEGER) AS f_score,
        |    CAST(5 - ((rm-1)*5) // n AS INTEGER) AS m_score
        |  FROM r)
        |SELECT o_custkey, recency_days, frequency, monetary_q,
        |  r_score, f_score, m_score,
        |  CAST(r_score*100 + f_score*10 + m_score AS INTEGER) AS rfm
        |FROM s ORDER BY o_custkey""".stripMargin,

    "q_abc_class" ->
      """WITH rev AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM lineitem GROUP BY 1),
        |c AS (
        |  SELECT l_partkey, cents,
        |    sum(cents) OVER (ORDER BY cents DESC, l_partkey
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(cents) OVER () AS tot
        |  FROM rev)
        |SELECT l_partkey, cents, CAST(cum AS BIGINT) AS cum_cents,
        |  CASE WHEN cum*100 <= tot*80 THEN 'A'
        |       WHEN cum*100 <= tot*95 THEN 'B' ELSE 'C' END AS abc
        |FROM c ORDER BY l_partkey""".stripMargin,

    "q_churn" ->
      // both engines truncate to Monday-start ISO weeks
      """WITH act AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
        |  FROM events WHERE user_id IS NOT NULL),
        |churn AS (
        |  SELECT a.wk, count(*) AS n_churned
        |  FROM act a LEFT JOIN act b
        |    ON b.user_id = a.user_id
        |   AND b.wk = CAST(a.wk + INTERVAL 7 DAY AS DATE)
        |  WHERE b.user_id IS NULL GROUP BY 1),
        |mx AS (SELECT max(wk) AS wmax FROM act),
        |a2 AS (SELECT wk, CAST(count(*) AS BIGINT) AS n_active FROM act GROUP BY 1)
        |SELECT strftime(a2.wk, '%Y-%m-%d') AS week, n_active,
        |  CAST(coalesce(churn.n_churned, 0) AS BIGINT) AS n_churned,
        |  CAST((coalesce(churn.n_churned, 0) * 10000) // n_active AS BIGINT)
        |    AS churn_bp
        |FROM a2 LEFT JOIN churn ON a2.wk = churn.wk, mx
        |WHERE a2.wk < wmax
        |ORDER BY week""".stripMargin,

    "q_weighted_percentile" ->
      // plain windows here (3 groups are nothing for a single engine) vs
      // the per-group RANGED cumsum on the Spark side
      """WITH v AS (
        |  SELECT l_returnflag, CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)
        |      AS cents,
        |    sum(CAST(l_quantity AS BIGINT)) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (
        |  SELECT l_returnflag, cents, w,
        |    sum(w) OVER (PARTITION BY l_returnflag ORDER BY cents
        |      ROWS UNBOUNDED PRECEDING) AS cw,
        |    sum(w) OVER (PARTITION BY l_returnflag) AS tw
        |  FROM v)
        |SELECT l_returnflag,
        |  CAST(min(CASE WHEN cw*100 >= tw*50 THEN cents END) AS BIGINT)
        |    AS wp50_cents,
        |  CAST(min(CASE WHEN cw*100 >= tw*90 THEN cents END) AS BIGINT)
        |    AS wp90_cents
        |FROM c GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q_corr_matrix" -> {
      // the helper expands the SAME pinned-parenthesization finish per
      // pair — a computed oracle string, still one SQL text
      def ce(a: String, b: String) =
        s"CAST(floor((CAST(n AS DOUBLE)*CAST(s_$a$b AS DOUBLE) " +
          s"- CAST(s_$a AS DOUBLE)*CAST(s_$b AS DOUBLE)) " +
          s"/ sqrt((CAST(n AS DOUBLE)*CAST(s_$a$a AS DOUBLE) " +
          s"- CAST(s_$a AS DOUBLE)*CAST(s_$a AS DOUBLE)) " +
          s"* (CAST(n AS DOUBLE)*CAST(s_$b$b AS DOUBLE) " +
          s"- CAST(s_$b AS DOUBLE)*CAST(s_$b AS DOUBLE))) " +
          s"* 10000.0 + 0.5) AS BIGINT)"
      val pairs = for (a <- Seq("q", "p", "d", "x"); b <- Seq("q", "p", "d", "x")
                       if a < b)
        yield s"SELECT '$a' AS var_x, '$b' AS var_y, ${ce(a, b)} AS corr_bp FROM m"
      """WITH base AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS q,
        |    CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS p,
        |    CAST(floor(l_discount*10000 + 0.5) AS BIGINT) AS d,
        |    CAST(floor(l_tax*10000 + 0.5) AS BIGINT) AS x
        |  FROM lineitem),
        |m AS (
        |  SELECT count(*) AS n,
        |    sum(CAST(q AS DECIMAL(38,0))) AS s_q,
        |    sum(CAST(p AS DECIMAL(38,0))) AS s_p,
        |    sum(CAST(d AS DECIMAL(38,0))) AS s_d,
        |    sum(CAST(x AS DECIMAL(38,0))) AS s_x,
        |    sum(CAST(q*q AS DECIMAL(38,0))) AS s_qq,
        |    sum(CAST(p*p AS DECIMAL(38,0))) AS s_pp,
        |    sum(CAST(d*d AS DECIMAL(38,0))) AS s_dd,
        |    sum(CAST(x*x AS DECIMAL(38,0))) AS s_xx,
        |    sum(CAST(p*q AS DECIMAL(38,0))) AS s_pq,
        |    sum(CAST(d*p AS DECIMAL(38,0))) AS s_dp,
        |    sum(CAST(d*q AS DECIMAL(38,0))) AS s_dq,
        |    sum(CAST(d*x AS DECIMAL(38,0))) AS s_dx,
        |    sum(CAST(p*x AS DECIMAL(38,0))) AS s_px,
        |    sum(CAST(q*x AS DECIMAL(38,0))) AS s_qx
        |  FROM base)
        |""".stripMargin +
        pairs.mkString("", "\nUNION ALL\n", "\nORDER BY var_x, var_y")
    },

    "q_item_neighbors_maintained" ->
      // VERBATIM the q_item_neighbors oracle: maintenance must land on
      // the identical full-rebuild state, so the incremental path hash-
      // matches the one-shot oracle
      """WITH inter AS (
        |  SELECT o_custkey AS u, l_partkey AS i, count(DISTINCT l_orderkey) AS s
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |cap AS (
        |  SELECT u, i FROM (
        |    SELECT u, i, row_number() OVER (PARTITION BY u ORDER BY s DESC, i) AS r
        |    FROM inter) WHERE r <= 50),
        |ni AS (SELECT i, count(*) AS n_i FROM cap GROUP BY i),
        |p AS (
        |  SELECT a.i AS lo, b.i AS hi, count(*) AS n_both
        |  FROM cap a JOIN cap b ON a.u = b.u AND a.i < b.i
        |  GROUP BY 1, 2),
        |sym AS (
        |  SELECT lo AS item, hi AS neighbor, n_both FROM p
        |  UNION ALL SELECT hi AS item, lo AS neighbor, n_both FROM p),
        |sc AS (
        |  SELECT item, neighbor, CAST(n_both AS BIGINT) AS n_both,
        |    CAST(floor(n_both * 10000.0
        |      / sqrt(CAST(na.n_i AS DOUBLE) * CAST(nb.n_i AS DOUBLE)) + 0.5)
        |      AS BIGINT) AS sim_q
        |  FROM sym JOIN ni na ON sym.item = na.i
        |    JOIN ni nb ON sym.neighbor = nb.i),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY item
        |      ORDER BY sim_q DESC, neighbor) AS rnk
        |  FROM sc)
        |SELECT item, neighbor, n_both, sim_q, CAST(rnk AS INTEGER) AS "rank"
        |FROM r WHERE rnk <= 10
        |ORDER BY item, "rank"""".stripMargin,

    "q_item_neighbors" ->
      // every step exact integers until the one pinned-parenthesization
      // cosine (sqrt/divide are single correctly-rounded IEEE ops)
      """WITH inter AS (
        |  SELECT o_custkey AS u, l_partkey AS i, count(DISTINCT l_orderkey) AS s
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2),
        |cap AS (
        |  SELECT u, i FROM (
        |    SELECT u, i, row_number() OVER (PARTITION BY u ORDER BY s DESC, i) AS r
        |    FROM inter) WHERE r <= 50),
        |ni AS (SELECT i, count(*) AS n_i FROM cap GROUP BY i),
        |p AS (
        |  SELECT a.i AS lo, b.i AS hi, count(*) AS n_both
        |  FROM cap a JOIN cap b ON a.u = b.u AND a.i < b.i
        |  GROUP BY 1, 2),
        |sym AS (
        |  SELECT lo AS item, hi AS neighbor, n_both FROM p
        |  UNION ALL SELECT hi AS item, lo AS neighbor, n_both FROM p),
        |sc AS (
        |  SELECT item, neighbor, CAST(n_both AS BIGINT) AS n_both,
        |    CAST(floor(n_both * 10000.0
        |      / sqrt(CAST(na.n_i AS DOUBLE) * CAST(nb.n_i AS DOUBLE)) + 0.5)
        |      AS BIGINT) AS sim_q
        |  FROM sym JOIN ni na ON sym.item = na.i
        |    JOIN ni nb ON sym.neighbor = nb.i),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY item
        |      ORDER BY sim_q DESC, neighbor) AS rnk
        |  FROM sc)
        |SELECT item, neighbor, n_both, sim_q, CAST(rnk AS INTEGER) AS "rank"
        |FROM r WHERE rnk <= 10
        |ORDER BY item, "rank"""".stripMargin,

    "q_rec_eval" ->
      // the full offline-eval pipeline: train/test split by order
      // residue, the q_item_neighbors cap/cosine machinery over the
      // TRAIN slice, exact-integer candidate scoring with the
      // seen-item anti-join, and the NDCG finish on the same pinned
      // gain literals as q_ndcg (idcg = prefix sums over
      // min(n_test, 10))
      """WITH inter0 AS (
        |  SELECT o_custkey AS u, l_partkey AS i, o_orderkey AS ok
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |train AS (
        |  SELECT u, i, count(DISTINCT ok) AS s FROM inter0 WHERE ok % 7 <> 0
        |  GROUP BY 1, 2),
        |test AS (
        |  SELECT DISTINCT t.u, t.i FROM inter0 t
        |  WHERE t.ok % 7 = 0
        |    AND NOT EXISTS (SELECT 1 FROM train tr
        |      WHERE tr.u = t.u AND tr.i = t.i)),
        |cap AS (
        |  SELECT u, i FROM (
        |    SELECT u, i, row_number() OVER (
        |      PARTITION BY u ORDER BY s DESC, i) AS r
        |    FROM train) WHERE r <= 50),
        |ni AS (SELECT i, count(*) AS n_i FROM cap GROUP BY i),
        |p AS (
        |  SELECT a.i AS lo, b.i AS hi, count(*) AS n_both
        |  FROM cap a JOIN cap b ON a.u = b.u AND a.i < b.i
        |  GROUP BY 1, 2),
        |sym AS (
        |  SELECT lo AS item, hi AS neighbor, n_both FROM p
        |  UNION ALL SELECT hi AS item, lo AS neighbor, n_both FROM p),
        |sc AS (
        |  SELECT item, neighbor,
        |    CAST(floor(n_both * 10000.0
        |      / sqrt(CAST(na.n_i AS DOUBLE) * CAST(nb.n_i AS DOUBLE)) + 0.5)
        |      AS BIGINT) AS sim_q
        |  FROM sym JOIN ni na ON sym.item = na.i
        |    JOIN ni nb ON sym.neighbor = nb.i),
        |nbrs AS (
        |  SELECT item, neighbor, sim_q FROM (
        |    SELECT *, row_number() OVER (PARTITION BY item
        |        ORDER BY sim_q DESC, neighbor) AS rnk FROM sc)
        |  WHERE rnk <= 10),
        |cands AS (
        |  SELECT t.u AS "user", n.neighbor AS rec_item, sum(n.sim_q) AS score
        |  FROM train t JOIN nbrs n ON t.i = n.item
        |  GROUP BY 1, 2),
        |unseen AS (
        |  SELECT c.* FROM cands c
        |  WHERE NOT EXISTS (SELECT 1 FROM train tr
        |    WHERE tr.u = c."user" AND tr.i = c.rec_item)),
        |recs AS (
        |  SELECT "user", rec_item,
        |    row_number() OVER (PARTITION BY "user"
        |      ORDER BY score DESC, rec_item) AS rnk
        |  FROM unseen QUALIFY rnk <= 10),
        |gains AS (
        |  SELECT * FROM (VALUES (1, 1000000), (2, 630929), (3, 500000),
        |    (4, 430676), (5, 386852), (6, 356207), (7, 333333),
        |    (8, 315464), (9, 301029), (10, 289064)) v(pos, g)),
        |idcg AS (
        |  SELECT pos, sum(g) OVER (ORDER BY pos) AS pre FROM gains),
        |put AS (SELECT u AS "user", count(*) AS n_test FROM test GROUP BY u),
        |hits AS (
        |  SELECT r."user", count(*) AS n_hits, sum(g.g) AS dcg_q
        |  FROM recs r JOIN test t ON t.u = r."user" AND t.i = r.rec_item
        |  JOIN gains g ON g.pos = r.rnk
        |  GROUP BY 1),
        |per AS (
        |  SELECT p."user",
        |    coalesce((10000 * h.dcg_q) // (SELECT pre FROM idcg
        |      WHERE pos = least(p.n_test, 10)), 0) AS ndcg_bp,
        |    CASE WHEN h.n_hits IS NOT NULL THEN 1 ELSE 0 END AS hit
        |  FROM put p LEFT JOIN hits h ON h."user" = p."user")
        |SELECT CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(hit) AS BIGINT) AS n_hit_users,
        |  CAST((10000 * sum(hit)) // count(*) AS BIGINT) AS hit_rate_bp,
        |  CAST(sum(ndcg_bp) // count(*) AS BIGINT) AS mean_ndcg_bp
        |FROM per""".stripMargin,

    "q_triangle_count" ->
      // independent formulation: id-ordered triple join (no degree
      // orientation) — triangles as undirected node sets are
      // orientation-invariant, so agreement checks the whole machine
      """WITH e AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |tri AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM e e1 JOIN e e2 ON e2.u = e1.v
        |    JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |nodes AS (
        |  SELECT a AS node FROM tri
        |  UNION ALL SELECT b FROM tri
        |  UNION ALL SELECT c FROM tri)
        |SELECT node, CAST(count(*) AS BIGINT) AS n_tri
        |FROM nodes GROUP BY node
        |ORDER BY node""".stripMargin,

    "q_kcore" ->
      // the peel fixpoint DOES have a recursive-CTE form: a fixed 50
      // rounds (the operator's own maxIters) with the working table
      // referenced ONCE via the endpoint-unnest trick — degree = a
      // window count over unnested endpoints, an edge survives iff its
      // min endpoint degree >= k; converged rounds re-emit unchanged,
      // so round 50 IS the fixpoint whenever the Scala side converged
      """WITH RECURSIVE pairs AS (
        |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(DISTINCT a.l_orderkey) >= 2),
        |edges AS (
        |  SELECT DISTINCT least(pa, pb) AS u, greatest(pa, pb) AS v
        |  FROM pairs WHERE pa <> pb),
        |peel(r, u, v) AS (
        |  SELECT 0, u, v FROM edges
        |  UNION ALL
        |  SELECT r + 1, u, v FROM (
        |    SELECT r, u, v, node, min(cnt) OVER (PARTITION BY r, u, v) AS mindeg
        |    FROM (
        |      SELECT e.r, e.u, e.v, t.node,
        |        count(*) OVER (PARTITION BY e.r, t.node) AS cnt
        |      FROM peel e, UNNEST([e.u, e.v]) AS t(node))
        |  ) WHERE r < 50 AND mindeg >= 2 AND node = u)
        |SELECT node, CAST(count(*) AS BIGINT) AS core_degree FROM (
        |  SELECT u AS node FROM peel WHERE r = 50
        |  UNION ALL SELECT v FROM peel WHERE r = 50)
        |GROUP BY node
        |ORDER BY node""".stripMargin,

    "q_communities" ->
      // deterministic synchronous LPA replays round by round: the
      // recursive label table joins the static bidirectional edge list,
      // per-node top-1 by (count DESC, label ASC) via QUALIFY — the
      // exact tie-break the Scala window uses, so 5 rounds land on the
      // identical labeling
      """WITH RECURSIVE pairs AS (
        |  SELECT a.l_partkey AS pa, b.l_partkey AS pb
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(DISTINCT a.l_orderkey) >= 2),
        |edges AS (
        |  SELECT DISTINCT least(pa, pb) AS u, greatest(pa, pb) AS v
        |  FROM pairs WHERE pa <> pb),
        |bidir AS (
        |  SELECT u AS a, v AS b FROM edges UNION ALL SELECT v, u FROM edges),
        |lab(r, node, community) AS (
        |  SELECT 0, node, node FROM (
        |    SELECT u AS node FROM edges UNION SELECT v FROM edges)
        |  UNION ALL
        |  SELECT r + 1, node, community FROM (
        |    SELECT l.r, bd.a AS node, l.community, count(*) AS c
        |    FROM bidir bd JOIN lab l ON l.node = bd.b WHERE l.r < 5
        |    GROUP BY 1, 2, 3
        |  ) QUALIFY row_number() OVER (
        |      PARTITION BY node ORDER BY c DESC, community ASC) = 1)
        |SELECT node, community FROM lab WHERE r = 5
        |ORDER BY node""".stripMargin,

    "q_allocate" ->
      // all quantities non-negative here, so DuckDB's integral // and %
      // coincide with the operator's floor-division contract
      """WITH c AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS cents
        |  FROM lineitem),
        |t AS (
        |  SELECT l_orderkey, l_linenumber, cents,
        |    sum(cents) OVER (PARTITION BY l_orderkey) AS tot
        |  FROM c),
        |b AS (
        |  SELECT l_orderkey, l_linenumber, cents,
        |    CAST(tot // 10 AS BIGINT) AS rebate_q,
        |    (tot // 10) * cents // tot AS base,
        |    ((tot // 10) * cents) % tot AS rem
        |  FROM t),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY rem DESC, l_linenumber) AS rnk,
        |    rebate_q - sum(base) OVER (PARTITION BY l_orderkey) AS deficit
        |  FROM b)
        |SELECT l_orderkey, l_linenumber, cents, rebate_q,
        |  CAST(base + CASE WHEN rnk <= deficit THEN 1 ELSE 0 END AS BIGINT) AS alloc_q
        |FROM r ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_ewma" ->
      // the recurrence unrolled as a recursive CTE: integer floor
      // division (// on non-negative BIGINTs) replays Math.floorDiv
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, event_id, CAST(floor(value*100 + 0.5) AS BIGINT) AS xq,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events
        |  WHERE event_type = 'purchase' AND user_id IS NOT NULL AND value IS NOT NULL),
        |r AS (
        |  SELECT user_id, event_id, xq, rn, xq AS ewma_q FROM ev WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.event_id, e.xq, e.rn,
        |    CAST((e.xq + 3*r.ewma_q) // 4 AS BIGINT) AS ewma_q
        |  FROM ev e JOIN r ON e.user_id = r.user_id AND e.rn = r.rn + 1)
        |SELECT user_id, event_id, xq, ewma_q FROM r
        |ORDER BY event_id""".stripMargin,

    "q_cusum" ->
      // state carried as s_next (post-reset) so each recursion step is
      // one CASE; fired rows surface the pre-reset statistic
      """WITH RECURSIVE ev AS (
        |  SELECT user_id, event_id, CAST(floor(value*100 + 0.5) AS BIGINT) AS xq,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
        |r AS (
        |  SELECT user_id, event_id, rn,
        |    CASE WHEN greatest(0, xq - 4000) >= 20000
        |         THEN greatest(0, xq - 4000) ELSE NULL END AS fired,
        |    CASE WHEN greatest(0, xq - 4000) >= 20000
        |         THEN 0 ELSE greatest(0, xq - 4000) END AS s_next
        |  FROM ev WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.event_id, e.rn,
        |    CASE WHEN greatest(0, r.s_next + e.xq - 4000) >= 20000
        |         THEN greatest(0, r.s_next + e.xq - 4000) ELSE NULL END,
        |    CASE WHEN greatest(0, r.s_next + e.xq - 4000) >= 20000
        |         THEN 0 ELSE greatest(0, r.s_next + e.xq - 4000) END
        |  FROM ev e JOIN r ON e.user_id = r.user_id AND e.rn = r.rn + 1)
        |SELECT user_id, event_id, CAST(fired AS BIGINT) AS cusum_q
        |FROM r WHERE fired IS NOT NULL
        |ORDER BY event_id""".stripMargin,

    "q_running_balance" ->
      """WITH RECURSIVE mv AS (
        |  SELECT l_partkey,
        |    CAST(CASE WHEN l_returnflag = 'R' THEN l_quantity
        |              ELSE -l_quantity END AS BIGINT) AS dq,
        |    row_number() OVER (PARTITION BY l_partkey
        |                       ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem),
        |r AS (
        |  SELECT l_partkey, rn, greatest(0, 500 + dq) AS b FROM mv WHERE rn = 1
        |  UNION ALL
        |  SELECT m.l_partkey, m.rn, greatest(0, r.b + m.dq)
        |  FROM mv m JOIN r ON m.l_partkey = r.l_partkey AND m.rn = r.rn + 1)
        |SELECT l_partkey, CAST(max(rn) AS BIGINT) AS n_moves,
        |  CAST(max_by(b, rn) AS BIGINT) AS balance_q
        |FROM r GROUP BY l_partkey
        |ORDER BY l_partkey""".stripMargin,

    "q_mad_outliers" ->
      // DISCRETE lower medians (rank-selected data values, no
      // interpolation arithmetic) — med, mad, and the 3·mad compare are
      // bit-exact in both engines
      """WITH ev AS (
        |  SELECT event_type, value FROM events WHERE value IS NOT NULL),
        |r AS (
        |  SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM ev),
        |m AS (
        |  SELECT event_type, max(CASE WHEN rn = (n + 1) // 2 THEN value END) AS med
        |  FROM r GROUP BY event_type),
        |a AS (
        |  SELECT r.event_type, r.n, abs(r.value - m.med) AS adev, m.med AS med
        |  FROM r JOIN m USING (event_type)),
        |r2 AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY adev) AS rna
        |  FROM a),
        |mm AS (
        |  SELECT event_type, max(CASE WHEN rna = (n + 1) // 2 THEN adev END) AS mad
        |  FROM r2 GROUP BY event_type)
        |SELECT r2.event_type, CAST(count(*) AS BIGINT) AS n,
        |  max(r2.med) AS med, max(mm.mad) AS mad,
        |  CAST(sum(CASE WHEN r2.adev > mm.mad * 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers
        |FROM r2 JOIN mm USING (event_type)
        |GROUP BY r2.event_type
        |ORDER BY r2.event_type""".stripMargin,

    "q_resample_ffill" ->
      // DuckDB epoch() is DOUBLE (fractional seconds) — floor+cast
      // mirrors Spark's truncating timestamp→long cast. ASOF LEFT JOIN
      // is the fill; grid bounds replay the same ceil/floor alignment.
      """WITH obs AS (
        |  SELECT user_id AS key, CAST(floor(epoch(ts)) AS BIGINT) AS t,
        |    max(value) AS v
        |  FROM events WHERE event_type = 'purchase'
        |    AND user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |b AS (SELECT key, min(t) AS mn, max(t) AS mx FROM obs GROUP BY 1),
        |grid AS (
        |  SELECT key, unnest(generate_series(
        |    mn + (21600 - mn % 21600) % 21600, mx - mx % 21600, 21600)) AS t
        |  FROM b
        |  WHERE mx - mx % 21600 >= mn + (21600 - mn % 21600) % 21600),
        |j AS (
        |  SELECT g.key, g.t, o.v
        |  FROM grid g ASOF LEFT JOIN obs o ON g.key = o.key AND g.t >= o.t)
        |SELECT key AS user_id, CAST(t AS BIGINT) AS grid_epoch, v AS value_ff
        |FROM j ORDER BY user_id, grid_epoch""".stripMargin,

    "q_resample_interp" ->
      // ASOF (backward) + reversed-sign ASOF (forward) recover the
      // surrounding pair; the interpolation expression keeps the
      // IDENTICAL parenthesization so every double matches bit-for-bit
      """WITH obs AS (
        |  SELECT user_id AS key, CAST(floor(epoch(ts)) AS BIGINT) AS t,
        |    max(value) AS v
        |  FROM events WHERE event_type = 'purchase'
        |    AND user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |b AS (SELECT key, min(t) AS mn, max(t) AS mx FROM obs GROUP BY 1),
        |grid AS (
        |  SELECT key, unnest(generate_series(
        |    mn + (21600 - mn % 21600) % 21600, mx - mx % 21600, 21600)) AS t
        |  FROM b
        |  WHERE mx - mx % 21600 >= mn + (21600 - mn % 21600) % 21600),
        |bk AS (
        |  SELECT g.key, g.t, o.t AS t0, o.v AS v0
        |  FROM grid g ASOF LEFT JOIN obs o ON g.key = o.key AND g.t >= o.t),
        |fw AS (
        |  SELECT g.key, g.t, o.t AS t1, o.v AS v1
        |  FROM grid g ASOF LEFT JOIN obs o
        |    ON g.key = o.key AND g.t <= o.t),
        |j AS (
        |  SELECT bk.key, bk.t, bk.t0, bk.v0, fw.t1, fw.v1
        |  FROM bk JOIN fw ON bk.key = fw.key AND bk.t = fw.t)
        |SELECT key AS user_id, CAST(t AS BIGINT) AS grid_epoch,
        |  CASE WHEN t1 = t0 THEN v0
        |    ELSE v0 + (v1 - v0) * (t - t0) / (t1 - t0) END AS value_lerp
        |FROM j ORDER BY user_id, grid_epoch""".stripMargin,

    "q_event_transitions" ->
      """WITH tr AS (
        |  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type,
        |         event_type AS to_type
        |  FROM events),
        |c AS (SELECT from_type, to_type, count(*) AS n FROM tr
        |      WHERE from_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from FROM c GROUP BY 1)
        |SELECT c.from_type, c.to_type, c.n, (c.n * 10000) // t.n_from AS share_bp
        |FROM c JOIN t USING (from_type) ORDER BY from_type, to_type""".stripMargin,

    "q_pagerank" ->
      // the pinned integer recurrence unrolled: 3 damped rounds of
      // (((pr*w) // ow) * 85) // 100 — integer sums are associative, so
      // both engines agree bit-for-bit regardless of evaluation order
      """WITH tr AS (
        |  SELECT l_partkey AS src,
        |         lead(l_partkey) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) AS dst
        |  FROM lineitem),
        |e AS (SELECT src, dst, count(*) AS w FROM tr WHERE dst IS NOT NULL GROUP BY 1, 2),
        |o AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM e GROUP BY 1),
        |nodes AS (SELECT DISTINCT src AS node FROM e UNION SELECT DISTINCT dst FROM e),
        |p0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM nodes),
        |i1 AS (SELECT e.dst AS node, CAST(sum((((p.pr * e.w) // o.ow) * 85) // 100) AS BIGINT) AS infl
        |       FROM e JOIN p0 p ON e.src = p.node JOIN o ON e.src = o.src GROUP BY e.dst),
        |p1 AS (SELECT n.node, CAST(150000 + coalesce(i.infl, 0) AS BIGINT) AS pr
        |       FROM nodes n LEFT JOIN i1 i ON n.node = i.node),
        |i2 AS (SELECT e.dst AS node, CAST(sum((((p.pr * e.w) // o.ow) * 85) // 100) AS BIGINT) AS infl
        |       FROM e JOIN p1 p ON e.src = p.node JOIN o ON e.src = o.src GROUP BY e.dst),
        |p2 AS (SELECT n.node, CAST(150000 + coalesce(i.infl, 0) AS BIGINT) AS pr
        |       FROM nodes n LEFT JOIN i2 i ON n.node = i.node),
        |i3 AS (SELECT e.dst AS node, CAST(sum((((p.pr * e.w) // o.ow) * 85) // 100) AS BIGINT) AS infl
        |       FROM e JOIN p2 p ON e.src = p.node JOIN o ON e.src = o.src GROUP BY e.dst),
        |p3 AS (SELECT n.node, CAST(150000 + coalesce(i.infl, 0) AS BIGINT) AS pr
        |       FROM nodes n LEFT JOIN i3 i ON n.node = i.node)
        |SELECT node, pr FROM p3 ORDER BY node""".stripMargin,

    "q_mcnemar" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |    max(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1996 THEN 1 ELSE 0 END) AS in96,
        |    max(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1997 THEN 1 ELSE 0 END) AS in97,
        |    max(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1996
        |             AND o_totalprice > 300000 THEN 1 ELSE 0 END) AS hv96,
        |    max(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1997
        |             AND o_totalprice > 300000 THEN 1 ELSE 0 END) AS hv97
        |  FROM orders
        |  WHERE year(CAST(o_orderdate AS DATE)) IN (1996, 1997)
        |  GROUP BY 1),
        |p AS (SELECT * FROM o WHERE in96 = 1 AND in97 = 1),
        |m AS (SELECT count(*) AS n_pairs,
        |        CAST(sum(CASE WHEN hv96 = 1 AND hv97 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |        CAST(sum(CASE WHEN hv96 = 0 AND hv97 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c
        |      FROM p)
        |SELECT CAST(n_pairs AS BIGINT) AS n_pairs, b, c,
        |  CAST(CASE WHEN b + c = 0 THEN 0
        |       ELSE (10000 * (b - c) * (b - c)) // (b + c) END AS BIGINT) AS mcnemar_bp
        |FROM m""".stripMargin,

    "q_srm" ->
      """WITH o AS (
        |  SELECT CASE WHEN (o_custkey % 1048573) * 2654435761 % 1000000 < 500000
        |           THEN 0 ELSE 1 END AS v
        |  FROM orders),
        |m AS (SELECT CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |        CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
        |      FROM o)
        |SELECT n0, n1,
        |  CAST((10000 * (n0 - n1) * (n0 - n1)) // (n0 + n1) AS BIGINT) AS srm_bp
        |FROM m""".stripMargin,

    "q_assoc_rules" ->
      """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS (
        |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_ab
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |bi AS (SELECT part_a, part_b, n_ab FROM pairs
        |       UNION ALL
        |       SELECT part_b, part_a, n_ab FROM pairs),
        |supp AS (SELECT l_partkey, count(*) AS n FROM li GROUP BY 1),
        |nb AS (SELECT count(DISTINCT l_orderkey) AS nbask FROM li),
        |r AS (SELECT part_a, part_b, n_ab,
        |        (10000 * n_ab) // sa.n AS conf_bp,
        |        CAST((10000 * n_ab * nbask) // (sa.n * sb.n) AS BIGINT) AS lift_bp
        |      FROM bi
        |      JOIN supp sa ON part_a = sa.l_partkey
        |      JOIN supp sb ON part_b = sb.l_partkey
        |      CROSS JOIN nb)
        |SELECT part_a, part_b, n_ab, CAST(conf_bp AS BIGINT) AS conf_bp, lift_bp
        |FROM r WHERE conf_bp >= 500
        |ORDER BY part_a, part_b""".stripMargin,

    "q_price_index" ->
      """WITH li AS (
        |  SELECT l_partkey, year(CAST(l_shipdate AS DATE)) AS yr,
        |    CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_c,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem
        |  WHERE year(CAST(l_shipdate AS DATE)) IN (1996, 1997)
        |  GROUP BY 1, 2),
        |p AS (SELECT l_partkey, yr, rev_c // qty AS price_q, qty FROM li),
        |j AS (SELECT y0.l_partkey, y0.price_q AS p0, y0.qty AS q0,
        |        y1.price_q AS p1, y1.qty AS q1
        |      FROM (SELECT * FROM p WHERE yr = 1996) y0
        |      JOIN (SELECT * FROM p WHERE yr = 1997) y1 USING (l_partkey)),
        |m AS (SELECT count(*) AS n_parts,
        |        sum(p1*q0) AS l_num, sum(p0*q0) AS l_den,
        |        sum(p1*q1) AS p_num, sum(p0*q1) AS p_den
        |      FROM j)
        |SELECT CAST(n_parts AS BIGINT) AS n_parts,
        |  CAST((10000 * l_num) // l_den AS BIGINT) AS laspeyres_bp,
        |  CAST((10000 * p_num) // p_den AS BIGINT) AS paasche_bp,
        |  CAST(floor(sqrt(CAST((10000 * l_num) // l_den AS DOUBLE)
        |    * CAST((10000 * p_num) // p_den AS DOUBLE)) + 0.5) AS BIGINT) AS fisher_bp
        |FROM m""".stripMargin,

    "q_anova" ->
      // every division before the final F is an exact HUGEINT floor
      // division (s² fits HUGEINT) — cancellation-free integer SSB/SSW
      """WITH o AS (SELECT o_orderpriority AS grp,
        |            CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS x
        |          FROM orders),
        |g AS (SELECT grp, count(*) AS ng, sum(x) AS sg, sum(x*x) AS ssg
        |      FROM o GROUP BY 1),
        |q AS (SELECT grp, ng, sg, ssg, (sg * sg) // ng AS term FROM g),
        |m AS (SELECT count(*) AS k, sum(ng) AS n, sum(sg) AS s,
        |        sum(ssg) AS ss, sum(term) AS bq FROM q),
        |d AS (SELECT k, n, bq - (s * s) // n AS ssb, ss - bq AS ssw FROM m)
        |SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
        |  CAST(floor(
        |    (CAST(ssb AS DOUBLE) / (CAST(k AS DOUBLE) - 1.0))
        |    / (CAST(ssw AS DOUBLE) / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
        |    * 10000 + 0.5) AS BIGINT) AS f_bp
        |FROM d""".stripMargin,

    "q_kruskal" ->
      """WITH o AS (SELECT o_orderpriority AS grp,
        |            CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS x
        |          FROM orders),
        |bvg AS (SELECT x AS val, grp, count(*) AS cvg FROM o GROUP BY 1, 2),
        |bv AS (SELECT val, CAST(sum(cvg) AS BIGINT) AS cnt FROM bvg GROUP BY 1),
        |c AS (SELECT val, cnt, CAST(sum(cnt) OVER (ORDER BY val
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |      FROM bv),
        |r AS (SELECT val, 2*(cum - cnt) + cnt + 1 AS r2 FROM c),
        |pg AS (SELECT grp, CAST(sum(cvg) AS BIGINT) AS ng, sum(cvg * r.r2) AS rg2
        |       FROM bvg JOIN r ON bvg.val = r.val GROUP BY 1),
        |q AS (SELECT grp, ng, (rg2 * rg2) // (4 * ng) AS term FROM pg),
        |t AS (SELECT sum(cnt*cnt*cnt - cnt) AS tt FROM c),
        |m AS (SELECT count(*) AS k, sum(ng) AS n, sum(term) AS rq FROM q)
        |SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
        |  CAST(floor(
        |    (12.0/(CAST(n AS DOUBLE)*(CAST(n AS DOUBLE) + 1.0))
        |        * CAST(rq AS DOUBLE)
        |      - 3.0*(CAST(n AS DOUBLE) + 1.0))
        |    / (1.0 - CAST(tt AS DOUBLE)
        |        /(CAST(n AS DOUBLE)*CAST(n AS DOUBLE)*CAST(n AS DOUBLE) - CAST(n AS DOUBLE)))
        |    * 10000 + 0.5) AS BIGINT) AS h_bp
        |FROM m, t""".stripMargin,

    "q_woe" ->
      // one ln per category over exact doubled-integer halves (+0.5
      // smoothing); IV sums quantized terms in BIGINT
      """WITH hv AS (SELECT o_custkey,
        |             max(CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END) AS y
        |           FROM orders GROUP BY 1),
        |j AS (SELECT c_mktsegment, CAST(sum(y) AS BIGINT) AS g,
        |        CAST(sum(1 - y) AS BIGINT) AS b
        |      FROM customer JOIN hv ON c_custkey = o_custkey GROUP BY 1),
        |t AS (SELECT CAST(sum(g) AS BIGINT) AS gt, CAST(sum(b) AS BIGINT) AS bt
        |      FROM j),
        |w AS (SELECT c_mktsegment, g, b,
        |        CAST(floor(ln(CAST(2*g + 1 AS DOUBLE) * CAST(bt AS DOUBLE)
        |          / (CAST(2*b + 1 AS DOUBLE) * CAST(gt AS DOUBLE)))
        |          * 10000 + 0.5) AS BIGINT) AS woe_bp,
        |        (10000 * g) // gt AS pg_bp, (10000 * b) // bt AS pb_bp
        |      FROM j, t)
        |SELECT c_mktsegment, g AS n_good, b AS n_bad, woe_bp,
        |  CAST(sum((pg_bp - pb_bp) * woe_bp) OVER () AS BIGINT) AS iv_q
        |FROM w ORDER BY c_mktsegment""".stripMargin,

    "q_did" ->
      """WITH o AS (
        |  SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS treat,
        |    CASE WHEN CAST(o_orderdate AS DATE) >= DATE '1998-01-01'
        |      THEN 1 ELSE 0 END AS post,
        |    CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |m AS (SELECT
        |    sum(CASE WHEN treat = 1 AND post = 0 THEN 1 ELSE 0 END) AS nt0,
        |    sum(CASE WHEN treat = 1 AND post = 1 THEN 1 ELSE 0 END) AS nt1,
        |    sum(CASE WHEN treat = 0 AND post = 0 THEN 1 ELSE 0 END) AS nc0,
        |    sum(CASE WHEN treat = 0 AND post = 1 THEN 1 ELSE 0 END) AS nc1,
        |    sum(CASE WHEN treat = 1 AND post = 0 THEN cents ELSE 0 END) AS st0,
        |    sum(CASE WHEN treat = 1 AND post = 1 THEN cents ELSE 0 END) AS st1,
        |    sum(CASE WHEN treat = 0 AND post = 0 THEN cents ELSE 0 END) AS sc0,
        |    sum(CASE WHEN treat = 0 AND post = 1 THEN cents ELSE 0 END) AS sc1
        |  FROM o)
        |SELECT CAST(nt0 AS BIGINT) AS nt0, CAST(nt1 AS BIGINT) AS nt1,
        |  CAST(nc0 AS BIGINT) AS nc0, CAST(nc1 AS BIGINT) AS nc1,
        |  CAST(st0 // nt0 AS BIGINT) AS mean_t_pre_q,
        |  CAST(st1 // nt1 AS BIGINT) AS mean_t_post_q,
        |  CAST(sc0 // nc0 AS BIGINT) AS mean_c_pre_q,
        |  CAST(sc1 // nc1 AS BIGINT) AS mean_c_post_q,
        |  CAST(floor(
        |    ((CAST(st1 AS DOUBLE)/CAST(nt1 AS DOUBLE) - CAST(st0 AS DOUBLE)/CAST(nt0 AS DOUBLE))
        |      - (CAST(sc1 AS DOUBLE)/CAST(nc1 AS DOUBLE) - CAST(sc0 AS DOUBLE)/CAST(nc0 AS DOUBLE)))
        |    * 100 + 0.5) AS BIGINT) AS did_q
        |FROM m""".stripMargin,

    "q_nelson_aalen" ->
      // the additive-hazard twin of q_survival_km's product: per-step
      // quantized hazards sum in BIGINT under one window — no recursion
      """WITH ev AS (
        |  SELECT o_custkey,
        |    CAST(min(o_orderdate) AS DATE) AS first_d,
        |    CAST(max(o_orderdate) AS DATE) AS last_d
        |  FROM orders GROUP BY 1),
        |mx AS (SELECT max(last_d) AS mxd FROM ev),
        |subj AS (SELECT CAST(last_d - first_d AS BIGINT) AS duration,
        |           CASE WHEN mxd - last_d >= 365 THEN 1 ELSE 0 END AS event
        |         FROM ev, mx),
        |byt AS (SELECT duration, CAST(sum(event) AS BIGINT) AS d,
        |          CAST(sum(1 - event) AS BIGINT) AS c
        |        FROM subj GROUP BY 1),
        |tot AS (SELECT count(*) AS total FROM subj),
        |r0 AS (SELECT duration, d,
        |         CAST(total - COALESCE(sum(d + c) OVER (ORDER BY duration
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
        |       FROM byt, tot),
        |st AS (SELECT duration, n_risk, d,
        |         (1000000 * d) // n_risk AS h_step
        |       FROM r0 WHERE d > 0)
        |SELECT duration, n_risk, d AS n_events,
        |  CAST(sum(h_step) OVER (ORDER BY duration
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS hazard_q
        |FROM st ORDER BY duration""".stripMargin,

    "q_mde" ->
      """WITH o AS (
        |  SELECT CASE WHEN (o_custkey % 1048573) * 2654435761 % 1000000 < 500000
        |           THEN 0 ELSE 1 END AS v,
        |    CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |m AS (SELECT
        |    sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS n0,
        |    sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS n1,
        |    sum(cents) AS sx, sum(cents*cents) AS sxx
        |  FROM o),
        |d AS (SELECT n0, n1,
        |    (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)) AS nn,
        |    CAST(sx AS DOUBLE) AS sxd, CAST(sxx AS DOUBLE) AS sxxd
        |  FROM m),
        |f AS (SELECT n0, n1,
        |    (nn*sxxd - sxd*sxd) / (nn*(nn - 1.0)) AS varp
        |  FROM d)
        |SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
        |  CAST(floor(sqrt(varp) * 100 + 0.5) AS BIGINT) AS sigma_q,
        |  CAST(floor((1.959963984540054 + 0.8416212335729143)
        |    * sqrt(varp * (1.0/CAST(n0 AS DOUBLE) + 1.0/CAST(n1 AS DOUBLE)))
        |    * 100 + 0.5) AS BIGINT) AS mde_q
        |FROM f""".stripMargin,

    "q_dtw" ->
      // the banded DP replayed by anti-diagonal waves: cells on
      // diagonal i+j = d depend only on diagonals d-1 (left/up) and
      // d-2 (diagonal), so each recursion round computes wave d+1 and
      // RE-EMITS wave d — the working table always holds exactly the
      // two live diagonals. Exact BIGINT |a-b| costs; pairs whose
      // length gap exceeds the band never enter the DP and surface as
      // the documented -1 sentinel via the outer LEFT JOIN
      """WITH RECURSIVE daily AS (
        |  SELECT event_type AS k, CAST(ts AS DATE) AS d,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |ser AS (
        |  SELECT k, list(c ORDER BY d) AS xs FROM daily GROUP BY k),
        |pr AS (
        |  SELECT a.k AS k1, b.k AS k2, a.xs AS x1, b.xs AS x2,
        |         len(a.xs) AS n, len(b.xs) AS m
        |  FROM ser a JOIN ser b ON a.k < b.k),
        |dp(d, k1, k2, i, j, v) AS (
        |  SELECT 0, k1, k2, 0, 0, CAST(0 AS BIGINT) FROM pr
        |  WHERE abs(n - m) <= 7
        |  UNION ALL
        |  SELECT * FROM (
        |    SELECT d + 1 AS d, k1, k2, i, j, min(v) AS v FROM (
        |      SELECT d, k1, k2, i, j, v FROM dp WHERE i + j = d
        |      UNION ALL
        |      SELECT d, p.k1, p.k2, c.i, c.j,
        |        abs(p.x1[c.i] - p.x2[c.j]) + t.v AS v
        |      FROM dp t
        |      JOIN pr p ON p.k1 = t.k1 AND p.k2 = t.k2,
        |      LATERAL (VALUES (t.i + 1, t.j), (t.i, t.j + 1),
        |                      (t.i + 1, t.j + 1)) AS c(i, j)
        |      WHERE c.i + c.j = t.d + 1
        |        AND c.i >= 1 AND c.j >= 1 AND c.i <= p.n AND c.j <= p.m
        |        AND abs(c.i - c.j) <= 7
        |    ) GROUP BY d, k1, k2, i, j
        |  ) WHERE d <= (SELECT max(n + m) FROM pr)
        |)
        |SELECT p.k1, p.k2, CAST(p.n AS BIGINT) AS len1,
        |  CAST(p.m AS BIGINT) AS len2,
        |  coalesce(f.v, CAST(-1 AS BIGINT)) AS dtw
        |FROM pr p LEFT JOIN (
        |  SELECT k1, k2, i, j, v FROM dp QUALIFY row_number() OVER (
        |    PARTITION BY k1, k2, i, j ORDER BY d DESC) = 1
        |) f ON f.k1 = p.k1 AND f.k2 = p.k2 AND f.i = p.n AND f.j = p.m
        |ORDER BY p.k1, p.k2""".stripMargin,

    "q_isotonic" ->
      // the PAV pooling recursion replays through its CLOSED FORM:
      // fitted[i] = max_{j<=i} min_{l>=i} mean(y over levels j..l)
      // (the min-max characterization of the L2 isotonic fit), and the
      // >=-merge pools are exactly the maximal runs of equal fitted
      // value. Fractions order/compare by one exact scaled key:
      // floor(num*1e24/den) in HUGEINT — distinct fractions differ by
      // >= 1/(den1*den2), so the key is injective while total rows
      // stay under 1e12 (any realistic SF; num*1e24 <= 1e36 < the
      // 1.7e38 HUGEINT ceiling); O(levels^3) segment rows, bounded by
      // the ~110 acctbal bands, not data volume
      """WITH cust AS (
        |  SELECT c_custkey, CAST(floor(c_acctbal / 100) AS BIGINT) AS band
        |  FROM customer),
        |hv AS (
        |  SELECT o_custkey,
        |    max(CASE WHEN o_totalprice > 300000.0 THEN 1 ELSE 0 END) AS y
        |  FROM orders GROUP BY 1),
        |lv AS (
        |  SELECT band, count(*) AS n, sum(y) AS sy,
        |    row_number() OVER (ORDER BY band) AS i
        |  FROM cust JOIN hv ON c_custkey = o_custkey GROUP BY band),
        |pre AS (
        |  SELECT i, band, n, sy,
        |    sum(n) OVER (ORDER BY i) AS cn, sum(sy) OVER (ORDER BY i) AS cs
        |  FROM lv),
        |seg AS (
        |  SELECT a.i AS j, b.i AS l,
        |    (b.cs - a.cs + a.sy) AS num, (b.cn - a.cn + a.n) AS den
        |  FROM pre a JOIN pre b ON b.i >= a.i),
        |segk AS (
        |  SELECT j, l,
        |    CAST(num AS HUGEINT) * CAST('1000000000000000000000000' AS HUGEINT)
        |      // den AS key
        |  FROM seg),
        |inner_min AS (
        |  SELECT s.j, p.i, min(s.key) AS mn
        |  FROM segk s JOIN pre p ON s.j <= p.i AND s.l >= p.i
        |  GROUP BY s.j, p.i),
        |fitted AS (SELECT i, max(mn) AS fk FROM inner_min GROUP BY i),
        |runs AS (
        |  SELECT p.i, p.band, p.n, p.sy, f.fk,
        |    CASE WHEN lag(f.fk) OVER (ORDER BY p.i) = f.fk THEN 0 ELSE 1
        |    END AS brk
        |  FROM pre p JOIN fitted f ON p.i = f.i),
        |grp AS (SELECT *, sum(brk) OVER (ORDER BY i) AS g FROM runs)
        |SELECT min(band) AS x_lo, max(band) AS x_hi,
        |  CAST(sum(n) AS BIGINT) AS n_rows,
        |  CAST(sum(sy) * 10000 // sum(n) AS BIGINT) AS rate_bp
        |FROM grp GROUP BY g
        |ORDER BY x_lo""".stripMargin,

    "q_theilsen" ->
      // exact rational replay of the lower-median pairwise slope: fractions
      // dy/dx order by the two-part integer key (floor quotient, then the
      // remainder fraction scaled by 6162 = 79*78 > any dx1*dx2 product, so
      // distinct rationals can never share a key) - no float ordering
      // anywhere; the selected slope floors via the pmod trick
      """WITH c AS (SELECT c_custkey, c_nationkey FROM customer),
        |mon AS (
        |  SELECT CAST(c_nationkey AS VARCHAR) AS nation,
        |         date_trunc('month', CAST(o_orderdate AS DATE)) AS month,
        |         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_c
        |  FROM orders JOIN c ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |ser AS (
        |  SELECT nation, rev_c,
        |         CAST(row_number() OVER (PARTITION BY nation ORDER BY month) AS BIGINT) AS rn
        |  FROM mon),
        |pairs AS (
        |  SELECT a.nation, (b.rev_c - a.rev_c) AS dy, (b.rn - a.rn) AS dx
        |  FROM ser a JOIN ser b ON a.nation = b.nation AND b.rn > a.rn),
        |keyed AS (
        |  SELECT nation, dy, dx,
        |    (dy - ((dy % dx) + dx) % dx) // dx AS key1,
        |    (((dy % dx) + dx) % dx) * 6162 // dx AS key2
        |  FROM pairs),
        |ranked AS (
        |  SELECT nation, dy, dx,
        |    row_number() OVER (PARTITION BY nation ORDER BY key1, key2) AS rk,
        |    count(*) OVER (PARTITION BY nation) AS cnt
        |  FROM keyed),
        |med AS (
        |  SELECT nation, dy, dx, cnt FROM ranked WHERE rk = (cnt + 1) // 2)
        |SELECT m.nation,
        |  (SELECT count(*) FROM ser s WHERE s.nation = m.nation) AS n_points,
        |  CAST(m.cnt AS BIGINT) AS n_pairs,
        |  CAST((100 * dy - (((100 * dy) % dx) + dx) % dx) // dx AS BIGINT) AS slope_q
        |FROM med m
        |ORDER BY nation""".stripMargin,

    "q_voptimal_hist" ->
      // the VLDB98 DP replayed layer by layer: per-pair floor-integer SSE
      // costs once (m^2/2 rows over <=4096 distinct values), 8 unrolled
      // argmin layers with the same smallest-cut tie-break as the Scala DP,
      // then the boundary walk-back as chained scalar lookups - HUGEINT
      // throughout, bit-identical to the driver-side BigInt program
      """WITH lv AS (
        |  SELECT v, c, CAST(row_number() OVER (ORDER BY v) AS BIGINT) AS i FROM (
        |    SELECT CAST(n_chars AS BIGINT) AS v, count(*) AS c FROM documents GROUP BY 1)),
        |mm AS (SELECT max(i) AS m FROM lv),
        |pre AS (
        |  SELECT i, v,
        |    CAST(sum(c) OVER w AS HUGEINT) AS p0,
        |    CAST(sum(CAST(v AS HUGEINT) * c) OVER w AS HUGEINT) AS p1,
        |    CAST(sum(CAST(v AS HUGEINT) * v * c) OVER w AS HUGEINT) AS p2
        |  FROM lv WINDOW w AS (ORDER BY i ROWS UNBOUNDED PRECEDING)),
        |pre0 AS (
        |  SELECT CAST(0 AS BIGINT) AS i, CAST(0 AS HUGEINT) AS p0,
        |         CAST(0 AS HUGEINT) AS p1, CAST(0 AS HUGEINT) AS p2
        |  UNION ALL SELECT i, p0, p1, p2 FROM pre),
        |costs AS MATERIALIZED (
        |  SELECT l.i AS lo, h.i AS hi,
        |    ((h.p0 - l.p0) * (h.p2 - l.p2) - (h.p1 - l.p1) * (h.p1 - l.p1))
        |      // (h.p0 - l.p0) AS cost
        |  FROM pre0 l JOIN pre0 h ON h.i > l.i),
        |dp1 AS MATERIALIZED (SELECT hi AS j, cost AS dp, CAST(0 AS BIGINT) AS cut FROM costs WHERE lo = 0),
        |dp2 AS MATERIALIZED (SELECT j, dp, cut FROM (
        |  SELECT c.hi AS j, a.dp + c.cost AS dp, a.j AS cut,
        |    row_number() OVER (PARTITION BY c.hi ORDER BY a.dp + c.cost, a.j) AS rn
        |  FROM dp1 a JOIN costs c ON c.lo = a.j) WHERE rn = 1),
        |dp3 AS MATERIALIZED (SELECT j, dp, cut FROM (
        |  SELECT c.hi AS j, a.dp + c.cost AS dp, a.j AS cut,
        |    row_number() OVER (PARTITION BY c.hi ORDER BY a.dp + c.cost, a.j) AS rn
        |  FROM dp2 a JOIN costs c ON c.lo = a.j) WHERE rn = 1),
        |dp4 AS MATERIALIZED (SELECT j, dp, cut FROM (
        |  SELECT c.hi AS j, a.dp + c.cost AS dp, a.j AS cut,
        |    row_number() OVER (PARTITION BY c.hi ORDER BY a.dp + c.cost, a.j) AS rn
        |  FROM dp3 a JOIN costs c ON c.lo = a.j) WHERE rn = 1),
        |dp5 AS MATERIALIZED (SELECT j, dp, cut FROM (
        |  SELECT c.hi AS j, a.dp + c.cost AS dp, a.j AS cut,
        |    row_number() OVER (PARTITION BY c.hi ORDER BY a.dp + c.cost, a.j) AS rn
        |  FROM dp4 a JOIN costs c ON c.lo = a.j) WHERE rn = 1),
        |dp6 AS MATERIALIZED (SELECT j, dp, cut FROM (
        |  SELECT c.hi AS j, a.dp + c.cost AS dp, a.j AS cut,
        |    row_number() OVER (PARTITION BY c.hi ORDER BY a.dp + c.cost, a.j) AS rn
        |  FROM dp5 a JOIN costs c ON c.lo = a.j) WHERE rn = 1),
        |dp7 AS MATERIALIZED (SELECT j, dp, cut FROM (
        |  SELECT c.hi AS j, a.dp + c.cost AS dp, a.j AS cut,
        |    row_number() OVER (PARTITION BY c.hi ORDER BY a.dp + c.cost, a.j) AS rn
        |  FROM dp6 a JOIN costs c ON c.lo = a.j) WHERE rn = 1),
        |dp8 AS MATERIALIZED (SELECT j, dp, cut FROM (
        |  SELECT c.hi AS j, a.dp + c.cost AS dp, a.j AS cut,
        |    row_number() OVER (PARTITION BY c.hi ORDER BY a.dp + c.cost, a.j) AS rn
        |  FROM dp7 a JOIN costs c ON c.lo = a.j) WHERE rn = 1),
        |w8 AS (SELECT cut AS b FROM dp8 WHERE j = (SELECT m FROM mm)),
        |w7 AS (SELECT cut AS b FROM dp7 WHERE j = (SELECT b FROM w8)),
        |w6 AS (SELECT cut AS b FROM dp6 WHERE j = (SELECT b FROM w7)),
        |w5 AS (SELECT cut AS b FROM dp5 WHERE j = (SELECT b FROM w6)),
        |w4 AS (SELECT cut AS b FROM dp4 WHERE j = (SELECT b FROM w5)),
        |w3 AS (SELECT cut AS b FROM dp3 WHERE j = (SELECT b FROM w4)),
        |w2 AS (SELECT cut AS b FROM dp2 WHERE j = (SELECT b FROM w3)),
        |segs AS (
        |  SELECT 1 AS bucket, CAST(0 AS BIGINT) AS lo, (SELECT b FROM w2) AS hi
        |  UNION ALL SELECT 2, (SELECT b FROM w2), (SELECT b FROM w3)
        |  UNION ALL SELECT 3, (SELECT b FROM w3), (SELECT b FROM w4)
        |  UNION ALL SELECT 4, (SELECT b FROM w4), (SELECT b FROM w5)
        |  UNION ALL SELECT 5, (SELECT b FROM w5), (SELECT b FROM w6)
        |  UNION ALL SELECT 6, (SELECT b FROM w6), (SELECT b FROM w7)
        |  UNION ALL SELECT 7, (SELECT b FROM w7), (SELECT b FROM w8)
        |  UNION ALL SELECT 8, (SELECT b FROM w8), (SELECT m FROM mm))
        |SELECT CAST(s.bucket AS BIGINT) AS bucket,
        |  (SELECT v FROM lv WHERE i = s.lo + 1) AS lo,
        |  (SELECT v FROM lv WHERE i = s.hi) AS hi,
        |  CAST(h.p0 - l.p0 AS BIGINT) AS n_rows,
        |  CAST((100 * (h.p1 - l.p1)) // (h.p0 - l.p0) AS BIGINT) AS mean_q,
        |  CAST(((h.p0 - l.p0) * (h.p2 - l.p2) - (h.p1 - l.p1) * (h.p1 - l.p1))
        |    // (h.p0 - l.p0) AS BIGINT) AS sse_q
        |FROM segs s JOIN pre0 l ON l.i = s.lo JOIN pre0 h ON h.i = s.hi
        |ORDER BY bucket""".stripMargin,

    "q_changepoints" ->
      // greedy binary segmentation replayed with EXACT rational compares:
      // per segment the argmin of sse_l+sse_r orders by the two-part key
      // (floor(N/D), then the remainder scaled by 1e27 in HUGEINT) so no
      // float can flip a pick. INJECTIVITY BOUND (round-10 sweep): two
      // distinct candidate rationals differ by >= 1/(D1*D2) with
      // D = (k-lo)(hi-k) <= L^2/4, so the old 2e12 scale was MARGINAL at
      // the ~2400-day series (min gap 4.8e-13 vs 5e-13 resolution); 1e27
      // is injective up to L ~ 8e5 periods (overflow-bound: D*1e27 <
      // HUGEINT max), far past the maxLen=65536 collect guard.
      // Significance and permille are pure HUGEINT cross-multiplications. Three unrolled levels (> the observed depth;
      // a deeper tree would mismatch loudly, not silently) and the
      // root-candidate fallback row when nothing clears the gate
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS rev_c
        |  FROM orders GROUP BY 1),
        |ser AS (SELECT d, rev_c, CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i FROM daily),
        |nn AS (SELECT max(i) AS n FROM ser),
        |pre0 AS (
        |  SELECT CAST(0 AS BIGINT) AS i, CAST(0 AS HUGEINT) AS p1, CAST(0 AS HUGEINT) AS p2
        |  UNION ALL
        |  SELECT i,
        |    CAST(sum(CAST(rev_c AS HUGEINT)) OVER w AS HUGEINT),
        |    CAST(sum(CAST(rev_c AS HUGEINT) * rev_c) OVER w AS HUGEINT)
        |  FROM ser WINDOW w AS (ORDER BY i ROWS UNBOUNDED PRECEDING)),
        |segs0 AS (SELECT CAST(0 AS BIGINT) AS lo, (SELECT n FROM nn) AS hi),
        |cand0 AS (
        |  SELECT s.lo, s.hi, kk.i AS k,
        |    ((kk.i - s.lo) * (pk.p2 - pl.p2) - (pk.p1 - pl.p1) * (pk.p1 - pl.p1)) * (s.hi - kk.i)
        |      + ((s.hi - kk.i) * (ph.p2 - pk.p2) - (ph.p1 - pk.p1) * (ph.p1 - pk.p1)) * (kk.i - s.lo) AS nm,
        |    CAST((kk.i - s.lo) * (s.hi - kk.i) AS HUGEINT) AS dn,
        |    ((s.hi - s.lo) * (ph.p2 - pl.p2) - (ph.p1 - pl.p1) * (ph.p1 - pl.p1)) AS nump,
        |    CAST(s.hi - s.lo AS HUGEINT) AS lenp,
        |    (pk.p1 - pl.p1) AS s1l, (ph.p1 - pk.p1) AS s1r
        |  FROM segs0 s
        |  JOIN pre0 kk ON kk.i >= s.lo + 30 AND kk.i <= s.hi - 30
        |  JOIN pre0 pl ON pl.i = s.lo JOIN pre0 pk ON pk.i = kk.i JOIN pre0 ph ON ph.i = s.hi),
        |best0 AS (
        |  SELECT *, (1000 * (nump * dn - nm * lenp) > 100 * nump * dn) AS sig FROM (
        |    SELECT *, row_number() OVER (PARTITION BY lo, hi
        |      ORDER BY nm // dn, ((nm % dn) * CAST('1000000000000000000000000000' AS HUGEINT)) // dn, k) AS rn
        |    FROM cand0) WHERE rn = 1),
        |acc0 AS (SELECT * FROM best0 WHERE sig),
        |segs1 AS (SELECT lo, k AS hi FROM acc0 UNION ALL SELECT k, hi FROM acc0),
        |cand1 AS (
        |  SELECT s.lo, s.hi, kk.i AS k,
        |    ((kk.i - s.lo) * (pk.p2 - pl.p2) - (pk.p1 - pl.p1) * (pk.p1 - pl.p1)) * (s.hi - kk.i)
        |      + ((s.hi - kk.i) * (ph.p2 - pk.p2) - (ph.p1 - pk.p1) * (ph.p1 - pk.p1)) * (kk.i - s.lo) AS nm,
        |    CAST((kk.i - s.lo) * (s.hi - kk.i) AS HUGEINT) AS dn,
        |    ((s.hi - s.lo) * (ph.p2 - pl.p2) - (ph.p1 - pl.p1) * (ph.p1 - pl.p1)) AS nump,
        |    CAST(s.hi - s.lo AS HUGEINT) AS lenp,
        |    (pk.p1 - pl.p1) AS s1l, (ph.p1 - pk.p1) AS s1r
        |  FROM segs1 s
        |  JOIN pre0 kk ON kk.i >= s.lo + 30 AND kk.i <= s.hi - 30
        |  JOIN pre0 pl ON pl.i = s.lo JOIN pre0 pk ON pk.i = kk.i JOIN pre0 ph ON ph.i = s.hi),
        |best1 AS (
        |  SELECT *, (1000 * (nump * dn - nm * lenp) > 100 * nump * dn) AS sig FROM (
        |    SELECT *, row_number() OVER (PARTITION BY lo, hi
        |      ORDER BY nm // dn, ((nm % dn) * CAST('1000000000000000000000000000' AS HUGEINT)) // dn, k) AS rn
        |    FROM cand1) WHERE rn = 1),
        |acc1 AS (SELECT * FROM best1 WHERE sig),
        |segs2 AS (SELECT lo, k AS hi FROM acc1 UNION ALL SELECT k, hi FROM acc1),
        |cand2 AS (
        |  SELECT s.lo, s.hi, kk.i AS k,
        |    ((kk.i - s.lo) * (pk.p2 - pl.p2) - (pk.p1 - pl.p1) * (pk.p1 - pl.p1)) * (s.hi - kk.i)
        |      + ((s.hi - kk.i) * (ph.p2 - pk.p2) - (ph.p1 - pk.p1) * (ph.p1 - pk.p1)) * (kk.i - s.lo) AS nm,
        |    CAST((kk.i - s.lo) * (s.hi - kk.i) AS HUGEINT) AS dn,
        |    ((s.hi - s.lo) * (ph.p2 - pl.p2) - (ph.p1 - pl.p1) * (ph.p1 - pl.p1)) AS nump,
        |    CAST(s.hi - s.lo AS HUGEINT) AS lenp,
        |    (pk.p1 - pl.p1) AS s1l, (ph.p1 - pk.p1) AS s1r
        |  FROM segs2 s
        |  JOIN pre0 kk ON kk.i >= s.lo + 30 AND kk.i <= s.hi - 30
        |  JOIN pre0 pl ON pl.i = s.lo JOIN pre0 pk ON pk.i = kk.i JOIN pre0 ph ON ph.i = s.hi),
        |best2 AS (
        |  SELECT *, (1000 * (nump * dn - nm * lenp) > 100 * nump * dn) AS sig FROM (
        |    SELECT *, row_number() OVER (PARTITION BY lo, hi
        |      ORDER BY nm // dn, ((nm % dn) * CAST('1000000000000000000000000000' AS HUGEINT)) // dn, k) AS rn
        |    FROM cand2) WHERE rn = 1),
        |acc2 AS (SELECT * FROM best2 WHERE sig),
        |chosen AS (
        |  SELECT * FROM acc0 UNION ALL SELECT * FROM acc1 UNION ALL SELECT * FROM acc2
        |  UNION ALL SELECT * FROM best0 WHERE NOT sig)
        |SELECT strftime((SELECT d FROM ser WHERE i = c.k + 1), '%Y-%m-%d') AS cp_date,
        |  CAST((100 * s1l) // (c.k - c.lo) AS BIGINT) AS left_mean_q,
        |  CAST((100 * s1r) // (c.hi - c.k) AS BIGINT) AS right_mean_q,
        |  CAST(CASE WHEN nump = 0 THEN 0
        |       ELSE (1000 * (nump * dn - nm * lenp)) // (nump * dn) END AS BIGINT) AS gain_permille,
        |  sig AS significant
        |FROM chosen c
        |ORDER BY cp_date""".stripMargin,

    "q_neyman_sample" ->
      // replicates Allocate.largestRemainder's arithmetic (the
      // q_allocate oracle pattern) with variance-aware weights
      """WITH d AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS x
        |           FROM documents),
        |m AS (SELECT source, count(*) AS nh, sum(x) AS sx, sum(x*x) AS sxx
        |      FROM d GROUP BY 1),
        |w AS (SELECT source, nh,
        |        CAST(floor(sqrt(greatest(CASE WHEN nh > 1 THEN
        |          (CAST(nh AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
        |          / (CAST(nh AS DOUBLE)*(CAST(nh AS DOUBLE) - 1.0))
        |          ELSE 0.0 END, 0.0)) * 100 + 0.5) AS BIGINT) AS sh_q
        |      FROM m),
        |wt AS (SELECT source, nh * sh_q AS wgt FROM w),
        |tot AS (SELECT sum(wgt) AS t FROM wt),
        |b AS (SELECT source, wgt, (500 * wgt) // t AS base,
        |        (500 * wgt) % t AS rem
        |      FROM wt, tot),
        |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rnk,
        |        500 - sum(base) OVER () AS deficit FROM b),
        |q AS (SELECT source,
        |        CAST(base + CASE WHEN rnk <= deficit THEN 1 ELSE 0 END AS BIGINT) AS n_take
        |      FROM r),
        |p AS (SELECT doc_id, source,
        |        row_number() OVER (PARTITION BY source
        |          ORDER BY (doc_id % 1048573) * 2654435761 % 1000000, doc_id) AS rk
        |      FROM d)
        |SELECT p.doc_id, p.source FROM p JOIN q USING (source)
        |WHERE p.rk <= q.n_take ORDER BY p.doc_id""".stripMargin,

    "q_mann_whitney" ->
      // value-level tied ranks from one cumulative sum; u2 = 2·U1
      // exact integer; tie-corrected z mirrors the Spark parens
      """WITH o AS (
        |  SELECT CASE WHEN (o_custkey % 1048573) * 2654435761 % 1000000 < 500000
        |           THEN 0 ELSE 1 END AS v,
        |    CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |byv AS (SELECT cents AS val, count(*) AS cnt,
        |          sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS cnt1
        |        FROM o GROUP BY 1),
        |c AS (SELECT val, cnt, cnt1,
        |        CAST(sum(cnt) OVER (ORDER BY val
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |      FROM byv),
        |m AS (SELECT sum(cnt - cnt1) AS n0, sum(cnt1) AS n1,
        |        sum(cnt1 * (2*(cum - cnt) + cnt + 1)) AS r12,
        |        sum(cnt*cnt*cnt - cnt) AS t
        |      FROM c)
        |SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
        |  CAST(r12 - n1*(n1 + 1) AS BIGINT) AS u2,
        |  CAST(floor(
        |    (CAST(r12 - n1*(n1 + 1) AS DOUBLE)/2.0
        |      - CAST(n0 AS DOUBLE)*CAST(n1 AS DOUBLE)/2.0)
        |    / sqrt((CAST(n0 AS DOUBLE)*CAST(n1 AS DOUBLE)/12.0) *
        |        ((CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE) + 1.0)
        |          - CAST(t AS DOUBLE) / ((CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE))
        |            * (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE) - 1.0))))
        |    * 10000 + 0.5) AS BIGINT) AS z_bp
        |FROM m""".stripMargin,

    "q_forecast_backtest" ->
      // q_holt's recursive CTE + lagged one-step-ahead errors; all
      // ratios and means are floor divisions on non-negative BIGINTs
      """WITH RECURSIVE mon AS (
        |  SELECT c_nationkey AS nation,
        |    CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |    CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |s AS (SELECT nation, month, rev_c,
        |        row_number() OVER (PARTITION BY nation ORDER BY month) AS rn
        |      FROM mon),
        |r AS (
        |  SELECT nation, month, rev_c, rn, rev_c AS l, CAST(0 AS BIGINT) AS b
        |  FROM s WHERE rn = 1
        |  UNION ALL
        |  SELECT s.nation, s.month, s.rev_c, s.rn,
        |    ((s.rev_c + 3*(r.l + r.b))
        |      - (((s.rev_c + 3*(r.l + r.b)) % 4) + 4) % 4) // 4,
        |    ((((s.rev_c + 3*(r.l + r.b))
        |        - (((s.rev_c + 3*(r.l + r.b)) % 4) + 4) % 4) // 4 - r.l + 3*r.b)
        |      - (((((s.rev_c + 3*(r.l + r.b))
        |        - (((s.rev_c + 3*(r.l + r.b)) % 4) + 4) % 4) // 4 - r.l + 3*r.b) % 4) + 4) % 4) // 4
        |  FROM s JOIN r ON s.nation = r.nation AND s.rn = r.rn + 1),
        |f AS (SELECT nation, month, rev_c,
        |        lag(l + b) OVER (PARTITION BY nation ORDER BY month) AS fc_holt,
        |        lag(rev_c) OVER (PARTITION BY nation ORDER BY month) AS fc_naive
        |      FROM r),
        |e AS (SELECT nation,
        |        (10000 * abs(rev_c - fc_holt)) // rev_c AS ape_holt,
        |        (10000 * abs(rev_c - fc_naive)) // rev_c AS ape_naive
        |      FROM f WHERE fc_holt IS NOT NULL AND rev_c > 0)
        |SELECT nation, count(*) AS n_evals,
        |  CAST(sum(ape_holt) // count(*) AS BIGINT) AS mape_holt_bp,
        |  CAST(sum(ape_naive) // count(*) AS BIGINT) AS mape_naive_bp
        |FROM e GROUP BY 1 ORDER BY nation""".stripMargin,

    "q_ppr" ->
      // q_pagerank's unrolled rounds with a seed-restricted restart
      // vector: p0 and the teleport term are zero off-seed
      """WITH tr AS (
        |  SELECT l_partkey AS src,
        |         lead(l_partkey) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) AS dst
        |  FROM lineitem),
        |e AS (SELECT src, dst, count(*) AS w FROM tr WHERE dst IS NOT NULL GROUP BY 1, 2),
        |o AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM e GROUP BY 1),
        |nodes AS (SELECT DISTINCT src AS node FROM e UNION SELECT DISTINCT dst FROM e),
        |seeds AS (SELECT p_partkey AS node FROM part WHERE p_brand = 'Brand#11'),
        |nb AS (SELECT n.node,
        |         CAST(CASE WHEN s.node IS NOT NULL THEN 150000 ELSE 0 END AS BIGINT) AS base,
        |         CAST(CASE WHEN s.node IS NOT NULL THEN 1000000 ELSE 0 END AS BIGINT) AS pr0
        |       FROM nodes n LEFT JOIN seeds s ON n.node = s.node),
        |i1 AS (SELECT e.dst AS node, CAST(sum((((p.pr0 * e.w) // o.ow) * 85) // 100) AS BIGINT) AS infl
        |       FROM e JOIN nb p ON e.src = p.node JOIN o ON e.src = o.src GROUP BY e.dst),
        |p1 AS (SELECT n.node, n.base, CAST(n.base + coalesce(i.infl, 0) AS BIGINT) AS pr
        |       FROM nb n LEFT JOIN i1 i ON n.node = i.node),
        |i2 AS (SELECT e.dst AS node, CAST(sum((((p.pr * e.w) // o.ow) * 85) // 100) AS BIGINT) AS infl
        |       FROM e JOIN p1 p ON e.src = p.node JOIN o ON e.src = o.src GROUP BY e.dst),
        |p2 AS (SELECT n.node, n.base, CAST(n.base + coalesce(i.infl, 0) AS BIGINT) AS pr
        |       FROM p1 n LEFT JOIN i2 i ON n.node = i.node),
        |i3 AS (SELECT e.dst AS node, CAST(sum((((p.pr * e.w) // o.ow) * 85) // 100) AS BIGINT) AS infl
        |       FROM e JOIN p2 p ON e.src = p.node JOIN o ON e.src = o.src GROUP BY e.dst),
        |p3 AS (SELECT n.node, CAST(n.base + coalesce(i.infl, 0) AS BIGINT) AS pr
        |       FROM p2 n LEFT JOIN i3 i ON n.node = i.node)
        |SELECT node, pr FROM p3 WHERE pr > 0 ORDER BY node""".stripMargin,

    "q_pseudonymize" ->
      """SELECT event_id,
        |  'u_' || substr(md5('graft:' || user_id), 1, 12) AS user_token,
        |  event_type, value
        |FROM events ORDER BY event_id""".stripMargin,

    "q_event_paths" ->
      """WITH p AS (
        |  SELECT lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t1,
        |         lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2,
        |         event_type AS t3
        |  FROM events)
        |SELECT t1, t2, t3, count(*) AS n
        |FROM p WHERE t1 IS NOT NULL AND t2 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n DESC, t1, t2, t3 LIMIT 20""".stripMargin,

    "q_rolling_active" ->
      """WITH du AS (
        |  SELECT DISTINCT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day, user_id
        |  FROM events),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM du),
        |f AS (SELECT du.day + o.off AS asof_day, du.user_id
        |      FROM du CROSS JOIN range(0, 7) o(off))
        |SELECT asof_day, count(DISTINCT user_id) AS wau
        |FROM f, b WHERE asof_day >= b.d0 + 6 AND asof_day <= b.d1
        |GROUP BY asof_day ORDER BY asof_day""".stripMargin,

    "q_latency_profile" ->
      // discrete rank-selected p50/p90 (element selection, bit-exact)
      """WITH lat AS (
        |  SELECT o.o_orderpriority,
        |    date_diff('day', CAST(o.o_orderdate AS DATE),
        |      CAST(l.l_shipdate AS DATE)) AS lat
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |r AS (
        |  SELECT o_orderpriority, lat,
        |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY lat) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM lat WHERE lat IS NOT NULL)
        |SELECT o_orderpriority, CAST(max(n) AS BIGINT) AS n,
        |  CAST(max(CASE WHEN rn = (n + 1) // 2 THEN lat END) AS BIGINT) AS p50_days,
        |  CAST(max(CASE WHEN rn = greatest((n * 9000 + 9999) // 10000, 1) THEN lat END) AS BIGINT) AS p90_days
        |FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_attribution_last_touch" ->
      // DuckDB's native ASOF LEFT JOIN (backward, inclusive) + the same
      // 24h lookback null-out
      """WITH p AS (SELECT event_id, user_id, ts FROM events
        |           WHERE event_type = 'purchase'),
        |t AS (SELECT user_id, ts, max(event_id) AS touch_id FROM events
        |      WHERE event_type IN ('view', 'click') GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id,
        |  CASE WHEN t.ts IS NOT NULL AND
        |    CAST(floor(epoch(p.ts)) AS BIGINT) - CAST(floor(epoch(t.ts)) AS BIGINT) <= 86400
        |    THEN t.touch_id END AS credited_touch_id
        |FROM p ASOF LEFT JOIN t ON p.user_id = t.user_id AND p.ts >= t.ts
        |ORDER BY p.event_id""".stripMargin,

    "q_score_calibrate" ->
      """WITH r AS (
        |  SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rk,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM documents)
        |SELECT doc_id, source, n_chars,
        |  CASE WHEN n = 1 THEN 5000
        |       ELSE ((rk - 1) * 10000) // (n - 1) END AS pct_bp
        |FROM r ORDER BY doc_id""".stripMargin,

    "q_chi_square" ->
      // exact BIGINT inner term (obs·n − na·nb), one pinned double
      // division per cell, quantized terms sum in BIGINT (CAST per
      // SURVEY §6 — DuckDB window sums of BIGINT go HUGEINT)
      """WITH cells AS (SELECT c_nationkey, c_mktsegment, count(*) AS o
        |               FROM customer GROUP BY 1, 2),
        |a AS (SELECT c_nationkey, count(*) AS na FROM customer GROUP BY 1),
        |b AS (SELECT c_mktsegment, count(*) AS nb FROM customer GROUP BY 1),
        |t AS (SELECT count(*) AS n FROM customer),
        |k AS (SELECT (SELECT count(*) FROM a) AS ka, (SELECT count(*) FROM b) AS kb),
        |g AS (SELECT a.c_nationkey, b.c_mktsegment,
        |        COALESCE(cells.o, 0) AS obs, a.na, b.nb, t.n, k.ka, k.kb
        |      FROM a CROSS JOIN b CROSS JOIN t CROSS JOIN k
        |      LEFT JOIN cells ON cells.c_nationkey = a.c_nationkey
        |        AND cells.c_mktsegment = b.c_mktsegment),
        |u AS (SELECT c_nationkey, c_mktsegment, obs,
        |        CAST(floor((CAST(obs*n - na*nb AS DOUBLE) * CAST(obs*n - na*nb AS DOUBLE))
        |          / (CAST(n AS DOUBLE) * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
        |          * 10000 + 0.5) AS BIGINT) AS term_bp,
        |        CAST((ka - 1) * (kb - 1) AS BIGINT) AS dof
        |      FROM g)
        |SELECT c_nationkey, c_mktsegment, obs, term_bp, dof,
        |  CAST(sum(term_bp) OVER () AS BIGINT) AS chi2_bp
        |FROM u ORDER BY c_nationkey, c_mktsegment""".stripMargin,

    "q_ab_test" ->
      // moments exact (cents² fits BIGINT, sums exact in HUGEINT =
      // Spark's DECIMAL(38,0)); means exact floor-divided integers;
      // t and z finishes mirror the Spark parenthesization exactly
      """WITH o AS (
        |  SELECT CASE WHEN (o_custkey % 1048573) * 2654435761 % 1000000 < 500000
        |           THEN 0 ELSE 1 END AS v,
        |    CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |m AS (SELECT
        |    CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    sum(CASE WHEN v = 0 THEN cents ELSE 0 END) AS s0,
        |    sum(CASE WHEN v = 1 THEN cents ELSE 0 END) AS s1,
        |    sum(CASE WHEN v = 0 THEN cents*cents ELSE 0 END) AS ss0,
        |    sum(CASE WHEN v = 1 THEN cents*cents ELSE 0 END) AS ss1,
        |    CAST(sum(CASE WHEN v = 0 AND cents > 20000000 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(sum(CASE WHEN v = 1 AND cents > 20000000 THEN 1 ELSE 0 END) AS BIGINT) AS c1
        |  FROM o)
        |SELECT n0, n1,
        |  CAST(s0 // n0 AS BIGINT) AS mean0_q,
        |  CAST(s1 // n1 AS BIGINT) AS mean1_q,
        |  CAST(floor(
        |    (CAST(s1 AS DOUBLE)/CAST(n1 AS DOUBLE) - CAST(s0 AS DOUBLE)/CAST(n0 AS DOUBLE))
        |    / sqrt(
        |      ((CAST(n1 AS DOUBLE)*CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE)*CAST(s1 AS DOUBLE))
        |        / (CAST(n1 AS DOUBLE)*(CAST(n1 AS DOUBLE) - 1.0))) / CAST(n1 AS DOUBLE)
        |      + ((CAST(n0 AS DOUBLE)*CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE)*CAST(s0 AS DOUBLE))
        |        / (CAST(n0 AS DOUBLE)*(CAST(n0 AS DOUBLE) - 1.0))) / CAST(n0 AS DOUBLE))
        |    * 10000 + 0.5) AS BIGINT) AS t_bp,
        |  c0 AS conv0, c1 AS conv1,
        |  CAST(floor(
        |    (CAST(c1 AS DOUBLE)/CAST(n1 AS DOUBLE) - CAST(c0 AS DOUBLE)/CAST(n0 AS DOUBLE))
        |    / sqrt(
        |      ((CAST(c0 AS DOUBLE) + CAST(c1 AS DOUBLE)) / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)))
        |      * (1.0 - (CAST(c0 AS DOUBLE) + CAST(c1 AS DOUBLE)) / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)))
        |      * (1.0/CAST(n0 AS DOUBLE) + 1.0/CAST(n1 AS DOUBLE)))
        |    * 10000 + 0.5) AS BIGINT) AS z_bp
        |FROM m""".stripMargin,

    "q_survival_km" ->
      // the product-limit fold unrolled as a recursive CTE over EVENT
      // times; every quantity non-negative, so // replays floorDiv
      """WITH RECURSIVE ev AS (
        |  SELECT o_custkey,
        |    CAST(min(o_orderdate) AS DATE) AS first_d,
        |    CAST(max(o_orderdate) AS DATE) AS last_d
        |  FROM orders GROUP BY 1),
        |mx AS (SELECT max(last_d) AS mxd FROM ev),
        |subj AS (SELECT CAST(last_d - first_d AS BIGINT) AS duration,
        |           CASE WHEN mxd - last_d >= 365 THEN 1 ELSE 0 END AS event
        |         FROM ev, mx),
        |byt AS (SELECT duration, CAST(sum(event) AS BIGINT) AS d,
        |          CAST(sum(1 - event) AS BIGINT) AS c
        |        FROM subj GROUP BY 1),
        |tot AS (SELECT count(*) AS total FROM subj),
        |r0 AS (SELECT duration, d,
        |         CAST(total - COALESCE(sum(d + c) OVER (ORDER BY duration
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
        |       FROM byt, tot),
        |step AS (SELECT duration, n_risk, d,
        |           row_number() OVER (ORDER BY duration) AS rn
        |         FROM r0 WHERE d > 0),
        |r AS (
        |  SELECT duration, n_risk, d, rn,
        |    (1000000000 * (n_risk - d)) // n_risk AS surv FROM step WHERE rn = 1
        |  UNION ALL
        |  SELECT s.duration, s.n_risk, s.d, s.rn,
        |    (r.surv * (s.n_risk - s.d)) // s.n_risk
        |  FROM step s JOIN r ON s.rn = r.rn + 1)
        |SELECT duration, n_risk, d AS n_events, CAST(surv AS BIGINT) AS surv_q
        |FROM r ORDER BY duration""".stripMargin,

    "q_acf" ->
      // per-lag Pearson from exact sums; the correlation finish
      // mirrors the Spark parenthesization exactly
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |s AS (SELECT x, row_number() OVER (ORDER BY d) AS rn FROM daily),
        |lags AS (SELECT unnest(range(1, 8)) AS lag),
        |pairs AS (SELECT lags.lag, a.x AS xv, b.x AS yv
        |          FROM s a CROSS JOIN lags
        |          JOIN s b ON b.rn = a.rn + lags.lag),
        |m AS (SELECT lag, count(*) AS n_pairs,
        |        sum(xv) AS sx, sum(yv) AS sy, sum(xv*xv) AS sxx,
        |        sum(yv*yv) AS syy, sum(xv*yv) AS sxy
        |      FROM pairs GROUP BY 1)
        |SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
        |  CAST(floor(
        |    (CAST(n_pairs AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
        |    / sqrt((CAST(n_pairs AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
        |      * (CAST(n_pairs AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE)))
        |    * 10000 + 0.5) AS BIGINT) AS acf_bp
        |FROM m ORDER BY lag""".stripMargin,

    "q_seasonal" ->
      // floor division via pmod-subtract on BOTH engines (DuckDB's //
      // truncates on negatives — probed, not assumed); the numerators
      // are exactly divisible so the engine convention cancels out
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM orders GROUP BY 1),
        |s AS (SELECT d, rev_c, (d - DATE '1970-01-01') % 7 AS dow,
        |        row_number() OVER (ORDER BY d) AS rn FROM daily),
        |tr AS (SELECT d, rev_c, dow,
        |         CASE WHEN count(*) OVER w = 7 THEN
        |           CAST((sum(rev_c) OVER w
        |             - (((sum(rev_c) OVER w) % 7) + 7) % 7) // 7 AS BIGINT)
        |         END AS trend_c
        |       FROM s WINDOW w AS (ORDER BY rn ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |se AS (SELECT dow,
        |         CAST((sum(rev_c - trend_c)
        |           - (((sum(rev_c - trend_c)) % count(*)) + count(*)) % count(*))
        |           // count(*) AS BIGINT) AS seasonal_c
        |       FROM tr WHERE trend_c IS NOT NULL GROUP BY dow)
        |SELECT strftime(tr.d, '%Y-%m-%d') AS d, tr.rev_c, tr.trend_c,
        |  se.seasonal_c, tr.rev_c - tr.trend_c - se.seasonal_c AS resid_c
        |FROM tr LEFT JOIN se USING (dow) ORDER BY tr.d""".stripMargin,

    "q_holt" ->
      // the two-state recurrence unrolled; the level feeds the trend
      // update within one step, so its floor expression repeats
      // textually (recursive arms cannot name intermediates); floor
      // via pmod-subtract — the numerators can go negative
      """WITH RECURSIVE mon AS (
        |  SELECT c_nationkey AS nation,
        |    CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |    CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |s AS (SELECT nation, month, rev_c,
        |        row_number() OVER (PARTITION BY nation ORDER BY month) AS rn
        |      FROM mon),
        |r AS (
        |  SELECT nation, month, rev_c, rn, rev_c AS l, CAST(0 AS BIGINT) AS b
        |  FROM s WHERE rn = 1
        |  UNION ALL
        |  SELECT s.nation, s.month, s.rev_c, s.rn,
        |    ((s.rev_c + 3*(r.l + r.b))
        |      - (((s.rev_c + 3*(r.l + r.b)) % 4) + 4) % 4) // 4,
        |    ((((s.rev_c + 3*(r.l + r.b))
        |        - (((s.rev_c + 3*(r.l + r.b)) % 4) + 4) % 4) // 4 - r.l + 3*r.b)
        |      - (((((s.rev_c + 3*(r.l + r.b))
        |        - (((s.rev_c + 3*(r.l + r.b)) % 4) + 4) % 4) // 4 - r.l + 3*r.b) % 4) + 4) % 4) // 4
        |  FROM s JOIN r ON s.nation = r.nation AND s.rn = r.rn + 1)
        |SELECT nation, strftime(month, '%Y-%m') AS month, rev_c,
        |  CAST(l + b AS BIGINT) AS holt_q
        |FROM r ORDER BY nation, month""".stripMargin,

    "q_holt_winters" ->
      // the triple recurrence WITH its 12-slot seasonal ring, replayed by a
      // LIST-carrying recursive CTE: state per step = (l, b, season BIGINT[12]),
      // the ring updates by slice surgery (season[1:k-1] || [new] || [k+1:12]),
      // and intermediates (l_new feeds b_new AND s_new) get NAMES through
      // nested derived tables in the recursive arm — the one-row-arm
      // limitation only binds scalar state, not a list; floor division is the
      // pmod-subtract form throughout (numerators go negative). Warm-up: the
      // first 12 rows per key emit x with l=x, b=0, season slot zeroed
      """WITH RECURSIVE mon AS (
        |  SELECT c_nationkey AS nation,
        |    CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |    CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |s AS (SELECT nation, month, rev_c,
        |        row_number() OVER (PARTITION BY nation ORDER BY month) AS rn
        |      FROM mon),
        |r AS (
        |  SELECT nation, CAST(0 AS BIGINT) AS rn, CAST(NULL AS DATE) AS month,
        |         CAST(NULL AS BIGINT) AS rev_c,
        |         CAST(0 AS BIGINT) AS l, CAST(0 AS BIGINT) AS b,
        |         list_transform(range(1, 13), i -> CAST(0 AS BIGINT)) AS season,
        |         CAST(NULL AS BIGINT) AS hw
        |  FROM (SELECT DISTINCT nation FROM s)
        |  UNION ALL
        |  SELECT q4.nation, q4.rn, q4.month, q4.rev_c,
        |    CASE WHEN q4.warm THEN q4.x ELSE q4.lnew END,
        |    CASE WHEN q4.warm THEN 0 ELSE q4.bnew END,
        |    q4.season[1:q4.slot-1]
        |      || [CASE WHEN q4.warm THEN CAST(0 AS BIGINT) ELSE q4.snew END]
        |      || q4.season[q4.slot+1:12],
        |    CASE WHEN q4.warm THEN q4.x ELSE q4.lnew + q4.bnew + q4.snew END
        |  FROM (
        |    SELECT q3.*,
        |      (q3.bnum - ((q3.bnum % 4) + 4) % 4) // 4 AS bnew,
        |      (q3.snum - ((q3.snum % 4) + 4) % 4) // 4 AS snew
        |    FROM (
        |      SELECT q2.*,
        |        (q2.lnew - q2.l0) + 3*q2.b0 AS bnum,
        |        (q2.x - q2.lnew) + 3*q2.sold AS snum
        |      FROM (
        |        SELECT q1.*,
        |          CASE WHEN q1.warm THEN q1.x
        |               ELSE (q1.lnum - ((q1.lnum % 4) + 4) % 4) // 4 END AS lnew
        |        FROM (
        |          SELECT p.*, (p.x - p.sold) + 3*(p.l0 + p.b0) AS lnum
        |          FROM (
        |            SELECT s.nation, s.rn, s.month, s.rev_c, s.rev_c AS x,
        |              s.rn <= 12 AS warm,
        |              CAST((s.rn - 1) % 12 + 1 AS INTEGER) AS slot,
        |              r.l AS l0, r.b AS b0,
        |              r.season[CAST((s.rn - 1) % 12 + 1 AS INTEGER)] AS sold,
        |              r.season
        |            FROM r JOIN s ON s.nation = r.nation AND s.rn = r.rn + 1
        |          ) p
        |        ) q1
        |      ) q2
        |    ) q3
        |  ) q4)
        |SELECT nation, strftime(month, '%Y-%m') AS month, rev_c,
        |  CAST(hw AS BIGINT) AS hw_q
        |FROM r WHERE rn >= 1 ORDER BY nation, month""".stripMargin,

    "q_attribution_linear" ->
      // integer credit split: base = 10000 // n, remainder to the most
      // recent touches — sums to exactly 10000 per purchase
      """WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts
        |           FROM events WHERE event_type = 'purchase'),
        |tch AS (SELECT event_id AS touch_id, user_id, ts AS t_ts
        |        FROM events WHERE event_type IN ('view', 'click')),
        |j AS (SELECT p.purchase_id, tch.touch_id, tch.t_ts
        |      FROM p JOIN tch ON p.user_id = tch.user_id
        |        AND tch.t_ts < p.p_ts
        |        AND tch.t_ts >= p.p_ts - INTERVAL 24 HOUR),
        |r AS (SELECT purchase_id, touch_id,
        |        count(*) OVER (PARTITION BY purchase_id) AS n,
        |        row_number() OVER (PARTITION BY purchase_id
        |          ORDER BY t_ts DESC, touch_id DESC) AS rk
        |      FROM j)
        |SELECT purchase_id, touch_id,
        |  CAST(10000 // n + CASE WHEN rk <= 10000 % n THEN 1 ELSE 0 END
        |    AS BIGINT) AS credit_bp
        |FROM r ORDER BY purchase_id, touch_id""".stripMargin,

    "q_funnel_time" ->
      // discrete rank-selected percentiles (element selection, not
      // interpolation); delays from floored epoch seconds on BOTH
      // sides (floor-then-subtract, mirroring Spark's timestamp→long)
      """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
        |           WHERE user_id IS NOT NULL AND event_type = 'view'
        |           GROUP BY 1),
        |pu AS (SELECT user_id, ts AS p_ts FROM events
        |       WHERE user_id IS NOT NULL AND event_type = 'purchase'),
        |d AS (SELECT pu.user_id,
        |        CAST(floor(epoch(min(pu.p_ts))) AS BIGINT)
        |          - CAST(floor(epoch(min(v.v_ts))) AS BIGINT) AS delay_s
        |      FROM pu JOIN v ON pu.user_id = v.user_id
        |      WHERE pu.p_ts >= v.v_ts GROUP BY 1),
        |r AS (SELECT delay_s,
        |        row_number() OVER (ORDER BY delay_s, user_id) AS rk
        |      FROM d),
        |n AS (SELECT count(*) AS n FROM d)
        |SELECT max(n.n) AS n_converted,
        |  max(CASE WHEN rk = ((n.n - 1) * 25) // 100 + 1 THEN delay_s END) AS p25_s,
        |  max(CASE WHEN rk = ((n.n - 1) * 50) // 100 + 1 THEN delay_s END) AS p50_s,
        |  max(CASE WHEN rk = ((n.n - 1) * 75) // 100 + 1 THEN delay_s END) AS p75_s,
        |  max(CASE WHEN rk = ((n.n - 1) * 90) // 100 + 1 THEN delay_s END) AS p90_s
        |FROM r, n""".stripMargin,

    "q_cuped" ->
      // intermediates named in CTEs (naming does not change the IEEE
      // values — engines do not reassociate floats); parenthesization
      // mirrors the Spark expressions exactly
      """WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
        |            CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents
        |          FROM orders),
        |pre AS (SELECT o_custkey, CAST(sum(cents) AS BIGINT) AS x
        |        FROM o WHERE d < DATE '1998-01-01' GROUP BY 1),
        |ex AS (SELECT o_custkey, CAST(sum(cents) AS BIGINT) AS y
        |       FROM o WHERE d >= DATE '1998-01-01' GROUP BY 1),
        |subj AS (SELECT
        |    CASE WHEN (ex.o_custkey % 1048573) * 2654435761 % 1000000 < 500000
        |      THEN 0 ELSE 1 END AS v,
        |    COALESCE(pre.x, 0) AS x, ex.y AS y
        |  FROM ex LEFT JOIN pre ON ex.o_custkey = pre.o_custkey),
        |m AS (SELECT
        |    CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    sum(CASE WHEN v = 0 THEN x ELSE 0 END) AS sx0,
        |    sum(CASE WHEN v = 1 THEN x ELSE 0 END) AS sx1,
        |    sum(CASE WHEN v = 0 THEN y ELSE 0 END) AS sy0,
        |    sum(CASE WHEN v = 1 THEN y ELSE 0 END) AS sy1,
        |    sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
        |  FROM subj),
        |d AS (SELECT n0, n1, sx0, sx1, sy0, sy1,
        |    (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)) AS nn,
        |    (CAST(sx0 AS DOUBLE) + CAST(sx1 AS DOUBLE)) AS sxd,
        |    (CAST(sy0 AS DOUBLE) + CAST(sy1 AS DOUBLE)) AS syd,
        |    CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd,
        |    CAST(sxy AS DOUBLE) AS sxyd
        |  FROM m),
        |c AS (SELECT *, nn*sxxd - sxd*sxd AS sxxc,
        |    nn*syyd - syd*syd AS syyc, nn*sxyd - sxd*syd AS sxyc
        |  FROM d),
        |f AS (SELECT *, sxyc/sxxc AS theta, sxd/nn AS meanx FROM c)
        |SELECT n0, n1,
        |  CAST(floor(theta * 10000 + 0.5) AS BIGINT) AS theta_bp,
        |  CAST(floor((CAST(sy1 AS DOUBLE)/CAST(n1 AS DOUBLE)
        |      - CAST(sy0 AS DOUBLE)/CAST(n0 AS DOUBLE)) * 100 + 0.5)
        |    AS BIGINT) AS raw_diff_q,
        |  CAST(floor(((CAST(sy1 AS DOUBLE)/CAST(n1 AS DOUBLE)
        |        - theta*(CAST(sx1 AS DOUBLE)/CAST(n1 AS DOUBLE) - meanx))
        |      - (CAST(sy0 AS DOUBLE)/CAST(n0 AS DOUBLE)
        |        - theta*(CAST(sx0 AS DOUBLE)/CAST(n0 AS DOUBLE) - meanx)))
        |      * 100 + 0.5) AS BIGINT) AS adj_diff_q,
        |  CAST(floor((sxyc*sxyc)/(sxxc*syyc) * 10000 + 0.5) AS BIGINT) AS vr_bp
        |FROM f""".stripMargin,

    "q_ab_test_maintained" ->
      // VERBATIM copy of q_ab_test's oracle: the maintained moment
      // state must reproduce the one-shot readout exactly
      """WITH o AS (
        |  SELECT CASE WHEN (o_custkey % 1048573) * 2654435761 % 1000000 < 500000
        |           THEN 0 ELSE 1 END AS v,
        |    CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |m AS (SELECT
        |    CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    sum(CASE WHEN v = 0 THEN cents ELSE 0 END) AS s0,
        |    sum(CASE WHEN v = 1 THEN cents ELSE 0 END) AS s1,
        |    sum(CASE WHEN v = 0 THEN cents*cents ELSE 0 END) AS ss0,
        |    sum(CASE WHEN v = 1 THEN cents*cents ELSE 0 END) AS ss1,
        |    CAST(sum(CASE WHEN v = 0 AND cents > 20000000 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(sum(CASE WHEN v = 1 AND cents > 20000000 THEN 1 ELSE 0 END) AS BIGINT) AS c1
        |  FROM o)
        |SELECT n0, n1,
        |  CAST(s0 // n0 AS BIGINT) AS mean0_q,
        |  CAST(s1 // n1 AS BIGINT) AS mean1_q,
        |  CAST(floor(
        |    (CAST(s1 AS DOUBLE)/CAST(n1 AS DOUBLE) - CAST(s0 AS DOUBLE)/CAST(n0 AS DOUBLE))
        |    / sqrt(
        |      ((CAST(n1 AS DOUBLE)*CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE)*CAST(s1 AS DOUBLE))
        |        / (CAST(n1 AS DOUBLE)*(CAST(n1 AS DOUBLE) - 1.0))) / CAST(n1 AS DOUBLE)
        |      + ((CAST(n0 AS DOUBLE)*CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE)*CAST(s0 AS DOUBLE))
        |        / (CAST(n0 AS DOUBLE)*(CAST(n0 AS DOUBLE) - 1.0))) / CAST(n0 AS DOUBLE))
        |    * 10000 + 0.5) AS BIGINT) AS t_bp,
        |  c0 AS conv0, c1 AS conv1,
        |  CAST(floor(
        |    (CAST(c1 AS DOUBLE)/CAST(n1 AS DOUBLE) - CAST(c0 AS DOUBLE)/CAST(n0 AS DOUBLE))
        |    / sqrt(
        |      ((CAST(c0 AS DOUBLE) + CAST(c1 AS DOUBLE)) / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)))
        |      * (1.0 - (CAST(c0 AS DOUBLE) + CAST(c1 AS DOUBLE)) / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)))
        |      * (1.0/CAST(n0 AS DOUBLE) + 1.0/CAST(n1 AS DOUBLE)))
        |    * 10000 + 0.5) AS BIGINT) AS z_bp
        |FROM m""".stripMargin,

    "q_quantile_normalize" ->
      // exact integer rank selection on both the within-source pct and
      // the pooled lookup — element selection, no interpolation
      """WITH d AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars
        |           FROM documents),
        |r AS (SELECT doc_id, source, n_chars,
        |        row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rk,
        |        count(*) OVER (PARTITION BY source) AS n
        |      FROM d),
        |p AS (SELECT doc_id, source, n_chars,
        |        CASE WHEN n = 1 THEN 5000
        |             ELSE ((rk - 1) * 10000) // (n - 1) END AS pct_bp
        |      FROM r),
        |g AS (SELECT n_chars AS pool_chars,
        |        row_number() OVER (ORDER BY n_chars, doc_id) AS grk FROM d),
        |t AS (SELECT count(*) AS nn FROM d)
        |SELECT p.doc_id, p.source, p.n_chars,
        |  CAST(p.pct_bp AS BIGINT) AS pct_bp, g.pool_chars AS norm_chars
        |FROM p CROSS JOIN t
        |JOIN g ON g.grk = (p.pct_bp * (t.nn - 1)) // 10000 + 1
        |ORDER BY p.doc_id""".stripMargin,

    "q_seasonal_anomaly" ->
      // q_seasonal's decomposition + discrete-median MAD flags — the
      // same pmod-subtract floor division and element-selection rules
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM orders GROUP BY 1),
        |s AS (SELECT d, rev_c, (d - DATE '1970-01-01') % 7 AS dow,
        |        row_number() OVER (ORDER BY d) AS rn FROM daily),
        |tr AS (SELECT d, rev_c, dow,
        |         CASE WHEN count(*) OVER w = 7 THEN
        |           CAST((sum(rev_c) OVER w
        |             - (((sum(rev_c) OVER w) % 7) + 7) % 7) // 7 AS BIGINT)
        |         END AS trend_c
        |       FROM s WINDOW w AS (ORDER BY rn ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |se AS (SELECT dow,
        |         CAST((sum(rev_c - trend_c)
        |           - (((sum(rev_c - trend_c)) % count(*)) + count(*)) % count(*))
        |           // count(*) AS BIGINT) AS seasonal_c
        |       FROM tr WHERE trend_c IS NOT NULL GROUP BY dow),
        |res AS (SELECT tr.d, tr.rev_c,
        |          tr.rev_c - tr.trend_c - se.seasonal_c AS resid
        |        FROM tr LEFT JOIN se USING (dow) WHERE tr.trend_c IS NOT NULL),
        |n AS (SELECT count(*) AS n FROM res),
        |med AS (SELECT resid AS med FROM
        |          (SELECT resid, d, row_number() OVER (ORDER BY resid, d) AS rk
        |           FROM res) x, n WHERE rk = (n + 1) // 2),
        |dev AS (SELECT res.d, res.rev_c, res.resid,
        |          abs(res.resid - med.med) AS dev FROM res, med),
        |mad AS (SELECT dev AS mad FROM
        |          (SELECT dev, d, row_number() OVER (ORDER BY dev, d) AS rk
        |           FROM dev) x, n WHERE rk = (n + 1) // 2)
        |SELECT strftime(dev.d, '%Y-%m-%d') AS d, dev.rev_c, dev.resid,
        |  dev.dev, mad.mad
        |FROM dev, mad WHERE dev.dev > 3 * mad.mad ORDER BY dev.d""".stripMargin,

    "q_feature_matrix" ->
      """WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
        |    CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS cents,
        |    o_orderpriority
        |  FROM orders),
        |ref AS (SELECT max(d) AS ref_d FROM o)
        |SELECT o_custkey, count(*) AS n_orders,
        |  CAST(sum(cents) AS BIGINT) AS total_c,
        |  min(cents) AS min_c, max(cents) AS max_c,
        |  CAST(sum(cents) // count(*) AS BIGINT) AS avg_c,
        |  CAST(min(ref_d - d) AS BIGINT) AS recency_d,
        |  count(DISTINCT date_trunc('month', d)) AS active_months,
        |  CAST(sum(CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_urgent
        |FROM o, ref GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_reorder_point" ->
      """WITH li AS (SELECT l_partkey, CAST(l_shipdate AS DATE) AS d,
        |             CAST(l_quantity AS BIGINT) AS q FROM lineitem),
        |pd AS (SELECT l_partkey, d, CAST(sum(q) AS BIGINT) AS qd
        |       FROM li GROUP BY 1, 2),
        |days AS (SELECT count(DISTINCT d) AS nd FROM li),
        |m AS (SELECT l_partkey, count(*) AS days_sold,
        |        CAST(sum(qd) AS BIGINT) AS total_qty,
        |        CAST(sum(qd*qd) AS BIGINT) AS sqq
        |      FROM pd GROUP BY 1)
        |SELECT l_partkey, days_sold, total_qty,
        |  CAST(floor((CAST(total_qty AS DOUBLE)/CAST(nd AS DOUBLE) * 7.0
        |    + 1.65 * sqrt(greatest(
        |        (CAST(sqq AS DOUBLE)
        |          - CAST(total_qty AS DOUBLE)*CAST(total_qty AS DOUBLE)/CAST(nd AS DOUBLE))
        |        / CAST(nd AS DOUBLE), 0.0)) * sqrt(7.0))
        |    * 100 + 0.5) AS BIGINT) AS rop_q
        |FROM m, days ORDER BY l_partkey""".stripMargin,

    "q_price_elasticity" ->
      """WITH j AS (
        |  SELECT p_brand,
        |    CAST(floor(ln(CAST(p_retailprice AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS x,
        |    CAST(floor(ln(CAST(l_quantity AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS y
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |m AS (SELECT p_brand, count(*) AS n_items,
        |        sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy, sum(x*x) AS sxx
        |      FROM j GROUP BY 1)
        |SELECT p_brand, n_items,
        |  CAST(floor(
        |    (CAST(n_items AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
        |    / (CAST(n_items AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
        |    * 10000 + 0.5) AS BIGINT) AS elasticity_bp
        |FROM m ORDER BY p_brand""".stripMargin,

    "q_l_diversity" ->
      """WITH c AS (SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS balance_band,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS balance_c
        |  FROM customer)
        |SELECT c_nationkey, c_mktsegment, balance_band,
        |  count(*) AS class_size,
        |  count(DISTINCT balance_c) AS n_sensitive_values
        |FROM c GROUP BY 1, 2, 3
        |HAVING count(DISTINCT balance_c) < 3
        |ORDER BY c_nationkey, c_mktsegment, balance_band""".stripMargin,

    "q_propensity_match" ->
      // nearest-control replay: controls dedup to min id per (stratum,
      // score); rank by |Δscore| with the as-of tie rule (at-or-below
      // control wins an exact distance tie)
      """WITH cust AS (SELECT c_custkey AS id, c_nationkey AS nat,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS s,
        |    (c_mktsegment = 'BUILDING') AS tr
        |  FROM customer),
        |outc AS (SELECT o_custkey,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS oc
        |  FROM orders GROUP BY 1),
        |pop AS (SELECT c.id, c.nat, c.s, c.tr, coalesce(o.oc, 0) AS y
        |  FROM cust c LEFT JOIN outc o ON o.o_custkey = c.id),
        |ctl AS (SELECT nat, s, min(id) AS mid FROM pop WHERE NOT tr GROUP BY 1, 2),
        |ctl2 AS (SELECT c.nat, c.s, c.mid, p.y AS my
        |  FROM ctl c JOIN pop p ON p.id = c.mid),
        |m AS (SELECT t.id, t.nat, t.s, t.y, c.mid, c.s AS ms, c.my,
        |    row_number() OVER (PARTITION BY t.id
        |      ORDER BY abs(t.s - c.s),
        |               CASE WHEN c.s <= t.s THEN 0 ELSE 1 END) AS rk
        |  FROM pop t JOIN ctl2 c ON c.nat = t.nat WHERE t.tr)
        |SELECT id AS c_custkey, nat AS c_nationkey, s AS score,
        |  y AS outcome, mid AS match_id, ms AS match_score,
        |  my AS match_outcome, y - my AS effect
        |FROM m WHERE rk = 1 AND abs(s - ms) <= 30000
        |ORDER BY c_custkey""".stripMargin,

    "q_conformal" ->
      // residual ranks and coverage compare |y·n − S| as integers —
      // the mean never materializes; quantized readouts floor-divide
      """WITH d AS (SELECT source, doc_id,
        |    CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |      ELSE len(string_split_regex(trim(text), '[ \t\n\r\f]+')) END AS BIGINT) AS y,
        |    (((doc_id % 1048573) * 2654435761) % 1000000 < 500000) AS cal
        |  FROM documents),
        |st AS (SELECT source, count(*) AS n_cal,
        |    CAST(sum(y) AS BIGINT) AS s
        |  FROM d WHERE cal GROUP BY 1),
        |r AS (SELECT d.source, d.doc_id, abs(d.y * st.n_cal - st.s) AS r,
        |    st.n_cal, st.s,
        |    least((9000 * (st.n_cal + 1) + 9999) // 10000, st.n_cal) AS k
        |  FROM d JOIN st ON st.source = d.source WHERE d.cal),
        |q AS (SELECT source, r AS qhat FROM (
        |    SELECT source, r, k,
        |      row_number() OVER (PARTITION BY source ORDER BY r, doc_id) AS rk
        |    FROM r) WHERE rk = k),
        |t AS (SELECT d.source, st.n_cal, st.s, q.qhat,
        |    CASE WHEN abs(d.y * st.n_cal - st.s) <= q.qhat THEN 1 ELSE 0 END AS cov
        |  FROM d JOIN st ON st.source = d.source
        |         JOIN q ON q.source = d.source
        |  WHERE NOT d.cal)
        |SELECT source, CAST(any_value(n_cal) AS BIGINT) AS n_cal,
        |  CAST((any_value(s) * 10000) // any_value(n_cal) AS BIGINT) AS mu_e4,
        |  CAST((any_value(qhat) * 10000) // any_value(n_cal) AS BIGINT) AS q_e4,
        |  count(*) AS n_test,
        |  CAST(sum(cov) AS BIGINT) AS covered,
        |  CAST((sum(cov) * 10000) // count(*) AS BIGINT) AS cover_bp
        |FROM t GROUP BY source
        |ORDER BY source""".stripMargin,

    "q_bootstrap_ci" ->
      // Poisson bootstrap replay: identical portable hash, identical
      // pinned inverse-CDF double literals, identical floor divisions
      // and rank selections (lo=ceil(.025B)=3, hi=ceil(.975B)=98)
      """WITH o AS (SELECT o_orderpriority AS pri, o_orderkey AS id,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
        |  FROM orders),
        |x AS (SELECT o.*, r.range AS b,
        |    (((o.id * 131 + r.range) % 1048573) * 2654435761 % 1000000)
        |      / 1000000.0 AS u
        |  FROM o CROSS JOIN range(0, 100) r),
        |wt AS (SELECT pri, b, v,
        |    CASE WHEN u < 0.36787944117144233 THEN 0
        |         WHEN u < 0.7357588823428847 THEN 1
        |         WHEN u < 0.9196986029286058 THEN 2
        |         WHEN u < 0.9810118431238463 THEN 3
        |         WHEN u < 0.9963401531726563 THEN 4
        |         WHEN u < 0.9994058151824183 THEN 5
        |         WHEN u < 0.999916758850712 THEN 6
        |         WHEN u < 0.9999897508033253 THEN 7
        |         WHEN u < 0.999998874797402 THEN 8
        |         ELSE 9 END AS w
        |  FROM x),
        |reps AS (SELECT pri, b,
        |    CAST(sum(w * v) AS BIGINT) // CAST(sum(w) AS BIGINT) AS mean
        |  FROM wt GROUP BY 1, 2 HAVING sum(w) > 0),
        |rk AS (SELECT pri, b, mean,
        |    row_number() OVER (PARTITION BY pri ORDER BY mean, b) AS rk
        |  FROM reps),
        |ci AS (SELECT pri, count(*) AS n_reps,
        |    max(CASE WHEN rk = 3 THEN mean END) AS ci_lo,
        |    max(CASE WHEN rk = 98 THEN mean END) AS ci_hi
        |  FROM rk GROUP BY 1),
        |pt AS (SELECT pri, count(*) AS n_rows,
        |    CAST(sum(v) AS BIGINT) // count(*) AS mean_cents
        |  FROM o GROUP BY 1)
        |SELECT ci.pri AS o_orderpriority, pt.n_rows,
        |  CAST(pt.mean_cents AS BIGINT) AS mean_cents, ci.n_reps,
        |  CAST(ci.ci_lo AS BIGINT) AS ci_lo, CAST(ci.ci_hi AS BIGINT) AS ci_hi
        |FROM ci JOIN pt ON pt.pri = ci.pri
        |ORDER BY o_orderpriority""".stripMargin,

    "q_hhi" ->
      """WITH rev AS (SELECT c.c_mktsegment AS seg, c.c_custkey AS ck,
        |    CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS r
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |rk AS (SELECT seg, ck, r,
        |    row_number() OVER (PARTITION BY seg ORDER BY r DESC, ck) AS rk
        |  FROM rev)
        |SELECT seg AS c_mktsegment, count(*) AS n_entities,
        |  CAST(sum(r) AS BIGINT) AS total,
        |  CAST((sum(r * r) * 100000000) // (sum(r) * sum(r)) AS BIGINT) AS hhi_e8,
        |  CAST((sum(CASE WHEN rk <= 4 THEN r ELSE 0 END) * 10000) // sum(r)
        |    AS BIGINT) AS cr4_bp
        |FROM rk GROUP BY seg
        |ORDER BY c_mktsegment""".stripMargin,

    "q_fd_discovery" ->
      // TANE g3 per candidate: rows − Σ max single-rhs count; NULL lhs
      // dropped, NULL rhs a regular value (GROUP BY null-equality)
      """WITH d AS (SELECT l.*, p.p_brand, p.p_type
        |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
        |pair1 AS (SELECT l_partkey AS lhs_v, p_brand AS rhs_v, count(*) AS n
        |  FROM d WHERE l_partkey IS NOT NULL GROUP BY 1, 2),
        |pair2 AS (SELECT p_brand AS lhs_v, p_type AS rhs_v, count(*) AS n
        |  FROM d WHERE p_brand IS NOT NULL GROUP BY 1, 2),
        |pair3 AS (SELECT l_orderkey AS lhs_v, l_shipdate AS rhs_v, count(*) AS n
        |  FROM d WHERE l_orderkey IS NOT NULL GROUP BY 1, 2),
        |pair4 AS (SELECT l_partkey AS lhs_v, l_suppkey AS rhs_v, count(*) AS n
        |  FROM d WHERE l_partkey IS NOT NULL GROUP BY 1, 2),
        |agg AS (
        |  SELECT 'l_partkey' AS lhs, 'p_brand' AS rhs, * FROM (
        |    SELECT count(*) AS n_lhs,
        |      CAST(sum(CASE WHEN kr > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
        |      CAST(sum(rows_) AS BIGINT) AS n_rows,
        |      CAST(sum(rows_ - keep) AS BIGINT) AS g3_remove
        |    FROM (SELECT lhs_v, count(*) AS kr, sum(n) AS rows_, max(n) AS keep
        |          FROM pair1 GROUP BY 1))
        |  UNION ALL
        |  SELECT 'p_brand', 'p_type', * FROM (
        |    SELECT count(*),
        |      CAST(sum(CASE WHEN kr > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |      CAST(sum(rows_) AS BIGINT), CAST(sum(rows_ - keep) AS BIGINT)
        |    FROM (SELECT lhs_v, count(*) AS kr, sum(n) AS rows_, max(n) AS keep
        |          FROM pair2 GROUP BY 1))
        |  UNION ALL
        |  SELECT 'l_orderkey', 'l_shipdate', * FROM (
        |    SELECT count(*),
        |      CAST(sum(CASE WHEN kr > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |      CAST(sum(rows_) AS BIGINT), CAST(sum(rows_ - keep) AS BIGINT)
        |    FROM (SELECT lhs_v, count(*) AS kr, sum(n) AS rows_, max(n) AS keep
        |          FROM pair3 GROUP BY 1))
        |  UNION ALL
        |  SELECT 'l_partkey', 'l_suppkey', * FROM (
        |    SELECT count(*),
        |      CAST(sum(CASE WHEN kr > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |      CAST(sum(rows_) AS BIGINT), CAST(sum(rows_ - keep) AS BIGINT)
        |    FROM (SELECT lhs_v, count(*) AS kr, sum(n) AS rows_, max(n) AS keep
        |          FROM pair4 GROUP BY 1)))
        |SELECT lhs, rhs, n_lhs, n_violating, n_rows, g3_remove,
        |  (n_violating = 0) AS fd_holds
        |FROM agg ORDER BY lhs, rhs""".stripMargin,

    "q_twa" ->
      // sample-and-hold durations on truncated epoch seconds; exact
      // integer numerator, one floor division per key
      """WITH e AS (SELECT user_id, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ep,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |seg AS (SELECT user_id, v,
        |    lead(ep) OVER (PARTITION BY user_id ORDER BY ep, event_id) - ep AS dur
        |  FROM e)
        |SELECT user_id, count(*) + 1 AS n_obs,
        |  CAST(sum(dur) AS BIGINT) AS span_s,
        |  CAST(CAST(sum(v * dur) AS BIGINT) // CAST(sum(dur) AS BIGINT)
        |    AS BIGINT) AS twa
        |FROM seg WHERE dur IS NOT NULL
        |GROUP BY user_id HAVING sum(dur) > 0
        |ORDER BY user_id""".stripMargin,

    "q_shapley" ->
      // full lattice replay over k=4 channels: exposure-mask counts,
      // v(S) by subset join, Shapley sum with integer factorial
      // weights, one floor quantization — every step integer-exact
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ep
        |  FROM events WHERE user_id IS NOT NULL),
        |g AS (SELECT *, CASE WHEN ep - lag(ep) OVER
        |      (PARTITION BY user_id ORDER BY ep, event_id) > 1800
        |    THEN 1 ELSE 0 END AS gap FROM e),
        |s AS (SELECT *, user_id || '#' || CAST(sum(gap) OVER
        |      (PARTITION BY user_id ORDER BY ep, event_id
        |       ROWS UNBOUNDED PRECEDING) AS VARCHAR) AS jid FROM g),
        |p AS (SELECT *, coalesce(sum(CASE WHEN event_type = 'purchase'
        |      THEN 1 ELSE 0 END) OVER (PARTITION BY jid
        |      ORDER BY ep, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |  FROM s),
        |j AS (SELECT jid,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv,
        |    sum(DISTINCT CASE event_type WHEN 'click' THEN 1
        |      WHEN 'error' THEN 2 WHEN 'signup' THEN 4
        |      WHEN 'view' THEN 8 ELSE 0 END) AS mask
        |  FROM p WHERE cb = 0 GROUP BY jid),
        |m AS (SELECT CAST(mask AS INTEGER) AS mask, count(*) AS n
        |  FROM j WHERE conv = 1 GROUP BY 1),
        |masks AS (SELECT CAST(r.range AS INTEGER) AS s FROM range(0, 16) r),
        |vs AS (SELECT ms.s, CAST(coalesce(sum(m.n), 0) AS BIGINT) AS v
        |  FROM masks ms LEFT JOIN m ON (m.mask & ms.s) = m.mask
        |  GROUP BY 1),
        |ch AS (SELECT * FROM (VALUES ('click', 1), ('error', 2),
        |    ('signup', 4), ('view', 8)) AS t(channel, b)),
        |ph AS (SELECT ch.channel,
        |    CAST(sum(
        |      (CASE ((v1.s & 1) + ((v1.s >> 1) & 1) + ((v1.s >> 2) & 1)
        |            + ((v1.s >> 3) & 1))
        |         WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 2 THEN 2 ELSE 6 END) *
        |      (CASE (3 - ((v1.s & 1) + ((v1.s >> 1) & 1) + ((v1.s >> 2) & 1)
        |            + ((v1.s >> 3) & 1)))
        |         WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 2 THEN 2 ELSE 6 END) *
        |      (v2.v - v1.v)) AS BIGINT) AS num
        |  FROM ch
        |  JOIN vs v1 ON (v1.s & ch.b) = 0
        |  JOIN vs v2 ON v2.s = (v1.s | ch.b)
        |  GROUP BY 1),
        |tc AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS total FROM m)
        |SELECT ph.channel,
        |  CAST((ph.num * 1000000) // 24 AS BIGINT) AS phi_e6,
        |  CAST(coalesce((SELECT sum(m.n) FROM m WHERE (m.mask & ch.b) <> 0), 0)
        |    AS BIGINT) AS n_conv_touching,
        |  tc.total AS total_conv
        |FROM ph JOIN ch ON ch.channel = ph.channel CROSS JOIN tc
        |ORDER BY ph.channel""".stripMargin,

    "q_sprt" ->
      // the four constants are .toString of the EXACT doubles the Spark
      // side uses (shortest round-trip repr parses to the same IEEE
      // value); LLR replays the identical two-flop expression
      s"""WITH o AS (SELECT o_orderkey % 2 AS arm,
        |    CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END AS x,
        |    o_orderdate, o_orderkey FROM orders),
        |c AS (SELECT arm,
        |    CAST(sum(x) OVER w AS BIGINT) AS cx,
        |    CAST(count(*) OVER w AS BIGINT) AS cn
        |  FROM o WINDOW w AS (PARTITION BY arm
        |    ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING)),
        |d AS (SELECT arm, cn,
        |    (cx * ${sprtC._1}) + ((cn - cx) * ${sprtC._2}) AS llr
        |  FROM c),
        |e AS (SELECT arm, cn, llr,
        |    CASE WHEN llr >= ${sprtC._3} THEN 1
        |         WHEN llr <= ${sprtC._4} THEN -1 ELSE 0 END AS dec
        |  FROM d),
        |hit AS (SELECT arm, min(cn) AS hn FROM e WHERE dec <> 0 GROUP BY 1),
        |fin AS (SELECT arm, max(cn) AS n_total FROM e GROUP BY 1),
        |pick AS (SELECT f.arm, coalesce(h.hn, f.n_total) AS n_decide,
        |    f.n_total
        |  FROM fin f LEFT JOIN hit h ON h.arm = f.arm)
        |SELECT p.arm, p.n_decide,
        |  CASE e.dec WHEN 1 THEN 'accept_h1' WHEN -1 THEN 'accept_h0'
        |    ELSE 'undecided' END AS decision,
        |  CAST(floor(e.llr * 10000 + 0.5) AS BIGINT) AS llr_bp,
        |  p.n_total
        |FROM pick p JOIN e ON e.arm = p.arm AND e.cn = p.n_decide
        |ORDER BY p.arm""".stripMargin,

    "q_logrank" ->
      // q_survival_km's subject derivation split by segment; per-time
      // O−E and variance replay the pinned double parenthesization
      """WITH ev AS (
        |  SELECT o_custkey,
        |    CAST(min(o_orderdate) AS DATE) AS first_d,
        |    CAST(max(o_orderdate) AS DATE) AS last_d
        |  FROM orders GROUP BY 1),
        |mx AS (SELECT max(last_d) AS mxd FROM ev),
        |subj AS (SELECT CAST(last_d - first_d AS BIGINT) AS duration,
        |    CASE WHEN mxd - last_d >= 365 THEN 1 ELSE 0 END AS event,
        |    CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g
        |  FROM ev CROSS JOIN mx
        |  JOIN customer c ON c.c_custkey = ev.o_custkey),
        |byt AS (SELECT duration AS t,
        |    CAST(sum(event * g) AS BIGINT) AS d1,
        |    CAST(sum(event) AS BIGINT) AS d,
        |    CAST(sum(g) AS BIGINT) AS r1,
        |    count(*) AS r
        |  FROM subj GROUP BY 1),
        |tot AS (SELECT count(*) AS n, CAST(sum(g) AS BIGINT) AS n1 FROM subj),
        |risk0 AS (SELECT t, d1, d,
        |    CAST(n - coalesce(sum(r) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS nr,
        |    CAST(n1 - coalesce(sum(r1) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS nr1
        |  FROM byt, tot),
        |-- the d>0 filter must come AFTER the cumulative at-risk counts:
        |-- a WHERE on the windowed CTE would drop censored-only times
        |-- from the risk-set arithmetic (caught by the sf0.001 gate)
        |risk AS (SELECT * FROM risk0 WHERE d > 0),
        |terms AS (SELECT
        |    CAST(floor((CAST(d1 AS DOUBLE) - CAST(d AS DOUBLE) *
        |      (CAST(nr1 AS DOUBLE) / CAST(nr AS DOUBLE))) * 100000000 + 0.5)
        |      AS BIGINT) AS oe8,
        |    CAST(floor((CASE WHEN nr > 1 THEN
        |      CAST(d AS DOUBLE) * (CAST(nr1 AS DOUBLE) / CAST(nr AS DOUBLE)) *
        |      (1.0 - (CAST(nr1 AS DOUBLE) / CAST(nr AS DOUBLE))) *
        |      CAST(nr - d AS DOUBLE) / CAST(nr - 1 AS DOUBLE)
        |      ELSE 0.0 END) * 100000000 + 0.5) AS BIGINT) AS vr8,
        |    d1, d
        |  FROM risk),
        |sums AS (SELECT CAST(sum(oe8) AS BIGINT) AS oe_e8,
        |    CAST(sum(vr8) AS BIGINT) AS var_e8,
        |    CAST(sum(d1) AS BIGINT) AS deaths_1,
        |    CAST(sum(d) AS BIGINT) AS deaths
        |  FROM terms)
        |SELECT tot.n1 AS n_1, CAST(tot.n - tot.n1 AS BIGINT) AS n_0,
        |  s.deaths_1, s.deaths, s.oe_e8, s.var_e8,
        |  CAST(floor((CAST(s.oe_e8 AS DOUBLE) / 100000000) *
        |    (CAST(s.oe_e8 AS DOUBLE) / 100000000) /
        |    (CAST(s.var_e8 AS DOUBLE) / 100000000) * 10000 + 0.5)
        |    AS BIGINT) AS chi2_bp
        |FROM sums s, tot""".stripMargin,

    "q_rake" ->
      // IPF unrolled: 3 rounds x (row update, column update), weights
      // e6-quantized by floor division after every update — integer
      // arithmetic end to end, bit-equal to the driver-side BigInt fit
      """WITH samp AS (SELECT CAST(c.c_nationkey AS VARCHAR) AS nation,
        |    c.c_mktsegment AS segment
        |  FROM customer c JOIN (SELECT DISTINCT o_custkey FROM orders
        |    WHERE year(o_orderdate) = 1997) o ON o.o_custkey = c.c_custkey),
        |cells AS (SELECT nation, segment, count(*) AS n FROM samp GROUP BY 1, 2),
        |tr AS (SELECT CAST(c_nationkey AS VARCHAR) AS nation, count(*) AS t
        |  FROM customer GROUP BY 1),
        |tc AS (SELECT c_mktsegment AS segment, count(*) AS t
        |  FROM customer GROUP BY 1),
        |w0 AS (SELECT nation, segment, n, CAST(1000000 AS HUGEINT) AS w FROM cells),
        |r1 AS (SELECT nation, sum(w * n) AS m FROM w0 GROUP BY 1),
        |w1 AS (SELECT w0.nation, w0.segment, w0.n,
        |    (w0.w * tr.t * 1000000) // r1.m AS w
        |  FROM w0 JOIN tr ON tr.nation = w0.nation
        |          JOIN r1 ON r1.nation = w0.nation),
        |c1 AS (SELECT segment, sum(w * n) AS m FROM w1 GROUP BY 1),
        |w2 AS (SELECT w1.nation, w1.segment, w1.n,
        |    (w1.w * tc.t * 1000000) // c1.m AS w
        |  FROM w1 JOIN tc ON tc.segment = w1.segment
        |          JOIN c1 ON c1.segment = w1.segment),
        |r2 AS (SELECT nation, sum(w * n) AS m FROM w2 GROUP BY 1),
        |w3 AS (SELECT w2.nation, w2.segment, w2.n,
        |    (w2.w * tr.t * 1000000) // r2.m AS w
        |  FROM w2 JOIN tr ON tr.nation = w2.nation
        |          JOIN r2 ON r2.nation = w2.nation),
        |c2 AS (SELECT segment, sum(w * n) AS m FROM w3 GROUP BY 1),
        |w4 AS (SELECT w3.nation, w3.segment, w3.n,
        |    (w3.w * tc.t * 1000000) // c2.m AS w
        |  FROM w3 JOIN tc ON tc.segment = w3.segment
        |          JOIN c2 ON c2.segment = w3.segment),
        |r3 AS (SELECT nation, sum(w * n) AS m FROM w4 GROUP BY 1),
        |w5 AS (SELECT w4.nation, w4.segment, w4.n,
        |    (w4.w * tr.t * 1000000) // r3.m AS w
        |  FROM w4 JOIN tr ON tr.nation = w4.nation
        |          JOIN r3 ON r3.nation = w4.nation),
        |c3 AS (SELECT segment, sum(w * n) AS m FROM w5 GROUP BY 1),
        |w6 AS (SELECT w5.nation, w5.segment, w5.n,
        |    (w5.w * tc.t * 1000000) // c3.m AS w
        |  FROM w5 JOIN tc ON tc.segment = w5.segment
        |          JOIN c3 ON c3.segment = w5.segment)
        |SELECT nation, segment, CAST(n AS BIGINT) AS n,
        |  CAST(w AS BIGINT) AS weight_e6
        |FROM w6 ORDER BY nation, segment""".stripMargin,

    "q_bfs_reach" ->
      // depth-bounded recursive frontier walk; the min-dist rollup at
      // the end collapses duplicate paths exactly as the per-round
      // grouped min does on the Spark side
      """WITH RECURSIVE pr AS (
        |  SELECT a.l_partkey AS pa, b.l_partkey AS pb,
        |    count(DISTINCT a.l_orderkey) AS c
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(DISTINCT a.l_orderkey) >= 2),
        |ed AS (SELECT least(pa, pb) AS u, greatest(pa, pb) AS v
        |  FROM pr WHERE pa <> pb GROUP BY 1, 2),
        |bi AS (SELECT u, v FROM ed UNION ALL SELECT v AS u, u AS v FROM ed),
        |seeds AS (SELECT node FROM (SELECT DISTINCT u AS node FROM bi)
        |  ORDER BY node LIMIT 5),
        |r AS (
        |  SELECT node, 0 AS dist FROM seeds
        |  UNION ALL
        |  SELECT bi.v AS node, r.dist + 1 AS dist
        |  FROM r JOIN bi ON bi.u = r.node WHERE r.dist < 3)
        |SELECT node, CAST(min(dist) AS BIGINT) AS dist
        |FROM r GROUP BY node ORDER BY node""".stripMargin,

    "q_mutual_info" ->
      // observed cells only (zero cells contribute exactly 0 to MI);
      // each ln term quantizes to e8 from the identical pinned double
      """WITH d AS (SELECT o_orderpriority AS a, o_orderstatus AS b
        |  FROM orders
        |  WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL),
        |cells AS (SELECT a, b, count(*) AS o FROM d GROUP BY 1, 2),
        |am AS (SELECT a, CAST(sum(o) AS BIGINT) AS na FROM cells GROUP BY 1),
        |bm AS (SELECT b, CAST(sum(o) AS BIGINT) AS nb FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
        |mi AS (SELECT
        |    CAST(sum(CAST(floor((CAST(o AS DOUBLE) / CAST(n AS DOUBLE)) *
        |      ln((CAST(o AS DOUBLE) * CAST(n AS DOUBLE)) /
        |         (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))) * 100000000 + 0.5)
        |      AS BIGINT)) AS BIGINT) AS mi_e8,
        |    count(*) AS cells
        |  FROM cells JOIN am USING (a) JOIN bm USING (b) CROSS JOIN tot),
        |ha AS (SELECT CAST(sum(CAST(floor((CAST(na AS DOUBLE) / CAST(n AS DOUBLE)) *
        |    ln(CAST(n AS DOUBLE) / CAST(na AS DOUBLE)) * 100000000 + 0.5)
        |    AS BIGINT)) AS BIGINT) AS h_a_e8 FROM am CROSS JOIN tot),
        |hb AS (SELECT CAST(sum(CAST(floor((CAST(nb AS DOUBLE) / CAST(n AS DOUBLE)) *
        |    ln(CAST(n AS DOUBLE) / CAST(nb AS DOUBLE)) * 100000000 + 0.5)
        |    AS BIGINT)) AS BIGINT) AS h_b_e8 FROM bm CROSS JOIN tot)
        |SELECT tot.n, mi.cells, mi.mi_e8, ha.h_a_e8, hb.h_b_e8,
        |  CAST(floor(CAST(mi.mi_e8 AS DOUBLE) /
        |    sqrt(CAST(ha.h_a_e8 AS DOUBLE) * CAST(hb.h_b_e8 AS DOUBLE)) *
        |    10000 + 0.5) AS BIGINT) AS nmi_bp
        |FROM mi CROSS JOIN ha CROSS JOIN hb CROSS JOIN tot""".stripMargin,

    "q_t_closeness" ->
      // ordered-EMD per class: integer cumulative differences, one
      // decimal floor division; the last bucket's cum is 0 by
      // construction so including it is harmless
      """WITH rev AS (SELECT o_custkey,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS r
        |  FROM orders GROUP BY 1),
        |pop AS (SELECT c.c_custkey, c.c_nationkey, c.c_mktsegment,
        |    coalesce(rev.r, 0) AS rev
        |  FROM customer c LEFT JOIN rev ON rev.o_custkey = c.c_custkey),
        |nn AS (SELECT count(*) AS n FROM pop),
        |rk AS (SELECT pop.*, row_number() OVER (ORDER BY rev, c_custkey) AS rk
        |  FROM pop),
        |bk AS (SELECT c_nationkey, c_mktsegment,
        |    ((rk - 1) * 10) // n AS bucket FROM rk CROSS JOIN nn),
        |cls AS (SELECT c_nationkey, c_mktsegment, bucket, count(*) AS c
        |  FROM bk GROUP BY 1, 2, 3),
        |gl AS (SELECT bucket, count(*) AS g FROM bk GROUP BY 1),
        |csz AS (SELECT c_nationkey, c_mktsegment, CAST(sum(c) AS BIGINT) AS nc
        |  FROM cls GROUP BY 1, 2),
        |grid AS (SELECT z.c_nationkey, z.c_mktsegment, z.nc, gl.bucket, gl.g,
        |    coalesce(cls.c, 0) AS c, nn.n
        |  FROM csz z CROSS JOIN gl CROSS JOIN nn
        |  LEFT JOIN cls ON cls.c_nationkey = z.c_nationkey
        |    AND cls.c_mktsegment = z.c_mktsegment AND cls.bucket = gl.bucket),
        |cum AS (SELECT c_nationkey, c_mktsegment, nc, n,
        |    sum(c * n - g * nc) OVER (PARTITION BY c_nationkey, c_mktsegment
        |      ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cm
        |  FROM grid)
        |SELECT c_nationkey, c_mktsegment, nc AS n_class,
        |  CAST((sum(abs(cm)) * 10000) // (nc * n * 9) AS BIGINT) AS t_bp
        |FROM cum GROUP BY 1, 2, 3, n
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,

    "q_qini" ->
      // cumulative curve counts are exact; the qini numerator is
      // exactly divisible by cum_nc after the posmod subtract, so //
      // equals the true quotient even when negative
      """WITH resp AS (SELECT DISTINCT o_custkey FROM orders
        |  WHERE year(o_orderdate) = 1997),
        |pop AS (SELECT c.c_custkey,
        |    CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS score,
        |    (c.c_mktsegment = 'BUILDING') AS tr,
        |    CASE WHEN resp.o_custkey IS NULL THEN 0 ELSE 1 END AS resp
        |  FROM customer c LEFT JOIN resp ON resp.o_custkey = c.c_custkey),
        |nn AS (SELECT count(*) AS n FROM pop),
        |rk AS (SELECT pop.*, row_number() OVER (ORDER BY score DESC, c_custkey) AS rk
        |  FROM pop),
        |dec AS (SELECT tr, resp, ((rk - 1) * 10) // n AS decile
        |  FROM rk CROSS JOIN nn),
        |byd AS (SELECT decile,
        |    CAST(sum(CASE WHEN tr THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        |    CAST(sum(CASE WHEN tr THEN 0 ELSE 1 END) AS BIGINT) AS nc,
        |    CAST(sum(CASE WHEN tr THEN resp ELSE 0 END) AS BIGINT) AS rt,
        |    CAST(sum(CASE WHEN tr THEN 0 ELSE resp END) AS BIGINT) AS rc
        |  FROM dec GROUP BY 1),
        |cum AS (SELECT decile,
        |    CAST(sum(nt) OVER w AS BIGINT) AS cum_nt,
        |    CAST(sum(nc) OVER w AS BIGINT) AS cum_nc,
        |    CAST(sum(rt) OVER w AS BIGINT) AS cum_rt,
        |    CAST(sum(rc) OVER w AS BIGINT) AS cum_rc
        |  FROM byd WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING))
        |SELECT decile, cum_nt, cum_nc, cum_rt, cum_rc,
        |  CAST(((cum_rt * cum_nc - cum_rc * cum_nt) * 10000
        |    - ((((cum_rt * cum_nc - cum_rc * cum_nt) * 10000) % cum_nc
        |        + cum_nc) % cum_nc)) // cum_nc AS BIGINT) AS qini_e4
        |FROM cum ORDER BY decile""".stripMargin,

    "q_keywords" ->
      // RAKE replay: same pinned whitespace class + stopword list,
      // same integer deg/freq scoring, same (score desc, phrase) top-20
      """WITH toks AS (SELECT doc_id, l[i] AS w, i AS p
        |  FROM (SELECT doc_id,
        |      string_split_regex(trim(text), '[ \t\n\r\f]+') AS l
        |    FROM documents WHERE trim(text) <> '') d,
        |  LATERAL unnest(generate_series(1, len(l))) AS t(i)),
        |marked AS (SELECT doc_id, w, p,
        |    CASE WHEN w IN ('the','a','of','and','in','to','is')
        |      THEN 1 ELSE 0 END AS stop FROM toks),
        |isl AS (SELECT doc_id, w, p,
        |    sum(stop) OVER (PARTITION BY doc_id ORDER BY p
        |      ROWS UNBOUNDED PRECEDING) AS ph, stop
        |  FROM marked),
        |phrases AS (SELECT doc_id, ph,
        |    string_agg(w, ' ' ORDER BY p) AS phrase,
        |    CAST(count(*) AS BIGINT) AS len
        |  FROM isl WHERE stop = 0 GROUP BY 1, 2
        |  HAVING count(*) <= 4),
        |pw AS (SELECT phrase, len, unnest(string_split(phrase, ' ')) AS w
        |  FROM phrases),
        |ws AS (SELECT w, CAST(sum(len) AS BIGINT) AS deg,
        |    CAST(count(*) AS BIGINT) AS freq FROM pw GROUP BY 1),
        |wsc AS (SELECT w, (deg * 10000) // freq AS score FROM ws),
        |ps AS (SELECT pw.phrase, any_value(pw.len) AS n_words,
        |    CAST(sum(wsc.score) AS BIGINT) AS pssum
        |  FROM pw JOIN wsc ON wsc.w = pw.w GROUP BY 1),
        |occ AS (SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences
        |  FROM phrases GROUP BY 1),
        |sc AS (SELECT ps.phrase, ps.n_words, occ.n_occurrences,
        |    CAST(ps.pssum // occ.n_occurrences AS BIGINT) AS score_e4
        |  FROM ps JOIN occ ON occ.phrase = ps.phrase),
        |top AS (SELECT * FROM sc ORDER BY score_e4 DESC, phrase LIMIT 20)
        |SELECT phrase, n_words, n_occurrences, score_e4,
        |  CAST(row_number() OVER (ORDER BY score_e4 DESC, phrase) AS BIGINT)
        |    AS rank
        |FROM top ORDER BY rank""".stripMargin,

    "q_price_volume_mix" ->
      // per-item effects: the posmod-subtract leaves an exactly
      // divisible numerator, so // equals the true floor even for the
      // negative effects a price cut produces
      """WITH li AS (SELECT l_partkey,
        |    CASE WHEN year(l_shipdate) = 1997 THEN 1 ELSE 0 END AS period,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS rev,
        |    CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty
        |  FROM lineitem WHERE year(l_shipdate) IN (1996, 1997)),
        |wb AS (SELECT p.p_brand, li.* FROM li
        |  JOIN part p ON p.p_partkey = li.l_partkey),
        |items AS (SELECT p_brand, l_partkey,
        |    CAST(sum(CASE WHEN period = 0 THEN rev ELSE 0 END) AS BIGINT) AS r0,
        |    CAST(sum(CASE WHEN period = 1 THEN rev ELSE 0 END) AS BIGINT) AS r1,
        |    CAST(sum(CASE WHEN period = 0 THEN qty ELSE 0 END) AS BIGINT) AS q0,
        |    CAST(sum(CASE WHEN period = 1 THEN qty ELSE 0 END) AS BIGINT) AS q1
        |  FROM wb GROUP BY 1, 2),
        |eff AS (SELECT p_brand, r0, r1,
        |    CASE WHEN q0 > 0 AND q1 > 0 THEN
        |      ((r1 * q0 - r0 * q1)
        |        - (((r1 * q0 - r0 * q1) % q1 + q1) % q1)) // q1
        |      ELSE 0 END AS pe,
        |    CASE WHEN q0 > 0 AND q1 > 0 THEN
        |      ((r0 * (q1 - q0))
        |        - ((r0 * (q1 - q0)) % q0 + q0) % q0) // q0
        |      ELSE 0 END AS ve,
        |    CASE WHEN q0 = 0 AND q1 > 0 THEN r1 ELSE 0 END AS ne,
        |    CASE WHEN q1 = 0 AND q0 > 0 THEN r0 ELSE 0 END AS de,
        |    CASE WHEN q0 > 0 AND q1 > 0 THEN r1 - r0 ELSE 0 END AS bd
        |  FROM items)
        |SELECT p_brand,
        |  CAST(sum(r0) AS BIGINT) AS rev0, CAST(sum(r1) AS BIGINT) AS rev1,
        |  CAST(sum(r1) - sum(r0) AS BIGINT) AS delta,
        |  CAST(sum(pe) AS BIGINT) AS price_eff,
        |  CAST(sum(ve) AS BIGINT) AS vol_eff,
        |  CAST(sum(bd) - sum(pe) - sum(ve) AS BIGINT) AS cross_eff,
        |  CAST(sum(ne) AS BIGINT) AS new_eff,
        |  CAST(sum(de) AS BIGINT) AS disc_eff
        |FROM eff GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,

    "q_eb_rates" ->
      // MoM Beta prior from exact e6 rate moments; both engines see the
      // identical pinned double expressions for (alpha, beta)
      """WITH pk AS (SELECT l_partkey, count(*) AS n,
        |    CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS k
        |  FROM lineitem GROUP BY 1),
        |r AS (SELECT *, (k * 1000000) // n AS r6 FROM pk),
        |mom AS (SELECT count(*) AS kk, sum(r6) AS s, sum(r6 * r6) AS ss FROM r),
        |pr AS (SELECT (CAST(s AS DOUBLE) / CAST(kk AS DOUBLE)) AS m,
        |    (CAST(ss AS DOUBLE) / CAST(kk AS DOUBLE) -
        |     (CAST(s AS DOUBLE) / CAST(kk AS DOUBLE)) *
        |     (CAST(s AS DOUBLE) / CAST(kk AS DOUBLE))) AS v
        |  FROM mom),
        |ab AS (SELECT m, (m * (1000000 - m) / v - 1.0) AS ab FROM pr),
        |alf AS (SELECT CAST(floor(ab * m) AS BIGINT) AS alpha_e6,
        |    CAST(floor(ab * (1000000 - m)) AS BIGINT) AS beta_e6
        |  FROM ab)
        |SELECT l_partkey, n, k,
        |  CAST((k * 10000) // n AS BIGINT) AS raw_bp,
        |  CAST(((k * 1000000 + alpha_e6) * 10000) //
        |    (n * 1000000 + alpha_e6 + beta_e6) AS BIGINT) AS smoothed_bp,
        |  alpha_e6, beta_e6
        |FROM r CROSS JOIN alf ORDER BY l_partkey""".stripMargin,

    "q_encoding_audit" ->
      // identical constructed contamination; \x{...} escapes are valid
      // in both Java regex and RE2
      """WITH c AS (SELECT doc_id,
        |    CASE WHEN doc_id < 120 THEN text || ' '
        |      || repeat(chr(65533), CAST(doc_id % 3 AS INT))
        |      || repeat(chr(8203), CAST(doc_id % 2 AS INT))
        |      || CASE WHEN doc_id % 5 = 0 THEN chr(195) || chr(169)
        |           ELSE '' END
        |      || CASE WHEN doc_id % 7 = 0 THEN chr(7) ELSE '' END
        |    ELSE text END AS t2
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t2, '\x{FFFD}')) AS BIGINT)
        |    AS n_replacement,
        |  CAST(len(regexp_extract_all(t2,
        |    '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]')) AS BIGINT) AS n_control,
        |  CAST(len(regexp_extract_all(t2, '[\x{200B}-\x{200D}\x{FEFF}]'))
        |    AS BIGINT) AS n_zerowidth,
        |  CAST(len(regexp_extract_all(t2, '\x{00C3}[\x{0080}-\x{00BF}]'))
        |    AS BIGINT) AS n_mojibake,
        |  (len(regexp_extract_all(t2, '\x{FFFD}'))
        |    + len(regexp_extract_all(t2, '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]'))
        |    + len(regexp_extract_all(t2, '[\x{200B}-\x{200D}\x{FEFF}]'))
        |    + len(regexp_extract_all(t2, '\x{00C3}[\x{0080}-\x{00BF}]')) = 0)
        |    AS clean
        |FROM c ORDER BY doc_id""".stripMargin,

    "q_forecast_reconcile" ->
      // q_holt's recursion replayed at BOTH hierarchy levels (arg_max
      // picks each key's final state), then the q_allocate
      // largest-remainder replay including the operator's
      // all-zero-weights equal-split branch
      """WITH RECURSIVE mon AS (
        |  SELECT c_nationkey AS nation,
        |    CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |    CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |s AS (SELECT nation, month, rev_c,
        |        row_number() OVER (PARTITION BY nation ORDER BY month) AS rn
        |      FROM mon),
        |r AS (
        |  SELECT nation, month, rev_c, rn, rev_c AS l, CAST(0 AS BIGINT) AS b
        |  FROM s WHERE rn = 1
        |  UNION ALL
        |  SELECT s.nation, s.month, s.rev_c, s.rn,
        |    ((s.rev_c + 3*(r.l + r.b))
        |      - (((s.rev_c + 3*(r.l + r.b)) % 4) + 4) % 4) // 4,
        |    ((((s.rev_c + 3*(r.l + r.b))
        |        - (((s.rev_c + 3*(r.l + r.b)) % 4) + 4) % 4) // 4 - r.l + 3*r.b)
        |      - (((((s.rev_c + 3*(r.l + r.b))
        |        - (((s.rev_c + 3*(r.l + r.b)) % 4) + 4) % 4) // 4 - r.l + 3*r.b) % 4) + 4) % 4) // 4
        |  FROM s JOIN r ON s.nation = r.nation AND s.rn = r.rn + 1),
        |natfc AS (SELECT nation,
        |    greatest(CAST(0 AS BIGINT), arg_max(l + b, rn)) AS base_fc
        |  FROM r GROUP BY 1),
        |natreg AS (SELECT n_nationkey AS nation, n_regionkey AS region
        |  FROM nation),
        |regmon AS (SELECT nr.region, m.month,
        |    CAST(sum(m.rev_c) AS BIGINT) AS rev_c
        |  FROM mon m JOIN natreg nr ON nr.nation = m.nation
        |  GROUP BY 1, 2),
        |s2 AS (SELECT region, month, rev_c,
        |        row_number() OVER (PARTITION BY region ORDER BY month) AS rn
        |      FROM regmon),
        |r2 AS (
        |  SELECT region, month, rev_c, rn, rev_c AS l, CAST(0 AS BIGINT) AS b
        |  FROM s2 WHERE rn = 1
        |  UNION ALL
        |  SELECT s2.region, s2.month, s2.rev_c, s2.rn,
        |    ((s2.rev_c + 3*(r2.l + r2.b))
        |      - (((s2.rev_c + 3*(r2.l + r2.b)) % 4) + 4) % 4) // 4,
        |    ((((s2.rev_c + 3*(r2.l + r2.b))
        |        - (((s2.rev_c + 3*(r2.l + r2.b)) % 4) + 4) % 4) // 4 - r2.l + 3*r2.b)
        |      - (((((s2.rev_c + 3*(r2.l + r2.b))
        |        - (((s2.rev_c + 3*(r2.l + r2.b)) % 4) + 4) % 4) // 4 - r2.l + 3*r2.b) % 4) + 4) % 4) // 4
        |  FROM s2 JOIN r2 ON s2.region = r2.region AND s2.rn = r2.rn + 1),
        |regfc AS (SELECT region,
        |    greatest(CAST(0 AS BIGINT), arg_max(l + b, rn)) AS region_fc
        |  FROM r2 GROUP BY 1),
        |j AS (SELECT nf.nation, nr.region, nf.base_fc, rf.region_fc
        |  FROM natfc nf JOIN natreg nr ON nr.nation = nf.nation
        |  JOIN regfc rf ON rf.region = nr.region),
        |t AS (SELECT *, sum(base_fc) OVER (PARTITION BY region) AS tot,
        |    count(*) OVER (PARTITION BY region) AS nn
        |  FROM j),
        |w1 AS (SELECT nation, region, base_fc, region_fc,
        |    CASE WHEN tot = 0 THEN 1 ELSE base_fc END AS wgt,
        |    CASE WHEN tot = 0 THEN nn ELSE tot END AS t1
        |  FROM t),
        |b1 AS (SELECT *,
        |    CAST(CAST(region_fc AS HUGEINT) * wgt // t1 AS BIGINT) AS base,
        |    (CAST(region_fc AS HUGEINT) * wgt) % t1 AS rem
        |  FROM w1),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY region
        |      ORDER BY rem DESC, nation) AS rnk,
        |    region_fc - sum(base) OVER (PARTITION BY region) AS deficit
        |  FROM b1)
        |SELECT nation, region, base_fc, region_fc,
        |  CAST(base + CASE WHEN rnk <= deficit THEN 1 ELSE 0 END AS BIGINT)
        |    AS reconciled_fc
        |FROM rk ORDER BY nation""".stripMargin,

    "q_croston" ->
      // two independent ewma recursions (sizes over all demand months,
      // intervals over the 2nd onward); everything positive, so //
      // replays the operator's floorDiv
      """WITH RECURSIVE dm AS (
        |  SELECT l_partkey,
        |    CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS BIGINT) AS mn,
        |    CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS q
        |  FROM lineitem GROUP BY 1, 2),
        |s AS (SELECT l_partkey, mn, q,
        |    mn - lag(mn) OVER (PARTITION BY l_partkey ORDER BY mn) AS iv,
        |    row_number() OVER (PARTITION BY l_partkey ORDER BY mn) AS rn
        |  FROM dm),
        |rz AS (
        |  SELECT l_partkey, rn, q AS z FROM s WHERE rn = 1
        |  UNION ALL
        |  SELECT s.l_partkey, s.rn, (s.q + 3 * rz.z) // 4
        |  FROM s JOIN rz ON s.l_partkey = rz.l_partkey AND s.rn = rz.rn + 1),
        |rp AS (
        |  SELECT l_partkey, rn, iv AS p FROM s WHERE rn = 2
        |  UNION ALL
        |  SELECT s.l_partkey, s.rn, (s.iv + 3 * rp.p) // 4
        |  FROM s JOIN rp ON s.l_partkey = rp.l_partkey AND s.rn = rp.rn + 1),
        |zf AS (SELECT l_partkey, CAST(max(rn) AS BIGINT) AS n_periods,
        |    CAST(arg_max(z, rn) AS BIGINT) AS z_q
        |  FROM rz GROUP BY 1),
        |pf AS (SELECT l_partkey, CAST(arg_max(p, rn) AS BIGINT) AS p_q
        |  FROM rp GROUP BY 1)
        |SELECT zf.l_partkey, zf.n_periods, zf.z_q, pf.p_q,
        |  CAST((zf.z_q * 10000) // pf.p_q AS BIGINT) AS rate_bp
        |FROM zf JOIN pf ON pf.l_partkey = zf.l_partkey
        |ORDER BY zf.l_partkey""".stripMargin,

    "q_fano" ->
      """WITH e AS (SELECT event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hr FROM events),
        |span AS (SELECT CAST(max(hr) - min(hr) + 1 AS BIGINT) AS h FROM e),
        |slots AS (SELECT event_type, hr, count(*) AS c FROM e GROUP BY 1, 2),
        |agg AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n_events,
        |    count(*) AS n_active_hours,
        |    CAST(sum(c * c) AS BIGINT) AS ss
        |  FROM slots GROUP BY 1)
        |SELECT event_type, n_events, span.h AS n_hours, n_active_hours,
        |  CAST(floor(((CAST(ss AS DOUBLE) / CAST(span.h AS DOUBLE) -
        |    (CAST(n_events AS DOUBLE) / CAST(span.h AS DOUBLE)) *
        |    (CAST(n_events AS DOUBLE) / CAST(span.h AS DOUBLE))) /
        |    (CAST(n_events AS DOUBLE) / CAST(span.h AS DOUBLE))) * 10000 + 0.5)
        |    AS BIGINT) AS fano_bp
        |FROM agg CROSS JOIN span
        |ORDER BY event_type""".stripMargin,

    "q_zipf_fit" ->
      """WITH toks AS (SELECT unnest(string_split_regex(trim(text),
        |    '[ \t\n\r\f]+')) AS term
        |  FROM documents WHERE trim(text) <> ''),
        |tf AS (SELECT term, CAST(count(*) AS BIGINT) AS freq
        |  FROM toks GROUP BY 1),
        |rk AS (SELECT freq,
        |    row_number() OVER (ORDER BY freq DESC, term) AS rk FROM tf),
        |pts AS (SELECT
        |    CAST(floor(ln(CAST(rk AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS x,
        |    CAST(floor(ln(CAST(freq AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS y
        |  FROM rk WHERE rk <= 1000),
        |m AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * y) AS sxy, sum(x * x) AS sxx FROM pts)
        |SELECT CAST(n AS BIGINT) AS n_terms,
        |  CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |    CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |     CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 10000 + 0.5)
        |    AS BIGINT) AS slope_bp
        |FROM m""".stripMargin,

    "q_xyz_class" ->
      """WITH dm AS (SELECT l_partkey,
        |    CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS BIGINT) AS mn,
        |    CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS q
        |  FROM lineitem GROUP BY 1, 2),
        |span AS (SELECT CAST(max(mn) - min(mn) + 1 AS BIGINT) AS h FROM dm),
        |agg AS (SELECT l_partkey, count(*) AS n_active_months,
        |    CAST(sum(q) AS BIGINT) AS t, CAST(sum(q * q) AS BIGINT) AS ss
        |  FROM dm GROUP BY 1),
        |cvx AS (SELECT l_partkey, n_active_months, t,
        |    CAST(floor(sqrt(greatest(0.0, CAST(ss AS DOUBLE) / CAST(h AS DOUBLE) -
        |      (CAST(t AS DOUBLE) / CAST(h AS DOUBLE)) *
        |      (CAST(t AS DOUBLE) / CAST(h AS DOUBLE)))) /
        |      (CAST(t AS DOUBLE) / CAST(h AS DOUBLE)) * 10000 + 0.5)
        |      AS BIGINT) AS cv_bp
        |  FROM agg CROSS JOIN span)
        |SELECT l_partkey, n_active_months, t AS total_qty, cv_bp,
        |  CASE WHEN cv_bp < 17500 THEN 'X'
        |       WHEN cv_bp < 20500 THEN 'Y' ELSE 'Z' END AS xyz
        |FROM cvx ORDER BY l_partkey""".stripMargin,

    "q_seasonality_strength" ->
      // the q_seasonal decomposition CTE + exact moments of the
      // defined rows; identical pinned variance/ratio expressions
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM orders GROUP BY 1),
        |s AS (SELECT d, rev_c, (d - DATE '1970-01-01') % 7 AS dow,
        |        row_number() OVER (ORDER BY d) AS rn FROM daily),
        |tr AS (SELECT d, rev_c, dow,
        |         CASE WHEN count(*) OVER w = 7 THEN
        |           CAST((sum(rev_c) OVER w
        |             - (((sum(rev_c) OVER w) % 7) + 7) % 7) // 7 AS BIGINT)
        |         END AS trend_c
        |       FROM s WINDOW w AS (ORDER BY rn ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |se AS (SELECT dow,
        |         CAST((sum(rev_c - trend_c)
        |           - (((sum(rev_c - trend_c)) % count(*)) + count(*)) % count(*))
        |           // count(*) AS BIGINT) AS seasonal_c
        |       FROM tr WHERE trend_c IS NOT NULL GROUP BY dow),
        |comp AS (SELECT tr.rev_c - tr.trend_c - se.seasonal_c AS r,
        |    (se.seasonal_c + tr.rev_c - tr.trend_c - se.seasonal_c) AS sr,
        |    (tr.trend_c + tr.rev_c - tr.trend_c - se.seasonal_c) AS tr2
        |  FROM tr JOIN se USING (dow) WHERE tr.trend_c IS NOT NULL),
        |m AS (SELECT count(*) AS n,
        |    sum(r) AS s1, sum(r * r) AS ss1,
        |    sum(sr) AS s2, sum(sr * sr) AS ss2,
        |    sum(tr2) AS s3, sum(tr2 * tr2) AS ss3
        |  FROM comp)
        |SELECT CAST(n AS BIGINT) AS n_days,
        |  CAST(floor(greatest(0.0, 1.0 -
        |    (CAST(ss1 AS DOUBLE) / CAST(n AS DOUBLE) -
        |     (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) *
        |     (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))) /
        |    (CAST(ss2 AS DOUBLE) / CAST(n AS DOUBLE) -
        |     (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)) *
        |     (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)))) * 10000 + 0.5)
        |    AS BIGINT) AS seasonal_strength_bp,
        |  CAST(floor(greatest(0.0, 1.0 -
        |    (CAST(ss1 AS DOUBLE) / CAST(n AS DOUBLE) -
        |     (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) *
        |     (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))) /
        |    (CAST(ss3 AS DOUBLE) / CAST(n AS DOUBLE) -
        |     (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)) *
        |     (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)))) * 10000 + 0.5)
        |    AS BIGINT) AS trend_strength_bp
        |FROM m""".stripMargin,

    "q_runs_test" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM orders GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM daily),
        |med AS (SELECT rev_c AS m FROM (
        |    SELECT rev_c, row_number() OVER (ORDER BY rev_c, d) AS vr
        |    FROM daily) x CROSS JOIN nn WHERE vr = (n + 1) // 2),
        |sg AS (SELECT d, CASE WHEN rev_c > m THEN 1 ELSE 0 END AS sgn
        |  FROM daily CROSS JOIN med),
        |ch AS (SELECT sgn, CASE WHEN lag(sgn) OVER (ORDER BY d) IS NULL THEN 0
        |    WHEN lag(sgn) OVER (ORDER BY d) <> sgn THEN 1 ELSE 0 END AS chg
        |  FROM sg),
        |agg AS (SELECT count(*) AS n_days,
        |    CAST(sum(sgn) AS BIGINT) AS n_above,
        |    CAST(count(*) - sum(sgn) AS BIGINT) AS n_below,
        |    CAST(sum(chg) + 1 AS BIGINT) AS runs
        |  FROM ch)
        |SELECT n_days, n_above, n_below, runs,
        |  CAST(floor((CAST(runs AS DOUBLE) -
        |    (2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE) /
        |     CAST(n_days AS DOUBLE) + 1.0)) /
        |    sqrt((2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE) *
        |      (2.0 * CAST(n_above AS DOUBLE) * CAST(n_below AS DOUBLE) -
        |       CAST(n_days AS DOUBLE))) /
        |      (CAST(n_days AS DOUBLE) * CAST(n_days AS DOUBLE) *
        |       (CAST(n_days AS DOUBLE) - 1.0))) * 10000 + 0.5)
        |    AS BIGINT) AS z_bp
        |FROM agg""".stripMargin,

    "q_cohort_ltv" ->
      """WITH f AS (SELECT o_custkey,
        |    min(year(o_orderdate) * 12 + month(o_orderdate) - 1) AS c0
        |  FROM orders GROUP BY 1),
        |sized AS (SELECT c0, count(*) AS n_customers FROM f GROUP BY 1),
        |rev AS (SELECT f.c0,
        |    CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) - 1 - f.c0
        |      AS BIGINT) AS age,
        |    CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS rev_c
        |  FROM orders o JOIN f ON f.o_custkey = o.o_custkey
        |  GROUP BY 1, 2),
        |cum AS (SELECT rev.c0, rev.age, s.n_customers,
        |    CAST(sum(rev.rev_c) OVER (PARTITION BY rev.c0 ORDER BY rev.age
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_rev_c
        |  FROM rev JOIN sized s ON s.c0 = rev.c0)
        |SELECT CAST(c0 // 12 AS VARCHAR) || '-' ||
        |    lpad(CAST((c0 % 12) + 1 AS VARCHAR), 2, '0') AS cohort,
        |  age, n_customers, cum_rev_c,
        |  CAST(cum_rev_c // n_customers AS BIGINT) AS ltv_c
        |FROM cum ORDER BY cohort, age""".stripMargin,

    "q_levene" ->
      // group medians by exact rank selection, then the q_anova
      // arithmetic over |x - med|
      """WITH o AS (SELECT o_orderpriority AS grp, o_orderkey,
        |    CAST(floor(o_totalprice*100 + 0.5) AS BIGINT) AS x
        |  FROM orders),
        |sz AS (SELECT grp, count(*) AS ng FROM o GROUP BY 1),
        |md AS (SELECT grp, x AS med FROM (
        |    SELECT o.grp, o.x, sz.ng,
        |      row_number() OVER (PARTITION BY o.grp
        |        ORDER BY o.x, o.o_orderkey) AS vr
        |    FROM o JOIN sz ON sz.grp = o.grp) t
        |  WHERE vr = (ng + 1) // 2),
        |z AS (SELECT o.grp, abs(o.x - md.med) AS x
        |  FROM o JOIN md ON md.grp = o.grp),
        |g AS (SELECT grp, count(*) AS ng, sum(x) AS sg, sum(x*x) AS ssg
        |      FROM z GROUP BY 1),
        |q AS (SELECT grp, ng, sg, ssg, (sg * sg) // ng AS term FROM g),
        |m AS (SELECT count(*) AS k, sum(ng) AS n, sum(sg) AS s,
        |        sum(ssg) AS ss, sum(term) AS bq FROM q),
        |d AS (SELECT k, n, bq - (s * s) // n AS ssb, ss - bq AS ssw FROM m)
        |SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
        |  CAST(floor(
        |    (CAST(ssb AS DOUBLE) / (CAST(k AS DOUBLE) - 1.0))
        |    / (CAST(ssw AS DOUBLE) / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
        |    * 10000 + 0.5) AS BIGINT) AS f_bp
        |FROM d""".stripMargin,

    "q_durbin_watson" ->
      // the q_seasonal residual CTE + lag-1 squared differences;
      // HUGEINT sums cast to double only at the final pinned ratio
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM orders GROUP BY 1),
        |s AS (SELECT d, rev_c, (d - DATE '1970-01-01') % 7 AS dow,
        |        row_number() OVER (ORDER BY d) AS rn FROM daily),
        |tr AS (SELECT d, rev_c, dow, rn,
        |         CASE WHEN count(*) OVER w = 7 THEN
        |           CAST((sum(rev_c) OVER w
        |             - (((sum(rev_c) OVER w) % 7) + 7) % 7) // 7 AS BIGINT)
        |         END AS trend_c
        |       FROM s WINDOW w AS (ORDER BY rn ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |se AS (SELECT dow,
        |         CAST((sum(rev_c - trend_c)
        |           - (((sum(rev_c - trend_c)) % count(*)) + count(*)) % count(*))
        |           // count(*) AS BIGINT) AS seasonal_c
        |       FROM tr WHERE trend_c IS NOT NULL GROUP BY dow),
        |resid AS (SELECT tr.rn,
        |    tr.rev_c - tr.trend_c - se.seasonal_c AS e
        |  FROM tr JOIN se USING (dow) WHERE tr.trend_c IS NOT NULL),
        |lg AS (SELECT e, e - lag(e) OVER (ORDER BY rn) AS de FROM resid),
        |m AS (SELECT count(*) AS n, sum(e * e) AS den,
        |    sum(de * de) AS num FROM lg)
        |SELECT CAST(n AS BIGINT) AS n_resid,
        |  CAST(floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 10000 + 0.5)
        |    AS BIGINT) AS dw_e4
        |FROM m""".stripMargin,

    "q_granger" ->
      // centered moments staged as named columns; every double
      // expression keeps the Spark side's parenthesization verbatim
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CASE WHEN c_mktsegment = 'BUILDING'
        |      THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS yb,
        |    CAST(sum(CASE WHEN c_mktsegment <> 'BUILDING'
        |      THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS yr
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1),
        |dirs AS (
        |  SELECT 'building->rest' AS direction, d, yr AS y, yb AS x FROM daily
        |  UNION ALL
        |  SELECT 'rest->building' AS direction, d, yb AS y, yr AS x FROM daily),
        |lg AS (SELECT direction, y, x,
        |    lag(y) OVER (PARTITION BY direction ORDER BY d) AS y1,
        |    lag(x) OVER (PARTITION BY direction ORDER BY d) AS x1
        |  FROM dirs),
        |m AS (SELECT direction, count(*) AS n,
        |    sum(y) AS sy, sum(y1) AS sy1, sum(x1) AS sx1,
        |    sum(y * y) AS syy, sum(y * y1) AS syy1, sum(y * x1) AS syx1,
        |    sum(y1 * y1) AS sy1y1, sum(x1 * x1) AS sx1x1,
        |    sum(y1 * x1) AS sy1x1
        |  FROM lg WHERE y1 IS NOT NULL GROUP BY 1),
        |c AS (SELECT direction, n,
        |    CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS cyy,
        |    CAST(syy1 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy1 AS DOUBLE) / CAST(n AS DOUBLE) AS cyy1,
        |    CAST(syx1 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sx1 AS DOUBLE) / CAST(n AS DOUBLE) AS cyx1,
        |    CAST(sy1y1 AS DOUBLE) - CAST(sy1 AS DOUBLE) * CAST(sy1 AS DOUBLE) / CAST(n AS DOUBLE) AS cy1y1,
        |    CAST(sx1x1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE) / CAST(n AS DOUBLE) AS cx1x1,
        |    CAST(sy1x1 AS DOUBLE) - CAST(sy1 AS DOUBLE) * CAST(sx1 AS DOUBLE) / CAST(n AS DOUBLE) AS cy1x1
        |  FROM m),
        |f AS (SELECT direction, n,
        |    (cyy - cyy1 * cyy1 / cy1y1) AS sser,
        |    (cyy - ((cyy1 * cx1x1 - cyx1 * cy1x1) / (cy1y1 * cx1x1 - cy1x1 * cy1x1) * cyy1
        |      + (cyx1 * cy1y1 - cyy1 * cy1x1) / (cy1y1 * cx1x1 - cy1x1 * cy1x1) * cyx1)) AS sseu
        |  FROM c)
        |SELECT direction, CAST(n AS BIGINT) AS n,
        |  CAST(floor((sser - sseu) / (sseu / (CAST(n AS DOUBLE) - 3.0))
        |    * 10000 + 0.5) AS BIGINT) AS f_bp
        |FROM f ORDER BY direction""".stripMargin,

    "q_retention_fit" ->
      """WITH f AS (SELECT o_custkey,
        |    min(year(o_orderdate) * 12 + month(o_orderdate) - 1) AS c0
        |  FROM orders GROUP BY 1),
        |sized AS (SELECT c0, count(*) AS nc FROM f GROUP BY 1),
        |act AS (SELECT f.c0,
        |    CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) - 1 - f.c0
        |      AS BIGINT) AS age,
        |    count(DISTINCT o.o_custkey) AS na
        |  FROM orders o JOIN f ON f.o_custkey = o.o_custkey
        |  GROUP BY 1, 2 HAVING age >= 1),
        |pts AS (SELECT act.age AS x,
        |    CAST(floor(ln(CAST(act.na AS DOUBLE) / CAST(s.nc AS DOUBLE))
        |      * 10000 + 0.5) AS BIGINT) AS y
        |  FROM act JOIN sized s ON s.c0 = act.c0),
        |m AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * y) AS sxy, sum(x * x) AS sxx FROM pts)
        |SELECT CAST(n AS BIGINT) AS n_points,
        |  CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |    CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |     CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) + 0.5)
        |    AS BIGINT) AS slope_bp
        |FROM m""".stripMargin,

    "q_newsvendor" ->
      """WITH dm AS (SELECT p.p_brand,
        |    CAST(year(l.l_shipdate) * 12 + month(l.l_shipdate) - 1 AS BIGINT) AS mn,
        |    CAST(sum(CAST(floor(l.l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS q
        |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |  GROUP BY 1, 2),
        |sizes AS (SELECT p_brand, count(*) AS nm,
        |    CAST(sum(q) // count(*) AS BIGINT) AS mean_q
        |  FROM dm GROUP BY 1),
        |rk AS (SELECT dm.p_brand, dm.q, s.nm, s.mean_q,
        |    row_number() OVER (PARTITION BY dm.p_brand
        |      ORDER BY dm.q, dm.mn) AS vr
        |  FROM dm JOIN sizes s ON s.p_brand = dm.p_brand)
        |SELECT p_brand, CAST(nm AS BIGINT) AS n_months, mean_q,
        |  q AS q_star
        |FROM rk WHERE vr = (8 * nm + 9) // 10
        |ORDER BY p_brand""".stripMargin,

    // k-truss edge peel, the fixed-round unrolled replay (the q_kcore
    // contract: converged rounds re-emit unchanged, so the last round
    // IS the fixpoint whenever the Scala side converged inside the
    // same budget); per-round support = |N(u) ∩ N(v)| via one
    // adjacency self-join
    "q_ktruss" -> kTrussOracle(k = 5),
  )

  /** q_ktruss's oracle generator: 20 unrolled peel rounds over the
    * 1-in-9 order-slice co-purchase graph, each round = symmetric
    * adjacency + common-neighbor support + the support >= k−2 filter
    * (k matches the engine call in SparkEntry's q_ktruss);
    * triangle-free edges vanish at the inner support join, exactly like
    * the engine's semi join. Final supports recomputed on the surviving
    * set (the engine's lastSup IS that table at the fixpoint).
    */
  private def kTrussOracle(k: Int): String = {
    val rounds = 20
    def roundCtes(i: Int): String = {
      val prev = if (i == 1) "e0" else s"e${i - 1}"
      s"""adj$i AS MATERIALIZED (SELECT u AS s, v AS d FROM $prev UNION ALL SELECT v, u FROM $prev),
        |sup$i AS MATERIALIZED (
        |  SELECT e.u, e.v, count(*) AS c
        |  FROM $prev e
        |  JOIN adj$i a1 ON a1.s = e.u
        |  JOIN adj$i a2 ON a2.s = e.v AND a2.d = a1.d
        |  GROUP BY e.u, e.v),
        |e$i AS MATERIALIZED (
        |  SELECT e.u, e.v FROM $prev e
        |  JOIN sup$i s ON s.u = e.u AND s.v = e.v
        |  WHERE s.c >= ${k - 2})"""
    }
    s"""WITH pairs AS (
      |  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  WHERE a.l_orderkey % 9 = 0 AND b.l_orderkey % 9 = 0),
      |e0 AS MATERIALIZED (
      |  SELECT DISTINCT least(pa, pb) AS u, greatest(pa, pb) AS v
      |  FROM pairs WHERE pa <> pb),
      |${(1 to rounds).map(roundCtes).mkString(",\n")},
      |adjF AS (SELECT u AS s, v AS d FROM e$rounds UNION ALL SELECT v, u FROM e$rounds),
      |supF AS (
      |  SELECT e.u, e.v, count(*) AS c
      |  FROM e$rounds e
      |  JOIN adjF a1 ON a1.s = e.u
      |  JOIN adjF a2 ON a2.s = e.v AND a2.d = a1.d
      |  GROUP BY e.u, e.v)
      |SELECT e.u, e.v, s.c AS support
      |FROM e$rounds e JOIN supF s ON s.u = e.u AND s.v = e.v
      |ORDER BY e.u, e.v""".stripMargin
  }
}
