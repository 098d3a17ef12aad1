package graft

import SparkEntry.EcomJobOracle

/** DuckDB oracle SQL for the SURVEY §2A relational-ETL queries.
  *
  * Mechanically split out of SparkEntry.oracleSql (round 11) so the
  * registry file stays navigable — same entries, same gate, zero
  * behavior change. Every key here pairs with a SparkEntry.queries
  * registration; the driver compares both on rows+schema+hash.
  */
private[graft] object OracleRelationalSql {

  def sql: Map[String, String] = Map(

    "q_filtered_read" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
        |  AND l_quantity < 25
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_conditional_mapping" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE o_orderstatus <> 'F' AND o_totalprice >= 200000
        |  AND o_orderpriority LIKE '%URGENT%'
        |  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
        |ORDER BY o_orderkey""".stripMargin,

    "q_denorm_join" ->
      """SELECT s_suppkey, s_name, n_name AS nation_name, r_name AS region_name
        |FROM supplier
        |LEFT JOIN nation ON s_nationkey = n_nationkey
        |LEFT JOIN region ON n_regionkey = r_regionkey
        |ORDER BY s_suppkey""".stripMargin,

    "q_string_agg" ->
      """SELECT n_name,
        |  string_agg('"' || c_name || '"', ',' ORDER BY '"' || c_name || '"') AS customer_list,
        |  count(*) AS n_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    "q_pivot" ->
      """SELECT user_id,
        |  CAST(round(sum(CAST(CASE WHEN event_type = 'click' THEN value END AS DECIMAL(30,6))), 2) AS DOUBLE) AS v_click,
        |  CAST(round(sum(CAST(CASE WHEN event_type = 'error' THEN value END AS DECIMAL(30,6))), 2) AS DOUBLE) AS v_error,
        |  CAST(round(sum(CAST(CASE WHEN event_type = 'purchase' THEN value END AS DECIMAL(30,6))), 2) AS DOUBLE) AS v_purchase,
        |  CAST(round(sum(CAST(CASE WHEN event_type = 'signup' THEN value END AS DECIMAL(30,6))), 2) AS DOUBLE) AS v_signup,
        |  CAST(round(sum(CAST(CASE WHEN event_type = 'view' THEN value END AS DECIMAL(30,6))), 2) AS DOUBLE) AS v_view
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "q_except_intersect" ->
      """WITH y96 AS (SELECT DISTINCT o_custkey FROM orders
        |  WHERE year(o_orderdate) = 1996),
        |y97 AS (SELECT DISTINCT o_custkey FROM orders
        |  WHERE year(o_orderdate) = 1997)
        |SELECT o_custkey, 'retained' AS cohort
        |FROM (SELECT o_custkey FROM y96 INTERSECT SELECT o_custkey FROM y97)
        |UNION ALL
        |SELECT o_custkey, 'churned' AS cohort
        |FROM (SELECT o_custkey FROM y96 EXCEPT SELECT o_custkey FROM y97)
        |ORDER BY cohort, o_custkey""".stripMargin,

    "q_fuzzy_match" ->
      """WITH feed AS (SELECT n_nationkey AS feed_key,
        |  substr(n_name, 1, 2) || substr(n_name, 4) AS feed_name FROM nation)
        |SELECT f.feed_key, f.feed_name, n.n_nationkey, n.n_name,
        |  CAST(levenshtein(f.feed_name, n.n_name) AS INT) AS edit_dist
        |FROM feed f JOIN nation n ON levenshtein(f.feed_name, n.n_name) <= 1
        |ORDER BY feed_key, n_nationkey""".stripMargin,

    "q_incremental_agg" ->
      """WITH dest AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |incoming AS (
        |  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice + 1000.0 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, 'N', o_totalprice - 500.0
        |  FROM orders WHERE o_orderkey % 7 = 0),
        |merged AS (
        |  SELECT coalesce(d.o_orderkey, i.o_orderkey) AS o_orderkey,
        |    coalesce(i.o_orderstatus, d.o_orderstatus) AS o_orderstatus,
        |    coalesce(i.o_totalprice, d.o_totalprice) AS o_totalprice
        |  FROM dest d FULL OUTER JOIN incoming i ON d.o_orderkey = i.o_orderkey)
        |SELECT o_orderstatus, count(*) AS n_rows,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total
        |FROM merged
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "q_change_feed" ->
      """WITH src AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |dst AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 1.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 30000000, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 101 = 0)
        |SELECT s.o_orderkey, s.o_orderstatus, s.o_totalprice, 'D' AS op
        |FROM src s LEFT JOIN dst d ON s.o_orderkey = d.o_orderkey
        |WHERE d.o_orderkey IS NULL
        |  OR s.o_orderstatus IS DISTINCT FROM d.o_orderstatus
        |  OR s.o_totalprice IS DISTINCT FROM d.o_totalprice
        |UNION ALL
        |SELECT d.o_orderkey, d.o_orderstatus, d.o_totalprice, 'I'
        |FROM dst d LEFT JOIN src s ON d.o_orderkey = s.o_orderkey
        |WHERE s.o_orderkey IS NULL
        |  OR s.o_orderstatus IS DISTINCT FROM d.o_orderstatus
        |  OR s.o_totalprice IS DISTINCT FROM d.o_totalprice
        |ORDER BY o_orderkey, op""".stripMargin,

    "q_drift_psi" ->
      """WITH ob AS (
        |  SELECT CASE WHEN l_extendedprice < 20000 THEN 0
        |              WHEN l_extendedprice < 40000 THEN 1
        |              WHEN l_extendedprice < 60000 THEN 2
        |              WHEN l_extendedprice < 80000 THEN 3
        |              ELSE 4 END AS bucket
        |  FROM lineitem WHERE l_shipdate < TIMESTAMP '1997-01-01'),
        |nb AS (
        |  SELECT CASE WHEN l_extendedprice < 20000 THEN 0
        |              WHEN l_extendedprice < 40000 THEN 1
        |              WHEN l_extendedprice < 60000 THEN 2
        |              WHEN l_extendedprice < 80000 THEN 3
        |              ELSE 4 END AS bucket
        |  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01'),
        |oc AS (SELECT bucket, count(*) AS n_old FROM ob GROUP BY bucket),
        |nc AS (SELECT bucket, count(*) AS n_new FROM nb GROUP BY bucket),
        |j AS (
        |  SELECT coalesce(oc.bucket, nc.bucket) AS bucket,
        |    coalesce(n_old, 0) AS n_old, coalesce(n_new, 0) AS n_new
        |  FROM oc FULL OUTER JOIN nc ON oc.bucket = nc.bucket),
        |t AS (SELECT sum(n_old) AS to_, sum(n_new) AS tn FROM j)
        |SELECT bucket, n_old, n_new,
        |  CAST(floor(((n_new + 0.5) / (tn + 2.5) - (n_old + 0.5) / (to_ + 2.5))
        |    * ln(((n_new + 0.5) / (tn + 2.5)) / ((n_old + 0.5) / (to_ + 2.5)))
        |    * 1000000 + 0.5) AS BIGINT) AS psi_ppm
        |FROM j, t ORDER BY bucket""".stripMargin,

    // q_drift_profile: independent full-SQL replay, one block per column
    // (each block is the q_drift_psi oracle specialized to that column's
    // boundaries), UNION ALL'd — DuckDB recomputes every count and PSI
    // term from the raw table, sharing nothing with the Spark one-pass
    // stack formulation

    "q_drift_profile" -> Seq(
      ("l_extendedprice", Seq("20000", "40000", "60000", "80000")),
      ("l_quantity", Seq("10", "20", "30", "40")),
      ("l_discount", Seq("0.02", "0.04", "0.06", "0.08"))
    ).map { case (c, bs) =>
      val caseExpr = bs.zipWithIndex
        .map { case (b, i) => s"WHEN $c < $b THEN $i" }
        .mkString("CASE ", " ", s" ELSE ${bs.size} END")
      val k = bs.size + 1
      s"""SELECT '$c' AS col_name, bucket, n_old, n_new,
         |  CAST(floor(((n_new + 0.5) / (tn + 0.5 * $k) - (n_old + 0.5) / (to_ + 0.5 * $k))
         |    * ln(((n_new + 0.5) / (tn + 0.5 * $k)) / ((n_old + 0.5) / (to_ + 0.5 * $k)))
         |    * 1000000 + 0.5) AS BIGINT) AS psi_ppm
         |FROM (
         |  SELECT coalesce(oc.bucket, nc.bucket) AS bucket,
         |    coalesce(n_old, 0) AS n_old, coalesce(n_new, 0) AS n_new
         |  FROM (SELECT $caseExpr AS bucket, count(*) AS n_old FROM lineitem
         |        WHERE l_shipdate < TIMESTAMP '1997-01-01' AND $c IS NOT NULL
         |        GROUP BY 1) oc
         |  FULL OUTER JOIN (SELECT $caseExpr AS bucket, count(*) AS n_new FROM lineitem
         |        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND $c IS NOT NULL
         |        GROUP BY 1) nc ON oc.bucket = nc.bucket) j,
         |  (SELECT sum(CASE WHEN l_shipdate < TIMESTAMP '1997-01-01' THEN 1 ELSE 0 END) AS to_,
         |          sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01' THEN 1 ELSE 0 END) AS tn
         |   FROM lineitem WHERE $c IS NOT NULL) t""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name, bucket"),

    "q_drift_ks" ->
      """WITH ob AS (
        |  SELECT CASE WHEN l_extendedprice < 20000 THEN 0
        |              WHEN l_extendedprice < 40000 THEN 1
        |              WHEN l_extendedprice < 60000 THEN 2
        |              WHEN l_extendedprice < 80000 THEN 3
        |              ELSE 4 END AS bucket
        |  FROM lineitem WHERE l_shipdate < TIMESTAMP '1997-01-01'
        |    AND l_extendedprice IS NOT NULL),
        |nb AS (
        |  SELECT CASE WHEN l_extendedprice < 20000 THEN 0
        |              WHEN l_extendedprice < 40000 THEN 1
        |              WHEN l_extendedprice < 60000 THEN 2
        |              WHEN l_extendedprice < 80000 THEN 3
        |              ELSE 4 END AS bucket
        |  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_extendedprice IS NOT NULL),
        |oc AS (SELECT bucket, count(*) AS n_old FROM ob GROUP BY bucket),
        |nc AS (SELECT bucket, count(*) AS n_new FROM nb GROUP BY bucket),
        |j AS (
        |  SELECT coalesce(oc.bucket, nc.bucket) AS bucket,
        |    coalesce(n_old, 0) AS n_old, coalesce(n_new, 0) AS n_new
        |  FROM oc FULL OUTER JOIN nc ON oc.bucket = nc.bucket),
        |c AS (
        |  SELECT bucket,
        |    sum(n_old) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum_old,
        |    sum(n_new) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum_new
        |  FROM j),
        |t AS (SELECT sum(n_old) AS to_, sum(n_new) AS tn FROM j)
        |SELECT bucket, CAST(cum_old AS BIGINT) AS cum_old,
        |  CAST(cum_new AS BIGINT) AS cum_new,
        |  CAST(floor(abs(CAST(cum_new AS DOUBLE) / CAST(greatest(tn, 1) AS DOUBLE)
        |    - CAST(cum_old AS DOUBLE) / CAST(greatest(to_, 1) AS DOUBLE)) * 10000 + 0.5)
        |    AS BIGINT) AS diff_bp
        |FROM c, t ORDER BY bucket""".stripMargin,

    // q_drift_corpus: same independent per-signal replay as
    // q_drift_profile, with the signals derived in SQL from the raw text

    "q_drift_corpus" -> Seq(
      ("n_chars_sig", "length(text)", Seq("175", "300", "420")),
      ("n_tokens_sig",
        "length(regexp_split_to_array(trim(text), '[ \\t\\n\\r\\f]+'))",
        Seq("32", "56", "76"))
    ).map { case (name, expr, bs) =>
      val caseExpr = bs.zipWithIndex
        .map { case (b, i) => s"WHEN $expr < $b THEN $i" }
        .mkString("CASE ", " ", s" ELSE ${bs.size} END")
      val k = bs.size + 1
      s"""SELECT '$name' AS col_name, bucket, n_old, n_new,
         |  CAST(floor(((n_new + 0.5) / (tn + 0.5 * $k) - (n_old + 0.5) / (to_ + 0.5 * $k))
         |    * ln(((n_new + 0.5) / (tn + 0.5 * $k)) / ((n_old + 0.5) / (to_ + 0.5 * $k)))
         |    * 1000000 + 0.5) AS BIGINT) AS psi_ppm
         |FROM (
         |  SELECT coalesce(oc.bucket, nc.bucket) AS bucket,
         |    coalesce(n_old, 0) AS n_old, coalesce(n_new, 0) AS n_new
         |  FROM (SELECT $caseExpr AS bucket, count(*) AS n_old FROM documents
         |        WHERE doc_id % 2 = 0 AND $expr IS NOT NULL
         |        GROUP BY 1) oc
         |  FULL OUTER JOIN (SELECT $caseExpr AS bucket, count(*) AS n_new FROM documents
         |        WHERE doc_id % 2 = 1 AND $expr IS NOT NULL
         |        GROUP BY 1) nc ON oc.bucket = nc.bucket) j,
         |  (SELECT sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS to_,
         |          sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS tn
         |   FROM documents WHERE $expr IS NOT NULL) t""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name, bucket"),

    "q_drift_categorical" ->
      """WITH oldc AS (
        |  SELECT o_orderpriority AS category, count(*) AS n
        |  FROM orders
        |  WHERE o_orderdate < TIMESTAMP '1997-01-01'
        |    AND o_orderpriority IS NOT NULL
        |  GROUP BY 1),
        |top AS (SELECT category FROM oldc ORDER BY n DESC, category LIMIT 3),
        |ob AS (
        |  SELECT CASE WHEN o_orderpriority IN (SELECT category FROM top)
        |              THEN o_orderpriority ELSE '__OTHER__' END AS category
        |  FROM orders
        |  WHERE o_orderdate < TIMESTAMP '1997-01-01'
        |    AND o_orderpriority IS NOT NULL),
        |nb AS (
        |  SELECT CASE WHEN o_orderpriority IN (SELECT category FROM top)
        |              THEN o_orderpriority ELSE '__OTHER__' END AS category
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderpriority IS NOT NULL),
        |oc AS (SELECT category, count(*) AS n_old FROM ob GROUP BY 1),
        |nc AS (SELECT category, count(*) AS n_new FROM nb GROUP BY 1),
        |j AS (
        |  SELECT coalesce(oc.category, nc.category) AS category,
        |    coalesce(n_old, 0) AS n_old, coalesce(n_new, 0) AS n_new
        |  FROM oc FULL OUTER JOIN nc ON oc.category = nc.category),
        |t AS (SELECT sum(n_old) AS to_, sum(n_new) AS tn FROM j)
        |SELECT category, n_old, n_new,
        |  CAST(floor(((n_new + 0.5) / (tn + 2.0) - (n_old + 0.5) / (to_ + 2.0))
        |    * ln(((n_new + 0.5) / (tn + 2.0)) / ((n_old + 0.5) / (to_ + 2.0)))
        |    * 1000000 + 0.5) AS BIGINT) AS psi_ppm
        |FROM j, t ORDER BY category""".stripMargin,

    "q_sync_diff" ->
      """WITH src AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |dst AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 1.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 30000000, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderkey % 101 = 0)
        |SELECT coalesce(s.o_orderkey, d.o_orderkey) AS o_orderkey,
        |  CASE WHEN d.o_orderkey IS NULL THEN 'missing'
        |       WHEN s.o_orderkey IS NULL THEN 'extra'
        |       WHEN s.o_orderstatus IS DISTINCT FROM d.o_orderstatus
        |         OR s.o_totalprice IS DISTINCT FROM d.o_totalprice
        |         THEN 'differs' END AS status
        |FROM src s FULL OUTER JOIN dst d ON s.o_orderkey = d.o_orderkey
        |WHERE CASE WHEN d.o_orderkey IS NULL THEN 'missing'
        |       WHEN s.o_orderkey IS NULL THEN 'extra'
        |       WHEN s.o_orderstatus IS DISTINCT FROM d.o_orderstatus
        |         OR s.o_totalprice IS DISTINCT FROM d.o_totalprice
        |         THEN 'differs' END IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin,

    "q_incremental_join" ->
      """SELECT o_orderkey, o_custkey AS custkey, o_totalprice, c_name, c_acctbal
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "q_minmax_maintain" ->
      """WITH dest AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |incoming AS (
        |  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice + 1000.0 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, 'N', o_totalprice - 500.0
        |  FROM orders WHERE o_orderkey % 7 = 0),
        |merged AS (
        |  SELECT coalesce(d.o_orderkey, i.o_orderkey) AS o_orderkey,
        |    coalesce(i.o_orderstatus, d.o_orderstatus) AS o_orderstatus,
        |    coalesce(i.o_totalprice, d.o_totalprice) AS o_totalprice
        |  FROM dest d FULL OUTER JOIN incoming i ON d.o_orderkey = i.o_orderkey)
        |SELECT o_orderstatus, count(*) AS n_rows, max(o_totalprice) AS max_price
        |FROM merged
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "q_profile" ->
      """SELECT 'o_orderkey' AS col_name, count(*) AS n_rows,
        |  count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS n_null,
        |  count(DISTINCT o_orderkey) AS n_distinct FROM orders
        |UNION ALL
        |SELECT 'o_custkey', count(*),
        |  count(CASE WHEN o_custkey IS NULL THEN 1 END),
        |  count(DISTINCT o_custkey) FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', count(*),
        |  count(CASE WHEN o_orderstatus IS NULL THEN 1 END),
        |  count(DISTINCT o_orderstatus) FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', count(*),
        |  count(CASE WHEN o_orderpriority IS NULL THEN 1 END),
        |  count(DISTINCT o_orderpriority) FROM orders
        |ORDER BY col_name""".stripMargin,

    "q_pivot_dynamic" ->
      """WITH p AS (SELECT user_id, event_type, CAST(value AS DECIMAL(30,6)) AS v FROM events),
        |w AS (SELECT * FROM (PIVOT p ON event_type USING sum(v)))
        |SELECT user_id, CAST(round(COLUMNS(c -> c <> 'user_id'), 2) AS DOUBLE)
        |FROM w ORDER BY user_id""".stripMargin,

    "q_correlated_lookup" ->
      """SELECT o_custkey, o_orderkey AS top_orderkey, o_totalprice AS top_totalprice
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn FROM orders)
        |WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin,

    // CASE guard: an empty/whitespace-only doc yields [''] from
    // string_split_regex but [] from TextFunctions.tokens — guard like
    // the other token oracles so parity doesn't depend on the corpus
    // happening to contain no empty doc in range

    "q_explode_relations" ->
      """SELECT doc_id, unnest(
        |    CASE WHEN len(trim(text)) = 0 THEN []
        |         ELSE string_split_regex(trim(text), '\s+') END) AS token
        |FROM documents
        |WHERE doc_id < 200
        |ORDER BY doc_id, token""".stripMargin,

    "q_merge_upsert" ->
      """WITH dest AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders),
        |incoming AS (
        |  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice + 1000.0 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, 'N', o_totalprice - 500.0
        |  FROM orders WHERE o_orderkey % 7 = 0)
        |SELECT coalesce(d.o_orderkey, i.o_orderkey) AS o_orderkey,
        |  d.o_custkey AS o_custkey,
        |  coalesce(i.o_orderstatus, d.o_orderstatus) AS o_orderstatus,
        |  coalesce(i.o_totalprice, d.o_totalprice) AS o_totalprice
        |FROM dest d FULL OUTER JOIN incoming i ON d.o_orderkey = i.o_orderkey
        |ORDER BY o_orderkey""".stripMargin,

    "q_update_existing" ->
      """WITH dest AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders),
        |incoming AS (
        |  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice + 1000.0 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, 'N', o_totalprice - 500.0
        |  FROM orders WHERE o_orderkey % 7 = 0)
        |SELECT d.o_orderkey AS o_orderkey, d.o_custkey AS o_custkey,
        |  coalesce(i.o_orderstatus, d.o_orderstatus) AS o_orderstatus,
        |  coalesce(i.o_totalprice, d.o_totalprice) AS o_totalprice
        |FROM dest d LEFT JOIN incoming i ON d.o_orderkey = i.o_orderkey
        |ORDER BY 1""".stripMargin,

    "q_scd2_snapshot" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    "q_scd2_feed" ->
      """WITH snap AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |changes AS (
        |  SELECT o_orderkey, 'U1' AS o_orderstatus, o_totalprice + 1000.0 AS o_totalprice,
        |         '2024-01-01' AS ts, 'U' AS op FROM orders WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 'U2', o_totalprice + 2000.0, '2024-02-01', 'U'
        |  FROM orders WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey, NULL, NULL, '2024-03-01', 'D'
        |  FROM orders WHERE o_orderkey % 20 = 0),
        |v AS (SELECT *, lead(ts) OVER (PARTITION BY o_orderkey ORDER BY ts) AS next_ts
        |      FROM changes),
        |f AS (SELECT o_orderkey, min(ts) AS first_ts FROM changes GROUP BY 1)
        |SELECT s.o_orderkey, s.o_orderstatus, s.o_totalprice,
        |       '2020-01-01' AS valid_from, f.first_ts AS valid_to,
        |       f.first_ts IS NULL AS is_current
        |FROM snap s LEFT JOIN f USING (o_orderkey)
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_totalprice, ts, next_ts, next_ts IS NULL
        |FROM v WHERE op <> 'D'
        |ORDER BY o_orderkey, valid_from""".stripMargin,

    "q_scd2" ->
      """WITH snap AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |incoming AS (
        |  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice + 1000.0 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey % 5 <> 0 AND o_orderkey % 3 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, 'N', o_totalprice - 500.0
        |  FROM orders WHERE o_orderkey % 7 = 0),
        |j AS (SELECT s.o_orderkey AS sk, s.o_orderstatus AS ss, s.o_totalprice AS sp,
        |             i.o_orderkey AS ik, i.o_orderstatus AS ist, i.o_totalprice AS ip
        |      FROM snap s FULL OUTER JOIN incoming i ON s.o_orderkey = i.o_orderkey)
        |SELECT sk AS o_orderkey, ss AS o_orderstatus, sp AS o_totalprice,
        |       '2020-01-01' AS valid_from, NULL AS valid_to, TRUE AS is_current
        |FROM j WHERE sk IS NOT NULL AND (ik IS NULL OR
        |  (ss IS NOT DISTINCT FROM ist AND sp IS NOT DISTINCT FROM ip))
        |UNION ALL
        |SELECT sk, ss, sp, '2020-01-01', '2024-06-01', FALSE
        |FROM j WHERE sk IS NOT NULL AND ik IS NOT NULL
        |  AND (ss IS DISTINCT FROM ist OR sp IS DISTINCT FROM ip)
        |UNION ALL
        |SELECT ik, ist, ip, '2024-06-01', NULL, TRUE
        |FROM j WHERE ik IS NOT NULL AND (sk IS NULL OR
        |  (ss IS DISTINCT FROM ist OR sp IS DISTINCT FROM ip))
        |ORDER BY o_orderkey, valid_from""".stripMargin,

    "q_cdc_apply" ->
      """WITH dest AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders),
        |changes AS (
        |  SELECT o_orderkey, 'U1' AS o_orderstatus, o_totalprice + 1000.0 AS o_totalprice,
        |         1 AS version, 'U' AS op FROM orders WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 'U2', o_totalprice + 2000.0, 2, 'U' FROM orders WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey, NULL, NULL, 3, 'D' FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 20000000, 'N', o_totalprice - 500.0, 1, 'I'
        |  FROM orders WHERE o_orderkey % 13 = 0),
        |latest AS (SELECT * FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY version DESC) AS rn
        |  FROM changes) WHERE rn = 1),
        |ups AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM latest WHERE op <> 'D'),
        |merged AS (
        |  SELECT coalesce(d.o_orderkey, u.o_orderkey) AS o_orderkey,
        |    d.o_custkey AS o_custkey,
        |    coalesce(u.o_orderstatus, d.o_orderstatus) AS o_orderstatus,
        |    coalesce(u.o_totalprice, d.o_totalprice) AS o_totalprice
        |  FROM dest d FULL OUTER JOIN ups u ON d.o_orderkey = u.o_orderkey)
        |SELECT m.o_orderkey, m.o_custkey, m.o_orderstatus, m.o_totalprice
        |FROM merged m
        |LEFT JOIN (SELECT o_orderkey FROM latest WHERE op = 'D') t
        |  ON m.o_orderkey = t.o_orderkey
        |WHERE t.o_orderkey IS NULL
        |ORDER BY m.o_orderkey""".stripMargin,

    "q_insert_missing" ->
      """WITH incoming AS (
        |  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice + 1000.0 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 5 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, 'N', o_totalprice - 500.0
        |  FROM orders WHERE o_orderkey % 7 = 0)
        |SELECT i.o_orderkey, i.o_orderstatus, i.o_totalprice
        |FROM incoming i
        |WHERE NOT EXISTS (SELECT 1 FROM orders d WHERE d.o_orderkey = i.o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q_dedup_exact" ->
      """SELECT l_orderkey, l_partkey, l_quantity
        |FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey
        |        ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn FROM lineitem)
        |WHERE rn = 1
        |ORDER BY l_orderkey""".stripMargin,

    "q_delete_excess" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_totalprice > 350000 AND o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_delete_excess_scoped" ->
      """WITH incoming AS (
        |  SELECT c_custkey, c_nationkey FROM customer
        |  WHERE c_acctbal > 5000 AND c_nationkey < 10)
        |SELECT c_custkey, c_name, c_nationkey
        |FROM customer c
        |WHERE c_nationkey IN (SELECT c_nationkey FROM incoming)
        |  AND NOT EXISTS (SELECT 1 FROM incoming i WHERE i.c_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_assortment_rebuild" ->
      """WITH users AS (
        |  SELECT c_custkey AS user_id, c_mktsegment AS seg
        |  FROM customer WHERE c_acctbal > 9950),
        |perm AS (
        |  SELECT DISTINCT c_mktsegment AS seg, l_partkey AS part_key
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  WHERE l_quantity = 50),
        |rebuilt AS (
        |  SELECT DISTINCT u.user_id, p.part_key
        |  FROM users u JOIN perm p ON u.seg = p.seg),
        |existing AS (
        |  SELECT DISTINCT u.user_id, l_partkey AS part_key
        |  FROM users u
        |  JOIN orders ON o_custkey = u.user_id
        |  JOIN lineitem ON l_orderkey = o_orderkey),
        |alls AS (
        |  SELECT user_id, part_key FROM existing
        |  UNION
        |  SELECT user_id, part_key FROM rebuilt)
        |SELECT a.user_id, a.part_key,
        |  CAST(CASE WHEN EXISTS (SELECT 1 FROM rebuilt r
        |    WHERE r.user_id = a.user_id AND r.part_key = a.part_key)
        |  THEN 1 ELSE 0 END AS INTEGER) AS is_active
        |FROM alls a
        |ORDER BY user_id, part_key""".stripMargin,

    "q_salted_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q_flag_missing" ->
      """SELECT c_custkey,
        |  CAST(CASE WHEN EXISTS (SELECT 1 FROM orders
        |    WHERE o_orderstatus = 'F' AND o_custkey = c_custkey)
        |  THEN 1 ELSE 0 END AS INTEGER) AS is_active
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,

    "q_surrogate_ids" ->
      """SELECT doc_id,
        |  CAST(1000 + row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS new_id
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "q_name_match" ->
      """SELECT c.c_custkey,
        |  CAST(floor(jaro_winkler_similarity(c.c_name, d.c_name) * 10000 + 0.5)
        |    AS BIGINT) AS sim_bp
        |FROM customer c JOIN customer d ON d.c_custkey = c.c_custkey + 1
        |ORDER BY c.c_custkey""".stripMargin,

    "q_fk_by_name" ->
      """SELECT c_custkey, n_name AS nation_name, n_nationkey AS resolved_key
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY c_custkey""".stripMargin,

    "q_create_missing_refs" ->
      """SELECT DISTINCT c_custkey, 'REF-' || c_custkey AS new_ref_id
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_orderstatus = 'F' AND o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_fk_fallback" ->
      """SELECT o_orderkey, coalesce(c1.c_custkey, c2.c_custkey) AS resolved_key
        |FROM (SELECT o_orderkey,
        |        CASE WHEN o_orderkey % 2 = 0 THEN o_custkey END AS k,
        |        'Customer#' || lpad(CAST(o_custkey AS VARCHAR), 9, '0') AS nm
        |      FROM orders) o
        |LEFT JOIN customer c1 ON o.k = c1.c_custkey
        |LEFT JOIN customer c2 ON o.nm = c2.c_name
        |ORDER BY o_orderkey""".stripMargin,

    "q_default_values" ->
      """SELECT c_custkey,
        |  coalesce(nullif(c_name, ''), 'UNKNOWN') AS name_filled,
        |  CASE WHEN c_acctbal < 0 THEN 'DELINQUENT' ELSE c_mktsegment END AS segment,
        |  'CUST-' || c_custkey AS ext_id
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,

    "q_quarantine" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority,
        |  concat_ws(',',
        |    CASE WHEN NOT coalesce(o_totalprice < 300000, FALSE) THEN 'price_high' END,
        |    CASE WHEN NOT coalesce(o_orderpriority NOT LIKE '%LOW%', FALSE) THEN 'low_prio' END
        |  ) AS quarantine_reason
        |FROM orders
        |WHERE NOT coalesce(o_totalprice < 300000, FALSE)
        |   OR NOT coalesce(o_orderpriority NOT LIKE '%LOW%', FALSE)
        |ORDER BY o_orderkey""".stripMargin,

    "q_propagate_variants" ->
      """SELECT l_orderkey, l_linenumber,
        |  coalesce(nullif(l_returnflag, 'N'),
        |    max(CASE WHEN l_linenumber = 1 THEN nullif(l_returnflag, 'N') END)
        |      OVER (PARTITION BY l_orderkey)) AS ship_note
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_distinct_count" ->
      """SELECT l_partkey, count(DISTINCT l_suppkey) AS n_supp, count(*) AS n_lines
        |FROM lineitem
        |GROUP BY l_partkey
        |ORDER BY l_partkey""".stripMargin,

    "q_assortment_pairs" ->
      """SELECT DISTINCT user_id, event_type, c_mktsegment
        |FROM events JOIN customer ON user_id = c_custkey
        |WHERE event_type IN ('purchase', 'signup')
        |ORDER BY user_id, event_type""".stripMargin,

    "q_rollup_hierarchy" ->
      """SELECT r_name, n_name,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,2))), 2) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,

    "q_grouping_sets" ->
      """SELECT n_name, o_orderpriority,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,2))), 2) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY GROUPING SETS ((n_name), (o_orderpriority), (n_name, o_orderpriority))
        |ORDER BY n_name NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q_sql_api" ->
      """SELECT c_custkey, c_mktsegment,
        |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,

    // Full SQL replay of the composed ImportJob run: every stage of the
    // reference loop (merge, quarantine, name-resolve vs MERGED parents,
    // dedup, scoped delete, surrogate uids, relation cleanup, assortment
    // rebuild) as CTEs, finished by the same 60-bit digest sums.

    "q_ecom_job" -> EcomJobOracle,

    "q_ecom_job_strict" -> EcomJobOracle,

    // the PartialUpdate arm replays the scoped relation cleanup — one
    // CTE differs (final_relations), everything else shared
    "q_ecom_job_partial" -> SparkEntry.EcomJobOraclePartial,

    "q_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k
        |FROM events
        |ORDER BY event_id""".stripMargin,

    "q_trend_slope" ->
      """WITH monthly AS (
        |  SELECT r_name,
        |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS x,
        |    sum(CAST(o_totalprice AS DECIMAL(30,2))) AS y
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2),
        |m AS (
        |  SELECT r_name, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * y) AS sxy, sum(x * x) AS sxx
        |  FROM monthly GROUP BY r_name)
        |SELECT r_name,
        |  CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
        |    / CAST(n * sxx - sx * sx AS DOUBLE) * 10000 + 0.5) AS BIGINT)
        |    AS slope_bp
        |FROM m ORDER BY r_name""".stripMargin,

    "q_salted_join" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, o_orderpriority
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_salted_agg" ->
      """SELECT l_returnflag,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q_clean_relations" ->
      """SELECT l_orderkey, l_linenumber
        |FROM lineitem
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_totalprice <= 400000 AND o_orderkey = l_orderkey)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_hierarchy_closure" ->
      """WITH RECURSIVE e AS (
        |  SELECT doc_id AS child, doc_id // 2 AS parent FROM documents WHERE doc_id > 0),
        |c AS (
        |  SELECT child, parent AS ancestor, 1 AS depth FROM e
        |  UNION ALL
        |  SELECT c.child, e.parent, c.depth + 1 FROM c JOIN e ON c.ancestor = e.child)
        |SELECT child, ancestor, depth FROM c
        |ORDER BY child, ancestor""".stripMargin,

    "q_sample_weighted" ->
      """WITH d AS (
        |  SELECT doc_id, least(2.0, n_chars / 500.0) AS rate,
        |    (doc_id % 1048573 * 2654435761 % 1000000) / 1000000.0 AS u
        |  FROM documents),
        |e AS (
        |  SELECT doc_id, rate, u, CAST(floor(rate) AS INT) AS fullep,
        |    unnest(range(CAST(floor(rate) AS INT) + 1)) AS epoch
        |  FROM d)
        |SELECT doc_id, CAST(epoch AS BIGINT) AS epoch
        |FROM e
        |WHERE epoch < fullep OR u < rate - fullep
        |ORDER BY doc_id, epoch""".stripMargin,

    "q_pii_redact" ->
      """WITH p AS (SELECT doc_id,
        |  text || ' contact user' || doc_id || '@example.com or 10.0.'
        |       || (doc_id % 256) || '.7 tel 555-123-4567' AS text_pii
        |  FROM documents WHERE doc_id < 200)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(text_pii,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{3}[- ]\d{3,4}[- ]\d{4}\b', '<PHONE>', 'g') AS redacted
        |FROM p ORDER BY doc_id""".stripMargin,

    "q_table_order" ->
      """WITH RECURSIVE edges(child, parent) AS (
        |  SELECT * FROM (VALUES ('nation','region'), ('customer','nation'),
        |    ('supplier','nation'), ('orders','customer'), ('lineitem','orders'),
        |    ('lineitem','part'), ('lineitem','supplier'), ('events','customer'),
        |    ('embeddings','documents')) v(child, parent)
        |), tabs(t) AS (
        |  SELECT * FROM (VALUES ('region'),('nation'),('customer'),('supplier'),
        |    ('part'),('orders'),('lineitem'),('events'),('documents'),('embeddings')) v(t)
        |), depths AS (
        |  SELECT t AS tn, 0 AS lvl FROM tabs WHERE t NOT IN (SELECT child FROM edges)
        |  UNION ALL
        |  SELECT e.child, d.lvl + 1 FROM depths d JOIN edges e ON e.parent = d.tn
        |)
        |SELECT CAST(row_number() OVER (ORDER BY level, table_name) AS BIGINT) AS position,
        |       table_name, level
        |FROM (SELECT tn AS table_name, CAST(max(lvl) AS BIGINT) AS level
        |      FROM depths GROUP BY tn)
        |ORDER BY position""".stripMargin,

    "q_table_checksum" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  CAST(sum(CAST(CAST('0x' || substr(md5(concat_ws('|',
        |    CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR),
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR))),
        |    1, 15) AS BIGINT) AS DECIMAL(38,0)))
        |    % 4611686018427387904 AS BIGINT) AS content_checksum
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q_unpivot" ->
      """WITH src AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
        |  FROM lineitem WHERE l_orderkey <= 2000)
        |SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS amount FROM src
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM src
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM src
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,

    // IgnoreEmptyCategoryFieldValues ON: null-or-empty cells are not
    // written (the engine's dropEmpty filter on the stacked rows)
    "q_unpivot_dropempty" ->
      """WITH src AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CASE WHEN l_linenumber % 2 = 0 THEN '' ELSE l_returnflag END AS flag,
        |    l_linestatus AS status
        |  FROM lineitem WHERE l_orderkey <= 2000),
        |u AS (
        |  SELECT l_orderkey, l_linenumber, 'flag' AS metric, flag AS amount
        |  FROM src
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'status', status FROM src)
        |SELECT l_orderkey, l_linenumber, metric, amount FROM u
        |WHERE amount IS NOT NULL AND amount <> ''
        |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,

    "q_cube" ->
      """SELECT n_name, o_orderpriority,
        |  CAST(GROUPING(n_name) AS INTEGER) AS g_nation,
        |  CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,2))), 2) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY CUBE (n_name, o_orderpriority)
        |ORDER BY g_nation, g_priority, n_name NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q_sequence_gaps" ->
      // the textbook single-window form IS the oracle; the Spark side
      // must reproduce it from bucketed distributed windows
      """WITH k AS (
        |  SELECT DISTINCT l_orderkey AS k FROM lineitem WHERE l_orderkey IS NOT NULL),
        |l AS (SELECT k, lag(k) OVER (ORDER BY k) AS pk FROM k)
        |SELECT CAST(pk + 1 AS BIGINT) AS gap_start, CAST(k - 1 AS BIGINT) AS gap_end,
        |  CAST(k - pk - 1 AS BIGINT) AS gap_len
        |FROM l WHERE pk IS NOT NULL AND k > pk + 1
        |ORDER BY gap_start""".stripMargin,

    "q_sequence_islands" ->
      """WITH k AS (
        |  SELECT DISTINCT l_orderkey AS k FROM lineitem WHERE l_orderkey IS NOT NULL),
        |l AS (SELECT k, lag(k) OVER (ORDER BY k) AS pk FROM k),
        |brk AS (SELECT k, CASE WHEN pk IS NULL OR k > pk + 1 THEN 1 ELSE 0 END AS ni
        |  FROM l),
        |grp AS (SELECT k, sum(ni) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) AS gid
        |  FROM brk)
        |SELECT CAST(min(k) AS BIGINT) AS island_start,
        |  CAST(max(k) AS BIGINT) AS island_end,
        |  CAST(count(*) AS BIGINT) AS n_keys
        |FROM grp GROUP BY gid
        |ORDER BY island_start""".stripMargin,

    "q_golden_record" ->
      // with fixed per-source priorities, survivorship IS a coalesce in
      // priority order — the oracle states it that way; the Spark side
      // runs the generic one-aggregate max_by operator
      """WITH a AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 3 <> 0 THEN 'A:' || o_orderstatus END AS status,
        |    CASE WHEN o_orderkey % 2 <> 0 THEN o_totalprice + 3 END AS price
        |  FROM orders),
        |b AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 4 <> 0 THEN 'B:' || o_orderstatus END AS status,
        |    CASE WHEN o_orderkey % 3 <> 0 THEN o_totalprice + 2 END AS price
        |  FROM orders),
        |c AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 9999991 <> 0 THEN 'C:' || o_orderstatus END AS status,
        |    CASE WHEN o_orderkey % 9999993 <> 0 THEN o_totalprice + 1 END AS price
        |  FROM orders)
        |SELECT a.o_orderkey,
        |  coalesce(a.status, b.status, c.status) AS status,
        |  coalesce(a.price, b.price, c.price) AS price
        |FROM a JOIN b USING (o_orderkey) JOIN c USING (o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q_benford" ->
      // expected shares are PINNED published basis points in both engines
      // (runtime log10 would hang the compare on libm's last ulp)
      """WITH v AS (
        |  SELECT CAST(floor(o_totalprice) AS BIGINT) AS v FROM orders
        |  WHERE floor(o_totalprice) > 0),
        |d AS (SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INTEGER) AS digit FROM v),
        |c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
        |tot AS (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS t FROM c),
        |e(digit, expected_bp) AS (VALUES
        |  (1, 3010), (2, 1761), (3, 1249), (4, 969), (5, 792),
        |  (6, 669), (7, 580), (8, 512), (9, 458))
        |SELECT e.digit, CAST(coalesce(c.n, 0) AS BIGINT) AS n,
        |  CAST(floor(coalesce(c.n, 0) * 10000.0 / greatest(t, 1) + 0.5) AS BIGINT)
        |    AS share_bp,
        |  CAST(e.expected_bp AS BIGINT) AS expected_bp,
        |  CAST(floor(coalesce(c.n, 0) * 10000.0 / greatest(t, 1) + 0.5)
        |    - e.expected_bp AS BIGINT) AS delta_bp
        |FROM e LEFT JOIN c USING (digit) CROSS JOIN tot
        |ORDER BY e.digit""".stripMargin,

    "q_fk_orphan_report" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_suppkey,
        |    CASE WHEN l_orderkey % 97 = 0 THEN l_partkey + 1000000
        |      ELSE l_partkey END AS l_partkey
        |  FROM lineitem),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM li),
        |r AS (
        |  SELECT 'orders' AS fk_name, CAST(count(*) AS BIGINT) AS n_orphans
        |  FROM li WHERE l_orderkey IS NOT NULL
        |    AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = li.l_orderkey)
        |  UNION ALL
        |  SELECT 'part', CAST(count(*) AS BIGINT)
        |  FROM li WHERE l_partkey IS NOT NULL
        |    AND NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = li.l_partkey)
        |  UNION ALL
        |  SELECT 'supplier', CAST(count(*) AS BIGINT)
        |  FROM li WHERE l_suppkey IS NOT NULL
        |    AND NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = li.l_suppkey))
        |SELECT fk_name, n_orphans, n_rows,
        |  CAST(floor(n_orphans * 10000.0 / greatest(n_rows, 1) + 0.5) AS BIGINT)
        |    AS orphan_bp
        |FROM r CROSS JOIN tot
        |ORDER BY fk_name""".stripMargin,

    "q_quantiles_maintained" ->
      // replays bucket assignment, the cum window, and the SAME fixed
      // interpolation parenthesization; integer window sums cast to
      // BIGINT per §6
      """WITH v AS (
        |  SELECT l_extendedprice AS x FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL),
        |bk AS (
        |  SELECT CASE WHEN x < 20000.0 THEN 0 WHEN x < 40000.0 THEN 1
        |    WHEN x < 60000.0 THEN 2 WHEN x < 80000.0 THEN 3 ELSE 4 END
        |    AS bucket
        |  FROM v),
        |c AS (SELECT bucket, count(*) AS n FROM bk GROUP BY bucket),
        |cm AS (
        |  SELECT bucket, n,
        |    CAST(sum(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cum
        |  FROM c),
        |cm2 AS (
        |  SELECT bucket, n, cum, cum - n AS cum_before FROM cm),
        |tot AS (SELECT max(cum) AS total FROM cm2),
        |qs AS (SELECT unnest([2500, 5000, 7500, 9000, 9900]) AS q_bp),
        |j AS (
        |  SELECT q.q_bp, c2.bucket,
        |    CASE WHEN c2.bucket = 0 THEN 20000.0
        |      WHEN c2.bucket = 1 THEN 20000.0
        |      WHEN c2.bucket = 2 THEN 40000.0
        |      WHEN c2.bucket = 3 THEN 60000.0
        |      ELSE 80000.0 END AS lo,
        |    CASE WHEN c2.bucket = 0 THEN 20000.0
        |      WHEN c2.bucket = 1 THEN 40000.0
        |      WHEN c2.bucket = 2 THEN 60000.0
        |      WHEN c2.bucket = 3 THEN 80000.0
        |      ELSE 80000.0 END AS hi,
        |    c2.n, c2.cum, c2.cum_before, t.total
        |  FROM qs q CROSS JOIN cm2 c2 CROSS JOIN tot t
        |  WHERE c2.n > 0 AND c2.cum_before < q.q_bp * t.total / 10000.0
        |    AND q.q_bp * t.total / 10000.0 <= c2.cum)
        |SELECT q_bp, CAST(bucket AS BIGINT) AS bucket,
        |  lo + (hi - lo) * (q_bp * total / 10000.0 - cum_before) / n AS est
        |FROM j ORDER BY q_bp""".stripMargin,

    "q_k_anonymity" ->
      """WITH c AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS balance_band
        |  FROM customer)
        |SELECT c_nationkey, c_mktsegment, balance_band,
        |  CAST(count(*) AS BIGINT) AS class_size
        |FROM c GROUP BY 1, 2, 3
        |HAVING count(*) < 5
        |ORDER BY c_nationkey, c_mktsegment, balance_band""".stripMargin,

    "q_k_anonymity_stats" ->
      """WITH cls AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bb, count(*) AS n
        |  FROM customer GROUP BY 1, 2, 3)
        |SELECT CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_violating_classes,
        |  CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
        |    AS rows_at_risk,
        |  CAST(floor(sum(CASE WHEN n < 5 THEN n ELSE 0 END) * 10000.0
        |    / greatest(sum(n), 1) + 0.5) AS BIGINT) AS risk_bp
        |FROM cls""".stripMargin,

    "q_join_explosion" ->
      """WITH n AS (
        |  SELECT count(*) AS total FROM events WHERE event_type IS NOT NULL),
        |heavy AS (
        |  SELECT event_type, count(*) AS cnt
        |  FROM events, n WHERE event_type IS NOT NULL
        |  GROUP BY event_type, n.total
        |  HAVING count(*) >= ceil(0.1 * n.total)),
        |prod AS (
        |  SELECT CAST(coalesce(sum(a.cnt * b.cnt), 0) AS BIGINT)
        |      AS heavy_product_rows,
        |    CAST(count(*) AS BIGINT) AS shared_heavy_keys
        |  FROM heavy a JOIN heavy b USING (event_type))
        |SELECT p.heavy_product_rows, p.shared_heavy_keys,
        |  CAST(c.cnt AS BIGINT) AS rows_a, CAST(c.cnt AS BIGINT) AS rows_b
        |FROM prod p CROSS JOIN (SELECT count(*) AS cnt FROM events) c""".stripMargin,

    "q_subtree_rollup" ->
      // recursive-CTE closure + member expansion is the transparent
      // rollup form; cents keep the sums integer-exact
      """WITH RECURSIVE nodes AS (
        |  SELECT CAST(r_regionkey AS BIGINT) AS node, CAST(0 AS BIGINT) AS v
        |  FROM region
        |  UNION ALL
        |  SELECT CAST(100 + n_nationkey AS BIGINT), 0 FROM nation
        |  UNION ALL
        |  SELECT 1000000 + c_custkey,
        |    CAST(round(c_acctbal * 100) AS BIGINT) FROM customer),
        |edges AS (
        |  SELECT CAST(100 + n_nationkey AS BIGINT) AS child,
        |    CAST(n_regionkey AS BIGINT) AS parent FROM nation
        |  UNION ALL
        |  SELECT 1000000 + c_custkey, CAST(100 + c_nationkey AS BIGINT)
        |  FROM customer),
        |cl AS (
        |  SELECT child, parent AS anc FROM edges
        |  UNION
        |  SELECT c.child, e.parent FROM cl c JOIN edges e ON c.anc = e.child),
        |member AS (
        |  SELECT anc AS node, child AS member FROM cl
        |  UNION ALL SELECT node, node FROM nodes)
        |SELECT m.node, CAST(sum(n.v) AS BIGINT) AS subtree_cents
        |FROM member m JOIN nodes n ON n.node = m.member
        |GROUP BY m.node ORDER BY m.node""".stripMargin,

    "q_entity_resolution" ->
      // half-prefix blocking is EXACT for equal-length distance ≤ 1
      // (one substitution leaves one half identical); the closure is
      // the transparent recursive-CTE transitive reach; survivorship
      // replays max_by's (non-null, src_rank, id) order per attribute
      """WITH RECURSIVE base AS (
        |  SELECT c_custkey AS ent_id, md5(CAST(c_custkey AS VARCHAR)) AS name,
        |    c_mktsegment AS segment, c_acctbal AS acctbal, 1 AS src_rank
        |  FROM customer),
        |var AS (
        |  SELECT c_custkey + 1000000 AS ent_id,
        |    substring(md5(CAST(c_custkey AS VARCHAR)), 1, 31) || 'z' AS name,
        |    CAST(NULL AS VARCHAR) AS segment, c_acctbal + 1 AS acctbal,
        |    2 AS src_rank
        |  FROM customer WHERE c_custkey % 50 = 0),
        |e AS (SELECT * FROM base UNION ALL SELECT * FROM var),
        |cand AS (
        |  SELECT a.ent_id AS id_a, b.ent_id AS id_b, a.name AS na, b.name AS nb
        |  FROM e a JOIN e b
        |    ON a.ent_id < b.ent_id
        |   AND (substring(a.name, 1, 16) = substring(b.name, 1, 16)
        |     OR substring(a.name, 17, 16) = substring(b.name, 17, 16))),
        |pairs AS (
        |  SELECT id_a, id_b FROM cand WHERE levenshtein(na, nb) <= 1),
        |und AS (SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION SELECT id_b, id_a FROM pairs),
        |reach AS (
        |  SELECT a, b FROM und
        |  UNION
        |  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
        |  WHERE u.b <> r.a),
        |canon AS (
        |  SELECT e.ent_id,
        |    least(e.ent_id, coalesce(min(r.b), e.ent_id)) AS canonical_id
        |  FROM e LEFT JOIN reach r ON r.a = e.ent_id
        |  GROUP BY e.ent_id),
        |t AS (
        |  SELECT c.canonical_id, e.* FROM e JOIN canon c USING (ent_id)),
        |sv AS (
        |  SELECT canonical_id,
        |    first_value(name) OVER (PARTITION BY canonical_id
        |      ORDER BY (name IS NOT NULL) DESC, src_rank DESC, ent_id DESC)
        |      AS name,
        |    first_value(segment) OVER (PARTITION BY canonical_id
        |      ORDER BY (segment IS NOT NULL) DESC, src_rank DESC, ent_id DESC)
        |      AS segment,
        |    first_value(acctbal) OVER (PARTITION BY canonical_id
        |      ORDER BY (acctbal IS NOT NULL) DESC, src_rank DESC, ent_id DESC)
        |      AS acctbal
        |  FROM t),
        |g AS (SELECT DISTINCT canonical_id, name, segment, acctbal FROM sv),
        |sz AS (SELECT canonical_id, CAST(count(*) AS BIGINT) AS n_members
        |  FROM t GROUP BY 1)
        |SELECT g.canonical_id, g.name, g.segment, g.acctbal, sz.n_members
        |FROM g JOIN sz USING (canonical_id)
        |ORDER BY canonical_id""".stripMargin,

    "q_pit_join" ->
      // interval-containment LEFT JOIN is the transparent oracle form;
      // the Spark side must reproduce it from one backward as-of join
      """WITH dim AS (
        |  SELECT c_custkey, TIMESTAMP '1995-01-01' AS vf,
        |    TIMESTAMP '1997-01-01' AS vt, c_mktsegment AS segment
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey, TIMESTAMP '1997-01-01', TIMESTAMP '2000-01-01',
        |    c_mktsegment || '_V2' FROM customer
        |  UNION ALL
        |  SELECT c_custkey, TIMESTAMP '2000-01-01', NULL,
        |    c_mktsegment || '_V3' FROM customer WHERE c_custkey % 10 <> 0)
        |SELECT o.o_orderkey, strftime(o.o_orderdate, '%Y-%m-%d') AS od,
        |  d.segment AS dim_segment
        |FROM orders o LEFT JOIN dim d
        |  ON o.o_custkey = d.c_custkey AND d.vf <= o.o_orderdate
        |  AND (d.vt IS NULL OR d.vt > o.o_orderdate)
        |ORDER BY o_orderkey""".stripMargin,

    "q_drift_timeline" ->
      // identical po/pn subexpressions and term parenthesization as the
      // Spark side; per-bucket terms floored THEN summed (exact BIGINT)
      """WITH b AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS period,
        |    CASE WHEN value < 50 THEN 0 WHEN value < 100 THEN 1
        |         WHEN value < 200 THEN 2 WHEN value < 350 THEN 3
        |         ELSE 4 END AS bucket
        |  FROM events WHERE value IS NOT NULL),
        |c AS (SELECT period, bucket, count(*) AS n FROM b GROUP BY 1, 2),
        |j AS (
        |  SELECT coalesce(n2.period, o2.period) AS period,
        |    coalesce(n2.bucket, o2.bucket) AS bucket,
        |    coalesce(o2.n, 0) AS n_old, coalesce(n2.n, 0) AS n_new
        |  FROM c n2 FULL OUTER JOIN
        |    (SELECT period + 1 AS period, bucket, n FROM c) o2
        |    ON n2.period = o2.period AND n2.bucket = o2.bucket),
        |t AS (SELECT period, sum(n_old) AS to_, sum(n_new) AS tn FROM j
        |      GROUP BY period HAVING sum(n_old) > 0 AND sum(n_new) > 0)
        |SELECT j.period, CAST(t.to_ AS BIGINT) AS n_old,
        |  CAST(t.tn AS BIGINT) AS n_new,
        |  CAST(sum(CAST(floor(
        |    ((j.n_new + 0.5) / (t.tn + 2.5) - (j.n_old + 0.5) / (t.to_ + 2.5))
        |    * ln(((j.n_new + 0.5) / (t.tn + 2.5)) / ((j.n_old + 0.5) / (t.to_ + 2.5)))
        |    * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS psi_ppm
        |FROM j JOIN t ON j.period = t.period
        |GROUP BY j.period, t.to_, t.tn
        |ORDER BY j.period""".stripMargin,

    "q_sorted_neighborhood" ->
      // DuckDB's native jaro_winkler_similarity (cross-checks the
      // codegen Expression, as in q_name_match); the window join is
      // expressed directly as the rank-difference predicate
      """WITH r AS (SELECT p_partkey, p_name,
        |             row_number() OVER (ORDER BY p_name, p_partkey) AS rk
        |           FROM part),
        |pairs AS (SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
        |    CAST(floor(jaro_winkler_similarity(a.p_name, b.p_name) * 10000 + 0.5)
        |      AS BIGINT) AS sim_bp
        |  FROM r a JOIN r b ON b.rk - a.rk BETWEEN 1 AND 3)
        |SELECT a_key, b_key, sim_bp FROM pairs
        |WHERE sim_bp >= 8800 ORDER BY a_key, b_key""".stripMargin,

    // Fellegi-Sunter EM replayed end to end: five unrolled iterations
    // (weight CTE + 1-row parameter CTE each), exact-integer E-step
    // quantization, Laplace-smoothed integer-space M-steps, quantized
    // per-field log-ratio scoring
    "q_record_linkage" -> recordLinkageOracle,
  )

  /** q_record_linkage's oracle generator: the controlled dirty feed
    * (copies/decoys), then EM unrolled — iteration i reads the
    * agreement table cross-joined with parameter row p(i-1), quantizes
    * the posterior weight to floor(2^30 w) BIGINT, and p(i) aggregates
    * the exact integer sums into smoothed double parameters; scoring
    * quantizes each field's log-likelihood ratio once and sums exact
    * integers. Every double op is a pinned chain mirrored by
    * [[graft.pipelines.FellegiSunter]] (product association included:
    * lam * (c1*c2*c3*c4), never ((lam*c1)*c2)...).
    */
  private def recordLinkageOracle: String = {
    val K = 4
    val iters = 5
    def like(p: String, arr: String): String =
      (1 to K).map(k =>
        s"(CASE WHEN a$k = 1 THEN $p.$arr$k ELSE 1e0 - $p.$arr$k END)")
        .mkString(" * ")
    def wCte(i: Int): String = {
      val prev = if (i == 1) "p0" else s"p${i - 1}"
      s"""w$i AS (
        |  SELECT g.id_a, g.id_b, ${(1 to K).map(k => s"g.a$k").mkString(", ")},
        |    CAST(floor($prev.lam * (${like(prev, "m")})
        |      / ($prev.lam * (${like(prev, "m")})
        |         + (1e0 - $prev.lam) * (${like(prev, "u")}))
        |      * 1073741824e0) AS BIGINT) AS wq
        |  FROM ag g CROSS JOIN $prev)"""
    }
    def pCte(i: Int): String = {
      val ms = (1 to K).map(k =>
        s"""    CAST(sum(wq * a$k) + 1073741824 AS DOUBLE)
          |      / CAST(sum(wq) + 2147483648 AS DOUBLE) AS m$k""").mkString(",\n")
      val us = (1 to K).map(k =>
        s"""    CAST(sum((1073741824 - wq) * a$k) + 1073741824 AS DOUBLE)
          |      / CAST(count(*) * 1073741824 - sum(wq) + 2147483648 AS DOUBLE) AS u$k""")
        .mkString(",\n")
      s"""p$i AS (
        |  SELECT
        |    CAST(sum(wq) + 1073741824 AS DOUBLE)
        |      / CAST((count(*) + 2) * 1073741824 AS DOUBLE) AS lam,
        |$ms,
        |$us
        |  FROM w$i)"""
    }
    val emCtes = (1 to iters).map(i => wCte(i) + ",\n" + pCte(i)).mkString(",\n")
    val wts = (1 to K).map(k =>
      s"""    CAST(floor(1e4 * ln(m$k / u$k) + 5e-1) AS BIGINT) AS wm$k,
        |    CAST(floor(1e4 * ln((1e0 - m$k) / (1e0 - u$k)) + 5e-1) AS BIGINT) AS wn$k""")
      .mkString(",\n")
    val scoreSum = (1 to K).map(k =>
      s"(CASE WHEN g.a$k = 1 THEN w.wm$k ELSE w.wn$k END)").mkString(" + ")
    s"""WITH cust AS (
      |  SELECT c_custkey AS id, c_name AS nm, c_acctbal AS bal,
      |         c_mktsegment AS seg, c_nationkey AS nat
      |  FROM customer),
      |copies AS (
      |  SELECT id + 1000000000 AS cid,
      |         CASE WHEN id % 5 = 0 THEN 'UNKNOWN' ELSE nm END AS nm,
      |         CASE WHEN id % 2 = 0 THEN bal + 1e2 ELSE bal END AS bal,
      |         seg, nat
      |  FROM cust WHERE id % 3 = 0),
      |ents AS (SELECT id, nm, bal, seg, nat FROM cust
      |         UNION ALL SELECT cid, nm, bal, seg, nat FROM copies),
      |mp AS (SELECT id AS id_a, id + 1000000000 AS id_b FROM cust WHERE id % 3 = 0),
      |dc AS (SELECT a.id AS id_a, b.id AS id_b
      |       FROM cust a JOIN cust b ON b.id = a.id + 1),
      |prs AS (SELECT * FROM mp UNION ALL SELECT * FROM dc),
      |ag AS (SELECT p.id_a, p.id_b,
      |  CASE WHEN a.nm = b.nm THEN 1 ELSE 0 END AS a1,
      |  CASE WHEN a.bal = b.bal THEN 1 ELSE 0 END AS a2,
      |  CASE WHEN a.nat = b.nat THEN 1 ELSE 0 END AS a3,
      |  CASE WHEN a.seg = b.seg THEN 1 ELSE 0 END AS a4
      |  FROM prs p JOIN ents a ON a.id = p.id_a JOIN ents b ON b.id = p.id_b),
      |p0 AS (SELECT 5e-1 AS lam, ${(1 to K).map(k => s"9e-1 AS m$k").mkString(", ")},
      |       ${(1 to K).map(k => s"1e-1 AS u$k").mkString(", ")}),
      |$emCtes,
      |wts AS (
      |  SELECT
      |$wts
      |  FROM p$iters)
      |SELECT g.id_a, g.id_b,
      |  $scoreSum AS fs_score,
      |  ($scoreSum) > 0 AS is_match
      |FROM ag g CROSS JOIN wts w
      |ORDER BY g.id_a, g.id_b""".stripMargin
  }
}
