package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.operators._
import graft.functions.{Fingerprint, GramHash, TextFunctions, VectorFunctions}
import graft.plans.{ImportJob, Quarantine, TableOrder}
import graft.dedup.{Clusters, NearDup}
import graft.similarity.{Knn, Pq}
import graft.multimodal.Multimodal
import graft.streaming.EventPipeline

/** Driver contract — one entry per operator in SURVEY.md §2.
  *
  * Conventions shared with the DuckDB oracles (SURVEY.md §6): every
  * computed column aliased identically on both sides; every query ends in
  * a total ORDER BY; floating-point aggregates go through
  * `sum(cast(x as decimal))` then back to double so both engines sum
  * exactly; rounding applied identically.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Exact cross-engine double sum: decimal-sum then back to double. */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(30,$scale)")).cast("double")

  /** Decimal sum rounded IN DECIMAL (exact HALF_UP), then to double.
    * round(double, n) is a cross-engine hazard whenever the true value
    * lands on a decimal half boundary (common for money sums with few
    * decimals): Spark rounds the shortest decimal string, DuckDB the
    * binary value. Rounding while still decimal is exact in both.
    */
  private def dsumRound(c: Column, sumScale: Int, outScale: Int): Column =
    round(sum(c.cast(s"decimal(30,$sumScale)")), outScale).cast("double")

  /** Deterministic 4-dp ratio: floor(x*10^4 + 0.5)/10^4 over exact
    * integer-valued doubles — no string-representation dependence.
    */
  private def ratio4(num: Column, den: Column): Column =
    (floor(num.cast("double") * 10000.0 / den.cast("double") + 0.5) / 10000.0)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  // Shared fragment: the staged "incoming" batch merged into orders by the
  // q_merge_* family (updates for keys %5, brand-new keys from %7 shifted
  // by 10M — mirrors MoveDataToMainTable's matched/unmatched split).
  private def incomingOrders(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    // +/- exact-double constants: no rounding, so both engines produce
    // bit-identical incoming prices (round(x*k, 2) has cross-engine
    // half-case hazards).
    val upd = o.filter(col("o_orderkey") % 5 === 0).select(
      col("o_orderkey"),
      lit("U").as("o_orderstatus"),
      (col("o_totalprice") + 1000.0).as("o_totalprice"))
    val ins = o.filter(col("o_orderkey") % 7 === 0).select(
      (col("o_orderkey") + 10000000L).as("o_orderkey"),
      lit("N").as("o_orderstatus"),
      (col("o_totalprice") - 500.0).as("o_totalprice"))
    upd.unionByName(ins)
  }

  private def destOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")

  /** The composed RunJob loop (see the q_ecom_job registration) with an
    * optional strict-FK arm: `strictFk` puts an [[ImportJob.FkGate]]
    * (FkFail) on the products table's freshly-resolved group_id — the
    * reference's FailOnMissingGroups check (EcomDestinationWriter.cs:4566,
    * fired from RunJob when CreateMissingGroups is off,
    * EcomProvider.cs:1004). Every group reference in this feed resolves
    * against the merged groups table, so the gated run must be
    * byte-identical to the ungated one — both registered queries
    * hash-check against the SAME DuckDB oracle; the failing arm (a
    * dangling name aborts with the violating rows) is pinned by
    * ImportJobSpec.
    */
  private def ecomJobChecksums(s: SparkSession, dir: String,
                               strictFk: Boolean): DataFrame = {
      // The reference's WHOLE RunJob loop as ONE composed, hash-checked
      // query (EcomProvider.cs:934 RunJob → :819 OrderTablesInJob →
      // EcomDestinationWriter.cs:3165 MoveDataToMainTables): an
      // ecom-shaped 4-table feed staged from the star schema and run
      // through ImportJob in dependency order — groups upsert first; then
      // products with a constant-injected language scope, SkipFailingRows
      // quarantine (EcomProvider.cs:247), FK-BY-NAME resolution against
      // the freshly MERGED groups (renamed and brand-new group names
      // resolve only if the parent table merged first — the
      // dependency-order proof), in-batch dedup keep-first, SCOPED
      // delete-excess (the fr language survives an en feed,
      // EcomDestinationWriter.cs:3067/3091), and surrogate uids for
      // inserted rows continuing from the destination max (GetLastId,
      // EcomDestinationWriter.cs:657); then relations with orphan cleanup
      // against the SYNCED product table (:4218) plus full-sync delete;
      // then the assortment rebuild (AssortmentHandler.cs:116). Result:
      // per-table order-independent content checksums (incl. the
      // quarantine side channel) — the DuckDB oracle replays the entire
      // job in SQL and must land on the same five digests.
      val nation = t(s, dir, "nation"); val region = t(s, dir, "region")
      val part = t(s, dir, "part"); val lineitem = t(s, dir, "lineitem")
      val customer = t(s, dir, "customer"); val orders = t(s, dir, "orders")
      val priceD = col("p_retailprice").cast("decimal(18,2)")

      val destGroups = nation
        .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").cast("int").as("group_id"),
          col("n_name").as("group_name"), col("r_name").as("region"))
      val destProducts = part.select(
        col("p_partkey").as("product_id"), col("p_name").as("product_name"),
        (col("p_partkey") % 25).cast("int").as("group_id"),
        priceD.as("price"), lit("en").as("lang"),
        (col("p_partkey") * 10).as("uid"))
        .unionByName(part.filter(col("p_partkey") % 5 === 0).select(
          col("p_partkey").as("product_id"), col("p_name").as("product_name"),
          (col("p_partkey") % 25).cast("int").as("group_id"),
          priceD.as("price"), lit("fr").as("lang"),
          (col("p_partkey") * 10 + 1).as("uid")))
      def relsOf(line: Int) = lineitem.filter(col("l_linenumber") === line)
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("bigint").as("qty"))
        .select(col("l_partkey").as("product_id"),
          col("l_suppkey").as("related_id"), col("qty"))
      val destRelations = relsOf(1)
      val users = customer.filter(col("c_acctbal") > 9500)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("seg"))
      val sold = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      val existingPairs = users.join(sold, col("o_custkey") === col("user_id"))
        .select(col("user_id"), col("l_partkey").as("part_key")).distinct()
      val destAssort = existingPairs.withColumn("is_active", lit(1))

      val inGroups = destGroups.filter(col("group_id") < 10)
        .select(col("group_id"),
          concat(col("group_name"), lit("*")).as("group_name"), col("region"))
        .unionByName(region.select(
          (col("r_regionkey") + 100).cast("int").as("group_id"),
          concat(lit("NEW-"), col("r_name")).as("group_name"),
          col("r_name").as("region")))
      // the product batch references groups BY their POST-merge names
      val pNames = part
        .join(broadcast(nation), (col("p_partkey") % 25) === col("n_nationkey"))
        .join(broadcast(region), (col("p_partkey") % 5) === col("r_regionkey"))
      val gref = when(col("p_partkey") % 7 === 0, concat(lit("NEW-"), col("r_name")))
        .when(col("p_partkey") % 25 < 10, concat(col("n_name"), lit("*")))
        .otherwise(col("n_name"))
      def batchArm(mod: Int, shift: Long, prefix: String, bump: String) =
        pNames.filter(col("p_partkey") % mod === 0).select(
          (col("p_partkey") + shift).as("product_id"),
          concat(lit(prefix), col("p_name")).as("product_name"),
          gref.as("group_name_ref"),
          (priceD + lit(new java.math.BigDecimal(bump)))
            .cast("decimal(18,2)").as("price"))
      val inProducts = batchArm(3, 0L, "", "1.00")
        .unionByName(batchArm(13, 1000000L, "NP ", "2.00"))
        .unionByName(batchArm(33, 0L, "", "5.00")) // in-batch dups of the %3 arm
      val inAssort = Assortments.rebuildWithFlag(existingPairs, users,
        sold.filter(col("l_quantity") === 50)
          .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("seg"), col("l_partkey").as("part_key")),
        "seg", Seq("user_id", "part_key"), "__active")
        .select(col("user_id"), col("part_key"),
          col("__active").cast("int").as("is_active"))

      // GetLastId: the surrogate sequence continues from the destination
      // max — a bounded 1-row aggregate, like the reference's max-id read
      val maxUid = destProducts.agg(max(col("uid"))).collect()(0).getLong(0)
      val specs = Seq(
        ImportJob.TableSpec("groups", keys = Seq("group_id")),
        ImportJob.TableSpec("products", keys = Seq("product_id", "lang"),
          dedupKeys = Seq("product_id"), dedupOrder = Seq("price"),
          deleteExcess = true, deleteExcessScope = Seq("lang"),
          constants = Map("lang" -> "en"),
          fkGate = if (strictFk) Some(ImportJob.FkGate(Seq("group_id")))
                   else None,
          rowRules = Seq("name_ok" -> !col("product_name").contains("cold")),
          preResolve = (df, lookup) => Denormalize.resolve(df, lookup("groups"),
            Seq("group_name_ref" -> "group_name"), Seq("group_id" -> "group_id"))
            .drop("group_name_ref"),
          post = out => {
            val fresh = SurrogateKeys.assign(
              out.filter(col("uid").isNull).drop("uid"),
              Seq(col("product_id"), col("lang")), "uid", startAt = maxUid + 1)
            out.filter(col("uid").isNotNull)
              .unionByName(fresh.select(out.columns.map(col): _*))
          }),
        ImportJob.TableSpec("relations", keys = Seq("product_id", "related_id"),
          deleteExcess = true,
          preResolve = (df, lookup) => df.join(
            lookup("products").filter(col("lang") === "en")
              .select(col("product_id")).distinct(),
            Seq("product_id"), "left_semi")),
        ImportJob.TableSpec("assortments", keys = Seq("user_id", "part_key")))

      val outT = ImportJob.run(specs,
        dest = Map("groups" -> destGroups, "products" -> destProducts,
          "relations" -> destRelations, "assortments" -> destAssort),
        incoming = Map("groups" -> inGroups, "products" -> inProducts,
          "relations" -> relsOf(2), "assortments" -> inAssort),
        deps = Map("products" -> Set("groups"), "relations" -> Set("products"),
          "assortments" -> Set("products")))

      def ck(nm: String, df: DataFrame, cols: Seq[String]) =
        Profile.groupChecksum(df.withColumn("table_name", lit(nm)),
          Seq("table_name"), cols)
      ck("groups", outT("groups"), Seq("group_id", "group_name", "region"))
        .unionByName(ck("products", outT("products"),
          Seq("product_id", "product_name", "group_id", "price", "lang", "uid")))
        .unionByName(ck("products_quarantined", outT("products__quarantined"),
          Seq("product_id", "product_name", "group_name_ref", "price", "lang",
            "quarantine_reason")))
        .unionByName(ck("relations", outT("relations"),
          Seq("product_id", "related_id", "qty")))
        .unionByName(ck("assortments", outT("assortments"),
          Seq("user_id", "part_key", "is_active")))
        .orderBy(col("table_name"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── §2A Relational ETL core ────────────────────────────────────────

    "q_filtered_read" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate").between(lit("1996-01-01").cast("timestamp"),
          lit("1996-12-31").cast("timestamp")) && col("l_quantity") < 25)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "q_conditional_mapping" -> ((s, dir) => {
      t(s, dir, "orders")
        .filter(col("o_orderstatus") =!= "F" &&
          col("o_totalprice") >= 200000 &&
          col("o_orderpriority").contains("URGENT") &&
          col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderpriority"))
        .orderBy(col("o_orderkey"))
    }),

    "q_denorm_join" -> ((s, dir) => {
      val sup = t(s, dir, "supplier")
      val withNation = Denormalize.resolve(sup, t(s, dir, "nation"),
        Seq("s_nationkey" -> "n_nationkey"),
        Seq("n_name" -> "nation_name", "n_regionkey" -> "__rk"))
      Denormalize.resolve(withNation, t(s, dir, "region"),
        Seq("__rk" -> "r_regionkey"), Seq("r_name" -> "region_name"))
        .select(col("s_suppkey"), col("s_name"), col("nation_name"), col("region_name"))
        .orderBy(col("s_suppkey"))
    }),

    "q_string_agg" -> ((s, dir) => {
      val cust = Denormalize.resolve(t(s, dir, "customer"), t(s, dir, "nation"),
        Seq("c_nationkey" -> "n_nationkey"), Seq("n_name" -> "n_name"))
      ListColumns.pack(cust, Seq("n_name"), col("c_name"), "customer_list")
        .join(cust.groupBy("n_name").agg(count(lit(1)).as("n_customers")), Seq("n_name"))
        .orderBy(col("n_name"))
    }),

    "q_pivot" -> ((s, dir) => {
      PivotOps.toWide(
        t(s, dir, "events"), Seq("user_id"), "event_type",
        round(sum(col("value").cast("decimal(30,6)")), 2).cast("double"),
        Seq("click", "error", "purchase", "signup", "view"))
        .select(col("user_id"),
          col("click").as("v_click"), col("error").as("v_error"),
          col("purchase").as("v_purchase"), col("signup").as("v_signup"),
          col("view").as("v_view"))
        .orderBy(col("user_id"))
    }),

    "q_pivot_dynamic" -> ((s, dir) => {
      // column set DISCOVERED from the rows (GetProductCategoryFields →
      // PIVOT, EcomSourceReader.cs:56-81,267-279), not declared — the
      // DuckDB oracle discovers its columns with a dynamic PIVOT too
      PivotOps.toWideDynamic(
        t(s, dir, "events"), Seq("user_id"), "event_type",
        round(sum(col("value").cast("decimal(30,6)")), 2).cast("double"),
        maxColumns = 100)
        .orderBy(col("user_id"))
    }),

    "q_table_checksum" -> ((s, dir) => {
      // sync validation: row counts match ⇏ content matches. Per-group
      // order-independent 60-bit digest sums — source and destination
      // compare content without a sort or a second data movement.
      // The double price goes through decimal(18,2) because double→string
      // FORMATTING is engine-divergent (the digest contract).
      Profile.groupChecksum(
        t(s, dir, "lineitem").select(col("l_returnflag"), col("l_orderkey"),
          col("l_linenumber"),
          col("l_extendedprice").cast("decimal(18,2)").as("price_d")),
        Seq("l_returnflag"), Seq("l_orderkey", "l_linenumber", "price_d"))
        .orderBy(col("l_returnflag"))
    }),

    "q_unpivot" -> ((s, dir) => {
      // wide → key/value rows (stack): the destination-side inverse of
      // q_pivot, the reference writing pivoted category columns back as
      // field-value rows (EcomDestinationWriter.cs:2376
      // WriteCategoyFieldValues). Narrow transform, no shuffle — the
      // total ORDER BY here is oracle-compare convention only.
      PivotOps.toLong(
        t(s, dir, "lineitem").filter(col("l_orderkey") <= 2000)
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"),
        Seq("l_orderkey", "l_linenumber"),
        Seq("l_quantity", "l_discount", "l_tax"), "metric", "amount")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"))
    }),

    "q_range_join" -> ((s, dir) => {
      // interval containment as an EQUI-join on bucket ids (hash join +
      // in-bucket verify) instead of the nested-loop BETWEEN Spark
      // would plan; 'promo' overlaps 'mid'/'high' so rows can multi-match
      import s.implicits._
      val bands = Seq(
        (0L, 99999L, "low"), (100000L, 299999L, "mid"),
        (300000L, 999999L, "high"), (250000L, 350000L, "promo"))
        .toDF("lo", "hi", "tier")
      val orders = t(s, dir, "orders").select(col("o_orderkey"),
        floor(col("o_totalprice")).cast("long").as("price_l"))
      RangeJoin.byBucket(orders, bands, "price_l", "lo", "hi", bucketWidth = 50000L)
        .select(col("o_orderkey"), col("price_l"), col("tier"))
        .orderBy(col("o_orderkey"), col("tier"))
    }),

    "q_asof_join" -> ((s, dir) => {
      // point-in-time lookup: each event sees the user's latest purchase
      // value at-or-before its timestamp (DuckDB verifies with a native
      // ASOF LEFT JOIN; Spark side is the one-shuffle union-sort carry)
      val ev = t(s, dir, "events")
      val r = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("pval"))
      val l = ev.select(col("event_id"), col("user_id"), col("ts"), col("value"))
      AsOf.joinAsOf(l, r, Seq("user_id"), "ts", Seq("pval"))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
          round(col("asof_pval").cast("decimal(30,6)"), 2).cast("double")
            .as("last_purchase"))
        .orderBy(col("event_id"))
    }),

    "q_correlated_lookup" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
      t(s, dir, "orders")
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("o_custkey"), col("o_orderkey").as("top_orderkey"),
          col("o_totalprice").as("top_totalprice"))
        .orderBy(col("o_custkey"))
    }),

    "q_explode_relations" -> ((s, dir) => {
      t(s, dir, "documents")
        .filter(col("doc_id") < 200)
        .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("token"))
        .orderBy(col("doc_id"), col("token"))
    }),

    "q_merge_upsert" -> ((s, dir) => {
      Merge.upsert(destOrders(s, dir), incomingOrders(s, dir), Seq("o_orderkey"))
        .orderBy(col("o_orderkey"))
    }),

    "q_update_existing" -> ((s, dir) => {
      Merge.updateExisting(destOrders(s, dir), incomingOrders(s, dir), Seq("o_orderkey"))
        .orderBy(col("o_orderkey"))
    }),

    "q_scd2" -> ((s, dir) => {
      // history-preserving merge: changed keys close their open row and
      // append a new one; unchanged and absent keys pass through
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val dest = o.withColumn("valid_from", lit("2020-01-01"))
        .withColumn("valid_to", lit(null).cast("string"))
        .withColumn("is_current", lit(true))
      val changedIn = o.filter(col("o_orderkey") % 5 === 0)
        .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
          (col("o_totalprice") + 1000.0).as("o_totalprice"))
      val sameIn = o.filter(col("o_orderkey") % 5 =!= 0 && col("o_orderkey") % 3 === 0)
      val newIn = o.filter(col("o_orderkey") % 7 === 0)
        .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
          lit("N").as("o_orderstatus"), (col("o_totalprice") - 500.0).as("o_totalprice"))
      Scd.applyType2(dest, changedIn.unionByName(sameIn).unionByName(newIn),
        Seq("o_orderkey"), Seq("o_orderstatus", "o_totalprice"), "2024-06-01")
        .orderBy(col("o_orderkey"), col("valid_from"))
    }),

    "q_scd2_snapshot" -> ((s, dir) => {
      // time travel over the Type 2 history: the as-of read at an
      // instant BEFORE the merge reconstructs the pre-merge table
      // exactly — the oracle is literally SELECT .. FROM orders.
      // Filter-only over the history (no join, no shuffle).
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val dest = o.withColumn("valid_from", lit("2020-01-01"))
        .withColumn("valid_to", lit(null).cast("string"))
        .withColumn("is_current", lit(true))
      val changedIn = o.filter(col("o_orderkey") % 5 === 0)
        .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
          (col("o_totalprice") + 1000.0).as("o_totalprice"))
      val sameIn = o.filter(col("o_orderkey") % 5 =!= 0 && col("o_orderkey") % 3 === 0)
      val newIn = o.filter(col("o_orderkey") % 7 === 0)
        .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
          lit("N").as("o_orderstatus"), (col("o_totalprice") - 500.0).as("o_totalprice"))
      val merged = Scd.applyType2(dest,
        changedIn.unionByName(sameIn).unionByName(newIn),
        Seq("o_orderkey"), Seq("o_orderstatus", "o_totalprice"), "2024-06-01")
      Scd.snapshotAsOf(merged, "2022-06-01").orderBy(col("o_orderkey"))
    }),

    "q_scd2_feed" -> ((s, dir) => {
      // SCD2 materialized from a multi-version change feed: each change
      // opens its own interval, the open dest row closes at the key's
      // first change, a trailing delete leaves no current row
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val dest = o.withColumn("valid_from", lit("2020-01-01"))
        .withColumn("valid_to", lit(null).cast("string"))
        .withColumn("is_current", lit(true))
      val c1 = o.filter(col("o_orderkey") % 5 === 0).select(col("o_orderkey"),
        lit("U1").as("o_orderstatus"), (col("o_totalprice") + 1000.0).as("o_totalprice"),
        lit("2024-01-01").as("ts"), lit("U").as("op"))
      val c2 = o.filter(col("o_orderkey") % 10 === 0).select(col("o_orderkey"),
        lit("U2").as("o_orderstatus"), (col("o_totalprice") + 2000.0).as("o_totalprice"),
        lit("2024-02-01").as("ts"), lit("U").as("op"))
      val c3 = o.filter(col("o_orderkey") % 20 === 0).select(col("o_orderkey"),
        lit(null).cast("string").as("o_orderstatus"),
        lit(null).cast("double").as("o_totalprice"),
        lit("2024-03-01").as("ts"), lit("D").as("op"))
      Scd.applyType2Feed(dest, c1.unionByName(c2).unionByName(c3),
        Seq("o_orderkey"), "ts", "op")
        .orderBy(col("o_orderkey"), col("valid_from"))
    }),

    "q_cdc_apply" -> ((s, dir) => {
      // change-feed application: latest change per key wins, tombstones
      // delete — the event-sourced form of the reference's staged sync
      val o = t(s, dir, "orders")
      val u1 = o.filter(col("o_orderkey") % 5 === 0).select(col("o_orderkey"),
        lit("U1").as("o_orderstatus"), (col("o_totalprice") + 1000.0).as("o_totalprice"),
        lit(1).as("version"), lit("U").as("op"))
      val u2 = o.filter(col("o_orderkey") % 10 === 0).select(col("o_orderkey"),
        lit("U2").as("o_orderstatus"), (col("o_totalprice") + 2000.0).as("o_totalprice"),
        lit(2).as("version"), lit("U").as("op"))
      val d3 = o.filter(col("o_orderkey") % 7 === 0).select(col("o_orderkey"),
        lit(null).cast("string").as("o_orderstatus"),
        lit(null).cast("double").as("o_totalprice"),
        lit(3).as("version"), lit("D").as("op"))
      val ins = o.filter(col("o_orderkey") % 13 === 0).select(
        (col("o_orderkey") + 20000000L).as("o_orderkey"),
        lit("N").as("o_orderstatus"), (col("o_totalprice") - 500.0).as("o_totalprice"),
        lit(1).as("version"), lit("I").as("op"))
      val changes = u1.unionByName(u2).unionByName(d3).unionByName(ins)
      Merge.applyCdc(destOrders(s, dir), changes, Seq("o_orderkey"), "version", "op")
        .orderBy(col("o_orderkey"))
    }),

    "q_insert_missing" -> ((s, dir) => {
      Merge.insertMissing(destOrders(s, dir), incomingOrders(s, dir), Seq("o_orderkey"))
        .orderBy(col("o_orderkey"))
    }),

    "q_dedup_exact" -> ((s, dir) => {
      Dedup.keepFirst(t(s, dir, "lineitem"), Seq("l_orderkey"),
        Seq(col("l_linenumber"), col("l_partkey"), col("l_suppkey")))
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
        .orderBy(col("l_orderkey"))
    }),

    "q_delete_excess" -> ((s, dir) => {
      val incoming = t(s, dir, "orders").filter(col("o_totalprice") > 350000)
        .select(col("o_custkey").as("c_custkey"))
      Merge.deleteExcess(t(s, dir, "customer"), incoming, Seq("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    "q_delete_excess_scoped" -> ((s, dir) => {
      // one-scope partial import: only nations present in the batch are
      // candidates for deletion (EcomDestinationWriter.cs:3067-3091)
      val cust = t(s, dir, "customer")
      val incoming = cust.filter(col("c_acctbal") > 5000 && col("c_nationkey") < 10)
        .select(col("c_custkey"), col("c_nationkey"))
      Merge.deleteExcessScoped(cust, incoming, Seq("c_custkey"), Seq("c_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
        .orderBy(col("c_custkey"))
    }),

    "q_assortment_rebuild" -> ((s, dir) => {
      // permission pairs = high-balance customers per segment; assortment
      // products = parts the segment bought at max quantity; existing
      // rows = the users' own purchased parts. Rebuilt rows activate,
      // stale existing rows deactivate (AssortmentHandler.cs:116, :272).
      val cust = t(s, dir, "customer")
      val users = cust.filter(col("c_acctbal") > 9950)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("seg"))
      val sold = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      val productPairs = sold.filter(col("l_quantity") === 50)
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"), col("l_partkey").as("part_key"))
      val existing = users.join(sold, col("o_custkey") === col("user_id"))
        .select(col("user_id"), col("l_partkey").as("part_key")).distinct()
      Assortments.rebuildWithFlag(existing, users, productPairs, "seg",
        Seq("user_id", "part_key"), "__active")
        .select(col("user_id"), col("part_key"),
          col("__active").cast("int").as("is_active"))
        .orderBy(col("user_id"), col("part_key"))
    }),

    "q_flag_missing" -> ((s, dir) => {
      val incoming = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("c_custkey"))
      Merge.flagMissing(t(s, dir, "customer"), incoming, Seq("c_custkey"), "__active")
        .select(col("c_custkey"), col("__active").cast("int").as("is_active"))
        .orderBy(col("c_custkey"))
    }),

    "q_surrogate_ids" -> ((s, dir) => {
      SurrogateKeys.assign(t(s, dir, "documents"),
        Seq(col("n_chars"), col("doc_id")), "new_id", startAt = 1001L)
        .select(col("doc_id"), col("new_id"))
        .orderBy(col("doc_id"))
    }),

    "q_name_match" -> ((s, dir) => {
      // the fuzzy tier of resolve-by-name: Jaro–Winkler scores over
      // real varied name pairs (each customer vs the next key's name —
      // shared prefix, diverging digits), reported in floored basis
      // points so a last-ulp engine difference can't flip a row; the
      // oracle runs DuckDB's NATIVE jaro_winkler_similarity — an
      // independent implementation agreeing on every pair
      val c = t(s, dir, "customer").select(col("c_custkey"), col("c_name"))
      val d = c.select((col("c_custkey") - 1).as("c_custkey"),
        col("c_name").as("next_name"))
      c.join(d, Seq("c_custkey"))
        .select(col("c_custkey"),
          floor(graft.functions.JaroWinkler.jaroWinkler(
            col("c_name"), col("next_name")) * 10000.0 + 0.5)
            .cast("long").as("sim_bp"))
        .orderBy(col("c_custkey"))
    }),

    "q_fk_by_name" -> ((s, dir) => {
      val nation = t(s, dir, "nation")
      val named = Denormalize.resolve(t(s, dir, "customer"), nation,
        Seq("c_nationkey" -> "n_nationkey"), Seq("n_name" -> "nation_name"))
        .select("c_custkey", "nation_name")
      Denormalize.resolve(named, nation,
        Seq("nation_name" -> "n_name"), Seq("n_nationkey" -> "resolved_key"))
        .orderBy(col("c_custkey"))
    }),

    "q_create_missing_refs" -> ((s, dir) => {
      val dim = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_custkey"))
      Denormalize.missingRefs(
        t(s, dir, "customer").select(col("c_custkey")), "c_custkey", dim, "o_custkey")
        .withColumn("new_ref_id", concat(lit("REF-"), col("c_custkey").cast("string")))
        .orderBy(col("c_custkey"))
    }),

    "q_fk_fallback" -> ((s, dir) => {
      // the writer's lookup ladder: resolve by key when present (even
      // orderkeys), else fall back to the business-name string
      val o = t(s, dir, "orders").select(
        col("o_orderkey"),
        when(col("o_orderkey") % 2 === 0, col("o_custkey")).as("cust_key_maybe"),
        concat(lit("Customer#"), lpad(col("o_custkey").cast("string"), 9, "0"))
          .as("cust_name"))
      Denormalize.resolveWithFallback(o, t(s, dir, "customer"),
        Seq("cust_key_maybe" -> "c_custkey", "cust_name" -> "c_name"),
        take = "c_custkey" -> "resolved_key")
        .select(col("o_orderkey"), col("resolved_key"))
        .orderBy(col("o_orderkey"))
    }),

    "q_default_values" -> ((s, dir) => {
      t(s, dir, "customer").select(
        col("c_custkey"),
        coalesce(when(col("c_name") === "", null).otherwise(col("c_name")), lit("UNKNOWN"))
          .as("name_filled"),
        when(col("c_acctbal") < 0, lit("DELINQUENT")).otherwise(col("c_mktsegment"))
          .as("segment"),
        concat(lit("CUST-"), col("c_custkey").cast("string")).as("ext_id"))
        .orderBy(col("c_custkey"))
    }),

    "q_quarantine" -> ((s, dir) => {
      // SkipFailingRows (EcomProvider.cs:247): rows failing validation
      // are diverted with a reason list instead of failing the job
      val (_, q) = Quarantine.split(t(s, dir, "orders"), Seq(
        "price_high" -> (col("o_totalprice") < 300000),
        "low_prio" -> !col("o_orderpriority").contains("LOW")))
      q.select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderpriority"), col("quarantine_reason"))
        .orderBy(col("o_orderkey"))
    }),

    "q_propagate_variants" -> ((s, dir) => {
      val withNote = t(s, dir, "lineitem")
        .withColumn("ship_note", when(col("l_returnflag") === "N", null)
          .otherwise(col("l_returnflag")))
      Propagate.fillFromParent(withNote, Seq("l_orderkey"),
        col("l_linenumber") === 1, Seq("ship_note"))
        .select(col("l_orderkey"), col("l_linenumber"), col("ship_note"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "q_distinct_count" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"), count(lit(1)).as("n_lines"))
        .orderBy(col("l_partkey"))
    }),

    "q_assortment_pairs" -> ((s, dir) => {
      t(s, dir, "events")
        .filter(col("event_type").isin("purchase", "signup"))
        .join(broadcast(t(s, dir, "customer")), col("user_id") === col("c_custkey"))
        .select(col("user_id"), col("event_type"), col("c_mktsegment"))
        .distinct()
        .orderBy(col("user_id"), col("event_type"))
    }),

    "q_rollup_hierarchy" -> ((s, dir) => {
      val joined = t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      joined.rollup(col("r_name"), col("n_name"))
        .agg(dsumRound(col("o_totalprice"), 2, 2).as("revenue"), count(lit(1)).as("n_orders"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    }),

    "q_grouping_sets" -> ((s, dir) => {
      // non-hierarchical multi-grain aggregation in ONE pass: per-nation,
      // per-priority, and per-(nation, priority) revenue — the grains a
      // reporting sync materializes separately; GROUPING SETS shares the
      // joined input via a single Expand instead of three scans
      val joined = t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      joined.groupingSets(
        Seq(Seq(col("n_name")), Seq(col("o_orderpriority")),
          Seq(col("n_name"), col("o_orderpriority"))),
        col("n_name"), col("o_orderpriority"))
        .agg(dsumRound(col("o_totalprice"), 2, 2).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("n_name").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }),

    "q_cube" -> ((s, dir) => {
      // full lattice over (nation, priority): grouping sets plus the
      // grand total — one Expand pass like q_grouping_sets; grouping()
      // flags disambiguate a real NULL key from a rolled-up one
      val joined = t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      joined.cube(col("n_name"), col("o_orderpriority"))
        .agg(grouping(col("n_name")).cast("int").as("g_nation"),
          grouping(col("o_orderpriority")).cast("int").as("g_priority"),
          dsumRound(col("o_totalprice"), 2, 2).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("g_nation"), col("g_priority"),
          col("n_name").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    }),

    "q_sql_api" -> ((s, dir) => {
      // the SQL entry path: same engine driven through spark.sql with
      // registered views — correlated EXISTS + scalar subquery
      t(s, dir, "orders").createOrReplaceTempView("v_orders")
      t(s, dir, "customer").createOrReplaceTempView("v_customer")
      s.sql(
        """SELECT c_custkey, c_mktsegment,
          |  (SELECT count(*) FROM v_orders WHERE o_custkey = c_custkey) AS n_orders
          |FROM v_customer
          |WHERE EXISTS (SELECT 1 FROM v_orders
          |  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
          |ORDER BY c_custkey""".stripMargin)
    }),

    "q_json_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_id"), get_json_object(col("props"), "$.k").cast("int").as("prop_k"))
        .orderBy(col("event_id"))
    }),

    "q_table_order" -> ((s, dir) => {
      // level = longest dependency path (closed form, so the DuckDB
      // oracle replays it with a recursive CTE); (level, name) is a
      // deterministic topological serialization — parents always sort
      // before children because level strictly increases along an edge
      val lv = plans.TableOrder.levels(Tables.All)
      val rows = lv.toSeq.sortBy { case (n, l) => (l, n) }.zipWithIndex
        .map { case ((n, l), i) => (i + 1L, n, l.toLong) }
      s.createDataFrame(rows).toDF("position", "table_name", "level")
        .orderBy(col("position"))
    }),

    "q_ecom_job" -> ((s, dir) => ecomJobChecksums(s, dir, strictFk = false)),

    // FailOnMissingGroups (EcomDestinationWriter.cs:4566): same job, with
    // the strict FkFail gate armed on the resolved group_id — passing
    // path proven byte-identical by sharing q_ecom_job's oracle
    "q_ecom_job_strict" -> ((s, dir) => ecomJobChecksums(s, dir, strictFk = true)),

    // ── §2B Analytics / bench headliners ───────────────────────────────

    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsumRound(col("l_quantity"), 2, 2).as("sum_qty"),
          dsumRound(col("l_extendedprice"), 2, 2).as("sum_base_price"),
          dsumRound(col("l_extendedprice") * (lit(1) - col("l_discount")), 6, 2)
            .as("sum_disc_price"),
          (floor(avg(col("l_quantity")) * 10000.0 + 0.5) / 10000.0).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q3_top_orders" -> ((s, dir) => {
      val cutoff = lit("1998-03-15").cast("timestamp")
      t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < cutoff)
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") > cutoff)
        .groupBy(col("o_orderkey"), col("o_orderpriority"))
        .agg(dsumRound(col("l_extendedprice") * (lit(1) - col("l_discount")), 6, 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    "q5_join5" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val sup = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(dsumRound(col("l_extendedprice") * (lit(1) - col("l_discount")), 6, 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    "q_trend_slope" -> ((s, dir) => {
      // per-region monthly revenue TREND: least-squares slope from
      // exact moment sums (n, Σx, Σy, Σxy, Σx²) — x the integer month
      // index, y the exact decimal month revenue, so both engines carry
      // IDENTICAL exact numerator/denominator into one double division
      // (the PMI-ratio determinism trick applied to regression); two
      // aggregates over months, dims broadcast
      val monthly = t(s, dir, "orders")
        .join(broadcast(Denormalize.resolve(t(s, dir, "customer"),
          t(s, dir, "nation"),
          Seq("c_nationkey" -> "n_nationkey"), Seq("n_regionkey" -> "__rk"))
          .select(col("c_custkey"), col("__rk"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "region")), col("__rk") === col("r_regionkey"))
        .groupBy(col("r_name"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .cast("long").as("x"))
        .agg(sum(col("o_totalprice").cast("decimal(30,2)")).as("y"))
      monthly.groupBy(col("r_name"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("r_name"),
          floor((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
            * 10000.0 + 0.5).cast("long").as("slope_bp"))
        .orderBy(col("r_name"))
    }),

    "q_basket_affinity" -> ((s, dir) => {
      // market-basket pair support: parts co-purchased in one order —
      // the affinity signal behind "customers also bought". ONE keyed
      // shuffle builds sorted distinct baskets (collect_set state
      // bounded by basket size), pairs enumerate INSIDE each basket
      // (never a self-join re-shuffle, never all-parts quadratic), and
      // per-part supports fall out of the same basket table; exact
      // integer supports (n_ab, n_a, n_b) — lift derives at read time
      // with no float hazard; total order makes the top-100 stable
      val baskets = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
      val pairs = baskets.select(explode(expr(
          "flatten(transform(parts, (a, i) -> " +
            "transform(slice(parts, i + 2, size(parts)), " +
            "b -> named_struct('part_a', a, 'part_b', b))))")).as("p"))
        .groupBy(col("p.part_a").as("part_a"), col("p.part_b").as("part_b"))
        .agg(count(lit(1)).as("n_ab"))
      val supp = baskets.select(explode(col("parts")).as("l_partkey"))
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("n"))
      pairs
        .join(supp.select(col("l_partkey").as("part_a"), col("n").as("n_a")),
          Seq("part_a"))
        .join(supp.select(col("l_partkey").as("part_b"), col("n").as("n_b")),
          Seq("part_b"))
        .filter(col("n_ab") >= 2)
        .orderBy(col("n_ab").desc, col("part_a"), col("part_b"))
        .limit(100)
        .select(col("part_a"), col("part_b"), col("n_ab"), col("n_a"), col("n_b"))
    }),

    "q_cohort_retention" -> ((s, dir) => {
      // classic cohort retention matrix: customers bucketed by
      // first-order month, tracked by month offset — two keyed
      // aggregates + one join back on the customer-sized first-order
      // table (broadcast at dim scale); months as portable yyyy-MM
      // strings, offsets as exact month-index ints (no interval math)
      val o = t(s, dir, "orders").select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("mi"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM").as("m"))
      val first = o.groupBy(col("o_custkey"))
        .agg(min(col("mi")).as("cmi"), min(col("m")).as("cohort"))
      o.join(first, Seq("o_custkey"))
        .groupBy(col("cohort"),
          (col("mi") - col("cmi")).cast("long").as("month_offset"))
        .agg(countDistinct(col("o_custkey")).as("n_customers"))
        .orderBy(col("cohort"), col("month_offset"))
    }),

    "q_growth_mom" -> ((s, dir) => {
      val monthly = t(s, dir, "orders")
        .join(broadcast(Denormalize.resolve(t(s, dir, "customer"), t(s, dir, "nation"),
          Seq("c_nationkey" -> "n_nationkey"), Seq("n_regionkey" -> "__rk"))
          .select(col("c_custkey"), col("__rk"))), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "region")), col("__rk") === col("r_regionkey"))
        .groupBy(col("r_name"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM").as("month"))
        .agg(round(sum(col("o_totalprice").cast("decimal(30,2)")), 2).cast("double")
          .as("revenue"))
      val w = Window.partitionBy(col("r_name")).orderBy(col("month"))
      monthly
        .withColumn("__prev", lag(col("revenue"), 1).over(w))
        .withColumn("growth_bp",
          when(col("__prev").isNull, null).otherwise(
            floor((col("revenue") - col("__prev")) / col("__prev") * 10000.0 + 0.5)
              .cast("long")))
        .select(col("r_name"), col("month"), col("revenue"), col("growth_bp"))
        .orderBy(col("r_name"), col("month"))
    }),

    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      t(s, dir, "lineitem").filter(col("l_suppkey") <= 10)
        .withColumn("rn", row_number().over(w))
        .withColumn("running_rev",
          sum(col("l_extendedprice").cast("decimal(30,2)"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double"))
        .select(col("l_suppkey"), col("rn"), col("l_orderkey"), col("l_linenumber"),
          col("running_rev"))
        .orderBy(col("l_suppkey"), col("rn"))
    }),

    "q_window_count_distinct" -> ((s, dir) => {
      // running DISTINCT-user count per event type — the one window
      // aggregate Spark does not support directly (COUNT(DISTINCT) OVER).
      // Composition: a first-occurrence flag (lag over user-major order)
      // then a running sum in time order. Both windows share the SAME
      // partition keys, so the plan is ONE exchange on event_type with
      // two in-partition sorts — the flag needs no second shuffle. The
      // oracle runs DuckDB's native COUNT(DISTINCT ... ) OVER, a genuinely
      // independent algorithm for the same semantics.
      RunningDistinct.countDistinct(
        t(s, dir, "events").filter(col("user_id") % 7 === 0),
        Seq("event_type"), "user_id", Seq(col("ts"), col("event_id")),
        as = "distinct_users")
        .select(col("event_id"), col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
          col("distinct_users"))
        .orderBy(col("event_type"), col("ts_str"), col("event_id"))
    }),

    "q_window_tumbling" -> ((s, dir) => {
      // same transform the streaming pipeline runs (EventPipeline is
      // batch/stream-agnostic; StreamingSpec proves stream == batch)
      EventPipeline.tumblingAgg(t(s, dir, "events"), "1 hour")
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("hour_bucket"),
          col("event_type"), col("n_events"), col("total_value"))
        .orderBy(col("hour_bucket"), col("event_type"))
    }),

    "q_salted_join" -> ((s, dir) => {
      // the manual skew join (rand salt + replicated build side) proven
      // EXACT at table scale: the oracle runs the PLAIN join, so
      // hash-equality shows salting is pure mechanics with zero
      // semantic residue
      Salt.saltedJoin(
        t(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice")),
        t(s, dir, "orders").select(col("o_orderkey").as("l_orderkey"),
          col("o_orderpriority")),
        Seq("l_orderkey"), buckets = 8)
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "q_salted_agg" -> ((s, dir) => {
      Salt.saltedSum(t(s, dir, "lineitem"), Seq("l_returnflag"),
        col("l_extendedprice") * (lit(1) - col("l_discount")), "revenue",
        distributor = col("l_orderkey"), outScale = Some(2))
        .select(col("l_returnflag"), col("revenue"))
        .orderBy(col("l_returnflag"))
    }),

    "q_distinct_approx" -> ((s, dir) => {
      // the 100 TB cheap path next to exact distinct: HyperLogLog++
      // sketches combine map-side (mergeable state, no value shuffle),
      // so a hot key costs the same as a cold one. rows-only: HLL
      // estimates are engine-specific; DistinctApproxSpec bounds the
      // relative error against the exact count instead.
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.02).as("n_parts_approx"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("l_returnflag"))
    }),

    "q_salted_distinct" -> ((s, dir) => {
      // the aggregate where salting EARNS its keep: exact COUNT(DISTINCT)
      // is non-combinable (state = the value set), so a hot key funnels
      // all its values through one reducer without the value-derived salt
      Salt.saltedCountDistinct(t(s, dir, "lineitem"), Seq("l_returnflag"),
        col("l_partkey"), "n_parts")
        .orderBy(col("l_returnflag"))
    }),

    "q_topk_per_group" -> ((s, dir) => {
      // best-N-per-category: rank window + filter so the rank-limit
      // pushdown (WindowGroupLimit) keeps only each task's local top-k
      // per group ahead of the shuffle — PlansSpec asserts the partial
      // node so the pushdown can't silently regress
      TopK.perGroup(t(s, dir, "customer"), Seq("c_nationkey"),
        Seq(col("c_acctbal").desc, col("c_custkey").asc), k = 5)
        .select(col("c_nationkey"), col("rank_in_group").cast("long").as("rank_in_group"),
          col("c_custkey"), col("c_acctbal"))
        .orderBy(col("c_nationkey"), col("rank_in_group"))
    }),

    "q_heavy_hitters" -> ((s, dir) => {
      // bounded-state exact frequent keys over a deterministic hot-key
      // profile: 30% of lineitem rows collapse onto 7 hot keys, the rest
      // stay near-unique — phi is relative, so the answer (the 7 hot
      // keys) is scale-stable while candidate state stays O(capacity)
      val keyed = t(s, dir, "lineitem").select(
        when(col("l_orderkey") % 10 < 3, col("l_orderkey") % 7)
          .otherwise(col("l_orderkey")).as("k"))
      HeavyHitters.frequentKeys(keyed, col("k"), phi = 0.001)
        .orderBy(col("hh_key"))
    }),

    "q_event_outliers" -> ((s, dir) => {
      // per-user z-score anomaly flags over event values. Moments are
      // exact decimal sums (order-independent), the z arithmetic is the
      // SAME double expression as the oracle (IEEE ops are deterministic
      // given identical inputs + order), and the filter compares the
      // ROUNDED z so boundary membership agrees cross-engine.
      val e = t(s, dir, "events")
      val dv = col("value").cast("decimal(18,6)")
      val stats = e.groupBy(col("user_id")).agg(
        count(lit(1)).as("__n"), sum(dv).as("__s"), sum(dv * dv).as("__s2"))
      e.join(stats, Seq("user_id"))
        .withColumn("__mean", col("__s").cast("double") / col("__n").cast("double"))
        .withColumn("__var",
          col("__s2").cast("double") / col("__n").cast("double") -
            col("__mean") * col("__mean"))
        .filter(col("__var") > 1e-12)
        .withColumn("z",
          floor((col("value") - col("__mean")) / sqrt(col("__var")) * 10000.0 + 0.5)
            / 10000.0)
        .filter(abs(col("z")) > 2.0)
        .select(col("event_id"), col("user_id"), col("value"), col("z"))
        .orderBy(col("event_id"))
    }),

    "q_quantile_binning" -> ((s, dir) => {
      // equal-population price bands: floored exact-quartile boundaries
      // (one tiny aggregate) + broadcast CASE assignment — never a
      // global ntile window through one ordered partition
      val o = t(s, dir, "orders")
      val (binned, _) = Binning.quantileBins(o, col("o_totalprice"),
        Seq(0.25, 0.5, 0.75), as = "price_band")
      binned.groupBy(col("price_band")).agg(
        count(lit(1)).as("n_orders"),
        dsumRound(col("o_totalprice"), 2, 2).as("revenue"))
        .orderBy(col("price_band"))
    }),

    "q_moving_window" -> ((s, dir) => {
      // time-RANGE frame (not row-count): each purchase's trailing-7-day
      // per-user spend — the window kind row frames can't express when
      // events are irregularly spaced; decimal sum for exact cross-engine
      // totals, count for the frame-membership check
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").cast("long"))
        .rangeBetween(-7L * 24 * 3600, 0L)
      t(s, dir, "events").filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          round(sum(col("value").cast("decimal(30,6)")).over(w), 2)
            .cast("double").as("spend_7d"),
          count(lit(1)).over(w).as("n_7d"))
        .select(col("event_id"), col("user_id"), col("spend_7d"), col("n_7d"))
        .orderBy(col("event_id"))
    }),

    "q_funnel_steps" -> ((s, dir) => {
      // ordered conversion funnel per user: first view, first click
      // within 6h of that view, first purchase within 6h of that click —
      // chained conditional min-aggregates over grouped passes, no
      // self-join explosion over the raw event stream
      val e = t(s, dir, "events")
      val win = expr("INTERVAL 6 HOURS")
      val perUser = e.groupBy(col("user_id")).agg(
        min(when(col("event_type") === "view", col("ts"))).as("t_view"))
      val withClick = e.join(perUser, Seq("user_id"))
        .groupBy(col("user_id"), col("t_view")).agg(
          min(when(col("event_type") === "click" && col("ts") >= col("t_view")
            && col("ts") <= col("t_view") + win, col("ts"))).as("t_click"))
      val withPurchase = e.join(withClick, Seq("user_id"))
        .groupBy(col("user_id"), col("t_view"), col("t_click")).agg(
          min(when(col("event_type") === "purchase" && col("ts") >= col("t_click")
            && col("ts") <= col("t_click") + win, col("ts"))).as("t_purchase"))
      withPurchase.select(
        when(col("t_purchase").isNotNull, "purchased")
          .when(col("t_click").isNotNull, "clicked")
          .when(col("t_view").isNotNull, "viewed")
          .otherwise("none").as("stage"))
        .groupBy(col("stage")).agg(count(lit(1)).as("n_users"))
        .orderBy(col("stage"))
    }),

    "q_window_ranks" -> ((s, dir) => {
      // distribution-rank window family per group: percent_rank /
      // cume_dist are exact integer-ratio divisions (IEEE-deterministic
      // cross-engine), ntile is integer — all per-nation, never a
      // global single-partition window
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      t(s, dir, "customer")
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy(col("c_nationkey"), col("c_custkey"))
    }),

    "q_stratified_sample" -> ((s, dir) => {
      // deterministic stratified sampling: exactly k docs per source,
      // chosen by a portable hash order (reproducible across runs,
      // engines, and partitionings) — TopK's rank-limit pushdown keeps
      // the per-stratum selection map-side
      val hashed = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          (col("doc_id") % 1048573L * 2654435761L % 1000000L).as("__h"))
      TopK.perGroup(hashed, Seq("source"),
        Seq(col("__h").asc, col("doc_id").asc), k = 10)
        .select(col("source"), col("doc_id"),
          col("rank_in_group").cast("long").as("rank_in_group"))
        .orderBy(col("source"), col("rank_in_group"))
    }),

    "q_except_intersect" -> ((s, dir) => {
      // set-algebra surface: customer cohorts by order year — retained
      // (both years) vs churned (1996 only), via INTERSECT / EXCEPT
      val o = t(s, dir, "orders")
      def cohort(y: Int) = o.filter(year(col("o_orderdate")) === y)
        .select(col("o_custkey")).distinct()
      cohort(1996).intersect(cohort(1997))
        .withColumn("cohort", lit("retained"))
        .unionByName(cohort(1996).except(cohort(1997))
          .withColumn("cohort", lit("churned")))
        .orderBy(col("cohort"), col("o_custkey"))
    }),

    "q_fuzzy_match" -> ((s, dir) => {
      // fuzzy business-key resolution: feed names with the 3rd char
      // dropped resolve back to the reference dimension by edit
      // distance — segment-blocked (PassJoin), never |L|·|R|
      val dim = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      val feed = dim.select(col("n_nationkey").as("feed_key"),
        concat(substring(col("n_name"), 1, 2), substring(col("n_name"), 4, 100))
          .as("feed_name"))
      FuzzyJoin.byEditDistance(feed, dim, "feed_name", "n_name", maxDist = 1)
        .select(col("feed_key"), col("feed_name"), col("n_nationkey"),
          col("n_name"), col("edit_dist"))
        .orderBy(col("feed_key"), col("n_nationkey"))
    }),

    "q_incremental_agg" -> ((s, dir) => {
      // incremental view maintenance: the per-status aggregate is kept
      // current by folding the staged batch's CDC form (retraction of the
      // old row + insert of the new) into the state table — the oracle
      // aggregates the fully-merged table, so hash-equality proves
      // fold(state, delta) == recompute-the-world
      val dest = destOrders(s, dir).select("o_orderkey", "o_orderstatus", "o_totalprice")
      val inc = incomingOrders(s, dir)
      val retract = dest.join(inc.select("o_orderkey"), Seq("o_orderkey"), "left_semi")
        .select(col("o_orderstatus"), col("o_totalprice"), lit("D").as("op"))
      val insert = inc.select(col("o_orderstatus"), col("o_totalprice"), lit("I").as("op"))
      val state = IncrementalAgg.init(dest, Seq("o_orderstatus"), col("o_totalprice"))
      IncrementalAgg.foldCdc(state, retract.unionByName(insert),
        Seq("o_orderstatus"), col("o_totalprice"), col("op"))
        .select(col("o_orderstatus"), col("n_rows"),
          col("total").cast("double").as("total"))
        .orderBy(col("o_orderstatus"))
    }),

    "q_drift_psi" -> ((s, dir) => {
      // distribution drift between two "snapshots" (shipments before /
      // since 1997) — the validation signal counts and checksums miss:
      // a row-complete sync whose VALUES shifted. Fixed boundaries keep
      // bucket assignment integer-exact; the one float op per bucket is
      // the PSI term, shipped in ppm via the floor rule
      val li = t(s, dir, "lineitem")
      val cut = lit("1997-01-01").cast("timestamp")
      operators.Drift.psi(
        li.filter(col("l_shipdate") < cut),
        li.filter(col("l_shipdate") >= cut),
        col("l_extendedprice"),
        Seq(20000.0, 40000.0, 60000.0, 80000.0))
        .orderBy(col("bucket"))
    }),

    "q_drift_profile" -> ((s, dir) => {
      // table-wide drift: three columns scored in ONE aggregate pass per
      // snapshot (Profile.summarize's stack-unpivot applied to PSI) —
      // the whole table's distribution health costs two scans, not 2×cols
      val li = t(s, dir, "lineitem")
      val cut = lit("1997-01-01").cast("timestamp")
      operators.Drift.psiProfile(
        li.filter(col("l_shipdate") < cut),
        li.filter(col("l_shipdate") >= cut),
        Seq(
          "l_extendedprice" -> Seq(20000.0, 40000.0, 60000.0, 80000.0),
          "l_quantity" -> Seq(10.0, 20.0, 30.0, 40.0),
          "l_discount" -> Seq(0.02, 0.04, 0.06, 0.08)))
        .orderBy(col("col_name"), col("bucket"))
    }),

    "q_drift_ks" -> ((s, dir) => {
      // KS distance over the SAME bucket counts q_drift_psi scores —
      // PSI flags ratio moves in thin buckets, KS flags the largest
      // absolute CDF displacement; both derive from one count summary
      val li = t(s, dir, "lineitem")
      val cut = lit("1997-01-01").cast("timestamp")
      operators.Drift.ks(
        li.filter(col("l_shipdate") < cut),
        li.filter(col("l_shipdate") >= cut),
        col("l_extendedprice"),
        Seq(20000.0, 40000.0, 60000.0, 80000.0))
        .orderBy(col("bucket"))
    }),

    "q_drift_corpus" -> ((s, dir) => {
      // crawl-over-crawl corpus drift for the training-data pipeline:
      // has the document LENGTH/TOKEN mix of the new crawl moved against
      // the last one? Derived signals (char count, whitespace token
      // count) feed the same one-pass psiProfile — two corpus scans
      // total for any number of signals
      val d = t(s, dir, "documents").withColumn("n_chars_sig",
          length(col("text")).cast("double"))
        // explicit class, not \s: Java regex \s includes \x0B (vertical
        // tab), RE2's does not — a pinned class keeps both engines
        // tokenizing identically on edge whitespace
        .withColumn("n_tokens_sig",
          size(split(trim(col("text")), "[ \\t\\n\\r\\f]+")).cast("double"))
      operators.Drift.psiProfile(
        d.filter(col("doc_id") % 2 === 0),
        d.filter(col("doc_id") % 2 === 1),
        Seq(
          "n_chars_sig" -> Seq(175.0, 300.0, 420.0),
          "n_tokens_sig" -> Seq(32.0, 56.0, 76.0)))
        .orderBy(col("col_name"), col("bucket"))
    }),

    "q_drift_categorical" -> ((s, dir) => {
      // categorical drift — the status/priority-mix validation numeric
      // buckets can't express. Category space bounded BEFORE scoring:
      // top-3 by old-side count (count desc, value asc — the sf0.01
      // data plants a real tie at 3003 rows, so the tiebreak is
      // exercised), tail folds into the OTHER sentinel
      val o = t(s, dir, "orders")
      val cut = lit("1997-01-01").cast("timestamp")
      operators.Drift.psiCategorical(
        o.filter(col("o_orderdate") < cut),
        o.filter(col("o_orderdate") >= cut),
        col("o_orderpriority"), maxCategories = 3)
        .orderBy(col("category"))
    }),

    "q_sync_diff" -> ((s, dir) => {
      // sync reconciliation: WHICH keys drifted between source and
      // destination — missing / extra / differs via one full-outer join
      // of (key, 60-bit digest) pairs; content columns never shuffle.
      // The destination derives deterministically: %97 rows never
      // arrived, %89 rows drifted in price, +30M ids are spurious
      // extras. The oracle compares CONTENT directly (IS DISTINCT
      // FROM), so hash-equality also proves the digest reduction loses
      // nothing.
      val src = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val dst = src.filter(col("o_orderkey") % 97 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 89 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
        .unionByName(src.filter(col("o_orderkey") % 101 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 30000000L))
      Reconcile.diffKeys(src, dst, Seq("o_orderkey"),
        Seq("o_orderstatus", "o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    "q_change_feed" -> ((s, dir) => {
      // CDC feed GENERATION from two snapshots (sources that only
      // publish snapshots — the reference's import model): digest
      // compare names the changed keys (16 B/row shuffle), full content
      // moves only for the delta; D carries the old version, I the new,
      // updates lower to D+I — the feed every incremental consumer eats
      val src = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val dst = src.filter(col("o_orderkey") % 97 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 89 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
        .unionByName(src.filter(col("o_orderkey") % 101 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 30000000L))
      Reconcile.changeFeed(src, dst, Seq("o_orderkey"),
        Seq("o_orderstatus", "o_totalprice"))
        .orderBy(col("o_orderkey"), col("op"))
    }),

    "q_incremental_join" -> ((s, dir) => {
      // materialized-JOIN maintenance: the orders⨝customer view is kept
      // current by dirty-set partial recompute (IncrementalJoin.maintain
      // — state never shuffles, snapshots key-pruned by the delta); the
      // oracle joins the FINAL tables, so hash-equality proves
      // maintain(state, deltas) == recompute-the-world. Old snapshots
      // and CDC feeds derive deterministically from the current tables:
      // %97 orders are the batch's inserts, %89 moved to another
      // customer (key-CHANGING update: old key on the D row, new on the
      // I row), fabricated +30M ids are full deletes, %13 customers
      // changed balance.
      val aNew = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_custkey").as("custkey"), col("o_totalprice"))
      val bNew = t(s, dir, "customer").select(col("c_custkey").as("custkey"),
        col("c_name"), col("c_acctbal"))
      val aIns = aNew.filter(col("o_orderkey") % 97 === 0)
      val aMovedNew = aNew.filter(col("o_orderkey") % 97 =!= 0
        && col("o_orderkey") % 89 === 0)
      val aMovedOld = aMovedNew
        .withColumn("custkey", pmod(col("custkey") + 7, lit(1500L)) + 1)
        .withColumn("o_totalprice", col("o_totalprice") - 100.0)
      val aDeleted = aNew.filter(col("o_orderkey") % 101 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 30000000L)
      val aOld = aNew.filter(col("o_orderkey") % 97 =!= 0
          && col("o_orderkey") % 89 =!= 0)
        .unionByName(aMovedOld).unionByName(aDeleted)
      val bChangedNew = bNew.filter(col("custkey") % 13 === 0)
      val bChangedOld = bChangedNew.withColumn("c_acctbal", col("c_acctbal") - 50.0)
      val bOld = bNew.filter(col("custkey") % 13 =!= 0).unionByName(bChangedOld)
      val deltaA = aMovedOld.unionByName(aDeleted).withColumn("op", lit("D"))
        .unionByName(aIns.unionByName(aMovedNew).withColumn("op", lit("I")))
      val deltaB = bChangedOld.withColumn("op", lit("D"))
        .unionByName(bChangedNew.withColumn("op", lit("I")))
      val state = IncrementalJoin.joinOf(aOld, bOld, Seq("custkey"))
      IncrementalJoin.maintain(state, aNew, deltaA, bNew, deltaB,
        Seq("custkey"), "o_orderkey", "custkey")
        .orderBy(col("o_orderkey"))
    }),

    "q_minmax_maintain" -> ((s, dir) => {
      // MAX maintained under a delete-bearing CDC feed via the capped
      // top-k state (foldCdcTopK) — the aggregate plain folds can't
      // keep. Updates MOVE rows across groups (old status retracted,
      // 'U' inserted), so kept ranges shrink on one side and grow on
      // the other; any group whose kept range exhausts takes the
      // partial-recompute branch (usually none). Oracle = recompute
      // max over the fully-merged table — hash-equality proves the
      // bounded state loses nothing.
      val dest = destOrders(s, dir)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val inc = incomingOrders(s, dir)
      val retract = dest
        .join(inc.select("o_orderkey"), Seq("o_orderkey"), "left_semi")
        .select(col("o_orderstatus"), col("o_totalprice"), lit("D").as("op"))
      val insert = inc.select(col("o_orderstatus"), col("o_totalprice"),
        lit("I").as("op"))
      val state = IncrementalAgg.initTopK(dest, Seq("o_orderstatus"),
        col("o_totalprice"), k = 8)
      val folded = IncrementalAgg.foldCdcTopK(state,
        retract.unionByName(insert), Seq("o_orderstatus"),
        col("o_totalprice"), col("op"), k = 8)
      val merged = Merge.upsert(dest, inc, Seq("o_orderkey"))
      val ok = folded.filter(!col("needs_rebuild"))
        .select(col("o_orderstatus"), col("n_rows"),
          element_at(col("topk"), 1).as("max_price"))
      val rebuilt = merged
        .join(folded.filter(col("needs_rebuild")).select("o_orderstatus"),
          Seq("o_orderstatus"), "left_semi")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_rows"), max(col("o_totalprice")).as("max_price"))
      ok.unionByName(rebuilt).orderBy(col("o_orderstatus"))
    }),

    "q_profile" -> ((s, dir) => {
      // per-column import profile: rows/nulls/distincts as joinable
      // rows; EXACT distincts requested deliberately (oracle parity —
      // the default is the HLL scale path)
      Profile.summarize(t(s, dir, "orders"),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"),
        approxDistinct = false)
        .orderBy(col("col_name"))
    }),

    "q_interval_join" -> ((s, dir) => {
      // funnel attribution: purchases joined to same-user views in the
      // preceding 30 minutes — batch twin of the watermarked
      // stream-stream join (StreamingSpec proves stream == batch)
      val e = t(s, dir, "events")
      EventPipeline.intervalJoin(
        e.filter(col("event_type") === "view"),
        e.filter(col("event_type") === "purchase"), "30 minutes")
        .select(col("user_id"), col("view_id"), col("purchase_id"),
          col("purchase_value"))
        .orderBy(col("view_id"), col("purchase_id"))
    }),

    "q_clean_relations" -> ((s, dir) => {
      val validParents = t(s, dir, "orders").filter(col("o_totalprice") <= 400000)
        .select(col("o_orderkey").as("l_orderkey"))
      t(s, dir, "lineitem")
        .join(validParents, Seq("l_orderkey"), "left_anti")
        .select(col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "q_rate_limit" -> ((s, dir) => {
      // throttled sampling: at most 3 events per (user, type, hour) —
      // the log-volume cap next to q_debounce's gap suppression; plain
      // rank window, so WindowGroupLimit pushes the per-group cap
      // map-side ahead of the shuffle (same plan family as TopK)
      val w = Window.partitionBy(col("user_id"), col("event_type"),
          date_trunc("hour", col("ts")))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= 3)
        .select(col("event_id"), col("user_id"), col("event_type"))
        .orderBy(col("event_id"))
    }),

    "q_debounce" -> ((s, dir) => {
      // alert suppression: per (user, event_type), keep an event only
      // ≥30 min after the LAST KEPT one — running scan with reset
      // (Debounce.suppress), which neither windows nor gap-sessions
      // express; the oracle replays it as a DuckDB RECURSIVE CTE
      // stepping row-by-row per key — an independent formulation
      // agreeing on every kept event at microsecond precision
      Debounce.suppress(
        t(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"), col("ts")),
        Seq("user_id", "event_type"), "ts",
        minGapMicros = 30L * 60 * 1000000, tiebreak = Seq("event_id"))
        .select(col("event_id"), col("user_id"), col("event_type"))
        .orderBy(col("event_id"))
    }),

    "q_debounce_chunked" -> ((s, dir) => {
      // the hot-key-parallel variant: keys split at raw gaps ≥ minGap
      // (provable reset points) and chunks scan independently. Same
      // recursive-CTE oracle as q_debounce — the hash match proves the
      // chunking is an exact refactor of the sequential scan on real
      // event data at both SFs, not just on the spec's planted feed
      Debounce.suppressChunked(
        t(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"), col("ts")),
        Seq("user_id", "event_type"), "ts",
        minGapMicros = 30L * 60 * 1000000, tiebreak = Seq("event_id"))
        .select(col("event_id"), col("user_id"), col("event_type"))
        .orderBy(col("event_id"))
    }),

    "q_sessionize" -> ((s, dir) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val sessions = t(s, dir, "events")
        .withColumn("__prev", lag(col("ts"), 1).over(byUser))
        .withColumn("__new", when(col("__prev").isNull ||
          col("ts").cast("double") - col("__prev").cast("double") > 1800.0, 1).otherwise(0))
        .withColumn("session_id",
          sum(col("__new")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sessions.groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // ── §2C LLM-training-data operators (SQL-expressible subset) ───────

    "q_dedup_exact_docs" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
        .select(col("doc_id"), col("n_copies"))
        .orderBy(col("doc_id"))
    }),

    "q_dedup_incremental" -> ((s, dir) => {
      // incremental-ingest dedup: drop batch docs whose text was already
      // ingested (history = the even-id half). The bloom gate means only
      // might-contain rows pay the exact anti-join; misses flow through
      // shuffle-free — the 100 TB incremental-batch shape. Output ==
      // plain left_anti exactly (the join corrects false positives).
      val docs = t(s, dir, "documents")
      val history = docs.filter(col("doc_id") % 2 === 0).select(col("text"))
      Dedup.againstHistory(docs, history, Seq("text"), expectedItems = 100000L)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    "q_chunk_docs" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          explode(TextFunctions.chunkTokens(col("text"), size = 64, overlap = 16))
            .as("chunk"))
        .select(col("doc_id"), col("chunk"),
          TextFunctions.tokenCount(col("chunk")).as("n_chunk_tokens"))
        .orderBy(col("doc_id"), col("chunk"))
    }),

    "q_dedup_normalized" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(TextFunctions.normalizeForDedup(col("text")).as("__norm"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
        .select(col("doc_id"), col("n_copies"))
        .orderBy(col("doc_id"))
    }),

    "q_percentiles" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(
          round(expr("percentile(CAST(n_chars AS DOUBLE), 0.5)"), 2).as("median_chars"),
          round(expr("percentile(CAST(n_chars AS DOUBLE), 0.9)"), 2).as("p90_chars"),
          count(lit(1)).as("n_docs"))
        .orderBy(col("source"))
    }),

    "q_percentiles_approx" -> ((s, dir) => {
      // the 100 TB cheap path next to q_percentiles' exact interpolation:
      // approx_percentile's quantile summaries are MERGEABLE state that
      // combines map-side — a skewed source costs the same as a uniform
      // one, and accuracy is a knob. rows-only: sketch results are
      // engine-specific; DistinctApproxSpec bounds the error vs exact.
      t(s, dir, "documents")
        .groupBy(col("source"))
        .agg(
          approx_percentile(col("n_chars").cast("double"), lit(0.5), lit(2500))
            .as("median_chars_approx"),
          approx_percentile(col("n_chars").cast("double"), lit(0.9), lit(2500))
            .as("p90_chars_approx"),
          count(lit(1)).as("n_docs"))
        .orderBy(col("source"))
    }),

    "q_token_gini" -> ((s, dir) => {
      // per-doc vocabulary concentration: token total n and Σc² over
      // per-token counts, kept as EXACT integers — Simpson/Gini
      // concentration (Σc²/n², the repetition complement of diversity)
      // derives at read time with no cross-engine float hazard.
      // Boilerplate scores high, diverse prose low. Zero-token docs are
      // absent (nothing to score). Shape: one (doc_id, tok) aggregate
      // then one doc_id aggregate — both partial-agg friendly.
      val toks = t(s, dir, "documents").select(col("doc_id"),
        // pinned class, not \s — see TextFunctions.WhitespaceClass
        explode(split(trim(col("text")), "[ \\t\\n\\r\\f]+")).as("tok"))
        .filter(col("tok") =!= "")
      toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_tokens"),
          sum(col("c") * col("c")).as("ssq_tokens"))
        .orderBy(col("doc_id"))
    }),

    "q_token_count" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("n_tokens"),
          TextFunctions.bpeTokenCount(col("text")).as("n_bpe_tokens"))
        .orderBy(col("doc_id"))
    }),

    "q_text_quality" -> ((s, dir) => {
      val txt = col("text")
      t(s, dir, "documents").select(
        col("doc_id"),
        TextFunctions.tokenCount(txt).as("n_tokens"),
        TextFunctions.vocabHits(txt, TextFunctions.Stopwords).as("stop_hits"),
        TextFunctions.stopwordRatio(txt, TextFunctions.Stopwords).as("stop_ratio"),
        TextFunctions.qualityScore(txt).as("quality"))
        .orderBy(col("doc_id"))
    }),

    "q_word_stats" -> ((s, dir) => {
      // Gopher-style word-shape signals as EXACT INTEGERS (the float-
      // free way to ship filter inputs cross-engine): word count, total
      // word characters (mean word length = total/n, thresholded by the
      // caller), and words containing an ASCII letter (the "fraction of
      // words with an alphabetic character" rule). One narrow pass,
      // no shuffle.
      import graft.functions.TextFunctions
      val toks = TextFunctions.tokens(col("text"))
      t(s, dir, "documents").select(
        col("doc_id"),
        size(toks).as("n_words"),
        coalesce(aggregate(transform(toks, t => length(t)), lit(0),
          (a, x) => a + x), lit(0)).as("word_chars"),
        size(filter(toks, t => t.rlike("[A-Za-z]"))).as("alpha_words"))
        .orderBy(col("doc_id"))
    }),

    "q_char_entropy" -> ((s, dir) => {
      // character-level Shannon entropy per document (bits, basis
      // points) — the is-this-text-or-noise filter signal: near-zero =
      // repeated-char padding, near-max = base64/hex/binary spill. One
      // codegen pass per row, zero shuffle (exploding to a row per
      // CHARACTER would shuffle 100× the corpus at 100 TB)
      t(s, dir, "documents")
        .filter(length(col("text")) > 0)
        .select(col("doc_id"),
          graft.functions.CharEntropy.charEntropyBp(col("text")).as("entropy_bp"))
        .orderBy(col("doc_id"))
    }),

    "q_lang_id" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        TextFunctions.langId(col("text")).as("pred_lang"),
        (TextFunctions.langId(col("text")) === col("lang")).cast("int").as("is_match"))
        .orderBy(col("doc_id"))
    }),

    "q_embed_cosine_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Knn.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
        .orderBy(col("query_id"), col("neighbor_id"))
    }),

    "q_vector_quantize" -> ((s, dir) => {
      // int8 storage codes for the ANN index (4× smaller than float32):
      // per-vector max-abs scale + integer codes. Output is
      // integer-exact: the scale in fixed-point basis points and two
      // integer code aggregates — both engines replay the same IEEE
      // floor(x/scale + 0.5) formula, so codes match bit-for-bit
      // (KnnSpec separately bounds quantized-search recall ≥ 0.8).
      import graft.functions.VectorFunctions.quantizeInt8
      t(s, dir, "embeddings")
        .withColumn("qs", quantizeInt8(col("embedding")))
        .select(col("vec_id"),
          floor(col("qs.scale") * 10000.0 + 0.5).cast("long").as("scale_e4"),
          aggregate(col("qs.q"), lit(0L), (a, x) => a + x.cast("long")).as("q_sum"),
          aggregate(col("qs.q"), lit(0L), (a, x) => a + x.cast("long") * x.cast("long"))
            .as("q_norm2"))
        .orderBy(col("vec_id"))
    }),

    "q_session_window" -> ((s, dir) => {
      EventPipeline.sessionAgg(t(s, dir, "events"), "30 minutes")
        .select(col("user_id"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          col("n_events"))
        .orderBy(col("user_id"), col("session_start"))
    }),

    // ── §2C rows-only operators (ScalaTest oracles; see SURVEY.md §6) ──

    "q_hierarchy_closure" -> ((s, dir) => {
      // multi-level group-tree flattening (ParentGroups,
      // EcomSourceReader.cs:348): synthetic binary tree parent=id/2 over
      // doc ids, closed by iterative doubling (log-depth self-joins)
      val edges = t(s, dir, "documents")
        .select(col("doc_id").as("child"),
          floor(col("doc_id") / 2).cast("long").as("parent"))
        .filter(col("child") > 0)
      Hierarchy.closure(edges, "child", "parent")
        .orderBy(col("child"), col("ancestor"))
    }),

    "q_token_histogram" -> ((s, dir) => {
      // corpus profiling: token-count distribution per source in
      // fixed-width buckets — the stats pass every mixture design starts
      // from (engine-portable floor-bucketing, no width_bucket needed)
      t(s, dir, "documents")
        .select(col("source"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n"))
        .groupBy(col("source"), floor(col("n") / 10).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("source"), col("bucket"))
    }),

    "q_token_budget" -> ((s, dir) => {
      // per-source token-budget cap: keep docs in doc_id order while the
      // source's running total fits — the cap side of mixture building
      val withTok = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
      graft.pipelines.Mixture.capTokenBudget(withTok, "source", "doc_id",
        "n_tokens", budget = 500L)
        .orderBy(col("doc_id"))
    }),

    "q_cooccurrence" -> ((s, dir) => {
      // collocation mining: adjacent-pair PMI ratios over the corpus
      graft.pipelines.Collocations.pmi(t(s, dir, "documents"), "text",
        minPairCount = 2L)
        .orderBy(col("w1"), col("w2"))
    }),

    "q_sample_weighted" -> ((s, dir) => {
      // quality-weighted sampling: per-row rate from a document signal
      // (length here; any quality score slots in) — long docs replicate
      // up to 2 epochs, short ones hash-downsample; portable hash +
      // pure-IEEE rate arithmetic so the oracle replays the decision
      val d = t(s, dir, "documents")
      pipelines.Mixture.sampleWeighted(
        d.select(col("doc_id"), col("n_chars")),
        least(lit(2.0), col("n_chars") / 500.0),
        (col("doc_id") % 1048573L * 2654435761L % 1000000L).cast("double")
          / 1000000.0)
        .select(col("doc_id"), col("epoch").cast("long").as("epoch"))
        .orderBy(col("doc_id"), col("epoch"))
    }),

    "q_pack_sequences" -> ((s, dir) => {
      // concat-and-chop training-sequence packing, one window per source
      val withTok = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
      graft.pipelines.Mixture.packSequences(withTok, "source", "doc_id",
        "n_tokens", budget = 256)
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("seq_id"), col("seq_pos"))
        .orderBy(col("doc_id"))
    }),

    "q_pack_ranged" -> ((s, dir) => {
      // the hot-source twin: range-partitioned two-pass cumsum, SAME
      // oracle SQL as q_pack_sequences — the driver hash-checks that
      // the scalable formulation reproduces the window form bit-for-bit
      val withTok = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
      val packed = graft.pipelines.Mixture.packSequencesRanged(withTok,
        "source", "doc_id", "n_tokens", budget = 256)
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("seq_id"), col("seq_pos"))
        .orderBy(col("doc_id"))
      packed
    }),

    "q_token_budget_ranged" -> ((s, dir) => {
      // hot-source twin of q_token_budget, same oracle — see q_pack_ranged
      val withTok = t(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
      graft.pipelines.Mixture.capTokenBudgetRanged(withTok, "source",
        "doc_id", "n_tokens", budget = 500L)
        .orderBy(col("doc_id"))
    }),

    "q_dataset_split" -> ((s, dir) => {
      // reproducible train/val/test assignment — portable hash so the
      // oracle verifies the bucketing logic cross-engine
      val u = (col("doc_id") % 1048573L * 2654435761L % 1000000L)
        .cast("double") / 1000000.0
      graft.pipelines.Mixture.split(t(s, dir, "documents"), u,
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("split"))
        .orderBy(col("doc_id"))
    }),

    "q_mixture_sample" -> ((s, dir) => {
      // deterministic mixture weighting (GPT-3/LLaMA-style source
      // epochs): hash-sampled, reproducible across runs and partitionings.
      // The portable multiplicative hash here lets DuckDB verify the
      // sampling logic; the library default is xxhash64 (MixtureSpec).
      val u = (col("doc_id") % 1048573L * 2654435761L % 1000000L)
        .cast("double") / 1000000.0
      graft.pipelines.Mixture.sample(t(s, dir, "documents"), "source",
        Map("src0" -> 2.25, "src1" -> 0.5, "src2" -> 1.0, "src3" -> 0.25), u)
        .select(col("doc_id"), col("source"), col("epoch"))
        .orderBy(col("doc_id"), col("epoch"))
    }),

    "q_pii_redact" -> ((s, dir) => {
      // C4/RefinedWeb-style PII scrubbing: pure regexp_replace, codegen'd.
      // The corpus text is synthetic, so deterministic PII is CONSTRUCTED
      // per doc (both engines build the identical string) then redacted.
      val withPii = t(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com or 10.0."), col("doc_id") % 256,
            lit(".7 tel 555-123-4567")).as("text_pii"))
      withPii.select(col("doc_id"),
        TextFunctions.redactPii(col("text_pii")).as("redacted"))
        .orderBy(col("doc_id"))
    }),

    "q_repetition" -> ((s, dir) => {
      // Gopher/RefinedWeb repetition rule: top-bigram share per doc
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextFunctions.topBigramFractionBp(col("text")).as("top_bigram_bp"))
        .orderBy(col("doc_id"))
    }),

    "q_doc_fingerprint" -> ((s, dir) => {
      // the codegen rolling hash (31·h + signed byte, 64-bit wrap) has
      // an exact closed form h = seed·31^n + Σ bᵢ·31^(n-1-i) (mod 2^64)
      // — a commutative sum the oracle replays in HUGEINT with an
      // explicit mod and two's-complement finish, bytes via hex(encode)
      t(s, dir, "documents")
        .select(col("doc_id"), Fingerprint.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    }),

    "q_minhash_lsh" -> ((s, dir) => {
      // HASH-CHECKED (round 9): the whole sketch replays — FNV-1a and
      // the splitmix64 finalizer are public, engine-neutral integer
      // recurrences the oracle reruns in HUGEINT mod-2^64 (split-
      // constant multiply keeps every product inside INT128), so
      // signatures, band candidates, and the exact-Jaccard verify are
      // all driver-checked. est/jaccard project as HALF_UP basis
      // points per the q_contrastive_pairs rule (floor(r4·1e4+0.5) of
      // the 4-digit round == exact-rational HALF_UP; never a raw
      // double compare). The signature min is over SIGNED longs — the
      // oracle mirrors that two's-complement compare explicitly.
      NearDup.minhashPairs(t(s, dir, "documents"), "doc_id", "text",
        numHashes = 64, bands = 16, shingleLen = 3, threshold = 0.6)
        .select(col("id_a"), col("id_b"),
          floor(col("est_jaccard") * 10000.0 + 0.5).cast("long").as("est_bp"),
          floor(col("jaccard") * 10000.0 + 0.5).cast("long").as("jaccard_bp"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    "q_simhash" -> ((s, dir) => {
      // HASH-CHECKED (round 9): the 64-bit sketch is a public integer
      // recurrence (FNV-1a token hash + splitmix64 finalizer + sign
      // tally) the oracle replays in HUGEINT mod-2^64, and the 4×16-bit
      // chunk pigeonhole makes candidate generation COMPLETE for
      // hamming ≤ 3 — so the driver-checked output is simply ALL pairs
      // within the radius, no recall caveat at all (the maxBucket cap
      // never binds at gate SFs; a capped bucket would flip the gate).
      NearDup.simhashPairs(t(s, dir, "documents"), "doc_id", "text", maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "q_ngram_jaccard" -> ((s, dir) => {
      // exact 3-gram Jaccard over given pairs. Output is the integer
      // intersect/union sizes (hash-exact cross-engine; the ratio is
      // theirs to derive) — Jaccard over 64-bit hashed shingles equals
      // Jaccard over the shingle strings the DuckDB oracle builds, modulo
      // negligible collisions.
      val docs = t(s, dir, "documents")
      val pairs = docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b"))
      NearDup.ngramJaccard(docs, pairs, "doc_id", "text", shingleLen = 3)
        .select(col("id_a"), col("id_b"), col("n_inter"), col("n_union"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    "q_embed_neardup" -> ((s, dir) => {
      NearDup.embeddingPairs(t(s, dir, "embeddings"), "vec_id", "embedding",
        minCosine = 0.25, nBits = 32)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "q_ann_ivf" -> ((s, dir) => {
      // HASH-CHECKED (round 9): quantized Lloyd made the TRAINED
      // centroids replayable — the mean update sums exact fixed-point
      // longs (order-independent) and emits one IEEE division per dim
      // (Knn.trainCentroids), so the oracle replays seeds → assignment
      // → the Lloyd round (unnest + BIGINT sums + REAL narrowing) →
      // probes → top-k, the FULL trained-IVF pipeline. Until round 9
      // this was the named rows-only reason for the whole centroid tier
      // (a distributed avg() re-associates per run — unreplayable AND
      // unreproducible at 1000 executors).
      val emb = t(s, dir, "embeddings")
      val centroids = Knn.trainCentroids(emb, nCentroids = 8, iters = 1)
      Knn.ivfTopK(emb, emb.filter(col("vec_id") < 10), centroids, k = 5, nProbe = 2)
        .orderBy(col("query_id"), col("neighbor_id"))
    }),

    "q_ann_recall" -> ((s, dir) => {
      // per-query IVF recall vs exact brute force, hash-checkable: with
      // iters = 0 the centroids stay at their SEEDS (every step-th
      // vector by id — a closed form the DuckDB oracle re-derives; one
      // Lloyd round's distributed avg() is summation-order-dependent,
      // which is why q_ann_ivf itself stays rows-only). The oracle
      // replays seeds → assignment → probes → both top-k sets → the
      // same recall_bp, so the IVF pipeline's SHAPE is oracle-verified
      // even though the trained-centroid variant can't be.
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
      val cents = Knn.trainCentroids(emb, nCentroids = 8, iters = 0)
      val k = 5
      val ivf = Knn.ivfTopK(emb, queries, cents, k = k, nProbe = 2)
      val brute = Knn.bruteForceTopK(emb, queries, k = k)
      val hits = brute.join(ivf, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
      queries.select(col("vec_id").as("query_id"))
        .join(hits, Seq("query_id"), "left")
        .select(col("query_id"),
          (coalesce(col("n_hit"), lit(0L)) * 10000L / k).cast("long").as("recall_bp"))
        .orderBy(col("query_id"))
    }),

    "q_ann_ivfpq" -> ((s, dir) => {
      // HASH-CHECKED from birth: IVFADC (Jégou et al. TPAMI 2011) with
      // every trained stage bit-deterministic — coarse centroids AND the
      // four per-subspace codebooks come from the quantized Lloyd
      // (order-free fixed-point sums, one IEEE division per dim), the
      // residuals are exact float narrowings, and the ADC lookup table
      // is floor(2^16·d²) longs so the reported distance is an exact
      // integer sum. The oracle replays the WHOLE pipeline: coarse
      // seeds → Lloyd → assignment → residuals → per-subspace seeds →
      // Lloyd → codes → probes → query residual → LUT → integer top-k.
      val emb = t(s, dir, "embeddings")
      val coarse = Knn.trainCentroids(emb, nCentroids = 8, iters = 1)
      val books = Pq.trainCodebooks(Pq.residualFrame(emb, coarse),
        m = 4, subDim = 16, k = 8, iters = 1)
      Pq.ivfpqTopK(emb, emb.filter(col("vec_id") < 10), coarse, books,
        subDim = 16, k = 5, nProbe = 2)
        .orderBy(col("query_id"), col("neighbor_id"))
    }),

    "q_ann_wpq" -> ((s, dir) => {
      // whitened PQ — the published retrieval conditioning ahead of
      // quantization (Jégou & Chum ECCV'12; the PCA step OPQ learns a
      // rotation for): project through the trained k=16 whitening
      // basis (bit-deterministic quantized moments + pinned Jacobi),
      // narrow to float, then run the FULL IVFADC machine on the
      // conditioned vectors. Every stage is the composition of two
      // already-hash-checked machines, and the oracle composes their
      // replays: gated whitening literals → REAL projection → coarse
      // Lloyd → residual codebooks → integer ADC top-k.
      val emb = t(s, dir, "embeddings")
      val t16 = graft.similarity.Whitening.fit(emb, "embedding", k = 16)
      val unit = emb.select(col("vec_id"),
        transform(t16(col("embedding")), x => x.cast("float")).as("embedding"))
      val coarse = Knn.trainCentroids(unit, nCentroids = 8, iters = 1)
      val books = Pq.trainCodebooks(Pq.residualFrame(unit, coarse),
        m = 4, subDim = 4, k = 8, iters = 1)
      Pq.ivfpqTopK(unit, unit.filter(col("vec_id") < 10), coarse, books,
        subDim = 4, k = 5, nProbe = 2)
        .orderBy(col("query_id"), col("neighbor_id"))
    }),

    "q_dedup_clusters" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = NearDup.minhashPairs(docs, "doc_id", "text", threshold = 0.6)
        .select(col("id_a"), col("id_b"))
      Clusters.canonicalize(docs.select(col("doc_id").as("id")), pairs)
        .orderBy(col("id"))
    }),

    "q_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val benchmark = docs.filter(col("doc_id") % 50 === 0)
      graft.dedup.Decontaminate.overlaps(
        docs.filter(col("doc_id") % 50 =!= 0), benchmark, "doc_id", "text", n = 8)
        .orderBy(col("corpus_id"), col("bench_id"))
    }),

    "q_shared_passages" -> ((s, dir) => {
      // repeated verbatim passages ACROSS documents (token-granular
      // exact-substring dedup): doc pairs sharing any 8-token gram
      graft.dedup.Decontaminate.selfOverlaps(
        t(s, dir, "documents"), "doc_id", "text", n = 8, minShared = 2)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "q_gram_novelty" -> ((s, dir) => {
      // per-doc boilerplate score: how many of a doc's distinct 8-grams
      // appear in at least one OTHER document — the per-document
      // aggregate complement of q_shared_passages (pair detection).
      // Shape: df aggregation and the grams⨝df join share the gram-hash
      // partitioning (no extra exchange between them), then one doc_id
      // aggregate; docs under 8 tokens have no grams and are absent.
      val grams = t(s, dir, "documents").select(col("doc_id"),
        explode(array_distinct(GramHash.gramHashes(col("text"), 8))).as("g"))
      val df = grams.groupBy(col("g")).agg(count(lit(1)).as("gram_df"))
      grams.join(df, Seq("g"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("gram_df") > 1, 1L).otherwise(0L)).as("n_shared"))
        .orderBy(col("doc_id"))
    }),

    "q_asof_nearest" -> ((s, dir) => {
      // nearest-direction as-of: each event matched to the CLOSER of the
      // user's prior/next purchase aggregate (ties prefer backward);
      // oracle = two native DuckDB ASOF joins + distance CASE, and
      // PropertiesSpec proves all three directions equal the naive
      // definition on random data
      val ev = t(s, dir, "events")
      val r = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("pval"))
      AsOf.joinAsOf(
        ev.select(col("event_id"), col("user_id"), col("ts"), col("value")),
        r, Seq("user_id"), "ts", Seq("pval"), direction = "nearest")
        .select(col("event_id"), col("user_id"), col("asof_pval"))
        .orderBy(col("event_id"))
    }),

    "q_shared_passages_char" -> ((s, dir) => {
      // the char-granular twin: shared spans matched on NORMALIZED
      // character 40-grams, so a verbatim passage pairs up across
      // case/whitespace/tokenization differences (below-token
      // granularity — the remaining gap to suffix-array extents is
      // maximal-span reporting, not detection)
      graft.dedup.Decontaminate.selfOverlapsChar(
        t(s, dir, "documents"), "doc_id", "text", n = 40, minShared = 2)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "q_shared_extents" -> ((s, dir) => {
      // MAXIMAL shared-passage extents: where each duplicated span sits
      // and how long it is — the full suffix-array-style signal (pair +
      // position + length), built from positional grams merged by the
      // gaps-and-islands window; rows-only — NearDupSpec proves exact
      // boundaries on planted spans
      graft.dedup.Decontaminate.selfOverlapExtents(
        t(s, dir, "documents"), "doc_id", "text", n = 8, minLength = 10)
        .orderBy(col("id_a"), col("id_b"), col("start_a"), col("start_b"))
    }),

    "q_training_pipeline" -> ((s, dir) => {
      // the capstone composition: clean → decontaminate → sample →
      // split → pack, end-to-end. Hash-checked since round 9: the
      // split hash is the injected PORTABLE multiplicative hash (the
      // ContrastivePairs move — xxhash64 stays the library default),
      // the clean stage replays per the q_corpus_clean corpus-gap
      // argument, decontamination replays as 13-gram-string joins, and
      // the pack is the q_pack_sequences running-sum replay. The DuckDB
      // oracle runs the ENTIRE pipeline as one CTE chain;
      // TrainingDataSpec still holds the method invariants.
      val docs = t(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 25 === 0)
        .select(col("doc_id"), col("text"))
      val portableU = (c: Column) =>
        pmod(pmod(pmod(c, lit(1000003L)) * 2654435761L + lit(7L * 40503L),
          lit(1000000007L)), lit(1000000L)).cast("double") / 1000000.0
      val (out, _) = graft.pipelines.TrainingData.prepare(docs, bench,
        graft.pipelines.TrainingData.Config(splitHash = portableU))
      out.orderBy(col("doc_id"), col("epoch"))
    }),

    "q_corpus_clean" -> ((s, dir) => {
      graft.pipelines.CorpusClean.run(t(s, dir, "documents"))
        .select(col("doc_id"), col("quality_bp"), col("pred_lang"))
        .orderBy(col("doc_id"))
    }),

    "q_multimodal_frames" -> ((s, dir) => {
      // hash-checked since round 9: the chunk plumbing is pure byte
      // arithmetic (frame count, index, tail truncation) — the oracle
      // replays it from octet_length alone
      Multimodal.sampleFrames(
        Multimodal.withPayload(t(s, dir, "documents").filter(col("doc_id") < 100)))
        .select(col("doc_id"), col("frame_idx"), length(col("frame")).as("frame_bytes"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    "q_multimodal_neardup" -> ((s, dir) => {
      // the multimodal dedup loop closed end-to-end: payload → batched
      // stub decode → stub-embedding near-dup (sign-bit LSH + cosine
      // verify). The 8-bin histogram features are deliberately coarse,
      // so the query bounds itself to a doc subset and a tight cosine —
      // a real encoder swaps into decodeStub and widens both.
      // Hash-checked since round 9: nonnegative features make every
      // sign chunk agree, so the LSH candidate set IS all pairs and the
      // oracle's brute-force cosine replay is exact.
      val feats = Multimodal.decodeFeatures(
        Multimodal.withPayload(t(s, dir, "documents").filter(col("doc_id") < 100)))
      graft.dedup.NearDup.embeddingPairs(
        feats.select(col("doc_id"), col("feat")), "doc_id", "feat",
        minCosine = 0.9999, nBits = 8)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "q_multimodal_phash" -> ((s, dir) => {
      // image near-dup via the REAL perceptual hash (published aHash):
      // deterministic synthesized PNGs in groups of near-identical
      // gradients (the corpus has no binary media), decoded and hashed
      // by the all-integer 8×8 luma average-hash, paired through the
      // same hammingPairs64 bucket machinery text SimHash rides.
      // HASH-CHECKED (round 9, the q_audio_segments move): PNG is
      // LOSSLESS, so the decoded pixels equal the synthesized ones and
      // the aHash is a pure integer function of doc_id (gray gradient ⇒
      // luma == v exactly; patch ⇒ 255; bit c set iff cellSum·64 >
      // totalSum) — the oracle derives every hash closed-form and takes
      // ALL pairs within hamming 3 (the 4×16-bit pigeonhole is complete
      // there), verifying the PNG encode → ImageIO decode → aHash →
      // bucket chain from outside. MultimodalSpec still pins the kernel.
      val payloads = Multimodal.syntheticPngPayloads(
        t(s, dir, "documents").filter(col("doc_id") < 120).select(col("doc_id")))
      val hashed = Multimodal.perceptualHashes(payloads,
        kernel = Multimodal.imageAverageHash)
      graft.dedup.NearDup.hammingPairs64(hashed, maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "q_audio_segments" -> ((s, dir) => {
      // audio VAD primitive end-to-end: REAL WAV containers decode to
      // windowed EXACT-integer energy rows, then gaps-and-islands over
      // non-silent windows yields speech/tone segments. HASH-CHECKED
      // (round 9): the planted layout is a PURE FUNCTION of doc_id
      // (silence 2+id%3 → tone 3+id%2 → silence 2 → tone 4 → silence 1,
      // every segment 256-aligned, ±12000 square wave ⇒ 36,864,000,000
      // energy per tone window), so the oracle recomputes the exact
      // island set closed-form — a break ANYWHERE in the RIFF container
      // → javax.sound decode → windowing → islands chain flips the gate.
      val payloads = Multimodal.syntheticWavPayloads(
        t(s, dir, "documents").filter(col("doc_id") < 60).select(col("doc_id")))
      val prof = Multimodal.audioEnergyProfile(payloads)
      val w = Window.partitionBy(col("doc_id")).orderBy(col("win_idx"))
      prof.filter(!col("is_silence"))
        .withColumn("__prev", lag(col("win_idx"), 1).over(w))
        .withColumn("__new",
          (col("__prev").isNull || col("win_idx") > col("__prev") + 1).cast("long"))
        .withColumn("__seg", sum(col("__new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("doc_id"), col("__seg"))
        .agg(min(col("win_idx")).as("seg_start"), max(col("win_idx")).as("seg_end"),
          count(lit(1)).as("n_windows"), sum(col("energy_q")).as("energy_q"))
        .select(col("doc_id"), col("seg_start"), col("seg_end"),
          col("n_windows"), col("energy_q"))
        .orderBy(col("doc_id"), col("seg_start"))
    }),

    "q_multimodal_features" -> ((s, dir) => {
      // the STUB decode is deterministic integer arithmetic over the
      // UTF-8 payload bytes, so the whole feature row replays in SQL:
      // verify checksum + EVERY histogram bin + EVERY float feature
      // (float32 division is IEEE-identical cross-engine — REAL/REAL in
      // DuckDB, Float/Int on the JVM — and every float32 converts to
      // double exactly). Sentinel rows (null/empty payload) carry
      // checksum 0 and empty arrays → NULL bins via try_element_at.
      Multimodal.decodeFeatures(Multimodal.withPayload(t(s, dir, "documents")))
        .select(Seq(col("doc_id"), col("checksum")) ++
          (0 until 8).map(j =>
            try_element_at(col("byte_histogram"), lit(j + 1)).as(s"h$j")) ++
          (0 until 8).map(j =>
            try_element_at(col("feat"), lit(j + 1)).cast("double").as(s"f$j")): _*)
        .orderBy(col("doc_id"))
    }),

    // ── Lexical indexing / retrieval (sparse complement to embedding ANN) ──

    "q_tfidf" -> ((s, dir) => {
      // per-doc top-3 terms by quantized TF-IDF (exact BIGINT scoring —
      // ln(N/df) is libm-hazardous cross-engine; tf·10⁴·N DIV df is not)
      graft.pipelines.Lexical.tfIdfTopK(t(s, dir, "documents"), "doc_id", "text", k = 3)
        .orderBy(col("doc_id"), col("rank_in_group"))
    }),

    "q_inverted_index" -> ((s, dir) => {
      // posting lists for terms in a df band; the band is counted FIRST
      // so the collect state is ≤ maxDf ids by construction — a
      // stopword-tier term never buffers a corpus-sized list. Band scales
      // with the corpus: df ≤ 80% of docs (batch/small/scan-tier terms
      // saturate the synthetic corpus and fall outside).
      val docs = t(s, dir, "documents")
      val n = docs.filter(length(trim(col("text"))) > 0).count()
      graft.pipelines.Lexical.invertedIndex(docs, "doc_id", "text",
        minDf = 1, maxDf = n * 8 / 10)
        .orderBy(col("term"))
    }),

    "q_lexical_search" -> ((s, dir) => {
      // keyword retrieval: top-20 docs for a 4-term query, summed
      // quantized TF-IDF; corpus filters to query-term hits before any
      // aggregation, global top-k via TakeOrderedAndProject
      graft.pipelines.Lexical.searchTopK(t(s, dir, "documents"), "doc_id", "text",
        Seq("spark", "merge", "vector", "dup"), k = 20)
        .orderBy(col("rank"))
    }),

    // ── Sequence audit (feed-completeness pre-flight) ─────────────────

    "q_sequence_gaps" -> ((s, dir) => {
      // missing l_orderkey ranges (orders with no lineitems): the
      // completeness audit before a full-sync delete trusts a feed.
      // Bucketed arithmetic partitioning — never lag() over ONE global
      // partition (see operators/Sequencing.scala).
      graft.operators.Sequencing.gaps(t(s, dir, "lineitem"), "l_orderkey")
        .orderBy(col("gap_start"))
    }),

    "q_sequence_islands" -> ((s, dir) => {
      // the dual view: contiguous loaded ranges with distinct-key counts
      graft.operators.Sequencing.islands(t(s, dir, "lineitem"), "l_orderkey")
        .orderBy(col("island_start"))
    }),

    "q_weighted_percentile" -> ((s, dir) => {
      // weighted p50/p90 of line price (weight = quantity) per return
      // flag: discrete weighted-quantile selection (smallest value whose
      // cumulative weight covers p% of the total) — exact integers end
      // to end; THREE groups would hot-partition a plain window, so the
      // cumulative weights run through the per-group RANGED running sum
      val v = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"),
          floor(col("l_extendedprice") * 100.0 + 0.5).cast("long").as("cents"))
        .agg(sum(col("l_quantity").cast("long")).as("w"))
      val cum = RunningTotals.groupedRunningSum(v, Seq("l_returnflag"),
        Seq(col("cents").asc), "w", "cw")
      val tot = v.groupBy(col("l_returnflag")).agg(sum(col("w")).as("tw"))
      cum.join(broadcast(tot), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"))
        .agg(min(when(col("cw") * 100 >= col("tw") * 50, col("cents"))).as("wp50_cents"),
          min(when(col("cw") * 100 >= col("tw") * 90, col("cents"))).as("wp90_cents"))
        .orderBy(col("l_returnflag"))
    }),

    "q_corr_matrix" -> ((s, dir) => {
      // pairwise Pearson correlation of the four line measures from ONE
      // exact-moment aggregate (the q_trend_slope recipe generalized):
      // decimal sums are order-independent and exact; the correlation
      // finish is one pinned-parenthesization double expression, 4-dp
      // quantized
      val df = t(s, dir, "lineitem").select(
        col("l_quantity").cast("long").as("q"),
        floor(col("l_extendedprice") * 100.0 + 0.5).cast("long").as("p"),
        floor(col("l_discount") * 10000.0 + 0.5).cast("long").as("d"),
        floor(col("l_tax") * 10000.0 + 0.5).cast("long").as("x"))
      def S(c: Column) = sum(c.cast("decimal(38,0)"))
      val vars = Seq("q", "p", "d", "x")
      val moments = df.agg(count(lit(1)).as("n"),
        vars.map(v => S(col(v)).as(s"s_$v")) ++
          (for (a <- vars; b <- vars if a <= b)
            yield S(col(a) * col(b)).as(s"s_${a}${b}")): _*)
        .localCheckpoint(true) // one row, referenced once per pair
      def corr(a: String, b: String): Column = {
        def D(name: String) = col(name).cast("double")
        floor((D("n") * D(s"s_$a$b") - D(s"s_$a") * D(s"s_$b")) /
          sqrt((D("n") * D(s"s_$a$a") - D(s"s_$a") * D(s"s_$a")) *
            (D("n") * D(s"s_$b$b") - D(s"s_$b") * D(s"s_$b"))) * 10000.0 + 0.5)
          .cast("long")
      }
      (for (a <- vars; b <- vars if a < b)
        yield moments.select(lit(a).as("var_x"), lit(b).as("var_y"),
          corr(a, b).as("corr_bp")))
        .reduce(_ unionAll _)
        .orderBy(col("var_x"), col("var_y"))
    }),

    "q_item_neighbors_maintained" -> ((s, dir) => {
      // the CF model's count tables maintained INCREMENTALLY: orders
      // divisible by 7 arrive as the delta; changed users' capped sets
      // diff into ± adjustments (O(changed·cap²), no corpus rescan) and
      // scoring from the maintained state must equal the full rebuild —
      // registered against q_item_neighbors' VERBATIM oracle.
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      // the fact⨝header join feeds base, changed-user discovery, AND the
      // changed-user recompute — pin it once instead of replaying the
      // join per consumer (bench: the query's dominant cost)
      val full = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("user"), col("l_partkey").as("item"),
          col("o_orderkey"))
        .localCheckpoint(true)
      def inter(df: DataFrame) = df.groupBy(col("user"), col("item"))
        .agg(countDistinct(col("o_orderkey")).as("strength"))
      val base = full.filter(col("o_orderkey") % 7 =!= 0)
      val changedUsers = full.filter(col("o_orderkey") % 7 === 0)
        .select(col("user")).distinct()
      val oldChanged = inter(base.join(changedUsers, Seq("user"), "left_semi"))
      val newChanged = inter(full.join(changedUsers, Seq("user"), "left_semi"))
      val (p0, i0) = graft.similarity.ItemSim.counts(inter(base),
        "user", "item", "strength", maxUserItems = 50)
      val (pm, im) = graft.similarity.ItemSim.maintainCounts(p0, i0,
        oldChanged, newChanged, "user", "item", "strength", maxUserItems = 50)
      graft.similarity.ItemSim.neighborsFromCounts(pm, im, k = 10)
        .orderBy(col("item"), col("rank"))
    }),

    "q_mixture_alloc" -> ((s, dir) => {
      // EXACT-N mixture sampling: a 300-doc budget allocated across
      // sources by largest remainder (parts sum to exactly 300 at every
      // SF — rate-based sampling can only promise N in expectation),
      // then each source takes its quota deterministically by the
      // portable multiplicative hash. Composes Allocate + the hash-
      // order pick; one window per stage.
      val d = t(s, dir, "documents").select(col("doc_id"), col("source"))
      val wts = d.groupBy(col("source")).agg(count(lit(1)).as("w"))
        .withColumn("k", lit(1)).withColumn("amt", lit(300L))
      val quota = Allocate.largestRemainder(wts, Seq("k"), "w", "amt",
          tiebreak = Seq("source"), outCol = "n_take")
        .select(col("source"), col("n_take"))
      val h = (col("doc_id") % 1048573L) * 2654435761L % 1000000L
      val rankW = Window.partitionBy(col("source"))
        .orderBy(h.asc, col("doc_id").asc)
      d.withColumn("__r", row_number().over(rankW))
        .join(broadcast(quota), Seq("source"))
        .filter(col("__r") <= col("n_take"))
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    }),

    "q_langmix" -> ((s, dir) => {
      // mixed-language-document audit: language-id per 25-token chunk,
      // then per-doc chunk count / language switches / distinct
      // languages — the curation signal chunk-level filters need that
      // whole-doc lang-id (q_lang_id) averages away
      val docs = t(s, dir, "documents").filter(length(trim(col("text"))) > 0)
      val ch = docs.select(col("doc_id"),
          posexplode(TextFunctions.chunkTokens(col("text"), size = 25, overlap = 0))
            .as(Seq("chunk_idx", "chunk")))
        .withColumn("cl", TextFunctions.langId(col("chunk")))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("chunk_idx"))
      ch.withColumn("__prev", lag(col("cl"), 1).over(w))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("__prev").isNotNull && col("cl") =!= col("__prev"), 1L)
            .otherwise(0L)).as("n_switches"),
          countDistinct(col("cl")).as("n_langs"))
        .orderBy(col("doc_id"))
    }),

    "q_skyline" -> ((s, dir) => {
      // Pareto frontier (skyline operator, Börzsönyi ICDE'01): parts no
      // other part beats on BOTH price (min) and size (max). Sort-based:
      // collapse to price levels, one EXCLUSIVE global running max over
      // the levels (ranged two-pass — never a one-task window), keep
      // level maxima that beat every cheaper level.
      val p = t(s, dir, "part").select(col("p_partkey"),
        floor(col("p_retailprice") * 100.0 + 0.5).cast("long").as("price_q"),
        col("p_size").cast("long").as("p_size"))
      val levels = p.groupBy(col("price_q")).agg(max(col("p_size")).as("lvl_max"))
      val lv = RunningTotals.globalRunningMaxExclusive(levels,
        Seq(col("price_q").asc), "lvl_max", "excl_max")
      p.join(lv, Seq("price_q"))
        .filter(col("p_size") === col("lvl_max") &&
          (col("excl_max").isNull || col("lvl_max") > col("excl_max")))
        .select(col("p_partkey"), col("price_q"), col("p_size"))
        .orderBy(col("p_partkey"))
    }),

    "q_fifo_layers" -> ((s, dir) => {
      // FIFO lot consumption: returns restock, everything else issues;
      // cumulative-range overlap turns the sequential ledger walk into
      // one equi-join (operators/Ledger.scala)
      val mv = t(s, dir, "lineitem").select(
        col("l_partkey"), col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long").as("q"),
        (col("l_returnflag") === "R").as("is_receipt"))
      Ledger.fifoMatch(mv, Seq("l_partkey"),
          Seq("l_shipdate", "l_orderkey", "l_linenumber"), "q", "is_receipt")
        .orderBy(col("l_partkey"), col("r_seq"), col("i_seq"))
    }),

    "q_rfm" -> ((s, dir) => {
      // RFM segmentation: per-customer recency/frequency/monetary
      // quintile scores. Scores come from exact arithmetic rank binning
      // floor((rank-1)*5/n)+1 (NOT SQL ntile's uneven-bucket rule), and
      // every global rank runs through the range-partitioned two-pass
      // machine (operators/RunningTotals.scala) — no one-task window.
      val o = t(s, dir, "orders")
      val ref = o.agg(max(col("o_orderdate")).as("__ref"),
        count_distinct(col("o_custkey")).as("__n"))
      val base = o.groupBy(col("o_custkey")).agg(
          max(col("o_orderdate")).as("__last"),
          count(lit(1)).as("frequency"),
          sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long")).as("monetary_q"))
        .crossJoin(broadcast(ref))
        .withColumn("recency_days", datediff(col("__ref"), col("__last")).cast("long"))
      val ranked = RunningTotals.globalRank(
        RunningTotals.globalRank(
          RunningTotals.globalRank(base,
            Seq(col("recency_days").asc, col("o_custkey").asc), "__rr"),
          Seq(col("frequency").desc, col("o_custkey").asc), "__rf"),
        Seq(col("monetary_q").desc, col("o_custkey").asc), "__rm")
      def score(rank: Column, n: Column): Column =
        (lit(5L) - call_function("div", (rank - 1L) * 5L, n)).cast("int")
      ranked
        .withColumn("r_score", score(col("__rr"), col("__n")))
        .withColumn("f_score", score(col("__rf"), col("__n")))
        .withColumn("m_score", score(col("__rm"), col("__n")))
        .select(col("o_custkey"), col("recency_days"), col("frequency"),
          col("monetary_q"), col("r_score"), col("f_score"), col("m_score"),
          (col("r_score") * 100 + col("f_score") * 10 + col("m_score")).as("rfm"))
        .orderBy(col("o_custkey"))
    }),

    "q_abc_class" -> ((s, dir) => {
      // ABC inventory classification: parts ranked by revenue, class A
      // = first 80% of cumulative revenue, B to 95%, C the tail — the
      // Pareto report every merch team runs. Global cumulative share
      // through the ranged two-pass cumsum; boundaries compared in
      // EXACT integers (cum*100 <= tot*80).
      val rev = t(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(floor(col("l_extendedprice") * 100.0 + 0.5).cast("long")).as("cents"))
      val tot = rev.agg(sum(col("cents")).as("__tot"))
      RunningTotals.globalRunningSum(rev,
          Seq(col("cents").desc, col("l_partkey").asc), "cents", "cum_cents")
        .crossJoin(broadcast(tot))
        .withColumn("abc",
          when(col("cum_cents") * 100 <= col("__tot") * 80, "A")
            .when(col("cum_cents") * 100 <= col("__tot") * 95, "B")
            .otherwise("C"))
        .select(col("l_partkey"), col("cents"), col("cum_cents"), col("abc"))
        .orderBy(col("l_partkey"))
    }),

    "q_churn" -> ((s, dir) => {
      // weekly churn: users active in ISO week w with no event in w+1
      // (final week excluded — its successor is unobserved). Rate in
      // exact integer basis points.
      val act = t(s, dir, "events").filter(col("user_id").isNotNull)
        .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk"))
        .distinct()
      val nxt = act.select(col("user_id"), date_sub(col("wk"), 7).as("wk"))
      val churned = act.join(nxt, Seq("user_id", "wk"), "left_anti")
        .groupBy(col("wk")).agg(count(lit(1)).as("n_churned"))
      val maxWk = act.agg(max(col("wk")).as("__max"))
      act.groupBy(col("wk")).agg(count(lit(1)).as("n_active"))
        .join(churned, Seq("wk"), "left")
        .na.fill(0L, Seq("n_churned"))
        .crossJoin(broadcast(maxWk))
        .filter(col("wk") < col("__max"))
        .select(date_format(col("wk"), "yyyy-MM-dd").as("week"),
          col("n_active"), col("n_churned"),
          call_function("div", col("n_churned") * 10000L, col("n_active"))
            .as("churn_bp"))
        .orderBy(col("week"))
    }),

    "q_item_neighbors" -> ((s, dir) => {
      // item-item collaborative filtering: top-10 cosine neighbors per
      // part from customer purchase sets, history capped at 50 items
      // per user BEFORE pairing (similarity/ItemSim.scala — the pair
      // explosion bound)
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      val inter = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey").as("user"), col("l_partkey").as("item"))
        .agg(countDistinct(col("l_orderkey")).as("strength"))
      graft.similarity.ItemSim.neighbors(inter, "user", "item", "strength",
          k = 10, maxUserItems = 50)
        .orderBy(col("item"), col("rank"))
    }),

    "q_triangle_count" -> ((s, dir) => {
      // co-purchase affinity density: triangles in the parts-bought-
      // together graph, per-node counts (degree-ordered node-iterator,
      // operators/Graphs.scala — wedge work bounded O(m^1.5))
      val li = t(s, dir, "lineitem")
      val pairs = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
      Graphs.triangleCounts(Graphs.canonicalEdges(pairs, "pa", "pb"))
        .orderBy(col("node"))
    }),

    "q_quantile_normalize" -> ((s, dir) => {
      // quantile normalization (Bolstad 2003, the batch-effect
      // remover): each document's length maps to the POOLED
      // distribution's value at its within-source percentile — one
      // step past q_score_calibrate (which stops at the percentile).
      // All arithmetic is exact integer rank selection: within-source
      // pct by the ((rk−1)·10⁴) div (n−1) rule, pooled value by the
      // range-partitioned global rank + ONE equi-join on the selected
      // rank — element selection, no interpolation to split engines.
      val d = t(s, dir, "documents").select(col("doc_id"), col("source"),
        col("n_chars").cast("long").as("n_chars"))
      // per-source rank via the RANGED grouped machine (source
      // cardinality is LOW — a plain per-source window funnels n/|src|
      // rows through one task at 100 TB), counts from one keyed agg
      val srcN = d.groupBy(col("source")).agg(count(lit(1)).as("__n"))
      val withPct = RunningTotals.groupedRunningSum(
          d.withColumn("__one", lit(1L)), Seq("source"),
          Seq(col("n_chars").asc, col("doc_id").asc), "__one", "__rk")
        .join(broadcast(srcN), Seq("source"))
        .withColumn("pct_bp",
          when(col("__n") === 1, lit(5000L))
            .otherwise(expr("((__rk - 1) * 10000) DIV (__n - 1)")))
      val pooled = RunningTotals.globalRank(
        d.select(col("n_chars").as("pool_chars"), col("doc_id").as("pool_id")),
        Seq(col("pool_chars").asc, col("pool_id").asc), "grk")
        .select(col("grk"), col("pool_chars"))
      val total = d.agg(count(lit(1)).as("nn"))
      withPct.crossJoin(broadcast(total))
        .withColumn("grk", expr("(pct_bp * (nn - 1)) DIV 10000 + 1"))
        .join(pooled, Seq("grk"))
        .select(col("doc_id"), col("source"), col("n_chars"),
          col("pct_bp"), col("pool_chars").as("norm_chars"))
        .orderBy(col("doc_id"))
    }),

    "q_seasonal_anomaly" -> ((s, dir) => {
      // the decomposition's consumer: days whose residual is a robust
      // outlier — |resid − median(resid)| > 3·MAD, DISCRETE lower
      // medians (the q_mad_outliers element-selection rule), over the
      // exact-integer residuals of q_seasonal's decomposition. The
      // full-window days only; all compares exact BIGINT.
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
          .as("rev_c"))
        .withColumn("dow",
          (datediff(col("d"), to_date(lit("1970-01-01"))) % 7).cast("long"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("d")))
          .cast("long"))
      val resid = Stats.decomposeAdditive(daily, "rn", "dow", "rev_c", window = 7)
        .filter(col("resid").isNotNull)
        .select(col("d"), col("rev_c"), col("resid"))
      val n = resid.agg(count(lit(1)).as("n"))
      val med = resid.crossJoin(broadcast(n))
        .withColumn("__rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("resid"), col("d"))))
        .filter(col("__rk") === expr("(n + 1) DIV 2"))
        .select(col("resid").as("med"))
      val withDev = resid.crossJoin(broadcast(med))
        .withColumn("dev", abs(col("resid") - col("med")))
      val mad = withDev.crossJoin(broadcast(n))
        .withColumn("__rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("dev"), col("d"))))
        .filter(col("__rk") === expr("(n + 1) DIV 2"))
        .select(col("dev").as("mad"))
      withDev.crossJoin(broadcast(mad))
        .filter(col("dev") > lit(3L) * col("mad"))
        .select(date_format(col("d"), "yyyy-MM-dd").as("d"), col("rev_c"),
          col("resid"), col("dev"), col("mad"))
        .orderBy(col("d"))
    }),

    "q_feature_matrix" -> ((s, dir) => {
      // one-pass feature engineering: the per-customer model-input row
      // (order counts, exact spend stats, recency, active-month span,
      // priority mix) from ONE grouped aggregate over orders — the
      // feature-store extraction pattern; a reference date rides a
      // broadcast 1-row frame, never a driver-side constant pulled
      // from data.
      val o = t(s, dir, "orders").select(col("o_custkey"),
        to_date(col("o_orderdate")).as("d"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("cents"),
        col("o_orderpriority"))
      val ref = o.agg(max(col("d")).as("ref_d"))
      o.crossJoin(broadcast(ref))
        .groupBy(col("o_custkey"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("cents")).as("total_c"),
          min(col("cents")).as("min_c"),
          max(col("cents")).as("max_c"),
          expr("CAST(sum(cents) DIV count(1) AS BIGINT)").as("avg_c"),
          min(datediff(col("ref_d"), col("d"))).cast("long").as("recency_d"),
          countDistinct(trunc(col("d"), "mon")).as("active_months"),
          sum(when(col("o_orderpriority").startsWith("1"), 1L).otherwise(0L))
            .as("n_urgent"))
        .orderBy(col("o_custkey"))
    }),

    "q_assoc_rules" -> ((s, dir) => {
      // association rules a→b from the basket pair supports:
      // confidence = (10⁴·n_ab) div n_a and lift = (10⁴·n_ab·N) div
      // (n_a·n_b) — BOTH exact integer floor divisions, no float
      // anywhere; rules emitted in both directions, pruned at
      // support ≥ 3 and confidence ≥ 5%. Same single basket shuffle
      // as q_basket_affinity; the rule finish is per-pair arithmetic.
      val baskets = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
        .localCheckpoint(true) // pairs + supports + N read it
      val pairs = baskets.select(explode(expr(
          "flatten(transform(parts, (a, i) -> " +
            "transform(slice(parts, i + 2, size(parts)), " +
            "b -> named_struct('part_a', a, 'part_b', b))))")).as("p"))
        .groupBy(col("p.part_a").as("part_a"), col("p.part_b").as("part_b"))
        .agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 3L)
      val supp = baskets.select(explode(col("parts")).as("part"))
        .groupBy(col("part")).agg(count(lit(1)).as("n"))
      val nb = baskets.agg(count(lit(1)).as("nbask"))
      val both = pairs
        .unionByName(pairs.select(col("part_b").as("part_a"),
          col("part_a").as("part_b"), col("n_ab")))
      both
        .join(supp.withColumnRenamed("part", "part_a")
          .withColumnRenamed("n", "n_a"), Seq("part_a"))
        .join(supp.withColumnRenamed("part", "part_b")
          .withColumnRenamed("n", "n_b"), Seq("part_b"))
        .crossJoin(broadcast(nb))
        .withColumn("conf_bp", expr("(10000 * n_ab) DIV n_a"))
        .filter(col("conf_bp") >= 500L)
        .withColumn("lift_bp", expr("(10000 * n_ab * nbask) DIV (n_a * n_b)"))
        .select(col("part_a"), col("part_b"), col("n_ab"),
          col("conf_bp"), col("lift_bp"))
        .orderBy(col("part_a"), col("part_b"))
    }),

    "q_price_index" -> ((s, dir) => {
      // Laspeyres / Paasche / Fisher price indices, 1996 base → 1997:
      // per-part-year unit prices floor to exact cents (rev div qty),
      // index numerators/denominators are exact BIGINT basket sums,
      // Fisher is ONE sqrt over the two quantized indices — the
      // econ-staple report with no float before the final quantize.
      val li = t(s, dir, "lineitem")
        .withColumn("yr", year(to_date(col("l_shipdate"))))
        .filter(col("yr").isin(1996, 1997))
        .groupBy(col("l_partkey"), col("yr"))
        .agg(sum(floor(col("l_extendedprice") * 100.0 + 0.5).cast("long"))
          .as("rev_c"), sum(col("l_quantity").cast("long")).as("qty"))
        .withColumn("price_q", expr("rev_c DIV qty"))
      val y0 = li.filter(col("yr") === 1996)
        .select(col("l_partkey"), col("price_q").as("p0"), col("qty").as("q0"))
      val y1 = li.filter(col("yr") === 1997)
        .select(col("l_partkey"), col("price_q").as("p1"), col("qty").as("q1"))
      val j = y0.join(y1, Seq("l_partkey"))
      val m = j.agg(count(lit(1)).as("n_parts"),
        sum(col("p1") * col("q0")).as("l_num"),
        sum(col("p0") * col("q0")).as("l_den"),
        sum(col("p1") * col("q1")).as("p_num"),
        sum(col("p0") * col("q1")).as("p_den"))
      m.select(col("n_parts"),
        expr("(10000 * l_num) DIV l_den").as("laspeyres_bp"),
        expr("(10000 * p_num) DIV p_den").as("paasche_bp"),
        floor(sqrt(expr("CAST((10000 * l_num) DIV l_den AS DOUBLE)") *
          expr("CAST((10000 * p_num) DIV p_den AS DOUBLE)")) + 0.5)
          .cast("long").as("fisher_bp"))
    }),

    "q_anova" -> ((s, dir) => {
      // one-way ANOVA F across order priorities — does mean order
      // value differ by priority class? Per-group exact moments in one
      // aggregate; per-group double terms quantized before the integer
      // sum (the order-independent alternative to a float
      // accumulation); completes the test family (chi2/t/U/F).
      val o = t(s, dir, "orders").select(col("o_orderpriority"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("cents"))
      Stats.anovaF(o, "o_orderpriority", "cents")
    }),

    "q_kruskal" -> ((s, dir) => {
      // Kruskal-Wallis H over the same grouping — the rank-based
      // (distribution-free) k-group test; tied ranks from the same
      // value-level ranged cumsum as q_mann_whitney, tie-corrected.
      val o = t(s, dir, "orders").select(col("o_orderpriority"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("cents"))
      Stats.kruskalWallis(o, "o_orderpriority", "cents")
    }),

    "q_woe" -> ((s, dir) => {
      // weight-of-evidence encoding + information value per market
      // segment against the high-value-customer flag — the credit-
      // scoring feature-engineering staple. Counts exact; each WOE is
      // ONE ln of a ratio of exact integers (the psi-family floor
      // rule, +0.5 Laplace smoothing as doubled-integer halves); IV
      // accumulates quantized per-category terms in BIGINT.
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val hv = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(max(when(col("o_totalprice") > 300000.0, 1L).otherwise(0L))
          .as("y"))
      val j = cust.join(hv, col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(sum(col("y")).as("g"),
          sum(lit(1L) - col("y")).as("b"))
      val tot = j.agg(sum(col("g")).as("gt"), sum(col("b")).as("bt"))
      val withTot = j.crossJoin(broadcast(tot))
      val woe = floor(
        log((lit(2L) * col("g") + 1L).cast("double") * col("bt").cast("double") /
          ((lit(2L) * col("b") + 1L).cast("double") * col("gt").cast("double")))
          * 10000.0 + 0.5).cast("long")
      withTot
        .withColumn("woe_bp", woe)
        .withColumn("pg_bp", expr("(10000 * g) DIV gt"))
        .withColumn("pb_bp", expr("(10000 * b) DIV bt"))
        .withColumn("iv_term_q", (col("pg_bp") - col("pb_bp")) * col("woe_bp"))
        .withColumn("iv_q", sum(col("iv_term_q")).over(Window.partitionBy(lit(1))))
        .select(col("c_mktsegment"), col("g").as("n_good"), col("b").as("n_bad"),
          col("woe_bp"), col("iv_q"))
        .orderBy(col("c_mktsegment"))
    }),

    "q_did" -> ((s, dir) => {
      // difference-in-differences: BUILDING-segment customers
      // (treatment) vs the rest, pre/post 1998 — the causal-inference
      // workhorse when randomization isn't available (ab/cuped's
      // observational sibling). Eight conditional moments in ONE
      // aggregation pass; exact floored cell means; the DiD estimate
      // is one pinned double expression.
      val o = t(s, dir, "orders")
        .join(t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(
          when(col("c_mktsegment") === "BUILDING", lit(1L)).otherwise(lit(0L))
            .as("treat"),
          when(to_date(col("o_orderdate")) >= lit("1998-01-01"), lit(1L))
            .otherwise(lit(0L)).as("post"),
          floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("cents"))
      def cell(tr: Int, po: Int, c: Column) =
        sum(when(col("treat") === tr && col("post") === po, c).otherwise(lit(0L))
          .cast("decimal(38,0)"))
      val m = o.agg(
        cell(1, 0, lit(1L)).as("nt0"), cell(1, 1, lit(1L)).as("nt1"),
        cell(0, 0, lit(1L)).as("nc0"), cell(0, 1, lit(1L)).as("nc1"),
        cell(1, 0, col("cents")).as("st0"), cell(1, 1, col("cents")).as("st1"),
        cell(0, 0, col("cents")).as("sc0"), cell(0, 1, col("cents")).as("sc1"))
      def D(c: Column) = c.cast("double")
      def meanQ(sc: Column, n: Column) = ((sc - pmod(sc, n)) / n).cast("long")
      val did = (D(col("st1")) / D(col("nt1")) - D(col("st0")) / D(col("nt0"))) -
        (D(col("sc1")) / D(col("nc1")) - D(col("sc0")) / D(col("nc0")))
      m.select(
        col("nt0").cast("long").as("nt0"), col("nt1").cast("long").as("nt1"),
        col("nc0").cast("long").as("nc0"), col("nc1").cast("long").as("nc1"),
        meanQ(col("st0"), col("nt0")).as("mean_t_pre_q"),
        meanQ(col("st1"), col("nt1")).as("mean_t_post_q"),
        meanQ(col("sc0"), col("nc0")).as("mean_c_pre_q"),
        meanQ(col("sc1"), col("nc1")).as("mean_c_post_q"),
        floor(did * 100.0 + 0.5).cast("long").as("did_q"))
    }),

    "q_nelson_aalen" -> ((s, dir) => {
      // cumulative-hazard sibling of q_survival_km (Nelson-Aalen):
      // H(t) = Σ d/n over event times — per-step hazards quantize as
      // (10⁶·d) div n (exact integers), the cumulative sum is plain
      // BIGINT; no recursion anywhere, so the oracle is one window.
      val byCust = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(min(to_date(col("o_orderdate"))).as("first_d"),
          max(to_date(col("o_orderdate"))).as("last_d"))
      val mx = byCust.agg(max(col("last_d")).as("__mx"))
      val subj = byCust.crossJoin(broadcast(mx)).select(
        datediff(col("last_d"), col("first_d")).cast("long").as("duration"),
        when(datediff(col("__mx"), col("last_d")) >= 365, lit(1L))
          .otherwise(lit(0L)).as("event"))
      val byT = subj.groupBy(col("duration"))
        .agg(sum(col("event")).cast("long").as("d"),
          sum(lit(1L) - col("event")).cast("long").as("c"))
      val tot = subj.agg(count(lit(1)).cast("long").as("__total"))
      val w = Window.partitionBy(lit(1)).orderBy(col("duration"))
        .rowsBetween(Window.unboundedPreceding, -1)
      byT.crossJoin(broadcast(tot))
        .withColumn("n_risk",
          col("__total") - coalesce(sum(col("d") + col("c")).over(w), lit(0L)))
        .filter(col("d") > 0)
        .withColumn("h_step", expr("(1000000 * d) DIV n_risk"))
        .withColumn("hazard_q", sum(col("h_step")).over(
          Window.partitionBy(lit(1)).orderBy(col("duration"))
            .rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("duration"), col("n_risk"), col("d").as("n_events"),
          col("hazard_q"))
        .orderBy(col("duration"))
    }),

    "q_isotonic" -> ((s, dir) => {
      // isotonic calibration curve (PAV): monotone fit of the
      // high-value-order rate on the customer's account-balance band —
      // the calibration step every score pipeline runs before
      // thresholding. Rows collapse to one (band, n, Σy) level first;
      // the O(m) PAV stack pools on the driver with EXACT rational
      // means. The oracle replays the fit through its min-max closed
      // form (fitted = max-min segment mean, pools = equal-fitted
      // runs) with one exact scaled fraction key; StatsSpec proves
      // monotonicity, mean preservation, and the textbook pooling case.
      val cust = t(s, dir, "customer").select(col("c_custkey"),
        floor(col("c_acctbal") / 100).cast("long").as("band"))
      val hv = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(max(when(col("o_totalprice") > 300000.0, 1L).otherwise(0L))
          .as("y"))
      Stats.isotonic(
          cust.join(hv, col("c_custkey") === col("o_custkey"))
            .select(col("band"), col("y")),
          "band", "y")
        .orderBy(col("x_lo"))
    }),

    "q_mde" -> ((s, dir) => {
      // experiment power pre-flight: the minimum detectable effect at
      // alpha=0.05 / power=0.8 for the CURRENT arm sizes and pooled
      // variance — the "is this test even worth running" one-rower.
      // Normal quantiles are pinned literals on both engines.
      val o = t(s, dir, "orders").select(
        when((col("o_custkey") % 1048573L) * 2654435761L % 1000000L < 500000L,
          lit(0L)).otherwise(lit(1L)).as("variant"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("cents"))
      def S(c: Column) = sum(c.cast("decimal(38,0)"))
      val m = o.agg(
        S(when(col("variant") === 0, 1L).otherwise(0L)).as("n0"),
        S(when(col("variant") === 1, 1L).otherwise(0L)).as("n1"),
        S(col("cents")).as("sx"), S(col("cents") * col("cents")).as("sxx"))
      def D(c: Column) = c.cast("double")
      val n = D(col("n0")) + D(col("n1"))
      val varP = (n * D(col("sxx")) - D(col("sx")) * D(col("sx"))) /
        (n * (n - lit(1.0)))
      val mde = lit(1.959963984540054 + 0.8416212335729143) *
        sqrt(varP * (lit(1.0) / D(col("n0")) + lit(1.0) / D(col("n1"))))
      m.select(col("n0").cast("long").as("n0"), col("n1").cast("long").as("n1"),
        floor(sqrt(varP) * 100.0 + 0.5).cast("long").as("sigma_q"),
        floor(mde * 100.0 + 0.5).cast("long").as("mde_q"))
    }),

    "q_holt_winters" -> ((s, dir) => {
      // the forecasting trio's capstone (ewma → holt → Holt-Winters):
      // level + trend + a 12-slot seasonal ring per nation, exact
      // floor-division recurrence, O(period) state in the same
      // one-keyed-shuffle machine. Hash-checked since round 9: the
      // seasonal ring rides the recursive CTE as a LIST column (slice
      // surgery per step), so the full triple recurrence replays;
      // RecurrencesSpec still replays the sequential definition.
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val mon = t(s, dir, "orders")
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nation"),
          trunc(to_date(col("o_orderdate")), "mon").as("month"))
        .agg(sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
          .as("rev_c"))
      Recurrences.holtWinters(mon, Seq("nation"), Seq("month"), "rev_c",
          period = 12, 1L, 4L, 1L, 4L, 1L, 4L)
        .select(col("nation"), date_format(col("month"), "yyyy-MM").as("month"),
          col("rev_c"), col("hw_q"))
        .orderBy(col("nation"), col("month"))
    }),

    "q_theilsen" -> ((s, dir) => {
      // robust trend: Theil-Sen median-of-pairwise-slopes per nation —
      // the 29%-breakdown alternative to q_trend_slope's OLS (one
      // contaminated month cannot drag it). Facts reduce to the
      // monthly series first; exact-rational pair slopes and the
      // lower-median selection run on the driver over that
      // calendar-bounded frame. The oracle replays the rational median
      // with a two-part exact integer sort key (floor quotient +
      // bounded-denominator remainder scale) — no float ordering;
      // StatsSpec proves outlier immunity and exact recovery.
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val mon = t(s, dir, "orders")
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nation"),
          trunc(to_date(col("o_orderdate")), "mon").as("month"))
        .agg(sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
          .as("rev_c"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("nation")).orderBy(col("month")))
          .cast("long"))
      Stats.theilSen(mon, "nation", "rn", "rev_c")
        .withColumnRenamed("grp", "nation")
        .orderBy(col("nation"))
    }),

    "q_voptimal_hist" -> ((s, dir) => {
      // v-optimal histogram of document lengths (Jagadish VLDB'98):
      // the 8-bucket partition minimizing total within-bucket SSE —
      // equal-width wastes resolution, quantile buckets ignore
      // variance; this is the principled layout a stats catalog wants.
      // Facts collapse to one row per distinct value (map-side); the
      // exact-BigInt DP runs on the driver over that bounded frame.
      // The oracle replays the DP as 8 unrolled argmin layers over a
      // materialized pair-cost table (same smallest-cut tie-break);
      // BinningSpec proves the DP against brute-force enumeration.
      Binning.vOptimal(t(s, dir, "documents"), "n_chars", nBuckets = 8)
        .orderBy(col("bucket"))
    }),

    "q_neyman_sample" -> ((s, dir) => {
      // stratified sampling with NEYMAN allocation (Neyman 1934): a
      // 500-doc budget split across sources ∝ Nh·σh — high-variance
      // strata earn more samples than proportional allocation gives
      // them; the optimal-variance design. σh quantizes through one
      // sqrt+floor (deterministic); the split is EXACT largest
      // remainder; each stratum takes its quota by the portable hash
      // order. Composes the q_mixture_alloc machinery with
      // variance-aware weights.
      val d = t(s, dir, "documents").select(col("doc_id"), col("source"),
        col("n_chars").cast("long").as("x"))
      def S(c: Column) = sum(c.cast("decimal(38,0)"))
      def D(c: Column) = c.cast("double")
      val m = d.groupBy(col("source")).agg(count(lit(1)).as("nh"),
        S(col("x")).as("sx"), S(col("x") * col("x")).as("sxx"))
      val varh = when(col("nh") > 1,
        (D(col("nh")) * D(col("sxx")) - D(col("sx")) * D(col("sx"))) /
          (D(col("nh")) * (D(col("nh")) - lit(1.0)))).otherwise(lit(0.0))
      val wts = m
        .withColumn("sh_q",
          floor(sqrt(greatest(varh, lit(0.0))) * 100.0 + 0.5).cast("long"))
        .withColumn("w", col("nh") * col("sh_q"))
        .withColumn("k", lit(1)).withColumn("amt", lit(500L))
      val quota = Allocate.largestRemainder(wts, Seq("k"), "w", "amt",
          tiebreak = Seq("source"), outCol = "n_take")
        .select(col("source"), col("n_take"))
      val h = (col("doc_id") % 1048573L) * 2654435761L % 1000000L
      val rankW = Window.partitionBy(col("source"))
        .orderBy(h.asc, col("doc_id").asc)
      d.withColumn("__r", row_number().over(rankW))
        .join(broadcast(quota), Seq("source"))
        .filter(col("__r") <= col("n_take"))
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    }),

    "q_mann_whitney" -> ((s, dir) => {
      // nonparametric A/B: Wilcoxon rank-sum on order value between
      // the hash variants — the distribution-free sibling of
      // q_ab_test's Welch t (heavy-tailed revenue is exactly where a
      // t-test misleads). u2 = 2·U1 stays an exact integer through
      // tied ranks; tie-corrected normal z.
      val o = t(s, dir, "orders").select(
        when((col("o_custkey") % 1048573L) * 2654435761L % 1000000L < 500000L,
          lit(0L)).otherwise(lit(1L)).as("variant"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("cents"))
      Stats.mannWhitney(o, "variant", "cents")
    }),

    "q_forecast_backtest" -> ((s, dir) => {
      // forecast evaluation: one-step-ahead MAPE of Holt vs the naive
      // last-value forecast per nation — the backtest that justifies
      // (or rejects) the fancier model. Errors quantize per row
      // ((10⁴·|e|) div actual — exact integers), means are floor
      // divisions; everything rides q_holt's exact recurrence.
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val mon = t(s, dir, "orders")
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nation"),
          trunc(to_date(col("o_orderdate")), "mon").as("month"))
        .agg(sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
          .as("rev_c"))
      val fitted = Recurrences.holt(mon, Seq("nation"), Seq("month"), "rev_c",
        aNum = 1L, aDen = 4L, bNum = 1L, bDen = 4L)
      val w = Window.partitionBy(col("nation")).orderBy(col("month"))
      val evals = fitted
        .withColumn("fc_holt", lag(col("holt_q"), 1).over(w))
        .withColumn("fc_naive", lag(col("rev_c"), 1).over(w))
        .filter(col("fc_holt").isNotNull && col("rev_c") > 0L)
        .withColumn("ape_holt",
          expr("(10000 * abs(rev_c - fc_holt)) DIV rev_c"))
        .withColumn("ape_naive",
          expr("(10000 * abs(rev_c - fc_naive)) DIV rev_c"))
      evals.groupBy(col("nation")).agg(
          count(lit(1)).as("n_evals"),
          expr("CAST(sum(ape_holt) DIV count(1) AS BIGINT)").as("mape_holt_bp"),
          expr("CAST(sum(ape_naive) DIV count(1) AS BIGINT)").as("mape_naive_bp"))
        .orderBy(col("nation"))
    }),

    "q_ppr" -> ((s, dir) => {
      // personalized PageRank (random walk with restart): teleport mass
      // lands ONLY on the seed parts (one brand), so scores measure
      // graph proximity to the brand — the "related items" recommender
      // primitive. Same part-transition edges and pinned BIGINT
      // recurrence as q_pagerank; only rows the walk reached.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_partkey"))
      val edges = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
        .withColumn("dst", lead(col("l_partkey"), 1).over(w))
        .filter(col("dst").isNotNull)
        .groupBy(col("l_partkey").as("src"), col("dst"))
        .agg(count(lit(1)).as("weight"))
      val seeds = t(s, dir, "part")
        .filter(col("p_brand") === "Brand#11")
        .select(col("p_partkey").as("node"))
      PageRank.personalizedRank(edges, seeds, iters = 3)
        .filter(col("pr") > 0L)
        .orderBy(col("node"))
    }),

    "q_changepoints" -> ((s, dir) => {
      // offline structural-break detection: binary segmentation over
      // the daily revenue series — EXACT BigInt prefix sums + rational
      // SSE compares on the driver, over a post-aggregation frame
      // bounded by the calendar, not data volume. Always returns the
      // best candidate (flagged insignificant on a stationary series)
      // so the answer is never vacuous. The oracle replays the greedy
      // with exact HUGEINT rational compares, three unrolled recursion
      // levels (deeper trees mismatch loudly, never silently);
      // ChangePointsSpec plants mean shifts.
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
          .as("rev_c"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("d")))
          .cast("long"))
      val cps = ChangePoints.binarySegmentation(daily, "rn", "rev_c",
        minSeg = 30, maxPoints = 5, minGainPermille = 100L)
      cps.join(daily, cps("cp_ord") === daily("rn"))
        .select(date_format(col("d"), "yyyy-MM-dd").as("cp_date"),
          col("left_mean_q"), col("right_mean_q"), col("gain_permille"),
          col("significant"))
        .orderBy(col("cp_date"))
    }),

    "q_markov_attribution" -> ((s, dir) => {
      // data-driven attribution capstone (removal effect, Anderl et
      // al. 2014) beside the positional rules: journeys = 30-minute
      // SESSIONS (whole-history journeys all convert here — a
      // degenerate p=1 baseline), truncated at first purchase (one
      // keyed window); transitions count in one grouped agg; the
      // ≤|event-types|-state chain solves on the driver in EXACT
      // BigInt rationals — no float anywhere, bit-deterministic.
      // rows-only by design (no SQL form for the rational solve);
      // MarkovAttributionSpec proves the solver against double power
      // iteration and order-invariance.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val sessions = t(s, dir, "events").filter(col("user_id").isNotNull)
        .withColumn("__gap",
          when(col("ts").cast("long") -
            lag(col("ts").cast("long"), 1).over(w) > 1800L, 1L)
            .otherwise(lit(0L)))
        .withColumn("journey_id",
          concat(col("user_id").cast("string"), lit("#"),
            sum(col("__gap")).over(
              w.rowsBetween(Window.unboundedPreceding, 0)).cast("string")))
      MarkovAttribution.removalEffects(sessions,
          "journey_id", "event_type", "ts", "event_id", "purchase")
        .orderBy(col("channel"))
    }),

    "q_mcnemar" -> ((s, dir) => {
      // paired binary comparison (McNemar 1947): did high-value
      // purchasing CHANGE between 1996 and 1997 for the SAME
      // customers? The paired design two independent proportions
      // can't give. Population = customers ordering in both years;
      // statistic = (b−c)²/(b+c) over the discordant counts — exact
      // integer ratio, quantized by floor division.
      val o = t(s, dir, "orders")
        .withColumn("yr", year(to_date(col("o_orderdate"))))
        .filter(col("yr").isin(1996, 1997))
        .groupBy(col("o_custkey"))
        .agg(
          max(when(col("yr") === 1996, 1L).otherwise(0L)).as("in96"),
          max(when(col("yr") === 1997, 1L).otherwise(0L)).as("in97"),
          max(when(col("yr") === 1996 && col("o_totalprice") > 300000.0, 1L)
            .otherwise(0L)).as("hv96"),
          max(when(col("yr") === 1997 && col("o_totalprice") > 300000.0, 1L)
            .otherwise(0L)).as("hv97"))
        .filter(col("in96") === 1L && col("in97") === 1L)
      o.agg(
          count(lit(1)).as("n_pairs"),
          sum(when(col("hv96") === 1L && col("hv97") === 0L, 1L).otherwise(0L))
            .as("b"),
          sum(when(col("hv96") === 0L && col("hv97") === 1L, 1L).otherwise(0L))
            .as("c"))
        .select(col("n_pairs"), col("b"), col("c"),
          expr("CAST(CASE WHEN b + c = 0 THEN 0 ELSE " +
            "(10000 * (b - c) * (b - c)) DIV (b + c) END AS BIGINT)")
            .as("mcnemar_bp"))
    }),

    "q_srm" -> ((s, dir) => {
      // sample-ratio-mismatch guard (the first experiment-hygiene
      // check): chi-square goodness-of-fit of the observed variant
      // split vs the designed 50/50 — (n0−n1)²/n, exact integers.
      val o = t(s, dir, "orders").select(
        when((col("o_custkey") % 1048573L) * 2654435761L % 1000000L < 500000L,
          lit(0L)).otherwise(lit(1L)).as("variant"))
      o.agg(
          sum(when(col("variant") === 0L, 1L).otherwise(0L)).as("n0"),
          sum(when(col("variant") === 1L, 1L).otherwise(0L)).as("n1"))
        .select(col("n0"), col("n1"),
          expr("CAST((10000 * (n0 - n1) * (n0 - n1)) DIV (n0 + n1) AS BIGINT)")
            .as("srm_bp"))
    }),

    "q_lsh_recall" -> ((s, dir) => {
      // dedup-quality CANARY: inject tracer duplicates (1 in 17 docs
      // copied under a shifted id) and measure the LSH pipeline's
      // recall of the KNOWN (original, copy) pairs — identical text ⇒
      // identical signature ⇒ same buckets, so recall must be 10000;
      // anything lower is the regression alarm (the dedup sibling of
      // q_ann_recall; tracer injection keeps the gate non-vacuous at
      // every SF, unlike mining natural dups — the q_churn lesson).
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val offset = lit(10000000L)
      val tracers = docs.filter(col("doc_id") % 17 === 0)
        .filter(length(trim(col("text"))) > 0)
      val corpus = docs.unionByName(
        tracers.select((col("doc_id") + offset).as("doc_id"), col("text")))
      val truth = tracers.select(col("doc_id").as("lo"),
        (col("doc_id") + offset).as("hi"))
      val found = graft.dedup.NearDup.minhashPairs(corpus, "doc_id", "text",
          threshold = 0.6)
        .select(least(col("id_a"), col("id_b")).as("lo"),
          greatest(col("id_a"), col("id_b")).as("hi"))
      val hit = truth.join(found, Seq("lo", "hi"), "left_semi")
      val nT = truth.count(); val nH = hit.count()
      docs.sparkSession.range(1).select(
        lit(nT).as("n_truth_pairs"), lit(nH).as("n_found"),
        lit(if (nT == 0) 10000L else (10000L * nH) / nT).as("recall_bp"))
    }),

    "q_rec_eval" -> ((s, dir) => {
      // the recommender loop CLOSED: order-level holdout (1 in 7
      // orders), CF neighbors trained on the rest, top-10 scored per
      // user (exact integer sim sums — a double sum would make
      // re-runs hash-unstable), hit-rate@10 + NDCG@10 against the
      // STRICTLY-NEW held-out items. The whole pipeline replays in
      // SQL: split + cap + cosine neighbors (the q_item_neighbors
      // oracle machinery over the train slice), integer candidate
      // scoring, and the pinned-gain NDCG finish; RecEvalSpec proves
      // the scorer and metrics on planted fixtures.
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      val inter = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("user"), col("l_partkey").as("item"),
          col("o_orderkey"))
        .localCheckpoint(true) // train/test/strength all read it
      val trainRaw = inter.filter(col("o_orderkey") % 7 =!= 0)
      val train = trainRaw.groupBy(col("user"), col("item"))
        .agg(countDistinct(col("o_orderkey")).as("strength"))
        .localCheckpoint(true)
      val test = inter.filter(col("o_orderkey") % 7 === 0)
        .select(col("user"), col("item")).distinct()
        .join(train.select(col("user"), col("item")), Seq("user", "item"),
          "left_anti") // strictly new items only
      val nbrs = graft.similarity.ItemSim.neighbors(train,
        "user", "item", "strength", k = 10, maxUserItems = 50)
      val recs = graft.similarity.RecEval.topK(train, nbrs, k = 10)
      graft.similarity.RecEval.evaluate(recs, test, k = 10)
    }),

    "q_communities" -> ((s, dir) => {
      // community detection on the repeat co-purchase graph:
      // deterministic synchronous LPA (min-label ties, fixed 5
      // rounds) — the cohesion VIEW next to q_kcore's cohesion FILTER
      // and q_dedup_clusters' exact components. The oracle replays the
      // 5 synchronous rounds as a recursive CTE with the identical
      // (count DESC, label ASC) tie-break; GraphsSpec plants two
      // cliques joined by a bridge and proves the split +
      // order-invariance.
      val li = t(s, dir, "lineitem")
      val pairs = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
        .agg(countDistinct(col("a.l_orderkey")).as("c"))
        .filter(col("c") >= 2)
      Graphs.labelPropagation(Graphs.canonicalEdges(pairs, "pa", "pb"),
          iters = 5)
        .orderBy(col("node"))
    }),

    "q_kcore" -> ((s, dir) => {
      // cohesive-core filter (k-core, Seidman 1983) on the REPEAT
      // co-purchase graph (pairs bought together in ≥2 distinct orders
      // — the single-order graph is near-complete and peels nothing):
      // iterative peel to fixpoint, checkpointed rounds, loud
      // non-convergence. The oracle replays the peel as a 50-round
      // (== maxIters) recursive CTE — converged rounds re-emit
      // unchanged, so the last round is the fixpoint; GraphsSpec
      // additionally proves equality with a sequential brute-force
      // peel.
      val li = t(s, dir, "lineitem")
      val pairs = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
        .agg(countDistinct(col("a.l_orderkey")).as("c"))
        .filter(col("c") >= 2)
      Graphs.kCore(Graphs.canonicalEdges(pairs, "pa", "pb"), k = 2)
        .orderBy(col("node"))
    }),

    "q_allocate" -> ((s, dir) => {
      // header-level rebate (10% of the order's cents total) prorated
      // onto lines by largest remainder: line parts sum EXACTLY to the
      // header amount; two windows over ONE keyed exchange
      val li = t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        floor(col("l_extendedprice") * 100.0 + 0.5).cast("long").as("cents"))
      val wA = Window.partitionBy(col("l_orderkey"))
      val withAmt = li.withColumn("rebate_q",
        call_function("div", sum(col("cents")).over(wA), lit(10L)))
      Allocate.largestRemainder(withAmt, Seq("l_orderkey"), "cents",
          "rebate_q", tiebreak = Seq("l_linenumber"))
        .select(col("l_orderkey"), col("l_linenumber"), col("cents"),
          col("rebate_q"), col("alloc_q"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // ── Exact-integer per-key recurrences (operators/Recurrences) ─────

    "q_ewma" -> ((s, dir) => {
      // exponential smoothing of purchase amounts per user, alpha = 1/4,
      // exact integer recurrence (floor division every step) — the
      // non-associative fold no window frame can express; ONE keyed
      // shuffle + secondary sort, O(1) state per user
      val ev = t(s, dir, "events")
        .filter(col("event_type") === "purchase" &&
          col("user_id").isNotNull && col("value").isNotNull)
        .select(col("user_id"), col("event_id"), col("ts"),
          floor(col("value") * 100.0 + 0.5).cast("long").as("xq"))
      Recurrences.ewma(ev, Seq("user_id"), Seq("ts", "event_id"),
          "xq", num = 1L, den = 4L)
        .select(col("user_id"), col("event_id"), col("xq"), col("ewma_q"))
        .orderBy(col("event_id"))
    }),

    "q_cusum" -> ((s, dir) => {
      // one-sided CUSUM spend alarms per user: s = max(0, s + xq - 4000),
      // fire at >= 20000 then reset — changepoint detection with
      // data-dependent reset (the same irreducibly-sequential class)
      val ev = t(s, dir, "events")
        .filter(col("user_id").isNotNull && col("value").isNotNull)
        .select(col("user_id"), col("event_id"), col("ts"),
          floor(col("value") * 100.0 + 0.5).cast("long").as("xq"))
      Recurrences.cusumAlarms(ev, Seq("user_id"), Seq("ts", "event_id"),
          "xq", target = 4000L, threshold = 20000L)
        .select(col("user_id"), col("event_id"), col("cusum_q"))
        .orderBy(col("event_id"))
    }),

    "q_running_balance" -> ((s, dir) => {
      // clamped stock balance per part: returns restock (+qty), ships
      // deplete (-qty), level floors at zero from an opening stock of
      // 500 — the clamp makes every prefix non-associative
      val mv = t(s, dir, "lineitem").select(
        col("l_partkey"), col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        when(col("l_returnflag") === "R", col("l_quantity"))
          .otherwise(-col("l_quantity")).cast("long").as("dq"))
      Recurrences.clampedBalance(mv, Seq("l_partkey"),
          Seq("l_shipdate", "l_orderkey", "l_linenumber"), "dq", init = 500L)
        .orderBy(col("l_partkey"))
    }),

    // ── Corpus repetition / filter report ─────────────────────────────

    "q_dup_ngrams" -> ((s, dir) => {
      // Gopher "duplicated n-gram" repetition stats as exact integers;
      // per-row sorted-array run-length fold, zero shuffle
      val st = graft.functions.TextFunctions.dupNgramStats(col("text"), n = 3)
      t(s, dir, "documents")
        .filter(graft.functions.TextFunctions.tokenCount(col("text")) >= 3)
        .select(col("doc_id"), st.getField("n_grams").as("n_grams"),
          st.getField("dup_occ").as("dup_occ"),
          st.getField("dup_chars").as("dup_chars"))
        .orderBy(col("doc_id"))
    }),

    "q_golden_record" -> ((s, dir) => {
      // MDM survivorship: three prioritized feeds describe each order;
      // each golden ATTRIBUTE independently takes the most-preferred
      // non-null value (tag + exact +priority price offsets make the
      // winning source observable per cell)
      val o = t(s, dir, "orders")
      def src(tag: String, pri: Int, statusNullMod: Int, priceNullMod: Int) =
        o.select(col("o_orderkey"), lit(pri).as("priority"),
          when(col("o_orderkey") % statusNullMod =!= 0,
            concat(lit(tag + ":"), col("o_orderstatus"))).as("status"),
          when(col("o_orderkey") % priceNullMod =!= 0,
            col("o_totalprice") + pri).as("price"))
      val feed = src("A", 3, 3, 2)
        .unionByName(src("B", 2, 4, 3))
        .unionByName(src("C", 1, 9999991, 9999993)) // never null
      graft.operators.Survivorship.goldenRecord(feed,
        Seq("o_orderkey"), Seq(col("priority")), Seq("status", "price"))
        .orderBy(col("o_orderkey"))
    }),

    "q_benford" -> ((s, dir) => {
      // first-digit audit on order totals: organic-feed signal per digit
      graft.operators.Diagnostics.benford(t(s, dir, "orders"), col("o_totalprice"))
        .orderBy(col("digit"))
    }),

    "q_fk_orphan_report" -> ((s, dir) => {
      // referential-integrity audit on a DELIBERATELY corrupted feed:
      // every 97th order's lineitems point at a shifted (absent) part —
      // the report quantifies each FK's damage before a sync trusts it
      val li = t(s, dir, "lineitem").withColumn("l_partkey",
        when(col("l_orderkey") % 97 === 0, col("l_partkey") + 1000000L)
          .otherwise(col("l_partkey")))
      graft.operators.Diagnostics.fkOrphans(li, Seq(
        ("orders", "l_orderkey", t(s, dir, "orders"), "o_orderkey"),
        ("part", "l_partkey", t(s, dir, "part"), "p_partkey"),
        ("supplier", "l_suppkey", t(s, dir, "supplier"), "s_suppkey")))
        .orderBy(col("fk_name"))
    }),

    "q_mad_outliers" -> ((s, dir) => {
      // robust (median/MAD) outlier summary per event type — the
      // median-based twin of q_event_outliers' moment z-scores, immune to
      // the outliers it hunts. DISCRETE lower medians (the (n+1) DIV 2-th
      // smallest, an actual data value — interpolation formulas differ
      // across engines in the last ulp; element selection cannot), so
      // med, mad, and every |x−med| > 3·mad compare are bit-exact in both
      // engines. Sort-window per event_type; the approx_percentile
      // sketch (q_percentiles_approx) is the mergeable scale path.
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, dir, "events").select(col("event_type"), col("value"))
        .filter(col("value").isNotNull)
      val wv = Window.partitionBy(col("event_type")).orderBy(col("value"))
      val wc = Window.partitionBy(col("event_type"))
      val withMed = ev
        .withColumn("__rn", row_number().over(wv))
        .withColumn("__n", count(lit(1)).over(wc))
        .withColumn("__med", max(when(col("__rn") === expr("(__n + 1) div 2"),
          col("value"))).over(wc))
      val withAdev = withMed.withColumn("__adev", abs(col("value") - col("__med")))
      val wa = Window.partitionBy(col("event_type")).orderBy(col("__adev"))
      withAdev
        .withColumn("__rna", row_number().over(wa))
        .withColumn("__mad", max(when(col("__rna") === expr("(__n + 1) div 2"),
          col("__adev"))).over(wc))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          max(col("__med")).as("med"),
          max(col("__mad")).as("mad"),
          sum((col("__adev") > col("__mad") * 3).cast("long")).as("n_outliers"))
        .orderBy(col("event_type"))
    }),

    "q_gopher_filter" -> ((s, dir) => {
      // published-rules filter report: per-rule exact-integer flags +
      // keep bit — the decision table a curation pass materializes
      val g = graft.functions.TextFunctions.gopherFlags(col("text"))
      t(s, dir, "documents")
        .select(col("doc_id"), g.getField("n_words").as("n_words"),
          g.getField("word_chars").as("word_chars"),
          g.getField("alpha_words").as("alpha_words"),
          g.getField("stop_hits").as("stop_hits"),
          g.getField("sym_hits").as("sym_hits"),
          g.getField("f_words").as("f_words"),
          g.getField("f_mean_len").as("f_mean_len"),
          g.getField("f_alpha").as("f_alpha"),
          g.getField("f_stop").as("f_stop"),
          g.getField("f_sym").as("f_sym"),
          g.getField("keep").as("keep"))
        .orderBy(col("doc_id"))
    }),

    // ── Time-grid resampling / privacy audit / hybrid retrieval ───────

    "q_resample_ffill" -> ((s, dir) => {
      // regular 6-hour per-user series forward-filled from the irregular
      // purchase stream: arithmetic epoch grid (ceil/floor-aligned, so
      // every grid point has an observation at-or-before it) + one
      // backward as-of join. Never a driver loop, never a per-key
      // sequence materialized outside the executors.
      Resample.forwardFill(
        t(s, dir, "events").filter(col("event_type") === "purchase"),
        "user_id", "ts", "value", stepSeconds = 21600L)
        .withColumnRenamed("key", "user_id")
        .orderBy(col("user_id"), col("grid_epoch"))
    }),

    "q_quantiles_maintained" -> ((s, dir) => {
      // percentile report FROM the maintained bucket counts — the same
      // nBuckets-row state PSI/KS score, so a monitoring pipeline serves
      // quantiles with zero snapshot rescans; bucket-resolution accuracy
      // (approx_percentile is the scan-time high-res alternative)
      val bounds = Seq(20000.0, 40000.0, 60000.0, 80000.0)
      val counts = operators.Drift.bucketCounts(
        t(s, dir, "lineitem").filter(col("l_extendedprice").isNotNull),
        col("l_extendedprice"), bounds, "n")
      operators.Drift.quantilesFromCounts(counts, bounds,
        Seq(2500, 5000, 7500, 9000, 9900))
        .orderBy(col("q_bp"))
    }),

    "q_resample_interp" -> ((s, dir) => {
      // the continuously-varying twin of q_resample_ffill: linear
      // interpolation between the surrounding observations (two as-of
      // joins, one fixed IEEE parenthesization both engines replay)
      Resample.interpolate(
        t(s, dir, "events").filter(col("event_type") === "purchase"),
        "user_id", "ts", "value", stepSeconds = 21600L)
        .withColumnRenamed("key", "user_id")
        .orderBy(col("user_id"), col("grid_epoch"))
    }),

    "q_k_anonymity" -> ((s, dir) => {
      // privacy pre-flight: quasi-identifier classes below k=5 — the
      // rows a release must generalize or suppress. One keyed count.
      val c = t(s, dir, "customer").withColumn("balance_band",
        floor(col("c_acctbal") / 1000).cast("long"))
      Diagnostics.kAnonymityViolations(c,
        Seq("c_nationkey", "c_mktsegment", "balance_band"), k = 5)
        .orderBy(col("c_nationkey"), col("c_mktsegment"), col("balance_band"))
    }),

    "q_k_anonymity_stats" -> ((s, dir) => {
      // the one-row gate value over the same single grouped count
      val c = t(s, dir, "customer").withColumn("balance_band",
        floor(col("c_acctbal") / 1000).cast("long"))
      Diagnostics.kAnonymityStats(c,
        Seq("c_nationkey", "c_mktsegment", "balance_band"), k = 5)
    }),

    "q_hybrid_search" -> ((s, dir) => {
      // hybrid retrieval: sparse (quantized TF-IDF keyword search) and
      // dense (cosine top-k; the synthetic corpus aligns vec_id with
      // doc_id) branches fused by quantized reciprocal-rank fusion —
      // rank-only fusion needs no cross-scale score calibration
      val docs = t(s, dir, "documents")
      val emb = t(s, dir, "embeddings")
      val lex = graft.pipelines.Lexical.searchTopK(docs, "doc_id", "text",
        Seq("spark", "merge", "vector", "dup"), k = 20)
        .select(col("doc_id"), col("rank"))
      val dense = Knn.bruteForceTopK(emb, emb.filter(col("vec_id") === 0), k = 20)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("cos_sim").desc, col("neighbor_id").asc)))
        .select(col("neighbor_id").as("doc_id"), col("rank"))
      graft.pipelines.Lexical.rrfFuse(Seq(lex, dense), "doc_id",
        rrfK = 60, topK = 10)
        .orderBy(col("rank"))
    }),

    "q_semantic_dedup" -> ((s, dir) => {
      // SemDeDup: trained-centroid cells, within-cell cosine pairs,
      // transitive closure. HASH-CHECKED (round 9): quantized Lloyd
      // (see q_ann_ivf) made the trained cells replayable, so the
      // oracle replays seeds → Lloyd round → cell assignment →
      // within-cell cosine pairs → recursive-CTE closure with min-id
      // canonicals — the whole SemDeDup recipe, not just its kernels.
      val emb = t(s, dir, "embeddings")
      val cents = Knn.trainCentroids(emb, nCentroids = 8, iters = 1)
      graft.similarity.SemDedup.dedup(emb, cents, minCosine = 0.25)
        .orderBy(col("id"))
    }),

    "q_temperature_sample" -> ((s, dir) => {
      // temperature-based language sampling (the mBERT/XLM-R/mT5 p^α
      // convention, α pinned at 0.5 — sqrt is the one IEEE-exact
      // power): quotas = largest-remainder apportionment of the budget
      // over floor(sqrt(n)·2^20) fixed-point weights (ALL-INTEGER after
      // the sqrt, so order-free and HUGEINT-replayable), keep = each
      // language's portable-hash top-quota. Upweights low-resource
      // langs vs proportional; hash-checked from birth.
      val docs = t(s, dir, "documents")
      val h = (col("doc_id") % 1048573L) * 2654435761L % 1000000L
      graft.pipelines.Mixture.temperatureSample(docs, "lang", "doc_id",
        budget = 200L, h)
        .select(col("doc_id"), col("lang"), col("srank"), col("quota"),
          col("kept"))
        .orderBy(col("doc_id"))
    }),

    "q_prototype_prune" -> ((s, dir) => {
      // data pruning by prototypicality (Sorscher et al. NeurIPS 2022):
      // rank every vector by squared distance to its TRAINED k-means
      // centroid, keep the hardest 30% per cell (the abundant-data
      // regime). HASH-CHECKED: quantized Lloyd (q_ann_ivf) replays the
      // trained cells, dist² = ‖v‖² + (−2·v·c + ‖c‖²) is the proven
      // q_ann_recall fold arithmetic, and the keep floor is integer
      // n·bp DIV 10⁴ — the whole selection replays in SQL. dist²
      // projects as HALF_UP basis points per the cross-engine rule.
      val emb = t(s, dir, "embeddings")
      val cents = Knn.trainCentroids(emb, nCentroids = 8, iters = 1)
      graft.similarity.Prune.byPrototypicality(emb, "embedding", cents,
        keepBp = 3000, keepHardest = true)
        .select(col("vec_id"), col("centroid_id"),
          floor(col("dist2") * 10000.0 + 0.5).cast("long").as("dist2_bp"),
          col("cell_n"), col("drank"), col("kept"))
        .orderBy(col("vec_id"))
    }),

    "q_join_explosion" -> ((s, dir) => {
      // the join pre-flight, driver-gated: lower-bounds a self-join's
      // blowup from the heavy keys of both sides. The MG candidate
      // phase is partition-order-dependent but the EXACT verify phase
      // makes the surviving set identical to the naive GROUP BY
      // HAVING — so the bound is deterministic and oracle-checkable.
      val ev = t(s, dir, "events")
      Diagnostics.joinExplosionBound(ev, col("event_type"), ev,
        col("event_type"), phi = 0.1)
    }),

    "q_subtree_rollup" -> ((s, dir) => {
      // closure-based subtree rollup over the star schema's natural
      // 3-level hierarchy (customer → nation → region, ids
      // namespace-offset so the node domain is one key space); money in
      // integer cents so every distributed sum is exact. Upgrades
      // Hierarchy.subtreeAgg from ScalaTest-only to driver-gated.
      val nodes = t(s, dir, "region")
        .select(col("r_regionkey").cast("long").as("node"),
          lit(0L).as("v_cents"))
        .unionByName(t(s, dir, "nation")
          .select((col("n_nationkey") + 100).cast("long").as("node"),
            lit(0L).as("v_cents")))
        .unionByName(t(s, dir, "customer")
          .select((col("c_custkey") + 1000000L).as("node"),
            round(col("c_acctbal") * 100).cast("long").as("v_cents")))
      val edges = t(s, dir, "nation")
        .select((col("n_nationkey") + 100).cast("long").as("child"),
          col("n_regionkey").cast("long").as("parent"))
        .unionByName(t(s, dir, "customer")
          .select((col("c_custkey") + 1000000L).as("child"),
            (col("c_nationkey") + 100).cast("long").as("parent")))
      Hierarchy.subtreeAgg(nodes, edges, "node", "v_cents", "child", "parent",
          as = "subtree_cents")
        .orderBy(col("node"))
    }),

    "q_entity_resolution" -> ((s, dir) => {
      // the MDM loop end-to-end: PassJoin fuzzy pairs → union-find
      // closure → per-attribute survivorship, over a deterministic
      // dirty feed (md5 names so only the PLANTED variants are within
      // distance 1; every 50th entity gets a one-char variant from a
      // more-preferred source with a null segment). The oracle replays
      // the whole pipeline: half-prefix blocking (exact for equal-length
      // distance-1), recursive-CTE closure, window survivorship.
      val cust = t(s, dir, "customer")
      val base = cust.select(col("c_custkey").as("ent_id"),
        md5(col("c_custkey").cast("string")).as("name"),
        col("c_mktsegment").as("segment"), col("c_acctbal").as("acctbal"),
        lit(1).as("src_rank"))
      val variants = cust.filter(col("c_custkey") % 50 === 0)
        .select((col("c_custkey") + 1000000L).as("ent_id"),
          concat(substring(md5(col("c_custkey").cast("string")), 1, 31),
            lit("z")).as("name"),
          lit(null).cast("string").as("segment"),
          (col("c_acctbal") + 1).as("acctbal"), lit(2).as("src_rank"))
      graft.pipelines.EntityResolution.resolve(
        base.unionByName(variants), "ent_id", "name", maxDist = 1,
        prefCols = Seq(col("src_rank"), col("ent_id")),
        valueCols = Seq("name", "segment", "acctbal"))
        .orderBy(col("canonical_id"))
    }),

    "q_embed_whiten" -> ((s, dir) => {
      // PCA-whitening of the embedding corpus (Jégou & Chum '12) — the
      // retrieval-quality conditioner ahead of ANN/quantization. One
      // dense QUANTIZED moments pass (exact fixed-point sums, the Lloyd
      // recipe) + driver-side Jacobi eigen (dim×dim, tiny by
      // construction) + literal-folded pure-map projection.
      // HASH-CHECKED (round 10, the pinned-constant rule): the trained
      // basis rides the oracle as literals; the SQL recomputes the
      // moments from parquet, gates the basis on exact-mean equality,
      // eigen-residuals, orthonormality, and eigenvalue order, then
      // replays the projection — everything except the Jacobi
      // iteration itself, which WhiteningSpec pins bit-stable.
      val t8 = graft.similarity.Whitening.fit(
        t(s, dir, "embeddings"), "embedding", k = 8)
      t(s, dir, "embeddings")
        .select(col("vec_id"), t8(col("embedding")).as("w"))
        .select(col("vec_id"), element_at(col("w"), 1).as("w1"),
          element_at(col("w"), 2).as("w2"), element_at(col("w"), 3).as("w3"))
        .orderBy(col("vec_id"))
    }),

    "q_bm25_search" -> ((s, dir) => {
      // BM25 keyword retrieval — the doc-length-normalized ranking
      // q_lexical_search's raw TF-IDF lacks; exact integer arithmetic
      // (k1=6/5, b=3/4 cleared of denominators, ratio-form idf)
      graft.pipelines.Lexical.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
        Seq("spark", "merge", "vector", "dup"), k = 20)
        .orderBy(col("rank"))
    }),

    "q_ndcg" -> ((s, dir) => {
      // retrieval-quality readout (nDCG@10, Järvelin & Kekäläinen
      // 2002) of the BM25 ranking against corpus-derived graded labels
      // (rel = min(3, Σ query-term tf), gain 2^rel − 1). Discounts are
      // PINNED integer literals floor(1e6/log2(i+1)), so DCG / ideal
      // DCG are exact BIGINT sums — no float log near the data; both
      // top-k selections are TakeOrderedAndProject.
      graft.pipelines.Lexical.ndcgAtK(t(s, dir, "documents"), "doc_id",
        "text", Seq("spark", "merge", "vector", "dup"), k = 10)
    }),

    "q_pit_join" -> ((s, dir) => {
      // point-in-time join: every order joins the customer-dimension
      // VERSION valid at its own order date (three deterministic
      // versions per customer; every 10th customer retires at the last
      // cut — those late orders must get NULL, not a stale version).
      // One backward as-of join — never an interval explode.
      val cust = t(s, dir, "customer")
      def ts(d: String) = lit(d).cast("timestamp")
      val v1 = cust.select(col("c_custkey"), ts("1995-01-01").as("valid_from"),
        ts("1997-01-01").as("valid_to"), col("c_mktsegment").as("segment"))
      val v2 = cust.select(col("c_custkey"), ts("1997-01-01").as("valid_from"),
        ts("2000-01-01").as("valid_to"),
        concat(col("c_mktsegment"), lit("_V2")).as("segment"))
      val v3 = cust.filter(col("c_custkey") % 10 =!= 0)
        .select(col("c_custkey"), ts("2000-01-01").as("valid_from"),
          lit(null).cast("timestamp").as("valid_to"),
          concat(col("c_mktsegment"), lit("_V3")).as("segment"))
      val dim = v1.unionByName(v2).unionByName(v3)
      val fact = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey").as("c_custkey"),
        col("o_orderdate").cast("timestamp").as("od"))
      Scd.pitJoin(fact, dim, Seq("c_custkey"), "od", Seq("segment"))
        .select(col("o_orderkey"),
          date_format(col("od"), "yyyy-MM-dd").as("od"),
          col("dim_segment"))
        .orderBy(col("o_orderkey"))
    }),

    "q_span_dedup" -> ((s, dir) => {
      // C4-style duplicated-span REMOVAL with reassembly: every
      // duplicated 10-token window keeps exactly one corpus-wide copy
      // (first (doc, position)), docs rebuilt from surviving windows —
      // the removal complement of q_shared_passages' pair detection
      graft.dedup.SpanDedup.dedupSpans(
        t(s, dir, "documents"), "doc_id", "text", n = 10)
        .orderBy(col("doc_id"))
    }),

    "q_decontaminate_bloom" -> ((s, dir) => {
      // the LARGE-benchmark scale path of q_decontaminate: a mergeable
      // bloom over benchmark grams gates the corpus side (definite
      // negatives never shuffle), the exact join corrects every false
      // positive — output == the broadcast form, same oracle
      val docs = t(s, dir, "documents")
      val benchmark = docs.filter(col("doc_id") % 50 === 0)
      graft.dedup.Decontaminate.overlapsBloomGated(
        docs.filter(col("doc_id") % 50 =!= 0), benchmark, "doc_id", "text",
        n = 8, expectedGrams = 200000L, fpp = 0.01)
        .orderBy(col("corpus_id"), col("bench_id"))
    }),

    "q_dsir_weights" -> ((s, dir) => {
      // DSIR (Xie et al. 2023): quantized log-importance of every doc
      // against the src0 target slice under hashed unigram models —
      // exact BIGINT dot product of row-local bucket counts with
      // floor-quantized log-ratio weights (portable md5-prefix buckets)
      val docs = t(s, dir, "documents")
      graft.pipelines.Dsir.importanceScores(
        docs, docs.filter(col("source") === "src0"), "doc_id", "text",
        nBuckets = 64)
        .orderBy(col("doc_id"))
    }),

    "q_event_transitions" -> ((s, dir) => {
      // per-user behavioral transition matrix (Markov counts): which
      // event type follows which — lag window per user (one keyed
      // shuffle), then a tiny type×type aggregate; share in exact
      // integer basis points of the from-type total
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val tr = t(s, dir, "events")
        .withColumn("from_type", lag(col("event_type"), 1).over(w))
        .filter(col("from_type").isNotNull)
        .select(col("from_type"), col("event_type").as("to_type"))
      val counts = tr.groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      val totals = counts.groupBy(col("from_type"))
        .agg(sum(col("n")).as("n_from"))
      counts.join(totals, Seq("from_type"))
        .select(col("from_type"), col("to_type"), col("n"),
          expr("(n * 10000) div n_from").as("share_bp"))
        .orderBy(col("from_type"), col("to_type"))
    }),

    "q_pagerank" -> ((s, dir) => {
      // fixed-point integer PageRank over the part-transition graph
      // (consecutive line numbers within an order define src→dst edges,
      // weighted by transition count): 3 damped rounds of the pinned
      // BIGINT recurrence — bit-identical across partitionings/engines.
      // l_partkey joins the sort key because (orderkey, linenumber) has
      // ties: with partkey in the key the ordered PARTKEY sequence is a
      // pure function of the row multiset (rows tying on the full key
      // carry equal partkeys, and swapping equal elements changes no
      // transition), so both engines derive the identical edge list
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_partkey"))
      val edges = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
        .withColumn("dst", lead(col("l_partkey"), 1).over(w))
        .filter(col("dst").isNotNull)
        .groupBy(col("l_partkey").as("src"), col("dst"))
        .agg(count(lit(1)).as("weight"))
      graft.operators.PageRank.rank(edges, iters = 3)
        .orderBy(col("node"))
    }),

    "q_vocab_coverage" -> ((s, dir) => {
      // tokenizer/corpus QA: per-doc out-of-vocabulary mass against the
      // top-30 corpus terms (count desc, term asc — a total order, so
      // the vocab set is engine-deterministic); exact integer basis
      // points, global top-V via TakeOrderedAndProject
      graft.pipelines.Lexical.vocabCoverage(
        t(s, dir, "documents"), "doc_id", "text", vocabSize = 30)
        .orderBy(col("doc_id"))
    }),

    "q_unigram_logloss" -> ((s, dir) => {
      // CCNet/RedPajama-style perplexity-proxy quality score: mean token
      // surprisal under the corpus unigram model, floor-quantized per
      // DISTINCT term, exact BIGINT sums per doc
      graft.pipelines.Lexical.unigramLogloss(
        t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    "q_boilerplate" -> ((s, dir) => {
      // template/boilerplate mining: the most document-spanning 5-token
      // windows (headers, footers, nav text at web scale) — the
      // detection view whose removal twin is q_span_dedup; sliding
      // windows (every offset, unlike span dedup's disjoint chunks) so
      // templates at any alignment surface
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("__t"))
        .filter(size(col("__t")) >= 5)
      toks.select(col("doc_id"), explode(array_distinct(
          transform(sequence(lit(0), size(col("__t")) - 5),
            i => array_join(slice(col("__t"), (i + 1).cast("int"), lit(5)), " "))))
          .as("span"))
        .groupBy(col("span")).agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("span").asc)
        .limit(20)
    }),

    "q_pseudonymize" -> ((s, dir) => {
      // deterministic pseudonymization — the privacy family's THIRD
      // member next to redaction (q_pii_redact) and the k-anonymity
      // gate: stable surrogate tokens (same input → same token, across
      // runs/engines) via the portable md5 prefix, so joins and
      // distinct-counts still work on the pseudonymized table while the
      // raw identifier never leaves; pure narrow map, zero shuffle
      t(s, dir, "events")
        .select(col("event_id"),
          concat(lit("u_"), substring(md5(concat(lit("graft:"),
            col("user_id"))), 1, 12)).as("user_token"),
          col("event_type"), col("value"))
        .orderBy(col("event_id"))
    }),

    "q_event_paths" -> ((s, dir) => {
      // frequent 3-step behavioral paths (sequence mining one rung past
      // q_event_transitions' order-2): two lag windows over the same
      // keyed exchange, path counts, deterministic top-20
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .withColumn("t1", lag(col("event_type"), 2).over(w))
        .withColumn("t2", lag(col("event_type"), 1).over(w))
        .filter(col("t1").isNotNull && col("t2").isNotNull)
        .groupBy(col("t1"), col("t2"), col("event_type").as("t3"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
        .limit(20)
    }),

    "q_rolling_active" -> ((s, dir) => {
      // trailing-7-day distinct active users per day (the WAU curve):
      // the (day, user) DISTINCT frame fans out over 7 day-offsets —
      // bounded ×7, never a data-sized window — then one distinct count
      // per day; window-complete days only (the first 6 are partial)
      val du = t(s, dir, "events")
        .select(expr("cast(ts as long) div 86400").as("day"), col("user_id"))
        .distinct()
      val bounds = du.agg(min(col("day")), max(col("day"))).head()
      val (d0, d1) = (bounds.getLong(0), bounds.getLong(1))
      du.select(explode(sequence(col("day"), col("day") + 6L)).as("asof_day"),
          col("user_id"))
        .filter(col("asof_day") >= d0 + 6L && col("asof_day") <= d1)
        .groupBy(col("asof_day"))
        .agg(countDistinct(col("user_id")).as("wau"))
        .orderBy(col("asof_day"))
    }),

    "q_latency_profile" -> ((s, dir) => {
      // ship→receipt latency percentiles per ship mode: DISCRETE
      // rank-selected p50/p90 day counts (exact integers — the
      // q_mad_outliers element-selection rule), one sort-window per mode
      import org.apache.spark.sql.expressions.Window
      val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
      val o = t(s, dir, "orders").select(col("o_orderkey").as("l_orderkey"),
        col("o_orderdate"), col("o_orderpriority"))
      val lat = li.join(o, Seq("l_orderkey"))
        .select(col("o_orderpriority"),
          datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("lat"))
        .filter(col("lat").isNotNull)
      val wv = Window.partitionBy(col("o_orderpriority")).orderBy(col("lat"))
      val wg = Window.partitionBy(col("o_orderpriority"))
      lat.withColumn("__rn", row_number().over(wv))
        .withColumn("__n", count(lit(1)).over(wg))
        .withColumn("__p50", max(when(col("__rn") === expr("(__n + 1) div 2"),
          col("lat"))).over(wg))
        .withColumn("__p90", max(when(
          col("__rn") === greatest(expr("(__n * 9000 + 9999) div 10000"), lit(1L)),
          col("lat"))).over(wg))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), max(col("__p50")).as("p50_days"),
          max(col("__p90")).as("p90_days"))
        .orderBy(col("o_orderpriority"))
    }),

    "q_attribution_last_touch" -> ((s, dir) => {
      // last-touch attribution: every purchase credits the user's most
      // recent preceding view/click within 24h — ONE backward as-of
      // join (RUNNING-frame carry), then the window check nulls credits
      // older than the lookback; the classic marketing-attribution query
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val touches = ev.filter(col("event_type").isin("view", "click"))
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("touch_id")) // dedup exact-ts ties
        .withColumn("touch_ts", col("ts")) // ride the payload: the
        // lookback check needs the matched row's time
      AsOf.joinAsOf(purchases, touches, Seq("user_id"), "ts",
          Seq("touch_id", "touch_ts"), direction = "backward")
        .select(col("event_id"), col("user_id"),
          when(col("asof_touch_ts").isNotNull &&
            col("ts").cast("long") - col("asof_touch_ts").cast("long") <= 86400L,
            col("asof_touch_id")).as("credited_touch_id"))
        .orderBy(col("event_id"))
    }),

    "q_score_calibrate" -> ((s, dir) => {
      // cross-source quality-score calibration: raw scores from
      // different domains are incomparable (web-crawl lengths vs wiki
      // lengths) — the published fix is within-source PERCENTILE
      // normalization; exact integer ((rank−1)·10⁴) div (n−1), rank
      // total-ordered by (score, id); singleton sources pin to 5000
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source"))
        .orderBy(col("n_chars").asc, col("doc_id").asc)
      val wg = Window.partitionBy(col("source"))
      t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
        .withColumn("__rk", row_number().over(w))
        .withColumn("__n", count(lit(1)).over(wg))
        .withColumn("pct_bp", when(col("__n") === 1, 5000L)
          .otherwise(expr("((__rk - 1) * 10000) div (__n - 1)")))
        .select(col("doc_id"), col("source"), col("n_chars"), col("pct_bp"))
        .orderBy(col("doc_id"))
    }),

    "q_dataset_card" -> ((s, dir) => {
      // one-row corpus datasheet (the summary block of a dataset card):
      // size, token mass, char bounds, source/lang cardinalities, and
      // the normalized-dup rate — three bounded aggregates crossJoined
      // as 1-row broadcasts; the only corpus-keyed shuffle is the
      // distinct over normalized text (the dup rate needs it)
      val d = t(s, dir, "documents")
      val base = d.agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(size(TextFunctions.tokens(col("text"))).cast("long")).as("total_tokens"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      val cards = d.select(col("source"), col("lang"))
        .agg(countDistinct(col("source")).as("n_sources"),
          countDistinct(col("lang")).as("n_langs"))
      val uniq = d.select(TextFunctions.normalizeForDedup(col("text")).as("__n"))
        .distinct().agg(count(lit(1)).as("n_unique"))
      base.crossJoin(broadcast(cards)).crossJoin(broadcast(uniq))
        .withColumn("dup_bp", expr("10000 - (n_unique * 10000) div n_docs"))
    }),

    "q_drift_timeline" -> ((s, dir) => {
      // period-over-period PSI down the event stream (each day scored
      // against its predecessor): the MONITORING view of drift — the
      // predecessor join is pure arithmetic on the integer day index
      // (period+1), no window, no range exchange; all scoring work runs
      // on the days×buckets count summary
      operators.Drift.psiSeries(t(s, dir, "events"), col("value"),
        Seq(50.0, 100.0, 200.0, 350.0),
        expr("cast(ts as long) div 86400"))
        .orderBy(col("period"))
    }),

    "q_contrastive_pairs" -> ((s, dir) => {
      // (anchor, positive, negative) triplets for retrieval-encoder
      // training (SimCSE/DPR shape): positives = verified near-dups in
      // a Jaccard band, negatives = hash-picked docs PROVEN not
      // near-dup. Fully hash-checked: the negative assignment injects a
      // PORTABLE multiplicative hash (the round-7 rule — an
      // engine-private hash must never decide driver-checked output;
      // xxhash64 stays the production default), and the positive set
      // replays as the exact-Jaccard pair set — equality holds because
      // this corpus has NO pair in (0.30, 0.80) (measured at all three
      // SFs), so every qualifying pair sits where the 16x4 banding's
      // per-pair recall is >= 1 - 2.3e-4 and the LSH candidate set is
      // verified complete by the gate itself. jaccard projects as
      // HALF_UP basis points (floor(j*1e4+0.5) of the 4-digit rounded
      // double == exact-rational HALF_UP — never a raw double compare).
      val ph = (c: Column, s2: Long) =>
        pmod(pmod(c, lit(1000003L)) * 2654435761L + lit(s2 * 40503L),
          lit(1000000007L))
      graft.pipelines.ContrastivePairs.mine(
        t(s, dir, "documents"), "doc_id", "text",
        minJbp = 5000, maxJbp = 9900, hashFn = ph)
        .select(col("anchor_id"), col("positive_id"), col("negative_id"),
          floor(col("jaccard") * 10000.0 + 0.5).cast("long").as("jaccard_bp"))
        .orderBy(col("anchor_id"), col("positive_id"))
    }),

    "q_dedup_keep_best" -> ((s, dir) => {
      // near-dup cluster canonicalization by QUALITY, not min-id: the
      // published pipelines keep the best member of each duplicate
      // group (longest here; any score column slots in) — one keyed
      // aggregate, winner = max (n_chars, -doc_id) struct
      t(s, dir, "documents")
        .groupBy(TextFunctions.normalizeForDedup(col("text")).as("__norm"))
        .agg(max(struct(col("n_chars").as("nc"),
          (-col("doc_id")).as("negid"))).as("__w"),
          count(lit(1)).as("n_copies"))
        .select((-col("__w.negid")).as("doc_id"),
          col("__w.nc").as("n_chars"), col("n_copies"))
        .orderBy(col("doc_id"))
    }),

    "q_source_overlap" -> ((s, dir) => {
      // cross-source contamination matrix: how many doc pairs share a
      // verbatim 8-token passage, per (source, source) cell — the
      // corpus-audit rollup of q_shared_passages' pair detection
      val docs = t(s, dir, "documents")
      val pairs = graft.dedup.Decontaminate.selfOverlaps(
        docs, "doc_id", "text", n = 8, minShared = 1)
      val src = docs.select(col("doc_id"), col("source"))
      pairs
        .join(broadcast(src.select(col("doc_id").as("id_a"),
          col("source").as("__sa"))), Seq("id_a"))
        .join(broadcast(src.select(col("doc_id").as("id_b"),
          col("source").as("__sb"))), Seq("id_b"))
        .select(least(col("__sa"), col("__sb")).as("source_x"),
          greatest(col("__sa"), col("__sb")).as("source_y"),
          col("n_shared_grams"))
        .groupBy(col("source_x"), col("source_y"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("n_shared_grams")).as("n_shared_grams"))
        .orderBy(col("source_x"), col("source_y"))
    }),

    "q_winsorize" -> ((s, dir) => {
      // per-group winsorization to DISCRETE [p5, p95] cuts — the
      // distribution-aware tier of the reference's constant default
      // fill; rank-selected cuts are actual data values, so every
      // clamped double is bit-exact cross-engine
      graft.operators.Robust.winsorize(
        t(s, dir, "events").select(col("event_id"), col("event_type"), col("value")),
        Seq("event_type"), "value", loBp = 500, hiBp = 9500)
        .orderBy(col("event_id"))
    }),

    "q_impute_median" -> ((s, dir) => {
      // per-group median imputation of missing values (nulls planted
      // deterministically — the feed has none): filled cells take the
      // group's DISCRETE lower median, an existing value, bit-exact
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          when(col("event_id") % 13 === 0, lit(null).cast("double"))
            .otherwise(col("value")).as("value"))
      graft.operators.Robust.imputeGroupMedian(ev, Seq("event_type"), "value")
        .orderBy(col("event_id"))
    }),

    "q_bigram_logloss" -> ((s, dir) => {
      // order-2 surprisal: catches locally-incoherent token ORDER that
      // unigram surprisal misses — the next rung toward KenLM filters
      graft.pipelines.Lexical.bigramLogloss(
        t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    "q_kneser_ney" -> ((s, dir) => {
      // order-3 interpolated Kneser-Ney — the published CCNet/KenLM
      // perplexity-filter rung above the logloss pair: continuation
      // counts as plain grouped counts over the trigram table, the
      // D=0.75 absolute-discount chain in pinned doubles, surprisal
      // quantized once per distinct trigram, exact BIGINT doc sums
      graft.pipelines.Lexical.kneserNeyLogloss(
        t(s, dir, "documents"), "doc_id", "text", discountBp = 7500)
        .orderBy(col("doc_id"))
    }),

    "q_bpe_train" -> ((s, dir) => {
      // BPE vocabulary induction (Sennrich et al. 2016): the subword
      // merge table trained on the corpus' word-frequency frame — all
      // corpus-scale work is ONE word count; the merge loop is
      // vocabulary-sized. The oracle replays all 30 merge rounds as a
      // recursive CTE: word state as a per-symbol TAB+sym+NL string so
      // one replace() IS the greedy left-to-right non-overlapping
      // merge (matches can never share characters or start
      // mid-symbol), best pair by a composite (count desc, pair asc)
      // sortable key; BpeSpec additionally proves the merge sequence
      // equals the published algorithm's reference implementation.
      graft.pipelines.Bpe.train(t(s, dir, "documents"), "text",
        numMerges = 30)
        .orderBy(col("rank"))
    }),

    "q_sample_norepl" -> ((s, dir) => {
      // fixed-budget quality-weighted sampling (A-Res, Efraimidis &
      // Spirakis 2006): exactly 100 docs, inclusion ∝ length weight,
      // reproducible across runs/engines/partitionings; global top-k
      // via TakeOrderedAndProject
      val d = t(s, dir, "documents").select(col("doc_id"), col("n_chars"),
        (col("doc_id") % 1048573L * 2654435761L % 1000000L).as("__h"))
      graft.pipelines.Mixture.sampleWithoutReplacement(
        d, k = 100, greatest(col("n_chars"), lit(1L)), col("__h"),
        Seq(col("doc_id").asc))
        .select(col("doc_id"), col("n_chars"), col("priority_q"))
        .orderBy(col("priority_q"), col("doc_id"))
    }),

    "q_mmr_rerank" -> ((s, dir) => {
      // diversified retrieval finalizer (MMR, Carbonell & Goldstein
      // 1998): the greedy runs driver-side over the BOUNDED top-40
      // candidate set (the Binning-boundaries collect tier). The
      // oracle replays the 10 greedy steps as a recursive CTE — the
      // integer objective (rank-based RRF relevance, floored cosine
      // bp, exact tie-break) makes each selection a pure argmax the
      // SQL reproduces; MmrSpec additionally proves the selection
      // against an independent replay and its order/partitioning
      // invariance. Candidates come from the oracle-green brute-force
      // cosine stage.
      val emb = t(s, dir, "embeddings")
      val topk = graft.similarity.Knn.bruteForceTopK(
        emb, emb.filter(col("vec_id") === 0), k = 40)
        .withColumn("rel_rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("cos_sim").desc, col("neighbor_id"))))
      val cands = topk.join(emb, topk("neighbor_id") === emb("vec_id"))
        .select(col("neighbor_id").as("id"), col("rel_rank"), col("embedding"))
      graft.similarity.Mmr.rerank(cands, "id", "rel_rank", "embedding", k = 10)
        .orderBy(col("mmr_rank"))
    }),

    "q_chi_square" -> ((s, dir) => {
      // Pearson chi-square independence test: nation × market segment —
      // the classic "is the mix uniform across regions" report. Three
      // map-side-combinable grouped counts; the grid is the CROSS JOIN
      // of the two aggregated margins (25×5, broadcast); zero-observed
      // cells included; exact BIGINT inner term, one pinned double
      // division per cell, BIGINT sum of quantized terms.
      Stats.chiSquare(t(s, dir, "customer"), "c_nationkey", "c_mktsegment")
        .orderBy(col("c_nationkey"), col("c_mktsegment"))
    }),

    "q_ab_test" -> ((s, dir) => {
      // A/B readout in one aggregation pass: deterministic 50/50 split
      // by the portable multiplicative hash of the customer key; Welch
      // t on order value (cents) + pooled two-proportion z on the
      // high-value-order conversion flag. All eight moments ride ONE
      // agg with map-side combine; the finishes are pinned double
      // expressions over the single-row frame.
      val o = t(s, dir, "orders").select(
        when((col("o_custkey") % 1048573L) * 2654435761L % 1000000L < 500000L,
          lit(0L)).otherwise(lit(1L)).as("variant"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("cents"))
        .withColumn("conv",
          when(col("cents") > 20000000L, lit(1L)).otherwise(lit(0L)))
      Stats.welchAb(o, "variant", "cents", "conv")
    }),

    "q_survival_km" -> ((s, dir) => {
      // Kaplan-Meier customer-lifetime curve: duration = days between a
      // customer's first and last order; churned (event=1) when the
      // last order predates the dataset horizon by a year, else
      // censored. Subjects aggregate to one row per distinct duration
      // (map-side), at-risk counts are an exclusive cumsum over that
      // tiny frame, and the product-limit fold is an exact fixed-point
      // integer recurrence over EVENT TIMES — bounded by the day
      // resolution, never by subject count.
      val byCust = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(min(to_date(col("o_orderdate"))).as("first_d"),
          max(to_date(col("o_orderdate"))).as("last_d"))
      val mx = byCust.agg(max(col("last_d")).as("__mx"))
      val subj = byCust.crossJoin(broadcast(mx)).select(
        datediff(col("last_d"), col("first_d")).cast("long").as("duration"),
        when(datediff(col("__mx"), col("last_d")) >= 365, lit(1L))
          .otherwise(lit(0L)).as("event"))
      Stats.kaplanMeier(subj, "duration", "event")
        .orderBy(col("duration"))
    }),

    "q_acf" -> ((s, dir) => {
      // autocorrelation of daily revenue at lags 1..7 — the
      // seasonality screen run before picking a forecast model. The
      // fact table collapses to one row per day first (exact cents
      // sums), so the lag explode and joins touch ~2.4k rows however
      // large the input; per-lag Pearson from exact decimal moments.
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
          .as("rev_c"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("d")))
          .cast("long"))
      Stats.acf(daily, "rn", "rev_c", maxLag = 7).orderBy(col("lag"))
    }),

    "q_seasonal" -> ((s, dir) => {
      // classical additive decomposition of daily revenue: centered
      // 7-day MA trend, day-of-week seasonal means of the detrended
      // series, residual — all EXACT floor-divided integers, so
      // x = trend + seasonal + resid holds bit-for-bit wherever the
      // trend window is full. Day-of-week from epoch-day arithmetic
      // (portable; engine dayofweek() conventions differ).
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
          .as("rev_c"))
        .withColumn("dow",
          (datediff(col("d"), to_date(lit("1970-01-01"))) % 7).cast("long"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("d")))
          .cast("long"))
      Stats.decomposeAdditive(daily, "rn", "dow", "rev_c", window = 7)
        .select(date_format(col("d"), "yyyy-MM-dd").as("d"), col("rev_c"),
          col("trend").as("trend_c"), col("seasonal").as("seasonal_c"),
          col("resid").as("resid_c"))
        .orderBy(col("d"))
    }),

    "q_holt" -> ((s, dir) => {
      // Holt linear-trend smoothing of monthly revenue per nation
      // (alpha = beta = 1/4), exact integer recurrence with floor
      // division pinned on both engines — the level-and-trend
      // generalization of q_ewma, per-key sequential by nature (ONE
      // keyed shuffle, O(1) state, ~84 rows per nation after the agg).
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))
      val mon = t(s, dir, "orders")
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nation"),
          trunc(to_date(col("o_orderdate")), "mon").as("month"))
        .agg(sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
          .as("rev_c"))
      Recurrences.holt(mon, Seq("nation"), Seq("month"), "rev_c",
          aNum = 1L, aDen = 4L, bNum = 1L, bDen = 4L)
        .select(col("nation"), date_format(col("month"), "yyyy-MM").as("month"),
          col("rev_c"), col("holt_q"))
        .orderBy(col("nation"), col("month"))
    }),

    "q_sorted_neighborhood" -> ((s, dir) => {
      // sorted-neighborhood record-linkage blocking (Hernández-Stolfo
      // SIGMOD'95): sort by the blocking key, compare only rows within
      // a w=3 rank window — O(n·w) candidate pairs instead of the n²
      // all-pairs wall. The global rank runs the range-partitioned
      // two-pass machine (no one-task window); the window join is a
      // ×w explode + ONE equi-join on the target rank.
      val p = t(s, dir, "part").select(col("p_partkey"), col("p_name"))
      val ranked = RunningTotals.globalRank(p,
        Seq(col("p_name").asc, col("p_partkey").asc), "rk")
      val left = ranked
        .select(col("p_partkey").as("a_key"), col("p_name").as("a_name"),
          col("rk").as("ra"))
        .withColumn("__i", explode(lit(Array(1L, 2L, 3L))))
        .withColumn("rk", col("ra") + col("__i"))
      val right = ranked
        .select(col("p_partkey").as("b_key"), col("p_name").as("b_name"),
          col("rk"))
      left.join(right, Seq("rk"))
        .withColumn("sim_bp",
          floor(graft.functions.JaroWinkler.jaroWinkler(
            col("a_name"), col("b_name")) * 10000.0 + 0.5).cast("long"))
        .filter(col("sim_bp") >= 8800L)
        .select(col("a_key"), col("b_key"), col("sim_bp"))
        .orderBy(col("a_key"), col("b_key"))
    }),

    "q_attribution_linear" -> ((s, dir) => {
      // linear multi-touch attribution: every view/click in the 24h
      // before a purchase shares the credit EQUALLY, in basis points
      // that sum to EXACTLY 10000 per conversion (largest-remainder on
      // equal weights: base = 10000 div n, the 10000 mod n most recent
      // touches get +1) — rate-based credit can only sum in
      // expectation. Same-user equi-join + range predicate, two
      // windows over one purchase-keyed exchange.
      val ev = t(s, dir, "events")
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("p_ts"))
      val tch = ev.filter(col("event_type").isin("view", "click"))
        .select(col("event_id").as("touch_id"), col("user_id"),
          col("ts").as("t_ts"))
      val j = p.join(tch, Seq("user_id"))
        .filter(col("t_ts") < col("p_ts") &&
          col("t_ts") >= col("p_ts") - expr("INTERVAL 24 HOURS"))
      val byP = Window.partitionBy(col("purchase_id"))
      j.withColumn("n", count(lit(1)).over(byP))
        .withColumn("rk", row_number().over(
          byP.orderBy(col("t_ts").desc, col("touch_id").desc)))
        .select(col("purchase_id"), col("touch_id"),
          (expr("10000 DIV n") +
            when(col("rk") <= pmod(lit(10000L), col("n")), lit(1L))
              .otherwise(lit(0L))).cast("long").as("credit_bp"))
        .orderBy(col("purchase_id"), col("touch_id"))
    }),

    "q_funnel_time" -> ((s, dir) => {
      // time-to-convert distribution: per user, seconds from the FIRST
      // view to the first purchase at-or-after it; exact DISCRETE
      // percentiles by rank selection (the q_mad_outliers rule —
      // element selection cannot split cross-engine where
      // interpolation can). Ranks via the range-partitioned global
      // rank; one conditional aggregate picks all four quantiles.
      val ev = t(s, dir, "events").filter(col("user_id").isNotNull)
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("v_ts"))
      val pu = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"))
      val delays = pu.join(v, Seq("user_id"))
        .filter(col("p_ts") >= col("v_ts"))
        .groupBy(col("user_id"))
        .agg((min(col("p_ts")).cast("long") - min(col("v_ts")).cast("long"))
          .as("delay_s"))
      val ranked = RunningTotals.globalRank(delays,
        Seq(col("delay_s").asc, col("user_id").asc), "rk")
      val n = delays.agg(count(lit(1)).as("n"))
      def pick(p: Int) = max(when(
        col("rk") === expr(s"((n - 1) * $p) DIV 100 + 1"), col("delay_s")))
      ranked.crossJoin(broadcast(n)).agg(
        max(col("n")).as("n_converted"),
        pick(25).as("p25_s"), pick(50).as("p50_s"),
        pick(75).as("p75_s"), pick(90).as("p90_s"))
    }),

    "q_cuped" -> ((s, dir) => {
      // CUPED variance-reduced A/B readout (Deng et al. WSDM'13):
      // pre-period spend (orders before 1998) is the covariate for the
      // experiment-period metric — per-customer subjects, θ pooled
      // across arms, one aggregation pass for all nine moments; the
      // vr_bp column is corr²(X,Y): the CI-shrink the covariate buys.
      val o = t(s, dir, "orders").select(col("o_custkey"),
        to_date(col("o_orderdate")).as("d"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("cents"))
      val pre = o.filter(col("d") < lit("1998-01-01"))
        .groupBy(col("o_custkey")).agg(sum(col("cents")).as("x"))
      val post = o.filter(col("d") >= lit("1998-01-01"))
        .groupBy(col("o_custkey")).agg(sum(col("cents")).as("y"))
      val subj = post.join(pre, Seq("o_custkey"), "left")
        .select(
          when((col("o_custkey") % 1048573L) * 2654435761L % 1000000L < 500000L,
            lit(0L)).otherwise(lit(1L)).as("variant"),
          coalesce(col("x"), lit(0L)).as("x"), col("y"))
      Stats.cuped(subj, "variant", "x", "y")
    }),

    "q_ab_test_maintained" -> ((s, dir) => {
      // the A/B readout maintained INCREMENTALLY: a third of the orders
      // arrive later as CDC — poisoned placeholder rows (cents+1) sit
      // in the base state and are retracted (D) exactly when the true
      // rows insert (I); the folded ONE-ROW moment state feeds the same
      // finish and must yield the identical readout — registered
      // against q_ab_test's VERBATIM oracle, so the incremental path
      // hash-matches the one-shot scan. No fact rescan: the fold
      // touches the delta only.
      def shaped(df: DataFrame) = df.select(col("o_orderkey"),
        when((col("o_custkey") % 1048573L) * 2654435761L % 1000000L < 500000L,
          lit(0L)).otherwise(lit(1L)).as("variant"),
        col("cents"),
        when(col("cents") > 20000000L, lit(1L)).otherwise(lit(0L)).as("conv"))
      val o = shaped(t(s, dir, "orders").withColumn("cents",
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long")))
      val late = o.filter(col("o_orderkey") % 3 === 0)
      val poison = shaped(t(s, dir, "orders")
        .withColumn("cents",
          floor(col("o_totalprice") * 100.0 + 0.5).cast("long") + 1L)
        .filter(col("o_orderkey") % 3 === 0))
      val base = o.filter(col("o_orderkey") % 3 =!= 0).unionByName(poison)
      val state0 = Stats.abMoments(base, "variant", "cents", "conv")
      val delta = poison.withColumn("op", lit("D"))
        .unionByName(late.withColumn("op", lit("I")))
      Stats.welchFinish(
        Stats.foldAbMoments(state0, delta, "variant", "cents", "conv", "op"))
    }),

    "q_reorder_point" -> ((s, dir) => {
      // inventory safety stock: per part, daily-demand mean/variance
      // over the GLOBAL sales horizon (zero-demand days count — days
      // with sales alone overstate the mean), lead time 7 days, z=1.65
      // (~95% service): ROP = mean·L + z·σ·√L. Two keyed aggregates
      // (map-side combinable) + a broadcast 1-row horizon; pinned
      // double finish, variance clamped at 0 (float rounding on a
      // constant series must not reach sqrt as a negative).
      val li = t(s, dir, "lineitem").select(col("l_partkey"),
        to_date(col("l_shipdate")).as("d"), col("l_quantity").cast("long").as("q"))
      // ONE fact scan: the horizon count re-aggregates the pinned
      // part-day frame (every sales day appears there by construction)
      val perDay = li.groupBy(col("l_partkey"), col("d"))
        .agg(sum(col("q")).as("qd")).localCheckpoint(true)
      val days = perDay.agg(countDistinct(col("d")).as("nd"))
      val m = perDay.groupBy(col("l_partkey")).agg(
        count(lit(1)).as("days_sold"),
        sum(col("qd")).as("total_qty"),
        sum(col("qd") * col("qd")).as("sqq"))
        .crossJoin(broadcast(days))
      def D(c: Column) = c.cast("double")
      val mean = D(col("total_qty")) / D(col("nd"))
      val varD = greatest(
        (D(col("sqq")) - D(col("total_qty")) * D(col("total_qty")) / D(col("nd")))
          / D(col("nd")), lit(0.0))
      val rop = mean * lit(7.0) + lit(1.65) * sqrt(varD) * sqrt(lit(7.0))
      m.select(col("l_partkey"), col("days_sold"), col("total_qty"),
          floor(rop * 100.0 + 0.5).cast("long").as("rop_q"))
        .orderBy(col("l_partkey"))
    }),

    "q_price_elasticity" -> ((s, dir) => {
      // log-log demand regression per brand: elasticity = OLS slope of
      // ln(quantity) on ln(retail price) — the econometrics staple.
      // Both logs floor-quantized at 10⁴ (the psi-family ln rule), so
      // every moment sum is EXACT integer; one pinned double division
      // per brand finishes the slope.
      val li = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"))
      val p = t(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
      val j = li.join(p, col("l_partkey") === col("p_partkey")).select(
        col("p_brand"),
        floor(log(col("p_retailprice").cast("double")) * 10000.0 + 0.5)
          .cast("long").as("x"),
        floor(log(col("qty").cast("double")) * 10000.0 + 0.5)
          .cast("long").as("y"))
      def S(c: Column) = sum(c.cast("decimal(38,0)"))
      def D(c: Column) = c.cast("double")
      val m = j.groupBy(col("p_brand")).agg(count(lit(1)).as("n_items"),
        S(col("x")).as("sx"), S(col("y")).as("sy"),
        S(col("x") * col("y")).as("sxy"), S(col("x") * col("x")).as("sxx"))
      m.select(col("p_brand"), col("n_items"),
          floor((D(col("n_items")) * D(col("sxy")) - D(col("sx")) * D(col("sy"))) /
            (D(col("n_items")) * D(col("sxx")) - D(col("sx")) * D(col("sx")))
            * 10000.0 + 0.5).cast("long").as("elasticity_bp"))
        .orderBy(col("p_brand"))
    }),

    "q_concordance" -> ((s, dir) => {
      // KWIC concordance — the corpus-QA view reviewers actually read:
      // every occurrence of the term with ±2 tokens of context.
      // Tokenization uses the PINNED whitespace class (the round-6
      // cross-engine rule); pure map + one generator, no shuffle, no
      // per-doc state — scales as a scan.
      val toks = t(s, dir, "documents").filter(trim(col("text")) =!= "")
        .select(col("doc_id"), split(trim(col("text")),
          graft.functions.TextFunctions.WhitespaceClass + "+").as("l"))
      val occ = toks
        .select(col("doc_id"), col("l"), posexplode(col("l")))
        .filter(col("col") === "scan")
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"), col("l"))
      val i = col("pos")
      val lstart = greatest(i - 2, lit(1L))
      occ.select(col("doc_id"), col("pos"),
          array_join(slice(col("l"), lstart.cast("int"),
            (i - lstart).cast("int")), " ").as("left_ctx"),
          array_join(slice(col("l"), (i + 1).cast("int"),
            least(lit(2L), size(col("l")) - i).cast("int")), " ").as("right_ctx"))
        .orderBy(col("doc_id"), col("pos"))
    }),

    "q_l_diversity" -> ((s, dir) => {
      // the privacy gate k-anonymity misses: a class can be large yet
      // HOMOGENEOUS in the sensitive attribute — everyone in it leaks
      // the value. Classes whose sensitive diversity < l=3; exact
      // distinct by requirement (a release gate cannot run on an
      // estimate); one grouped aggregate, class-sized output.
      val c = t(s, dir, "customer")
        .withColumn("balance_band", floor(col("c_acctbal") / 1000).cast("long"))
        .withColumn("balance_c",
          floor(col("c_acctbal") * 100.0 + 0.5).cast("long"))
      Diagnostics.lDiversityViolations(c,
        Seq("c_nationkey", "c_mktsegment", "balance_band"), "balance_c", l = 3)
        .orderBy(col("c_nationkey"), col("c_mktsegment"), col("balance_band"))
    }),

    "q_propensity_match" -> ((s, dir) => {
      // observational effect of the BUILDING segment on customer spend:
      // 1-NN propensity-style matching WITH replacement, stratified by
      // nation (exact block) + nearest account balance (score), caliper
      // $300. Matching is an AS-OF NEAREST join on the score axis —
      // the single-shuffle two-frame machine, never treated×control.
      val cents = floor(col("c_acctbal") * 100.0 + 0.5).cast("long")
      val outcome = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
          .as("__oc"))
      val pop = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), cents.as("score"),
          (col("c_mktsegment") === "BUILDING").as("__tr"))
        .join(outcome, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), col("c_nationkey"), col("score"),
          col("__tr"), coalesce(col("__oc"), lit(0L)).as("outcome"))
      Causal.propensityMatch(pop, "c_custkey", "c_nationkey",
          "score", "__tr", "outcome", caliper = 30000L)
        .orderBy(col("c_custkey"))
    }),

    "q_conformal" -> ((s, dir) => {
      // split-conformal prediction interval per source for document
      // token counts: a portable-HASH half calibrates, the other half
      // measures empirical coverage of the 90% interval (doc_id parity
      // is CONFOUNDED with source in this data — the driver assigns
      // source by doc_id residue; the multiplicative hash decorrelates,
      // caught by the zero-row sf0.001 gate). Residual ranks and the
      // coverage test are INTEGER compares (|y·n − S| in decimal) —
      // exact end to end, one group-keyed exchange.
      val d = t(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("y"),
          (col("doc_id") % 1048573L * 2654435761L % 1000000L < 500000L)
            .as("__cal"))
      Stats.conformalSplit(d, "source", "doc_id", "y", "__cal",
          alphaBp = 1000L)
        .orderBy(col("source"))
    }),

    "q_bootstrap_ci" -> ((s, dir) => {
      // 95% CI on mean order value per priority via the POISSON
      // bootstrap (Chamandy 2012) — the bootstrap that scales: weights
      // from the portable hash, per-replicate sums combine map-side,
      // only B·|groups| rows ever shuffle. B=100 replicates,
      // reproducible across runs, partitionings, and engines.
      val cents = floor(col("o_totalprice") * 100.0 + 0.5).cast("long")
      val o = t(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"),
          cents.as("v"))
      val point = o.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_rows"),
          ((sum(col("v").cast("decimal(38,0)")) -
            pmod(sum(col("v").cast("decimal(38,0)")), count(lit(1)))) /
            count(lit(1))).cast("long").as("mean_cents"))
      Stats.poissonBootstrap(o, "o_orderpriority", "o_orderkey", "v",
          b = 100)
        .join(broadcast(point), Seq("o_orderpriority"))
        .select(col("o_orderpriority"), col("n_rows"), col("mean_cents"),
          col("n_reps"), col("ci_lo"), col("ci_hi"))
        .orderBy(col("o_orderpriority"))
    }),

    "q_hhi" -> ((s, dir) => {
      // market-concentration report per segment: HHI and CR4 over
      // customer revenue shares — entity revenues, squared-share sum,
      // and top-4 rank all on ONE group-keyed exchange; quantization by
      // exact decimal floor division (hhi·10⁸, cr4·10⁴).
      val cents = floor(col("o_totalprice") * 100.0 + 0.5).cast("long")
      val df = t(s, dir, "orders")
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), col("c_custkey"), cents.as("v"))
      Stats.concentration(df, "c_mktsegment", "c_custkey", "v")
        .orderBy(col("c_mktsegment"))
    }),

    "q_fd_discovery" -> ((s, dir) => {
      // schema recovery over the denormalized sales feed: which
      // candidate dependencies actually hold? l_partkey→p_brand is
      // join lineage (g₃=0 certifies it); the others fail with exact
      // TANE g₃ deletion counts. Per candidate: grouped counts only,
      // state ∝ (lhs,rhs) cardinality, map-side combinable.
      val denorm = t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      Diagnostics.fdProfile(denorm, Seq(
          "l_partkey" -> "p_brand",
          "p_brand" -> "p_type",
          "l_orderkey" -> "l_shipdate",
          "l_partkey" -> "l_suppkey"))
        .orderBy(col("lhs"), col("rhs"))
    }),

    "q_twa" -> ((s, dir) => {
      // time-weighted average event value per user over the sample-and-
      // hold stream — the metering staple a plain mean gets wrong when
      // sampling is bursty. Integer cents × integer seconds, one keyed
      // window + one grouped sum on the same exchange.
      val e = t(s, dir, "events").filter(col("user_id").isNotNull)
        .select(col("user_id"), col("ts"), col("event_id"),
          floor(col("value") * 100.0 + 0.5).cast("long").as("v"))
      Resample.timeWeightedAvg(e, "user_id", "ts", "event_id", "v")
        .orderBy(col("user_id"))
    }),

    "q_shapley" -> ((s, dir) => {
      // game-theoretic attribution closing the set beside positional
      // (q_attribution_linear) and Markov removal-effect
      // (q_markov_attribution): channels=players, v(S)=conversions
      // reachable with subset S, credit=Shapley value. Journeys are the
      // SAME 30-minute sessions as the Markov query; distributed work
      // is one keyed window + a ≤2^k-row mask count; the lattice solve
      // is driver-side EXACT BigInt rationals. Unlike Markov (rational
      // solve has no SQL form) the Shapley sum over k=4 channels IS
      // SQL-expressible — the oracle replays the full lattice.
      // ORDER ON TRUNCATED SECONDS everywhere: the oracle's only time
      // grain is floor(epoch(ts)) — ordering by raw microseconds here
      // could split a same-second purchase/click pair differently
      val wE = Window.partitionBy(col("user_id"))
        .orderBy(col("__ep"), col("event_id"))
      val sessions = t(s, dir, "events").filter(col("user_id").isNotNull)
        .withColumn("__ep", col("ts").cast("long"))
        .withColumn("__gap",
          when(col("__ep") - lag(col("__ep"), 1).over(wE) > 1800L, 1L)
            .otherwise(lit(0L)))
        .withColumn("journey_id",
          concat(col("user_id").cast("string"), lit("#"),
            sum(col("__gap")).over(
              wE.rowsBetween(Window.unboundedPreceding, 0)).cast("string")))
      ShapleyAttribution.shapley(sessions, "journey_id", "event_type",
          "__ep", "event_id", "purchase",
          Seq("click", "error", "signup", "view"))
        .orderBy(col("channel"))
    }),

    "q_sprt" -> ((s, dir) => {
      // Wald SPRT per arm over the date-ordered order stream: is the
      // high-value rate 0.50 (H0) or 0.60 (H1)? The always-valid
      // sequential answer to "can I stop the experiment yet". LLR =
      // c·l1 + (n−c)·l0 with integer cumulative counts through the
      // RANGED running-sum machine (a hot arm never funnels one task)
      // and two pinned double constants the oracle re-embeds verbatim.
      val o = t(s, dir, "orders")
        .withColumn("arm", col("o_orderkey") % 2)
        .withColumn("x",
          when(col("o_totalprice") > 200000.0, 1L).otherwise(0L))
      Stats.sprt(o, "arm", Seq(col("o_orderdate"), col("o_orderkey")),
          "x", p0Bp = 5000L, p1Bp = 6000L)
        .orderBy(col("arm"))
    }),

    "q_logrank" -> ((s, dir) => {
      // the inference step after the KM curve: do BUILDING customers'
      // order lifetimes differ from everyone else's? Same subject
      // derivation as q_survival_km, split by segment; O−E and the
      // hypergeometric variance quantize to e8 per event time and sum
      // in BIGINT — one self-contained χ² row.
      val byCust = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(min(to_date(col("o_orderdate"))).as("first_d"),
          max(to_date(col("o_orderdate"))).as("last_d"))
      val mx = byCust.agg(max(col("last_d")).as("__mx"))
      val subj = byCust.crossJoin(broadcast(mx))
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select(
          datediff(col("last_d"), col("first_d")).cast("long").as("duration"),
          when(datediff(col("__mx"), col("last_d")) >= 365, 1L)
            .otherwise(0L).as("event"),
          when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L).as("g"))
      Stats.logRank(subj, "g", "duration", "event")
    }),

    "q_rake" -> ((s, dir) => {
      // survey raking (IPF): customers ACTIVE IN 1997 are a biased
      // subsample — re-weight its (nation × segment) cells so both
      // margins match the full customer base. Distributed work = three
      // grouped counts; the 3-round fit runs driver-side over the
      // ≤125-cell table in exact BigInt with e6 weight quantization —
      // the oracle replays the unrolled iterations in SQL.
      val cust = t(s, dir, "customer")
      val active = t(s, dir, "orders")
        .filter(year(col("o_orderdate")) === 1997)
        .select(col("o_custkey")).distinct()
      val sample = cust.join(active, col("c_custkey") === col("o_custkey"))
        .select(col("c_nationkey").cast("string").as("nation"),
          col("c_mktsegment").as("segment"))
      val rowT = cust.groupBy(col("c_nationkey").cast("string").as("nation"))
        .agg(count(lit(1)).as("t"))
      val colT = cust.groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("t"))
      Raking.rake(sample, "nation", "segment", rowT, colT, iters = 3)
        .orderBy(col("nation"), col("segment"))
    }),

    "q_bfs_reach" -> ((s, dir) => {
      // bounded-hop reachability on the repeat co-purchase graph (the
      // q_communities edge set): distances ≤ 3 from the 5 smallest
      // nodes — the "what does this recall touch" impact query. Each
      // hop is one keyed join + one grouped min (map-side
      // combinable), checkpointed; the oracle replays it as a
      // depth-bounded recursive CTE with a min-dist rollup.
      val li = t(s, dir, "lineitem")
      val pairs = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
        .agg(countDistinct(col("a.l_orderkey")).as("c"))
        .filter(col("c") >= 2)
      // pin the edge build once: seeds AND the BFS adjacency read it —
      // unpinned, the co-purchase self-join would run per reference
      val edges = Graphs.canonicalEdges(pairs, "pa", "pb").localCheckpoint(true)
      val seeds = edges.select(col("u").as("node"))
        .unionAll(edges.select(col("v").as("node")))
        .distinct().orderBy(col("node")).limit(5)
      Graphs.bfsDistances(edges, seeds, maxHops = 3)
        .orderBy(col("node"))
    }),

    "q_mutual_info" -> ((s, dir) => {
      // model-free dependence screen: how much does order priority
      // tell you about order status? MI + marginal entropies + the
      // √(Ha·Hb)-normalized MI; one cell scan, margins re-aggregated
      // from the pinned cell frame (the chi-square one-scan rule),
      // e8-quantized ln terms summed in BIGINT.
      Stats.mutualInfo(t(s, dir, "orders"),
        "o_orderpriority", "o_orderstatus")
    }),

    "q_dtw" -> ((s, dir) => {
      // elastic similarity between event-type daily-volume profiles:
      // Sakoe-Chiba banded DTW (radius 7 days) on exact integer
      // counts — the alignment Euclidean distance gets wrong when one
      // series leads another. Series are post-aggregation (one row
      // per type-day); the k²/2 pairs distribute one-per-task with an
      // O(n·band) two-row DP. The oracle replays the DP by
      // anti-diagonal waves in a recursive CTE (the working table
      // carries diagonals d and d-1, so every cell sees all three
      // predecessors); DtwSpec proves the banded DP against the full
      // matrix and a hand-computed alignment.
      val daily = t(s, dir, "events")
        .groupBy(col("event_type").as("k"), to_date(col("ts")).as("d"))
        .agg(count(lit(1)).as("c"))
        .withColumn("i", datediff(col("d"), to_date(lit("1970-01-01"))))
      Dtw.pairDistances(daily, "k", "i", "c", band = 7)
        .orderBy(col("k1"), col("k2"))
    }),

    "q_t_closeness" -> ((s, dir) => {
      // the third privacy rung after q_k_anonymity (class size) and
      // q_l_diversity (sensitive cardinality): a large, diverse class
      // can still leak by DISTRIBUTION (all high-spenders in one
      // quasi-class). Sensitive attribute = customer revenue decile
      // (rank-based, via the ranged global-rank machine); classes =
      // (nation, segment); ordered-EMD distance, integer-exact.
      val cents = floor(col("o_totalprice") * 100.0 + 0.5).cast("long")
      val rev = t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(sum(cents).as("__rev"))
      val pop = t(s, dir, "customer")
        .join(rev, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
          coalesce(col("__rev"), lit(0L)).as("rev"))
      val n = pop.count()
      val ranked = RunningTotals.globalRank(pop,
        Seq(col("rev"), col("c_custkey")), "__rk")
        .withColumn("bucket", expr(s"((__rk - 1) * 10) div ${n}L"))
      Diagnostics.tCloseness(ranked,
          Seq("c_nationkey", "c_mktsegment"), "bucket", nBuckets = 10)
        .orderBy(col("c_nationkey"), col("c_mktsegment"))
    }),

    "q_qini" -> ((s, dir) => {
      // uplift evaluation (Radcliffe 2007): walking customers best-
      // balance-first, how many INCREMENTAL 1997 purchases does the
      // BUILDING segment show over the scaled rest? Deciles assigned
      // by the ranged global rank (never one sort task); curve counts
      // exact, qini_e4 by the pmod-subtract floor (negatives exact).
      val bal = floor(col("c_acctbal") * 100.0 + 0.5).cast("long")
      val resp = t(s, dir, "orders")
        .filter(year(col("o_orderdate")) === 1997)
        .select(col("o_custkey")).distinct()
        .withColumn("__r", lit(1L))
      val pop = t(s, dir, "customer")
        .join(resp, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), bal.as("score"),
          (col("c_mktsegment") === "BUILDING").as("tr"),
          coalesce(col("__r"), lit(0L)).as("resp"))
      val n = pop.count()
      val ranked = RunningTotals.globalRank(pop,
        Seq(col("score").desc, col("c_custkey")), "__rk")
        .withColumn("decile", expr(s"((__rk - 1) * 10) div ${n}L"))
      Stats.qiniCurve(ranked, "tr", "resp", "decile")
        .orderBy(col("decile"))
    }),

    "q_keywords" -> ((s, dir) => {
      // RAKE keyword extraction (Rose et al. 2010) over the corpus —
      // the keyword-audit view beside TF-IDF's per-doc terms: phrases
      // = maximal stopword-free runs, scored by Σ deg/freq of member
      // words, all integer arithmetic; global top-20 via
      // TakeOrderedAndProject, never a full-frame rank window.
      graft.pipelines.Lexical.rakeKeywords(
          t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("rank"))
    }),

    "q_price_volume_mix" -> ((s, dir) => {
      // the FP&A bridge: WHY did each brand's revenue move 1996→1997 —
      // price, volume, mix/cross, new items, discontinued items. Unit
      // prices never materialize (integer cross products + one floor
      // division per item); the cross term absorbs quantization so the
      // bridge identity holds to the cent at every brand.
      val li = t(s, dir, "lineitem")
        .withColumn("yr", year(col("l_shipdate")))
        .filter(col("yr").isin(1996, 1997))
        .select(col("l_partkey"),
          (col("yr") === 1997).cast("int").as("period"),
          floor(col("l_extendedprice") * 100.0 + 0.5).cast("long").as("rev"),
          floor(col("l_quantity") + 0.5).cast("long").as("qty"))
      val withBrand = li.join(t(s, dir, "part"),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"), col("l_partkey"), col("period"),
          col("rev"), col("qty"))
      Bridge.revenueBridge(withBrand, "p_brand", "l_partkey", "period",
          "rev", "qty")
        .orderBy(col("p_brand"))
    }),

    "q_eb_rates" -> ((s, dir) => {
      // empirical-Bayes discount-rate smoothing per part: small-n
      // parts' raw rates shrink toward the method-of-moments Beta
      // prior — the CTR/ratings shrinkage recipe. Rates quantize to
      // e6 integers, the MoM finish is one pinned double per
      // parameter, every smoothed rate an integer floor division.
      val li = t(s, dir, "lineitem")
        .select(col("l_partkey"),
          (col("l_discount") > 0.05).cast("long").as("hit"))
      Stats.ebSmoothRates(li, "l_partkey", "hit")
        .orderBy(col("l_partkey"))
    }),

    "q_encoding_audit" -> ((s, dir) => {
      // corpus encoding-health audit: replacement chars (U+FFFD),
      // stray C0 controls, zero-width chars, and latin1-decoded-UTF8
      // mojibake pairs — the ingest QA pass before any text filter.
      // The synthetic corpus is clean, so deterministic contamination
      // is CONSTRUCTED per doc (both engines build the identical
      // string — the q_pii_redact recipe); patterns use \x{...}
      // escapes valid in BOTH Java regex and RE2. The chars embed as
      // UNICODE LITERALS here while the oracle uses chr(): Spark's
      // chr() is mod-256 ASCII (chr(8203) = \x0B — a control char!),
      // DuckDB's is the code point — the gate caught the divergence.
      val contaminated = t(s, dir, "documents")
        .withColumn("t2", when(col("doc_id") < 120, concat(col("text"),
          lit(" "),
          expr("repeat('�', cast(doc_id % 3 as int))"),
          expr("repeat('​', cast(doc_id % 2 as int))"),
          when(col("doc_id") % 5 === 0, lit("Ã©"))
            .otherwise(lit("")),
          when(col("doc_id") % 7 === 0, lit("\u0007")).otherwise(lit(""))))
          .otherwise(col("text")))
      contaminated.select(col("doc_id"),
          regexp_count(col("t2"), lit("\\x{FFFD}")).cast("long")
            .as("n_replacement"),
          regexp_count(col("t2"),
            lit("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]")).cast("long")
            .as("n_control"),
          regexp_count(col("t2"), lit("[\\x{200B}-\\x{200D}\\x{FEFF}]"))
            .cast("long").as("n_zerowidth"),
          regexp_count(col("t2"), lit("\\x{00C3}[\\x{0080}-\\x{00BF}]"))
            .cast("long").as("n_mojibake"))
        .withColumn("clean",
          col("n_replacement") + col("n_control") + col("n_zerowidth") +
            col("n_mojibake") === 0L)
        .orderBy(col("doc_id"))
    }),

    "q_compress_ratio" -> ((s, dir) => {
      // Gopher-style compressibility signal (Rae et al. 2021):
      // boilerplate compresses implausibly hard, noise barely at all.
      // Deflate is an opaque codec => mapPartitions boundary (one
      // Deflater per partition), pinned level; rows-only by nature
      // (no SQL zlib) — CompressionSpec pins the semantic invariants.
      graft.functions.Compression.ratios(
          t(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))
    }),

    "q_forecast_reconcile" -> ((s, dir) => {
      // hierarchical forecast reconciliation (top-down forecast
      // proportions, Hyndman et al.): nation-level Holt forecasts and
      // the region-level Holt forecast disagree by construction —
      // reconcile by allocating each region's forecast across its
      // nations ∝ their base forecasts, EXACTLY, via largest
      // remainder. Σ reconciled == region forecast to the cent at
      // every region (the coherence property that makes hierarchical
      // reports add up). Pure composition: two Holt runs + one
      // Allocate — both existing exact machines.
      val c = t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      val mon = t(s, dir, "orders")
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nation"),
          trunc(to_date(col("o_orderdate")), "mon").as("month"))
        .agg(sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
          .as("rev_c"))
      def lastFc(h: DataFrame, key: String, out: String) =
        h.groupBy(col(key))
          .agg(greatest(lit(0L),
            max(struct(col("month"), col("holt_q"))).getField("holt_q"))
            .as(out))
      val natFc = lastFc(Recurrences.holt(mon, Seq("nation"), Seq("month"),
        "rev_c", 1L, 4L, 1L, 4L), "nation", "base_fc")
      val natReg = t(s, dir, "nation")
        .select(col("n_nationkey").as("nation"),
          col("n_regionkey").as("region"))
      val regMon = mon.join(broadcast(natReg), Seq("nation"))
        .groupBy(col("region"), col("month"))
        .agg(sum(col("rev_c")).as("rev_c"))
      val regFc = lastFc(Recurrences.holt(regMon, Seq("region"),
        Seq("month"), "rev_c", 1L, 4L, 1L, 4L), "region", "region_fc")
      val joined = natFc.join(broadcast(natReg), Seq("nation"))
        .join(broadcast(regFc), Seq("region"))
      Allocate.largestRemainder(joined, Seq("region"), "base_fc",
          "region_fc", Seq("nation"), "reconciled_fc")
        .select(col("nation"), col("region"), col("base_fc"),
          col("region_fc"), col("reconciled_fc"))
        .orderBy(col("nation"))
    }),

    "q_croston" -> ((s, dir) => {
      // Croston's method (1972) — THE forecast for intermittent
      // demand, where Holt/EWMA on the raw series just decays to zero
      // between orders: smooth demand SIZES and inter-demand INTERVALS
      // separately over demand occurrences only, forecast rate = z/p.
      // Pure composition: absent months never materialize (the grouped
      // frame holds only demand months; intervals are index gaps), and
      // BOTH smoothers are the existing exact-integer ewma scan — z
      // initializes to the first size, p to the first interval,
      // exactly Croston's convention.
      val li = t(s, dir, "lineitem")
        .withColumn("mn",
          (year(col("l_shipdate")) * 12 + month(col("l_shipdate")) - 1)
            .cast("long"))
        .groupBy(col("l_partkey"), col("mn"))
        .agg(sum(floor(col("l_quantity") + 0.5).cast("long")).as("q"))
      val w = Window.partitionBy(col("l_partkey")).orderBy(col("mn"))
      val withIv = li
        .withColumn("iv", col("mn") - lag(col("mn"), 1).over(w))
      val z = Recurrences.ewma(withIv, Seq("l_partkey"), Seq("mn"), "q",
        1L, 4L, "z_q")
      val zp = Recurrences.ewma(
        z.filter(col("iv").isNotNull), Seq("l_partkey"), Seq("mn"), "iv",
        1L, 4L, "p_q")
      // final state per part: parts need >= 2 demand months (no
      // interval exists otherwise — Croston is undefined)
      zp.groupBy(col("l_partkey"))
        .agg((count(lit(1)) + 1).as("n_periods"),
          max(struct(col("mn"), col("z_q"))).getField("z_q").as("z_q"),
          max(struct(col("mn"), col("p_q"))).getField("p_q").as("p_q"))
        .withColumn("rate_bp", {
          val n = col("z_q") * lit(10000L)
          ((n - pmod(n, col("p_q"))) / col("p_q")).cast("long")
        })
        .orderBy(col("l_partkey"))
    }),

    "q_fano" -> ((s, dir) => {
      // burstiness screen per event type: the Fano factor (index of
      // dispersion) of hourly counts — var/mean = 1 for a Poisson
      // stream, > 1 bursty, < 1 regular; the point-process QA beside
      // ACF/seasonality. Empty hours NEVER materialize: with H total
      // hours, var = Σc²/H − mean² needs only the observed slots
      // (zeros add zero) — one grouped count + exact moments + a
      // pinned double finish.
      val e = t(s, dir, "events")
        .withColumn("__ep", col("ts").cast("long"))
        // integral div, NOT /: long/long plans a double division whose
        // quotient can land one ulp under an exact hour boundary
        .select(col("event_type"), expr("__ep div 3600").as("hr"))
      val span = e.agg((max(col("hr")) - min(col("hr")) + 1).as("__h"))
      val slots = e.groupBy(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("c"))
      def D(c: Column) = c.cast("double")
      slots.groupBy(col("event_type"))
        .agg(sum(col("c")).as("n_events"),
          count(lit(1)).as("n_active_hours"),
          sum(col("c") * col("c")).as("__ss"))
        .crossJoin(broadcast(span))
        .select(col("event_type"), col("n_events"), col("__h").as("n_hours"),
          col("n_active_hours"),
          floor(((D(col("__ss")) / D(col("__h")) -
            (D(col("n_events")) / D(col("__h"))) *
              (D(col("n_events")) / D(col("__h")))) /
            (D(col("n_events")) / D(col("__h")))) * lit(10000.0) + lit(0.5))
            .cast("long").as("fano_bp"))
        .orderBy(col("event_type"))
    }),

    "q_zipf_fit" -> ((s, dir) => {
      // Zipf slope of the token rank-frequency curve — the corpus
      // shape check (natural text ≈ −1; template spam and synthetic
      // filler bend it): OLS on (ln rank, ln freq) over the top 1000
      // terms, each ln quantized to e4 (the elasticity recipe), exact
      // decimal moments, one pinned double slope. Ranks by the RANGED
      // global-rank machine — the vocabulary never funnels one sort
      // task.
      val tf = graft.pipelines.Lexical.termFrequencies(
          t(s, dir, "documents"), "doc_id", "text")
        .groupBy(col("term")).agg(sum(col("tf")).as("freq"))
      val ranked = RunningTotals.globalRank(tf,
          Seq(col("freq").desc, col("term")), "rk")
        .filter(col("rk") <= 1000)
      def q4(c: Column) =
        floor(log(c.cast("double")) * 10000.0 + 0.5).cast("long")
      val pts = ranked.select(q4(col("rk")).as("x"), q4(col("freq")).as("y"))
      def S(c: Column) = sum(c.cast("decimal(38,0)"))
      def D(c: Column) = c.cast("double")
      val m = pts.agg(count(lit(1)).as("n"), S(col("x")).as("sx"),
        S(col("y")).as("sy"), S(col("x") * col("y")).as("sxy"),
        S(col("x") * col("x")).as("sxx"))
      m.select(col("n").cast("long").as("n_terms"),
        floor((D(col("n")) * D(col("sxy")) - D(col("sx")) * D(col("sy"))) /
          (D(col("n")) * D(col("sxx")) - D(col("sx")) * D(col("sx")))
          * 10000.0 + 0.5).cast("long").as("slope_bp"))
    }),

    "q_xyz_class" -> ((s, dir) => {
      // XYZ demand-variability classes per part (the planning axis
      // beside q_abc_class's value axis): CV of monthly demand over
      // the FULL calendar span — zero months count but never
      // materialize (Σq and Σq² over demand months only, H global).
      // Class thresholds are a REGIME PARAMETER (the textbook 0.5/1.0
      // assume continuous daily demand; this sparse monthly regime
      // sits at cv 1.56-2.36 across all SFs — the 0.5/1.0 cut labels
      // everything Z, a constant column the vacuity rule forbids):
      // X: cv < 1.75 (steady for this regime), Y: < 2.05, Z: erratic.
      val dm = t(s, dir, "lineitem")
        .withColumn("mn",
          (year(col("l_shipdate")) * 12 + month(col("l_shipdate")) - 1)
            .cast("long"))
        .groupBy(col("l_partkey"), col("mn"))
        .agg(sum(floor(col("l_quantity") + 0.5).cast("long")).as("q"))
      val span = dm.agg((max(col("mn")) - min(col("mn")) + 1).as("__h"))
      def D(c: Column) = c.cast("double")
      val mean = D(col("__t")) / D(col("__h"))
      // greatest(0, var): a constant full-span demand makes the true
      // variance 0 and round-off can land -1e-12 — sqrt(NaN) would die
      // at the ANSI long cast; identical guard in the oracle
      val cv = sqrt(greatest(lit(0.0),
        D(col("__ss")) / D(col("__h")) - mean * mean)) / mean
      dm.groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n_active_months"),
          sum(col("q")).as("total_qty"),
          sum(col("q") * col("q")).as("__ss"))
        .withColumnRenamed("total_qty", "__t")
        .crossJoin(broadcast(span))
        .select(col("l_partkey"), col("n_active_months"),
          col("__t").as("total_qty"),
          floor(cv * lit(10000.0) + lit(0.5)).cast("long").as("cv_bp"))
        .withColumn("xyz",
          when(col("cv_bp") < 17500L, "X")
            .when(col("cv_bp") < 20500L, "Y").otherwise("Z"))
        .orderBy(col("l_partkey"))
    }),

    "q_seasonality_strength" -> ((s, dir) => {
      // Hyndman's strength-of-components diagnostics over the SAME
      // exact decomposition as q_seasonal: seasonal strength =
      // max(0, 1 − var(resid)/var(seasonal+resid)), trend strength
      // likewise vs (trend+resid) — the one-number answers to "is
      // there seasonality worth modeling". Integer components, exact
      // decimal moments, two pinned double finishes.
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
          .as("rev_c"))
        .withColumn("dow",
          (datediff(col("d"), to_date(lit("1970-01-01"))) % 7).cast("long"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("d")))
          .cast("long"))
      val dec = Stats.decomposeAdditive(daily, "rn", "dow", "rev_c",
          window = 7)
        .filter(col("resid").isNotNull)
        .select(col("resid").as("r"),
          (col("seasonal") + col("resid")).as("sr"),
          (col("trend") + col("resid")).as("tr2"))
      def S(c: Column) = sum(c.cast("decimal(38,0)"))
      def D(c: Column) = c.cast("double")
      val m = dec.agg(count(lit(1)).as("n"),
        S(col("r")).as("s1"), S(col("r") * col("r")).as("ss1"),
        S(col("sr")).as("s2"), S(col("sr") * col("sr")).as("ss2"),
        S(col("tr2")).as("s3"), S(col("tr2") * col("tr2")).as("ss3"))
      def v(ss: Column, s1: Column) = D(ss) / D(col("n")) -
        (D(s1) / D(col("n"))) * (D(s1) / D(col("n")))
      m.select(col("n").cast("long").as("n_days"),
        floor(greatest(lit(0.0),
          lit(1.0) - v(col("ss1"), col("s1")) / v(col("ss2"), col("s2")))
          * 10000.0 + 0.5).cast("long").as("seasonal_strength_bp"),
        floor(greatest(lit(0.0),
          lit(1.0) - v(col("ss1"), col("s1")) / v(col("ss3"), col("s3")))
          * 10000.0 + 0.5).cast("long").as("trend_strength_bp"))
    }),

    "q_runs_test" -> ((s, dir) => {
      // Wald–Wolfowitz runs test on daily revenue around its median —
      // "are the ups and downs random?", the residual-randomness check
      // the trend/seasonal fits assume. Runs and counts exact; the
      // normal approximation z is one pinned double finish.
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
          .as("rev_c"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("d"))
      val wv = org.apache.spark.sql.expressions.Window
        .orderBy(col("rev_c"), col("d"))
      val n = daily.count()
      val med = daily.withColumn("__vr", row_number().over(wv))
        .filter(col("__vr") === (n + 1) / 2)
        .select(col("rev_c").as("__med"))
      val signed = daily.crossJoin(broadcast(med))
        .withColumn("sgn", (col("rev_c") > col("__med")).cast("long"))
        .withColumn("__chg",
          when(lag(col("sgn"), 1).over(w).isNull, 0L)
            .when(lag(col("sgn"), 1).over(w) =!= col("sgn"), 1L)
            .otherwise(0L))
      def D(c: Column) = c.cast("double")
      val agg = signed.agg(count(lit(1)).as("n_days"),
        sum(col("sgn")).as("n_above"),
        (count(lit(1)) - sum(col("sgn"))).as("n_below"),
        (sum(col("__chg")) + 1).as("runs"))
      val mu = lit(2.0) * D(col("n_above")) * D(col("n_below")) /
        D(col("n_days")) + lit(1.0)
      val sig2 = (lit(2.0) * D(col("n_above")) * D(col("n_below")) *
        (lit(2.0) * D(col("n_above")) * D(col("n_below")) -
          D(col("n_days")))) /
        (D(col("n_days")) * D(col("n_days")) * (D(col("n_days")) - lit(1.0)))
      agg.select(col("n_days"), col("n_above"), col("n_below"), col("runs"),
        floor((D(col("runs")) - mu) / sqrt(sig2) * 10000.0 + 0.5)
          .cast("long").as("z_bp"))
    }),

    "q_cohort_ltv" -> ((s, dir) => {
      // cumulative lifetime value per acquisition cohort — the money
      // twin of q_cohort_retention: revenue per cohort-age accumulated
      // down the age axis, divided by cohort size (exact cents floor).
      // Two keyed aggregates + one tiny cohort-sized window.
      val first = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(min(year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .as("__c0"))
      val sized = first.groupBy(col("__c0"))
        .agg(count(lit(1)).as("n_customers"))
      val rev = t(s, dir, "orders")
        .join(first, Seq("o_custkey"))
        .groupBy(col("__c0"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1 -
            col("__c0")).cast("long").as("age"))
        .agg(sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
          .as("rev_c"))
      val wc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__c0")).orderBy(col("age"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      rev.join(broadcast(sized), Seq("__c0"))
        .withColumn("cum_rev_c", sum(col("rev_c")).over(wc))
        .select(
          concat(expr("__c0 div 12").cast("string"), lit("-"),
            lpad((pmod(col("__c0"), lit(12)) + 1).cast("string"), 2, "0"))
            .as("cohort"),
          col("age"), col("n_customers"), col("cum_rev_c"))
        .withColumn("ltv_c", {
          val a = col("cum_rev_c"); val b = col("n_customers")
          ((a - pmod(a, b)) / b).cast("long")
        })
        .orderBy(col("cohort"), col("age"))
    }),

    "q_levene" -> ((s, dir) => {
      // Brown–Forsythe (median-centered Levene) homogeneity-of-variance
      // test — the PRECONDITION check q_anova assumes: one-way F over
      // the absolute median deviations. Pure composition: exact
      // per-group lower medians by rank selection, |x − med| integer,
      // then the existing exact-moment anovaF.
      val o = t(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"),
          floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("x"))
      val sizes = o.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("__ng"))
      val wv = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderpriority"))
        .orderBy(col("x"), col("o_orderkey"))
      val med = o.join(broadcast(sizes), Seq("o_orderpriority"))
        .withColumn("__vr", row_number().over(wv))
        .filter(col("__vr") === expr("(__ng + 1) div 2"))
        .select(col("o_orderpriority"), col("x").as("__med"))
      val z = o.join(broadcast(med), Seq("o_orderpriority"))
        .select(col("o_orderpriority"),
          abs(col("x") - col("__med")).as("z"))
      Stats.anovaF(z, "o_orderpriority", "z")
    }),

    "q_durbin_watson" -> ((s, dir) => {
      // Durbin–Watson statistic over the q_seasonal decomposition
      // residuals — lag-1 autocorrelation of what the fit left behind
      // (≈2 = none; the runs test's parametric sibling). Exact decimal
      // sums of integer squares (they clear 2⁵³), one pinned double
      // ratio.
      val daily = t(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
          .as("rev_c"))
        .withColumn("dow",
          (datediff(col("d"), to_date(lit("1970-01-01"))) % 7).cast("long"))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("d")))
          .cast("long"))
      val resid = Stats.decomposeAdditive(daily, "rn", "dow", "rev_c",
          window = 7)
        .filter(col("resid").isNotNull)
        .select(col("rn"), col("resid").as("e"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("rn"))
      val withLag = resid.withColumn("__de", col("e") - lag(col("e"), 1).over(w))
      def S(c: Column) = sum(c.cast("decimal(38,0)"))
      def D(c: Column) = c.cast("double")
      withLag.agg(count(lit(1)).as("__n"),
          S(col("e") * col("e")).as("__den"),
          S(col("__de") * col("__de")).as("__num"))
        .select(col("__n").cast("long").as("n_resid"),
          floor(D(col("__num")) / D(col("__den")) * 10000.0 + 0.5)
            .cast("long").as("dw_e4"))
    }),

    "q_embedding_drift" -> ((s, dir) => {
      // SEMANTIC drift monitor for the embedding corpus — the
      // distribution checks (q_drift_psi family) ported to vector
      // space: train IVF centroids on a reference slice, score the
      // PSI of the centroid-ASSIGNMENT distribution on the comparison
      // slice. The standard embedding-drift recipe (cluster-histogram
      // PSI) every feature-store monitor runs; assignment is the same
      // zero-shuffle map as IVF search, counts are two nCentroids-row
      // frames. HASH-CHECKED (round 9): quantized Lloyd (see q_ann_ivf)
      // replays the TWO training rounds on the ref slice exactly, so
      // the oracle re-derives the trained cells, both assignment
      // histograms, and the same floored psi_ppm (the q_drift_psi
      // formula at nBuckets=16). DriftSpec's twin test still proves
      // identical slices score ≈0 and a shifted slice alarms.
      val emb = t(s, dir, "embeddings")
      val half = col("vec_id") % 1048573L * 2654435761L % 1000000L
      val ref = emb.filter(half < 500000L)
      val cur = emb.filter(half >= 500000L)
      val cents = graft.similarity.Knn.trainCentroids(ref, 16, iters = 2)
      def counts(d: DataFrame, n: String) =
        graft.similarity.Knn.assign(d, cents)
          .groupBy(col("centroid_id").cast("long").as("bucket"))
          .agg(count(lit(1)).as(n))
      Drift.psiFromCounts(counts(ref, "n_old"), counts(cur, "n_new"), 16)
        .orderBy(col("bucket"))
    }),

    "q_granger" -> ((s, dir) => {
      // Granger causality at lag 1, BOTH directions: does the BUILDING
      // segment's daily revenue help predict the rest's tomorrow (and
      // vice versa)? F compares the AR(1) fit with and without the
      // other series' lag — restricted/unrestricted SSEs in closed
      // form from EXACT decimal moments, the 2-regressor normal
      // equations solved by determinant, one pinned double chain per
      // direction. Output: (direction, n, f_bp).
      val daily = t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(
          sum(when(col("c_mktsegment") === "BUILDING",
            floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
            .otherwise(0L)).as("yb"),
          sum(when(col("c_mktsegment") =!= "BUILDING",
            floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
            .otherwise(0L)).as("yr"))
      val dirs = daily.select(lit("building->rest").as("direction"),
          col("d"), col("yr").as("y"), col("yb").as("x"))
        .unionByName(daily.select(lit("rest->building").as("direction"),
          col("d"), col("yb").as("y"), col("yr").as("x")))
      Stats.grangerLag1(dirs, "direction", "d", "y", "x")
        .orderBy(col("direction"))
    }),

    "q_retention_fit" -> ((s, dir) => {
      // exponential retention-decay fit: ln(retention) ~ age pooled
      // across cohorts (ages ≥ 1) — the one-number churn model the
      // q_cohort_retention matrix feeds; slope < 0, monthly churn ≈
      // 1 − e^slope. Per-point ln quantized to e4 (the elasticity
      // recipe), exact decimal moments, one pinned double slope.
      val first = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(min(year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .as("__c0"))
      val sized = first.groupBy(col("__c0"))
        .agg(count(lit(1)).as("__nc"))
      val active = t(s, dir, "orders")
        .join(first, Seq("o_custkey"))
        .groupBy(col("__c0"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1 -
            col("__c0")).cast("long").as("age"))
        .agg(countDistinct(col("o_custkey")).as("__na"))
        .filter(col("age") >= 1)
      val pts = active.join(broadcast(sized), Seq("__c0"))
        .select(col("age").as("x"),
          floor(log(col("__na").cast("double") / col("__nc").cast("double"))
            * 10000.0 + 0.5).cast("long").as("y"))
      def S(c: Column) = sum(c.cast("decimal(38,0)"))
      def D(c: Column) = c.cast("double")
      val m = pts.agg(count(lit(1)).as("n"), S(col("x")).as("sx"),
        S(col("y")).as("sy"), S(col("x") * col("y")).as("sxy"),
        S(col("x") * col("x")).as("sxx"))
      m.select(col("n").cast("long").as("n_points"),
        floor((D(col("n")) * D(col("sxy")) - D(col("sx")) * D(col("sy"))) /
          (D(col("n")) * D(col("sxx")) - D(col("sx")) * D(col("sx")))
          + 0.5).cast("long").as("slope_bp"))
    }),

    "q_newsvendor" -> ((s, dir) => {
      // newsvendor stock level per brand at critical ratio 0.8: the
      // smallest monthly-demand quantity covering 80% of months —
      // exact rank selection over the per-brand demand distribution
      // (the stocking answer q_reorder_point's normal approximation
      // assumes away when demand is skewed).
      val dm = t(s, dir, "lineitem")
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
        .withColumn("mn",
          (year(col("l_shipdate")) * 12 + month(col("l_shipdate")) - 1)
            .cast("long"))
        .groupBy(col("p_brand"), col("mn"))
        .agg(sum(floor(col("l_quantity") + 0.5).cast("long")).as("q"))
      val sizes = dm.groupBy(col("p_brand")).agg(count(lit(1)).as("__nm"),
        ((sum(col("q")) - pmod(sum(col("q")), count(lit(1)))) /
          count(lit(1))).cast("long").as("mean_q"))
      val wv = org.apache.spark.sql.expressions.Window
        .partitionBy(col("p_brand")).orderBy(col("q"), col("mn"))
      dm.join(broadcast(sizes), Seq("p_brand"))
        .withColumn("__vr", row_number().over(wv))
        // rank ⌈0.8·n⌉ = (8n + 9) div 10 floor-identity
        .filter(col("__vr") === expr("(8 * __nm + 9) div 10"))
        .select(col("p_brand"), col("__nm").as("n_months"),
          col("mean_q"), col("q").as("q_star"))
        .orderBy(col("p_brand"))
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → rows-only check.
    */
  // shared by q_ecom_job and q_ecom_job_strict: the strict arm arms the
  // FkFail gate on a fully-resolving feed, so the replay is identical
  private val EcomJobOracle: String =
    """WITH dest_groups AS (
      |  SELECT CAST(n_nationkey AS INTEGER) AS group_id, n_name AS group_name,
      |         r_name AS region
      |  FROM nation JOIN region ON n_regionkey = r_regionkey),
      |in_groups AS (
      |  SELECT group_id, group_name || '*' AS group_name, region
      |  FROM dest_groups WHERE group_id < 10
      |  UNION ALL
      |  SELECT CAST(r_regionkey + 100 AS INTEGER), 'NEW-' || r_name, r_name
      |  FROM region),
      |merged_groups AS (
      |  SELECT COALESCE(i.group_id, d.group_id) AS group_id,
      |         COALESCE(i.group_name, d.group_name) AS group_name,
      |         COALESCE(i.region, d.region) AS region
      |  FROM dest_groups d FULL OUTER JOIN in_groups i ON d.group_id = i.group_id),
      |dest_products AS (
      |  SELECT p_partkey AS product_id, p_name AS product_name,
      |         CAST(p_partkey % 25 AS INTEGER) AS group_id,
      |         CAST(p_retailprice AS DECIMAL(18,2)) AS price,
      |         'en' AS lang, p_partkey * 10 AS uid
      |  FROM part
      |  UNION ALL
      |  SELECT p_partkey, p_name, CAST(p_partkey % 25 AS INTEGER),
      |         CAST(p_retailprice AS DECIMAL(18,2)), 'fr', p_partkey * 10 + 1
      |  FROM part WHERE p_partkey % 5 = 0),
      |pnames AS (
      |  SELECT p_partkey, p_name, p_retailprice,
      |         CASE WHEN p_partkey % 7 = 0 THEN 'NEW-' || r_name
      |              WHEN p_partkey % 25 < 10 THEN n_name || '*'
      |              ELSE n_name END AS group_name_ref
      |  FROM part
      |  JOIN nation ON p_partkey % 25 = n_nationkey
      |  JOIN region ON p_partkey % 5 = r_regionkey),
      |raw_batch AS (
      |  SELECT p_partkey AS product_id, p_name AS product_name, group_name_ref,
      |         CAST(CAST(p_retailprice AS DECIMAL(18,2)) + 1.00
      |           AS DECIMAL(18,2)) AS price,
      |         'en' AS lang
      |  FROM pnames WHERE p_partkey % 3 = 0
      |  UNION ALL
      |  SELECT p_partkey + 1000000, 'NP ' || p_name, group_name_ref,
      |         CAST(CAST(p_retailprice AS DECIMAL(18,2)) + 2.00 AS DECIMAL(18,2)),
      |         'en'
      |  FROM pnames WHERE p_partkey % 13 = 0
      |  UNION ALL
      |  SELECT p_partkey, p_name, group_name_ref,
      |         CAST(CAST(p_retailprice AS DECIMAL(18,2)) + 5.00 AS DECIMAL(18,2)),
      |         'en'
      |  FROM pnames WHERE p_partkey % 33 = 0),
      |quarantined AS (
      |  SELECT *, 'name_ok' AS quarantine_reason FROM raw_batch
      |  WHERE product_name LIKE '%cold%'),
      |resolved AS (
      |  SELECT b.product_id, b.product_name, g.group_id, b.price, b.lang
      |  FROM raw_batch b LEFT JOIN merged_groups g ON b.group_name_ref = g.group_name
      |  WHERE b.product_name NOT LIKE '%cold%'),
      |deduped AS (
      |  SELECT product_id, product_name, group_id, price, lang FROM (
      |    SELECT r.*, row_number() OVER (PARTITION BY product_id ORDER BY price) AS rn
      |    FROM resolved r) WHERE rn = 1),
      |upserted_products AS (
      |  SELECT COALESCE(b.product_id, d.product_id) AS product_id,
      |         COALESCE(b.lang, d.lang) AS lang,
      |         COALESCE(b.product_name, d.product_name) AS product_name,
      |         COALESCE(b.group_id, d.group_id) AS group_id,
      |         COALESCE(b.price, d.price) AS price,
      |         d.uid AS uid
      |  FROM dest_products d FULL OUTER JOIN deduped b
      |    ON d.product_id = b.product_id AND d.lang = b.lang),
      |synced_products AS (
      |  SELECT * FROM upserted_products u
      |  WHERE u.lang NOT IN (SELECT DISTINCT lang FROM deduped)
      |     OR EXISTS (SELECT 1 FROM deduped b
      |                WHERE b.product_id = u.product_id AND b.lang = u.lang)),
      |new_products AS (
      |  SELECT product_id, lang, product_name, group_id, price,
      |         (SELECT max(uid) FROM dest_products)
      |           + row_number() OVER (ORDER BY product_id, lang) AS uid
      |  FROM synced_products WHERE uid IS NULL),
      |final_products AS (
      |  SELECT * FROM synced_products WHERE uid IS NOT NULL
      |  UNION ALL SELECT * FROM new_products),
      |dest_relations AS (
      |  SELECT l_partkey AS product_id, l_suppkey AS related_id,
      |         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS BIGINT) AS qty
      |  FROM lineitem WHERE l_linenumber = 1 GROUP BY 1, 2),
      |in_relations AS (
      |  SELECT l_partkey AS product_id, l_suppkey AS related_id,
      |         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS BIGINT) AS qty
      |  FROM lineitem WHERE l_linenumber = 2 GROUP BY 1, 2),
      |in_relations_clean AS (
      |  SELECT r.* FROM in_relations r
      |  WHERE EXISTS (SELECT 1 FROM final_products p
      |                WHERE p.lang = 'en' AND p.product_id = r.product_id)),
      |merged_relations AS (
      |  SELECT COALESCE(b.product_id, d.product_id) AS product_id,
      |         COALESCE(b.related_id, d.related_id) AS related_id,
      |         COALESCE(b.qty, d.qty) AS qty
      |  FROM dest_relations d FULL OUTER JOIN in_relations_clean b
      |    ON d.product_id = b.product_id AND d.related_id = b.related_id),
      |final_relations AS (
      |  SELECT m.* FROM merged_relations m
      |  WHERE EXISTS (SELECT 1 FROM in_relations_clean b
      |    WHERE b.product_id = m.product_id AND b.related_id = m.related_id)),
      |users AS (
      |  SELECT c_custkey AS user_id, c_mktsegment AS seg
      |  FROM customer WHERE c_acctbal > 9500),
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
      |final_assort AS (
      |  SELECT a.user_id, a.part_key,
      |    CAST(CASE WHEN EXISTS (SELECT 1 FROM rebuilt r
      |      WHERE r.user_id = a.user_id AND r.part_key = a.part_key)
      |    THEN 1 ELSE 0 END AS INTEGER) AS is_active
      |  FROM (SELECT user_id, part_key FROM existing
      |        UNION SELECT user_id, part_key FROM rebuilt) a)
      |SELECT * FROM (
      |  SELECT 'groups' AS table_name, count(*) AS n_rows,
      |    CAST(sum(CAST(CAST('0x' || substr(md5(concat_ws('|',
      |      CAST(group_id AS VARCHAR), group_name, region)), 1, 15) AS BIGINT)
      |      AS DECIMAL(38,0))) % 4611686018427387904 AS BIGINT) AS content_checksum
      |  FROM merged_groups HAVING count(*) > 0
      |  UNION ALL
      |  SELECT 'products', count(*),
      |    CAST(sum(CAST(CAST('0x' || substr(md5(concat_ws('|',
      |      CAST(product_id AS VARCHAR), product_name, CAST(group_id AS VARCHAR),
      |      CAST(price AS VARCHAR), lang, CAST(uid AS VARCHAR))), 1, 15) AS BIGINT)
      |      AS DECIMAL(38,0))) % 4611686018427387904 AS BIGINT)
      |  FROM final_products HAVING count(*) > 0
      |  UNION ALL
      |  SELECT 'products_quarantined', count(*),
      |    CAST(sum(CAST(CAST('0x' || substr(md5(concat_ws('|',
      |      CAST(product_id AS VARCHAR), product_name, group_name_ref,
      |      CAST(price AS VARCHAR), lang, quarantine_reason)), 1, 15) AS BIGINT)
      |      AS DECIMAL(38,0))) % 4611686018427387904 AS BIGINT)
      |  FROM quarantined HAVING count(*) > 0
      |  UNION ALL
      |  SELECT 'relations', count(*),
      |    CAST(sum(CAST(CAST('0x' || substr(md5(concat_ws('|',
      |      CAST(product_id AS VARCHAR), CAST(related_id AS VARCHAR),
      |      CAST(qty AS VARCHAR))), 1, 15) AS BIGINT)
      |      AS DECIMAL(38,0))) % 4611686018427387904 AS BIGINT)
      |  FROM final_relations HAVING count(*) > 0
      |  UNION ALL
      |  SELECT 'assortments', count(*),
      |    CAST(sum(CAST(CAST('0x' || substr(md5(concat_ws('|',
      |      CAST(user_id AS VARCHAR), CAST(part_key AS VARCHAR),
      |      CAST(is_active AS VARCHAR))), 1, 15) AS BIGINT)
      |      AS DECIMAL(38,0))) % 4611686018427387904 AS BIGINT)
      |  FROM final_assort HAVING count(*) > 0)
      |ORDER BY table_name""".stripMargin

  /** The SF dir trained-constant oracles derive their literals from —
    * set by [[Verify]] to the dir the queries just ran against, so the
    * dumped oracle_sql.json replays the SAME training data.
    */
  @volatile var oracleTrainDir: String = "/root/testdata/sf0.01"

  /** q_embed_whiten's oracle, built at dump time (the pinned-constant
    * rule): the TRAINED basis — mean, top-8 components, eigenvalues —
    * is embedded as double literals (shortest-repr round-trips exactly
    * in both engines), and the SQL then verifies everything EXCEPT the
    * Jacobi iteration itself: it recomputes the quantized moments from
    * the parquet (exact BIGINT sums — the Whitening.moments recipe),
    * gates the literal mean on EXACT equality with its own, gates the
    * literal (λ, v) pairs on eigen-residuals ‖Σv − λv‖∞ ≤ 1e-5 against
    * ITS covariance plus orthonormality and descending order, and only
    * then emits the zero-exchange projection of every row through the
    * literal basis (scales re-derived in SQL as 1/√(max(λ,0)+1e-6) —
    * sqrt and ÷ are correctly-rounded IEEE ops). A wrong basis, wrong
    * mean, or wrong projection all surface as a gate-emptied result.
    */
  /** Shared trained-whitening CTE prefix (lits + recomputed quantized
    * moments + the four basis gates), parameterized by the component
    * count `k` — used by q_embed_whiten (k=8) and the whitened-PQ
    * pipeline (k=16). Returns SQL ending after `dgate` (no trailing
    * comma).
    */
  private def whitenLitsAndGates(k: Int): String = {
    val spark = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .getOrElse(throw new IllegalStateException(
        "whitenLitsAndGates needs an active SparkSession to train the basis"))
    val tk = graft.similarity.Whitening.fit(
      t(spark, oracleTrainDir, "embeddings"), "embedding", k = k)
    // exponent form forces DOUBLE typing in DuckDB — a bare decimal
    // literal is DECIMAL there, and the list coercion would shave the
    // literal to fewer bits than the double it must round-trip
    def d(x: Double): String = {
      val s = java.lang.Double.toString(x)
      if (s.contains('E')) s else s + "e0"
    }
    val mu = tk.mean.map(d).mkString("[", ", ", "]")
    val comp = tk.components.map(_.map(d).mkString("[", ", ", "]"))
      .mkString("[", ", ", "]")
    val lam = tk.eigenvalues.map(d).mkString("[", ", ", "]")
    s"""lits AS (SELECT $mu AS mu, $comp AS comp, $lam AS lam),
      |nrow AS (SELECT count(*) AS n FROM embeddings),
      |msum AS (
      |  SELECT t1.i AS i,
      |    sum(CAST(floor(CAST(e.embedding[t1.i] AS DOUBLE) * 1048576.0) AS BIGINT)) AS s
      |  FROM embeddings e, LATERAL unnest(generate_series(1, 64)) AS t1(i)
      |  GROUP BY 1),
      |mean AS (SELECT i, (CAST(s AS DOUBLE) / 1048576.0) / n AS mu FROM msum, nrow),
      |mom AS (
      |  SELECT t1.i AS i, t2.j AS j,
      |    sum(CAST(floor(CAST(e.embedding[t1.i] AS DOUBLE)
      |      * CAST(e.embedding[t2.j] AS DOUBLE) * 1048576.0) AS BIGINT)) AS sq
      |  FROM embeddings e,
      |    LATERAL unnest(generate_series(1, 64)) AS t1(i),
      |    LATERAL unnest(generate_series(1, 64)) AS t2(j)
      |  WHERE t2.j >= t1.i
      |  GROUP BY 1, 2),
      |cov AS (
      |  SELECT m.i, m.j,
      |    (CAST(m.sq AS DOUBLE) / 1048576.0) / nrow.n - mi.mu * mj.mu AS c
      |  FROM mom m, nrow
      |  JOIN mean mi ON mi.i = m.i
      |  JOIN mean mj ON mj.i = m.j),
      |covfull AS (
      |  SELECT i, j, c FROM cov
      |  UNION ALL SELECT j, i, c FROM cov WHERE i <> j),
      |mgate AS (
      |  SELECT count(*) AS bad FROM mean, lits WHERE lits.mu[mean.i] <> mean.mu),
      |sv AS (
      |  SELECT ks.k AS k, cf.i AS r, sum(cf.c * lits.comp[ks.k][cf.j]) AS av
      |  FROM covfull cf CROSS JOIN lits
      |  CROSS JOIN LATERAL unnest(generate_series(1, $k)) AS ks(k)
      |  GROUP BY 1, 2),
      |rgate AS (
      |  SELECT count(*) AS bad FROM sv, lits
      |  WHERE abs(sv.av - lits.lam[sv.k] * lits.comp[sv.k][sv.r]) > 1e-5),
      |ogate AS (
      |  SELECT count(*) AS bad FROM (
      |    SELECT k1.a AS a, k2.b AS b,
      |      sum(lits.comp[k1.a][t.d] * lits.comp[k2.b][t.d]) AS dp
      |    FROM lits,
      |      LATERAL unnest(generate_series(1, $k)) AS k1(a),
      |      LATERAL unnest(generate_series(1, $k)) AS k2(b),
      |      LATERAL unnest(generate_series(1, 64)) AS t(d)
      |    GROUP BY 1, 2)
      |  WHERE abs(dp - (CASE WHEN a = b THEN 1.0 ELSE 0.0 END)) > 1e-9),
      |dgate AS (
      |  SELECT count(*) AS bad FROM lits,
      |    LATERAL unnest(generate_series(1, ${k - 1})) AS ks(k)
      |  WHERE lits.lam[ks.k] < lits.lam[ks.k + 1])""".stripMargin
  }

  private def whitenOracleSql: String = {
    s"""WITH ${whitenLitsAndGates(8)},
      |proj AS (
      |  SELECT e.vec_id,
      |    (1.0 / sqrt(greatest(lits.lam[1], 0.0) + 1e-6)) *
      |      list_aggregate(list_apply(list_zip(e.embedding, lits.mu, lits.comp[1]),
      |        x -> (CAST(x[1] AS DOUBLE) - x[2]) * x[3]), 'sum') AS w1,
      |    (1.0 / sqrt(greatest(lits.lam[2], 0.0) + 1e-6)) *
      |      list_aggregate(list_apply(list_zip(e.embedding, lits.mu, lits.comp[2]),
      |        x -> (CAST(x[1] AS DOUBLE) - x[2]) * x[3]), 'sum') AS w2,
      |    (1.0 / sqrt(greatest(lits.lam[3], 0.0) + 1e-6)) *
      |      list_aggregate(list_apply(list_zip(e.embedding, lits.mu, lits.comp[3]),
      |        x -> (CAST(x[1] AS DOUBLE) - x[2]) * x[3]), 'sum') AS w3
      |  FROM embeddings e CROSS JOIN lits)
      |SELECT p.vec_id, p.w1, p.w2, p.w3
      |FROM proj p, mgate, rgate, ogate, dgate
      |WHERE mgate.bad = 0 AND rgate.bad = 0 AND ogate.bad = 0 AND dgate.bad = 0
      |ORDER BY p.vec_id""".stripMargin
  }

  /** q_ann_wpq's oracle: the whitened-PQ pipeline composed from the two
    * verified machines — the k=16 trained-whitening prefix (literals
    * gated in-SQL exactly as q_embed_whiten's) projects every row to a
    * 16-dim REAL vector, and the FULL IVFADC replay (coarse seeds →
    * quantized Lloyd → residuals → per-subspace codebooks → integer
    * ADC top-k, the q_ann_ivfpq structure at dim 16 / m 4 / subDim 4)
    * then runs FROM that projected frame. The final select rides the
    * whitening gates, so a wrong basis empties the result.
    */
  private def wpqOracleSql: String = {
    val projEntries = (1 to 16).map { kk =>
      s"CAST((1.0 / sqrt(greatest(lits.lam[$kk], 0.0) + 1e-6)) * " +
        s"list_aggregate(list_apply(list_zip(e.embedding, lits.mu, lits.comp[$kk]), " +
        "x -> (CAST(x[1] AS DOUBLE) - x[2]) * x[3]), 'sum') AS REAL)"
    }.mkString(",\n      |    ")
    s"""WITH ${whitenLitsAndGates(16)},
      |pvec AS (
      |  SELECT e.vec_id, [
      |    $projEntries] AS embedding
      |  FROM embeddings e CROSS JOIN lits),
      |pn AS (SELECT count(*) AS cnt FROM pvec),
      |cents0 AS (
      |  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) AS cid,
      |         embedding AS c_emb
      |  FROM pvec, pn
      |  WHERE vec_id % greatest(1, cnt // 8) = 0
      |  ORDER BY vec_id LIMIT 8),
      |scores0 AS (
      |  SELECT e.vec_id, e.embedding, c.cid,
      |    -2 * list_aggregate(list_apply(list_zip(e.embedding, c.c_emb),
      |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
      |      + list_aggregate(list_apply(c.c_emb,
      |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS score
      |  FROM pvec e CROSS JOIN cents0 c),
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
      |  FROM pvec e CROSS JOIN cents c),
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
      |    list_slice(r.r_emb, (ms.m - 1) * 4 + 1, ms.m * 4) AS sv
      |  FROM resid r CROSS JOIN ms),
      |bseed_ids AS (
      |  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) AS bid
      |  FROM (SELECT vec_id FROM resid, pn WHERE vec_id % greatest(1, cnt // 8) = 0
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
      |      list_apply(list_zip(list_slice(q.qr, (b.m - 1) * 4 + 1, b.m * 4), b.b_emb),
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
      |SELECT s.query_id, s.neighbor_id, s.adc_dist FROM (
      |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adc_dist, neighbor_id) AS rk
      |  FROM scored) s, mgate, rgate, ogate, dgate
      |WHERE s.rk <= 5
      |  AND mgate.bad = 0 AND rgate.bad = 0 AND ogate.bad = 0 AND dgate.bad = 0
      |ORDER BY s.query_id, s.neighbor_id""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(

    "q_embed_whiten" -> whitenOracleSql,

    "q_ann_wpq" -> wpqOracleSql,

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

    "q_pivot_dynamic" ->
      """WITH p AS (SELECT user_id, event_type, CAST(value AS DECIMAL(30,6)) AS v FROM events),
        |w AS (SELECT * FROM (PIVOT p ON event_type USING sum(v)))
        |SELECT user_id, CAST(round(COLUMNS(c -> c <> 'user_id'), 2) AS DOUBLE)
        |FROM w ORDER BY user_id""".stripMargin,

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

    "q_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k
        |FROM events
        |ORDER BY event_id""".stripMargin,

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

    "q_hierarchy_closure" ->
      """WITH RECURSIVE e AS (
        |  SELECT doc_id AS child, doc_id // 2 AS parent FROM documents WHERE doc_id > 0),
        |c AS (
        |  SELECT child, parent AS ancestor, 1 AS depth FROM e
        |  UNION ALL
        |  SELECT c.child, e.parent, c.depth + 1 FROM c JOIN e ON c.ancestor = e.child)
        |SELECT child, ancestor, depth FROM c
        |ORDER BY child, ancestor""".stripMargin,

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
      """WITH n AS (SELECT count(*) AS cnt FROM embeddings),
        |cents AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) AS cid,
        |         embedding AS c_emb
        |  FROM embeddings, n
        |  WHERE vec_id % greatest(1, cnt // 8) = 0
        |  ORDER BY vec_id LIMIT 8),
        |scores AS (
        |  SELECT e.vec_id, e.embedding, c.cid,
        |    -2 * list_aggregate(list_apply(list_zip(e.embedding, c.c_emb),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
        |      + list_aggregate(list_apply(c.c_emb,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS score
        |  FROM embeddings e CROSS JOIN cents c),
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
      """WITH n AS (SELECT count(*) AS cnt FROM embeddings),
        |cents0 AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) AS cid,
        |         embedding AS c_emb
        |  FROM embeddings, n
        |  WHERE vec_id % greatest(1, cnt // 8) = 0
        |  ORDER BY vec_id LIMIT 8),
        |scores0 AS (
        |  SELECT e.vec_id, e.embedding, c.cid,
        |    -2 * list_aggregate(list_apply(list_zip(e.embedding, c.c_emb),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
        |      + list_aggregate(list_apply(c.c_emb,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS score
        |  FROM embeddings e CROSS JOIN cents0 c),
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
        |  FROM embeddings e CROSS JOIN cents c),
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
      """WITH n AS (SELECT count(*) AS cnt FROM embeddings),
        |cents0 AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) AS cid,
        |         embedding AS c_emb
        |  FROM embeddings, n
        |  WHERE vec_id % greatest(1, cnt // 8) = 0
        |  ORDER BY vec_id LIMIT 8),
        |scores0 AS (
        |  SELECT e.vec_id, e.embedding, c.cid,
        |    -2 * list_aggregate(list_apply(list_zip(e.embedding, c.c_emb),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
        |      + list_aggregate(list_apply(c.c_emb,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS score
        |  FROM embeddings e CROSS JOIN cents0 c),
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
        |  FROM embeddings e CROSS JOIN cents c),
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

    "q_semantic_dedup" ->
      // the full SemDeDup recipe replayed: quantized-Lloyd trained cells
      // (the q_ann_ivf replay), within-cell round-4 cosine pairs at
      // >= 0.25, symmetric-edge recursive closure with min-id canonicals
      // (the q_dedup_clusters pattern); singletons map to themselves
      """WITH RECURSIVE n AS (SELECT count(*) AS cnt FROM embeddings),
        |cents0 AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) AS cid,
        |         embedding AS c_emb
        |  FROM embeddings, n
        |  WHERE vec_id % greatest(1, cnt // 8) = 0
        |  ORDER BY vec_id LIMIT 8),
        |scores0 AS (
        |  SELECT e.vec_id, e.embedding, c.cid,
        |    -2 * list_aggregate(list_apply(list_zip(e.embedding, c.c_emb),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
        |      + list_aggregate(list_apply(c.c_emb,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS score
        |  FROM embeddings e CROSS JOIN cents0 c),
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
        |  FROM embeddings e CROSS JOIN cents c),
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
      """WITH n AS (SELECT count(*) AS cnt FROM embeddings),
        |cents0 AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER) AS cid,
        |         embedding AS c_emb
        |  FROM embeddings, n
        |  WHERE vec_id % greatest(1, cnt // 8) = 0
        |  ORDER BY vec_id LIMIT 8),
        |scores0 AS (
        |  SELECT e.vec_id, e.embedding, c.cid,
        |    -2 * list_aggregate(list_apply(list_zip(e.embedding, c.c_emb),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
        |      + list_aggregate(list_apply(c.c_emb,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS score
        |  FROM embeddings e CROSS JOIN cents0 c),
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
        |  FROM embeddings e CROSS JOIN cents c),
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
      """WITH docs AS (
        |  SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
        |  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    array_to_string(toks[s : least(s + 2, len(toks))], ' ') AS shingle
        |  FROM docs, LATERAL unnest(generate_series(1, greatest(1, len(toks) - 2))) AS t(s)),
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
        |sig AS (SELECT doc_id, list(sig ORDER BY i) AS sig FROM hv GROUP BY doc_id),
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

    "q_lsh_recall" ->
      // the canary replays END-TO-END: the q_minhash_lsh signature/band/
      // exact-Jaccard machinery runs over the tracer-doubled corpus
      // (documents UNION copies at doc_id+1e7 for doc_id % 17 = 0), the
      // verified pair set is semi-joined against the known tracer pairs,
      // and the recall quotient is integer-exact — so the oracle derives
      // recall = 10000 the same way the engine does instead of assuming
      // it (identical text => identical signature => same bands), and a
      // capped bucket or sketch regression flips the gate on BOTH sides.
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000000, text FROM documents
        |  WHERE doc_id % 17 = 0 AND trim(coalesce(text,'')) <> ''),
        |docs AS (
        |  SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
        |  FROM corpus WHERE text IS NOT NULL AND trim(text) <> ''),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    array_to_string(toks[s : least(s + 2, len(toks))], ' ') AS shingle
        |  FROM docs, LATERAL unnest(generate_series(1, greatest(1, len(toks) - 2))) AS t(s)),
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
        |sig AS (SELECT doc_id, list(sig ORDER BY i) AS sig FROM hv GROUP BY doc_id),
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
      // engines); one ln per distinct trigram at the 10^4 floor grain
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
        |ORDER BY p_brand""".stripMargin
  )

  /** q_sprt's pinned constants (l1, l0, upper, lower) — shared between
    * the Spark query and the oracle literal embedding above.
    */
  private val sprtC =
    graft.operators.Stats.sprtConstants(5000L, 6000L, 500L, 500L)
}
