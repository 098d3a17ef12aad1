package graft

import org.apache.spark.sql.functions._
import graft.plans._
import graft.operators.{ColumnRules, Denormalize}

/** End-to-end provider parity: one multi-table job, configured the way
  * the reference's job file configures RunJob (serialized settings →
  * ordered table specs → staged merges with per-table modes), composing
  * config round-trip, dependency order, quarantine, scoped delete,
  * FK-by-name post hooks, and default fill in a single run.
  */
class ProviderParitySpec extends SparkSuite {
  import spark.implicits._

  test("a reference-shaped multi-table import runs end-to-end from JSON config") {
    // ---- the job settings travel as JSON (EcomProvider.cs:772) ----
    val json = JobConfig.toJson(JobConfig(Seq(
      TableConfig("group", keys = Seq("group_id"),
        constants = Map("shop" -> "SHOP1")),
      TableConfig("product", keys = Seq("product_id", "lang"),
        dedupKeys = Seq("product_id", "lang"), dedupOrder = Seq("name"),
        deleteExcess = true, deleteExcessScope = Seq("lang")),
      TableConfig("product_group", keys = Seq("product_id", "group_id")))))
    val cfg = JobConfig.fromJson(json)

    // ---- destination (live) tables ----
    val destTables = Map(
      "group" -> Seq((10L, "Shoes", "SHOP1"), (11L, "Hats", "SHOP1"))
        .toDF("group_id", "gname", "shop"),
      "product" -> Seq(
        (1L, "en", "Boot", 10L), (2L, "en", "Cap", 11L),
        (2L, "fr", "Casquette", 11L), (3L, "fr", "Botte", 10L))
        .toDF("product_id", "lang", "name", "group_id"),
      "product_group" -> Seq((1L, 10L), (2L, 11L)).toDF("product_id", "group_id"))

    // ---- incoming batch: an en-scoped partial import ----
    val incomingTables = Map(
      // new group arrives WITHOUT the constant column -> injected
      "group" -> Seq((12L, "Socks")).toDF("group_id", "gname"),
      // en products only: #1 updated, #4 new (group by NAME, not id),
      // #2 absent -> en copy must die, fr copy must survive; plus an
      // in-batch duplicate and a junk row for quarantine
      "product" -> Seq(
        (1L, "en", "Boot v2", "Shoes"),
        (1L, "en", "Boot v9", "Shoes"), // dup, dedupOrder keeps v2
        (4L, "en", "Sock", "Socks"),
        (-5L, "en", "", "Socks"))       // fails row rules
        .toDF("product_id", "lang", "name", "gname"),
      "product_group" -> Seq((4L, 12L)).toDF("product_id", "group_id"))

    // row rules + the FK-by-name pre hook are CODE (not config),
    // attached to the lowered specs the way the provider assembly
    // attaches its writers around the serialized settings. The resolve
    // runs on the INCOMING side (the staged rows), like the reference's
    // source-row processing — merge keeps destination columns only.
    val groupsForFk = () => destTables("group")
      .unionByName(Seq((12L, "Socks", "SHOP1")).toDF("group_id", "gname", "shop"))
    val specs = JobConfig.toSpecs(cfg).map {
      case s if s.table == "product" => s.copy(
        rowRules = Seq(
          "id_positive" -> (col("product_id") > 0),
          "name_present" -> (length(col("name")) > 0)),
        pre = df => Denormalize.resolve(df, groupsForFk().select("group_id", "gname"),
            Seq("gname" -> "gname"), Seq("group_id" -> "group_id"))
          .withColumn("name", ColumnRules.withDefault(col("name"), "UNNAMED"))
          .drop("gname"))
      case s => s
    }

    val out = ImportJob.run(specs, destTables, incomingTables,
      deps = Map("product" -> Set("group"),
        "product_group" -> Set("product", "group")))

    // group: constant injected, new group appended
    val groups = out("group").orderBy("group_id")
      .as[(Long, String, String)].collect()
    assert(groups === Array((10L, "Shoes", "SHOP1"), (11L, "Hats", "SHOP1"),
      (12L, "Socks", "SHOP1")))

    // product: en#1 updated (dedup kept v2), en#4 inserted + FK resolved
    // by name, en#2 deleted (scoped full-sync), fr rows untouched
    val products = out("product").orderBy("product_id", "lang")
      .select("product_id", "lang", "name", "group_id")
      .as[(Long, String, String, Long)].collect()
    assert(products === Array(
      (1L, "en", "Boot v2", 10L),
      (2L, "fr", "Casquette", 11L),
      (3L, "fr", "Botte", 10L),
      (4L, "en", "Sock", 12L)))

    // quarantine surfaced with reasons
    val quarantined = out("product__quarantined")
      .select("product_id", "quarantine_reason").as[(Long, String)].collect()
    assert(quarantined === Array((-5L, "id_positive,name_present")))

    // relation table upserted
    val rels = out("product_group").orderBy("product_id")
      .as[(Long, Long)].collect()
    assert(rels === Array((1L, 10L), (2L, 11L), (4L, 12L)))
  }
}
