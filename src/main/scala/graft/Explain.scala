package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Plan audit main: prints the formatted physical plan of selected
  * queries so pushdown/broadcast/codegen can be reviewed (SURVEY.md §5).
  *
  * Besides `SparkEntry.queries` names, accepts STAGE audit names for the
  * expensive family — the eager pipelines (minhashPairs, canonicalize)
  * materialize internally, so their load-bearing stages are exposed here
  * as lazy frames whose plans show the claimed shuffle structure:
  * `lsh_candidates`, `decontaminate_overlaps`, `ann_assign`,
  * `ann_probe`, `clusters_mapping_join`, `corpus_dedup_stage`,
  * `asof_join_stage`, `asof_nearest_stage`, `range_join_stage`,
  * `surrogate_assign`, `incremental_join_stage`, `zorder_write_stage`.
  */
object Explain {

  def stageAudits(dir: String): Map[String, SparkSession => DataFrame] = Map(
    "lsh_candidates" -> (s =>
      graft.dedup.NearDup.minhashCandidates(
        Tables.load(s, dir, "documents"), "doc_id", "text")),
    "decontaminate_overlaps" -> { s =>
      val docs = Tables.load(s, dir, "documents")
      graft.dedup.Decontaminate.overlaps(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0), "doc_id", "text", n = 8)
    },
    "ann_assign" -> { s =>
      val emb = Tables.load(s, dir, "embeddings")
      val cents = graft.similarity.Knn.trainCentroids(emb, nCentroids = 8, iters = 1)
      graft.similarity.Knn.assign(emb, cents)
    },
    "ann_probe" -> { s =>
      val emb = Tables.load(s, dir, "embeddings")
      val cents = graft.similarity.Knn.trainCentroids(emb, nCentroids = 8, iters = 1)
      graft.similarity.Knn.ivfTopK(emb, emb.filter(col("vec_id") < 10), cents,
        k = 5, nProbe = 2)
    },
    "clusters_mapping_join" -> { s =>
      // the apply side of canonicalize: corpus ids ⟕ broadcast mapping
      val ids = Tables.load(s, dir, "documents").select(col("doc_id").as("id"))
      val mapping = s.range(100).select(col("id"), (col("id") % 7).as("__canon"))
      ids.join(broadcast(mapping), Seq("id"), "left_outer")
        .select(col("id"), coalesce(col("__canon"), col("id")).as("canonical_id"))
    },
    "asof_join_stage" -> { s =>
      val ev = Tables.load(s, dir, "events")
      val r = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("pval"))
      graft.operators.AsOf.joinAsOf(
        ev.select(col("event_id"), col("user_id"), col("ts"), col("value")),
        r, Seq("user_id"), "ts", Seq("pval"))
    },
    "asof_nearest_stage" -> { s =>
      // must show TWO running [unboundedPreceding, currentRow] frames
      // (asc + desc sorts over one keyed exchange) and NO
      // [currentRow, unboundedFollowing] frame — the quadratic shape
      // removed in round 6
      val ev = Tables.load(s, dir, "events")
      val r = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("pval"))
      graft.operators.AsOf.joinAsOf(
        ev.select(col("event_id"), col("user_id"), col("ts"), col("value")),
        r, Seq("user_id"), "ts", Seq("pval"), direction = "nearest")
    },
    "range_join_stage" -> { s =>
      import s.implicits._
      val bands = Seq((0L, 99999L, "low"), (100000L, 299999L, "mid"),
        (300000L, 999999L, "high")).toDF("lo", "hi", "tier")
      graft.operators.RangeJoin.byBucket(
        Tables.load(s, dir, "orders").select(col("o_orderkey"),
          floor(col("o_totalprice")).cast("long").as("price_l")),
        bands, "price_l", "lo", "hi", 50000L)
    },
    "surrogate_assign" -> { s =>
      // id assignment must stay in Tungsten: no ExistingRDD scan, the
      // offset arithmetic is a codegen'd projection (PlansSpec enforces)
      graft.operators.SurrogateKeys.assign(
        Tables.load(s, dir, "documents").select(col("doc_id"), col("source")),
        Seq(col("doc_id")), "sk", 1000L)
    },
    "incremental_join_stage" -> { s =>
      // maintain's union: state branch must show broadcast anti joins
      // only (no Exchange between the state scan and the Union) —
      // PLANS.md q_incremental_join; enforced in IncrementalJoinSpec
      val a = Tables.load(s, dir, "orders").select(col("o_orderkey"),
        col("o_custkey").as("custkey"), col("o_totalprice"))
      val b = Tables.load(s, dir, "customer")
        .select(col("c_custkey").as("custkey"), col("c_name"))
      val state = graft.operators.IncrementalJoin.joinOf(a, b, Seq("custkey"))
      val deltaA = a.filter(col("o_orderkey") % 1000 === 0)
      graft.operators.IncrementalJoin.maintain(state, a, deltaA, b,
        b.filter(lit(false)), Seq("custkey"), "o_orderkey", "custkey")
    },
    "zorder_write_stage" -> { s =>
      // the pre-write frame: ONE range exchange on the interleaved key,
      // rank assignment a codegen'd fold (no join, no second pass)
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"), col("value"))
      val ranks = graft.sources.Layout.equiDepthRanks(ev, Seq("user_id", "value"))
      ev.withColumn("__z", graft.sources.Layout.zOrderKey(ranks))
        .repartitionByRange(16, col("__z"))
        .sortWithinPartitions("__z")
    },
    "corpus_dedup_stage" -> { s =>
      // CorpusClean's annotate → quality floor → normalized exact dedup
      // (its only corpus-wide shuffle before the LSH stage) — the SAME
      // shared-tokens form run() executes, so the audit records what
      // production runs
      import graft.functions.TextFunctions
      Tables.load(s, dir, "documents")
        .withColumn("__toks", TextFunctions.tokens(col("text")))
        .withColumn("quality_bp", TextFunctions.qualityScoreT(col("__toks"), col("text")))
        .withColumn("pred_lang", TextFunctions.langIdT(col("__toks")))
        .drop("__toks")
        .filter(col("quality_bp") >= 3000)
        .withColumn("__normh", md5(TextFunctions.normalizeForDedup(col("text"))))
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("__normh"))
            .orderBy(col("doc_id"))))
        .filter(col("__rn") === 1)
        .drop("__normh", "__rn")
    })

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.create(8)
    val audits = stageAudits(dir)
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_filtered_read", "q1_agg", "q3_top_orders", "q5_join5")
    names.foreach { n =>
      println(s"\n================ $n ================")
      // "exec:<name>" runs the frame first (noop-style full
      // materialization via collect-to-nothing) and then explains, so
      // the printed plan is AQE's FINAL plan — ReusedExchange /
      // AQEShuffleRead markers included. The lazy default shows the
      // initial plan, which re-expands shared subtrees per consumer
      // and cannot show runtime stage reuse (round 14).
      val (exec, name) =
        if (n.startsWith("exec:")) (true, n.stripPrefix("exec:")) else (false, n)
      val df = audits.get(name) match {
        case Some(f) => f(spark)
        case None => SparkEntry.queries(name)(spark, dir)
      }
      // collect() drives THIS Dataset's own QueryExecution (foreach/rdd
      // would wrap a new one and leave this plan un-finalized)
      if (exec) df.collect()
      df.explain("formatted")
    }
    spark.stop()
  }
}
