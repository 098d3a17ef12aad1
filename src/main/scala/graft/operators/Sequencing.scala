package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap / island detection over an integer key domain — the ETL audit that
  * answers "which ids are missing from this feed?" (a sync that dropped a
  * batch leaves a contiguous hole) and "which ranges are loaded?".
  *
  * Reference tie-in: the provider's full-sync delete
  * (EcomDestinationWriter.cs:3067 DeleteExcessFromMainTable) trusts the
  * incoming feed to be complete; gap detection is the pre-flight that
  * catches an INCOMPLETE feed before it deletes half the destination.
  *
  * The textbook formulation is `lag(key) OVER (ORDER BY key)` — a GLOBAL
  * ordered window, which Spark executes in ONE partition: dead at 100 TB.
  * This operator keeps the semantics with distributed work:
  *
  *  1. One partial-agg scan finds the domain [mn, mx].
  *  2. Each key maps to `bucket = (key - mn) DIV width` — an ARITHMETIC
  *     function of the key (no range-exchange sampling pass), so the only
  *     full-data movement is one hash shuffle on bucket id.
  *  3. In-bucket gaps come from a lag window PARTITIONED by bucket
  *     (runs where the data already lives).
  *  4. A per-bucket (min, max) summary — same grouping key, so it reuses
  *     the bucket exchange — is nBuckets rows at most; lag over THAT tiny
  *     frame stitches cross-bucket gaps, and a wholly-empty bucket simply
  *     widens the stitched gap (absent buckets need no special case).
  *
  * Null keys are ignored; duplicate keys are harmless (equal neighbours
  * produce no gap). Keys are compared as longs.
  */
object Sequencing {

  /** Missing ranges of `keyCol`: (gap_start, gap_end, gap_len), gaps
    * strictly inside [min(key), max(key)].
    */
  def gaps(df: DataFrame, keyCol: String, nBuckets: Int = 256): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val spark = df.sparkSession
    val keys = df.select(col(keyCol).cast("long").as("k")).filter(col("k").isNotNull)
    // Domain bounds: a 2-value driver round-trip (same bounded-collect tier
    // as Binning's boundary array) — needed because the bucket id must be a
    // deterministic expression of the key alone.
    val bounds = keys.agg(min(col("k")), max(col("k"))).head()
    if (bounds.isNullAt(0)) return emptyGaps(spark)
    gapsFromKeys(keys, bounds.getLong(0), bounds.getLong(1), nBuckets)
  }

  /** [[gaps]] body over pre-derived keys + bounds, so [[islands]] (which
    * needs the same keys and bounds itself) never rescans the source for
    * them.
    */
  private def gapsFromKeys(keys: DataFrame, mn: Long, mx: Long,
                           nBuckets: Int): DataFrame = {
    // ceil((span) / nBuckets) without floats; width ≥ 1
    val width = math.max(1L, (mx - mn) / nBuckets + 1L)

    // integer DIV, not `/`: Column `/` is double division, which loses
    // exactness past 2^53 — key domains at 100 TB can live up there.
    val bucketed = keys.withColumn("b", expr(s"(k - ${mn}L) div ${width}L"))
    val w = Window.partitionBy(col("b")).orderBy(col("k"))
    val local = bucketed
      .withColumn("pk", lag(col("k"), 1).over(w))
      .filter(col("pk").isNotNull && col("k") > col("pk") + 1)
      .select((col("pk") + 1).as("gap_start"), (col("k") - 1).as("gap_end"))

    // nBuckets-row summary; the single-partition lag window over it is
    // over ≤ nBuckets rows BY CONSTRUCTION, never data-sized.
    val summary = bucketed.groupBy(col("b"))
      .agg(min(col("k")).as("bmn"), max(col("k")).as("bmx"))
    val wb = Window.orderBy(col("b"))
    val cross = summary
      .withColumn("pmx", lag(col("bmx"), 1).over(wb))
      .filter(col("pmx").isNotNull && col("bmn") > col("pmx") + 1)
      .select((col("pmx") + 1).as("gap_start"), (col("bmn") - 1).as("gap_end"))

    local.unionByName(cross)
      .withColumn("gap_len", col("gap_end") - col("gap_start") + 1)
      .orderBy(col("gap_start"))
  }

  /** Present contiguous ranges of `keyCol`: (island_start, island_end,
    * n_keys) — n_keys counts DISTINCT keys in the island. The dual view of
    * [[gaps]] (one more row than gaps), same distributed shape, derived by
    * closing the complement: island boundaries are the gap edges plus the
    * domain ends.
    */
  def islands(df: DataFrame, keyCol: String, nBuckets: Int = 256): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val spark = df.sparkSession
    // NO dedup, NO persist (round 13): gap detection is
    // duplicate-insensitive (equal neighbours produce no gap) and the
    // island key count is CLOSED FORM (below), so distinct keys are
    // never needed — the round-10 dropDuplicates paid a full extra
    // exchange of the key column for nothing once the count went
    // arithmetic. Two projected scans (bounds + gaps) beat one scan +
    // a persisted shuffle at every SF measured.
    val keys = df.select(col(keyCol).cast("long").as("k"))
      .filter(col("k").isNotNull)
    val bounds = keys.agg(min(col("k")), max(col("k"))).head()
    if (bounds.isNullAt(0)) return emptyIslands(spark)
    val (mn, mx) = (bounds.getLong(0), bounds.getLong(1))
    val g = gapsFromKeys(keys, mn, mx, nBuckets)
      .select(col("gap_start"), col("gap_end"))
    // Islands close the gaps' complement with ONE ordered pass over the
    // gap-sized frame (audit-scale, not data-scale): append a SENTINEL
    // gap at mx+1, then every island is
    // (previous gap's end + 1 — or mn for the first, gap_start − 1) —
    // the sentinel emits the tail island (last gap end + 1 .. mx), and
    // with no real gaps it alone emits the whole domain. Round 13
    // replaced the two rank windows + rank join with this single lag;
    // the gap frame is consumed exactly once.
    require(mx < Long.MaxValue, "islands: key domain max at Long.MaxValue" +
      " leaves no room for the sentinel gap")
    val sentinel = spark.range(1).select(
      lit(mx + 1).as("gap_start"), lit(mx + 1).as("gap_end"))
    val wg = Window.orderBy(col("gap_start"))
    // distinct-key count per island is CLOSED FORM: a gap is a maximal
    // missing run, so every integer inside an island is a present key —
    // n_keys = end − start + 1 (round 10 replaced the keys×islands
    // range join with the arithmetic).
    g.unionByName(sentinel)
      .withColumn("prev_end", lag(col("gap_end"), 1).over(wg))
      .select(coalesce(col("prev_end") + 1, lit(mn)).as("island_start"),
        (col("gap_start") - 1).as("island_end"))
      .withColumn("n_keys", col("island_end") - col("island_start") + 1)
      .orderBy(col("island_start"))
      .localCheckpoint(true)
  }

  private def emptyGaps(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("gap_start", LongType), StructField("gap_end", LongType),
        StructField("gap_len", LongType))))
  }

  private def emptyIslands(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("island_start", LongType), StructField("island_end", LongType),
        StructField("n_keys", LongType))))
  }
}
