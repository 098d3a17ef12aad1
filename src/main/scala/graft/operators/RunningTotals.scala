package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GLOBAL ordered running totals and ranks without the one-task global
  * window: `Window.orderBy(...)` with no partition key funnels the
  * whole frame through a single task — the repo's documented
  * anti-pattern — yet Pareto/ABC shares, global quantile scores, and
  * "cumulative % of total" reports genuinely need a total order.
  *
  * Same two-pass machine as Mixture's per-group ranged cumsum
  * (Mixture.withRunningBefore), degenerated to one global group:
  * range-repartition on the order columns (each partition holds a
  * contiguous slice of the total order), per-partition subtotals roll
  * into partition offsets through a window over the
  * PARTITION-COUNT-sized stats frame (that tiny frame is the only
  * single-task step), and every row's running value is its partition
  * offset plus a partition-local running sum. The localCheckpoint pins
  * the range exchange so both passes see identical partitioning (the
  * SurrogateKeys determinism argument). EAGER: the result is
  * materialized; callers get plain columns.
  */
object RunningTotals {

  /** Inclusive global running sum of `valueCol` (LongType) in the total
    * order given by `orderBys` (use `.desc`/`.asc` column expressions;
    * the order must be TOTAL — add a unique tiebreak).
    */
  def globalRunningSum(df: DataFrame, orderBys: Seq[Column], valueCol: String,
                       outCol: String): DataFrame =
    run(df, orderBys, col(valueCol), outCol)

  /** Global rank (1-based, dense in row count — row_number semantics)
    * in the total order given by `orderBys`.
    */
  def globalRank(df: DataFrame, orderBys: Seq[Column], outCol: String): DataFrame =
    run(df, orderBys, lit(1L), outCol)

  /** Per-GROUP inclusive running sum without funneling a hot group
    * through one task: range-partition on (group, order) — a dominant
    * group spans many contiguous partitions — then per-(partition,
    * group) subtotals roll into offsets exactly as in the global form
    * (the Mixture.withRunningBefore machine, inclusive variant, made
    * public). Use when group cardinality is LOW (a per-group window
    * would hot-partition) but the order is needed exactly.
    */
  def groupedRunningSum(df: DataFrame, groupCols: Seq[String],
                        orderBys: Seq[Column], valueCol: String,
                        outCol: String): DataFrame = {
    require(!df.columns.exists(c => c == "__pid" || c == "__off" || c == outCol),
      s"temp columns __pid/__off/$outCol collide with the input")
    val gcols = groupCols.map(col)
    val rangeCols = gcols ++ orderBys
    val sorted = df.repartitionByRange(rangeCols: _*)
      .sortWithinPartitions(rangeCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val statsW = Window.partitionBy(gcols: _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sorted.groupBy(col("__pid") +: gcols: _*)
      .agg(sum(col(valueCol)).as("__psum"))
      .withColumn("__off", coalesce(sum(col("__psum")).over(statsW), lit(0L)))
      .drop("__psum")
    val localW = Window.partitionBy(col("__pid") +: gcols: _*).orderBy(orderBys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = sorted.join(broadcast(offsets), "__pid" +: groupCols)
      .withColumn(outCol, col("__off") + sum(col(valueCol)).over(localW))
      .drop("__pid", "__off")
    try out.localCheckpoint(true)
    finally org.apache.spark.sql.graftbridge.bridge.freeLocalCheckpoint(sorted)
  }

  /** EXCLUSIVE global running max of `valueCol` (LongType) in the given
    * total order: each row sees the max over all STRICTLY-PRECEDING
    * rows (null for the first row — no predecessor). The
    * strict-predecessor form is what dominance tests (Pareto/skyline)
    * need; same two-pass machine with the max monoid.
    */
  def globalRunningMaxExclusive(df: DataFrame, orderBys: Seq[Column],
                                valueCol: String, outCol: String): DataFrame = {
    require(!df.columns.exists(c => c == "__pid" || c == "__off" || c == outCol),
      s"temp columns __pid/__off/$outCol collide with the input")
    val sorted = df.repartitionByRange(orderBys: _*)
      .sortWithinPartitions(orderBys: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val statsW = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sorted.groupBy(col("__pid"))
      .agg(max(col(valueCol)).as("__pmax"))
      .withColumn("__off", max(col("__pmax")).over(statsW)) // null for pid 0
      .drop("__pmax")
    val localW = Window.partitionBy(col("__pid")).orderBy(orderBys: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    // greatest() skips nulls and returns null only when BOTH sides are
    // null — exactly the no-predecessor semantics wanted here
    val out = sorted.join(broadcast(offsets), Seq("__pid"))
      .withColumn(outCol, greatest(max(col(valueCol)).over(localW), col("__off")))
      .drop("__pid", "__off")
    try out.localCheckpoint(true)
    finally org.apache.spark.sql.graftbridge.bridge.freeLocalCheckpoint(sorted)
  }

  private def run(df: DataFrame, orderBys: Seq[Column], value: Column,
                  outCol: String): DataFrame = {
    require(!df.columns.exists(c => c == "__pid" || c == "__off" || c == "__v" || c == outCol),
      s"temp columns __pid/__off/__v/$outCol collide with the input")
    val sorted = df.repartitionByRange(orderBys: _*)
      .sortWithinPartitions(orderBys: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", value)
      .localCheckpoint(true)
    val statsW = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sorted.groupBy(col("__pid"))
      .agg(sum(col("__v")).as("__psum"))
      .withColumn("__off", coalesce(sum(col("__psum")).over(statsW), lit(0L)))
      .drop("__psum")
    val localW = Window.partitionBy(col("__pid")).orderBy(orderBys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = sorted.join(broadcast(offsets), Seq("__pid"))
      .withColumn(outCol, col("__off") + sum(col("__v")).over(localW))
      .drop("__pid", "__off", "__v")
    try out.localCheckpoint(true)
    finally org.apache.spark.sql.graftbridge.bridge.freeLocalCheckpoint(sorted)
  }
}
