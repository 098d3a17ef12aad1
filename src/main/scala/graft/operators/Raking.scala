package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Survey raking — iterative proportional fitting (Deming & Stephan
  * 1940): re-weight a biased sample so its weighted row and column
  * margins match known population targets. The calibration step every
  * panel/survey pipeline runs before reporting, and the classic way to
  * de-bias an activity-selected subsample against the full customer
  * base.
  *
  * Scale shape: the DISTRIBUTED work is the cell count (one grouped
  * aggregate over the sample, map-side combinable) and the target
  * margins (two more grouped counts); the IPF loop itself runs on the
  * DRIVER over the |rows|×|cols| cell table — BOUNDED BY CONTRACT
  * (both axes are low-cardinality categoricals; the loop is
  * meaningless otherwise) — in exact BigInt arithmetic. Weights are
  * e6-quantized integers and every update is one floor division, so
  * the whole fit is bit-deterministic and an oracle can replay the
  * unrolled iterations in SQL.
  */
object Raking {

  /** (rowCol, colCol, n, weight_e6) per observed sample cell after
    * `iters` full IPF rounds (row update then column update, weights
    * re-quantized to e6 after each). `rowTargets`/`colTargets`:
    * (key, target-count) frames — every sample key must appear.
    */
  def rake(sample: DataFrame, rowCol: String, colCol: String,
           rowTargets: DataFrame, colTargets: DataFrame,
           iters: Int = 3, maxCells: Int = 100000): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters in [1,50], got $iters")
    val spark = sample.sparkSession
    val cells = sample.groupBy(col(rowCol), col(colCol))
      .agg(count(lit(1)).as("__n")).limit(maxCells + 1)
      .collect().map(r => (r.get(0).toString, r.get(1).toString, r.getLong(2)))
    require(cells.length <= maxCells,
      s"rake: > $maxCells cells — the axes are not low-cardinality; " +
        "pre-bucket them")
    def margin(df: DataFrame) = {
      val rows = df.limit(maxCells + 1).collect()
      require(rows.length <= maxCells,
        s"rake: > $maxCells target rows — margins must be low-cardinality")
      rows.map(r => r.get(0).toString -> r.getLong(1)).toMap
    }
    val tr = margin(rowTargets)
    val tc = margin(colTargets)
    cells.foreach { case (r, c, _) =>
      require(tr.contains(r), s"rake: sample row '$r' missing from rowTargets")
      require(tc.contains(c), s"rake: sample col '$c' missing from colTargets")
    }
    var w: Map[(String, String), BigInt] =
      cells.map { case (r, c, _) => (r, c) -> BigInt(1000000L) }.toMap
    val byRow = cells.groupBy(_._1)
    val byCol = cells.groupBy(_._2)
    for (_ <- 1 to iters) {
      val rowM = byRow.map { case (r, cs) =>
        r -> cs.map { case (_, c, n) => w((r, c)) * n }.sum }
      w = w.map { case ((r, c), wv) =>
        (r, c) -> (wv * tr(r) * 1000000L / rowM(r)) }
      val colM = byCol.map { case (c, cs) =>
        c -> cs.map { case (r, _, n) => w((r, c)) * n }.sum }
      w = w.map { case ((r, c), wv) =>
        (r, c) -> (wv * tc(c) * 1000000L / colM(c)) }
    }
    val rows = cells.map { case (r, c, n) =>
      Row(r, c, n, w((r, c)).toLong) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(
        StructField(rowCol, StringType, nullable = false),
        StructField(colCol, StringType, nullable = false),
        StructField("n", LongType, nullable = false),
        StructField("weight_e6", LongType, nullable = false))))
  }
}
