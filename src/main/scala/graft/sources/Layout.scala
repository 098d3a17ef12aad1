package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering for
  * stats-based pruning on MORE THAN ONE column.
  *
  * A linear sort clusters only its leading column — per-file min/max
  * ranges of every other filter column span the whole domain, so a scan
  * filtered on them prunes nothing. Interleaving the bits of
  * rank-normalized dimensions into one sort key gives every dimension a
  * narrow per-file range at once (the published Z-order layout used by
  * lakehouse table formats); parquet min/max stats then prune files and
  * row groups for filters on ANY of the clustered columns.
  *
  * Scale shape: rank normalization is ONE bounded-state aggregate
  * (`approx_percentile` summaries, d × (2^bits − 1) doubles to the
  * driver — data-size-independent), assignment is a broadcast fold over
  * the boundary array inside codegen, and the write is one range
  * repartition on the interleaved key — exactly the shuffle a linear
  * sorted write already pays. Equi-depth ranks (not min-max scaling)
  * keep the curve balanced under skew: each rank cell holds ~1/2^bits of
  * the rows regardless of the value distribution.
  */
object Layout {

  /** Per-dimension equi-depth rank in [0, 2^bits): the number of
    * quantile boundaries ≤ value, via one shared aggregate pass.
    * Nulls rank 0 (they sort first, like Spark's NULLS FIRST default).
    */
  def equiDepthRanks(df: DataFrame, dims: Seq[String],
                     bits: Int = 8): Seq[Column] = {
    require(dims.nonEmpty, "z-order needs at least one dimension")
    require(bits >= 1 && bits * dims.size <= 62,
      s"bits * dims must fit a long: $bits * ${dims.size}")
    val nBounds = (1 << bits) - 1
    val probs = (1 to nBounds).map(i => i.toDouble / (1 << bits))
    val arr = probs.mkString("array(", ",", ")")
    // one aggregate row carrying every dimension's boundary array
    val row = df.agg(
      expr(s"approx_percentile(CAST(`${dims.head}` AS DOUBLE), $arr, 10000)").as(dims.head),
      dims.tail.map(d =>
        expr(s"approx_percentile(CAST(`$d` AS DOUBLE), $arr, 10000)").as(d)): _*)
      .head()
    dims.zipWithIndex.map { case (d, i) =>
      val bounds = Option(row.getSeq[Double](i)).getOrElse(Seq.empty)
      if (bounds.isEmpty) lit(0L) // all-null dimension: constant rank
      else {
        val boundsLit = array(bounds.map(lit(_)): _*)
        // rank = #boundaries <= value, a codegen'd fold over a literal
        // array — no per-row allocation, no broadcast join
        coalesce(aggregate(boundsLit, lit(0L),
          (acc, b) => acc + when(col(d).cast("double") >= b, 1L).otherwise(0L)),
          lit(0L))
      }
    }
  }

  /** Interleave pre-normalized ranks (each in [0, 2^bits)) into the
    * Morton key: bit b of dim i lands at position b * d + i.
    */
  def zOrderKey(ranks: Seq[Column], bits: Int = 8): Column =
    Seq.tabulate(bits, ranks.size) { (b, i) =>
      shiftleft(shiftrightunsigned(ranks(i).cast("long"), b).bitwiseAND(lit(1L)),
        b * ranks.size + i)
    }.flatten.reduce(_.bitwiseOR(_))

  /** Write `df` as `nFiles` parquet files clustered on the Z-order curve
    * over `dims`. LayoutSpec measures the effect: every dimension's
    * per-file value span shrinks to ~(1/nFiles)^(1/d) of the domain,
    * where a linear sort leaves non-leading spans at ~the full domain.
    */
  def writeZOrdered(df: DataFrame, path: String, dims: Seq[String],
                    bits: Int = 8, nFiles: Int = 32): Unit = {
    val z = zOrderKey(equiDepthRanks(df, dims, bits), bits)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
