package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling — the schema-introspection side of an import tool
  * (the reference inspects source schemas before mapping them,
  * EcomProvider.cs GetOriginalSourceSchema): per column, row count, null
  * count, and distinct cardinality, as ROWS so downstream rules (e.g.
  * "quarantine a mapping whose source column went 100% null") can join
  * against the profile.
  *
  * One aggregate pass produces a single wide row that a `stack` generator
  * unpivots — no per-column scans. Exact multi-column COUNT(DISTINCT)
  * makes Spark expand one row replica per distinct aggregate, so the
  * exact profile costs ~cols × one aggregation; `approxDistinct = true`
  * swaps in HyperLogLog++ sketches, which combine map-side in a single
  * un-expanded pass (the null/row counts stay exact either way).
  *
  * `approxDistinct` has NO DEFAULT — round 6 flipped the old exact
  * default to the scale-safe HLL path, and that kind of silent semantic
  * change (exact counts becoming estimates with no compile error) is
  * exactly what a defaulted flag lets land on external callers. Every
  * caller now chooses: `true` for the scale path (profiling 50 columns
  * of a 100 TB table with exact distinct shuffles ~50× the table
  * through Expand and builds full-cardinality distinct state per
  * column), `false` for dimension-scale inputs or oracle-exact
  * comparison.
  */
object Profile {

  def summarize(df: DataFrame, cols: Seq[String],
                approxDistinct: Boolean): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.foreach(c => require(!c.contains("`") && !c.contains("'"),
      s"unsupported character in column name: $c"))
    val aggCols = (count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        count(when(col(c).isNull, lit(1))).as(s"__null_$c"),
        (if (approxDistinct) approx_count_distinct(col(c))
         else count_distinct(col(c))).as(s"__dist_$c"))
    }).toList
    val one = df.agg(aggCols.head, aggCols.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', `__null_$c`, `__dist_$c`").mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $stackArgs) AS (col_name, n_null, n_distinct)",
      "__n AS n_rows")
      .select(col("col_name"), col("n_rows"), col("n_null"), col("n_distinct"))
  }

  /** Order-independent content checksum for sync validation: did the
    * rows that arrived at the destination equal the rows the source
    * sent, without moving either side again? (The reference validates
    * syncs by row count — at 100 TB a count can match while content
    * differs.) Per group: row count + the SUM of 60-bit row digests
    * (md5 over the '|'-joined columns, nulls as a sentinel) — summing
    * makes the digest row-ORDER independent, so two engines/partitions
    * can compare without a sort, and any single-row difference moves the
    * sum with probability 1 − 2⁻⁶⁰.
    *
    * Cross-engine contract (how the DuckDB oracle replays it): md5 of
    * the UTF-8 string is standard; 15 hex chars = 60 bits fit a signed
    * 64-bit; the sum accumulates in decimal(38). Callers must pass
    * columns whose STRING forms are engine-portable — cast doubles to
    * decimal first (double→string formatting diverges across engines).
    */
  /** The 60-bit per-row digest [[groupChecksum]] sums, as a column —
    * exposed so the checksum is INCREMENTALLY MAINTAINABLE: it is a
    * plain decimal sum, so `IncrementalAgg.foldCdc(state, delta, keys,
    * Profile.rowDigest(cols), op)` keeps (n_rows, digest total) current
    * under a change feed; the comparison checksum at read time is
    * `total % 2^62` (IncrementalProfileSpec proves fold == recompute).
    */
  def rowDigest(contentCols: Seq[String]): Column = {
    require(contentCols.nonEmpty, "digest needs content columns")
    conv(
      substring(md5(concat_ws("|",
        contentCols.map(c => coalesce(col(c).cast("string"), lit("\u0000null"))): _*)),
        1, 15), 16, 10).cast("decimal(20,0)")
  }

  def groupChecksum(df: DataFrame, groupCols: Seq[String],
                    contentCols: Seq[String]): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        // fold to 62 bits: the checksum is a COMPARISON value, and a
        // decimal(38) sum overflows native ints / float64 mantissas in
        // downstream tooling; mod keeps it a plain BIGINT everywhere
        (sum(rowDigest(contentCols)) % lit(4611686018427387904L)).cast("long")
          .as("content_checksum"))

  /** Multi-table checksum as ONE aggregate: each leg projects to
    * (table_name, row digest) — digests over that leg's OWN content
    * columns — the legs union, and a single groupBy(table_name) sums.
    * Value-identical to unioning per-table [[groupChecksum]] outputs
    * (same per-row digest, same count, same 62-bit fold), but N
    * separate exchange+aggregate subtrees collapse to one exchange:
    * with AQE each post-agg union leg is its own materialized query
    * stage scheduled as a separate job, and the per-stage scheduling
    * floor dominates a sync-validation checksum tail (measured on
    * q_ecom_job: five checksum legs were the only >1 s actions of the
    * job's 57 AQE stage-jobs).
    */
  def taggedChecksum(legs: Seq[(String, DataFrame, Seq[String])]): DataFrame = {
    require(legs.nonEmpty, "taggedChecksum needs at least one leg")
    legs.map { case (nm, df, contentCols) =>
      df.select(lit(nm).as("table_name"),
        rowDigest(contentCols).as("__digest"))
    }.reduce(_ unionByName _)
      .groupBy(col("table_name"))
      .agg(count(lit(1)).as("n_rows"),
        (sum(col("__digest")) % lit(4611686018427387904L)).cast("long")
          .as("content_checksum"))
  }
}
