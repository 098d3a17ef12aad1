package graft.operators

import org.apache.spark.sql.DataFrame
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
  * un-expanded pass — the 100 TB default (the null/row counts stay exact
  * either way).
  */
object Profile {

  def summarize(df: DataFrame, cols: Seq[String],
                approxDistinct: Boolean = false): DataFrame = {
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
}
