package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass column profiling: row count, null count, distinct count, and
  * lexicographic min/max (as strings) for every requested column.
  *
  * All statistics come out of a SINGLE aggregation over the table — at
  * 100 TB the scan happens once, not once per column. Multiple distinct
  * counts make Catalyst plan an Expand (one duplicated stream per
  * distinct-column), which is still one pass over the source with
  * map-side partials; the final stack() to long format runs on the 1-row
  * summary, so it is free.
  *
  * min/max are surfaced as strings so heterogeneous columns share one
  * schema. Callers should profile string/integer columns: float-to-string
  * rendering is engine-specific, everything else is canonical.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__nd_$c"),
        min(col(c).cast("string")).as(s"__mn_$c"),
        max(col(c).cast("string")).as(s"__mx_$c"))
    }
    val summary = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stackArgs = cols.flatMap { c =>
      Seq(s"'$c'", s"__n - `__nn_$c`", s"`__nd_$c`", s"`__mn_$c`",
        s"`__mx_$c`")
    }.mkString(", ")
    summary.selectExpr(
      "__n AS n_rows",
      s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, n_nulls, n_distinct, min_str, max_str)")
      .select("col_name", "n_rows", "n_nulls", "n_distinct",
        "min_str", "max_str")
  }
}
