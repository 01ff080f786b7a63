package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Empirical-CDF counts via a bounded histogram — the rank primitive
  * behind score normalisation and rank fusion: `cdf(x)` = how many rows
  * score at-or-below x (ties inclusive). Extension category.
  *
  * Scale stance: the textbook `rank().over(Window.orderBy(score))`
  * funnels the corpus through ONE window task. Here the ranks are read
  * off the score HISTOGRAM instead: one map-side-combined aggregation
  * collapses the corpus to ≤ |distinct keys| rows, the running count
  * windows over that bounded table, and the (key → cdf) map joins back
  * into a parallel probe scan (broadcast — the table is bounded by the
  * key grid, not the corpus). The price is that keys must be GRIDDED
  * (bounded cardinality): raw per-document scores like an NB log-odds
  * SUM are unbounded-cardinality and would grow the histogram to corpus
  * size — normalise per token and snap to a grid first (the
  * [[graft.text.PerplexityBuckets]] snap discipline; callers in
  * [[graft.queries.TextQueries]] use the 1e-3 per-token grid). Within a
  * grid cell ties share one rank — deterministic under any
  * partitioning, error bounded by the grid width (the
  * `approxGroupQuantiles` stance), and exactly replayable by the
  * oracle.
  */
object CdfRank {

  /** Add `outCol` = count of rows whose `keyCol` ≤ this row's (ties
    * inclusive, so values are in [1, n]). Rows with a null key are
    * dropped (unrankable — the [[BudgetSelect]] null discipline).
    */
  def withCdf(df: DataFrame, keyCol: String, outCol: String): DataFrame = {
    val hist = df.where(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("__c"))
    // running count over the BOUNDED histogram (single partition by
    // design — see the scale stance above), never the corpus
    val cum = hist
      .withColumn(outCol, sum(col("__c")).over(
        Window.orderBy(col(keyCol).asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__c")
    df.join(broadcast(cum), Seq(keyCol))
  }
}
