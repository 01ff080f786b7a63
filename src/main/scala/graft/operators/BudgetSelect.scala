package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget corpus selection: keep the highest-scoring documents
  * whose total weight (token count) fits a budget. Extension category —
  * the curation pass a pretraining run makes when the target token count
  * is fixed and quality ranks the corpus (e.g. "take the best 25% of
  * tokens").
  *
  * Scale stance: the textbook implementation — global sort by score,
  * running-sum window, cut at the budget — funnels 100 TB through ONE
  * window task (a global running sum has no partition key). Instead the
  * selection is solved on a (score, total_weight) HISTOGRAM: one
  * map-side-combined aggregation collapses the corpus to at most
  * |distinct scores| rows (scores here are 6-decimal-rounded doubles in
  * [0,1] — ≤ 1e6+1 buckets regardless of corpus size), the running sum
  * windows over that bounded table, and the threshold broadcasts back
  * into a second corpus scan. Whole-bucket semantics: a score bucket is
  * kept only if EVERYTHING at-or-above it fits the budget, so the result
  * is deterministic without any within-bucket tiebreak ordering (the
  * [[Quantiles]] histogram discipline; the boundary bucket's partial fill
  * is forgone — bounded under-fill of at most one bucket's weight, and
  * the operator stays shuffle-light and oracle-exact).
  */
object BudgetSelect {

  /** One-row threshold frame `(score_threshold, budget, total_weight)`:
    * the smallest score value such that the total weight at-or-above it
    * fits `floor(budgetFrac * total_weight)`. Empty (zero rows) when even
    * the single highest score bucket overflows the budget — a join
    * against it then correctly selects nothing.
    *
    * `scoreCol` must be a bounded-cardinality measure (rounded/gridded),
    * per the histogram stance above; `weightCol` an integral weight.
    */
  def thresholdByBudget(
      df: DataFrame, scoreCol: String, weightCol: String,
      budgetFrac: Double): DataFrame = {
    require(budgetFrac > 0 && budgetFrac <= 1,
      s"budgetFrac must be in (0, 1]: $budgetFrac")
    // null scores are unrankable — drop them up front (they could never
    // be selected, but Spark's DESC sort puts nulls LAST while SQL
    // engines like DuckDB put them FIRST, so leaving them in the
    // histogram would shift the running sum differently per engine —
    // the Quantiles null discipline)
    val df2 = df.where(col(scoreCol).isNotNull)
    val hist = df2.groupBy(col(scoreCol))
      .agg(sum(col(weightCol)).as("__w"))
    // budget base = Σ of the histogram's bucket sums (identical to the
    // corpus sum, exact integer arithmetic) — derived from the BOUNDED
    // hist frame so the threshold costs one corpus scan, not two
    val total = hist.agg(
      floor(lit(budgetFrac) * sum(col("__w"))).cast("long")
        .as("budget"),
      sum(col("__w")).as("total_weight"))
    // running weight of all buckets at-or-above each score: the window
    // runs over the BOUNDED histogram (single partition by design — see
    // the scale stance above), never the corpus
    val cum = sum(col("__w")).over(
      Window.orderBy(col(scoreCol).desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    hist
      .withColumn("__cum", cum)
      .crossJoin(broadcast(total))
      .where(col("__cum") <= col("budget"))
      .groupBy(col("budget"), col("total_weight"))
      .agg(min(col(scoreCol)).as("score_threshold"))
      .select("score_threshold", "budget", "total_weight")
  }

  /** The full selection: rows of `df` whose `scoreCol` is at-or-above the
    * budget threshold (whole-bucket semantics). The 1-row threshold frame
    * broadcasts into the probe scan.
    */
  def select(
      df: DataFrame, scoreCol: String, weightCol: String,
      budgetFrac: Double): DataFrame = {
    val thr = thresholdByBudget(df, scoreCol, weightCol, budgetFrac)
    df.crossJoin(broadcast(thr))
      .where(col(scoreCol) >= col("score_threshold"))
      .drop("score_threshold", "budget", "total_weight")
  }
}
