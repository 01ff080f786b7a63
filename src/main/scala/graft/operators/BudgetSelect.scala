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
      budgetFrac: Double): DataFrame =
    thresholdFromHist(histogram(df, scoreCol, weightCol), scoreCol,
      budgetFrac)

  /** The bounded (score, total-weight) histogram the selection is
    * solved on: one map-side-combined aggregation, ≤ |distinct scores|
    * rows. ADDITIVE-mergeable — summing partial histograms over any
    * partitioning of the corpus (or stream) equals the batch histogram,
    * which is what makes the nearline rendering ([[applyBatch]]) exact.
    *
    * Null scores are unrankable — dropped up front (they could never be
    * selected, but Spark's DESC sort puts nulls LAST while SQL engines
    * like DuckDB put them FIRST, so leaving them in the histogram would
    * shift the running sum differently per engine — the Quantiles null
    * discipline).
    */
  def histogram(df: DataFrame, scoreCol: String,
      weightCol: String): DataFrame =
    df.where(col(scoreCol).isNotNull)
      .groupBy(col(scoreCol))
      .agg(sum(col(weightCol)).as("__w"))

  /** Threshold from a prebuilt histogram (batch or streamed state). */
  def thresholdFromHist(hist: DataFrame, scoreCol: String,
      budgetFrac: Double): DataFrame = {
    require(budgetFrac > 0 && budgetFrac <= 1,
      s"budgetFrac must be in (0, 1]: $budgetFrac")
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
      budgetFrac: Double): DataFrame =
    probe(df, scoreCol,
      thresholdByBudget(df, scoreCol, weightCol, budgetFrac))

  /** Probe scan against a 1-row threshold frame (broadcast). */
  private def probe(df: DataFrame, scoreCol: String,
      thr: DataFrame): DataFrame =
    df.crossJoin(broadcast(thr))
      .where(col(scoreCol) >= col("score_threshold"))
      .drop("score_threshold", "budget", "total_weight")

  // ------------------------------------------------------------------
  // nearline: the score histogram maintained across micro-batches
  // ------------------------------------------------------------------

  /** Fold one micro-batch of (score, weight) rows into the persisted
    * histogram state — the streaming rendering. The histogram is
    * ADDITIVE ([[histogram]]), but addition is not idempotent, so
    * replay protection under at-least-once delivery is the batch-id
    * watermark carried inside the single atomically-swapped state frame
    * — the [[graft.text.Dsir.applyBatch]] algebra. State never exceeds
    * the score grid's cardinality (≤ 1e6+1 rows for the 6-decimal
    * quality grid), regardless of how many tokens have streamed past.
    */
  def applyBatch(s: org.apache.spark.sql.SparkSession, b: DataFrame,
      scoreCol: String, weightCol: String, batchId: Long,
      stateDir: String): Unit = {
    val applied = graft.io.ParquetUtil.lastBatch(s, stateDir)
    if (applied.exists(batchId <= _)) return
    val hasState = applied.isDefined
    val partial = histogram(b, scoreCol, weightCol)
    val merged =
      if (!hasState) partial
      else graft.io.ParquetUtil.readRecovered(s, stateDir)
        .drop("last_batch")
        .unionByName(partial)
        .groupBy(scoreCol)
        .agg(sum(col("__w")).as("__w"))
    graft.io.ParquetUtil.safeOverwrite(s,
      merged.withColumn("last_batch", lit(batchId)), stateDir)
  }

  /** The full selection against the streamed histogram — equals
    * [[select]] of the batch corpus exactly (the folded histogram IS
    * the batch histogram; the budget base derives from state, so the
    * probe is the only corpus-sized work at query time).
    */
  def selectFromState(s: org.apache.spark.sql.SparkSession,
      df: DataFrame, scoreCol: String, budgetFrac: Double,
      stateDir: String): DataFrame =
    probe(df, scoreCol,
      thresholdFromHist(s.read.parquet(stateDir).drop("last_batch"),
        scoreCol, budgetFrac))
}
