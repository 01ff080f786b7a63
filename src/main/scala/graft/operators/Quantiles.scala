package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact grouped quantiles over a value histogram. Extension category
  * (the reference has no quantile surface; pandas `describe` is the
  * nearest analogue and is never called on data paths).
  *
  * Scale stance: the naive exact quantile (row_number over every row of
  * the group) sorts the FULL group through one window task per group key
  * — at 100 TB with a handful of groups that is a few straggler tasks
  * sorting terabytes. Instead the values are first collapsed to a
  * (group, value, count) histogram with an ordinary map-side-combined
  * aggregation, and the quantile is read off the histogram's cumulative
  * counts. The window then runs over DISTINCT VALUES per group, which for
  * the discrete/low-cardinality measures this targets (quantities,
  * scores, sizes) is orders of magnitude smaller than the row count.
  * For genuinely high-cardinality doubles, bucket the value first or use
  * a mergeable sketch — an exact quantile of 100 TB of distinct doubles
  * is a different (and rarely needed) operator.
  */
object Quantiles {

  /** Exact discrete quantiles per group: for each q in `qs`, the smallest
    * value whose cumulative row count reaches `ceil(q * n)` (the
    * lower-value discrete quantile — always an actual data value, so
    * results are bit-exact in any engine; no interpolation arithmetic).
    *
    * Output: one row per (group, q): groupCols, `q`, `quantile_value`,
    * `n_rows`.
    */
  def groupQuantiles(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      "quantiles must be in (0, 1]")
    // SQL percentile functions ignore NULL values; keeping them here
    // would sort them first (Spark ASC) and shift every position — and
    // DuckDB sorts nulls LAST, so results would diverge between engines.
    val hist = df.where(col(valueCol).isNotNull)
      .groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
    val byGroup = Window.partitionBy(groupCols.map(col): _*)
    val cum = sum(col("__cnt")).over(
      byGroup.orderBy(col(valueCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val n = sum(col("__cnt")).over(byGroup)
    hist
      .withColumn("__cum", cum)
      .withColumn("__n", n)
      .withColumn("q", explode(array(qs.map(lit): _*)))
      // pos = ceil(q*n): exact — q is a binary-representable literal and
      // q*n stays under 2^53; the selected row is the first whose
      // cumulative count reaches pos
      .withColumn("__pos", ceil(col("q") * col("__n")))
      .where(col("__cum") - col("__cnt") < col("__pos") &&
        col("__pos") <= col("__cum"))
      .select((groupCols.map(col) :+ col("q") :+
        col(valueCol).as("quantile_value") :+ col("__n").as("n_rows")): _*)
  }

  /** Approximate grouped quantiles for HIGH-CARDINALITY measures — the
    * scale path [[groupQuantiles]]' doc promises: snap values to a fixed
    * `width` grid first, then take EXACT quantiles of the snapped
    * distribution. Error ≤ `width`, while the histogram is bounded by
    * range/width instead of distinct-value count — a 100 TB double
    * column collapses to a few thousand grid rows. The floor snap is
    * plain arithmetic on each row, so the "approximation" is itself
    * deterministic and oracle-replayable (unlike sketch-based
    * percentile_approx, whose result depends on merge order).
    */
  def approxGroupQuantiles(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      width: Long, qs: Seq[Double]): DataFrame = {
    require(width > 0, s"width must be positive: $width")
    groupQuantiles(
      df.withColumn(valueCol,
        (floor(col(valueCol) / width) * width).cast("long")),
      groupCols, valueCol, qs)
  }

  /** Fixed-width bucket histogram of an integer measure: one row per
    * occupied bucket with its row count and actual value bounds. The last
    * bucket (`nBuckets - 1`) is open-ended so outliers cannot explode the
    * bucket space. Pure map-side-combined aggregation — the distribution
    * profile of a 100 TB column costs one combine-reduced shuffle of at
    * most `nBuckets` rows per partition.
    */
  def histogram(
      df: DataFrame, value: Column, width: Long, nBuckets: Int)
      : DataFrame = {
    require(width > 0 && nBuckets > 0, "width and nBuckets must be positive")
    df.select(value.cast("long").as("__v"))
      .where(col("__v").isNotNull)
      .groupBy(least(floor(col("__v") / width), lit(nBuckets - 1L))
        .cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("__v")).as("min_value"),
        max(col("__v")).as("max_value"))
  }
}
