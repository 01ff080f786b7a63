package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series resampling: fill missing buckets with zero rows.
  *
  * Produces one row per (group, bucket) over the GLOBAL [min, max] bucket
  * range, so every series has the same dense time axis — the shape chart
  * layers and window diffs expect.
  *
  * Scale shape: the measured aggregation is one map-side-combined shuffle;
  * the dense grid is built from two OUTPUT-sized frames (distinct groups ×
  * bucket range, both orders of magnitude smaller than the input), and the
  * final left join broadcasts the aggregated counts only if small — grid
  * and counts are both |groups|·|buckets|, never input-sized.
  */
object TimeSeries {

  /** @param bucket   integer bucket expression (e.g. epoch-day)
    * @param aggs     aggregations to compute per (group, bucket); their
    *                 nulls on fabricated rows are zero-filled
    */
  def gapFill(
      df: DataFrame,
      groupCol: String,
      bucket: Column,
      bucketName: String,
      aggs: Seq[Column]): DataFrame = {
    val bucketed = df.select(col(groupCol), bucket.as(bucketName))
    val measured = df.withColumn(bucketName, bucket)
      .groupBy(col(groupCol), col(bucketName))
      .agg(aggs.head, aggs.tail: _*)
    val bounds = bucketed.agg(
      min(col(bucketName)).as("_mn"), max(col(bucketName)).as("_mx"))
    val axis = bounds.select(
      explode(sequence(col("_mn"), col("_mx"))).as(bucketName))
    val groups = bucketed.select(groupCol).distinct()
    axis.crossJoin(groups)
      .join(measured, Seq(groupCol, bucketName), "left")
      .na.fill(0)
  }
}
