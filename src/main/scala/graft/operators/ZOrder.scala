package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional layout clustering (Z-order): rows are sorted by the
  * bit-interleaving of per-column quantile-bucket ids, so a range
  * predicate on ANY clustered column confines matches to a narrow band
  * of the sort order — and parquet footer min/max stats then prune the
  * row groups / files outside it. This is the layout half of data
  * skipping: the scan-side pruning is stock Spark+parquet; clustering
  * is what makes the stats selective (same design as the OPTIMIZE
  * ZORDER maintenance verb of lakehouse table formats).
  *
  * Scale shape: per-column bucket boundaries come from
  * `approxQuantile` — sample-sized driver state, like the k-means
  * centroid collect — and the rewrite itself is one range shuffle +
  * per-partition sort, the same cost as the plain compaction rewrite
  * it extends ([[graft.Admin.compact]]). Quantile buckets (not
  * equal-width) keep the interleave balanced under skew.
  */
object ZOrder {

  /** The z-value column: each of `cols` quantile-bucketed to `bits`
    * bits (boundaries from `df`), bucket ids bit-interleaved
    * minor-to-major so every column contributes equally at every
    * granularity. Null orders first (bucket 0).
    */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int = 8): Column = {
    val nCols = cols.size
    require(nCols >= 1, "zValue needs at least one column")
    require(bits * nCols <= 60, s"$nCols cols x $bits bits exceeds 60")
    val buckets = 1 << bits
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val ids = cols.map { c =>
      // distinct boundaries: duplicated quantiles on low-cardinality
      // columns would otherwise inflate the id past buckets-1
      val bs = df.stat.approxQuantile(c, probs, 0.001).distinct
      val arr = array(bs.map(lit(_)): _*)
      // bucket id = #boundaries <= value; O(buckets) per row, codegen'd
      coalesce(
        size(filter(arr, b => b <= col(c).cast("double"))), lit(0))
        .cast("long")
    }
    (0 until bits).flatMap { b =>
      ids.zipWithIndex.map { case (id, i) =>
        // bit b of column i lands at z bit (b * nCols + i)
        shiftleft(shiftright(id, b).bitwiseAND(lit(1L)), b * nCols + i)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Rewrite `df` z-order-clustered into `numFiles` range partitions,
    * each internally sorted by z-value. Dropping the helper column
    * after the sort keeps the physical row order.
    */
  def cluster(
      df: DataFrame, cols: Seq[String], numFiles: Int,
      bits: Int = 8): DataFrame =
    df.withColumn("__zorder", zValue(df, cols, bits))
      .repartitionByRange(numFiles, col("__zorder"))
      .sortWithinPartitions("__zorder")
      .drop("__zorder")
}
