package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Filesystem-level helpers for the Parquet warehouse layers. */
object ParquetUtil {

  /** Total bytes on disk under a table directory, or -1 when the path does
    * not exist. Compressed Parquet size is a conservative lower bound on
    * the in-memory relation size — used to gate broadcast decisions
    * (see [[graft.warehouse.StageLoad.bulkLoadFact]]).
    */
  def dirSizeBytes(spark: SparkSession, path: String): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) -1L
    else fs.getContentSummary(p).getLength
  }

  /** Overwrite a Parquet table even when `df`'s lineage READS the same
    * path (the reference's delta pattern: read table → transform → write
    * back, betl/dataflow/dfl_io.py:61-212). A direct
    * `mode("overwrite")` would delete the input files mid-plan; instead we
    * materialise to a sibling staging dir first, then swap. Rename is
    * atomic on HDFS/local FS; on object stores it degrades to copy —
    * acceptable for a layer-boundary write.
    */
  def safeOverwrite(spark: SparkSession, df: DataFrame, path: String,
      partitionBy: Seq[String] = Seq.empty): Unit = {
    val target = new Path(path)
    val staging = new Path(path + "__staging")
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(staging.toString)
    if (fs.exists(target)) fs.delete(target, true)
    if (!fs.rename(staging, target))
      throw new java.io.IOException(
        s"safeOverwrite: rename $staging -> $target failed")
  }
}
