package graft.warehouse

import graft.GraftConf
import graft.catalog.Layer
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}

/** Default summarise prep (reference defaultSummarisePrep,
  * betl/defaultdataflows/stageSummarise.py:26-59): truncate every SUM
  * table before the bespoke summary dataflows repopulate them. The
  * reference also drops indexes — a Parquet no-op (SURVEY §2.7).
  */
object StageSummarise {

  /** SUM tables currently present in the warehouse (filesystem listing —
    * the physical truth, independent of catalog registration).
    */
  def summaryTables(spark: SparkSession, conf: GraftConf): Seq[String] = {
    val root = new Path(s"${conf.warehousePath}/${Layer.SUM.id}")
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) Seq.empty
    else {
      val dirs = fs.listStatus(root).filter(_.isDirectory)
        .map(_.getPath.getName).toSeq
      // a `t__old` without its base table is an interrupted swap: the
      // table logically exists and the read path will recover it —
      // enumerate it under its base name, never under the sibling name
      (dirs.filterNot(graft.io.ParquetUtil.isProtocolSibling) ++
        dirs.filter(_.endsWith("__old")).map(_.stripSuffix("__old")))
        .distinct.sorted
    }
  }

  /** Truncate all SUM tables, preserving their schemas. Staging-swap
    * rather than plain overwrite: a retry killed mid-truncate must still
    * find a readable table to take the schema from.
    */
  def defaultSummarisePrep(spark: SparkSession, conf: GraftConf): Unit =
    summaryTables(spark, conf).foreach { t =>
      val path = conf.tablePath(Layer.SUM, t)
      val schema = graft.io.ParquetUtil.readRecovered(spark, path).schema
      graft.io.ParquetUtil.safeOverwrite(spark,
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema), path)
    }
}
