package graft

import graft.catalog._
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{StringType, TimestampType}

/** Admin verbs — the engine's rendering of the reference's admin.py
  * surface: `readsrc` source-schema introspection (admin.py:147-357),
  * schema-desc file refresh (admin.py:364-474), and the
  * `rebuildall`/`reset` physical rebuild verbs (admin.py:481-488,
  * fileSetup.py:11-76). GSheet plumbing is out of scope (SURVEY §7.1);
  * schema descriptions live in JSON files via [[CatalogIO]].
  */
object Admin {

  /** Introspect every table of a source system and register an EXT
    * TableDef for each: the source's own columns (as typed by its reader)
    * plus the four audit columns every extract appends. Returns the defs.
    */
  def readSrc(
      spark: SparkSession, conf: GraftConf, srcSysID: String): Seq[TableDef] = {
    val ds = conf.srcSystem(srcSysID)
    ds.tableNames(spark).map { t =>
      val srcCols = ds.read(spark, t).schema.fields.toSeq.map { f =>
        ColumnDef(f.name, f.dataType, nullable = f.nullable)
      }
      val auditCols = Seq(
        ColumnDef(Audit.SourceSystem, StringType),
        ColumnDef(Audit.BulkLoadDate, TimestampType),
        ColumnDef(Audit.LatestDeltaLoadDate, TimestampType),
        ColumnDef(Audit.LatestLoadOperation, StringType))
      conf.catalog.register(TableDef(t, Layer.EXT, srcCols ++ auditCols))
    }
  }

  /** readsrc + write the schema-desc file (refreshSchemaDescTextFiles
    * parity, admin.py:364-474).
    */
  def readSrcToFile(
      spark: SparkSession, conf: GraftConf, srcSysID: String,
      schemaFile: String): Seq[TableDef] = {
    val defs = readSrc(spark, conf, srcSysID)
    CatalogIO.toJsonFile(conf.catalog, schemaFile)
    defs
  }

  /** Drop the physical tables of the given layers (rebuild verbs:
    * `rebuildall` drops+recreates every layer's tables; Parquet-side the
    * recreate is implicit on next write).
    */
  def rebuild(
      spark: SparkSession, conf: GraftConf,
      layers: Seq[Layer] = Layer.all): Unit =
    layers.foreach { layer =>
      val p = new Path(s"${conf.warehousePath}/${layer.id}")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
    }

  /** Wipe the whole warehouse (reset verb). */
  def reset(spark: SparkSession, conf: GraftConf): Unit = {
    val p = new Path(conf.warehousePath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
  }
}
