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

  /** Source-table-name normalisation (reference cleanTableName,
    * admin.py:797-804): spaces → underscores, parens and dashes stripped,
    * lowercased — spreadsheet/worksheet titles become valid table names.
    */
  def cleanTableName(src: String): String = src
    .replace(" ", "_")
    .replace("(", "")
    .replace(")", "")
    .replace("-", "")
    .toLowerCase

  /** Fail fast when two source tables normalise to the same cleaned name
    * (e.g. "My-Table" and "my_table") — a silent collision would let one
    * table's EXT registration and extract target overwrite the other's.
    */
  def requireNoCleanNameCollisions(names: Seq[String]): Unit = {
    val collided = names.groupBy(cleanTableName).filter(_._2.sizeIs > 1)
    require(collided.isEmpty,
      "source table names collide after cleanTableName normalisation: " +
        collided.toSeq.sortBy(_._1).map { case (c, origs) =>
          origs.sorted.mkString("[", ", ", "]") + s" -> $c"
        }.mkString("; "))
  }

  /** Introspect every table of a source system and register an EXT
    * TableDef for each: the source's own columns (as typed by its reader)
    * plus the four audit columns every extract appends. Registered names
    * are [[cleanTableName]]-normalised (the reference does the same for
    * spreadsheet-titled sources). Returns the defs.
    */
  def readSrc(
      spark: SparkSession, conf: GraftConf, srcSysID: String): Seq[TableDef] = {
    val ds = conf.srcSystem(srcSysID)
    val names = ds.tableNames(spark)
    requireNoCleanNameCollisions(names)
    names.map { t =>
      val srcCols = ds.readEnumerated(spark, t).schema.fields.toSeq.map { f =>
        ColumnDef(f.name, f.dataType, nullable = f.nullable)
      }
      val auditCols = Seq(
        ColumnDef(Audit.SourceSystem, StringType),
        ColumnDef(Audit.BulkLoadDate, TimestampType),
        ColumnDef(Audit.LatestDeltaLoadDate, TimestampType),
        ColumnDef(Audit.LatestLoadOperation, StringType))
      conf.catalog.register(
        TableDef(cleanTableName(t), Layer.EXT, srcCols ++ auditCols))
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

  /** Project scaffolding (the non-interactive core of the reference's
    * setup wizard, admin.py:495-603 + setup/fileSetup.py:78-257): create
    * the warehouse layer directories plus conf/, reports/ and logs/, a
    * starter declarative config (`conf/appConfig.json`, the shape
    * [[GraftConfIO]] reads) and a `.gitignore` covering the generated
    * dirs. Existing files are left untouched — safe to re-run.
    */
  def scaffold(appDir: String, dwhId: String = "DWH"): Unit = {
    import java.nio.file.{Files, Paths}
    val root = Paths.get(appDir)
    val warehouse = root.resolve("warehouse")
    (Layer.all.map(l => warehouse.resolve(l.id)) ++
      Seq("conf", "reports", "logs").map(root.resolve(_)))
      .foreach(Files.createDirectories(_))
    val confFile = root.resolve("conf/appConfig.json")
    if (!Files.exists(confFile)) {
      // built with Jackson (not string interpolation) so appDir values
      // containing quotes/backslashes (Windows paths) stay valid JSON
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val cfg = om.createObjectNode()
      cfg.put("dwhId", dwhId.toLowerCase)
      cfg.put("warehousePath", s"$appDir/warehouse")
      cfg.put("reportsPath", s"$appDir/reports")
      val srcNode = cfg.putObject("srcSystems").putObject("SRC")
      srcNode.put("type", "csv")
      srcNode.put("dir", s"$appDir/src_data")
      Files.write(confFile,
        om.writerWithDefaultPrettyPrinter().writeValueAsBytes(cfg))
    }
    val gitignore = root.resolve(".gitignore")
    if (!Files.exists(gitignore))
      Files.write(gitignore,
        "warehouse/\nreports/\nlogs/\n".getBytes("UTF-8"))
  }

  /** Compact a layer table's small files: rewrite to
    * ceil(bytes / targetBytes) output files (min 1). The streaming
    * upsert sink and per-op layer writes accrete one file per batch /
    * task; at warehouse scale the file count — not the data — becomes
    * the scan's bottleneck (driver-side listing + task-per-file).
    * Returns (files_before, files_after). Staging-swap rewrite
    * ([[graft.io.ParquetUtil.safeOverwrite]]): readers never observe a
    * half-compacted table.
    */
  def compact(spark: SparkSession, conf: GraftConf, layer: Layer,
      table: String, targetBytes: Long = 128L * 1024 * 1024): (Long, Long) = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val path = conf.tablePath(layer, table)
    // a retry after a mid-swap kill finds the table at __old: restore it
    // before sizing
    graft.io.ParquetUtil.recoverInterrupted(spark, path)
    val bytes = graft.io.ParquetUtil.dirSizeBytes(spark, path)
    require(bytes >= 0, s"compact: no table at $path")
    val before = partFileCount(spark, path)
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    graft.io.ParquetUtil.safeOverwrite(spark,
      graft.io.ParquetUtil.readRecovered(spark, path).repartition(n), path)
    (before, partFileCount(spark, path))
  }

  /** Z-order-cluster a layer table by `zorderCols`
    * ([[graft.operators.ZOrder]]): [[compact]]'s sizing plus a
    * multi-dimensional sort, so parquet min/max stats prune range
    * predicates on any clustered column. Same staging-swap rewrite —
    * readers never observe a half-clustered table. Returns
    * (files_before, files_after).
    */
  def optimizeLayout(spark: SparkSession, conf: GraftConf, layer: Layer,
      table: String, zorderCols: Seq[String],
      targetBytes: Long = 128L * 1024 * 1024, bits: Int = 8): (Long, Long) = {
    require(zorderCols.nonEmpty, "optimizeLayout needs zorder columns")
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val path = conf.tablePath(layer, table)
    graft.io.ParquetUtil.recoverInterrupted(spark, path)
    val bytes = graft.io.ParquetUtil.dirSizeBytes(spark, path)
    require(bytes >= 0, s"optimizeLayout: no table at $path")
    val before = partFileCount(spark, path)
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    graft.io.ParquetUtil.safeOverwrite(spark,
      graft.operators.ZOrder.cluster(
        graft.io.ParquetUtil.readRecovered(spark, path), zorderCols, n, bits), path)
    (before, partFileCount(spark, path))
  }

  private def partFileCount(spark: SparkSession, path: String): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(p).count(_.getPath.getName.startsWith("part-")).toLong
  }
}

/** Append-only alert report file — the reference's logAlert
  * (betl/logger/alerts.py:4-12): one `_alerts.txt` per warehouse,
  * conditions separated by blank lines. The MDM unmapped-rows alert
  * (dfl_mdm.py:196-204) is the canonical producer.
  */
object Alerts {
  def path(conf: GraftConf): java.nio.file.Path =
    java.nio.file.Paths.get(s"${conf.resolvedReportsPath}/_alerts.txt")

  def log(conf: GraftConf, alert: String): Unit = {
    val p = path(conf)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, (alert + "\n\n").getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
  }
}
