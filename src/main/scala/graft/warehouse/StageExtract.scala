package graft.warehouse

import graft.{DataFlow, GraftConf}
import graft.catalog.Layer
import graft.pipeline.{PipelineOp, Stage}

/** Default extract stage: one op per source-system table, each doing
  * source → audit stamp → EXT, with no bespoke code (reference
  * bulkExtract fan-out, betl/defaultdataflows/stageExtract.py:13-39,
  * wired per-table at betl/PipelineClass.py:80-99).
  *
  * Table discovery comes from [[graft.io.Datastore.tableNames]]; the ops
  * are independent so the pipeline runs them concurrently, and each one
  * is itself a distributed read→write job.
  */
object StageExtract {

  /** Extract one table: read under its RAW source name, land in EXT
    * under the [[graft.Admin.cleanTableName]]-normalised name — the same
    * normalisation `readSrc` uses when registering EXT defs, so
    * registration and extraction always agree.
    */
  def bulkExtract(
      spark: org.apache.spark.sql.SparkSession, conf: GraftConf,
      srcSysID: String, srcTable: String,
      bulkOrDelta: String = "BULK"): Unit = {
    val table = graft.Admin.cleanTableName(srcTable)
    val dfl = new DataFlow(spark, s"bulkExtract_$table", conf)
    dfl.getDataFromSrc(table, srcSysID, srcTableName = Some(srcTable),
      bulkOrDelta = bulkOrDelta)
    dfl.write(table, table, Layer.EXT, keepDataflowOpen = false)
  }

  /** One default extract op per table the datastore can enumerate. */
  def defaultExtractOps(
      spark: org.apache.spark.sql.SparkSession, conf: GraftConf,
      srcSysID: String): Seq[PipelineOp] = {
    val names = conf.srcSystem(srcSysID).tableNames(spark)
    graft.Admin.requireNoCleanNameCollisions(names)
    names.map { t =>
      PipelineOp(s"extract_${graft.Admin.cleanTableName(t)}", Stage.Extract,
        (sp, cf) => bulkExtract(sp, cf, srcSysID, t))
    }
  }
}
