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
      bulkOrDelta: String = "BULK",
      enumeratedName: Boolean = false): Unit = {
    val table = graft.Admin.cleanTableName(srcTable)
    val dfl = new DataFlow(spark, s"bulkExtract_$table", conf)
    dfl.getDataFromSrc(table, srcSysID, srcTableName = Some(srcTable),
      bulkOrDelta = bulkOrDelta, enumeratedName = enumeratedName)
    dfl.write(table, table, Layer.EXT, keepDataflowOpen = false)
  }

  /** Incremental (delta) extract — the reference's commented design
    * (betl/defaultdataflows/stageExtract.py:95-228), Spark-first: read
    * the source, classify against the staged EXT copy with ONE
    * null-safe full-outer NK join ([[DeltaLoad.classify]]), then apply
    * the reference's three slices:
    *
    *  - INSERT: new NK — lands with a fresh delta audit stamp and a
    *    null `audit_bulk_load_date` (it was never bulk-loaded);
    *  - UPDATE: attributes changed — takes current values but
    *    PRESERVES `audit_bulk_load_date` (the reference's update
    *    clause explicitly skips that column);
    *  - DELETE: NK gone from the source — leaves the staged table
    *    (the reference issues row DELETEs);
    *  - UNCHANGED rows keep their previous audit columns untouched.
    *
    * The new staged state replaces `EXT/<table>` (staging-swap, safe
    * against reading its own input); the non-UNCHANGED slices land in
    * `EXT/<table>_delta` with their op in both `delta_op` and
    * `audit_latest_load_operation`, ready for the delta loads. Returns
    * the (materialised) delta slices.
    *
    * Scale shape: one NK-shuffle full-outer join + one broadcast-back
    * of previous audit columns; everything else is row-local. The
    * source scan is the unavoidable full read — the diff itself never
    * touches more than source + staged.
    */
  def deltaExtract(
      spark: org.apache.spark.sql.SparkSession, conf: GraftConf,
      srcSysID: String, srcTable: String, nkCols: Seq[String],
      deltaLoadDate: Option[String] = None): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import graft.Audit
    val table = graft.Admin.cleanTableName(srcTable)
    val extPath = conf.tablePath(Layer.EXT, table)
    val deltaPath = conf.tablePath(Layer.EXT, s"${table}_delta")
    val cur = conf.srcSystem(srcSysID).read(spark, srcTable)
    val prevFull = graft.io.ParquetUtil.readRecovered(spark, extPath)
    require(nkCols.nonEmpty, s"deltaExtract($table): no natural key — " +
      "cannot run a delta extract (reference stageExtract.py:63-66)")
    val prevAttrs = prevFull.drop(Audit.all: _*)
    val classified = DeltaLoad.classify(cur, prevAttrs, nkCols)
    val prevAudit = prevFull.select(
      (nkCols.map(col) :+ col(Audit.SourceSystem).as("__p_src") :+
        col(Audit.BulkLoadDate).as("__p_bulk") :+
        col(Audit.LatestDeltaLoadDate).as("__p_delta") :+
        col(Audit.LatestLoadOperation).as("__p_op")): _*)
    val now = deltaLoadDate.map(d => to_timestamp(lit(d)))
      .getOrElse(current_timestamp())
    val op = col(DeltaLoad.OpCol)
    val audited = classified.join(prevAudit, nkCols, "left")
      .withColumn(Audit.SourceSystem,
        when(op === "UNCHANGED", col("__p_src")).otherwise(lit(srcSysID)))
      .withColumn(Audit.BulkLoadDate,
        when(op === "INSERT", lit(null).cast("timestamp"))
          .otherwise(col("__p_bulk")))
      .withColumn(Audit.LatestDeltaLoadDate,
        when(op === "UNCHANGED", col("__p_delta")).otherwise(now))
      .withColumn(Audit.LatestLoadOperation,
        when(op === "UNCHANGED", col("__p_op")).otherwise(op))
      .drop("__p_src", "__p_bulk", "__p_delta", "__p_op")
    // two consumers (slices + staged swap) read the classify join:
    // cache it once, extract-sized, released before returning
    audited.persist()
    try {
      // slices first (a plain overwrite - the path is not an input),
      // then the staged swap; the returned frame re-reads the written
      // slices so it cannot lazily observe the post-swap EXT state
      audited.where(op =!= "UNCHANGED")
        .write.mode("overwrite").parquet(deltaPath)
      graft.io.ParquetUtil.safeOverwrite(spark,
        audited.where(op =!= "DELETE").drop(DeltaLoad.OpCol), extPath)
    } finally audited.unpersist()
    graft.io.ParquetUtil.readRecovered(spark, deltaPath)
  }

  /** One default extract op per table the datastore can enumerate. The
    * audit stamp follows the conf's run-control load mode (the `bulk` /
    * `delta` CLI verbs, [[GraftConf.bulkOrDelta]]) at run time.
    */
  def defaultExtractOps(
      spark: org.apache.spark.sql.SparkSession, conf: GraftConf,
      srcSysID: String): Seq[PipelineOp] = {
    val names = conf.srcSystem(srcSysID).tableNames(spark)
    graft.Admin.requireNoCleanNameCollisions(names)
    names.map { t =>
      PipelineOp(s"extract_${graft.Admin.cleanTableName(t)}", Stage.Extract,
        (sp, cf) => bulkExtract(sp, cf, srcSysID, t, cf.bulkOrDelta,
          enumeratedName = true))
    }
  }
}
