package graft

import graft.catalog.{Layer, TableDef}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import scala.collection.mutable

/** Filter predicate specs for [[DataFlow.filter]] — the Spark rendering of
  * the reference's per-column string/tuple predicates
  * (betl/dataflow/dfl_changeRow.py:37-93).
  *
  * NOTE: the reference's `'<'` branch has a bug (applies `>`,
  * dfl_changeRow.py:57-60); we implement the *intended* `<` per SURVEY §2.2.
  */
sealed trait FilterSpec { def toPredicate(c: Column): Column }
object FilterSpec {
  case class Eq(value: Any) extends FilterSpec {
    def toPredicate(c: Column): Column = c === lit(value)
  }
  /** Null-KEEPING inequality: the reference's pandas `!=` keeps NaN rows
    * (dfl_changeRow.py:65-72), unlike SQL three-valued logic which drops
    * them — hence the explicit isNull disjunct.
    */
  case class Ne(value: Any) extends FilterSpec {
    def toPredicate(c: Column): Column = c.isNull || c =!= lit(value)
  }
  case class Gt(value: Any) extends FilterSpec {
    def toPredicate(c: Column): Column = c > lit(value)
  }
  case class Lt(value: Any) extends FilterSpec {
    def toPredicate(c: Column): Column = c < lit(value)
  }
  /** Null-keeping NOT IN, matching pandas `~isin` (dfl_changeRow.py:65-72). */
  case class NotIn(values: Seq[Any]) extends FilterSpec {
    def toPredicate(c: Column): Column = c.isNull || !c.isin(values: _*)
  }
}

/** A unit of work over named datasets — the engine's equivalent of the
  * reference's DataFlow (betl/dataflow/DataFlowClass.py:4-115).
  *
  * Where the reference eagerly mutates pandas frames and materialises every
  * step to CSV, each named dataset here is a LAZY Spark logical plan;
  * Catalyst fuses the whole chain (pushdown, pruning, codegen) and nothing
  * is materialised until `write`. Methods mutate the name→DataFrame map and
  * return `this` for chaining; operator names and parameter semantics match
  * the reference 1:1 so existing pipelines port mechanically.
  */
class DataFlow(
    val spark: SparkSession,
    val desc: String,
    val conf: GraftConf) {

  private val data = mutable.LinkedHashMap[String, DataFrame]()
  private val log = new StepLogger(desc, conf.debugCounts)

  /** Per-step durations of this dataflow so far — the input to
    * [[StepHistory.reportAndRecord]] (step-variance report).
    */
  def stepTimings: Seq[StepHistory.StepTiming] = log.timings

  /** This dataflow's job log in the reference's text format
    * ([[JobLog]]); persist via [[JobLog.writeNumbered]].
    */
  def jobLogText: String = log.jobLogText

  def datasetNames: Seq[String] = data.keys.toSeq

  /** Fetch a dataset's current plan (reference getDataFrames,
    * dfl_io.py:337-357 — which returns *copies*; DataFrames are immutable so
    * the handle itself is safe to share).
    */
  def get(dataset: String): DataFrame =
    data.getOrElse(dataset, throw new IllegalArgumentException(
      s"Dataset '$dataset' not found in dataflow '$desc' " +
        s"(have: ${data.keys.mkString(", ")})"))

  private def put(dataset: String, df: DataFrame): DataFlow = {
    data(dataset) = df
    this
  }

  // -------------------------------------------------------------------
  // §2.1 sources / sinks / scans
  // -------------------------------------------------------------------

  /** Load a warehouse-layer table into a named dataset
    * (reference read, betl/dataflow/dfl_io.py:9-58). Layer tables are
    * Parquet — columnar, splittable, predicate-pushdown-friendly — in place
    * of the reference's tmp CSVs.
    */
  def read(
      tableName: String,
      dataLayer: Layer,
      targetDataset: Option[String] = None): DataFlow =
    log.step("read", s"$dataLayer/$tableName") {
      put(targetDataset.getOrElse(tableName),
        graft.io.ParquetUtil.readRecovered(spark, conf.tablePath(dataLayer, tableName)))
    }(r => Some(r.get(targetDataset.getOrElse(tableName))))

  /** Validate + reorder columns against the logical schema, then persist to
    * the layer (reference write, betl/dataflow/dfl_io.py:61-212). Unknown or
    * missing columns raise with an explicit report (dfl_io.py:134-160);
    * column order in the output follows the catalog definition.
    *
    * `partitionBy` lays the table out hive-style on the given columns —
    * at 100 TB a date-partitioned fact is what turns "scan everything"
    * into partition-pruned reads (the reference's Postgres heap tables
    * have no analogue; this is a Spark-first extension).
    */
  def write(
      dataset: String,
      targetTableName: String,
      dataLayerID: Layer,
      appendOrReplace: String = "replace",
      keepDataflowOpen: Boolean = true,
      partitionBy: Seq[String] = Seq.empty): DataFlow = {
    log.step("write", s"$dataLayerID/$targetTableName") {
      val df = get(dataset)
      val tdef = conf.catalog.lookup(dataLayerID, targetTableName)
        .getOrElse {
          if (conf.strictSchema) throw new IllegalArgumentException(
            s"write($targetTableName → $dataLayerID): table not declared " +
              "in the catalog (strictSchema mode)")
          conf.catalog.registerFromSchema(
            dataLayerID, targetTableName, df.schema)
        }
      val expected = tdef.columnNames
      val actual = df.columns.toSeq
      val unknown = actual.filterNot(expected.contains)
      val missing = expected.filterNot(actual.contains)
      if (unknown.nonEmpty || missing.nonEmpty)
        throw new IllegalArgumentException(
          s"write($targetTableName → $dataLayerID): schema mismatch. " +
            s"Unknown columns: [${unknown.sorted.mkString(", ")}]; " +
            s"missing columns: [${missing.sorted.mkString(", ")}]")
      val mode =
        if (appendOrReplace.equalsIgnoreCase("append")) "append"
        else "overwrite"
      val orderedNarrow = df.select(expected.map(col): _*)
      // Layer-table fan-out: a substantial frame arriving on a handful of
      // partitions (single-file upstream table, broadcast-join chain that
      // never shuffled) would land as one near-unsplittable parquet file
      // and serialise every downstream stage that reads this table — on a
      // cluster, one task. Scale such writes out to the session's shuffle
      // width; frames that are already wide (the 100 TB case: thousands of
      // scan partitions) or tiny (dims, lookup tables) are left alone.
      // (Detection must not touch .rdd/.toRdd: under AQE, resolving final
      // partitioning executes the upstream stages — the whole chain would
      // run twice. A compiled-plan shuffle means the frame is already at
      // shuffle width; otherwise width ≈ the scans' file splits. Size
      // comes from the actual input files, NOT plan stats: without CBO a
      // join's stats are the PRODUCT of its children, which would flag
      // every broadcast-joined pair of tiny dims as "substantial".)
      val targetParts = spark.sessionState.conf.numShufflePartitions
      lazy val hasShuffle = orderedNarrow.queryExecution.sparkPlan.find(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
        .isDefined
      lazy val inputFiles = orderedNarrow.inputFiles
      lazy val fewInputs = inputFiles.length < math.max(4, targetParts / 4)
      lazy val inputBytes: Long = {
        val hconf = spark.sessionState.newHadoopConf()
        inputFiles.map { f =>
          try {
            val p = new org.apache.hadoop.fs.Path(f)
            p.getFileSystem(hconf).getFileStatus(p).getLen
          } catch { case _: java.io.IOException => 0L }
        }.sum
      }
      val ordered =
        if (!hasShuffle && fewInputs && inputBytes > 8L * 1024 * 1024)
          // group rows by partition value when laying out hive-style, so
          // each task writes one file per partition dir instead of every
          // task writing a sliver into every partition
          (if (partitionBy.nonEmpty)
            orderedNarrow.repartition(targetParts, partitionBy.map(col): _*)
          else orderedNarrow.repartition(targetParts))
        else orderedNarrow
      val path = conf.tablePath(dataLayerID, targetTableName)
      // both modes are scheduler-retry-safe: append rides the
      // pending-marker protocol (no double-landed batch), replace the
      // recoverable staging-swap
      if (mode == "append")
        graft.io.ParquetUtil.safeAppend(spark, ordered, path, partitionBy)
      // overwrite via staging + swap: safe when the dataset's lineage reads
      // the same table (read → transform → write back)
      else graft.io.ParquetUtil.safeOverwrite(spark, ordered, path, partitionBy)
      // TRG parity: BSE/SUM additionally land in the target datastore
      // (reference dfl_io.py:81-94 — always DB-writes those layers).
      // Append pushes only the just-written batch — re-reading the table
      // would duplicate previously-synced rows in the sink.
      if (dataLayerID.db == "TRG")
        conf.trgSink.foreach(_.write(spark,
          if (mode == "append") ordered else graft.io.ParquetUtil.readRecovered(spark, path),
          targetTableName, mode))
      this
      // the written frame is the step's described output (golden write
      // blocks carry an Output shape, LoggerClass.py:539-554)
    }(_ => Some(get(dataset)))
    // close OUTSIDE the step: close() flushes the jobLog to the run file,
    // which must already contain this write's own step block
    if (!keepDataflowOpen) close()
    this
  }

  /** Extract from a configured source system and stamp audit columns
    * (reference getDataFromSrc, betl/dataflow/dfl_io.py:215-296). Row limit
    * (dev mode `limitdata`) is applied at the source so Catalyst can push
    * the limit into the scan.
    */
  def getDataFromSrc(
      tableName: String,
      srcSysID: String,
      srcTableName: Option[String] = None,
      bulkOrDelta: String = "BULK",
      enumeratedName: Boolean = false): DataFlow =
    log.step("getDataFromSrc", s"$srcSysID/${srcTableName.getOrElse(tableName)}") {
      val ds = conf.srcSystem(srcSysID)
      val name = srcTableName.getOrElse(tableName)
      // enumeratedName: the name came from Datastore.tableNames metadata
      // (exact stored case) rather than a hand-written config entry
      val raw = if (enumeratedName) ds.readEnumerated(spark, name)
                else ds.read(spark, name)
      val limited = conf.dataLimitRows.map(raw.limit).getOrElse(raw)
      put(tableName, limited)
      setAuditCols(tableName, bulkOrDelta, srcSysID)
    }(r => Some(r.get(tableName)))

  /** Create a dataset from an existing DataFrame
    * (reference createDataset, betl/dataflow/dfl_io.py:299-319).
    */
  def createDataset(dataset: String, df: DataFrame): DataFlow =
    log.step("createDataset", dataset) { put(dataset, df) }(
      r => Some(r.get(dataset)))

  /** Create a dataset from literal column→values data (the reference's dict
    * form). All-string values mirror the reference's stringly ingestion.
    */
  def createDataset(
      dataset: String, data: Map[String, Seq[String]]): DataFlow = {
    val names = data.keys.toSeq
    val n = data.values.headOption.map(_.size).getOrElse(0)
    require(data.values.forall(_.size == n),
      "createDataset: all columns must have the same length")
    val rows = (0 until n).map(i => Row(names.map(c => data(c)(i)): _*))
    val schema = org.apache.spark.sql.types.StructType(
      names.map(org.apache.spark.sql.types.StructField(
        _, org.apache.spark.sql.types.StringType)))
    createDataset(dataset,
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema))
  }

  /** Alias a dataset under one or more new names (reference
    * duplicateDataset, dfl_io.py:322-334). DataFrames are immutable plans —
    * no copy is needed or made.
    */
  def duplicateDataset(
      dataset: String, targetDatasets: Seq[String]): DataFlow =
    log.step("duplicateDataset", s"$dataset → ${targetDatasets.mkString(",")}") {
      val df = get(dataset)
      targetDatasets.foreach(put(_, df))
      this
    }(_ => None)

  /** Dict-of-handles accessor (reference getDataFrames, dfl_io.py:337-357;
    * the reference's list branch is bugged — we implement the intent).
    */
  def getDataFrames(datasets: Seq[String]): Map[String, DataFrame] =
    datasets.map(d => d -> get(d)).toMap

  /** Project columns out to app code (reference getColumns,
    * dfl_io.py:360-396).
    */
  def getColumns(dataset: String, columnNames: Seq[String]): DataFrame =
    get(dataset).select(columnNames.map(col): _*)

  def getColumnList(dataset: String): Seq[String] =
    log.step("getColumnList", dataset) {
      get(dataset).columns.toSeq
    }(_ => None)

  /** Empty a layer table, preserving schema (reference truncate,
    * dfl_changeRow.py:6-20 + TRUNCATE…RESTART IDENTITY, dbIO.py:47-53).
    * The SK sequence restart is implicit here: surrogate keys are
    * re-derived deterministically on every bulk load (see SurrogateKeys).
    */
  def truncate(tableName: String, dataLayerID: Layer): DataFlow =
    log.step("truncate", s"$dataLayerID/$tableName") {
      val path = conf.tablePath(dataLayerID, tableName)
      val schema = graft.io.ParquetUtil.readRecovered(spark, path).schema
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema)
        .write.mode("overwrite").parquet(path)
      this
    }(_ => None)

  // -------------------------------------------------------------------
  // §2.2 projections / filters / row ops
  // -------------------------------------------------------------------

  /** Per-column predicate filter (reference filter,
    * dfl_changeRow.py:37-93). All specs are ANDed, matching the
    * reference's sequential reassignment loop.
    */
  def filter(
      dataset: String,
      filters: Map[String, FilterSpec],
      targetDataset: Option[String] = None): DataFlow =
    log.step("filter", s"$dataset ${filters.keys.mkString(",")}") {
      val df = get(dataset)
      val pred = filters.map { case (c, spec) => spec.toPredicate(col(c)) }
        .reduceOption(_ && _).getOrElse(lit(true))
      put(targetDataset.getOrElse(dataset), df.filter(pred))
    }(r => Some(r.get(targetDataset.getOrElse(dataset))))

  /** Keep rows of `dataset` whose key is NOT present in `lookupDataset`
    * (reference filterWhereNotIn, dfl_changeRow.py:96-162). The reference
    * string-concatenates composite keys into one column; Spark joins on
    * multi-column keys natively — a LEFT ANTI join, broadcast by Catalyst
    * when the lookup side is small.
    */
  def filterWhereNotIn(
      dataset: String,
      columns: Seq[String],
      lookupDataset: String,
      targetDataset: Option[String] = None): DataFlow =
    log.step("filterWhereNotIn", s"$dataset !⋉ $lookupDataset") {
      val keep = get(dataset).join(
        get(lookupDataset).select(columns.map(col): _*),
        columns, "left_anti")
      put(targetDataset.getOrElse(dataset), keep)
    }(r => Some(r.get(targetDataset.getOrElse(dataset))))

  /** Drop exact duplicate rows (reference dedupe, dfl_changeRow.py:23-34).
    * Map-side partial aggregation makes this one shuffle of distinct rows,
    * not a full-data shuffle.
    */
  def dedupe(dataset: String, targetDataset: Option[String] = None): DataFlow =
    log.step("dedupe", dataset) {
      put(targetDataset.getOrElse(dataset), get(dataset).dropDuplicates())
    }(r => Some(r.get(targetDataset.getOrElse(dataset))))

  /** Drop by list OR keep-list; audit columns ride along unless
    * dropAuditCols (reference dropColumns, dfl_changeSchema.py:21-63).
    */
  def dropColumns(
      dataset: String,
      colsToDrop: Seq[String] = Seq.empty,
      colsToKeep: Seq[String] = Seq.empty,
      dropAuditCols: Boolean = false): DataFlow =
    log.step("dropColumns", dataset) {
      require(colsToDrop.isEmpty || colsToKeep.isEmpty,
        "dropColumns: specify colsToDrop OR colsToKeep, not both")
      val df = get(dataset)
      val present = df.columns.toSeq
      val kept =
        if (colsToKeep.nonEmpty) {
          val keep = colsToKeep ++
            (if (dropAuditCols) Seq.empty else Audit.all)
          present.filter(keep.contains)
        } else {
          val drop = colsToDrop ++
            (if (dropAuditCols) Audit.all else Seq.empty)
          present.filterNot(drop.contains)
        }
      put(dataset, df.select(kept.map(col): _*))
    }(r => Some(r.get(dataset)))

  /** Rename via map (reference renameColumns, dfl_changeSchema.py:4-18). */
  def renameColumns(dataset: String, renames: Map[String, String]): DataFlow =
    log.step("renameColumns", dataset) {
      put(dataset, get(dataset).withColumnsRenamed(renames))
    }(r => Some(r.get(dataset)))

  /** Add or overwrite columns (reference addColumns/setColumns,
    * dfl_changeSchema.py:66-87). Accepts Column expressions — the
    * codegen-friendly rendering of the reference's scalar / series / row-
    * function forms. For true row functions use [[withRowFunction]].
    */
  def addColumns(dataset: String, columns: Map[String, Column]): DataFlow =
    log.step("addColumns", s"$dataset +${columns.keys.mkString(",")}") {
      put(dataset, get(dataset).withColumns(columns))
    }(r => Some(r.get(dataset)))

  /** setColumns is an alias of addColumns in the reference
    * (dfl_changeData.py:105-107).
    */
  def setColumns(dataset: String, columns: Map[String, Column]): DataFlow =
    addColumns(dataset, columns)

  /** Row-function column (reference addColumns with a callable,
    * dfl_changeSchema.py:75-78 — pandas `apply(axis=1)`). Spark rendering:
    * a typed lambda over the whole row struct. Use sparingly — breaks
    * codegen; prefer Column expressions.
    */
  def withRowFunction(
      dataset: String, columnName: String, f: Row => String): DataFlow =
    log.step("withRowFunction", s"$dataset +$columnName") {
      val fn = udf((r: Row) => f(r))
      put(dataset, get(dataset).withColumn(columnName, fn(struct(col("*")))))
    }(r => Some(r.get(dataset)))

  /** Fill nulls per column (reference setNulls, dfl_changeData.py:1-11). */
  def setNulls(dataset: String, fills: Map[String, Any]): DataFlow =
    log.step("setNulls", dataset) {
      put(dataset, get(dataset).na.fill(fills))
    }(r => Some(r.get(dataset)))

  /** Value replacement, optionally regex, on some or all columns
    * (reference replace, dfl_changeData.py:67-102).
    */
  def replace(
      dataset: String,
      toReplace: String,
      value: String,
      regex: Boolean = false,
      columns: Seq[String] = Seq.empty): DataFlow =
    log.step("replace", dataset) {
      val df = get(dataset)
      val targets = if (columns.nonEmpty) columns else df.columns.toSeq
      val out =
        if (regex)
          df.withColumns(targets.map(c =>
            c -> regexp_replace(col(c), toReplace, value)).toMap)
        else
          df.na.replace(targets, Map(toReplace -> value))
      put(dataset, out)
    }(r => Some(r.get(dataset)))

  /** Strip non-numeric chars and cast to long, null→0 (reference toNumeric,
    * dfl_changeData.py:14-64 — regex strip then `fillna(0).astype(int)`).
    * floor() before the integral cast keeps Spark/ANSI-SQL truncation
    * semantics aligned across engines.
    */
  def toNumeric(
      dataset: String,
      columns: Seq[String],
      targetColumns: Seq[String] = Seq.empty): DataFlow =
    log.step("toNumeric", s"$dataset ${columns.mkString(",")}") {
      val targets =
        if (targetColumns.nonEmpty) targetColumns else columns
      val df = columns.zip(targets).foldLeft(get(dataset)) {
        case (d, (src, tgt)) =>
          // try_cast: a fully-stripped value ('' or garbage like '1.2.3')
          // coerces to NULL→0 instead of erroring under ANSI mode,
          // matching the reference's errors='coerce' + fillna(0).
          d.withColumn(tgt, expr(
            s"coalesce(cast(floor(try_cast(regexp_replace(`$src`, " +
              s"'[^0-9.]+', '') as double)) as bigint), 0L)"))
      }
      put(dataset, df)
    }(r => Some(r.get(dataset)))

  // -------------------------------------------------------------------
  // §2.3 joins, §2.5 set ops / reshape
  // -------------------------------------------------------------------

  /** Two-way equi-join (reference join, dfl_merge.py:5-54). `how` follows
    * pandas naming {inner,left,right,outer}; `cartesianJoin` maps to a true
    * cross join (the reference fakes it with a constant key + outer join).
    * Catalyst picks broadcast-hash vs sort-merge; pass `broadcastRight` to
    * force a broadcast of a known-small build side.
    */
  def join(
      datasets: (String, String),
      targetDataset: String,
      joinCols: Seq[String] = Seq.empty,
      how: String = "inner",
      keepCols: Seq[String] = Seq.empty,
      cartesianJoin: Boolean = false,
      broadcastRight: Boolean = false,
      saltFactor: Int = 0): DataFlow =
    log.step("join", s"${datasets._1} ⋈ ${datasets._2} ($how)") {
      val l = get(datasets._1)
      val r0 = get(datasets._2)
      val r = if (broadcastRight) broadcast(r0) else r0
      val sparkHow = how match {
        case "outer" => "full_outer"
        case h       => h
      }
      val joined =
        if (cartesianJoin) l.crossJoin(r)
        // skewed probe keys: salt instead of broadcast — ADAPTIVE: the
        // salt only applies when a sampled key histogram shows real
        // skew, so a saltFactor on uniform keys costs ~the plain join
        // (see SkewJoin.adaptiveSaltedJoin)
        else if (saltFactor > 1)
          graft.operators.SkewJoin.adaptiveSaltedJoin(l, r, joinCols,
            sparkHow, saltFactor)
        else l.join(r, joinCols, sparkHow)
      val projected =
        if (keepCols.nonEmpty) joined.select(keepCols.map(col): _*)
        else joined
      put(targetDataset, projected)
    }(r => Some(r.get(targetDataset)))

  /** Column-aligned union of N datasets (reference union,
    * dfl_merge.py:57-83 — raises with sorted column lists on mismatch).
    */
  def union(datasets: Seq[String], targetDataset: String): DataFlow =
    log.step("union", datasets.mkString(" ∪ ")) {
      val dfs = datasets.map(get)
      val colSets = dfs.map(_.columns.toSet)
      if (colSets.distinct.size > 1)
        throw new IllegalArgumentException(
          "union: column mismatch across datasets: " +
            colSets.map(_.toSeq.sorted.mkString("[", ",", "]")).mkString(" vs "))
      put(targetDataset, dfs.reduce(_.unionByName(_)))
    }(r => Some(r.get(targetDataset)))

  /** Wide→long unpivot (reference pivotColsToRows,
    * dfl_changeSchema.py:90-127 — pandas melt; audit cols ride along as
    * id vars). Spark's native `unpivot` — no shuffle, row-local.
    */
  def pivotColsToRows(
      dataset: String,
      colsNotToPivot: Seq[String],
      colsToPivot: Seq[String],
      varName: String,
      valName: String): DataFlow =
    log.step("pivotColsToRows", dataset) {
      val df = get(dataset)
      val ids = colsNotToPivot ++
        df.columns.filter(Audit.all.contains).filterNot(colsNotToPivot.contains)
      put(dataset, df.unpivot(
        ids.map(col).toArray, colsToPivot.map(col).toArray, varName, valName))
    }(r => Some(r.get(dataset)))

  /** Long→wide pivot — the inverse of [[pivotColsToRows]] (extension: the
    * reference only melts, never pivots back). `pivotValues` is EXPLICIT:
    * with it, Spark skips the eager distinct-scan of `pivotCol` that the
    * values-less overload runs — at 100 TB that pre-pass costs as much as
    * the pivot itself — and the output schema is static for downstream
    * plans. Rows whose `pivotCol` is outside `pivotValues` are dropped,
    * matching SQL conditional aggregation.
    */
  def pivotRowsToCols(
      dataset: String,
      groupCols: Seq[String],
      pivotCol: String,
      pivotValues: Seq[String],
      agg: Column,
      prefix: String = ""): DataFlow =
    log.step("pivotRowsToCols", dataset) {
      val wide = get(dataset)
        .groupBy(groupCols.map(col): _*)
        .pivot(pivotCol, pivotValues)
        .agg(agg)
      val renamed =
        if (prefix.isEmpty) wide
        else pivotValues.foldLeft(wide)((d, v) =>
          d.withColumnRenamed(v, s"$prefix$v"))
      put(dataset, renamed)
    }(r => Some(r.get(dataset)))

  // -------------------------------------------------------------------
  // §2.7 audit / load prep
  // -------------------------------------------------------------------

  /** Stamp the four audit columns (reference setAuditCols,
    * dfl_audit.py:4-16; BULK path).
    */
  def setAuditCols(
      dataset: String, bulkOrDelta: String, sourceSystemId: String): DataFlow =
    log.step("setAuditCols", dataset) {
      val df = get(dataset)
        .withColumn(Audit.SourceSystem, lit(sourceSystemId))
        .withColumn(Audit.BulkLoadDate, current_timestamp())
        .withColumn(Audit.LatestDeltaLoadDate,
          lit(null).cast("timestamp"))
        .withColumn(Audit.LatestLoadOperation, lit(bulkOrDelta))
      put(dataset, df)
    }(r => Some(r.get(dataset)))

  /** Collapse the audit columns into the audit-dimension natural key and
    * drop them (reference collapseAuditNKs, betl/dataflow/dfl_audit.py:
    * 19-37): `nk_audit = <latest_load_operation>_10` — the reference
    * hard-codes DQ score 10 pending real data-quality scoring. Facts carry
    * this NK into LOD, where bulkLoadFact resolves it against the
    * `sk_audit` map emitted by [[graft.warehouse.DmAudit.load]].
    */
  def collapseAuditNK(dataset: String): DataFlow =
    log.step("collapseAuditNK", dataset) {
      val df = get(dataset)
        .withColumn("nk_audit",
          concat(col(Audit.LatestLoadOperation), lit("_10")))
        .drop(Audit.all: _*)
      put(dataset, df)
    }(r => Some(r.get(dataset)))

  /** Collapse several NK columns into one `_`-separated string NK and drop
    * the sources (reference collapseNaturalKeys inside prepForLoad,
    * dfl_loadPrep.py:28-69). `concat_ws` is null-safe like the reference's
    * string join over stringified values.
    */
  def collapseNaturalKeys(
      dataset: String, nkColumns: Seq[String], targetColumn: String = "nk")
      : DataFlow =
    log.step("collapseNaturalKeys", s"$dataset ${nkColumns.mkString("+")}") {
      val df = get(dataset)
        .withColumn(targetColumn, concat_ws("_", nkColumns.map(col): _*))
        .drop(nkColumns: _*)
      put(dataset, df)
    }(r => Some(r.get(dataset)))

  /** Optional NK collapse then write to the LOD layer (reference
    * prepForLoad, dfl_loadPrep.py:3-25).
    */
  def prepForLoad(
      dataset: String,
      targetTableName: String,
      nkColumns: Seq[String] = Seq.empty): DataFlow = {
    if (nkColumns.nonEmpty) collapseNaturalKeys(dataset, nkColumns)
    write(dataset, targetTableName, Layer.LOD)
  }

  // -------------------------------------------------------------------
  // §2.8 custom code
  // -------------------------------------------------------------------

  /** Run arbitrary SQL with every named dataset visible as a temp view
    * (reference customSQL, dfl_customCode.py:4-25 — which shells out to
    * Postgres; Catalyst-compiled `spark.sql` here is strictly stronger).
    */
  def customSQL(sql: String, targetDataset: Option[String] = None): DataFlow =
    log.step("customSQL", sql.take(60)) {
      data.foreach { case (name, df) => df.createOrReplaceTempView(name) }
      val out = spark.sql(sql)
      targetDataset.foreach(put(_, out))
      this
    }(_ => targetDataset.map(get))

  /** Vectorised column transform col = f(col) (reference
    * applyFunctionToColumns, dfl_customCode.py:28-58). `Column => Column`
    * keeps the transform inside Catalyst codegen — the Spark analogue of a
    * pandas Series function.
    */
  def applyFunctionToColumns(
      dataset: String,
      columns: Seq[String],
      f: Column => Column,
      targetColumns: Seq[String] = Seq.empty): DataFlow =
    log.step("applyFunctionToColumns", s"$dataset ${columns.mkString(",")}") {
      val targets = if (targetColumns.nonEmpty) targetColumns else columns
      put(dataset, get(dataset).withColumns(
        columns.zip(targets).map { case (c, t) => t -> f(col(c)) }.toMap))
    }(r => Some(r.get(dataset)))

  /** Side-effecting per-row iteration (reference applyFunctionToRows,
    * dfl_customCode.py:61-73 — `itertuples` loop). Distributed `foreach`;
    * the closure runs on executors, not the driver.
    */
  def applyFunctionToRows(dataset: String, f: Row => Unit): DataFlow =
    log.step("applyFunctionToRows", dataset) {
      get(dataset).foreach(f)
      this
    }(_ => None)

  /** Master-data mapping against a mapping dataset (reference
    * mapMasterData, betl/dataflow/dfl_mdm.py:8-213 — semantics in
    * [[graft.mdm.MasterData]]; the Google-Sheet worksheet becomes a named
    * dataset and the write-back becomes `<dataset>_writeback`).
    */
  def mapMasterData(
      dataset: String,
      mappingDataset: String,
      joinCols: Seq[String],
      masterDataCols: Seq[String],
      autoPopMappingCols: Seq[String] = Seq.empty): DataFlow =
    log.step("mapMasterData", s"$dataset ↔ $mappingDataset") {
      val res = graft.mdm.MasterData.mapMasterData(
        get(dataset), get(mappingDataset),
        joinCols, masterDataCols, autoPopMappingCols)
      put(dataset, res.mapped)
      put(s"${dataset}_writeback", res.writeBack)
      put(s"${dataset}_unmapped", res.unmapped)
    }(r => Some(r.get(dataset)))

  /** Release references (reference close, DataFlowClass.py:105-115 — which
    * frees pandas memory; here plans are lazy so this just clears the map).
    */
  def close(): Unit = {
    // reference parity: a closing dataflow appends its jobLog blocks to
    // the run's numbered NNNN_jobLog.log when LOG_PATH is configured
    conf.logsPath.foreach(d => JobLog.appendToRunLog(d, jobLogText))
    data.clear()
  }
}

object DataFlow {
  def apply(spark: SparkSession, desc: String)(implicit conf: GraftConf)
      : DataFlow = new DataFlow(spark, desc, conf)
}
