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
    *
    * The swap is CRASH-RECOVERABLE (the scheduler-retry contract: Airflow
    * re-runs a failed task's op, betl/PipelineClass.py:456-514, and the
    * retry must see the pre-crash table): the old table is renamed aside
    * to `__old` rather than deleted, so every kill window leaves a state
    * [[recoverInterrupted]] can roll back or complete —
    *
    *  - during the staging write: target untouched; the retry's staging
    *    write overwrites the partial dir.
    *  - after target→`__old`, before staging→target: target missing but
    *    `__old` intact; recovery renames it back.
    *  - after staging→target, before `__old` cleanup: swap complete;
    *    recovery deletes the leftover.
    */
  def safeOverwrite(spark: SparkSession, df: DataFrame, path: String,
      partitionBy: Seq[String] = Seq.empty,
      failpoints: Boolean = true): Unit = {
    val target = new Path(path)
    val staging = new Path(path + "__staging")
    val old = new Path(path + "__old")
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    recoverInterrupted(spark, path)
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(staging.toString)
    if (failpoints) maybeCrash("after-staging")
    if (fs.exists(target) && !fs.rename(target, old))
      throw new java.io.IOException(
        s"safeOverwrite: rename $target -> $old failed")
    if (failpoints) maybeCrash("mid-swap")
    if (!fs.rename(staging, target))
      throw new java.io.IOException(
        s"safeOverwrite: rename $staging -> $target failed")
    if (failpoints) maybeCrash("after-swap")
    if (fs.exists(old)) fs.delete(old, true)
  }

  /** Complete or roll back an interrupted [[safeOverwrite]] swap. Called
    * at swap entry and by the layer read paths, so a scheduler retry (or
    * any later reader) sees the pre-crash table instead of a missing
    * path. No-op when no `__old` sibling exists.
    */
  def recoverInterrupted(spark: SparkSession, path: String): Unit = {
    val target = new Path(path)
    val old = new Path(path + "__old")
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(old)) {
      if (fs.exists(target)) fs.delete(old, true) // swap completed
      else if (!fs.rename(old, target)) // swap interrupted: roll back
        throw new java.io.IOException(
          s"recoverInterrupted: rename $old -> $target failed")
    }
  }

  /** Read a layer table with crash recovery: the warehouse read surface
    * for ops that may retry after a mid-swap kill.
    */
  def readRecovered(spark: SparkSession, path: String): DataFrame = {
    recoverInterrupted(spark, path)
    spark.read.parquet(path)
  }

  /** Append a batch to a Parquet table with EXACT scheduler-retry
    * semantics. A plain `mode("append")` is not retry-safe: when the
    * append job commits but the scheduler still retries the op (crash
    * after commit, before the task is acknowledged), the batch lands
    * twice. This wraps the append in a pending-marker protocol whose
    * overhead is metadata-only (one file listing + one marker write —
    * the data files are never rewritten, so a 100 TB fact table costs
    * the same as plain append):
    *
    *  1. recovery: a leftover `__pending` marker means a previous
    *     attempt died mid-protocol — delete every data file not in the
    *     marker's pre-append listing (exact rollback of a possibly
    *     committed batch), then drop the marker;
    *  2. record the table's current relative file listing into
    *     `__pending` (sibling path — invisible to table readers);
    *  3. run the append;
    *  4. delete the marker (acknowledge).
    *
    * Every kill window now replays to the never-failed state: before 2
    * nothing changed; between 2 and 4 the retry's rollback removes
    * whatever the interrupted attempt committed (including nothing);
    * after 4 the protocol is complete.
    */
  def safeAppend(spark: SparkSession, df: DataFrame, path: String,
      partitionBy: Seq[String] = Seq.empty): Unit = {
    val target = new Path(path)
    val pending = new Path(path + "__pending")
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    recoverAppend(spark, path)
    val before = listDataFiles(fs, target)
    val out = fs.create(pending, true)
    out.write(before.mkString("\n").getBytes("UTF-8"))
    out.close()
    maybeCrash("pending-recorded")
    val w = df.write.mode("append")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
    maybeCrash("after-append")
    fs.delete(pending, false)
  }

  /** Roll back an interrupted [[safeAppend]]: remove every data file the
    * crashed attempt may have committed (anything not in the pending
    * marker's pre-append listing). No-op without a marker.
    */
  def recoverAppend(spark: SparkSession, path: String): Unit = {
    val target = new Path(path)
    val pending = new Path(path + "__pending")
    val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(pending)) {
      val in = fs.open(pending)
      val keep = scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty).toSet
      in.close()
      if (fs.exists(target))
        listDataFiles(fs, target).filterNot(keep)
          .foreach(rel => fs.delete(new Path(target, rel), false))
      fs.delete(pending, false)
    }
  }

  /** Null-safe replay-watermark read for streamed state frames: the max
    * `last_batch` carried inside the frame, or None when the frame is
    * absent OR empty. An empty first micro-batch can legally leave a
    * zero-row state frame, where `max()` is SQL-null — reading it as a
    * bare long would NPE and wedge every subsequent batch.
    *
    * Sub-O(state) read path: the watermark must live INSIDE the data
    * (the stamp is atomic with the delta it acknowledges — a sidecar
    * watermark file would open a crash window where data and stamp
    * disagree), but reading it does NOT need a row scan. `last_batch`
    * is a constant per written file, so every parquet FOOTER carries it
    * as the column's min/max statistic: the fast path maxes the footer
    * stats across the pile's files — metadata-only I/O, O(#files) not
    * O(rows), and the delta pile's file count is bounded by the
    * compaction cadence. Any file whose footer lacks usable stats falls
    * the whole read back to the exact scan (same result, old cost).
    */
  def lastBatch(spark: SparkSession, path: String): Option[Long] = {
    // A safeOverwrite can die mid-swap (state renamed to __old, staging
    // not yet promoted). Without recovery the watermark read would see
    // "no state" and the fold would rebuild from the current batch only,
    // silently dropping all accumulated state. Roll the swap back first.
    recoverInterrupted(spark, path)
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) { lastWatermarkSource = "none"; return None }
    footerMax(spark, p, fs) match {
      case Some(opt) => lastWatermarkSource = "footer"; opt
      case None =>
        lastWatermarkSource = "scan"
        val row = spark.read.parquet(path)
          .agg(org.apache.spark.sql.functions.max(
            org.apache.spark.sql.functions.col("last_batch"))).collect()(0)
        if (row.isNullAt(0)) None else Some(row.getLong(0))
    }
  }

  /** Which path the most recent [[lastBatch]] took ("footer" | "scan" |
    * "none") — spec observability only.
    */
  @volatile private[graft] var lastWatermarkSource: String = ""

  /** Max `last_batch` across the dir's parquet footers. Outer None =
    * stats unusable somewhere, take the exact-scan fallback; Some(None)
    * = all files read and zero rows carried the column (empty state).
    */
  private def footerMax(spark: SparkSession, target: Path,
      fs: org.apache.hadoop.fs.FileSystem): Option[Option[Long]] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    var acc: Option[Long] = None
    try {
      listDataFiles(fs, target).foreach { rel =>
        val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new Path(target, rel), conf))
        try {
          rd.getFooter.getBlocks.asScala.foreach { block =>
            block.getColumns.asScala
              .filter(_.getPath.toDotString == "last_batch")
              .foreach { cc =>
                val st = cc.getStatistics
                if (st == null || st.isEmpty) return None // no stats: scan
                if (st.hasNonNullValue) {
                  val mx = st.genericGetMax match {
                    case l: java.lang.Long => l.longValue()
                    case i: java.lang.Integer => i.longValue()
                    case _ => return None // unexpected type: scan
                  }
                  acc = Some(acc.fold(mx)(math.max(_, mx)))
                }
              }
          }
        } finally rd.close()
      }
      Some(acc)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** True for the swap/append protocol's sibling dirs (`__staging`,
    * `__old`, `__pending`) — warehouse enumerations must never list
    * these as tables (a crash can leave them behind until recovery).
    */
  def isProtocolSibling(name: String): Boolean =
    name.endsWith("__staging") || name.endsWith("__old") ||
      name.endsWith("__pending")

  /** Relative paths of the data files under a table dir (skipping
    * `_`/`.`-prefixed metadata like _SUCCESS and _temporary).
    */
  private def listDataFiles(fs: org.apache.hadoop.fs.FileSystem,
      target: Path): Seq[String] = {
    if (!fs.exists(target)) return Seq.empty
    val base = target.toUri.getPath
    val it = fs.listFiles(target, true)
    val buf = scala.collection.mutable.ArrayBuffer[String]()
    while (it.hasNext) {
      val f = it.next()
      val rel = f.getPath.toUri.getPath.stripPrefix(base).stripPrefix("/")
      val hidden = rel.split('/').exists(
        seg => seg.startsWith("_") || seg.startsWith("."))
      if (!hidden) buf += rel
    }
    buf.toSeq
  }

  /** Failpoint for the rerun-safety specs: names a [[safeOverwrite]] /
    * [[safeAppend]] kill window; the next write through that window
    * throws ONCE (the point auto-clears, so the spec's retry proceeds).
    * Never set in production.
    */
  @volatile private[graft] var crashPoint: Option[String] = None

  private def maybeCrash(point: String): Unit =
    if (crashPoint.contains(point)) {
      crashPoint = None
      throw new RuntimeException(s"injected crash at $point")
    }
}
