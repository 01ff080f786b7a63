package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Structured-Streaming surface over the engine's tables — the natural
  * extension the reference lacks entirely (SURVEY §2.9: no streaming,
  * no watermarks, no state anywhere in betl). The same DataFrame operator
  * set applies to a `readStream` source; this object adds the streaming
  * lifecycle: source wiring, watermarked event-time windows, and
  * run-to-completion draining for bounded backfills.
  */
object StreamFlow {

  /** File-stream source over a parquet table path. The file source wants
    * a DIRECTORY; a path to a single file is handled by streaming its
    * parent with a glob filter on the file name. Schema must be
    * supplied — streaming sources do not infer.
    */
  def readParquetStream(
      spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val reader = spark.readStream.schema(schema)
    if (fs.exists(p) && fs.getFileStatus(p).isFile)
      reader.option("pathGlobFilter", p.getName).parquet(p.getParent.toString)
    else reader.parquet(path)
  }

  /** Materialise a bounded frame as `n` single-file parquet splits in
    * ascending ranges of a (numeric) event-time column, so a file-stream
    * drain with `maxFilesPerTrigger=1` processes them as `n` successive
    * micro-batches — the harness that makes incremental state on bounded
    * data honest (each batch sees only its slice of the timeline).
    * Rows with a null `tsCol` have no place on the timeline and are
    * dropped, as an event-time watermark would drop them anyway.
    */
  /** Write `df` as ONE parquet file named `split-<idx>` under `dir`
    * (zero-padded names keep lexicographic = chronological order for the
    * file source's tie-break on equal modification times).
    */
  private def writeSplitFile(
      df: DataFrame, fs: org.apache.hadoop.fs.FileSystem,
      dir: String, idx: Int): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(dir + s"__tmp$idx")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = fs.listStatus(tmp)
      .map(_.getPath).find(_.getName.startsWith("part-"))
      .getOrElse(throw new IllegalStateException(
        s"writeTimeSplits: no part file under $tmp"))
    fs.rename(part, new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(dir), f"split-$idx%03d.parquet"))
    fs.delete(tmp, true)
  }

  /** Append one more single-file split AFTER a [[writeTimeSplits]] call —
    * the sentinel harness for bounded outer-join drains: a far-future
    * batch advances the watermark past the real timeline, and the batch
    * after it evicts (and thus emits) the expired outer-join state.
    */
  def appendSplit(df: DataFrame, dir: String, idx: Int): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(df.sparkSession.sessionState.newHadoopConf())
    writeSplitFile(df, fs, dir, idx)
  }

  def writeTimeSplits(
      df: DataFrame, tsCol: String, n: Int, dir: String): Unit = {
    val spark = df.sparkSession
    val out = new org.apache.hadoop.fs.Path(dir)
    val fs = out.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(out)) fs.delete(out, true)
    fs.mkdirs(out)
    val bounds = df.agg(min(col(tsCol)), max(col(tsCol))).collect()(0)
    // empty input (or all-null event times): land a single empty split so
    // the drain still runs one batch and initialises its state stores
    if (bounds.isNullAt(0)) {
      writeSplitFile(df.where(lit(false)), fs, dir, 0)
      return
    }
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val step = math.max(1L, (hi - lo) / n + 1)
    (0 until n).foreach { i =>
      val slice = df.where(
        col(tsCol) >= lo + i * step &&
          (if (i == n - 1) lit(true) else col(tsCol) < lo + (i + 1) * step))
      writeSplitFile(slice, fs, dir, i)
    }
  }

  /** Watermarked tumbling-window aggregation: event-time correctness with
    * bounded state — at scale the watermark is what lets Spark evict
    * window state instead of growing it forever.
    */
  def windowedAgg(
      events: DataFrame,
      tsCol: String,
      windowLength: String,
      watermarkDelay: String,
      groupCols: Seq[String],
      aggs: Seq[org.apache.spark.sql.Column]): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLength) +: groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Drain a bounded stream to completion into an in-memory table and
    * return it: Trigger.AvailableNow processes everything currently in
    * the source then stops — the streaming-backfill pattern. Complete
    * output mode (the default) keeps windowed aggregations deterministic
    * (every window emitted, none dropped by the watermark cutoff);
    * stateful flatMapGroupsWithState pipelines use append.
    */
  /** State store provider for every stateful drain: RocksDB. The
    * default HDFS-backed provider keeps each partition's entire state
    * map ON HEAP — at real streaming throughput (stream-stream join
    * state, per-key session state over unbounded key spaces) the heap
    * is the scale limit and GC the failure mode. RocksDB keeps state
    * off-heap with incremental changelog checkpoints; per-batch
    * overhead on bounded drains is noise next to micro-batch setup.
    */
  val StateStoreProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Make [[StateStoreProvider]] the session's provider (idempotent;
    * applied by every drain and by state-store readers). Changelog
    * checkpointing writes per-batch deltas instead of full RocksDB
    * snapshot uploads — the production setting, and it claws back most
    * of the bounded-drain overhead vs the HDFS provider.
    */
  def configureStateStore(spark: SparkSession): Unit = {
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass", StateStoreProvider)
    spark.conf.set("spark.sql.streaming.stateStore.rocksdb." +
      "changelogCheckpointing.enabled", "true")
  }

  def runToMemory(
      agg: DataFrame, spark: SparkSession, name: String,
      outputMode: String = "complete",
      checkpointLocation: Option[String] = None): DataFrame = {
    configureStateStore(spark)
    val writer = agg.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
    val q = checkpointLocation
      .map(writer.option("checkpointLocation", _)).getOrElse(writer)
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
