package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental IVF index maintenance — the streaming rendering of the
  * batch IVF ANN (coarse quantizer = cluster label): vectors arrive in
  * micro-batches, per-(label, dim) decimal sums + counts fold additively
  * into a tiny sums frame (labels × dim rows), and the postings file
  * accumulates the vectors themselves. Decimal addition is exact and
  * associative, so the folded centroids are BIT-IDENTICAL to the batch
  * computation over the full corpus — the streamed index answers
  * queries exactly like the batch q_ann_ivf, whose oracle the streaming
  * query reuses verbatim.
  *
  * Replay algebra, per the engine's streaming-state contract: the sums
  * frame is additive (not idempotent) → batch-id watermark inside the
  * atomically-swapped frame ([[graft.functions.CountMinSketch]]); the
  * postings append is guarded by a vec_id anti-join (ids are
  * batch-atomic) — so a replayed batch, or a replay after a crash
  * between the two writes, changes nothing.
  *
  * 100 TB stance: the per-batch fold shuffles ≤ labels × dim partial
  * rows (map-side combined); postings appends are batch-sized; the
  * parquet postings swap for a real vector store at scale with the
  * same join shape.
  */
object StreamingIvf {

  private val SumT = DecimalType(38, 15)

  /** Initialise the empty postings frame (sums start on first batch). */
  def initState(s: SparkSession, postingsDir: String): Unit =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)),
        StructField("label", IntegerType))))
      .write.mode("overwrite").parquet(postingsDir)

  /** Fold one micro-batch of (vec_id, embedding, label) vectors. */
  def applyBatch(s: SparkSession, b: DataFrame, batchId: Long,
      sumsDir: String, postingsDir: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(sumsDir)
      .getFileSystem(s.sessionState.newHadoopConf())
    val hasSums = fs.exists(new org.apache.hadoop.fs.Path(sumsDir))
    if (hasSums) {
      val applied = s.read.parquet(sumsDir)
        .agg(max(col("last_batch"))).collect()(0).getLong(0)
      if (batchId <= applied) return
    }
    val newVecs = b
      .join(s.read.parquet(postingsDir).select("vec_id"),
        Seq("vec_id"), "left_anti")
      .cache()
    val partial = newVecs
      .select(col("label"), posexplode(col("embedding")).as(Seq("d", "v")))
      .groupBy("label", "d")
      .agg(sum(col("v").cast(SumT)).as("sv"), count(lit(1)).as("cnt"))
    val merged =
      if (!hasSums) partial
      else s.read.parquet(sumsDir).drop("last_batch")
        .unionByName(partial)
        .groupBy("label", "d")
        .agg(sum(col("sv")).as("sv"), sum(col("cnt")).as("cnt"))
    graft.io.ParquetUtil.safeOverwrite(s,
      merged.withColumn("last_batch", lit(batchId)), sumsDir)
    // crash between the sums swap and this append replays into the
    // watermark (sums untouched) and the anti-join (postings skip)
    newVecs.select("vec_id", "embedding", "label")
      .write.mode("append").parquet(postingsDir)
    newVecs.unpersist()
    ()
  }

  /** (label, d, c) centroid frame from the folded sums — the same
    * cast-then-divide the batch computation performs, on bit-identical
    * decimal totals.
    */
  def centroidFrame(s: SparkSession, sumsDir: String): DataFrame =
    s.read.parquet(sumsDir)
      .select(col("label"), col("d"),
        (col("sv").cast("double") / col("cnt")).as("c"))
}
