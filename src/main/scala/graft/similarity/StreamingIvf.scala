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
  * batch-atomic). Write ORDER is load-bearing: postings append FIRST
  * (idempotent under the anti-join), then the watermark-carrying sums
  * swap LAST — so a crash between the two writes replays into a
  * skipped append plus a normal sums fold, never a batch that is
  * counted in the centroids but absent from the scan set. The sums
  * partial is computed from the RAW batch gated only by the watermark
  * (not from the anti-joined frame), otherwise the same crash window
  * would drop the batch from the sums instead.
  *
  * 100 TB stance: the per-batch fold shuffles ≤ labels × dim partial
  * rows (map-side combined); postings appends are batch-sized; the
  * parquet postings swap for a real vector store at scale with the
  * same join shape.
  */
object StreamingIvf {

  private val SumT = DecimalType(38, 15)

  /** The postings' Bloom-guard state dir. */
  def bloomDir(postingsDir: String): String = postingsDir + "_bloom"

  /** Initialise the empty postings frame (sums start on first batch)
    * and the vec-id Bloom guard.
    */
  def initState(s: SparkSession, postingsDir: String): Unit = {
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)),
        StructField("label", IntegerType))))
      .write.mode("overwrite").parquet(postingsDir)
    graft.streaming.BloomGuard.init(s, bloomDir(postingsDir))
  }

  /** Fold one micro-batch of (vec_id, embedding, label) vectors. */
  def applyBatch(s: SparkSession, b: DataFrame, batchId: Long,
      sumsDir: String, postingsDir: String): Unit = {
    import graft.streaming.{BloomGuard, StateScanMeter}
    val applied = graft.io.ParquetUtil.lastBatch(s, sumsDir)
    if (applied.exists(batchId <= _)) return
    val batch = b.select("vec_id", "embedding", "label").cache()
    try {
      val batchCnt = batch.count()
      // 1. postings FIRST — idempotent under the vec_id anti-join, so a
      //    crash after this write replays into a skipped append. The
      //    vec-id bloom (written before the append it covers) proves
      //    fresh batches new row-locally, so the steady state never
      //    reads the postings; bloom hits take the exact probe below.
      val fresh =
        if (!BloomGuard.needExact(s, bloomDir(postingsDir), batch,
            "vec_id")) batch
        else {
          StateScanMeter.add(s, postingsDir)
          batch.join(s.read.parquet(postingsDir).select("vec_id"),
            Seq("vec_id"), "left_anti").localCheckpoint()
        }
      val freshCnt = fresh.count()
      // Enforce the batch-atomicity invariant the sums fold rests on:
      // either every vec_id is new (normal batch) or none is (a whole-
      // batch replay of the crash window between the two writes). A
      // PARTIAL re-delivery would be excluded from postings by the
      // anti-join but double-counted into the centroid sums below —
      // fail loudly instead of diverging silently.
      if (freshCnt != 0L && freshCnt != batchCnt)
        throw new IllegalStateException(
          s"StreamingIvf batch $batchId re-delivers ${batchCnt - freshCnt} " +
            s"of $batchCnt vec_ids already in the postings: batches must " +
            "be atomic (all-new or an exact replay)")
      BloomGuard.addKeys(s, bloomDir(postingsDir),
        fresh.select("vec_id"), "vec_id")
      fresh.write.mode("append").parquet(postingsDir)
      // 2. sums partial from the RAW batch (watermark-gated above, NOT
      //    anti-joined — after the crash the batch is already in postings
      //    and an anti-joined partial would drop it from the sums)
      val partial = batch
        .select(col("label"), posexplode(col("embedding")).as(Seq("d", "v")))
        .groupBy("label", "d")
        .agg(sum(col("v").cast(SumT)).as("sv"), count(lit(1)).as("cnt"))
      val hasSums = applied.isDefined
      val merged =
        if (!hasSums) partial
        else graft.io.ParquetUtil.readRecovered(s, sumsDir).drop("last_batch")
          .unionByName(partial)
          .groupBy("label", "d")
          .agg(sum(col("sv")).as("sv"), sum(col("cnt")).as("cnt"))
      // 3. the watermark-carrying swap LAST — the acknowledge
      graft.io.ParquetUtil.safeOverwrite(s,
        merged.withColumn("last_batch", lit(batchId)), sumsDir)
      ()
    } finally batch.unpersist()
  }

  /** (label, d, c) centroid frame from the folded sums — the same
    * cast-then-divide the batch computation performs, on bit-identical
    * decimal totals.
    */
  def centroidFrame(s: SparkSession, sumsDir: String): DataFrame =
    s.read.parquet(sumsDir)
      .select(col("label"), col("d"),
        (col("sv").cast("double") / col("cnt")).as("c"))

  /** Fold one micro-batch into a FROZEN-quantizer IVF index — the
    * streamed rendering of the trained batch default: the coarse
    * quantizer is a k-means model trained ONCE (on the bootstrap
    * batch), and each arriving vector is assigned to its nearest
    * frozen centroid by the bit-exact integer argmin
    * ([[KMeans.assign]]) before joining the postings.
    *
    * Replay algebra is SIMPLER than the additive-sums variant: the
    * quantizer never changes, so the postings append is the ONLY
    * state write — idempotent under the vec_id anti-join. No
    * watermark, no ordering window: a replayed batch (whole or
    * partial) drops out entirely. At 100 TB the centroid table is
    * k×dim and rides in the task closure; per-batch work is
    * |batch| scan + the k-way argmin, nothing corpus-sized.
    *
    * `centFp` is the trained (cid, c: array&lt;long&gt; fixed-point)
    * centroid frame from [[KMeans.fitModel]].
    */
  def applyFrozenBatch(s: SparkSession, b: DataFrame,
      centFp: DataFrame, postingsDir: String): Unit = {
    import graft.streaming.{BloomGuard, StateScanMeter}
    val batch = b.select("vec_id", "embedding")
    val fresh =
      if (!BloomGuard.needExact(s, bloomDir(postingsDir), batch,
          "vec_id")) batch
      else {
        // exact replay guard, materialised before the append below
        // writes into the dir the probe reads
        StateScanMeter.add(s, postingsDir)
        batch.join(s.read.parquet(postingsDir).select("vec_id"),
          Seq("vec_id"), "left_anti").localCheckpoint()
      }
    val asg = KMeans.assign(
      KMeans.pointsFp(fresh, "vec_id", "embedding"), centFp)
    BloomGuard.addKeys(s, bloomDir(postingsDir),
      fresh.select("vec_id"), "vec_id")
    fresh.join(asg, "vec_id")
      .select(col("vec_id"), col("embedding"),
        col("cid").cast("int").as("label"))
      .write.mode("append").parquet(postingsDir)
  }
}
