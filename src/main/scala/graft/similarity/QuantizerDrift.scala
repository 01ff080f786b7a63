package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Frozen-quantizer DRIFT MONITOR — the operational companion to the
  * frozen deployments ([[StreamingIvf.applyFrozenBatch]],
  * [[StreamingPq]], [[StreamingIvfPq]], the frozen hybrid): a quantizer
  * trained once on a bootstrap amortizes its n·√n training cost, but as
  * the data distribution shifts away from the bootstrap its recall
  * decays silently (measured: `RECALL_SCALE_SF10_r14.json` —
  * bootstrap-frozen 0.696 vs whole-corpus-trained 0.96 at the same scan
  * fraction). This module computes the two signals a deployment
  * monitors to decide WHEN to retrain:
  *
  *  - `mean_dist_fp`: the mean EXACT fixed-point quantization error
  *    (squared distance to the assigned frozen centroid — the k-means
  *    objective itself, [[KMeans]]' integer geometry, so the value is
  *    bit-replayable by any engine). Rising mean error = arriving data
  *    the codebook does not cover.
  *  - `max_cluster_frac`: the largest cluster's share of the slice's
  *    assignments. A drifting distribution funnels new vectors into few
  *    catch-all cells (degrading the probe's selectivity) long before
  *    the mean error alone alarms.
  *
  * `drift_ratio` normalizes the mean error by the BOOTSTRAP slice's own
  * mean — the self-baseline, so a threshold (e.g. retrain at 1.5×) is
  * dimensionless and transfers across embedding spaces.
  *
  * Scale shape: one linear assignment pass (the broadcast-centroid
  * integer argmin kernel) + two combine-reduced aggregations keyed by
  * (slice) and (slice, cid) — output is slice-count-sized; nothing
  * corpus-sized shuffles. The streamed fold appends ONE stats row per
  * micro-batch (state is batch-count-sized — the smallest state of any
  * fold in the repo) under the batch-id watermark.
  */
object QuantizerDrift {

  /** Per-slice drift statistics of `emb` (vec_id, embedding) against
    * FROZEN fixed-point centroids, slices given by an integer slice
    * column expression already attached as `slice`. Returns one row per
    * slice: (slice, n_vecs, sum_dist_fp, max_nc).
    */
  def sliceStats(emb: DataFrame, centFp: DataFrame,
      slice: org.apache.spark.sql.Column): DataFrame = {
    val pts = KMeans.pointsFp(emb, "vec_id", "embedding")
    val asg = KMeans.assign(pts, centFp)
    val withDist = asg.join(pts, "vec_id")
      .join(broadcast(centFp), "cid")
      .select(col("vec_id"), col("cid"),
        aggregate(
          zip_with(col("p"), col("c"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("dist_fp"))
      .join(emb.select(col("vec_id"), slice.as("slice")), "vec_id")
    val perCid = withDist.groupBy("slice", "cid")
      .agg(count(lit(1)).as("nc"))
    withDist.groupBy("slice")
      .agg(count(lit(1)).as("n_vecs"), sum(col("dist_fp")).as("sum_dist_fp"))
      .join(perCid.groupBy("slice").agg(max(col("nc")).as("max_nc")),
        "slice")
  }

  /** Attach the derived ratio columns to a (slice, n_vecs, sum_dist_fp,
    * max_nc) stats frame: mean error, imbalance, and the
    * baseline-normalized drift ratio (baseline = slice 0, the
    * bootstrap). Every division's operands are exact-integer doubles,
    * so the quotients are engine-identical.
    *
    * A MISSING baseline (slice 0 produced no stats row — e.g. an empty
    * bootstrap batch appended nothing) must stay visible: the join is
    * a broadcast LEFT attach, so every slice still reports its own
    * mean/imbalance with a null `drift_ratio`, instead of the old
    * cross join silently returning an empty report.
    */
  def withRatios(stats: DataFrame): DataFrame = {
    val mean = col("sum_dist_fp").cast("double") /
      col("n_vecs").cast("double")
    val base = stats.where(col("slice") === 0)
      .select((col("sum_dist_fp").cast("double") /
        col("n_vecs").cast("double")).as("__base_mean"))
    stats.join(broadcast(base), lit(true), "left")
      .select(col("slice"), col("n_vecs"), col("sum_dist_fp"),
        round(mean, 6).as("mean_dist_fp"),
        round(col("max_nc").cast("double") /
          col("n_vecs").cast("double"), 6).as("max_cluster_frac"),
        round(mean / col("__base_mean"), 6).as("drift_ratio"))
  }

  // ------------------------------------------------------------------
  // nearline: one appended stats row per micro-batch
  // ------------------------------------------------------------------

  /** Fold one micro-batch: compute the batch's (n_vecs, sum_dist_fp,
    * max_nc) against the frozen centroids and APPEND it keyed by the
    * batch id (state = one row per batch — bounded by stream length,
    * not corpus size). Batch-id watermark + exact-retry append (the
    * [[graft.text.NgramDiversity.applyBatch]] window analysis:
    * recovery ordered before the watermark read). Empty batches append
    * nothing (no zero-division row, and the watermark not advancing on
    * them is harmless — replaying an empty batch re-appends nothing).
    */
  def applyBatch(s: SparkSession, b: DataFrame, centFp: DataFrame,
      batchId: Long, stateDir: String): Unit = {
    graft.io.ParquetUtil.recoverAppend(s, stateDir)
    val applied = graft.io.ParquetUtil.lastBatch(s, stateDir)
    if (applied.exists(batchId <= _)) return
    val stats = sliceStats(b, centFp, lit(batchId))
      .withColumnRenamed("slice", "batch")
    if (stats.isEmpty) return
    graft.io.ParquetUtil.safeAppend(s,
      stats.withColumn("last_batch", lit(batchId)), stateDir)
  }

  /** The drift report off the folded state — equals the batch
    * [[sliceStats]]+[[withRatios]] under the stream's slicing exactly
    * (batches never split a slice, so no cross-batch merge exists).
    */
  def driftFromState(s: SparkSession, stateDir: String): DataFrame =
    withRatios(graft.io.ParquetUtil.readRecovered(s, stateDir)
      .drop("last_batch").withColumnRenamed("batch", "slice"))
}
