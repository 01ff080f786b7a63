package graft.functions

import graft.text.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic count-min sketch: fixed Depth×Width counter grid for
  * approximate term frequencies, mergeable across partitions/corpora by
  * cell-wise addition. Overestimates only (collisions add), never
  * undercounts.
  *
  * Like [[HllSketch]] and [[BloomFilter]], the hash family is the
  * md5-derived 60-bit [[TextFunctions.tokenHash60]] split
  * Kirsch–Mitzenmacher style (cell_j = (h1 + j·h2) mod Width, h2 forced
  * odd), so the DuckDB oracle replays the exact grid — the sketch is
  * bit-identical in any engine.
  *
  * Scale shape: building is ONE map-side-combined aggregation — each
  * partition pre-reduces to at most Depth·Width = 4096 cells before the
  * shuffle, regardless of corpus size. Point queries join the probe
  * terms' cells against the 4096-row grid (broadcast-sized by
  * construction).
  */
object CountMinSketch {

  val Depth = 4
  val Width = 1024
  val Salt = "cms:"
  private val H1Mod: Long = 1L << 30

  /** The Depth cell ids of a term (array column, index = row j).
    * Integer-only arithmetic: `h` is a 60-bit long, beyond exact double
    * range, so the split uses mask/shift (== `% 2^30` and `// 2^30` for
    * the non-negative hash), never Column `/` (double division).
    */
  def cells(term: Column): Column = {
    val h = TextFunctions.tokenHash60(concat(lit(Salt), term))
    val h1 = h.bitwiseAND(lit(H1Mod - 1))
    val h2 = shiftright(h, 30) * 2 + 1
    array((0 until Depth).map(j =>
      ((h1 + lit(j.toLong) * h2) % Width).cast("long")): _*)
  }

  /** Build the sketch from a term column: (j, cell, cnt) rows. */
  def sketch(terms: DataFrame, termCol: String): DataFrame =
    terms.select(posexplode(cells(col(termCol))).as(Seq("j", "cell")))
      .groupBy("j", "cell")
      .agg(count(lit(1)).as("cnt"))

  /** Fold one micro-batch's terms into a persisted sketch — the
    * streaming rendering. Counter ADDITION merges the sketch exactly
    * (cell-wise sum over any partitioning equals the batch sketch),
    * but addition is not idempotent — the opposite algebra from
    * [[HllSketch.mergeRegisters]]'s max — so replay protection under
    * at-least-once delivery is the batch-id watermark, carried as a
    * column inside the single atomically-swapped state frame (same
    * pattern as `MiniBatchKMeans.applyBatch`; replay no-op pinned by
    * AnalyticsSpec). State never exceeds Depth×Width = 4096 rows.
    */
  def applyBatch(
      s: org.apache.spark.sql.SparkSession, terms: DataFrame,
      termCol: String, batchId: Long, stateDir: String): Unit = {
    val applied = graft.io.ParquetUtil.lastBatch(s, stateDir)
    if (applied.exists(batchId <= _)) return
    val hasState = applied.isDefined
    val partial = sketch(terms, termCol)
    val merged =
      if (!hasState) partial
      else graft.io.ParquetUtil.readRecovered(s, stateDir).drop("last_batch")
        .unionByName(partial)
        .groupBy("j", "cell").agg(sum(col("cnt")).as("cnt"))
    graft.io.ParquetUtil.safeOverwrite(s,
      merged.withColumn("last_batch", lit(batchId)), stateDir)
  }

  /** Point-estimate the frequency of each probe term: min over the
    * Depth probed cells (absent cell = 0).
    */
  def estimate(sk: DataFrame, probes: DataFrame, termCol: String)
      : DataFrame =
    probes
      .select(col(termCol), posexplode(cells(col(termCol)))
        .as(Seq("j", "cell")))
      .join(sk, Seq("j", "cell"), "left")
      .groupBy(termCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
}
