package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-source n-gram diversity (type/token ratios at n = 1..[[MaxN]]):
  * the corpus-mix diversity profile — low distinct/total ratios flag
  * TEMPLATED sources whose documents repeat the same phrases (the
  * corpus-level complement of the per-document repetition signals).
  *
  * Grams come from the native one-pass `word_ngrams` kernel (the
  * declarative `ngrams(tokens(text), n)` rendering re-tokenizes the
  * document at every lambda position — measured 8.8–23.7× on
  * q_ngram_diversity); counts are ADDITIVE-mergeable, so the same
  * (source, n, gram, c) table folds across micro-batches with the
  * batch-id watermark (the DSIR/CMS algebra) and the streamed rollup
  * equals the batch operator exactly under any batching.
  *
  * Scale: one combine-reduced exchange on (source, n, gram) per scan;
  * the fold state is the distinct-gram table — the quantity the
  * operator MEASURES, so its size is the operator's own output
  * working set (a corpus whose distinct grams exceed storage can't
  * have exact diversity computed by any engine; the HLL sketch family
  * is the approximate path there). The streamed fold never rewrites
  * that growing state per batch: deltas append, the pile compacts
  * every [[CompactEvery]] batches ([[applyBatch]]).
  */
object NgramDiversity {

  val MaxN = 3

  /** (source, n, gram, c) gram counts — one kernel pass per n over the
    * doc frame, one combine-reduced aggregation.
    */
  def gramCounts(docs: DataFrame): DataFrame =
    (1 to MaxN).map { n =>
      docs.select(col("source"), lit(n).as("n"),
        explode(graft.functions.GraftFunctions
          .wordNgrams(docs.sparkSession, col("text"), n)).as("gram"))
    }.reduce(_ unionByName _)
      .groupBy("source", "n", "gram").agg(count(lit(1)).as("c"))

  /** Output-sized rollup: (source, n, total_ngrams, distinct_ngrams,
    * diversity) — the ratio divides two exact BIGINTs.
    */
  def rollup(counts: DataFrame): DataFrame =
    counts.groupBy("source", "n")
      .agg(sum(col("c")).as("total_ngrams"),
        count(lit(1)).as("distinct_ngrams"))
      .select(col("source"), col("n"), col("total_ngrams"),
        col("distinct_ngrams"),
        (col("distinct_ngrams").cast("double") /
          col("total_ngrams").cast("double")).as("diversity"))

  /** Compact the delta-append state every this many micro-batches. The
    * per-batch write is a BATCH-sized delta append (the state — the one
    * streamed fold whose size grows with the corpus — is never rewritten
    * per batch); compaction re-aggregates the whole pile once every
    * [[CompactEvery]] batches, so the amortized merge cost is
    * state/[[CompactEvery]] per batch and the pile stays ≤
    * [[CompactEvery]] batch deltas deep for the read-time merge.
    */
  val CompactEvery = 8

  /** The additive merge of the delta pile: exact (source, n, gram, c)
    * totals regardless of how many un-compacted deltas the state holds.
    */
  def mergedCounts(s: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame =
    graft.io.ParquetUtil.readRecovered(s, stateDir).drop("last_batch")
      .groupBy("source", "n", "gram").agg(sum(col("c")).as("c"))

  /** Fold one micro-batch of documents into the (source, n, gram, c)
    * state by counter ADDITION under the batch-id watermark (the
    * [[Dsir.applyBatch]] crash contract: replayed batches no-op).
    *
    * SHARDED state, not a whole-state rewrite: each batch APPENDS its
    * own batch-sized partial (stamped with the batch id) via the
    * exact-retry [[graft.io.ParquetUtil.safeAppend]] protocol, and the
    * pile compacts to one aggregated frame every `compactEvery`
    * batches. Per-batch cost is therefore batch-proportional — the
    * accumulated distinct-gram table moves only at compaction (amortized
    * state/compactEvery) and at read time ([[mergedCounts]] — one
    * re-aggregation the additive algebra makes exact at any pile depth).
    *
    * Crash windows: [[graft.io.ParquetUtil.recoverAppend]] runs BEFORE
    * the watermark read, so an append that committed but crashed before
    * its acknowledge is rolled back exactly and then legitimately
    * re-applied (watermark-first would see the stamp, skip the batch,
    * and let the NEXT batch's recovery delete the committed rows). A
    * compaction crash defers to the next compaction boundary —
    * correctness never depends on compaction having run.
    */
  def applyBatch(s: org.apache.spark.sql.SparkSession, b: DataFrame,
      batchId: Long, stateDir: String,
      compactEvery: Int = CompactEvery): Unit = {
    graft.io.ParquetUtil.recoverAppend(s, stateDir)
    val applied = graft.io.ParquetUtil.lastBatch(s, stateDir)
    if (applied.exists(batchId <= _)) return
    graft.io.ParquetUtil.safeAppend(s,
      gramCounts(b).withColumn("last_batch", lit(batchId)), stateDir)
    if (batchId % compactEvery == compactEvery - 1) {
      // the amortized O(state/compactEvery) read, metered honestly
      graft.streaming.StateScanMeter.add(s, stateDir)
      val compacted = mergedCounts(s, stateDir)
        .withColumn("last_batch", lit(batchId))
      graft.io.ParquetUtil.safeOverwrite(s, compacted, stateDir)
    }
  }

  /** The diversity profile off the folded state — equals the batch
    * rollup of the whole corpus exactly (additive counters merge the
    * delta pile before the rollup).
    */
  def diversityFromState(s: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame =
    rollup(mergedCounts(s, stateDir))
}
