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
  * is the approximate path there).
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

  /** Fold one micro-batch of documents into the (source, n, gram, c)
    * state by counter ADDITION under the batch-id watermark (the
    * [[Dsir.applyBatch]] crash contract: replayed batches no-op).
    */
  def applyBatch(s: org.apache.spark.sql.SparkSession, b: DataFrame,
      batchId: Long, stateDir: String): Unit = {
    val applied = graft.io.ParquetUtil.lastBatch(s, stateDir)
    if (applied.exists(batchId <= _)) return
    val hasState = applied.isDefined
    val partial = gramCounts(b)
    val merged =
      if (!hasState) partial
      else graft.io.ParquetUtil.readRecovered(s, stateDir)
        .drop("last_batch")
        .unionByName(partial)
        .groupBy("source", "n", "gram").agg(sum(col("c")).as("c"))
    graft.io.ParquetUtil.safeOverwrite(s,
      merged.withColumn("last_batch", lit(batchId)), stateDir)
  }

  /** The diversity profile off the folded state — equals the batch
    * rollup of the whole corpus exactly (additive counters).
    */
  def diversityFromState(s: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame =
    rollup(s.read.parquet(stateDir).drop("last_batch"))
}
