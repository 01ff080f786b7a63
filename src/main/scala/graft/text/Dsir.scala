package graft.text

import graft.functions.DetLog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR — Data Selection with Importance Resampling (Xie et al., 2023,
  * arXiv:2302.03169) — over hashed n-gram features: score every raw
  * document by how much more likely its features are under a TARGET
  * distribution (a trusted high-quality slice) than under the raw corpus
  * distribution, then keep the documents whose log-importance weight is
  * positive. This is the standard pretraining-corpus selection step that
  * sits between dedup and tokenization in an LLM data pipeline
  * (extension category; the reference has no selection operators).
  *
  * Model: features are unigram + bigram occurrences hashed into
  * [[NumBuckets]] buckets (the paper's hashed n-gram generative model).
  * With Laplace-smoothed bucket probabilities
  * `p(b) = (cnt[b] + 1) / (tot + B)`, a document's log weight is
  * `Σ_f [ln p_target(b_f) − ln p_raw(b_f)]` over its feature
  * OCCURRENCES (multiplicity matters — the model is a unigram LM over
  * buckets).
  *
  * Determinism: IEEE addition is order-sensitive, so the per-bucket log
  * terms are computed with [[DetLog]] (engine-identical bits, no libm)
  * and snapped ONCE PER BUCKET to 2^-20 fixed point; per-document sums
  * then run on exact integers — bit-identical under any partitioning or
  * accumulation order, mirrored exactly by the DuckDB oracle.
  *
  * Scale shape (the 100 TB plan): one corpus scan explodes features;
  * bucket statistics are a combine-reduced aggregation onto ≤ B rows
  * (map-side partial, B = 1024 — never corpus-sized); the per-document
  * score is the exploded features equi-joined to the BROADCAST bucket
  * table and re-aggregated by document. Two corpus-token-sized shuffles
  * total (bucket counts; per-doc sum), both with map-side combine.
  */
object Dsir {

  /** Hashed feature space size. The paper uses 10k for full CC-scale
    * corpora; 1024 keeps the oracle's bucket table readable while being
    * big enough that the test vocabulary (~25 words + bigrams) doesn't
    * saturate it.
    */
  val NumBuckets = 1024

  /** Fixed-point scale for snapped logs (2^20 ≈ 6 decimal digits). */
  val LnScale: Long = Vocabulary.LnScale

  /** Feature stream: unigrams ++ bigrams (with multiplicity) of a
    * token-array column. Documents with one token contribute only the
    * unigram; empty documents contribute nothing.
    */
  def features(t: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(t, TextFunctions.ngrams(t, 2))

  /** Per-document DSIR log-importance weights.
    *
    * @param targetPred row predicate defining the target (trusted) slice
    *                   over `docs`' columns, e.g. `col("lang") === "en"`.
    * @return (idCol, n_feats, logw, selected) for EVERY document;
    *         feature-less documents score 0. `logw` is the snapped
    *         fixed-point weight divided back to nats (rounded to 6);
    *         `selected` ⇔ the weight is strictly positive, i.e. the
    *         document is more likely under the target model.
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      targetPred: org.apache.spark.sql.Column): DataFrame = {
    val feats = featureBuckets(docs, idCol, textCol, targetPred)
    weightsFromBuckets(docs, idCol, feats, bucketCounts(feats))
  }

  /** (idCol, is_t, b) hashed feature-bucket occurrences — one row per
    * feature occurrence, the corpus-token-sized explode shared by the
    * batch and streaming paths.
    */
  def featureBuckets(docs: DataFrame, idCol: String, textCol: String,
      targetPred: org.apache.spark.sql.Column): DataFrame = {
    // bigrams via the native one-pass word_ngrams kernel: the
    // declarative features(tokens(text)) rendering re-tokenizes the
    // document at every lambda position after projection collapse
    // (the q_ngram_diversity finding); bit-parity with features() is
    // kernel-spec-pinned, so the bucket stream is value-identical
    val grams = concat(TextFunctions.tokens(col(textCol)),
      graft.functions.GraftFunctions
        .wordNgrams(docs.sparkSession, col(textCol), 2))
    docs
      .select(col(idCol), targetPred.as("is_t"),
        explode(grams).as("f"))
      .select(col(idCol), col("is_t"),
        (TextFunctions.tokenHash60(col("f")) % NumBuckets).as("b"))
  }

  /** Bucket statistics (b, cr, ct): ≤ B rows after a map-side-combined
    * hash agg; the conditional agg gets raw AND target in ONE pass.
    * Counters are ADDITIVE-mergeable: summing partial tables over any
    * partitioning of the corpus (or stream) equals the batch table.
    */
  def bucketCounts(feats: DataFrame): DataFrame =
    feats.groupBy(col("b")).agg(
      count(lit(1)).as("cr"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"))

  /** Score documents against a (possibly streamed) bucket table. */
  def weightsFromBuckets(docs: DataFrame, idCol: String, feats: DataFrame,
      buckets: DataFrame): DataFrame = {
    val B = NumBuckets
    // snapped per-bucket log terms (fixed point, exact integers)
    val lw = buckets.select(col("b"),
      (floor(DetLog.lnInt(col("ct") + 1) * LnScale)
        - floor(DetLog.lnInt(col("cr") + 1) * LnScale)).cast("long")
        .as("lw"))
    // corpus-level normalisers ln(tot+B) — 1-row frame, broadcast
    val totals = buckets.agg(
      (floor(DetLog.lnInt(sum(col("cr")) + B) * LnScale)
        - floor(DetLog.lnInt(sum(col("ct")) + B) * LnScale)).cast("long")
        .as("c0"))
    val perDoc = feats
      .join(broadcast(lw), Seq("b"))
      .groupBy(col(idCol))
      .agg(sum(col("lw")).as("s"), count(lit(1)).as("n_feats"))
    // every document gets a row; feature-less docs score exactly 0
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .crossJoin(broadcast(totals))
      .select(col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        round((coalesce(col("s"), lit(0L))
          + coalesce(col("n_feats"), lit(0L)) * col("c0")).cast("double")
          / LnScale.toDouble, 6).as("logw"),
        ((coalesce(col("s"), lit(0L))
          + coalesce(col("n_feats"), lit(0L)) * col("c0")) > 0)
          .as("selected"))
  }

  /** Fold one micro-batch of documents into a persisted bucket table —
    * the streaming rendering. Counter ADDITION merges the table exactly
    * (cell-wise sum over any stream partitioning equals the batch
    * table), but addition is not idempotent, so replay protection under
    * at-least-once delivery is the batch-id watermark carried inside
    * the single atomically-swapped state frame — the
    * [[graft.functions.CountMinSketch.applyBatch]] algebra. State never
    * exceeds [[NumBuckets]] rows.
    */
  def applyBatch(s: org.apache.spark.sql.SparkSession, b: DataFrame,
      idCol: String, textCol: String,
      targetPred: org.apache.spark.sql.Column, batchId: Long,
      stateDir: String): Unit = {
    val applied = graft.io.ParquetUtil.lastBatch(s, stateDir)
    if (applied.exists(batchId <= _)) return
    val hasState = applied.isDefined
    val partial = bucketCounts(
      featureBuckets(b, idCol, textCol, targetPred))
    val merged =
      if (!hasState) partial
      else graft.io.ParquetUtil.readRecovered(s, stateDir).drop("last_batch")
        .unionByName(partial)
        .groupBy("b")
        .agg(sum(col("cr")).as("cr"), sum(col("ct")).as("ct"))
    graft.io.ParquetUtil.safeOverwrite(s,
      merged.withColumn("last_batch", lit(batchId)), stateDir)
  }

  /** Score the full corpus against the streamed bucket table — equals
    * [[importanceWeights]] of the batch corpus exactly.
    */
  def weightsFromState(s: org.apache.spark.sql.SparkSession,
      docs: DataFrame, idCol: String, textCol: String,
      targetPred: org.apache.spark.sql.Column, stateDir: String)
      : DataFrame =
    weightsFromBuckets(docs, idCol,
      featureBuckets(docs, idCol, textCol, targetPred),
      s.read.parquet(stateDir).drop("last_batch"))
}
