package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus vocabulary statistics and unigram language-model scoring —
  * the two corpus-level text passes a training-data pipeline runs before
  * filtering (extension category; the reference has no text analytics).
  *
  * Scale shape: both are explode → combine-reduced aggregations. The
  * vocabulary is |vocab|-sized (tiny next to the corpus); `topK` plans
  * TakeOrderedAndProject — per-partition heaps of k rows merged on the
  * driver, NOT a single-partition global window over the vocabulary.
  *
  * LM scoring determinism: mean log-probability sums log doubles per
  * document, and IEEE addition is order-sensitive — different partition
  * or engine evaluation orders would drift in the last ulp. So ln(tf)
  * and ln(N) are computed with [[graft.functions.DetLog]] (no libm,
  * engine-identical bits) and snapped to 2^-20 fixed-point ONCE PER
  * TERM (`floor(lnInt(tf)·2^20)` as a long); the per-document sum runs
  * on exact integers: bit-identical under any accumulation order,
  * mirrored exactly by the DuckDB oracle.
  */
object Vocabulary {

  /** Fixed-point scale for log-probabilities (2^20 ≈ 6 decimal digits). */
  val LnScale: Long = 1L << 20

  /** term → corpus frequency (tf) and document frequency (df). */
  def vocabulary(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    docs.select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("tf"), count_distinct(col(idCol)).as("df"))

  /** Top-k vocabulary rows by corpus frequency (ties broken by term).
    * The heavy lifting is the TakeOrderedAndProject from orderBy+limit
    * (per-partition k-row heaps merged on the driver); the rank is then
    * an ordinal over the k surviving rows — assigned with a row-local id
    * on the explicitly re-sorted single partition, NOT a global window
    * (an unpartitioned WindowExec, even a k-row-bounded one, trips the
    * engine's own plan-hygiene warnings).
    */
  def topK(vocab: DataFrame, k: Int): DataFrame =
    vocab.orderBy(col("tf").desc, col("term")).limit(k)
      .coalesce(1).sortWithinPartitions(col("tf").desc, col("term"))
      .withColumn("rank", monotonically_increasing_id() + 1)

  /** Mean unigram log-probability per document (the CCNet-style quality
    * signal: low = far from the corpus distribution). Output:
    * (idCol, n_tokens, avg_logprob) — empty documents are absent, like
    * every SQL rendering that explodes tokens.
    */
  def lmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    // pinned (eager, vocab-sized): feeds the term table AND ln N, and
    // the pin makes the broadcast gate's count free (the BigramLm
    // convention — without the gate the corpus token stream shuffles
    // on term just to meet this table)
    val vocab = toks.groupBy("term").agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    // byte-aware gate; the broadcast table is (term, fp)
    val small = BigramLm.vocabBroadcastOk(vocab.count(),
      BigramLm.vocabRowBytes(strCols = 1, numCols = 1))
    val termFp = vocab.select(col("term"),
      floor(graft.functions.DetLog.lnInt(col("tf")) * LnScale)
        .cast("long").as("fp"))
    // ln of the corpus token count, same fixed-point snap (1-row frame)
    val lnN = vocab.agg(
      floor(graft.functions.DetLog.lnInt(sum(col("tf"))) * LnScale)
        .cast("long").as("ln_n_fp"))
    toks.join(if (small) broadcast(termFp) else termFp, "term")
      .groupBy(col(idCol))
      .agg(sum(col("fp")).as("sum_fp"), count(lit(1)).as("n_tokens"))
      .crossJoin(lnN)
      .select(col(idCol), col("n_tokens"),
        round(
          (col("sum_fp") - col("n_tokens") * col("ln_n_fp")).cast("double")
            / (col("n_tokens") * lit(LnScale.toDouble)), 6)
          .as("avg_logprob"))
  }
}
