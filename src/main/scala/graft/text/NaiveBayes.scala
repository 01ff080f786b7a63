package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binary multinomial Naive Bayes document classifier — the LEARNED
  * quality-filter stage of an LLM data pipeline (the GPT-3/WebText
  * recipe: train a cheap linear classifier on a trusted positive
  * class, score the crawl by log-odds and keep the high scorers).
  * Completes the quality battery: heuristic ratios (`q_text_quality`)
  * → unigram LM (`q_lm_score`) → bigram LM (`q_lm_perplexity`) →
  * trained classifier (this). Extension category.
  *
  * Model: +1-smoothed multinomial NB. For a document with tokens
  * w_1..w_n, `logodds = Σ_i [ln((c_pos(w_i)+1)/(N_pos+V)) −
  * ln((c_neg(w_i)+1)/(N_neg+V))] + ln(d_pos/d_neg)` — every argument
  * a positive integer, so each log-RATIO runs through
  * [[graft.functions.DetLog.lnRatio]] and snaps ONCE to 2^-20 fixed
  * point per vocabulary row (the BM25-idf convention); per-document
  * scores are integer sums of table lookups. An out-of-vocabulary
  * token contributes floor(ln((0+1)/(0+1))·2^20) = 0, which is
  * EXACTLY the +1-smoothing value — the OOV coalesce and the
  * smoothing formula agree by construction.
  *
  * Scale shape: one train-split counting aggregation to a vocab-sized
  * (term, c_pos, c_neg) table; the corpus token stream left-joins it
  * on term (shuffle hash join) and reduces straight back to one row
  * per document; the class totals/prior frame is 1 row and
  * broadcasts. Same linear shape as TF-IDF/BM25/the LMs.
  */
object NaiveBayes {

  val LnScale: Long = Vocabulary.LnScale

  /** Score every non-empty document of `docs` with an NB model
    * trained on `train` (normally a split of the corpus), where
    * `isPos` labels the training rows. Output:
    * (idCol, n_tokens, nb_logodds, pred_pos).
    */
  def scoreBinary(docs: DataFrame, train: DataFrame, idCol: String,
      textCol: String, isPos: Column): DataFrame = {
    // ONE fixed-point snap per log-RATIO (the BM25-idf convention —
    // the oracle replays it through DetLog.lnRatioCtes verbatim)
    val lnFpRatio: (Column, Column) => Column = (a, b) =>
      floor(graft.functions.DetLog.lnRatio(a, b) * LnScale).cast("long")
    def tokenized(df: DataFrame, extra: Seq[Column]): DataFrame = df
      .select((col(idCol) +: TextFunctions.tokens(col(textCol)).as("w") +:
        extra): _*)
      .where(size(col("w")) > 0)
    val twTrain = tokenized(train, Seq(isPos.as("pos")))
    val t = twTrain.select(explode(col("w")).as("term"), col("pos"))
    val counts = t.groupBy("term").agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("cpos"),
      sum(when(col("pos"), 0L).otherwise(1L)).as("cneg"))
    val fpt = counts.select(col("term"),
      lnFpRatio(col("cpos") + 1, col("cneg") + 1).as("fp"))
    // 1-row model frame: per-token class normaliser and the doc prior
    val docCounts = twTrain.agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("dpos"),
      sum(when(col("pos"), 0L).otherwise(1L)).as("dneg"))
    val norm = counts.agg(
      sum(col("cpos")).as("npos"), sum(col("cneg")).as("nneg"),
      count(lit(1)).as("v"))
      .crossJoin(docCounts)
      .select(
        lnFpRatio(col("npos") + col("v"), col("nneg") + col("v"))
          .as("fpn"),
        lnFpRatio(col("dpos"), col("dneg")).as("fprior"))
    val tw = tokenized(docs, Nil)
    val dl = tw.select(col(idCol), size(col("w")).cast("long").as("n_tokens"))
    tw.select(col(idCol), explode(col("w")).as("term"))
      .join(fpt, Seq("term"), "left")
      .groupBy(col(idCol))
      .agg(sum(coalesce(col("fp"), lit(0L))).as("sum_fp"),
        count(lit(1)).as("n"))
      .crossJoin(broadcast(norm))
      .select(col(idCol),
        (col("sum_fp") - col("n") * col("fpn") + col("fprior"))
          .as("logodds_fp"))
      .join(dl, idCol)
      .select(col(idCol), col("n_tokens"),
        round(col("logodds_fp").cast("double") / lit(LnScale.toDouble), 6)
          .as("nb_logodds"),
        (col("logodds_fp") > 0L).as("pred_pos"))
  }
}
