package graft.text

import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share any
  * word n-gram with a held-out evaluation set — the standard pre-training
  * hygiene pass (n-gram containment, not symmetric Jaccard: one shared
  * eval n-gram is already contamination). Extension category; the
  * reference has nothing like it.
  *
  * Scale shape: the eval side is small by construction (benchmarks are
  * thousands of documents against billions), so its DISTINCT n-gram set
  * broadcasts; the training corpus streams through one explode + one
  * broadcast semi-ish join + one map-side-combined count — the corpus is
  * never shuffled on the n-gram key. Matching documents reduce to
  * (doc_id, n_shared) rows; non-matching documents re-enter via a left
  * join at id width.
  */
object Decontaminate {

  /** For each training doc (rows of `train`): the number of its distinct
    * word `k`-gram shingles that occur anywhere in `eval`'s text, and a
    * contaminated flag. Output: (idCol, n_shared, contaminated).
    */
  def flag(train: DataFrame, eval: DataFrame, textCol: String,
      idCol: String, k: Int): DataFrame = {
    def grams(df: DataFrame) = df
      .select(col(idCol).as("__id"),
        TextFunctions.tokens(col(textCol)).as("__w"))
      .select(col("__id"),
        explode(Dedup.shinglesFromTokens(col("__w"), k)).as("__g"))
    val evalGrams = grams(eval).select("__g").distinct()
    val shared = grams(train)
      .join(broadcast(evalGrams), "__g")
      .groupBy("__id")
      // shingles are distinct per doc, so plain count = distinct shared
      .agg(count(lit(1)).as("n_shared"))
    train.select(col(idCol))
      .join(shared.select(col("__id").as(idCol), col("n_shared")),
        Seq(idCol), "left")
      .na.fill(0L, Seq("n_shared"))
      .withColumn("contaminated", col("n_shared") > 0)
  }
}
