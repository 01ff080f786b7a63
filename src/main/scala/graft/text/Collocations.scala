package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pointwise-mutual-information collocation mining: bigrams whose
  * co-occurrence beats the independence assumption,
  * PMI = ln(p(ab)) − ln(p(a)) − ln(p(b)).
  *
  * Determinism: like [[Vocabulary.lmScore]], every ln(count) runs
  * through [[graft.functions.DetLog]] (no libm) and is snapped to 2^-20
  * fixed-point once, and the PMI combines five such integers —
  * pmi_fp = fp(c_ab) − fp(M) − fp(c_a) − fp(c_b) + 2·fp(N) — so ranking
  * and values are bit-identical in any engine.
  *
  * Scale shape: two explode + combine-reduced aggregations (unigrams,
  * bigrams), then two |vocab|-sized equi-joins to attach c_a/c_b; corpus
  * totals ride along as 1-row cross joins. Top-k plans TakeOrdered.
  * Bigrams come from the native one-pass `word_ngrams` kernel (the
  * declarative `ngrams(tokens(text), 2)` rendering re-tokenizes the
  * document at every position — the q_ngram_diversity finding), and the
  * bigram total M derives from the grouped frame instead of a second
  * corpus explode — one bigram pass total, values unchanged.
  */
object Collocations {

  val LnScale: Long = Vocabulary.LnScale

  private def fp(c: org.apache.spark.sql.Column) =
    floor(graft.functions.DetLog.lnInt(c) * LnScale).cast("long")

  /** Top-k bigram collocations with at least `minCount` occurrences.
    * Output: (bigram, c_ab, c_a, c_b, pmi, rank).
    */
  def topCollocations(
      docs: DataFrame, textCol: String, k: Int, minCount: Long)
      : DataFrame = {
    val toks = docs.select(
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    val uni = toks.groupBy("term").agg(count(lit(1)).as("c"))
    val n = uni.agg(sum(col("c")).as("n"),
      fp(sum(col("c"))).as("fp_n"))
    val big = docs.select(explode(graft.functions.GraftFunctions
        .wordNgrams(docs.sparkSession, col(textCol), 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("c_ab"))
      .localCheckpoint() // feeds both the total and the filtered frame
    val bi = big.where(col("c_ab") >= minCount)
    val m = big.agg(fp(sum(col("c_ab"))).as("fp_m"))
    val scored = bi
      .withColumn("a", split(col("bigram"), " ").getItem(0))
      .withColumn("b", split(col("bigram"), " ").getItem(1))
      .join(uni.select(col("term").as("a"), col("c").as("c_a")), "a")
      .join(uni.select(col("term").as("b"), col("c").as("c_b")), "b")
      .crossJoin(n.select("fp_n"))
      .crossJoin(m)
      .select(col("bigram"), col("c_ab"), col("c_a"), col("c_b"),
        (fp(col("c_ab")) - col("fp_m") - fp(col("c_a")) - fp(col("c_b"))
          + lit(2L) * col("fp_n")).as("pmi_fp"))
      .withColumn("pmi",
        round(col("pmi_fp").cast("double") / LnScale, 6))
    scored.orderBy(col("pmi_fp").desc, col("bigram")).limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("pmi_fp").desc, col("bigram"))).cast("long"))
      .select("rank", "bigram", "c_ab", "c_a", "c_b", "pmi")
  }
}
