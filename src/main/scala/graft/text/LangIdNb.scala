package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained character-n-gram language identifier — multiclass +1-smoothed
  * multinomial Naive Bayes over char n-grams, the fastText/CCNet-style
  * component a real corpus pipeline ships (upgrade over the marker-word
  * heuristic `TextFunctions.langId`). Extension category; reuses the
  * round-11 [[NaiveBayes]] fixed-point conventions verbatim.
  *
  * Model: for class l with token counts c_l(w), token total N_l, vocab
  * size V, doc counts d_l of D: `score_l(doc) = Σ_w fp_l(w) +
  * n_oov·fpoov_l + fprior_l` where `fp_l(w) = floor(lnRatio(c_l(w)+1,
  * N_l+V)·2^20)`, `fpoov_l = floor(lnRatio(1, N_l+V)·2^20)` and
  * `fprior_l = floor(lnRatio(d_l, D)·2^20)` — ONE fixed-point snap per
  * log-ratio (the BM25-idf/NB convention), every argument a positive
  * integer through [[graft.functions.DetLog.lnRatio]], so scores and
  * the argmax replay bit-exactly in any engine. A vocab term absent
  * from class l has c_l = 0, so its fp equals fpoov_l by construction —
  * the same agreement-by-construction the binary NB's OOV coalesce has.
  *
  * Prediction: argmax of the integer scores, ties to the
  * alphabetically-first class (the heuristic langId's tiebreak).
  *
  * Scale shape: one train-split counting aggregation to a vocab-sized
  * wide table (term, fp per class — the per-class columns keep the
  * corpus stream joined ONCE, not once per class); the corpus n-gram
  * stream left-joins it on term and reduces straight back to one row
  * per document; the class scalars (fpoov/fprior per class) are 1 row
  * and broadcast. Same linear shape as TF-IDF/BM25/the LMs/binary NB.
  */
object LangIdNb {

  val LnScale: Long = Vocabulary.LnScale

  /** Character n-gram size, shipped default (bigrams). */
  val NGram = 2

  /** Character n-grams of `c`: positions 1..len−n+1, each `n` chars.
    * Mirrored in SQL by `list_transform(range(1, len−n+2), i ->
    * substr(text, i, n))` — DuckDB's `range` is end-exclusive and
    * empty when len &lt; n, hence the explicit empty-array guard here
    * (Spark's `sequence(1, 0)` would DESCEND, not empty out).
    *
    * This declarative rendering is the DEFINITION; the scoring path
    * uses the bit-identical native kernel
    * [[graft.functions.CharNgrams]] (spec-pinned parity), because
    * per-position `substring` rescans the codepoint prefix each call —
    * O(len²) per document, 5× the whole sf10 corpus scan.
    */
  def charNgrams(c: Column, n: Int = NGram): Column =
    when(length(c) >= n,
      transform(sequence(lit(1), length(c) - (n - 1)),
        i => c.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))

  private def lnFpRatio(a: Column, b: Column): Column =
    floor(graft.functions.DetLog.lnRatio(a, b) * LnScale).cast("long")

  /** Score every document of `docs` carrying ≥1 char n-gram against a
    * multiclass NB model trained on `train` (normally a split of the
    * corpus), whose `labelCol` ranges over `classes`. Output:
    * (idCol, n_ngrams, lang_pred, nb_score) with nb_score the winning
    * class's fixed-point log-probability scaled back to a double.
    *
    * `classes` is an explicit query parameter (the
    * [[graft.similarity.HybridRrf]] QueryTerms convention): the class
    * set is part of the model contract, not discovered per-run, so the
    * static oracle replays it verbatim. Training rows whose label is
    * outside `classes` are ignored.
    */
  def score(docs: DataFrame, train: DataFrame, idCol: String,
      textCol: String, labelCol: String, classes: Seq[String],
      n: Int = NGram): DataFrame = {
    require(classes.nonEmpty && classes == classes.sorted.distinct,
      "classes must be a sorted, duplicate-free, nonempty list")
    // labels are interpolated into derived column names (c_<l>, fp_<l>,
    // score_<l>) and into the oracle's SQL string literals, so restrict
    // them to a safe identifier charset — a quote, dot, or space would
    // break column resolution or the replay SQL
    require(classes.forall(_.matches("[A-Za-z0-9_]+")),
      s"classes must match [A-Za-z0-9_]+ (used in derived column names " +
        s"and oracle SQL); got: ${classes.mkString(", ")}")
    def grams(df: DataFrame, extra: Seq[Column]): DataFrame = df
      .select((col(idCol) +:
        graft.functions.GraftFunctions
          .charNgrams(df.sparkSession, col(textCol), n).as("w") +:
        extra): _*)
      .where(size(col("w")) > 0)
    val twTrain = grams(train, Seq(col(labelCol).as("lbl")))
      .where(col("lbl").isin(classes.map(c => c: Any): _*))
    // vocab-sized wide counts: (term, c_<class>...)
    val t = twTrain.select(explode(col("w")).as("term"), col("lbl"))
    val cCols = classes.map(l =>
      sum(when(col("lbl") === l, 1L).otherwise(0L)).as(s"c_$l"))
    // pinned (eager, vocab-sized): feeds the totals AND the model
    // table, and makes the broadcast gate's count free (the
    // BigramLm.score convention)
    val counts = t.groupBy("term").agg(cCols.head, cCols.tail: _*)
      .localCheckpoint()
    // byte-aware gate scaled by model WIDTH: the broadcast table is
    // (term, fp_<class>...) — one long column per class — so a large
    // class set tightens the row budget proportionally instead of
    // letting a hundreds-of-MB wide model ride through a row-count gate
    val small = BigramLm.vocabBroadcastOk(counts.count(),
      BigramLm.vocabRowBytes(strCols = 1, numCols = classes.size))
    def gated(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    // 1-row totals: per-class token totals + vocab size + doc counts
    val nCols = classes.map(l => sum(col(s"c_$l")).as(s"n_$l")) :+
      count(lit(1)).as("v")
    val totals = counts.agg(nCols.head, nCols.tail: _*)
    val dCols = classes.map(l =>
      sum(when(col("lbl") === l, 1L).otherwise(0L)).as(s"d_$l")) :+
      count(lit(1)).as("dd")
    val docCounts = twTrain.agg(dCols.head, dCols.tail: _*)
    // degenerate-model guard, in-plan on the 1-row frame (the binary
    // NB convention): every class needs ≥1 training doc, vocab nonempty
    val sane = classes
      .map(l => col(s"d_$l") >= 1)
      .reduce(_ && _) && col("v") >= 1
    val guard = coalesce(assert_true(sane,
      lit("LangIdNb: degenerate model — every class needs >=1 training " +
        "doc and the vocabulary must be nonempty")), lit(0L))
    val scalars = totals.crossJoin(docCounts).select(
      classes.map(l =>
        lnFpRatio(lit(1L), col(s"n_$l") + col("v")).as(s"fpoov_$l")) ++
        classes.map(l =>
          (lnFpRatio(col(s"d_$l"), col("dd")) + guard).as(s"fprior_$l")): _*)
    // per-term per-class fixed-point log-likelihoods; a class-absent
    // term (c_l = 0) lands exactly on fpoov_l
    val model = counts.crossJoin(broadcast(totals)).select(
      col("term") +: classes.map(l =>
        lnFpRatio(col(s"c_$l") + 1, col(s"n_$l") + col("v"))
          .as(s"fp_$l")): _*)
    val tw = grams(docs, Nil)
    val aggCols: Seq[Column] =
      classes.map(l =>
        sum(coalesce(col(s"fp_$l"), lit(0L))).as(s"sum_$l")) ++ Seq(
        sum(when(col(s"fp_${classes.head}").isNull, 1L).otherwise(0L))
          .as("n_oov"),
        count(lit(1)).as("n_ngrams"))
    val agg = tw.select(col(idCol), explode(col("w")).as("term"))
      .join(gated(model), Seq("term"), "left")
      .groupBy(col(idCol))
      .agg(aggCols.head, aggCols.tail: _*)
      .crossJoin(broadcast(scalars))
    val scores = classes.map(l =>
      (col(s"sum_$l") + col("n_oov") * col(s"fpoov_$l") +
        col(s"fprior_$l")).as(s"score_$l"))
    val withScores = agg.select(
      col(idCol) +: col("n_ngrams") +: scores: _*)
    val best = greatest(classes.map(l => col(s"score_$l")): _*)
    // alphabetical order of `classes` ⇒ first class reaching the max
    // wins ties (the heuristic langId convention)
    val pred = classes.foldLeft(
      when(lit(false), "und")) { case (acc, l) =>
      acc.when(col(s"score_$l") === best, l)
    }.otherwise("und")
    withScores
      .select(col(idCol), col("n_ngrams"), pred.as("lang_pred"),
        round(best.cast("double") / lit(LnScale.toDouble), 6)
          .as("nb_score"))
  }
}
