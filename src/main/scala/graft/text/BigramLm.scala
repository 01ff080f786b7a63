package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bigram language-model scoring with Stupid Backoff (Brants et al.
  * 2007, "Large Language Models in Machine Translation") — the
  * web-scale LM-quality signal a curation pipeline uses where the
  * unigram score ([[Vocabulary.lmScore]]) is too blunt: a document of
  * common words in nonsense order scores high on unigrams but low here.
  * The model trains on a REFERENCE split and scores the whole corpus —
  * the CCNet deployment shape (train on the trusted corpus, score the
  * crawl) — so unseen bigrams and out-of-vocabulary tokens genuinely
  * occur and the backoff path is live. Extension category (no reference
  * counterpart; nearest surface is dfl_customCode.py's function hook).
  *
  * Model: S(w_i | w_{i-1}) = c(w_{i-1} w_i) / c(w_{i-1}) when the
  * bigram was seen in training, else alpha * c(w_i) / N with
  * alpha = 0.4 — the unnormalised backoff score that needs NO
  * discounting pass, which is exactly why it is the one LM that stays
  * a pure counting problem at 100 TB (Brants et al. run it at 2e12
  * tokens). The first token of each document scores as a unigram
  * c(w_1) / N, and an out-of-vocabulary token smooths to c = 1.
  *
  * Determinism: every count is an integer; each ln goes through
  * [[graft.functions.DetLog]] and is snapped to 2^-20 fixed point
  * PER TABLE ROW (unigram table, bigram table, corpus total, and the
  * alpha literal), so per-token scores are integer sums of table
  * lookups — bit-identical across engines and partitionings; the OOV
  * smoothing constant is floor(lnInt(1)·2^20) = 0, the exact value the
  * unigram table would carry for a count-1 term. Only the final
  * per-document average divides — exact integers into a double.
  *
  * Scale shape: two train-split counting aggregations (unigram and
  * bigram vocabularies, map-side combined); the corpus token and
  * bigram streams then left-join the vocab-sized fixed-point tables on
  * their term keys (shuffle hash joins, AQE-coalesced) and reduce
  * straight back to one row per document. The corpus-total frame is
  * 1 row and broadcasts. No window, no driver-side loop, nothing
  * pairwise — the same shape as TF-IDF/BM25, linear in corpus tokens.
  */
object BigramLm {

  /** Fixed-point scale for log scores, shared with the unigram LM. */
  val LnScale: Long = Vocabulary.LnScale

  /** floor(ln(0.4) * 2^20) with ln(0.4) = lnInt(2) - lnInt(5) through
    * the DetLog reference DAG — computed once on the driver, emitted
    * into BOTH renderings as the same integer literal.
    */
  val AlphaFp: Long =
    math.floor(graft.functions.DetLog.lnRatioRef(2, 5) * LnScale).toLong

  /** Adjacent (w1, w2) pairs straight off a token-array column: one
    * generate per document, no self-join, no window.
    */
  private def bigramPairs(tw: DataFrame, idCol: String): DataFrame =
    bigramPairsCols(tw, Seq(idCol))

  /** [[bigramPairs]] carrying several pass-through columns (the grouped
    * scorer needs both the group key and the doc id on the stream).
    */
  private def bigramPairsCols(tw: DataFrame, carry: Seq[String])
      : DataFrame =
    tw.where(size(col("w")) >= 2)
      .select(carry.map(col) :+ explode(
        transform(slice(col("w"), lit(1), size(col("w")) - 1),
          (x, i) => struct(x.as("w1"),
            element_at(col("w"), i + lit(2)).as("w2")))).as("p"): _*)
      .select(carry.map(col) ++
        Seq(col("p.w1").as("w1"), col("p.w2").as("w2")): _*)

  /** Byte budget for broadcasting model tables into the corpus scoring
    * streams. Below it (every curation-sized reference split) the vocab
    * tables broadcast, so the corpus-sized token/bigram streams are
    * never shuffled on term keys — their first (and only) exchange is
    * the per-document partial-agg output, and documents are contiguous
    * in scan partitions so the map-side combine collapses the stream to
    * ~one row per doc before it ships. Above the gate (web-scale
    * vocabularies — Brants et al. train on 2e12 tokens where the
    * unigram table alone is GBs) the joins stay distributed shuffle
    * joins, the documented scale path. Measured at sf10 (500k docs,
    * 26.6M bigram positions, 96k-row model): gated-broadcast 38.6s vs
    * shuffle-join 320.6s same-window (8.3×) — the stream's two term-key
    * exchanges were most of the query.
    *
    * The gate is BYTE-aware, not row-count-only: a wide multiclass
    * model ([[LangIdNb]]: term + one long column per class) reaches
    * hundreds of MB at row counts a narrow bigram table carries in
    * tens, so each caller passes its row count through
    * [[vocabBroadcastOk]] with its own schema-derived per-row width.
    * 64 MB ≈ the 2M-row gate the narrow tables shipped under in round
    * 12 (≈32 B/row), kept well inside Spark's broadcast comfort zone.
    */
  val BroadcastVocabBytes: Long = 64L << 20

  /** Estimated serialized width of one model-table row: `strCols`
    * string columns at an assumed 24 B average term (char n-grams and
    * word tokens are short) + 8 B per numeric column. Deliberately a
    * coarse planner-style estimate — the gate only picks a join
    * strategy; both sides are value-identical.
    */
  def vocabRowBytes(strCols: Int, numCols: Int): Long =
    24L * strCols + 8L * numCols

  /** True when a model table of `rows` rows at `bytesPerRow` estimated
    * width fits the broadcast budget.
    */
  def vocabBroadcastOk(rows: Long, bytesPerRow: Long): Boolean =
    rows * bytesPerRow <= BroadcastVocabBytes

  /** Score every non-empty document of `docs` under a Stupid-Backoff
    * bigram LM trained on `train` (normally a split of the same
    * corpus). Output: (idCol, n_tokens, avg_logprob), the mean
    * log-score over all `n_tokens` positions (position 1 scored as a
    * unigram).
    */
  def score(docs: DataFrame, train: DataFrame, idCol: String,
      textCol: String): DataFrame =
    scoreFp(docs, train, idCol, textCol)
      .select(col(idCol), col("n_tokens"),
        round(col("sum_fp").cast("double") /
          (col("n_tokens").cast("double") * lit(LnScale.toDouble)), 6)
          .as("avg_logprob"))

  /** As [[score]], but keeps the per-document log-score as the exact
    * fixed-point integer sum: (idCol, n_tokens, sum_fp). Compositions
    * that COMBINE scores from two models (Moore–Lewis cross-entropy
    * difference) difference the integer sums and divide once, so the
    * comparison never stacks two roundings.
    */
  def scoreFp(docs: DataFrame, train: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    def tokenized(df: DataFrame): DataFrame = df
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("w"))
      .where(size(col("w")) > 0)
    val twTrain = tokenized(train)
    // raw count tables; the unigram table is pinned inside
    // scoreWithCounts, the bigram counts stay lazy until the fpb pin
    val u = twTrain.select(explode(col("w")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c1"))
    val b = bigramPairs(twTrain, idCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    scoreWithCounts(docs, u, b, idCol, textCol)
  }

  /** Score `docs` from PREBUILT model count tables `u` (term, c1) and
    * `b` (w1, w2, c2) — the seam the nearline LM uses: micro-batches
    * fold counts additively into a persisted state frame
    * ([[applyBatch]]), and scoring reads the fold here, so the streamed
    * query replays the batch oracle verbatim. Output: (idCol,
    * n_tokens, sum_fp).
    */
  def scoreWithCounts(docs: DataFrame, uRaw: DataFrame, b: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val lnFp: Column => Column =
      c => floor(graft.functions.DetLog.lnInt(c) * LnScale).cast("long")
    def tokenized(df: DataFrame): DataFrame = df
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("w"))
      .where(size(col("w")) > 0)
    val tw = tokenized(docs)
    // the unigram model table is PINNED (eager, vocab-sized): without
    // the pin the count aggregation re-executes inside every consumer
    // (fpu, the ln N total, the bigram table's unigram join) — three
    // extra passes at any scale
    val u = uRaw.localCheckpoint()
    val fpu = u.select(col("term"), lnFp(col("c1")).as("fp1"))
    // ln N over the per-term partials (1-row frame, broadcasts)
    val fpn = u.agg(lnFp(sum(col("c1"))).as("fpn"))
    // the seen-bigram SCORE ln(c2/c1(w1)) is precomputed INSIDE the
    // bigram table — its rows know their w1, so the unigram snap joins
    // the vocab-sized table here, not the corpus-sized token stream;
    // the scoring stream below then pays TWO lookups per position
    // instead of three (w1 is in-vocabulary whenever the bigram hit).
    // Pinned for the same reason as `u` (and the pin makes the
    // broadcast gate's count free).
    val fpb = b
      .select(col("w1"), col("w2"), lnFp(col("c2")).as("fp2"))
      .join(fpu.select(col("term").as("w1"), col("fp1")), "w1")
      .select(col("w1"), col("w2"),
        (col("fp2") - col("fp1")).as("fpseen"))
      .localCheckpoint()
    // size-gated broadcast (counts are free off the pins): small
    // models ride into the scan, web-scale vocabularies stay on the
    // distributed join path. Width: unigram table (term, fp1), bigram
    // table (w1, w2, fpseen).
    val small =
      vocabBroadcastOk(u.count(), vocabRowBytes(strCols = 1, numCols = 1)) &&
        vocabBroadcastOk(fpb.count(), vocabRowBytes(strCols = 2, numCols = 1))
    def gated(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    // position 1: unigram ln(c(w_1)/N); OOV smooths to c = 1 (fp 0)
    val sFirst = tw.select(col(idCol), element_at(col("w"), 1).as("w1"))
      .join(gated(fpu.select(col("term").as("w1"), col("fp1"))),
        Seq("w1"), "left")
      .crossJoin(broadcast(fpn))
      .select(col(idCol),
        (coalesce(col("fp1"), lit(0L)) - col("fpn")).as("fp"))
    // positions 2..n: the precomputed seen score, else backoff
    // ln(0.4) + ln(c1(w2)/N)
    val sBigram = bigramPairs(tw, idCol)
      .join(gated(fpu.select(col("term").as("w2"), col("fp1").as("fp1b"))),
        Seq("w2"), "left")
      .join(gated(fpb), Seq("w1", "w2"), "left")
      .crossJoin(broadcast(fpn))
      .select(col(idCol),
        when(col("fpseen").isNotNull, col("fpseen"))
          .otherwise(coalesce(col("fp1b"), lit(0L)) - col("fpn")
            + lit(AlphaFp)).as("fp"))
    val dl = tw.select(col(idCol), size(col("w")).cast("long").as("n_tokens"))
    sFirst.unionByName(sBigram)
      .groupBy(col(idCol))
      .agg(sum(col("fp")).as("sum_fp"))
      .join(dl, idCol)
      .select(col(idCol), col("n_tokens"), col("sum_fp"))
  }

  /** GROUPED [[scoreFp]] — one independent model PER VALUE of `grpCol`,
    * trained and scored in a single fused chain (the DoReMi shape: one
    * LM per domain). Every count, ln snap, and fixed-point sum is keyed
    * by the group column and groups are disjoint, so each group's
    * (idCol, n_tokens, sum_fp) rows are bit-identical to running
    * [[scoreFp]] on that group's docs/train slices alone
    * (BigramLmSpec pins the parity; the q_domain_weights oracle pins it
    * cross-engine). The win is job- and scan-count: G per-group chains
    * pay G×(2 pins + 2 gate counts) and re-read the corpus 2G times in
    * the final job; the grouped chain pays the pins once and reads the
    * corpus twice total.
    *
    * A group with NO training rows has no model: its docs emit
    * null-scored rows (null `sum_fp`), exactly the per-slice chain's
    * degenerate-case shape (ln N left-joins and nulls propagate
    * through the fixed-point arithmetic).
    */
  def scoreFpGrouped(docs: DataFrame, train: DataFrame, idCol: String,
      textCol: String, grpCol: String): DataFrame =
    scoreFpGroupedKeyed(docs, train, idCol, textCol, grpCol)
      .select(col(idCol), col("n_tokens"), col("sum_fp"))

  /** [[scoreFpGrouped]] KEYED by (grpCol, idCol) in the output — the
    * multi-membership shape: a doc may appear under SEVERAL group
    * values (e.g. scored under both a general and an in-domain model —
    * the Moore–Lewis pair as one chain) and each (group, doc) row is
    * that group's independent score. All counts and the final
    * fixed-point sum are keyed by the group column, so each group's
    * rows are bit-identical to [[scoreFp]] on that group's slices
    * alone whether memberships overlap or not (long sums are exact,
    * order-free).
    */
  def scoreFpGroupedKeyed(docs: DataFrame, train: DataFrame,
      idCol: String, textCol: String, grpCol: String): DataFrame = {
    val lnFp: Column => Column =
      c => floor(graft.functions.DetLog.lnInt(c) * LnScale).cast("long")
    def tokenized(df: DataFrame): DataFrame = df
      .select(col(grpCol), col(idCol),
        TextFunctions.tokens(col(textCol)).as("w"))
      .where(size(col("w")) > 0)
    val twTrain = tokenized(train)
    // per-group unigram table — pinned once for all groups
    val u = twTrain.select(col(grpCol), explode(col("w")).as("term"))
      .groupBy(grpCol, "term").agg(count(lit(1)).as("c1"))
      .localCheckpoint()
    val fpu = u.select(col(grpCol), col("term"), lnFp(col("c1")).as("fp1"))
    // per-group ln N — groups-sized, rides into the scans with the gate
    val fpn = u.groupBy(grpCol).agg(lnFp(sum(col("c1"))).as("fpn"))
      .localCheckpoint()
    val fpb = bigramPairsCols(twTrain, Seq(grpCol))
      .groupBy(grpCol, "w1", "w2").agg(count(lit(1)).as("c2"))
      .select(col(grpCol), col("w1"), col("w2"), lnFp(col("c2")).as("fp2"))
      .join(fpu.select(col(grpCol), col("term").as("w1"), col("fp1")),
        Seq(grpCol, "w1"))
      .select(col(grpCol), col("w1"), col("w2"),
        (col("fp2") - col("fp1")).as("fpseen"))
      .localCheckpoint()
    val small =
      vocabBroadcastOk(u.count(),
        vocabRowBytes(strCols = 2, numCols = 1)) &&
        vocabBroadcastOk(fpb.count(),
          vocabRowBytes(strCols = 3, numCols = 1))
    def gated(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    val tw = tokenized(docs)
    val sFirst = tw
      .select(col(grpCol), col(idCol), element_at(col("w"), 1).as("w1"))
      .join(gated(fpu.select(col(grpCol), col("term").as("w1"),
        col("fp1"))), Seq(grpCol, "w1"), "left")
      .join(broadcast(fpn), Seq(grpCol), "left")
      .select(col(grpCol), col(idCol),
        (coalesce(col("fp1"), lit(0L)) - col("fpn")).as("fp"))
    val sBigram = bigramPairsCols(tw, Seq(grpCol, idCol))
      .join(gated(fpu.select(col(grpCol), col("term").as("w2"),
        col("fp1").as("fp1b"))), Seq(grpCol, "w2"), "left")
      .join(gated(fpb), Seq(grpCol, "w1", "w2"), "left")
      .join(broadcast(fpn), Seq(grpCol), "left")
      .select(col(grpCol), col(idCol),
        when(col("fpseen").isNotNull, col("fpseen"))
          .otherwise(coalesce(col("fp1b"), lit(0L)) - col("fpn")
            + lit(AlphaFp)).as("fp"))
    val dl = tw.select(col(grpCol), col(idCol),
      size(col("w")).cast("long").as("n_tokens"))
    sFirst.unionByName(sBigram)
      .groupBy(col(grpCol), col(idCol))
      .agg(sum(col("fp")).as("sum_fp"))
      .join(dl, Seq(grpCol, idCol))
      .select(col(grpCol), col(idCol), col("n_tokens"), col("sum_fp"))
  }

  // ------------------------------------------------------------------
  // nearline model maintenance
  // ------------------------------------------------------------------

  /** Fold one micro-batch of training documents into the persisted LM
    * count model. The state is ONE atomically-swapped frame
    * (kind, w1, w2, c, last_batch): kind 'u' rows are unigram counts
    * (w2 empty), kind 'b' rows bigram counts — all additive integers,
    * so any batching folds to the identical model and the batch oracle
    * replays the streamed query exactly (the [[NaiveBayes.applyBatch]]
    * algebra). At-least-once delivery is absorbed by the batch-id
    * watermark INSIDE the swapped frame.
    */
  def applyBatch(s: org.apache.spark.sql.SparkSession, batch: DataFrame,
      idCol: String, textCol: String, batchId: Long,
      stateDir: String): Unit = {
    val applied = graft.io.ParquetUtil.lastBatch(s, stateDir)
    if (applied.exists(batchId <= _)) return
    val hasState = applied.isDefined
    val tw = batch
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("w"))
      .where(size(col("w")) > 0)
    val uPart = tw.select(explode(col("w")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c"))
      .select(lit("u").as("kind"), col("w1"), lit("").as("w2"), col("c"))
    val bPart = bigramPairs(tw, idCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      .select(lit("b").as("kind"), col("w1"), col("w2"), col("c"))
    val partial = uPart.unionByName(bPart)
    val merged =
      if (!hasState) partial
      else graft.io.ParquetUtil.readRecovered(s, stateDir)
        .drop("last_batch")
        .unionByName(partial)
        .groupBy("kind", "w1", "w2")
        .agg(sum(col("c")).as("c"))
    graft.io.ParquetUtil.safeOverwrite(s,
      merged.withColumn("last_batch", lit(batchId)), stateDir)
  }

  /** Score a corpus against the streamed count model, with the batch
    * rounding applied: (idCol, n_tokens, avg_logprob).
    */
  def scoreFromState(s: org.apache.spark.sql.SparkSession,
      docs: DataFrame, idCol: String, textCol: String, stateDir: String)
      : DataFrame = {
    val st = s.read.parquet(stateDir).drop("last_batch")
    scoreWithCounts(docs,
      st.where(col("kind") === "u")
        .select(col("w1").as("term"), col("c").as("c1")),
      st.where(col("kind") === "b")
        .select(col("w1"), col("w2"), col("c").as("c2")),
      idCol, textCol)
      .select(col(idCol), col("n_tokens"),
        round(col("sum_fp").cast("double") /
          (col("n_tokens").cast("double") * lit(LnScale.toDouble)), 6)
          .as("avg_logprob"))
  }
}
