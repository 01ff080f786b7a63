package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over the document corpus — the lexical search
  * scorer (k1/b Robertson weighting) a curation pipeline uses to mine
  * topic-relevant training data. Extension category.
  *
  * Determinism: every input to the per-(doc, term) contribution is an
  * exact integer (tf, df, dl, N, total tokens), the double expression is
  * written with IDENTICAL association on both engines, and the result is
  * snapped to 2^-20 fixed point BEFORE the per-doc sum — so document
  * scores are integer sums, bit-identical under any partitioning, and an
  * oracle replays the ranking exactly. The idf log runs through
  * [[graft.functions.DetLog]] (ladder + artanh series over the integer
  * ratio (2N-2df+1)/(2df+1)), so no libm ln() remains in either
  * engine's plan — the former ln()-ULP caveat is gone.
  *
  * Scale shape: the corpus contributes one combine-reduced doc-length
  * aggregation and one (doc, query-term) tf aggregation pre-filtered to
  * the query's terms (the `isin` prunes at the scan); df and the corpus
  * totals are output-sized frames that broadcast back via 1-row / tiny
  * cross joins. Top-k plans TakeOrderedAndProject — per-partition heaps,
  * no global sort.
  */
object Bm25 {

  val Scale = 1048576L // 2^20
  val K1 = 1.2
  /** Written as its own literal, NOT `K1 + 1`: the runtime sum
    * 1.2 + 1.0 rounds differently from the parsed literal 2.2, and the
    * oracle parses literals.
    */
  val K1Plus1 = 2.2
  val B = 0.75
  val OneMinusB = 0.25

  /** Top-k documents for a bag-of-terms query. Output:
    * (idCol, score_fp, score) ordered by (score_fp desc, id).
    */
  def topK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int): DataFrame = {
    require(queryTerms.nonEmpty && k >= 1, "need query terms and k >= 1")
    val toks = docs.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    val dl = toks.groupBy(idCol).agg(count(lit(1)).as("dl"))
    val tf = toks.where(col("term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    topKFrom(dl, tf, idCol, k)
  }

  /** The scoring tail over the model tables — the seam the nearline
    * fold shares with the batch path (the [[BigramLm.scoreWithCounts]]
    * convention), so the streamed query's oracle IS the batch oracle.
    * `dl`: (idCol, dl) per-document lengths; `tf`: (idCol, term, tf)
    * query-term frequencies. df and the corpus totals derive here —
    * output-sized frames that broadcast back.
    */
  def topKFrom(dl: DataFrame, tf: DataFrame, idCol: String, k: Int)
      : DataFrame = {
    val totals = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("tot"))
    val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nd: Column = col("n_docs").cast("double")
    // association mirrors the oracle SQL token for token; the idf
    // argument (N - df + 0.5)/(df + 0.5) = (2N-2df+1)/(2df+1) exactly,
    // a ratio of integers — deterministic log, no libm
    val idf = graft.functions.DetLog.lnRatio(
      col("n_docs") * 2 - col("df") * 2 + 1, col("df") * 2 + 1)
    val den = col("tf").cast("double") + lit(K1) *
      (lit(OneMinusB) + lit(B) * col("dl").cast("double") * nd /
        col("tot").cast("double"))
    val contrib = floor(
      idf * (col("tf").cast("double") * lit(K1Plus1)) / den *
        lit(Scale.toDouble)).cast("long")
    tf.join(broadcast(dfq), "term")
      .join(dl, idCol)
      .crossJoin(broadcast(totals))
      .select(col(idCol), contrib.as("c"))
      .groupBy(idCol)
      .agg(sum(col("c")).as("score_fp"))
      .withColumn("score", col("score_fp").cast("double") / Scale.toDouble)
      .orderBy(col("score_fp").desc, col(idCol))
      .limit(k)
  }

  // ------------------------------------------------------------------
  // nearline: the BM25 statistics maintained across micro-batches —
  // the LEXICAL leg of the amortized hybrid (the vector leg's
  // StreamingIvf/Pq/IvfPq siblings)
  // ------------------------------------------------------------------

  /** Initialise the empty streaming state: the per-document length
    * table and the (doc, query-term) frequency table.
    */
  def initState(s: org.apache.spark.sql.SparkSession, idCol: String,
      dlDir: String, tfDir: String): Unit = {
    import org.apache.spark.sql.types._
    val empty = (schema: StructType) => s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    empty(StructType(Seq(StructField(idCol, LongType),
      StructField("dl", LongType))))
      .write.mode("overwrite").parquet(dlDir)
    empty(StructType(Seq(StructField(idCol, LongType),
      StructField("term", StringType), StructField("tf", LongType))))
      .write.mode("overwrite").parquet(tfDir)
  }

  /** Fold one micro-batch of documents: per-doc token length and
    * query-term frequencies append under the doc-id anti-join (every
    * document contributes its rows exactly once — nothing merges
    * across batches, the StreamingIvf append-only contract, so the
    * folded tables equal the batch `dl`/`tf` under ANY batching).
    *
    * Crash contract (the [[LineDedup.applyLineBatch]] order): the tf
    * rows append FIRST under their own doc-id anti-join, the dl rows
    * (the replay guard) append LAST — a crash between the appends
    * replays into recomputing the batch, whose tf rows the tf-side
    * anti-join drops, and the dl append completes.
    *
    * Per-batch cost: one batch-sized tokenize/agg + two appends; the
    * tf probe is query-term-pruned at the scan.
    */
  def applyBatch(s: org.apache.spark.sql.SparkSession, b: DataFrame,
      idCol: String, textCol: String, queryTerms: Seq[String],
      dlDir: String, tfDir: String): Unit = {
    val dlState = s.read.parquet(dlDir)
    val fresh = b.join(dlState.select(idCol), Seq(idCol), "left_anti")
      .localCheckpoint()
    val toks = fresh.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    val tfNew = toks.where(col("term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .join(s.read.parquet(tfDir).select(idCol).distinct(),
        Seq(idCol), "left_anti")
    tfNew.write.mode("append").parquet(tfDir)
    toks.groupBy(idCol).agg(count(lit(1)).as("dl"))
      .write.mode("append").parquet(dlDir)
    ()
  }

  /** The ranked top-k off the folded state — equals the batch [[topK]]
    * exactly (both state tables equal their batch counterparts).
    */
  def topKFromState(s: org.apache.spark.sql.SparkSession, idCol: String,
      dlDir: String, tfDir: String, k: Int): DataFrame =
    topKFrom(s.read.parquet(dlDir), s.read.parquet(tfDir), idCol, k)
}
