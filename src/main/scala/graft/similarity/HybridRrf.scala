package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid lexical + vector retrieval fused by Reciprocal Rank Fusion
  * (Cormack et al. 2009): each query's BM25 ranking and cosine-ANN
  * ranking combine as sum(1 / (k0 + rank)), the standard first-stage
  * retriever a curation/RAG pipeline runs over a corpus that carries
  * both text and embeddings. Extension category (no reference
  * counterpart).
  *
  * Determinism: BM25 scores are 2^-20 fixed-point integer sums
  * ([[graft.text.Bm25]] — DetLog idf, no libm); cosine is the
  * engine-mirrored float fold; both rankings are row_numbers with
  * doc_id tie-breaks; and the fused score is a sum of two exact IEEE
  * divisions of integers — every stage replays bit-identically in the
  * DuckDB oracle.
  *
  * Scale shape: the lexical side is the BM25 shape — one corpus-sized
  * doc-length agg, one (doc, query-term) tf agg pre-pruned by a
  * broadcast of the query-term set, output-sized df/totals frames
  * broadcast back, then a per-query top-k window partitioned by qid.
  * The vector side is the q_ann_brute shape — query vectors collected
  * as PARAMETERS and exploded as literals against the scan (no
  * crossJoin). The fusion joins two (queries × k)-sized rank lists on
  * (qid, doc_id) — tiny at any corpus scale.
  */
object HybridRrf {

  /** RRF dampening constant (Cormack et al.'s k = 60). */
  val RrfK = 60.0

  /** Tokens of each query document used as its bag-of-terms query. */
  val QueryTerms = 8

  /** Depth of each per-system ranking fed into the fusion. */
  val KEach = 50

  /** The corpus a hybrid retriever runs over: items carrying BOTH
    * modalities — `docs`(idCol, textCol) inner-joined with
    * `emb`(idCol, vecCol) on id.
    */
  def corpusOf(docs: DataFrame, emb: DataFrame, idCol: String,
      textCol: String, vecCol: String): DataFrame =
    docs.select(col(idCol), col(textCol))
      .join(emb.select(col(idCol), col(vecCol)), idCol)

  /** The lexical BM25 leg: (qid, idCol, r1 ≤ [[KEach]]) — each query
    * document's first [[QueryTerms]] distinct tokens as its
    * bag-of-terms query, scored with the q_bm25 fixed-point
    * contribution, ranked per query with doc-id tie-break.
    */
  def lexicalLeg(corpus: DataFrame, idCol: String, textCol: String,
      numQueries: Int): DataFrame = {
    import graft.text.Bm25.{B, K1, K1Plus1, OneMinusB, Scale}
    // token array materialised as its own column (inlining tokens()
    // into per-element lambdas re-tokenises per element)
    val tw = corpus.select(col(idCol),
      graft.text.TextFunctions.tokens(col(textCol)).as("w"))
    val qt = tw.where(col(idCol) < numQueries)
      .select(col(idCol).as("qid"),
        explode(array_distinct(slice(col("w"), lit(1), lit(QueryTerms))))
          .as("term"))
    val toks = tw.select(col(idCol), explode(col("w")).as("term"))
    val dl = toks.groupBy(idCol).agg(count(lit(1)).as("dl"))
    val totals = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot"))
    val tf = toks.join(broadcast(qt.select("term").distinct()), "term")
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // the q_bm25 contribution, token for token (fixed-point snap
    // BEFORE the per-doc sum)
    val idf = graft.functions.DetLog.lnRatio(
      col("n_docs") * 2 - col("df") * 2 + 1, col("df") * 2 + 1)
    val den = col("tf").cast("double") + lit(K1) *
      (lit(OneMinusB) + lit(B) * col("dl").cast("double") *
        col("n_docs").cast("double") / col("tot").cast("double"))
    val contrib = floor(
      idf * (col("tf").cast("double") * lit(K1Plus1)) / den *
        lit(Scale.toDouble)).cast("long")
    val perDocTerm = tf.join(broadcast(dfq), "term")
      .join(dl, idCol)
      .crossJoin(broadcast(totals))
      .select(col(idCol), col("term"), contrib.as("c"))
    val r1w = row_number().over(
      Window.partitionBy("qid").orderBy(col("score_fp").desc, col(idCol)))
    perDocTerm.join(broadcast(qt), "term")
      .where(col(idCol) =!= col("qid"))
      .groupBy(col("qid"), col(idCol))
      .agg(sum(col("c")).as("score_fp"))
      .withColumn("r1", r1w.cast("bigint"))
      .where(col("r1") <= KEach)
      .select(col("qid"), col(idCol), col("r1"))
  }

  /** Fuse two per-query rank lists `lex`(qid, idCol, r1) and
    * `vec`(qid, idCol, r2): rrf = Σ 1/(k0 + rank) with absent-system
    * terms 0, ranked on the UNROUNDED score with doc-id tie-break,
    * rounded for output. Output: (qid, idCol, rrf_score, rank ≤ topK).
    */
  def fuseRanked(lex: DataFrame, vec: DataFrame, idCol: String,
      topK: Int): DataFrame = {
    // fuse: two exact divisions of integers, summed lexical-first in
    // both engines
    val rrf =
      coalesce(lit(1.0) / (lit(RrfK) + col("r1").cast("double")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(RrfK) + col("r2").cast("double")), lit(0.0))
    val rankW = row_number().over(
      Window.partitionBy("qid").orderBy(col("rrf").desc, col(idCol)))
    lex.join(vec, Seq("qid", idCol), "full")
      .withColumn("rrf", rrf)
      .withColumn("rank", rankW.cast("bigint"))
      .where(col("rank") <= topK)
      .select(col("qid"), col(idCol), round(col("rrf"), 6).as("rrf_score"),
        col("rank"))
      .orderBy("qid", "rank")
  }

  /** (qid, doc_id, rrf_score, rank): top-`topK` fused results per
    * query. `docs` carries (idCol, textCol); `emb` carries
    * (idCol, vecCol); the corpus is their inner join on id — items
    * with both modalities. The first `numQueries` ids are the queries
    * (scored against everything but themselves). The vector leg here
    * is the EXACT brute cosine (the q_ann_brute literal-parameter
    * shape); the production deployment swaps in the trained-IVF probe
    * — see q_hybrid_rrf_ivf in
    * [[graft.queries.SimilarityQueries]], which reuses [[lexicalLeg]]
    * and [[fuseRanked]] around the probed leg.
    */
  def fuse(s: SparkSession, docs: DataFrame, emb: DataFrame,
      idCol: String, textCol: String, vecCol: String,
      numQueries: Int, topK: Int): DataFrame = {
    val corpus = corpusOf(docs, emb, idCol, textCol, vecCol)
    val lex = lexicalLeg(corpus, idCol, textCol, numQueries)
    // vector side: query vectors collected as parameters (the
    // q_ann_brute plan shape — scan → generate → window, no crossJoin)
    val qRows = corpus.where(col(idCol) < numQueries)
      .select(col(idCol), col(vecCol)).orderBy(idCol).collect()
    val qLit = array(qRows.map { r =>
      struct(lit(r.getLong(0)).as("qid"),
        array(r.getSeq[Float](1).map(f => lit(f)): _*).as("qv"))
    }: _*)
    val r2w = row_number().over(
      Window.partitionBy("qid").orderBy(col("cosine").desc, col(idCol)))
    val vec = corpus.select(col(idCol), col(vecCol), explode(qLit).as("p"))
      .select(col("p.qid").as("qid"), col(idCol), col(vecCol),
        col("p.qv").as("qv"))
      .where(col("qid") =!= col(idCol))
      .withColumn("cosine",
        graft.functions.GraftFunctions.cosineSim(s, col("qv"), col(vecCol)))
      .withColumn("r2", r2w.cast("bigint"))
      .where(col("r2") <= KEach)
      .select(col("qid"), col(idCol), col("r2"))
    fuseRanked(lex, vec, idCol, topK)
  }
}
