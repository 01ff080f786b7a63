package graft

import graft.similarity.{KMeans, ProductQuantizer, StreamingIvfPq}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The streamed IVF×PQ index must answer exactly like the frozen-model
  * batch computation: both models (coarse centroids + PQ books) never
  * change after the bootstrap training, the postings append is the only
  * state write, and the vec_id anti-join makes it idempotent — so index
  * identity must hold under any batching and any replay.
  */
class StreamingIvfPqSpec extends SparkSpec {

  private val M = ProductQuantizer.NumSubspaces

  private lazy val emb: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))

  /** Bootstrap third of the corpus (the stream's batch-0 id-range
    * rule) and its frozen models.
    */
  private lazy val (centFp, books) = {
    val r = emb.agg(min(col("vec_id")), max(col("vec_id"))).collect()(0)
    val step = math.max(1L, (r.getLong(1) - r.getLong(0)) / 3 + 1)
    val b0 = emb.where(col("vec_id") < r.getLong(0) + step)
    val k = graft.queries.SimilarityQueries.ivfK(b0.count())
    val (c, _) = KMeans.fitModel(b0, "vec_id", "embedding", k,
      graft.queries.SimilarityQueries.IvfIters)
    (c, ProductQuantizer.trainBooks(b0, "vec_id", "embedding"))
  }

  /** Batch ground truth: frozen coarse cid + frozen codes of the whole
    * corpus.
    */
  private lazy val truth: Map[Long, Seq[Long]] = {
    val cids = KMeans.assign(
      KMeans.pointsFp(emb, "vec_id", "embedding"), centFp)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ProductQuantizer.assignCodes(emb, "vec_id", "embedding", books)
      .collect()
      .map(r => r.getLong(0) ->
        (cids(r.getLong(0)) +: (1 to M).map(r.getLong)))
      .toMap
  }

  /** Postings rows as (vec_id -> cid +: codes). */
  private def postings(dir: String): Map[Long, Seq[Long]] =
    spark.read.parquet(dir).collect()
      .map(r => r.getLong(0) -> (2 to M + 2).map(r.getLong))
      .toMap

  private def streamed(nBatches: Int): String = {
    val base = java.nio.file.Files
      .createTempDirectory(s"sivfpq_$nBatches").toString
    StreamingIvfPq.initState(spark, base + "/postings")
    val ids = emb.select("vec_id").collect().map(_.getLong(0)).sorted
    ids.grouped(math.max(1, ids.length / nBatches))
      .foreach { g =>
        StreamingIvfPq.applyFrozenBatch(spark,
          emb.where(col("vec_id").isin(g.toSeq: _*)), centFp, books,
          base + "/postings")
      }
    base + "/postings"
  }

  test("streamed cid+codes are identical to the frozen batch " +
    "assignment for any batching") {
    for (n <- Seq(1, 3)) {
      val got = postings(streamed(n))
      assert(got.keySet == truth.keySet, s"id set diverged at nBatches=$n")
      truth.foreach { case (id, row) =>
        assert(got(id) == row, s"postings of vec $id diverged at nBatches=$n")
      }
    }
  }

  test("replaying a batch (whole or partial) is a no-op") {
    val dir = streamed(3)
    val before = postings(dir)
    val ids = emb.select("vec_id").collect().map(_.getLong(0)).sorted
    val third = ids.take(ids.length / 3)
    StreamingIvfPq.applyFrozenBatch(spark,
      emb.where(col("vec_id").isin(third.toSeq: _*)), centFp, books, dir)
    val slice = ids.slice(ids.length / 4, ids.length / 2)
    StreamingIvfPq.applyFrozenBatch(spark,
      emb.where(col("vec_id").isin(slice.toSeq: _*)), centFp, books, dir)
    val after = postings(dir)
    assert(after == before, "replay must not change the postings")
    assert(spark.read.parquet(dir).count() == emb.count(),
      "every vector exactly once")
  }

  test("the streamed query tail equals the batch contract on the " +
    "drained postings") {
    val dir = streamed(3)
    val r = emb.agg(min(col("vec_id")), max(col("vec_id"))).collect()(0)
    val step = math.max(1L, (r.getLong(1) - r.getLong(0)) / 3 + 1)
    val kBoot = graft.queries.SimilarityQueries.ivfK(
      emb.where(col("vec_id") < r.getLong(0) + step).count())
    // rerank output must carry exact cosines descending per query with
    // rank 1..k — the q_ann_ivf_pq output contract
    val rows = graft.queries.SimilarityQueries.ivfPqSearchFromPostings(
      spark, spark.read.parquet(dir), centFp, books, kBoot)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      val byRank = rs.sortBy(_.getLong(3))
      assert(byRank.map(_.getLong(3)).toSeq == (1L to byRank.length))
      val cos = byRank.map(_.getDouble(2)).toSeq
      assert(cos == cos.sorted.reverse, s"query $qid not cosine-sorted")
    }
  }
}
