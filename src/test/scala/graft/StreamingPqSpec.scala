package graft

import graft.similarity.{ProductQuantizer, StreamingPq}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The streamed PQ index must answer exactly like the frozen-book
  * batch computation: the quantizer never changes after the bootstrap
  * training, the postings append is the only state write, and the
  * vec_id anti-join makes it idempotent — so model identity must hold
  * under any batching and any replay.
  */
class StreamingPqSpec extends SparkSpec {

  private val M = ProductQuantizer.NumSubspaces

  private lazy val emb: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))

  /** Bootstrap third of the corpus (the stream's batch-0 id-range
    * rule) and its frozen books.
    */
  private lazy val books: Seq[DataFrame] = {
    val r = emb.agg(min(col("vec_id")), max(col("vec_id"))).collect()(0)
    val step = math.max(1L, (r.getLong(1) - r.getLong(0)) / 3 + 1)
    ProductQuantizer.trainBooks(
      emb.where(col("vec_id") < r.getLong(0) + step), "vec_id", "embedding")
  }

  /** Batch ground truth: frozen-book codes of the whole corpus. */
  private lazy val truth: Map[Long, Seq[Long]] =
    ProductQuantizer.assignCodes(emb, "vec_id", "embedding", books)
      .collect()
      .map(r => r.getLong(0) -> (1 to M).map(r.getLong))
      .toMap

  private def postingsCodes(dir: String): Map[Long, Seq[Long]] =
    spark.read.parquet(dir).collect()
      .map(r => r.getLong(0) -> (2 to M + 1).map(r.getLong))
      .toMap

  private def streamed(nBatches: Int): String = {
    val base = java.nio.file.Files
      .createTempDirectory(s"spq_$nBatches").toString
    StreamingPq.initState(spark, base + "/postings")
    val ids = emb.select("vec_id").collect().map(_.getLong(0)).sorted
    ids.grouped(math.max(1, ids.length / nBatches))
      .foreach { g =>
        StreamingPq.applyFrozenBatch(spark,
          emb.where(col("vec_id").isin(g.toSeq: _*)), books,
          base + "/postings")
      }
    base + "/postings"
  }

  test("streamed codes are identical to the frozen batch assignment " +
    "for any batching") {
    for (n <- Seq(1, 3, 7)) {
      val got = postingsCodes(streamed(n))
      assert(got.keySet == truth.keySet, s"id set diverged at nBatches=$n")
      truth.foreach { case (id, codes) =>
        assert(got(id) == codes, s"codes of vec $id diverged at nBatches=$n")
      }
    }
  }

  test("replaying a batch (whole or partial) is a no-op") {
    val dir = streamed(3)
    val before = postingsCodes(dir)
    val ids = emb.select("vec_id").collect().map(_.getLong(0)).sorted
    // whole-batch replay: the first third again
    val third = ids.take(ids.length / 3)
    StreamingPq.applyFrozenBatch(spark,
      emb.where(col("vec_id").isin(third.toSeq: _*)), books, dir)
    // partial replay: an arbitrary slice spanning two original batches
    val slice = ids.slice(ids.length / 4, ids.length / 2)
    StreamingPq.applyFrozenBatch(spark,
      emb.where(col("vec_id").isin(slice.toSeq: _*)), books, dir)
    val after = postingsCodes(dir)
    assert(after == before, "replay must not change the postings")
    assert(spark.read.parquet(dir).count() == emb.count(),
      "every vector exactly once")
  }

  test("the streamed query tail equals the batch contract on the " +
    "drained postings") {
    val dir = streamed(3)
    // positions: rerank output must carry exact cosines descending per
    // query with rank 1..k — the q_ann_pq output contract
    val rows = graft.queries.SimilarityQueries.pqSearchFromPostings(
      spark, spark.read.parquet(dir), books)
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
