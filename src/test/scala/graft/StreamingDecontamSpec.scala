package graft

import graft.queries.SimilarityQueries
import graft.similarity.StreamingDecontam
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The streamed semantic-decontamination postings must answer exactly
  * like the batch cross-split screen: the eval set is frozen, the
  * postings append is the only state write, and the vec_id anti-join
  * makes it idempotent — so the scored table must be identical under
  * any batching and any replay.
  */
class StreamingDecontamSpec extends SparkSpec {

  private lazy val emb: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))

  private lazy val eval: Seq[Seq[Float]] =
    emb.where(col("vec_id") < SimilarityQueries.EvalVecs)
      .orderBy("vec_id").collect().map(_.getSeq[Float](1)).toSeq

  private lazy val train: DataFrame =
    emb.where(col("vec_id") >= SimilarityQueries.EvalVecs)

  /** Batch ground truth: one-shot scoring of the whole train split. */
  private lazy val truth: Map[Long, (Double, Boolean)] =
    train.select(col("vec_id"),
      StreamingDecontam.maxEvalCos(spark, eval, col("embedding"))
        .as("c"))
      .withColumn("f", col("c") >= SimilarityQueries.ContamTau)
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2))))
      .toMap

  private def stateOf(dir: String): Map[Long, (Double, Boolean)] =
    spark.read.parquet(dir).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2))))
      .toMap

  private def streamed(nBatches: Int): String = {
    val base = java.nio.file.Files
      .createTempDirectory(s"sdec_$nBatches").toString
    StreamingDecontam.initState(spark, base + "/state")
    val ids = train.select("vec_id").collect().map(_.getLong(0)).sorted
    ids.grouped(math.max(1, ids.length / nBatches)).foreach { g =>
      StreamingDecontam.applyBatch(spark,
        train.where(col("vec_id").isin(g.toSeq: _*)), eval,
        SimilarityQueries.ContamTau, base + "/state")
    }
    base + "/state"
  }

  test("streamed scores are identical to the batch screen for any " +
    "batching") {
    for (n <- Seq(1, 3, 7)) {
      assert(stateOf(streamed(n)) === truth, s"nBatches=$n")
    }
  }

  test("replaying a batch is a no-op (vec_id anti-join idempotence)") {
    val dir = streamed(3)
    val before = stateOf(dir)
    // whole-corpus replay: every id already in state must drop out
    StreamingDecontam.applyBatch(spark, train, eval,
      SimilarityQueries.ContamTau, dir)
    assert(stateOf(dir) === before)
    assert(spark.read.parquet(dir).count() === before.size)
  }

  test("an empty batch leaves the state untouched") {
    val dir = streamed(1)
    val before = stateOf(dir)
    StreamingDecontam.applyBatch(spark, train.limit(0), eval,
      SimilarityQueries.ContamTau, dir)
    assert(stateOf(dir) === before)
  }
}
