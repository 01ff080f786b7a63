package graft

import graft.text.NaiveBayes
import org.apache.spark.sql.functions._

/** Pins the streamed NB count fold's algebra: any batching folds to
  * the identical model (and therefore identical scores), and a
  * replayed batch id is a no-op — the additive-state crash contract.
  */
class NaiveBayesStreamSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "good clean data", "en"),
    (1L, "spam junk rows", "xx"),
    (2L, "good data table", "en"),
    (3L, "junk spam value", "xx"),
    (4L, "clean good value", "en"),
    (5L, "spam rows table", "xx"))
    .toDF("doc_id", "text", "lang")

  private def state(dir: String) =
    spark.read.parquet(dir).drop("last_batch")
      .orderBy("kind", "term")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSeq

  private def tmp() = java.nio.file.Files
    .createTempDirectory("nb_stream").toString + "/state"

  test("1-batch and 3-batch folds produce the identical model") {
    val one = tmp()
    NaiveBayes.applyBatch(spark, docs, "doc_id", "text",
      col("lang") === "en", 0L, one)
    val three = tmp()
    (0 until 3).foreach { b =>
      NaiveBayes.applyBatch(spark,
        docs.where(col("doc_id") % 3 === b), "doc_id", "text",
        col("lang") === "en", b.toLong, three)
    }
    assert(state(one) == state(three))
    // and the scores built from either state are identical
    val s1 = NaiveBayes.scoreFromState(spark, docs, "doc_id", "text", one)
      .orderBy("doc_id").collect().toSeq
    val s3 = NaiveBayes.scoreFromState(spark, docs, "doc_id", "text", three)
      .orderBy("doc_id").collect().toSeq
    assert(s1 == s3)
    // and they equal the batch operator's output
    val batch = NaiveBayes.scoreBinary(docs, docs, "doc_id", "text",
      col("lang") === "en").orderBy("doc_id").collect().toSeq
    assert(s1 == batch)
  }

  test("crash mid-swap: replay folds the batch exactly once") {
    val dir = tmp()
    NaiveBayes.applyBatch(spark, docs.where(col("doc_id") < 2),
      "doc_id", "text", col("lang") === "en", 0L, dir)
    // clean reference: both batches applied without any crash
    val ref = tmp()
    NaiveBayes.applyBatch(spark, docs.where(col("doc_id") < 2),
      "doc_id", "text", col("lang") === "en", 0L, ref)
    NaiveBayes.applyBatch(spark, docs.where(col("doc_id") >= 2),
      "doc_id", "text", col("lang") === "en", 1L, ref)
    // crash inside batch 1's state swap (state moved aside, staging
    // unpromoted), then replay: must equal the clean run — the
    // watermark lives INSIDE the swapped frame, so recovery and the
    // idempotence guard agree
    graft.io.ParquetUtil.crashPoint = Some("mid-swap")
    intercept[RuntimeException] {
      NaiveBayes.applyBatch(spark, docs.where(col("doc_id") >= 2),
        "doc_id", "text", col("lang") === "en", 1L, dir)
    }
    NaiveBayes.applyBatch(spark, docs.where(col("doc_id") >= 2),
      "doc_id", "text", col("lang") === "en", 1L, dir)
    assert(state(dir) == state(ref))
  }

  test("replayed batch id is a no-op; empty batch folds harmlessly") {
    val dir = tmp()
    NaiveBayes.applyBatch(spark, docs.where(col("doc_id") < 3),
      "doc_id", "text", col("lang") === "en", 0L, dir)
    val after0 = state(dir)
    // at-least-once delivery: the same batch id must not double counts
    NaiveBayes.applyBatch(spark, docs.where(col("doc_id") < 3),
      "doc_id", "text", col("lang") === "en", 0L, dir)
    assert(state(dir) == after0)
    // an empty micro-batch advances the watermark without corrupting
    NaiveBayes.applyBatch(spark, docs.where(lit(false)),
      "doc_id", "text", col("lang") === "en", 1L, dir)
    val afterEmpty = state(dir)
    assert(afterEmpty.filter(_._1 == "t") == after0.filter(_._1 == "t"))
    assert(afterEmpty.find(_._1 == "d") == after0.find(_._1 == "d"))
  }
}
