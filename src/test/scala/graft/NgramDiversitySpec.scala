package graft

import graft.text.NgramDiversity
import org.apache.spark.sql.functions._

/** Streamed n-gram diversity fold (text/NgramDiversity.scala): the
  * additive (source, n, gram, c) counter algebra under the batch-id
  * watermark — batch-count invariance, replay no-op, empty batches.
  */
class NgramDiversitySpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "srcA", "alpha beta gamma alpha beta"),
    (1L, "srcA", "alpha beta gamma"),
    (2L, "srcB", "one two one two one two"),
    (3L, "srcB", "three"),
    (4L, "srcA", ""),
    (5L, "srcB", "one two three four"))
    .toDF("doc_id", "source", "text")

  private def collectDiv(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getInt(1)) ->
      (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap

  test("rollup: exact type/token ratios, empty docs contribute nothing") {
    val got = collectDiv(NgramDiversity.rollup(
      NgramDiversity.gramCounts(docs)))
    // srcA unigrams: 5 + 3 + 0 = 8 total, {alpha, beta, gamma} distinct
    assert(got(("srcA", 1)) == (8L, 3L, 3.0 / 8.0))
    // srcB trigrams: 4 + 0 + 2 = 6 total; "one two one", "two one two",
    // "one two three", "two three four" distinct
    assert(got(("srcB", 3)) == (6L, 4L, 4.0 / 6.0))
  }

  test("streamed fold: batch-count invariance, replay, empty batch") {
    val truth = collectDiv(NgramDiversity.rollup(
      NgramDiversity.gramCounts(docs)))
    for (nBatches <- Seq(1, 3)) {
      val stateDir = java.nio.file.Files
        .createTempDirectory(s"ndiv_$nBatches").toString + "/state"
      val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted
      var bid = 0L
      ids.grouped(math.max(1, ids.length / nBatches)).foreach { g =>
        NgramDiversity.applyBatch(spark,
          docs.where(col("doc_id").isin(g.toSeq: _*)), bid, stateDir)
        bid += 1
      }
      // replayed batch id is a no-op (watermark)
      NgramDiversity.applyBatch(spark, docs, bid - 1, stateDir)
      // empty batch folds nothing
      NgramDiversity.applyBatch(spark, docs.where(lit(false)), bid,
        stateDir)
      val got = collectDiv(
        NgramDiversity.diversityFromState(spark, stateDir))
      assert(got == truth, s"nBatches=$nBatches")
    }
  }

  test("delta-append state: compaction preserves totals and bounds the pile") {
    val truth = collectDiv(NgramDiversity.rollup(
      NgramDiversity.gramCounts(docs)))
    val stateDir = java.nio.file.Files
      .createTempDirectory("ndiv_compact").toString + "/state"
    // one doc per batch, compaction every 2 batches
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    ids.zipWithIndex.foreach { case (id, bid) =>
      NgramDiversity.applyBatch(spark,
        docs.where(col("doc_id") === id), bid.toLong, stateDir,
        compactEvery = 2)
    }
    assert(collectDiv(
      NgramDiversity.diversityFromState(spark, stateDir)) == truth)
    // 6 batches, compactions at bid 1/3/5: the last batch compacted, so
    // the state holds exactly one row per distinct (source, n, gram) —
    // the pile was actually merged, not just readable
    val state = spark.read.parquet(stateDir)
    assert(state.count() ===
      state.select("source", "n", "gram").distinct().count())
    // and every row carries the final watermark
    assert(state.select(min("last_batch")).head.getLong(0) === 5L)
  }

  test("delta-append state: crash windows replay to exact totals") {
    val truth = collectDiv(NgramDiversity.rollup(
      NgramDiversity.gramCounts(docs)))
    val batches = Seq(Seq(0L, 1L), Seq(2L, 3L), Seq(4L, 5L))
    // a committed-but-unacknowledged append must be rolled back and
    // re-applied, not double-counted and not dropped
    for (window <- Seq("pending-recorded", "after-append")) {
      val stateDir = java.nio.file.Files
        .createTempDirectory(s"ndiv_$window").toString + "/state"
      NgramDiversity.applyBatch(spark,
        docs.where(col("doc_id").isin(batches(0): _*)), 0L, stateDir)
      graft.io.ParquetUtil.crashPoint = Some(window)
      intercept[RuntimeException] {
        NgramDiversity.applyBatch(spark,
          docs.where(col("doc_id").isin(batches(1): _*)), 1L, stateDir)
      }
      // scheduler retry of the crashed batch, then the rest
      NgramDiversity.applyBatch(spark,
        docs.where(col("doc_id").isin(batches(1): _*)), 1L, stateDir)
      NgramDiversity.applyBatch(spark,
        docs.where(col("doc_id").isin(batches(2): _*)), 2L, stateDir)
      assert(collectDiv(NgramDiversity.diversityFromState(spark, stateDir))
        == truth, s"window=$window")
    }
  }
}
