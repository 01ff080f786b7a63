package graft

import graft.dedup.SpanDedup
import graft.text.Dsir
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The streamed span-dedup index and DSIR bucket table must reproduce
  * their batch computations EXACTLY — for any partitioning of the stream
  * into micro-batches, and idempotently under at-least-once replay.
  */
class StreamSpanDsirSpec extends SparkSpec {
  import spark.implicits._

  /** Corpus with cross-doc shared runs, within-doc repetition, and
    * clean docs; ids fixed so ground truth is stable.
    */
  private lazy val docs: DataFrame = {
    def gram(n: Int, tag: String) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val run1 = gram(12, "s")
    val run2 = gram(10, "q")
    Seq(
      1L -> s"$run1 ${gram(6, "a")}",
      2L -> s"${gram(4, "b")} $run1",
      3L -> s"$run2 ${gram(5, "c")} $run2",
      4L -> gram(15, "d"),
      5L -> s"${gram(3, "e")} $run2",
      6L -> gram(9, "f")).toDF("doc_id", "text")
  }

  private def stats(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getDouble(4))).toSet

  private def streamSpan(nBatches: Int): (String, DataFrame) = {
    val base = java.nio.file.Files
      .createTempDirectory(s"sspan_$nBatches").toString
    val indexDir = base + "/gram_index"
    val dupDir = base + "/dup_occ"
    SpanDedup.initState(spark, indexDir, dupDir)
    // deterministic id-ordered batch split, applied sequentially —
    // foreachBatch semantics without the streaming harness
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    ids.grouped(math.max(1, ids.length / nBatches)).foreach { g =>
      SpanDedup.applyBatch(spark,
        docs.where(col("doc_id").isin(g.toSeq: _*)), "text", "doc_id",
        indexDir, dupDir)
    }
    (base,
      SpanDedup.statsFromState(spark, docs, "text", "doc_id", dupDir))
  }

  test("streamed span stats are batch-count invariant and equal batch") {
    val truth = stats(SpanDedup.spanStats(docs, "text", "doc_id"))
    assert(truth.exists(_._3 > 0), "corpus must contain duplicated spans")
    for (n <- Seq(1, 2, 6)) {
      val (_, got) = streamSpan(n)
      assert(stats(got) == truth,
        s"span stats diverged from batch ground truth at nBatches=$n")
    }
  }

  test("replayed span batch is a no-op (at-least-once delivery)") {
    val (base, _) = streamSpan(3)
    val (dupBefore, idxBefore) = (
      spark.read.parquet(base + "/dup_occ").count(),
      spark.read.parquet(base + "/gram_index").count())
    // re-deliver the ENTIRE corpus: the already-indexed guard must
    // drop everything before any matching
    SpanDedup.applyBatch(spark, docs, "text", "doc_id",
      base + "/gram_index", base + "/dup_occ")
    assert(spark.read.parquet(base + "/dup_occ").count() == dupBefore)
    assert(spark.read.parquet(base + "/gram_index").count() == idxBefore)
  }

  // ---- DSIR streaming ----------------------------------------------------

  private lazy val langDocs: DataFrame = (1L to 24L).map { i =>
    (i, s"tok${i % 5} tok${i % 3} common tok${i % 7}",
      if (i % 2 == 0) "en" else "zz")
  }.toDF("doc_id", "text", "lang")

  private def weights(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
      r.getBoolean(3))).toSet

  private def streamDsir(nBatches: Int): (String, DataFrame) = {
    val base = java.nio.file.Files
      .createTempDirectory(s"sdsir_$nBatches").toString
    val stateDir = base + "/state"
    val ids = langDocs.select("doc_id").collect().map(_.getLong(0)).sorted
    ids.grouped(math.max(1, ids.length / nBatches)).zipWithIndex
      .foreach { case (g, i) =>
        Dsir.applyBatch(spark,
          langDocs.where(col("doc_id").isin(g.toSeq: _*)),
          "doc_id", "text", col("lang") === "en", i.toLong, stateDir)
      }
    (base, Dsir.weightsFromState(spark, langDocs, "doc_id", "text",
      col("lang") === "en", stateDir))
  }

  test("streamed DSIR weights are batch-count invariant and equal batch") {
    val truth = weights(Dsir.importanceWeights(langDocs, "doc_id",
      "text", col("lang") === "en"))
    for (n <- Seq(1, 3, 8)) {
      val (_, got) = streamDsir(n)
      assert(weights(got) == truth,
        s"DSIR weights diverged from batch ground truth at nBatches=$n")
    }
  }

  test("empty first DSIR micro-batch does not wedge the stream") {
    val truth = weights(Dsir.importanceWeights(langDocs, "doc_id",
      "text", col("lang") === "en"))
    val base = java.nio.file.Files.createTempDirectory("sdsir_empty").toString
    // an empty batch leaves a zero-row state frame whose max(last_batch)
    // is SQL-null — subsequent batches must treat it as "nothing applied"
    Dsir.applyBatch(spark, langDocs.where(lit(false)), "doc_id", "text",
      col("lang") === "en", 0L, base + "/state")
    Dsir.applyBatch(spark, langDocs, "doc_id", "text",
      col("lang") === "en", 1L, base + "/state")
    val got = weights(Dsir.weightsFromState(spark, langDocs, "doc_id",
      "text", col("lang") === "en", base + "/state"))
    assert(got == truth)
  }

  test("replayed DSIR batch is a no-op (batch-id watermark)") {
    val (base, got) = streamDsir(3)
    val before = weights(got)
    // re-deliver batch 0 (stale id): the watermark must reject it
    Dsir.applyBatch(spark, langDocs, "doc_id", "text",
      col("lang") === "en", 0L, base + "/state")
    val after = weights(Dsir.weightsFromState(spark, langDocs, "doc_id",
      "text", col("lang") === "en", base + "/state"))
    assert(after == before)
  }
}
