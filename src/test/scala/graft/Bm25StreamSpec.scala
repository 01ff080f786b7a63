package graft

import graft.text.Bm25
import org.apache.spark.sql.functions._

/** Nearline BM25 fold (text/Bm25.scala): the per-doc length and
  * query-term frequency tables are append-only under the doc-id
  * anti-join, so the folded ranking equals the batch [[Bm25.topK]]
  * under any batching; replay and the between-appends crash window
  * heal exactly.
  */
class Bm25StreamSpec extends SparkSpec {
  import spark.implicits._

  private val terms = Seq("alpha", "beta")
  private lazy val docs = (0L until 40L).map { i =>
    val extra = if (i % 3 == 0) " alpha alpha" else ""
    val beta = if (i % 5 == 0) " beta" else ""
    (i, s"word$i filler common text$extra$beta")
  }.toDF("doc_id", "text")

  private def collectTopK(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  private def truth = collectTopK(
    Bm25.topK(docs, "doc_id", "text", terms, k = 10))

  test("streamed fold: batch-count invariance, replay no-op") {
    for (nBatches <- Seq(1, 4)) {
      val base = java.nio.file.Files
        .createTempDirectory(s"sbm_$nBatches").toString
      val (dlDir, tfDir) = (base + "/dl", base + "/tf")
      Bm25.initState(spark, "doc_id", dlDir, tfDir)
      val step = math.max(1, 40 / nBatches)
      (0 until nBatches).foreach { i =>
        val hi = if (i == nBatches - 1) 40L else (i + 1L) * step
        Bm25.applyBatch(spark,
          docs.where(col("doc_id") >= i.toLong * step &&
            col("doc_id") < hi),
          "doc_id", "text", terms, dlDir, tfDir)
      }
      // whole-corpus replay is a no-op (dl anti-join guard)
      Bm25.applyBatch(spark, docs, "doc_id", "text", terms, dlDir, tfDir)
      assert(collectTopK(Bm25.topKFromState(
        spark, "doc_id", dlDir, tfDir, k = 10)) == truth,
        s"nBatches=$nBatches")
      assert(spark.read.parquet(dlDir).count() === 40L)
    }
  }

  test("crash between the tf and dl appends replays to the " +
      "fully-applied state (no doubled tf rows)") {
    val base = java.nio.file.Files.createTempDirectory("sbm_crash")
      .toString
    val (dlDir, tfDir) = (base + "/dl", base + "/tf")
    Bm25.initState(spark, "doc_id", dlDir, tfDir)
    Bm25.applyBatch(spark, docs.where(col("doc_id") < 20),
      "doc_id", "text", terms, dlDir, tfDir)
    // simulate the kill window: apply the second batch's tf append
    // only (what a crash after the first append leaves behind)
    val b2 = docs.where(col("doc_id") >= 20)
    val toks = b2.select(col("doc_id"),
      explode(graft.text.TextFunctions.tokens(col("text"))).as("term"))
    toks.where(col("term").isin(terms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .write.mode("append").parquet(tfDir)
    // scheduler retry of the whole batch
    Bm25.applyBatch(spark, b2, "doc_id", "text", terms, dlDir, tfDir)
    assert(collectTopK(Bm25.topKFromState(
      spark, "doc_id", dlDir, tfDir, k = 10)) == truth)
    // no (doc, term) appears twice in the tf state
    val dup = spark.read.parquet(tfDir).groupBy("doc_id", "term")
      .count().where(col("count") > 1).count()
    assert(dup === 0L)
  }
}
