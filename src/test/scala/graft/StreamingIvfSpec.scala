package graft

import graft.similarity.StreamingIvf
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The streamed IVF index must answer exactly like the batch IVF: the
  * decimal centroid fold is associative-exact, so neither the batch
  * count nor replay may perturb anything.
  */
class StreamingIvfSpec extends SparkSpec {

  private lazy val emb: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"), col("label"))

  /** Batch ground truth: the same decimal centroid computation the
    * batch query runs, collected through the shared helpers.
    */
  private def batchCentroids: Map[Int, Array[Double]] =
    graft.queries.SimilarityQueries.centroidsOf(
      emb.select(col("label"),
          posexplode(col("embedding")).as(Seq("d", "v")))
        .groupBy("label", "d")
        .agg((sum(col("v").cast(DecimalType(38, 15))).cast("double")
          / count(lit(1))).as("c")))

  private def streamed(nBatches: Int): (String, Map[Int, Array[Double]]) = {
    val base = java.nio.file.Files
      .createTempDirectory(s"sivf_$nBatches").toString
    StreamingIvf.initState(spark, base + "/postings")
    val ids = emb.select("vec_id").collect().map(_.getLong(0)).sorted
    ids.grouped(math.max(1, ids.length / nBatches)).zipWithIndex
      .foreach { case (g, i) =>
        StreamingIvf.applyBatch(spark,
          emb.where(col("vec_id").isin(g.toSeq: _*)), i.toLong,
          base + "/sums", base + "/postings")
      }
    (base, graft.queries.SimilarityQueries.centroidsOf(
      StreamingIvf.centroidFrame(spark, base + "/sums")))
  }

  test("folded centroids are bit-identical to batch for any batching") {
    val truth = batchCentroids
    for (n <- Seq(1, 3, 7)) {
      val (base, got) = streamed(n)
      assert(got.keySet == truth.keySet)
      truth.foreach { case (l, cv) =>
        assert(java.util.Arrays.equals(got(l), cv),
          s"centroid $l diverged at nBatches=$n")
      }
      // postings accumulated the whole corpus exactly once
      assert(spark.read.parquet(base + "/postings").count() == emb.count())
    }
  }

  test("crash between postings append and sums swap: replay heals both") {
    val truth = batchCentroids
    val base = java.nio.file.Files.createTempDirectory("sivf_crash").toString
    StreamingIvf.initState(spark, base + "/postings")
    val ids = emb.select("vec_id").collect().map(_.getLong(0)).sorted
    val (half0, half1) = ids.splitAt(ids.length / 2)
    StreamingIvf.applyBatch(spark, emb.where(col("vec_id").isin(half0.toSeq: _*)),
      0L, base + "/sums", base + "/postings")
    // Kill the sums swap AFTER the postings append has committed — the
    // exact window the write order exists for: batch 1 is in postings
    // but not yet counted or watermarked.
    graft.io.ParquetUtil.crashPoint = Some("after-staging")
    val b1 = emb.where(col("vec_id").isin(half1.toSeq: _*))
    intercept[RuntimeException] {
      StreamingIvf.applyBatch(spark, b1, 1L, base + "/sums", base + "/postings")
    }
    assert(spark.read.parquet(base + "/postings").count() == emb.count(),
      "postings must already carry the crashed batch")
    // replay of the same batch completes the fold exactly once
    StreamingIvf.applyBatch(spark, b1, 1L, base + "/sums", base + "/postings")
    val got = graft.queries.SimilarityQueries.centroidsOf(
      StreamingIvf.centroidFrame(spark, base + "/sums"))
    assert(got.keySet == truth.keySet)
    truth.foreach { case (l, cv) =>
      assert(java.util.Arrays.equals(got(l), cv),
        s"centroid $l diverged after crash+replay")
    }
    assert(spark.read.parquet(base + "/postings").count() == emb.count())
  }

  test("crash MID-SWAP (state aside as __old, staging unpromoted): replay heals") {
    // The window ParquetUtil.lastBatch's recovery call exists for: the
    // sums frame is renamed to __old but the staging dir is not yet
    // promoted. A watermark read that only checked fs.exists would see
    // "no state", rebuild from the current batch alone, and the swap's
    // own recovery would restore __old just to overwrite it — silently
    // dropping every previously folded batch.
    val truth = batchCentroids
    val base = java.nio.file.Files.createTempDirectory("sivf_midswap").toString
    StreamingIvf.initState(spark, base + "/postings")
    val ids = emb.select("vec_id").collect().map(_.getLong(0)).sorted
    val (half0, half1) = ids.splitAt(ids.length / 2)
    StreamingIvf.applyBatch(spark, emb.where(col("vec_id").isin(half0.toSeq: _*)),
      0L, base + "/sums", base + "/postings")
    graft.io.ParquetUtil.crashPoint = Some("mid-swap")
    val b1 = emb.where(col("vec_id").isin(half1.toSeq: _*))
    intercept[RuntimeException] {
      StreamingIvf.applyBatch(spark, b1, 1L, base + "/sums", base + "/postings")
    }
    // replay must fold batch 1 into the RECOVERED batch-0 state
    StreamingIvf.applyBatch(spark, b1, 1L, base + "/sums", base + "/postings")
    val got = graft.queries.SimilarityQueries.centroidsOf(
      StreamingIvf.centroidFrame(spark, base + "/sums"))
    assert(got.keySet == truth.keySet)
    truth.foreach { case (l, cv) =>
      assert(java.util.Arrays.equals(got(l), cv),
        s"centroid $l diverged after mid-swap crash+replay")
    }
    assert(spark.read.parquet(base + "/postings").count() == emb.count())
  }

  test("partial re-delivery of already-indexed vec_ids fails loudly") {
    val base = java.nio.file.Files.createTempDirectory("sivf_partial").toString
    StreamingIvf.initState(spark, base + "/postings")
    val ids = emb.select("vec_id").collect().map(_.getLong(0)).sorted
    val (half0, half1) = ids.splitAt(ids.length / 2)
    StreamingIvf.applyBatch(spark, emb.where(col("vec_id").isin(half0.toSeq: _*)),
      0L, base + "/sums", base + "/postings")
    // batch 1 mixes one already-indexed id with fresh ids: the anti-join
    // would exclude it from postings while the raw-batch sums partial
    // double-counts it — the fold must refuse instead of diverging
    val mixed = (half1 :+ half0.head).toSeq
    val ex = intercept[IllegalStateException] {
      StreamingIvf.applyBatch(spark, emb.where(col("vec_id").isin(mixed: _*)),
        1L, base + "/sums", base + "/postings")
    }
    assert(ex.getMessage.contains("re-delivers"))
  }

  test("empty first micro-batch does not wedge the stream (null watermark)") {
    val truth = batchCentroids
    val base = java.nio.file.Files.createTempDirectory("sivf_empty").toString
    StreamingIvf.initState(spark, base + "/postings")
    StreamingIvf.applyBatch(spark, emb.where(lit(false)), 0L,
      base + "/sums", base + "/postings")
    StreamingIvf.applyBatch(spark, emb, 1L, base + "/sums", base + "/postings")
    val got = graft.queries.SimilarityQueries.centroidsOf(
      StreamingIvf.centroidFrame(spark, base + "/sums"))
    assert(got.keySet == truth.keySet)
    truth.foreach { case (l, cv) =>
      assert(java.util.Arrays.equals(got(l), cv))
    }
  }

  test("frozen-quantizer fold: postings are batching-invariant and " +
      "replay is a no-op") {
    import graft.similarity.KMeans
    val k = graft.queries.SimilarityQueries.ivfK(emb.count())
    val (centFp, _) = KMeans.fitModel(
      emb.select("vec_id", "embedding"), "vec_id", "embedding", k,
      graft.queries.SimilarityQueries.IvfIters)
    val ids = emb.select("vec_id").collect().map(_.getLong(0)).sorted
    def run(nBatches: Int): Map[Long, Int] = {
      val base = java.nio.file.Files
        .createTempDirectory(s"sivf_frozen_$nBatches").toString
      StreamingIvf.initState(spark, base + "/postings")
      ids.grouped(math.max(1, ids.length / nBatches)).foreach { g =>
        StreamingIvf.applyFrozenBatch(spark,
          emb.where(col("vec_id").isin(g.toSeq: _*)), centFp,
          base + "/postings")
      }
      // replaying the ENTIRE corpus afterwards must change nothing
      StreamingIvf.applyFrozenBatch(spark, emb, centFp, base + "/postings")
      spark.read.parquet(base + "/postings")
        .select("vec_id", "label").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    }
    val one = run(1)
    assert(one.size == ids.length, "every vector must be indexed once")
    for (n <- Seq(3, 7)) {
      assert(run(n) == one, s"postings diverged at nBatches=$n")
    }
    // the frozen assignment equals the batch model's own assignment
    val (_, asg) = KMeans.fitModel(
      emb.select("vec_id", "embedding"), "vec_id", "embedding", k,
      graft.queries.SimilarityQueries.IvfIters)
    val batchAsg = asg.collect()
      .map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(one == batchAsg)
  }

  test("replayed batch is a no-op (watermark + postings anti-join)") {
    val (base, before) = streamed(3)
    StreamingIvf.applyBatch(spark, emb, 0L, base + "/sums",
      base + "/postings")
    val after = graft.queries.SimilarityQueries.centroidsOf(
      StreamingIvf.centroidFrame(spark, base + "/sums"))
    assert(before.keySet == after.keySet)
    before.foreach { case (l, cv) =>
      assert(java.util.Arrays.equals(after(l), cv))
    }
    assert(spark.read.parquet(base + "/postings").count() == emb.count())
  }
}
