package graft

import graft.similarity.{KMeans, QuantizerDrift, StreamingIvf}
import org.apache.spark.sql.functions._

/** The drift-response maintenance verbs (similarity/StreamingIvf.scala
  * requantize / requantizeIfDrifted / splitCells): the ACTION half of
  * the frozen-deployment monitor loop. Core pins: requantize over the
  * full postings is bit-identical to from-scratch batch training on
  * the same corpus; the trigger fires only past the threshold; cell
  * splits grow k by touching only the split cells.
  */
class RequantizeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding")).localCheckpoint()

  /** Bootstrap-frozen postings over `emb` in 3 id-range batches. */
  private def foldFrozen(base: String): (String, Int) = {
    val postingsDir = base + "/postings"
    StreamingIvf.initState(spark, postingsDir)
    val b = emb.agg(min(col("vec_id")), max(col("vec_id"))).collect()(0)
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    val step = math.max(1L, (hi - lo) / 3 + 1)
    val b0 = emb.where(col("vec_id") < lo + step)
    val kBoot = graft.queries.SimilarityQueries.ivfK(b0.count())
    val (centBoot, _) = KMeans.fitModel(b0, "vec_id", "embedding",
      kBoot, graft.queries.SimilarityQueries.IvfIters)
    (0 until 3).foreach { i =>
      val hiB = if (i == 2) hi + 1 else lo + (i + 1) * step
      StreamingIvf.applyFrozenBatch(spark,
        emb.where(col("vec_id") >= lo + i * step && col("vec_id") < hiB),
        centBoot, postingsDir)
    }
    (postingsDir, kBoot)
  }

  private def centSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSet

  test("requantize over the full postings is bit-identical to batch " +
      "training on the same corpus (centroids AND labels)") {
    val base = java.nio.file.Files.createTempDirectory("rq").toString
    val (postingsDir, _) = foldFrozen(base)
    val n = emb.count()
    val k = graft.queries.SimilarityQueries.ivfK(n)
    val iters = graft.queries.SimilarityQueries.IvfIters
    val centNew = StreamingIvf.requantize(spark, postingsDir, k, iters)
    val (centBatch, asgBatch) = KMeans.fitModel(
      emb, "vec_id", "embedding", k, iters)
    assert(centSet(centNew) === centSet(centBatch))
    val postLabels = spark.read.parquet(postingsDir)
      .select(col("vec_id"), col("label").cast("long").as("cid"))
    assert(postLabels.exceptAll(asgBatch).count() === 0L)
    assert(asgBatch.exceptAll(postLabels).count() === 0L)
    assert(spark.read.parquet(postingsDir).count() === n)
  }

  test("requantizeIfDrifted fires past the threshold and holds below " +
      "it (the monitor->action gate)") {
    val base = java.nio.file.Files.createTempDirectory("rqg").toString
    val (postingsDir, kBoot) = foldFrozen(base)
    val driftDir = base + "/drift"
    // monitor the same three batches against the bootstrap quantizer
    val b = emb.agg(min(col("vec_id")), max(col("vec_id"))).collect()(0)
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    val step = math.max(1L, (hi - lo) / 3 + 1)
    val b0 = emb.where(col("vec_id") < lo + step)
    val (centBoot, _) = KMeans.fitModel(b0, "vec_id", "embedding",
      kBoot, graft.queries.SimilarityQueries.IvfIters)
    (0 until 3).foreach { i =>
      val hiB = if (i == 2) hi + 1 else lo + (i + 1) * step
      QuantizerDrift.applyBatch(spark,
        emb.where(col("vec_id") >= lo + i * step && col("vec_id") < hiB),
        centBoot, i.toLong, driftDir)
    }
    val before = spark.read.parquet(postingsDir)
      .agg(sum(col("label"))).head.getLong(0)
    // an unreachable threshold: no action, postings untouched
    assert(StreamingIvf.requantizeIfDrifted(spark, driftDir, postingsDir,
      graft.queries.SimilarityQueries.ivfK(emb.count()),
      graft.queries.SimilarityQueries.IvfIters,
      threshold = 1e9).isEmpty)
    assert(spark.read.parquet(postingsDir)
      .agg(sum(col("label"))).head.getLong(0) === before)
    // threshold 0: fires
    assert(StreamingIvf.requantizeIfDrifted(spark, driftDir, postingsDir,
      graft.queries.SimilarityQueries.ivfK(emb.count()),
      graft.queries.SimilarityQueries.IvfIters,
      threshold = 0.0).isDefined)
  }

  test("splitCells grows the quantizer to targetK, preserves the " +
      "posting set, touches only split cells, and reduces imbalance") {
    val base = java.nio.file.Files.createTempDirectory("rqs").toString
    val (postingsDir, kBoot) = foldFrozen(base)
    val b = emb.agg(min(col("vec_id")), max(col("vec_id"))).collect()(0)
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    val step = math.max(1L, (hi - lo) / 3 + 1)
    val b0 = emb.where(col("vec_id") < lo + step)
    val (centBoot, _) = KMeans.fitModel(b0, "vec_id", "embedding",
      kBoot, graft.queries.SimilarityQueries.IvfIters)
    val beforeP = spark.read.parquet(postingsDir)
      .select("vec_id", "embedding", "label").localCheckpoint()
    val maxBefore = beforeP.groupBy("label").count()
      .agg(max(col("count"))).head.getLong(0)
    val unsplitLabels = beforeP.groupBy("label").count()
    val targetK = graft.queries.SimilarityQueries.ivfK(emb.count())
    assert(targetK > kBoot, "fixture must actually grow the quantizer")
    val centNew = StreamingIvf.splitCells(spark, postingsDir, centBoot,
      targetK, graft.queries.SimilarityQueries.IvfIters)
    val afterP = spark.read.parquet(postingsDir)
    // the vector set is untouched — only labels moved
    assert(afterP.select("vec_id", "embedding")
      .exceptAll(beforeP.select("vec_id", "embedding")).count() === 0L)
    assert(afterP.count() === beforeP.count())
    // k grew to target and every posting's label has a centroid
    assert(centNew.count() === targetK.toLong)
    val centIds = centNew.select(col("cid").cast("int").as("label"))
    assert(afterP.select("label").distinct()
      .join(centIds, Seq("label"), "left_anti").count() === 0L)
    // the largest cell shrank (imbalance response)
    val maxAfter = afterP.groupBy("label").count()
      .agg(max(col("count"))).head.getLong(0)
    assert(maxAfter < maxBefore,
      s"largest cell $maxBefore -> $maxAfter must shrink")
    // unsplit cells' memberships are untouched: every label whose size
    // is unchanged still holds exactly its old members
    val beforeSizes = beforeP.groupBy("label").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val afterSizes = afterP.groupBy("label").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val unsplit = beforeSizes.keySet.filter(l =>
      afterSizes.get(l).contains(beforeSizes(l)))
    assert(unsplit.nonEmpty)
    val diff = beforeP.where(col("label").isin(unsplit.toSeq: _*))
      .select("vec_id", "label")
      .exceptAll(afterP.where(col("label").isin(unsplit.toSeq: _*))
        .select("vec_id", "label")).count()
    assert(diff === 0L, "unsplit cells must keep their exact members")
  }

  test("batched splitCells equals the sequential reference: same grown " +
      "centroid table, same postings state, reassign on and off") {
    for (reassign <- Seq(false, true)) {
      val b1 = java.nio.file.Files.createTempDirectory("rqb1").toString
      val b2 = java.nio.file.Files.createTempDirectory("rqb2").toString
      val (p1, kBoot) = foldFrozen(b1)
      val (p2, _) = foldFrozen(b2)
      val b = emb.agg(min(col("vec_id")), max(col("vec_id"))).collect()(0)
      val step = math.max(1L, (b.getLong(1) - b.getLong(0)) / 3 + 1)
      val b0 = emb.where(col("vec_id") < b.getLong(0) + step)
      val (centBoot, _) = KMeans.fitModel(b0, "vec_id", "embedding",
        kBoot, graft.queries.SimilarityQueries.IvfIters)
      val targetK = graft.queries.SimilarityQueries.ivfK(emb.count())
      val iters = graft.queries.SimilarityQueries.IvfIters
      val got = StreamingIvf.splitCells(spark, p1, centBoot,
        targetK, iters, reassign = reassign)
      val want = StreamingIvf.splitCellsSeq(spark, p2, centBoot,
        targetK, iters, reassign = reassign)
      assert(centSet(got) === centSet(want),
        s"reassign=$reassign: centroid tables differ")
      val gp = spark.read.parquet(p1).select("vec_id", "label")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      val wp = spark.read.parquet(p2).select("vec_id", "label")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(gp === wp, s"reassign=$reassign: postings labels differ")
    }
  }
}
