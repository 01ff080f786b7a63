package graft

import graft.similarity.{KMeans, QuantizerDrift}
import org.apache.spark.sql.functions._

/** Frozen-quantizer drift monitor (similarity/QuantizerDrift.scala):
  * exact per-slice error/imbalance statistics, the streamed fold's
  * equality with the batch report, replay/empty no-ops, and the
  * detection property — a shifted slice reads drift_ratio > 1.
  */
class QuantizerDriftSpec extends SparkSpec {
  import spark.implicits._

  // slice 0 (the bootstrap): two tight clusters near (±0.5, 0, ...).
  // slice 1: same distribution (no drift). slice 2: shifted off both
  // centroids (drift). 64-dim vectors, first two dims carry the signal.
  private def vec(a: Double, b: Double): Seq[Float] =
    (Seq(a, b) ++ Seq.fill(62)(0.0)).map(_.toFloat)
  private lazy val emb = {
    val rows =
      (0L until 30L).map { i =>
        val s = if (i % 2 == 0) 0.5 else -0.5
        (i, vec(s + 0.001 * (i % 5), 0.0))
      } ++ (30L until 60L).map { i =>
        val s = if (i % 2 == 0) 0.5 else -0.5
        (i, vec(s + 0.001 * (i % 5), 0.0))
      } ++ (60L until 90L).map { i =>
        (i, vec(0.0, 0.9 + 0.001 * (i % 5)))
      }
    rows.toDF("vec_id", "embedding")
  }

  private def frozen = {
    val b0 = emb.where(col("vec_id") < 30)
    KMeans.fitModel(b0, "vec_id", "embedding", k = 2,
      graft.queries.SimilarityQueries.IvfIters)._1
  }

  private def collectDrift(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("slice").collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))

  test("batch report: exact counts, baseline ratio 1 at slice 0, " +
      "shifted slice drifts") {
    val rep = collectDrift(QuantizerDrift.withRatios(
      QuantizerDrift.sliceStats(emb, frozen,
        expr("vec_id div 30"))))
    assert(rep.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(rep.forall(_._2 == 30L))
    assert(rep(0)._6 == 1.0) // the bootstrap is its own baseline
    // same-distribution slice: no drift (equal fp error by construction)
    assert(rep(1)._6 == 1.0)
    // shifted slice: mean error far above baseline, and the shifted
    // points funnel into one catch-all cell
    assert(rep(2)._6 > 10.0, s"drift_ratio ${rep(2)._6}")
    assert(rep(2)._5 == 1.0, s"max_cluster_frac ${rep(2)._5}")
    // balanced slices split evenly across the two centroids
    assert(rep(0)._5 == 0.5 && rep(1)._5 == 0.5)
  }

  test("streamed fold equals the batch report; replay and empty " +
      "batches are no-ops") {
    val truth = collectDrift(QuantizerDrift.withRatios(
      QuantizerDrift.sliceStats(emb, frozen, expr("vec_id div 30"))))
    val stateDir = java.nio.file.Files
      .createTempDirectory("qdrift").toString + "/state"
    val cent = frozen
    def batch(i: Long) = emb
      .where(col("vec_id") >= i * 30 && col("vec_id") < (i + 1) * 30)
    (0L to 2L).foreach(i =>
      QuantizerDrift.applyBatch(spark, batch(i), cent, i, stateDir))
    // replayed batch id is a no-op (watermark)
    QuantizerDrift.applyBatch(spark, batch(2), cent, 2L, stateDir)
    // empty batch appends nothing
    QuantizerDrift.applyBatch(spark, emb.where(lit(false)), cent, 3L,
      stateDir)
    assert(collectDrift(
      QuantizerDrift.driftFromState(spark, stateDir)) === truth)
    assert(spark.read.parquet(stateDir).count() === 3L)
  }
}
