package graft

import graft.io.ParquetUtil
import org.apache.spark.sql.functions._

/** The sub-O(state) watermark read (io/ParquetUtil.scala `lastBatch`):
  * the replay watermark lives INSIDE the state frame (atomic with the
  * delta it acknowledges), but reading it takes the parquet FOOTER
  * statistics path — metadata-only, O(#files) — and must agree with
  * the exact row scan in every state shape a fold can leave behind.
  */
class WatermarkSpec extends SparkSpec {
  import spark.implicits._

  private def scanMax(path: String): Option[Long] = {
    val row = spark.read.parquet(path)
      .agg(max(col("last_batch"))).collect()(0)
    if (row.isNullAt(0)) None else Some(row.getLong(0))
  }

  test("footer watermark equals the exact scan across delta piles, " +
      "compaction, and the empty/missing states") {
    val dir = java.nio.file.Files.createTempDirectory("wm").toString +
      "/state"
    // missing dir
    assert(ParquetUtil.lastBatch(spark, dir) === None)
    assert(ParquetUtil.lastWatermarkSource === "none")
    // zero-row state frame (an empty first micro-batch)
    Seq.empty[(Long, Long)].toDF("v", "last_batch")
      .write.mode("overwrite").parquet(dir)
    assert(ParquetUtil.lastBatch(spark, dir) === None)
    // a growing delta pile: per-batch appends, non-monotonic file order
    (0L to 6L).foreach { id =>
      ParquetUtil.safeAppend(spark,
        Seq((id * 10, id)).toDF("v", "last_batch"), dir)
      assert(ParquetUtil.lastBatch(spark, dir) === Some(id))
      assert(ParquetUtil.lastWatermarkSource === "footer",
        "watermark must come from footer statistics, not a row scan")
      assert(scanMax(dir) === Some(id))
    }
    // compaction rewrite (safeOverwrite swap)
    ParquetUtil.safeOverwrite(spark,
      spark.read.parquet(dir).groupBy().agg(sum(col("v")).as("v"))
        .withColumn("last_batch", lit(6L)), dir)
    assert(ParquetUtil.lastBatch(spark, dir) === Some(6L))
    assert(scanMax(dir) === Some(6L))
  }

  test("a fold's own state reads the same watermark end-to-end " +
      "(NgramDiversity delta pile)") {
    val docs = Seq((0L, "a", "x y x"), (1L, "a", "y z"), (2L, "b", "x"))
      .toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("wmnd").toString +
      "/state"
    graft.text.NgramDiversity.applyBatch(spark, docs, 0L, dir)
    graft.text.NgramDiversity.applyBatch(spark, docs, 1L, dir)
    assert(ParquetUtil.lastBatch(spark, dir) === Some(1L))
    assert(ParquetUtil.lastWatermarkSource === "footer")
    // replay no-op still holds through the footer path
    val before = spark.read.parquet(dir).count()
    graft.text.NgramDiversity.applyBatch(spark, docs, 1L, dir)
    assert(spark.read.parquet(dir).count() === before)
  }
}
