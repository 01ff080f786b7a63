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

  test("a pure-replay batch writes NOTHING — bloom dir and both " +
      "state dirs byte-identical after the replay") {
    val base = java.nio.file.Files.createTempDirectory("sbm_noop")
      .toString
    val (dlDir, tfDir) = (base + "/dl", base + "/tf")
    Bm25.initState(spark, "doc_id", dlDir, tfDir)
    Bm25.applyBatch(spark, docs, "doc_id", "text", terms, dlDir, tfDir)
    def listing(dir: String) = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).map(st =>
        (st.getPath.getName, st.getLen, st.getModificationTime)).toSeq
        .sortBy(_._1)
    }
    val dirs = Seq(dlDir, tfDir, Bm25.bloomDir(dlDir))
    val before = dirs.map(listing)
    Bm25.applyBatch(spark, docs.where(col("doc_id") < 15),
      "doc_id", "text", terms, dlDir, tfDir)
    assert(dirs.map(listing) === before,
      "replay must swap no bloom and append no files")
  }

  test("crash between the tf and dl appends replays to the " +
      "fully-applied state (no doubled tf rows)") {
    val base = java.nio.file.Files.createTempDirectory("sbm_crash")
      .toString
    val (dlDir, tfDir) = (base + "/dl", base + "/tf")
    Bm25.initState(spark, "doc_id", dlDir, tfDir)
    Bm25.applyBatch(spark, docs.where(col("doc_id") < 20),
      "doc_id", "text", terms, dlDir, tfDir)
    // the real kill window: the fold itself dies after the bloom and
    // tf writes, before the dl append
    val b2 = docs.where(col("doc_id") >= 20)
    Bm25.crashBetweenAppends = true
    assertThrows[RuntimeException] {
      Bm25.applyBatch(spark, b2, "doc_id", "text", terms, dlDir, tfDir)
    }
    // scheduler retry of the whole batch
    Bm25.applyBatch(spark, b2, "doc_id", "text", terms, dlDir, tfDir)
    assert(collectTopK(Bm25.topKFromState(
      spark, "doc_id", dlDir, tfDir, k = 10)) == truth)
    // no (doc, term) appears twice in the tf state
    val dup = spark.read.parquet(tfDir).groupBy("doc_id", "term")
      .count().where(col("count") > 1).count()
    assert(dup === 0L)
  }

  test("crash MID tf append rolls back exactly — a partially-visible " +
      "doc never loses its remaining term rows") {
    val base = java.nio.file.Files.createTempDirectory("sbm_midcrash")
      .toString
    val (dlDir, tfDir) = (base + "/dl", base + "/tf")
    Bm25.initState(spark, "doc_id", dlDir, tfDir)
    Bm25.applyBatch(spark, docs.where(col("doc_id") < 20),
      "doc_id", "text", terms, dlDir, tfDir)
    // kill the tf safeAppend after its data commits but before the
    // pending marker clears — the exact window a plain append would
    // leave a subset of one doc's (doc, term) rows visible in
    val b2 = docs.where(col("doc_id") >= 20)
    graft.io.ParquetUtil.crashPoint = Some("after-append")
    assertThrows[RuntimeException] {
      Bm25.applyBatch(spark, b2, "doc_id", "text", terms, dlDir, tfDir)
    }
    Bm25.applyBatch(spark, b2, "doc_id", "text", terms, dlDir, tfDir)
    assert(collectTopK(Bm25.topKFromState(
      spark, "doc_id", dlDir, tfDir, k = 10)) == truth)
    val dup = spark.read.parquet(tfDir).groupBy("doc_id", "term")
      .count().where(col("count") > 1).count()
    assert(dup === 0L)
  }

  test("bloom guard: fresh batches read neither state table; a replay " +
      "routes through the exact probes; the guarded and unguarded " +
      "arms agree") {
    import graft.streaming.{BloomGuard, StateScanMeter}
    val base = java.nio.file.Files.createTempDirectory("sbm_bloom")
      .toString
    val (dlDir, tfDir) = (base + "/dl", base + "/tf")
    Bm25.initState(spark, "doc_id", dlDir, tfDir)
    Bm25.applyBatch(spark, docs.where(col("doc_id") < 20),
      "doc_id", "text", terms, dlDir, tfDir)
    val dlBytes = graft.io.ParquetUtil.dirSizeBytes(spark, dlDir)
    // fresh second batch: scan meter must record NO dl/tf read — only
    // the fixed-size bloom touches disk
    StateScanMeter.reset()
    Bm25.applyBatch(spark, docs.where(col("doc_id") >= 20),
      "doc_id", "text", terms, dlDir, tfDir)
    val freshScan = StateScanMeter.value
    assert(freshScan === 0L,
      s"fresh batch scanned $freshScan bytes of state (want 0)")
    assert(StateScanMeter.guardValue > 0L, "bloom guard was not read")
    // replay: bloom hits route through the exact anti-joins (state read)
    StateScanMeter.reset()
    Bm25.applyBatch(spark, docs, "doc_id", "text", terms, dlDir, tfDir)
    // the dl anti-join runs (and proves the batch fully applied); the
    // tf probe is then SKIPPED — a pure replay ends at the empty-fresh
    // early return, so only the dl table is read
    assert(StateScanMeter.value >= dlBytes,
      "replay batch must pay the exact dl probe")
    val guarded = collectTopK(Bm25.topKFromState(
      spark, "doc_id", dlDir, tfDir, k = 10))
    // unguarded arm (the counterfactual soak toggle) folds identically
    val base2 = java.nio.file.Files.createTempDirectory("sbm_noguard")
      .toString
    val (dlDir2, tfDir2) = (base2 + "/dl", base2 + "/tf")
    BloomGuard.enabled = false
    try {
      Bm25.initState(spark, "doc_id", dlDir2, tfDir2)
      Bm25.applyBatch(spark, docs.where(col("doc_id") < 20),
        "doc_id", "text", terms, dlDir2, tfDir2)
      Bm25.applyBatch(spark, docs.where(col("doc_id") >= 20),
        "doc_id", "text", terms, dlDir2, tfDir2)
    } finally BloomGuard.enabled = true
    assert(collectTopK(Bm25.topKFromState(
      spark, "doc_id", dlDir2, tfDir2, k = 10)) == guarded)
    assert(guarded == truth)
  }
}
