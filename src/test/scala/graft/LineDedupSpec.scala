package graft

import graft.text.LineDedup
import org.apache.spark.sql.functions._

/** CCNet line-level dedup + Gopher duplicate-line rules
  * (text/LineDedup.scala): normalization equivalences, global
  * first-occurrence semantics, page reassembly, the synthetic-page
  * construction's shape, and the within-page repetition fractions.
  */
class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private val lines = Seq(
    // page 0: banner + distinct content
    (0L, 0L, "Site Banner 2024!"),
    (0L, 1L, "alpha beta gamma"),
    (0L, 2L, "unique zero two"),
    // page 1: same banner (normalized match: case/digits/punct differ),
    // plus an in-page exact repeat of its own line
    (1L, 0L, "site banner"),
    (1L, 1L, "delta epsilon"),
    (1L, 2L, "delta epsilon"),
    // page 2: repeats page 0's content line
    (2L, 0L, "ALPHA   beta GAMMA 99"),
    (2L, 1L, "unique two one"))
    .toDF("page_id", "line_no", "line")

  test("normalizeLine strips case, digits, punctuation; collapses runs") {
    val got = spark.range(1).select(
      LineDedup.normalizeLine(lit("Site  Banner 2024!")).as("a"),
      LineDedup.normalizeLine(lit("site banner")).as("b"),
      LineDedup.normalizeLine(lit("  A1b2 C3  ")).as("c")).head
    assert(got.getString(0) == "site banner")
    assert(got.getString(1) == "site banner")
    assert(got.getString(2) == "ab c")
  }

  test("first occurrence wins globally in (page, line_no) order") {
    val kept = LineDedup
      .markFirstOccurrences(lines, "page_id", "line_no", "line")
      .where(col("keep")).select("page_id", "line_no")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // banner: first at (0,0); page-1 copy and its normalized variant drop
    assert(kept.contains((0L, 0L)) && !kept.contains((1L, 0L)))
    // in-page repeat: (1,1) kept, (1,2) dropped
    assert(kept.contains((1L, 1L)) && !kept.contains((1L, 2L)))
    // cross-page normalized repeat of "alpha beta gamma": (2,0) dropped
    assert(kept.contains((0L, 1L)) && !kept.contains((2L, 0L)))
    // uniques all kept
    assert(kept.contains((0L, 2L)) && kept.contains((2L, 1L)))
  }

  test("reassemble keeps line order and counts dropped chars") {
    val marked =
      LineDedup.markFirstOccurrences(lines, "page_id", "line_no", "line")
    val out = LineDedup.reassemble(marked)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getString(5))).toMap
    assert(out(0L) == (3L, 3L, 0L, 0L,
      "Site Banner 2024!\nalpha beta gamma\nunique zero two"))
    // page 1 drops its banner copy (11 chars) + the repeat (13 chars)
    assert(out(1L) == (3L, 1L, 2L, 24L, "delta epsilon"))
    assert(out(2L) == (2L, 1L, 1L, 21L, "unique two one"))
  }

  test("syntheticPages: 7 lines per full page, banners as documented") {
    val docs = (0L until 20L).map(i => (i, s"doc text $i"))
      .toDF("doc_id", "text")
    val pages = LineDedup.syntheticPages(docs)
    assert(pages.count() == 20 + 4 + 4) // members + local + global
    val p2 = pages.where(col("page_id") === 2)
      .orderBy("line_no").collect()
      .map(r => (r.getLong(1), r.getString(2)))
    // global banner: doc (2 % 3) = doc 2; local banner: first member
    assert(p2.head == (0L, "doc text 2"))
    assert(p2(1) == (1L, "doc text 10"))
    assert(p2.drop(2).map(_._2).toSeq ==
      (10L until 15L).map(i => s"doc text $i"))
  }

  private def collectDedup(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getString(5))).toMap

  test("streamed line dedup: batch-count invariance, replay, empty") {
    val truth = collectDedup(LineDedup.reassemble(
      LineDedup.markFirstOccurrences(lines, "page_id", "line_no", "line")))
    for (nBatches <- Seq(1, 3, 7)) {
      val base = java.nio.file.Files
        .createTempDirectory(s"sld_$nBatches").toString
      val (indexDir, marksDir) = (base + "/idx", base + "/marks")
      LineDedup.initLineState(spark, indexDir, marksDir)
      val lids = lines
        .select((col("page_id") * 100 + col("line_no")).as("lid"))
        .collect().map(_.getLong(0)).sorted
      lids.grouped(math.max(1, lids.length / nBatches)).foreach { g =>
        LineDedup.applyLineBatch(spark,
          lines.where((col("page_id") * 100 + col("line_no"))
            .isin(g.toSeq: _*)), indexDir, marksDir)
      }
      // empty batch is a no-op
      LineDedup.applyLineBatch(spark, lines.where(lit(false)),
        indexDir, marksDir)
      // whole-corpus replay is a no-op (marks anti-join guard)
      LineDedup.applyLineBatch(spark, lines, indexDir, marksDir)
      val got = collectDedup(
        LineDedup.lineDedupFromState(spark, lines, marksDir))
      assert(got == truth, s"nBatches=$nBatches")
    }
  }

  test("streamed line dedup: a pure-replay batch writes NOTHING — " +
      "bloom, index, and marks dirs byte-identical after the replay") {
    val base = java.nio.file.Files.createTempDirectory("sld_noop")
      .toString
    val (indexDir, marksDir) = (base + "/idx", base + "/marks")
    LineDedup.initLineState(spark, indexDir, marksDir)
    LineDedup.applyLineBatch(spark, lines, indexDir, marksDir)
    def walk(dir: String): Seq[(String, Long, Long)] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(p)) Seq.empty
      else {
        val it = fs.listFiles(p, true)
        val out = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
        while (it.hasNext) { val st = it.next()
          out += ((st.getPath.toString, st.getLen, st.getModificationTime)) }
        out.toSeq.sortBy(_._1)
      }
    }
    val dirs = Seq(indexDir, marksDir, LineDedup.bloomDir(indexDir))
    val before = dirs.map(walk)
    LineDedup.applyLineBatch(spark, lines, indexDir, marksDir)
    // an empty batch writes nothing either
    LineDedup.applyLineBatch(spark, lines.where(lit(false)),
      indexDir, marksDir)
    assert(dirs.map(walk) === before,
      "replay must swap no bloom and append no files")
  }

  test("streamed line dedup: crash between index and marks append " +
      "replays to the fully-applied state") {
    // "three" is first kept in batch 2 (the crashed batch) and re-occurs
    // in batch 3 — under the old marks-first order a crash after the
    // marks append lost the index entry and batch 3 re-kept it.
    val clines = Seq(
      (0L, 0L, "one"), (0L, 1L, "two"),
      (1L, 0L, "three"), (1L, 1L, "one"),
      (2L, 0L, "three"), (2L, 1L, "four"))
      .toDF("page_id", "line_no", "line")
    val truth = collectDedup(LineDedup.reassemble(
      LineDedup.markFirstOccurrences(clines, "page_id", "line_no", "line")))
    val base = java.nio.file.Files.createTempDirectory("sld_crash").toString
    val (indexDir, marksDir) = (base + "/idx", base + "/marks")
    LineDedup.initLineState(spark, indexDir, marksDir)
    def batch(p: Long) = clines.where(col("page_id") === p)
    LineDedup.applyLineBatch(spark, batch(0), indexDir, marksDir)
    LineDedup.crashBetweenAppends = true
    intercept[RuntimeException] {
      LineDedup.applyLineBatch(spark, batch(1), indexDir, marksDir)
    }
    // scheduler retry of the crashed batch, then the next batch
    LineDedup.applyLineBatch(spark, batch(1), indexDir, marksDir)
    LineDedup.applyLineBatch(spark, batch(2), indexDir, marksDir)
    assert(collectDedup(
      LineDedup.lineDedupFromState(spark, clines, marksDir)) == truth)
    // the replayed index carries no duplicate keys
    val dup = spark.read.parquet(indexDir).groupBy("line_key")
      .count().where(col("count") > 1).count()
    assert(dup === 0L)
    // and exactly one mark per line
    assert(spark.read.parquet(marksDir).count() === clines.count())
  }

  test("streamed line dedup: an out-of-order arrival with smaller " +
      "coords than an already-kept key drops (never double-keeps)") {
    val base = java.nio.file.Files.createTempDirectory("sld_ooo").toString
    val (indexDir, marksDir) = (base + "/idx", base + "/marks")
    LineDedup.initLineState(spark, indexDir, marksDir)
    // page 5 arrives FIRST and keeps "zeta"
    LineDedup.applyLineBatch(spark,
      Seq((5L, 0L, "zeta")).toDF("page_id", "line_no", "line"),
      indexDir, marksDir)
    // page 3 arrives late with the same key at SMALLER coords
    LineDedup.applyLineBatch(spark,
      Seq((3L, 0L, "zeta")).toDF("page_id", "line_no", "line"),
      indexDir, marksDir)
    val marks = spark.read.parquet(marksDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(2))
      .toMap
    assert(marks((5L, 0L)) === true)
    assert(marks((3L, 0L)) === false,
      "late smaller-coords arrival must not re-keep an indexed key")
    // the index still holds exactly one entry for the key
    assert(spark.read.parquet(indexDir).count() === 1L)
  }

  test("property: under ANY batch arrival order, at most one keep " +
      "per line key (the keep rule's intent, pinned beyond the " +
      "id-ordered contract)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // 8 lines over 4 keys — recurring keys across pages guarantee
    // cross-batch collisions under shuffled arrival
    val rows = Seq(
      (0L, 0L, "alpha"), (0L, 1L, "beta"), (1L, 0L, "alpha"),
      (1L, 1L, "gamma"), (2L, 0L, "beta"), (2L, 1L, "delta"),
      (3L, 0L, "gamma"), (3L, 1L, "alpha"))
    val prop = Prop.forAll(Gen.long, Gen.choose(1, 4)) { (seed, nb) =>
      val order = new scala.util.Random(seed).shuffle(rows)
      val base = java.nio.file.Files
        .createTempDirectory("sld_prop").toString
      val (indexDir, marksDir) = (base + "/idx", base + "/marks")
      LineDedup.initLineState(spark, indexDir, marksDir)
      val size = math.max(1, (order.length + nb - 1) / nb)
      order.grouped(size).foreach { b =>
        LineDedup.applyLineBatch(spark,
          b.toDF("page_id", "line_no", "line"), indexDir, marksDir)
      }
      val marks = spark.read.parquet(marksDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      val byKey = rows.map { case (p, l, k) => (p, l) -> k }.toMap
      val keepsPerKey = marks.filter(_._3)
        .groupBy(m => byKey((m._1, m._2))).map { case (k, ms) => k -> ms.length }
      marks.length == rows.length && keepsPerKey.values.forall(_ <= 1)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("bloom + bucketed index: fresh batches scan no state; a " +
      "recurring-key batch reads only its keys' buckets") {
    import graft.streaming.StateScanMeter
    val base = java.nio.file.Files.createTempDirectory("sld_bloom").toString
    val (indexDir, marksDir) = (base + "/idx", base + "/marks")
    LineDedup.initLineState(spark, indexDir, marksDir)
    val mkPage = (p: Long) => Seq((p, 0L, s"banner shared"),
      (p, 1L, s"unique content $p")).toDF("page_id", "line_no", "line")
    LineDedup.applyLineBatch(spark, mkPage(0), indexDir, marksDir)
    val idxBytes = graft.io.ParquetUtil.dirSizeBytes(spark, indexDir)
    val marksBytes = graft.io.ParquetUtil.dirSizeBytes(spark, marksDir)
    // page 1 repeats only the banner key: the marks store (fresh
    // coords) is never read, and the index probe opens at most the
    // banner key's single bucket — strictly less than the whole index
    StateScanMeter.reset()
    LineDedup.applyLineBatch(spark, mkPage(1), indexDir, marksDir)
    assert(StateScanMeter.value < idxBytes + marksBytes,
      s"scanned ${StateScanMeter.value} >= full state")
    assert(StateScanMeter.value > 0L, "banner key must probe its bucket")
    // an all-fresh batch (no shared banner) scans NOTHING
    StateScanMeter.reset()
    LineDedup.applyLineBatch(spark,
      Seq((9L, 0L, "nothing shared here"), (9L, 1L, "nor here"))
        .toDF("page_id", "line_no", "line"), indexDir, marksDir)
    assert(StateScanMeter.value === 0L,
      s"all-fresh batch scanned ${StateScanMeter.value} bytes of state")
    // replay of page 0 routes through the exact marks guard
    StateScanMeter.reset()
    LineDedup.applyLineBatch(spark, mkPage(0), indexDir, marksDir)
    assert(StateScanMeter.value > 0L)
    assert(spark.read.parquet(marksDir).count() === 6L)
  }

  test("pageRepetitionStats: exact dup fractions and rule gates") {
    val rep = LineDedup.pageRepetitionStats(lines)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(5), r.getBoolean(7)))
      .toMap
    // page 0: no within-page dups
    assert(rep(0L) == (3L, 0L, 0.0, true))
    // page 1: "delta epsilon" ×2 → 1 dup line of 3; chars: 13/(11+13+13)
    val (n1, d1, f1, pass1) = rep(1L)
    assert(n1 == 3L && d1 == 1L)
    assert(f1 == 1.0 / 3.0)
    assert(!pass1) // 1/3 > 0.30
    assert(rep(2L)._2 == 0L)
  }
}
