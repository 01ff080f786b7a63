package graft

import graft.dedup.{Dedup, Nearline}
import org.apache.spark.sql.functions._

/** The nearline banded index must emit EXACTLY the batch Hamming-pair
  * set — no pair lost across a batch boundary, no pair emitted twice —
  * for ANY partitioning of the stream into micro-batches.
  */
class NearlineSpec extends SparkSpec {
  import spark.implicits._

  // synthetic 60-bit hashes: 20 cluster cores, each with two satellites
  // within Hamming ≤ 3 (flip up to 3 of the low 60 bits), plus isolated
  // noise rows. Deterministic seed — the ground truth is stable.
  private lazy val corpus = {
    val rnd = new scala.util.Random(7)
    val mask = (1L << 60) - 1
    val rows = (0 until 20).flatMap { c =>
      val core = rnd.nextLong() & mask
      val sat1 = core ^ (1L << rnd.nextInt(60))
      val sat2 = core ^ (1L << rnd.nextInt(60)) ^ (1L << rnd.nextInt(60))
      Seq(core, sat1, sat2)
    } ++ (0 until 40).map(_ => rnd.nextLong() & mask)
    rows.zipWithIndex.map { case (h, i) => (i.toLong, h) }
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_a", "doc_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("nearline pair set is batch-count invariant and exactly-once") {
    val hashed = corpus.toDF("doc", "h")
    val truth = pairSet(
      Dedup.hammingPairs(hashed, "doc", "h", maxHamming = 3)
        .select(col("doc_a"), col("doc_b"),
          col("hamming").cast("long").as("hamming")))
    assert(truth.nonEmpty, "synthetic corpus must contain near-dup pairs")
    for (n <- Seq(1, 2, 5)) {
      val base = java.nio.file.Files
        .createTempDirectory(s"nearline_$n").toString
      val got = Nearline.hammingPairsNearline(
        spark, hashed, col("doc") % 2 === 0, n, base)
        .select(col("doc_a"), col("doc_b"),
          col("hamming").cast("long").as("hamming"), col("phase"))
      // exactly-once: no (doc_a, doc_b) appears twice across batches
      val all = got.collect()
      assert(all.map(r => (r.getLong(0), r.getLong(1))).toSeq.distinct.size
        == all.length, s"duplicate pair emitted at nBatches=$n")
      assert(pairSet(got) == truth,
        s"pair set diverged from batch ground truth at nBatches=$n")
      // phase attribution: a pair is 'seed' iff BOTH members are seeds
      val wrongPhase = all.filter { r =>
        val bothSeed = r.getLong(0) % 2 == 0 && r.getLong(1) % 2 == 0
        r.getString(3) != (if (bothSeed) "seed" else "stream")
      }
      assert(wrongPhase.isEmpty,
        s"phase misattributed at nBatches=$n: ${wrongPhase.take(3).toSeq}")
    }
  }

  // --- MinHash nearline ---------------------------------------------------

  /** Text corpus with near-identical twins (one token of 20 changed,
    * jaccard ≈ 0.89 on 3-shingles) plus disjoint noise.
    */
  private lazy val textCorpus = {
    val base = (0 until 24).map { i =>
      (i.toLong, (0 until 20).map(t => s"w${i}_$t").mkString(" "))
    }
    val twins = (0 until 24 by 3).map { i =>
      (100L + i, (0 until 20).map(t =>
        if (t == 19) "CHANGED" else s"w${i}_$t").mkString(" "))
    }
    base ++ twins
  }

  private def minhashStream(nBatches: Int): (String,
      Set[(Long, Long)]) = {
    val docs = textCorpus.toDF("doc_id", "text")
    val shingled = docs.select(col("doc_id").as("doc"),
      graft.functions.GraftFunctions
        .shinglesK(spark, col("text"), 3).as("s"))
    val base = java.nio.file.Files
      .createTempDirectory(s"smh_$nBatches").toString
    val (idx, store, pairs) =
      (base + "/idx", base + "/store", base + "/pairs")
    Nearline.initMinHashState(spark, idx, store, pairs)
    val ids = shingled.select("doc").collect().map(_.getLong(0)).sorted
    ids.grouped(math.max(1, ids.length / nBatches)).foreach { g =>
      Nearline.applyMinHashBatch(spark,
        shingled.where(col("doc").isin(g.toSeq: _*)), 0.5,
        idx, store, pairs)
    }
    (base, spark.read.parquet(pairs).select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("minhash nearline pair set is batch-count invariant == batch") {
    val docs = textCorpus.toDF("doc_id", "text")
    val truth = Dedup.minHashPairs(docs, "text", "doc_id", 0.5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty)
    for (n <- Seq(1, 2, 5)) {
      val (_, got) = minhashStream(n)
      assert(got == truth,
        s"minhash nearline diverged from batch at nBatches=$n")
    }
  }

  test("replayed minhash batch is a no-op") {
    val (base, before) = minhashStream(3)
    val docs = textCorpus.toDF("doc_id", "text")
    val shingled = docs.select(col("doc_id").as("doc"),
      graft.functions.GraftFunctions
        .shinglesK(spark, col("text"), 3).as("s"))
    Nearline.applyMinHashBatch(spark, shingled, 0.5,
      base + "/idx", base + "/store", base + "/pairs")
    val after = spark.read.parquet(base + "/pairs")
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == before)
    assert(spark.read.parquet(base + "/store").count() ==
      textCorpus.length)
  }

  test("replayed micro-batch is a no-op (at-least-once delivery)") {
    val hashed = corpus.toDF("doc", "h")
    val base = java.nio.file.Files
      .createTempDirectory("nearline_replay").toString
    val pairs = Nearline.hammingPairsNearline(
      spark, hashed, col("doc") % 2 === 0, 2, base)
    val (pairsBefore, idxBefore) =
      (pairs.count(), spark.read.parquet(base + "/band_index").count())
    // re-deliver EVERY streamed row at once — a superset of any batch
    // the source could replay; the already-indexed guard must drop all
    // of it before pairing, leaving pairs and index untouched
    Nearline.applyBatch(spark, spark.read.parquet(base + "/splits"),
      base + "/band_index", base + "/pairs", maxHamming = 3)
    assert(spark.read.parquet(base + "/pairs").count() == pairsBefore)
    assert(
      spark.read.parquet(base + "/band_index").count() == idxBefore)
  }

  // ------------------------------------------------------ exact dedup

  private lazy val exactDocs = Seq(
    (0L, "Alpha  Beta"), (1L, "alpha beta"), (2L, "gamma"),
    (3L, "GAMMA "), (4L, "delta"), (5L, "alpha beta"),
    (6L, "epsilon"), (7L, "delta"))
    .toDF("doc_id", "text")

  private def collectExact(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("nearline exact dedup: batch-count invariance, replay, " +
      "compaction, empty batch") {
    val truth = collectExact(Dedup.exactDedup(exactDocs, "text", "doc_id"))
    for (nBatches <- Seq(1, 3, 8)) {
      val stateDir = java.nio.file.Files
        .createTempDirectory(s"ndex_$nBatches").toString + "/state"
      val ids = exactDocs.select("doc_id").collect()
        .map(_.getLong(0)).sorted
      var bid = 0L
      ids.grouped(math.max(1, ids.length / nBatches)).foreach { g =>
        Nearline.applyExactBatch(spark,
          exactDocs.where(col("doc_id").isin(g.toSeq: _*)),
          "text", "doc_id", bid, stateDir, compactEvery = 2)
        bid += 1
      }
      // replayed batch id is a no-op (watermark)
      Nearline.applyExactBatch(spark, exactDocs, "text", "doc_id",
        bid - 1, stateDir)
      // empty batch folds nothing
      Nearline.applyExactBatch(spark,
        exactDocs.where(lit(false)), "text", "doc_id", bid, stateDir)
      assert(collectExact(Nearline.exactFromState(spark, stateDir))
        == truth, s"nBatches=$nBatches")
    }
  }

  test("nearline exact dedup: crash windows replay to exact counts") {
    val truth = collectExact(Dedup.exactDedup(exactDocs, "text", "doc_id"))
    for (window <- Seq("pending-recorded", "after-append")) {
      val stateDir = java.nio.file.Files
        .createTempDirectory(s"ndex_$window").toString + "/state"
      def batch(ids: Seq[Long], bid: Long) = Nearline.applyExactBatch(
        spark, exactDocs.where(col("doc_id").isin(ids: _*)),
        "text", "doc_id", bid, stateDir)
      batch(Seq(0L, 1L, 2L), 0L)
      graft.io.ParquetUtil.crashPoint = Some(window)
      intercept[RuntimeException] { batch(Seq(3L, 4L, 5L), 1L) }
      batch(Seq(3L, 4L, 5L), 1L) // scheduler retry
      batch(Seq(6L, 7L), 2L)
      assert(collectExact(Nearline.exactFromState(spark, stateDir))
        == truth, s"window=$window")
    }
  }
}
