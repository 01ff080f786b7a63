package graft

import graft.streaming.BloomGuard
import org.apache.spark.sql.functions._

/** The persisted Bloom guard (streaming/BloomGuard.scala): the fold
  * contract is "a miss skips the exact probe", so the invariants under
  * test are the two that keep misses truthful — the bitset is a
  * SUPERSET of every covered state's keys across all crash windows,
  * and a missing bloom fails SAFE (exact path), never open.
  */
class BloomGuardSpec extends SparkSpec {
  import spark.implicits._

  test("read: missing dir is None; addKeys without init is a no-op " +
      "(a late-created bloom would miss pre-existing state keys)") {
    val dir = java.nio.file.Files.createTempDirectory("bg").toString +
      "/bloom"
    assert(BloomGuard.read(spark, dir).isEmpty)
    BloomGuard.addKeys(spark, dir, Seq(1L, 2L).toDF("k"), "k")
    assert(BloomGuard.read(spark, dir).isEmpty,
      "addKeys must not manufacture a partial bloom")
    assert(BloomGuard.needExact(spark, dir, Seq(9L).toDF("k"), "k"),
      "missing bloom must route to the exact probe")
  }

  test("membership: added keys always hit; fresh keys miss; the " +
      "bitset OR-merges across adds") {
    val dir = java.nio.file.Files.createTempDirectory("bg2").toString +
      "/bloom"
    BloomGuard.init(spark, dir)
    BloomGuard.addKeys(spark, dir, (0L until 50L).toDF("k"), "k")
    BloomGuard.addKeys(spark, dir, (50L until 100L).toDF("k"), "k")
    val words = BloomGuard.read(spark, dir).get
    val hits = (0L until 100L).toDF("k")
      .where(BloomGuard.hit(words, "k")).count()
    assert(hits === 100L, "no false negatives, ever")
    assert(BloomGuard.needExact(spark, dir, Seq(7L).toDF("k"), "k"))
    assert(!BloomGuard.needExact(spark, dir,
      (1000L until 1020L).toDF("k"), "k"),
      "a fresh batch must skip the exact probe")
  }

  test("crash after the bloom write, before the covered append: the " +
      "superset bloom routes the replay through the exact probe and " +
      "the fold heals (Crossmodal index)") {
    import graft.multimodal.Crossmodal
    val dir = java.nio.file.Files.createTempDirectory("bg3").toString +
      "/mv"
    Crossmodal.initState(spark, dir)
    val rows = (0L until 10L)
      .map(i => (i, Seq(i.toDouble, 1.0))).toDF("doc_id", "mv")
    Crossmodal.applyBatch(spark, rows.where(col("doc_id") < 5), dir)
    // batch 2's bloom write lands, then the process dies before the
    // index append — the widest window the write order opens
    BloomGuard.crashAfterWrite = true
    assertThrows[RuntimeException] {
      Crossmodal.applyBatch(spark, rows.where(col("doc_id") >= 5), dir)
    }
    assert(spark.read.parquet(dir).count() === 5L,
      "crashed batch must not have appended")
    // replay: every key bloom-hits, the exact anti-join finds nothing,
    // the append completes exactly once
    Crossmodal.applyBatch(spark, rows.where(col("doc_id") >= 5), dir)
    Crossmodal.applyBatch(spark, rows, dir) // full replay: no-op
    assert(spark.read.parquet(dir).count() === 10L)
    assert(spark.read.parquet(dir).select("doc_id").distinct().count()
      === 10L)
  }

  test("a LOST bloom (deleted dir) degrades to the exact path without " +
      "breaking the fold") {
    import graft.multimodal.Crossmodal
    val base = java.nio.file.Files.createTempDirectory("bg4").toString
    val dir = base + "/mv"
    Crossmodal.initState(spark, dir)
    val rows = (0L until 10L)
      .map(i => (i, Seq(i.toDouble, 1.0))).toDF("doc_id", "mv")
    Crossmodal.applyBatch(spark, rows.where(col("doc_id") < 5), dir)
    // operational mishap: the bloom sibling disappears
    val p = new org.apache.hadoop.fs.Path(Crossmodal.bloomDir(dir))
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    Crossmodal.applyBatch(spark, rows, dir) // overlap replay + fresh
    assert(spark.read.parquet(dir).count() === 10L)
    assert(spark.read.parquet(dir).select("doc_id").distinct().count()
      === 10L)
  }
}
