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

  test("overload WITHOUT a rebuild source: keys far past capacity " +
      "saturate the bitset — every probe routes exact (fail-safe, " +
      "never a false negative), nothing breaks") {
    val dir = java.nio.file.Files.createTempDirectory("bg5").toString +
      "/bloom"
    // 128 bits for 5000 keys: hopelessly overloaded by construction
    BloomGuard.init(spark, dir, numBits = 128)
    BloomGuard.addKeys(spark, dir, (0L until 5000L).toDF("k"), "k")
    val nb = BloomGuard.read(spark, dir).get
    assert(nb.totalBits === 128L, "no thunk → no resize")
    assert(nb.fill > 0.95, "saturated as expected")
    val hits = (0L until 5000L).toDF("k")
      .where(BloomGuard.hit(nb, "k")).count()
    assert(hits === 5000L, "no false negatives even saturated")
    assert(BloomGuard.needExact(spark, dir,
      (90000L until 90020L).toDF("k"), "k"),
      "a saturated bloom must degrade to the exact probe, not lie")
  }

  test("resize: past the fill threshold with a rebuild source, the " +
      "bitset grows to cardinality-derived size — added keys still " +
      "hit, fresh batches skip again") {
    val dir = java.nio.file.Files.createTempDirectory("bg6").toString +
      "/bloom"
    BloomGuard.init(spark, dir, numBits = 1024)
    // the fold's state: keys 0..99 already appended
    BloomGuard.addKeys(spark, dir, (0L until 100L).toDF("k"), "k")
    assert(BloomGuard.read(spark, dir).get.fill > BloomGuard.FillThreshold,
      "fixture must be past the trigger")
    // next batch arrives WITH the resize source (state keys thunk)
    BloomGuard.addKeys(spark, dir, (100L until 200L).toDF("k"), "k",
      stateKeys = Some(() => (0L until 100L).toDF("k")))
    val nb = BloomGuard.read(spark, dir).get
    assert(nb.totalBits === BloomGuard.DefaultNumBits.toLong,
      s"planFor(200) floors at DefaultNumBits, got ${nb.totalBits}")
    assert(nb.fill < BloomGuard.FillThreshold)
    val hits = (0L until 200L).toDF("k")
      .where(BloomGuard.hit(nb, "k")).count()
    assert(hits === 200L, "state ∪ batch keys all survive the rebuild")
    assert(!BloomGuard.needExact(spark, dir,
      (500000L until 500020L).toDF("k"), "k"),
      "fresh batches skip the exact probe again after the resize")
  }

  test("shard promotion: a rebuild whose plan exceeds maxShardBits " +
      "splits into name#i/S rows — membership is unchanged, fresh " +
      "keys still miss") {
    val saved = BloomGuard.maxShardBits
    try {
      // force sharding at test scale: 2^17-bit shards → planFor's
      // DefaultNumBits floor (2^21) promotes to 16 shards
      BloomGuard.maxShardBits = 1 << 17
      val dir = java.nio.file.Files.createTempDirectory("bg7")
        .toString + "/bloom"
      BloomGuard.init(spark, dir, numBits = 1024)
      BloomGuard.addKeys(spark, dir, (0L until 100L).toDF("k"), "k")
      BloomGuard.addKeys(spark, dir, (100L until 200L).toDF("k"), "k",
        stateKeys = Some(() => (0L until 100L).toDF("k")))
      val rows = BloomGuard.readAll(spark, dir).get
      assert(rows.keySet === (0 until 16).map(i => s"k#$i/16").toSet,
        s"expected 16 shard rows, got ${rows.keySet}")
      val nb = BloomGuard.read(spark, dir).get
      assert(nb.numShards === 16 && nb.bitsPerShard === (1 << 17))
      val hits = (0L until 200L).toDF("k")
        .where(BloomGuard.hit(nb, "k")).count()
      assert(hits === 200L, "no false negatives across the shard split")
      assert(!BloomGuard.needExact(spark, dir,
        (500000L until 500020L).toDF("k"), "k"))
      // sharded blooms keep OR-merging and probing on later batches
      BloomGuard.addKeys(spark, dir, (200L until 300L).toDF("k"), "k")
      val nb2 = BloomGuard.read(spark, dir).get
      assert((0L until 300L).toDF("k")
        .where(BloomGuard.hit(nb2, "k")).count() === 300L)
    } finally BloomGuard.maxShardBits = saved
  }

  test("a pure-replay add (all frames empty) swaps nothing — the " +
      "guard dir's files are untouched") {
    val dir = java.nio.file.Files.createTempDirectory("bg8").toString +
      "/bloom"
    BloomGuard.init(spark, dir)
    BloomGuard.addKeys(spark, dir, (0L until 50L).toDF("k"), "k")
    def listing = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      fs.listStatus(p).map(st =>
        (st.getPath.getName, st.getLen, st.getModificationTime)).toSeq
        .sortBy(_._1)
    }
    val before = listing
    BloomGuard.addKeys(spark, dir, (0L until 50L).toDF("k")
      .where(col("k") < 0), "k")
    assert(listing === before, "zero-new-key batch must not rewrite")
  }

  test("distributed build equals the driver OR path bit-for-bit: " +
      "OR-merge, resize + shard promotion, and replay-writes-nothing") {
    val savedGate = BloomGuard.distributedBuildMinBytes
    val savedShard = BloomGuard.maxShardBits
    def run(tag: String): Map[String, Array[Long]] = {
      val dir = java.nio.file.Files.createTempDirectory(tag).toString +
        "/bloom"
      BloomGuard.init(spark, dir, numBits = 1024)
      BloomGuard.addKeys(spark, dir, (0L until 100L).toDF("k"), "k")
      // resize + shard promotion (maxShardBits forced small)
      BloomGuard.addKeys(spark, dir, (100L until 200L).toDF("k"), "k",
        stateKeys = Some(() => (0L until 100L).toDF("k")))
      // post-promotion OR-merge
      BloomGuard.addKeys(spark, dir, (200L until 300L).toDF("k"), "k")
      // pure replay: must not change anything
      BloomGuard.addKeys(spark, dir,
        (0L until 10L).toDF("k").where(col("k") < 0), "k")
      BloomGuard.readAll(spark, dir).get
    }
    try {
      BloomGuard.maxShardBits = 1 << 17
      BloomGuard.distributedBuildMinBytes = Long.MaxValue
      val driver = run("bgd1")
      BloomGuard.distributedBuildMinBytes = -1L
      val dist = run("bgd2")
      assert(dist.keySet === driver.keySet)
      driver.keySet.foreach { n =>
        assert(java.util.Arrays.equals(dist(n), driver(n)),
          s"row $n differs between the driver and distributed builds")
      }
      val nb = BloomGuard.assemble(dist, "k").get
      assert((0L until 300L).toDF("k")
        .where(BloomGuard.hit(nb, "k")).count() === 300L)
    } finally {
      BloomGuard.distributedBuildMinBytes = savedGate
      BloomGuard.maxShardBits = savedShard
    }
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
