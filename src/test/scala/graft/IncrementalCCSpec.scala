package graft

import graft.dedup.{Dedup, IncrementalCC}
import org.apache.spark.sql.functions._

/** Nearline duplicate-cluster maintenance (dedup/IncrementalCC.scala):
  * the streamed q_dedup_annotate. Invariants under test — the folded
  * annotation equals the batch chain (jaccardPairs → CC → annotate)
  * VERBATIM for any batch partitioning AND any arrival order; replays
  * write nothing; every crash window heals; compaction preserves the
  * result while emptying the remap.
  */
class IncrementalCCSpec extends SparkSpec {
  import spark.implicits._

  private val T = 0.5

  // 18 docs over 4 multi-doc clusters + singletons; clusters span the
  // id range so id-sliced batches force cross-batch merges, and the
  // "bridge" docs (8, 14) connect previously-separate components —
  // exercising the label-space contraction and remap composition
  private lazy val docs = Seq(
    (0L, "alpha beta gamma delta epsilon zeta"),
    (1L, "alpha beta gamma delta epsilon eta"),
    (2L, "totally different text about ships"),
    (3L, "quick brown fox jumps over dogs"),
    (4L, "quick brown fox jumps over cats"),
    (5L, "unrelated musings on compilers"),
    (6L, "alpha beta gamma delta epsilon zeta"),
    (7L, "storage engines and write amplification"),
    (8L, "alpha beta gamma delta epsilon theta"),
    (9L, "quick brown fox jumps over dogs"),
    (10L, "ocean currents and their measurement"),
    (11L, "alpha beta gamma delta iota epsilon"),
    (12L, "quick brown fox leaps over cats"),
    (13L, "printing presses of the renaissance"),
    (14L, "quick brown fox jumps over mice"),
    (15L, "alpha beta gamma delta epsilon zeta"),
    (16L, "volcanic soils and viticulture"),
    (17L, "quick brown fox jumps over dogs")
  ).toDF("doc_id", "text")

  private lazy val shingled = docs.select(col("doc_id").as("doc"),
    graft.functions.GraftFunctions
      .shinglesK(spark, col("text"), 3).as("s"))

  private def truth: Seq[(Long, Long, Long, Boolean)] = {
    val pairs = Dedup.jaccardPairs(docs, "text", "doc_id", T)
    val comp = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
    val ann = docs.select(col("doc_id"))
      .join(comp.select(col("id").as("doc_id"), col("comp")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("comp"), col("doc_id")).as("cluster"))
    val stats = ann.groupBy("cluster")
      .agg(count(lit(1)).as("cluster_size"), min("doc_id").as("__mn"))
    ann.join(stats, "cluster")
      .select(col("doc_id"), col("cluster"), col("cluster_size"),
        (col("doc_id") === col("__mn")).as("is_canonical"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq
  }

  private def collectAnn(labelsDir: String, remapDir: String) =
    IncrementalCC.annotateFromState(spark, labelsDir, remapDir)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq

  private def mkState(tag: String) = {
    val base = java.nio.file.Files.createTempDirectory(tag).toString
    val dirs = (base + "/idx", base + "/pairs", base + "/labels",
      base + "/remap")
    IncrementalCC.initState(spark, dirs._1, dirs._2, dirs._3, dirs._4)
    dirs
  }

  private def feed(ids: Seq[Long], dirs: (String, String, String, String),
      groups: Int): Unit =
    ids.grouped(math.max(1, (ids.length + groups - 1) / groups))
      .foreach { g =>
        IncrementalCC.applyBatch(spark,
          shingled.where(col("doc").isin(g: _*)), T,
          dirs._1, dirs._2, dirs._3, dirs._4)
      }

  test("folded annotation equals the batch chain for 1/3/7 batches " +
      "and for a shuffled arrival order") {
    val want = truth
    for (nb <- Seq(1, 3, 7)) {
      val dirs = mkState(s"icc_$nb")
      feed(0L until 18L, dirs, nb)
      assert(collectAnn(dirs._3, dirs._4) === want, s"nBatches=$nb")
      // emitted pairs equal the batch pair set too
      val got = spark.read.parquet(dirs._2)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val wantPairs = Dedup.jaccardPairs(docs, "text", "doc_id", T)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === wantPairs, s"nBatches=$nb pair set")
    }
    // arrival order must not matter (CC is a global fixpoint)
    val dirs = mkState("icc_shuf")
    feed(new scala.util.Random(7).shuffle((0L until 18L).toVector), dirs, 5)
    assert(collectAnn(dirs._3, dirs._4) === want, "shuffled arrival")
  }

  test("replay is a no-op that writes NOTHING — state dirs " +
      "byte-identical; partial re-delivery heals too") {
    val dirs = mkState("icc_replay")
    feed(0L until 18L, dirs, 3)
    val want = collectAnn(dirs._3, dirs._4)
    def walk(dir: String): Seq[(String, Long, Long)] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(p)) Seq.empty
      else {
        val it = fs.listFiles(p, true)
        val out = scala.collection.mutable
          .ArrayBuffer[(String, Long, Long)]()
        while (it.hasNext) { val st = it.next()
          out += ((st.getPath.toString, st.getLen,
            st.getModificationTime)) }
        out.toSeq.sortBy(_._1)
      }
    }
    val all = Seq(dirs._1, dirs._2, dirs._3, dirs._4,
      IncrementalCC.bloomDir(dirs._3))
    val before = all.map(walk)
    // full replay, then a partial (overlapping) one
    IncrementalCC.applyBatch(spark, shingled, T,
      dirs._1, dirs._2, dirs._3, dirs._4)
    IncrementalCC.applyBatch(spark,
      shingled.where(col("doc") < 9), T,
      dirs._1, dirs._2, dirs._3, dirs._4)
    assert(all.map(walk) === before, "replays must write nothing")
    assert(collectAnn(dirs._3, dirs._4) === want)
  }

  test("crash windows heal: after the bloom write, after the pairs " +
      "append, and mid label-append — replay converges to the batch " +
      "chain") {
    val want = truth
    // window 1: bloom written, nothing else — superset bloom routes
    // the replay through the exact guards
    val d1 = mkState("icc_c1")
    feed(0L until 9L, d1, 1)
    graft.streaming.BloomGuard.crashAfterWrite = true
    assertThrows[RuntimeException] {
      IncrementalCC.applyBatch(spark,
        shingled.where(col("doc") >= 9), T, d1._1, d1._2, d1._3, d1._4)
    }
    IncrementalCC.applyBatch(spark,
      shingled.where(col("doc") >= 9), T, d1._1, d1._2, d1._3, d1._4)
    assert(collectAnn(d1._3, d1._4) === want, "bloom-window crash")
    // window 2: the pairs append commits but its marker survives
    // (crash before acknowledge) — the next batch's recovery rolls the
    // append back and the replay re-emits exactly once
    val d2 = mkState("icc_c2")
    feed(0L until 9L, d2, 1)
    graft.io.ParquetUtil.crashPoint = Some("after-append")
    assertThrows[RuntimeException] {
      IncrementalCC.applyBatch(spark,
        shingled.where(col("doc") >= 9), T, d2._1, d2._2, d2._3, d2._4)
    }
    IncrementalCC.applyBatch(spark,
      shingled.where(col("doc") >= 9), T, d2._1, d2._2, d2._3, d2._4)
    assert(collectAnn(d2._3, d2._4) === want, "pairs-window crash")
    val got = spark.read.parquet(d2._2)
      .select("doc_a", "doc_b").collect().toSeq
    assert(got.distinct.length === got.length, "no doubled pairs")
  }

  test("compaction folds the remap into the base, empties it, and " +
      "preserves the annotation; the fold continues afterwards") {
    val want = truth
    val dirs = mkState("icc_comp")
    feed(0L until 12L, dirs, 2)
    IncrementalCC.compactLabels(spark, dirs._3, dirs._4)
    assert(spark.read.parquet(dirs._4).count() === 0L,
      "compaction must empty the remap")
    feed(12L until 18L, dirs, 2)
    assert(collectAnn(dirs._3, dirs._4) === want)
  }

  test("driver union-find equals the distributed CC fixpoint") {
    // chains, a clique, a star, bridges, self-referential mins — the
    // driver path must emit exactly connectedComponents' non-identity
    // rows (id -> component min)
    val edges = Array[(Long, Long)](
      (5L, 3L), (3L, 9L), (9L, 7L),            // chain, min 3
      (20L, 21L), (21L, 22L), (20L, 22L),      // clique, min 20
      (40L, 41L), (40L, 42L), (40L, 43L),      // star, min 40
      (7L, 41L),                               // bridge: mins collapse to 3
      (100L, 100L))                            // self-loop: identity, dropped
    val got = IncrementalCC.driverCc(edges)
    val want = Dedup.connectedComponents(
      edges.toSeq.toDF("la", "lb"), "la", "lb")
      .where(col("id") =!= col("comp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }
}
