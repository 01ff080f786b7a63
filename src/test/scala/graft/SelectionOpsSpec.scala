package graft

import graft.text.BigramLm
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-13 batch D: Moore–Lewis cross-entropy-difference selection,
  * the streamed bigram-LM count fold, prototype-distance pruning, and
  * duplicate-cluster annotation.
  */
class SelectionOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------- bigram LM refactor

  private val lmDocs = Seq(
    (0L, "alpha beta alpha beta alpha beta"),
    (1L, "zork quux fnord blarg"),
    (2L, "alpha beta alpha beta"),
    (3L, "quux zork blarg fnord mumble"),
    (4L, "alpha beta gamma"),
    (5L, "mumble fnord zork")).toDF("doc_id", "text")

  test("score equals scoreFp with the rounding applied (refactor pin)") {
    val train = lmDocs.where(col("doc_id") % 2 === 0)
    val viaScore = BigramLm.score(lmDocs, train, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val viaFp = BigramLm.scoreFp(lmDocs, train, "doc_id", "text")
      .select(col("doc_id"), col("n_tokens"),
        round(col("sum_fp").cast("double") /
          (col("n_tokens").cast("double") *
            lit(BigramLm.LnScale.toDouble)), 6).as("avg_logprob"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(viaScore == viaFp)
  }

  // --------------------------------------------------- streamed LM fold

  private def streamLm(nBatches: Int): Set[(Long, Long, Double)] = {
    val base = java.nio.file.Files
      .createTempDirectory(s"slm_$nBatches").toString
    val stateDir = base + "/state"
    val train = lmDocs.where(col("doc_id") % 2 === 0)
    val ids = train.select("doc_id").collect().map(_.getLong(0)).sorted
    ids.grouped(math.max(1, ids.length / nBatches)).zipWithIndex
      .foreach { case (g, i) =>
        BigramLm.applyBatch(spark,
          train.where(col("doc_id").isin(g.toSeq: _*)),
          "doc_id", "text", i.toLong, stateDir)
      }
    BigramLm.scoreFromState(spark, lmDocs, "doc_id", "text", stateDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
  }

  test("streamed LM fold is batch-count invariant and equals batch") {
    val train = lmDocs.where(col("doc_id") % 2 === 0)
    val truth = BigramLm.score(lmDocs, train, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(truth.nonEmpty)
    for (n <- Seq(1, 2, 3)) {
      assert(streamLm(n) == truth, s"diverged from batch at nBatches=$n")
    }
  }

  test("replayed LM batch is a no-op (batch-id watermark)") {
    val base = java.nio.file.Files.createTempDirectory("slm_r").toString
    val stateDir = base + "/state"
    val train = lmDocs.where(col("doc_id") % 2 === 0)
    BigramLm.applyBatch(spark, train, "doc_id", "text", 0L, stateDir)
    val before = BigramLm
      .scoreFromState(spark, lmDocs, "doc_id", "text", stateDir)
      .collect().map(_.toSeq).toSet
    // re-deliver under a stale batch id: counts are additive, not
    // idempotent, so the watermark must reject the replay
    BigramLm.applyBatch(spark, train, "doc_id", "text", 0L, stateDir)
    val after = BigramLm
      .scoreFromState(spark, lmDocs, "doc_id", "text", stateDir)
      .collect().map(_.toSeq).toSet
    assert(after == before)
  }

  // ----------------------------------------------- Moore–Lewis selection

  test("Moore–Lewis keeps docs the in-domain model likes better") {
    // in-domain = lang 'en' (the "alpha beta" dialect); general train
    // mixes both dialects. The pure in-domain docs must be selected,
    // the pure out-of-domain docs must not.
    val docs = Seq(
      (0L, "alpha beta alpha beta alpha beta", "en"),
      (1L, "zork quux fnord blarg zork quux", "de"),
      (2L, "zork quux zork blarg fnord", "de"),
      (3L, "alpha beta alpha beta", "en"),
      (4L, "alpha beta alpha beta alpha", "en"),
      (5L, "quux zork blarg fnord", "de")).toDF("doc_id", "text", "lang")
    val sc = BigramLm.LnScale
    val trainGen = docs.where(col("doc_id") % 2 === 0)
    val trainIn = trainGen.where(col("lang") === "en")
    val gen = BigramLm.scoreFp(docs, trainGen, "doc_id", "text")
      .select(col("doc_id"), col("n_tokens"), col("sum_fp").as("fp_gen"))
    val ind = BigramLm.scoreFp(docs, trainIn, "doc_id", "text")
      .select(col("doc_id"), col("sum_fp").as("fp_in"))
    val sel = gen.join(ind, "doc_id")
      .where(col("fp_in") > col("fp_gen"))
      .select(col("doc_id"),
        round((col("fp_in") - col("fp_gen")).cast("double") /
          (col("n_tokens").cast("double") * lit(sc.toDouble)), 6)
          .as("ml_delta"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(Set(0L, 3L, 4L).subsetOf(sel.keySet),
      s"in-domain docs must be selected, got ${sel.keySet}")
    assert(!sel.contains(1L) && !sel.contains(2L) && !sel.contains(5L),
      "out-of-domain docs must not be selected")
    assert(sel.values.forall(_ > 0.0))
  }

  // --------------------------------------------------- prototype pruning

  test("prototype prune keeps the hardest ceil(n/2) of each cluster") {
    import graft.similarity.KMeans
    // two tight clusters around (±1, 0, ...): 4 points near +1 with
    // graded offsets, 3 near -1
    def vec(x: Float): Seq[Float] = x +: Seq.fill(15)(0.0f)
    val e = Seq(
      (0L, vec(1.00f)), (1L, vec(0.98f)), (2L, vec(0.96f)),
      (3L, vec(0.94f)),
      (10L, vec(-1.00f)), (11L, vec(-0.98f)), (12L, vec(-0.96f)))
      .toDF("vec_id", "embedding")
    val (cent, asg) = KMeans.fitModel(e, "vec_id", "embedding", 2, 3)
    val pts = KMeans.pointsFp(e, "vec_id", "embedding")
    val withDist = asg.join(pts, "vec_id").join(broadcast(cent), "cid")
      .select(col("vec_id"), col("cid"),
        aggregate(
          zip_with(col("p"), col("c"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("dist_fp"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cid")
      .orderBy(col("dist_fp").desc, col("vec_id"))
    val wc = org.apache.spark.sql.expressions.Window.partitionBy("cid")
    val out = withDist
      .withColumn("rnk", row_number().over(w))
      .withColumn("n_c", count(lit(1)).over(wc))
      .select(col("vec_id"), col("cid"), col("dist_fp"),
        (col("rnk") <= expr("(n_c + 1) div 2")).as("kept"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(out.length == 7)
    val byCid = out.groupBy(_._2)
    assert(byCid.size == 2, s"expected 2 clusters, got ${byCid.keySet}")
    byCid.foreach { case (_, rows) =>
      val keep = rows.count(_._4)
      assert(keep == (rows.length + 1) / 2,
        s"cluster of ${rows.length} kept $keep")
      // hardest-first: every kept distance >= every dropped distance
      val keptD = rows.filter(_._4).map(_._3)
      val dropD = rows.filterNot(_._4).map(_._3)
      assert(dropD.isEmpty || keptD.min >= dropD.max)
    }
  }

  // ----------------------------------------------- duplicate annotation

  test("dedup annotate: clusters, sizes, canonical flags, all docs kept") {
    import graft.dedup.Dedup
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog today"),
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely different text with no overlap at all here"),
      (3L, "the quick brown fox jumps over the lazy dog yesterday"))
      .toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(docs, "text", "doc_id", 0.5)
    val comp = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
    val ann = docs.select(col("doc_id"))
      .join(comp.select(col("id").as("doc_id"), col("comp")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("comp"), col("doc_id")).as("cluster"))
    val stats = ann.groupBy("cluster")
      .agg(count(lit(1)).as("cluster_size"),
        min(col("doc_id")).as("__min_id"))
    val out = ann.join(stats, "cluster")
      .select(col("doc_id"), col("cluster"), col("cluster_size"),
        (col("doc_id") === col("__min_id")).as("is_canonical"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L), "every doc annotated once")
    // 0, 1, 3 share 9-of-10 shingle overlap -> one cluster rooted at 0
    assert(out(0L) == ((0L, 3L, true)))
    assert(out(1L) == ((0L, 3L, false)))
    assert(out(3L) == ((0L, 3L, false)))
    // 2 is a singleton: own cluster, size 1, canonical
    assert(out(2L) == ((2L, 1L, true)))
  }
}
