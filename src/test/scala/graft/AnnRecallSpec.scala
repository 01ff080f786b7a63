package graft

import graft.similarity.AnnRecall
import org.apache.spark.sql.functions._

/** ANN graded as an ANN: recall@10 vs brute-force ground truth on the
  * sf0.1 embeddings, swept over the knobs a 100 TB user tunes — LSH
  * tables × hash-bits, IVF nprobe (label partition AND the trained
  * k-means quantizer q_ann_ivf ships). Asserts the qualitative knob
  * tradeoffs, pins the SHIPPED trained default on the recall frontier
  * (recall@10 ≥ 0.9 at ≤ 0.3 of the corpus scanned), measures the
  * PQ/ADC top-k agreement, and writes the measured curves to
  * `target/RECALL_r12.json` for SURVEY §6.
  */
class AnnRecallSpec extends SparkSpec {

  private val sfDir = sys.env.getOrElse(
    "SPARK_GRAFT_RECALL_SF_DIR", "/root/testdata/sf0.1")

  test("LSH and IVF recall curves have the advertised knob tradeoffs") {
    val path = s"$sfDir/embeddings.parquet"
    assume(new java.io.File(path).exists(), s"no embeddings at $path")
    val emb = spark.read.parquet(path)
      .select(col("vec_id"), col("embedding"), col("label"))

    // bandBits ∈ {8, 16} stay in the sweep as DOCUMENTED dead water on
    // this corpus: the embeddings are weak-similarity (near-random), so
    // 8-bit bands measure 0.15-0.25 recall and 16-bit bands collapse to
    // zero candidates — the shipped default is the 4-bit banding
    // (VectorFunctions.PlaneBandBits), whose row is graded below.
    val lsh = AnnRecall.lshCurve(emb,
      configs = Seq((16, 4), (32, 4), (64, 4), (16, 8), (32, 8), (64, 8),
        (64, 16)))
    val byCfg = lsh.map(p => (p.planes, p.bandBits) -> p).toMap

    val nLabels = emb.select("label").distinct().count().toInt
    val ivfLabel = AnnRecall.ivfCurve(emb, nprobes = Seq(1, 2, 3, 5, nLabels))

    // the TRAINED quantizer q_ann_ivf actually ships: k = floor(sqrt(n))
    // clusters, default nprobe = ceil(0.22 k) — swept around the default
    val n = emb.count()
    val k = graft.queries.SimilarityQueries.ivfK(n)
    val npDefault = graft.queries.SimilarityQueries.ivfNProbe(k)
    val sweep = (Seq(1, 3, 5, 8, npDefault, 12, 16, k)
      .filter(_ <= k)).distinct.sorted
    val ivfTrained = AnnRecall.ivfCurveTrained(emb, k,
      graft.queries.SimilarityQueries.IvfIters, sweep)

    // the FROZEN bootstrap-trained quantizer q_stream_ann_ivf_trained
    // ships: k-means fit on batch 0 of the stream's id-range slicing
    // (1/3 of the corpus), whole corpus frozen-assigned — grades the
    // recall cost of never retraining as vectors arrive
    val bRow = emb.agg(min(col("vec_id")), max(col("vec_id"))).collect()(0)
    val step = math.max(1L, (bRow.getLong(1) - bRow.getLong(0)) / 3 + 1)
    val b0 = emb.where(col("vec_id") < bRow.getLong(0) + step)
    val kF = graft.queries.SimilarityQueries.ivfK(b0.count())
    val npF = graft.queries.SimilarityQueries.ivfNProbe(kF)
    val sweepF = (Seq(1, 3, 5, npF, 12, 16, kF).filter(_ <= kF))
      .distinct.sorted
    val ivfFrozen = AnnRecall.ivfCurveFrozen(emb, b0, kF,
      graft.queries.SimilarityQueries.IvfIters, sweepF)

    // PQ/ADC (q_ann_pq): whole-corpus rerank through the code books —
    // the grade is top-k agreement of the approximate scores, swept
    // over (subspaces, codebook size); the shipped default is the
    // frontier point
    val pqConfigs = Seq((4, 16), (4, 64), (8, 16), (8, 64))
    val pqSweep = pqConfigs.map { case (m, kk) =>
      (m, kk, AnnRecall.pqRecall(spark, emb, m, kk))
    }
    // the SHIPPED q_ann_pq operating point: default codebooks, FIXED
    // RerankFactor×k ADC shortlist (output-sized at any corpus scale),
    // exact rerank — the factor swept so the shipped choice is the
    // smallest c whose recall matches the old corpus-proportional
    // shortlist
    val rerankFactors =
      Seq(10, 50, graft.similarity.ProductQuantizer.RerankFactor, 100, 200)
        .distinct.sorted
    val pqRerankSweep = rerankFactors.map { c =>
      (c, AnnRecall.pqRecall(spark, emb, shortlist = c * 10))
    }
    val shippedFactor = graft.similarity.ProductQuantizer.RerankFactor
    val pqShipped = pqRerankSweep.find(_._1 == shippedFactor).get._2
    val pqShortlist = shippedFactor * 10

    // JL 16-dim projected-space ranking (q_ann_projected): top-10
    // agreement, plus the same fixed-factor rerank deployment
    val projTop = AnnRecall.projRecall(emb)
    val projRerank = AnnRecall.projRecall(emb, shortlist = pqShortlist)

    // artifact first — the measurement is the deliverable even when a
    // shape assertion below catches a regression
    writeArtifact(lsh, ivfLabel, ivfTrained, ivfFrozen, k, npDefault,
      kF, npF, pqSweep, pqRerankSweep, pqShortlist, pqShipped,
      projTop, projRerank)

    // more bits per hash (fixed plane count): precision up →
    // candidates down, recall down-or-equal
    assert(byCfg((16, 8)).avgCandidates < byCfg((16, 4)).avgCandidates)
    assert(byCfg((16, 8)).recallAt <= byCfg((16, 4)).recallAt + 1e-9)
    // more tables at FIXED bits: recall up-or-equal (strictly more
    // band-join chances), candidates up — on both the 4-bit and the
    // 8-bit axis
    for (bits <- Seq(4, 8)) {
      assert(byCfg((32, bits)).recallAt >= byCfg((16, bits)).recallAt - 1e-9)
      assert(byCfg((64, bits)).recallAt >= byCfg((32, bits)).recallAt - 1e-9)
      assert(byCfg((64, bits)).avgCandidates >=
        byCfg((16, bits)).avgCandidates)
    }
    // the production default (16 planes / 4-bit bands) measured 0.45
    // recall@10 on this corpus — the embeddings are weak-similarity
    // (near-random), the hardest case for hyperplane LSH, where recall
    // tracks the candidate budget. The floor pins "did not collapse";
    // the knob direction is pinned by the monotonicity asserts above.
    assert(byCfg((16, 4)).recallAt >= 0.3,
      s"default LSH config recall collapsed: ${byCfg((16, 4))}")
    // monotone in nprobe; full probe is exact — label partition
    ivfLabel.sliding(2).foreach {
      case Seq(a, b) => assert(b.recallAt >= a.recallAt - 1e-9,
        s"IVF(label) recall not monotone: $a -> $b")
      case _ => ()
    }
    assert(math.abs(ivfLabel.last.recallAt - 1.0) < 1e-9,
      s"full probe must be exact: ${ivfLabel.last}")
    // trained quantizer: monotone in nprobe, full probe exact, and the
    // SHIPPED default sits on the recall frontier
    ivfTrained.sliding(2).foreach {
      case Seq(a, b) => assert(b.recallAt >= a.recallAt - 1e-9,
        s"IVF(trained) recall not monotone: $a -> $b")
      case _ => ()
    }
    assert(math.abs(ivfTrained.last.recallAt - 1.0) < 1e-9,
      s"full trained probe must be exact: ${ivfTrained.last}")
    val shipped = ivfTrained.find(_.nprobe == npDefault).get
    assert(shipped.recallAt >= 0.9,
      s"shipped trained-IVF default off the recall frontier: $shipped")
    assert(shipped.avgScannedFraction <= 0.3,
      s"shipped trained-IVF default scans too much: $shipped")
    // frozen bootstrap quantizer: monotone, full probe exact (probing
    // every cluster scans the whole corpus regardless of where the
    // centroids trained), and the streamed default must not collapse —
    // the precise recall gap vs full-corpus training is the artifact's
    // to report, not a fixed bound's
    ivfFrozen.sliding(2).foreach {
      case Seq(a, b) => assert(b.recallAt >= a.recallAt - 1e-9,
        s"IVF(frozen) recall not monotone: $a -> $b")
      case _ => ()
    }
    assert(math.abs(ivfFrozen.last.recallAt - 1.0) < 1e-9,
      s"full frozen probe must be exact: ${ivfFrozen.last}")
    val shippedF = ivfFrozen.find(_.nprobe == npF).get
    assert(shippedF.recallAt >= 0.6,
      s"streamed frozen-IVF default collapsed: $shippedF")
    // PQ: more code bits help (both axes), and the SHIPPED deployment
    // (default books + 10%-shortlist exact rerank) sits on the
    // frontier. Pure-ADC recall on this weak-similarity corpus is
    // documented honestly in the artifact (0.13-0.30) — near-random
    // embeddings are PQ's hardest case, which is exactly why the
    // shipped shape reranks.
    val bySweep = pqSweep.map { case (m, kk, r) => (m, kk) -> r }.toMap
    assert(bySweep((4, 64)) >= bySweep((4, 16)) - 1e-9)
    assert(bySweep((8, 64)) >= bySweep((8, 16)) - 1e-9)
    // fixed-factor rerank: a deeper shortlist can only admit more true
    // neighbours, so recall is monotone in the factor
    pqRerankSweep.sliding(2).foreach {
      case Seq((ca, ra), (cb, rb)) => assert(rb >= ra - 1e-9,
        s"PQ rerank recall not monotone in factor: ($ca,$ra) -> ($cb,$rb)")
      case _ => ()
    }
    assert(pqShipped >= 0.8,
      s"shipped PQ rerank recall collapsed: $pqShipped")
  }

  private def writeArtifact(
      lsh: Seq[graft.similarity.AnnRecall.LshPoint],
      ivfLabel: Seq[graft.similarity.AnnRecall.IvfPoint],
      ivfTrained: Seq[graft.similarity.AnnRecall.IvfPoint],
      ivfFrozen: Seq[graft.similarity.AnnRecall.IvfPoint],
      k: Int, npDefault: Int, kFrozen: Int, npFrozen: Int,
      pqSweep: Seq[(Int, Int, Double)],
      pqRerankSweep: Seq[(Int, Double)], pqShortlist: Int,
      pqShipped: Double, projTop: Double, projRerank: Double): Unit = {
    def n4(v: Double): String = graft.util.Fmt.fixed(v, 4)
    def ivfJson(ps: Seq[graft.similarity.AnnRecall.IvfPoint]): String =
      "[" + ps.map(p =>
        s"""{"nprobe":${p.nprobe},"recall_at_10":${n4(p.recallAt)},""" +
          s""""avg_scanned_fraction":${n4(p.avgScannedFraction)}}""")
        .mkString(",") + "]"
    val json =
      "{\"sf\":\"" + sfDir + "\",\"k\":10,\"queries\":50," +
        "\"lsh\":[" + lsh.map(p =>
          s"""{"planes":${p.planes},"bandBits":${p.bandBits},""" +
            s""""tables":${p.tables},"recall_at_10":${n4(p.recallAt)},""" +
            s""""avg_candidates":${graft.util.Fmt.fixed(p.avgCandidates, 1)}}""")
          .mkString(",") + "]," +
        "\"ivf_label\":" + ivfJson(ivfLabel) + "," +
        s""""ivf_trained_k":$k,"ivf_trained_default_nprobe":$npDefault,""" +
        "\"ivf_trained\":" + ivfJson(ivfTrained) + "," +
        s""""ivf_frozen_bootstrap_k":$kFrozen,""" +
        s""""ivf_frozen_bootstrap_default_nprobe":$npFrozen,""" +
        "\"ivf_frozen_bootstrap\":" + ivfJson(ivfFrozen) + "," +
        s""""pq_default_subspaces":""" +
        graft.similarity.ProductQuantizer.NumSubspaces + "," +
        s""""pq_default_codebook_k":""" +
        graft.similarity.ProductQuantizer.CodebookK + "," +
        "\"pq_adc\":[" + pqSweep.map { case (m, kk, r) =>
          s"""{"subspaces":$m,"codebook_k":$kk,""" +
            s""""recall_at_10":${n4(r)}}"""
        }.mkString(",") + "]," +
        "\"pq_rerank_factor_sweep\":[" + pqRerankSweep.map { case (c, r) =>
          s"""{"factor":$c,"shortlist":${c * 10},""" +
            s""""recall_at_10":${n4(r)}}"""
        }.mkString(",") + "]," +
        s""""pq_shipped_rerank":{"factor":""" +
        graft.similarity.ProductQuantizer.RerankFactor + "," +
        s""""shortlist":$pqShortlist,""" +
        s""""recall_at_10":${n4(pqShipped)}},""" +
        s""""projected":{"dims":""" +
        graft.similarity.VectorFunctions.NumPlanes + "," +
        s""""recall_at_10":${n4(projTop)},""" +
        s""""rerank_shortlist":$pqShortlist,""" +
        s""""rerank_recall_at_10":${n4(projRerank)}}}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("target/RECALL_r12.json"),
      json.getBytes("UTF-8"))
  }
}
