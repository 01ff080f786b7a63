package graft

import graft.similarity.AnnRecall
import org.apache.spark.sql.functions._

/** ANN graded as an ANN: recall@10 vs brute-force ground truth on the
  * sf0.1 embeddings, swept over the knobs a 100 TB user tunes — LSH
  * tables × hash-bits, IVF nprobe. Asserts the qualitative shape of the
  * tradeoff (more tables → recall up; more bits per hash → recall down,
  * candidates down; more probes → recall up, monotonically, reaching
  * 1.0 at a full probe) and writes the measured curve to
  * `target/RECALL_r08.json` for SURVEY §6.
  */
class AnnRecallSpec extends SparkSpec {

  private val sfDir = sys.env.getOrElse(
    "SPARK_GRAFT_RECALL_SF_DIR", "/root/testdata/sf0.1")

  test("LSH and IVF recall curves have the advertised knob tradeoffs") {
    val path = s"$sfDir/embeddings.parquet"
    assume(new java.io.File(path).exists(), s"no embeddings at $path")
    val emb = spark.read.parquet(path)
      .select(col("vec_id"), col("embedding"), col("label"))

    val lsh = AnnRecall.lshCurve(emb,
      configs = Seq((16, 4), (32, 4), (64, 4), (16, 8), (32, 8), (64, 8),
        (64, 16)))
    val byCfg = lsh.map(p => (p.planes, p.bandBits) -> p).toMap

    val nLabels = emb.select("label").distinct().count().toInt
    val ivf = AnnRecall.ivfCurve(emb, nprobes = Seq(1, 2, 3, 5, nLabels))

    // artifact first — the measurement is the deliverable even when a
    // shape assertion below catches a regression
    writeArtifact(lsh, ivf)

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
    // monotone in nprobe; full probe is exact
    ivf.sliding(2).foreach {
      case Seq(a, b) => assert(b.recallAt >= a.recallAt - 1e-9,
        s"IVF recall not monotone: $a -> $b")
      case _ => ()
    }
    assert(math.abs(ivf.last.recallAt - 1.0) < 1e-9,
      s"full probe must be exact: ${ivf.last}")
    assert(ivf.head.avgScannedFraction < 0.35,
      s"nprobe=1 should scan a small corpus fraction: ${ivf.head}")
  }

  private def writeArtifact(
      lsh: Seq[graft.similarity.AnnRecall.LshPoint],
      ivf: Seq[graft.similarity.AnnRecall.IvfPoint]): Unit = {
    val json =
      "{\"sf\":\"" + sfDir + "\",\"k\":10,\"queries\":50," +
        "\"lsh\":[" + lsh.map(p =>
          s"""{"planes":${p.planes},"bandBits":${p.bandBits},""" +
            s""""tables":${p.tables},"recall_at_10":${f"${p.recallAt}%.4f"},""" +
            s""""avg_candidates":${f"${p.avgCandidates}%.1f"}}""")
          .mkString(",") + "]," +
        "\"ivf\":[" + ivf.map(p =>
          s"""{"nprobe":${p.nprobe},"recall_at_10":${f"${p.recallAt}%.4f"},""" +
            s""""avg_scanned_fraction":${f"${p.avgScannedFraction}%.4f"}}""")
          .mkString(",") + "]}"
    java.nio.file.Files.write(
      java.nio.file.Paths.get("target/RECALL_r08.json"),
      json.getBytes("UTF-8"))
  }
}
