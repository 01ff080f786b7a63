package graft

import graft.multimodal.Crossmodal
import org.apache.spark.sql.functions._

/** Cross-modal towers (multimodal/Crossmodal.scala): plane determinism
  * and grid discipline, projection linear-map semantics, and the text
  * tower's exact feature quartet.
  */
class CrossmodalSpec extends SparkSpec {
  import spark.implicits._

  test("modality plane families are distinct, deterministic, 3-decimal") {
    val t = Crossmodal.planeComponents(Crossmodal.TextSalt, 0,
      Crossmodal.TextFeatDim)
    val m = Crossmodal.planeComponents(Crossmodal.MediaSalt, 0,
      Crossmodal.MediaFeatDim)
    assert(t != m, "towers must not share planes")
    assert(t == Crossmodal.planeComponents(Crossmodal.TextSalt, 0,
      Crossmodal.TextFeatDim))
    (t ++ m).foreach { v =>
      assert(v >= -1.0 && v <= 1.0)
      assert(math.rint(v * 1000) / 1000.0 == v, s"off-grid component $v")
    }
    // SQL literals parse back to the identical doubles
    assert(Crossmodal.planeSqlLiterals(Crossmodal.TextSalt, 0,
      Crossmodal.TextFeatDim).map(_.toDouble) == t)
  }

  test("projection is the linear map: unit vector e_d selects the " +
      "planes' d-th components") {
    for (d <- 0 until Crossmodal.TextFeatDim) {
      val e = (0 until Crossmodal.TextFeatDim)
        .map(i => if (i == d) 1.0 else 0.0)
      val got = spark.range(1)
        .select(Crossmodal.projectText(
          array(e.map(lit): _*)).as("v"))
        .head.getSeq[Double](0)
      val want = (0 until Crossmodal.SharedDim).map(p =>
        Crossmodal.planeComponents(Crossmodal.TextSalt, p,
          Crossmodal.TextFeatDim)(d))
      assert(got == want, s"d=$d")
    }
  }

  test("nearline index fold: batch-count invariance, replay no-op") {
    val rows = (0L until 24L).map(i =>
      (i, (0 until Crossmodal.MediaFeatDim)
        .map(d => (i * 7 + d).toDouble / 10.0)))
      .toDF("doc_id", "mv")
    def drained(nBatches: Int): Map[Long, Seq[Double]] = {
      val stateDir = java.nio.file.Files
        .createTempDirectory(s"xmod_$nBatches").toString + "/state"
      Crossmodal.initState(spark, stateDir)
      val step = 24 / nBatches
      (0 until nBatches).foreach { i =>
        Crossmodal.applyBatch(spark,
          rows.where(col("doc_id") >= i.toLong * step &&
            col("doc_id") < (i + 1L) * step), stateDir)
      }
      // whole-frame replay is a no-op (doc-id anti-join)
      Crossmodal.applyBatch(spark, rows, stateDir)
      val st = spark.read.parquet(stateDir)
      assert(st.count() === 24L)
      st.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    }
    assert(drained(1) == drained(3))
  }

  test("textFeatures: exact char/token/e/vowel counts") {
    val got = spark.range(1)
      .select(Crossmodal.textFeatures(lit("The bee sees  me")).as("f"))
      .head.getSeq[Double](0)
    // 16 chars; 4 tokens (double space collapses under \s+); 6
    // lowercase 'e' (ThE=1, bEE=2, sEEs=2, mE=1); 6 vowels in the
    // lowercased string (the same six e's, no a/i/o/u)
    assert(got == Seq(16.0, 4.0, 6.0, 6.0), s"got $got")
  }
}
